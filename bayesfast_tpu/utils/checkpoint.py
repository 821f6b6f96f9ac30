"""Checkpoint / resume facility.

The reference marks this as a TODO (``recipe.py:30``) but is designed to be
resume-friendly: traces continue by ``add_iter`` + re-entering ``run``, and
``Recipe.run`` re-enters by phase-completion flags. Here we make that
concrete: traces carry their full sampler state (the ``ChainCarry`` pytree),
so a pickled trace resumes mid-chain bit-for-bit, and a pickled Recipe
resumes at the next unfinished phase.

``save`` routes every ``jax.Array`` it encounters (at any depth of the
object graph, via a ``reducer_override`` pickler) through host numpy. This
matters for mesh-sharded carries: a device array pinned to an 8-device mesh
would otherwise pickle with its sharding baked in and could not be restored
in a process with a different (or no) mesh. As numpy, the resume path
re-places the carry under whatever sharding the resuming driver uses.

Single-process scope: ``np.asarray`` gathers fully-addressable shards. A
multi-host global array is NOT fully addressable — there each process must
checkpoint its own addressable shards (e.g. via orbax) instead of this
whole-object pickler.
"""

import pickle

import numpy as np
import jax

__all__ = ['save', 'load']


class _HostPickler(pickle.Pickler):
    """Pickler that lowers device arrays to host numpy on the fly."""

    def reducer_override(self, obj):
        if isinstance(obj, jax.Array):
            if not obj.is_fully_addressable:
                from jax.experimental import multihost_utils
                obj = multihost_utils.process_allgather(obj, tiled=True)
            return np.asarray, (np.asarray(obj),)
        return NotImplemented


def save(obj, path):
    """Pickle a trace / TraceTuple / Recipe, with every device array
    (including mesh-sharded ones) gathered to host numpy."""
    with open(path, 'wb') as f:
        _HostPickler(f, protocol=pickle.HIGHEST_PROTOCOL).dump(obj)


def load(path):
    """Load an object saved with ``save``. Arrays come back as host numpy;
    the consuming driver re-places them on device (re-sharding onto its own
    mesh if one is configured)."""
    with open(path, 'rb') as f:
        return pickle.load(f)
