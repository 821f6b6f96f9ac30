"""Checkpoint / resume facility.

The reference marks this as a TODO (``recipe.py:30``) but is designed to be
resume-friendly: traces continue by ``add_iter`` + re-entering ``run``, and
``Recipe.run`` re-enters by phase-completion flags. Here we make that
concrete: traces carry their full sampler state (the ``ChainCarry`` pytree)
as host numpy arrays, so a pickled trace resumes mid-chain bit-for-bit, and
a pickled Recipe resumes at the next unfinished phase.
"""

import pickle

import numpy as np
import jax

__all__ = ['save', 'load']


def _to_host(obj):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, 'device') or
        hasattr(x, 'devices') else x, obj)


def save(obj, path):
    """Pickle a trace / TraceTuple / Recipe (device arrays -> host)."""
    with open(path, 'wb') as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)


def load(path):
    """Load an object saved with ``save``."""
    with open(path, 'rb') as f:
        return pickle.load(f)
