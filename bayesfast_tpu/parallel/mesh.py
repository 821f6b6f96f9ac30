"""Device-mesh helpers: the TPU-native 'parallel backend'.

The reference parallelizes chains over a process pool
(``bayesfast/utils/parallel.py:34-204``: multiprocess/ray/dask/loky). Here the
chain axis is a sharded array axis over a ``jax.sharding.Mesh``: one jitted
program runs all chains, XLA partitions the batched transition across devices
(ICI within a slice, DCN across hosts), and cross-chain reductions are
on-device collectives instead of driver-side gathers.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ['get_mesh', 'set_mesh', 'make_mesh', 'shard_chains',
           'chain_sharding']

_mesh = None

CHAIN_AXIS = 'chain'


def make_mesh(devices=None, axis_name=CHAIN_AXIS):
    """Build a 1-d chain mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def set_mesh(mesh):
    """Set (or clear, with None) the global default mesh for sampling."""
    global _mesh
    _mesh = mesh


def get_mesh():
    return _mesh


def chain_sharding(mesh=None):
    """NamedSharding that splits the leading (chain) axis over the mesh."""
    if mesh is None:
        mesh = _mesh
    if mesh is None:
        return None
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def shard_chains(tree, n_chain, mesh=None):
    """device_put a chain-batched pytree with the chain axis sharded.

    No-op when no mesh is configured or ``n_chain`` doesn't divide the mesh
    size (XLA would require padding; we fall back to replication-free default
    placement instead).
    """
    if mesh is None:
        mesh = _mesh
    if mesh is None:
        return tree
    n_dev = int(np.prod(list(mesh.shape.values())))
    if n_chain % n_dev != 0:
        return tree
    sharding = chain_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def put(x):
        # shard only chain-batched leaves; replicate shared state (e.g. the
        # pooled mass matrix)
        if getattr(x, 'ndim', 0) >= 1 and x.shape[0] == n_chain:
            return jax.device_put(x, sharding)
        return jax.device_put(x, replicated)

    return jax.tree.map(put, tree)
