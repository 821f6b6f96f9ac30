from .mesh import (get_mesh, set_mesh, make_mesh, shard_chains,
                   chain_sharding, CHAIN_AXIS)

__all__ = ['get_mesh', 'set_mesh', 'make_mesh', 'shard_chains',
           'chain_sharding', 'CHAIN_AXIS']
