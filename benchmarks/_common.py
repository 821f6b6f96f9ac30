"""Shared benchmark plumbing for the tunneled-TPU environment."""

import os

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def setup_cache():
    """Persistent XLA compile cache: flat-tree NUTS programs take minutes
    to compile at large chain counts; pay it once per configuration."""
    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)


def sync(*arrays):
    """Force completion of device work feeding ``arrays``.

    ``block_until_ready`` does NOT synchronize on the tunneled axon TPU
    platform (measured: a 1 GiB full-array multiply "completes" in 50 us);
    a tiny element transfer is the only reliable barrier.
    """
    out = 0.0
    for a in arrays:
        flat = a.reshape(-1) if getattr(a, 'ndim', 0) else a
        out += float(flat[0] if getattr(a, 'ndim', 0) else flat)
    return out
