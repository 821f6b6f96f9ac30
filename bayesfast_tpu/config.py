"""Global configuration for bayesfast_tpu.

The reference implementation (bayesfast) is float64-numpy throughout. On TPU
the natural dtype is float32 (the VPU/MXU native types); float64 is software
emulated and slow. We therefore keep every kernel dtype-polymorphic and expose
a single knob here. Tests that need extra precision enable jax_enable_x64 on
the CPU backend.
"""

import jax
import jax.numpy as jnp

__all__ = ['get_dtype', 'set_dtype', 'asarray', 'default_int']

_dtype = None  # lazily resolved


def get_dtype():
    """Active floating dtype: float64 iff jax_enable_x64 is on, else float32."""
    global _dtype
    if _dtype is not None:
        return _dtype
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def set_dtype(dtype):
    """Force the framework floating dtype (None to re-derive from jax config)."""
    global _dtype
    _dtype = None if dtype is None else jnp.dtype(dtype)


def asarray(x):
    """Convert to a jnp array of the framework floating dtype."""
    return jnp.asarray(x, dtype=get_dtype())


def default_int():
    return jnp.int32
