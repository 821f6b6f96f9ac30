"""Weighted-sum module (``bayesfast/modules/sum.py:7-83``)."""

import numpy as np
import jax.numpy as jnp

from ..core.module import ModuleBase
from ..config import get_dtype

__all__ = ['Sum']


class Sum(ModuleBase):
    """Computes ``sum(b * x)`` of the concatenated input vars."""

    _output_min_length = 1
    _output_max_length = 1

    def __init__(self, input_vars, output_vars, delete_vars=(), b=None,
                 label=None):
        super().__init__(
            input_vars=input_vars, output_vars=output_vars,
            delete_vars=delete_vars, input_shapes=-1, output_shapes=None,
            input_scales=None, label=label)
        self.b = b

    @property
    def b(self):
        return self._b

    @b.setter
    def b(self, b):
        if b is not None:
            b = np.atleast_1d(np.asarray(b, np.float64))
            if b.ndim != 1:
                raise ValueError('invalid value for b.')
        self._b = b

    def _fun(self, x):
        x = jnp.asarray(x, get_dtype())
        if self._b is None:
            return jnp.sum(x)
        return jnp.sum(jnp.asarray(self._b, x.dtype) * x)
