"""Variable containers (``bayesfast/utils/collections.py``).

``VariableDict`` keeps named function values and Jacobians; ``PropertyList``
is a list that re-validates on every mutation.
"""

from collections import OrderedDict
import copy
import warnings

import numpy as np

__all__ = ['VariableDict', 'PropertyList']


class VariableDict:
    """Ordered (fun, jac) pair store keyed by variable name."""

    def __init__(self):
        self._fun = OrderedDict()
        self._jac = OrderedDict()

    def __getitem__(self, key):
        if isinstance(key, str):
            fun = self._fun.get(key)
            jac = self._jac.get(key)
            if fun is None and jac is None:
                warnings.warn(
                    f'you asked for the key "{key}", but we found neither its '
                    'fun nor its jac.', RuntimeWarning)
            out = np.empty(2, dtype=object)
            out[0], out[1] = fun, jac
            return out
        elif isinstance(key, (list, tuple, np.ndarray)):
            new_dict = VariableDict()
            for k in key:
                new_dict._fun[k] = self._fun.get(k)
                new_dict._jac[k] = self._jac.get(k)
                if new_dict._fun[k] is None and new_dict._jac[k] is None:
                    warnings.warn(
                        f'you asked for the key "{k}", but we found neither '
                        'its fun nor its jac.', RuntimeWarning)
            return new_dict
        raise ValueError('key should be a str, or a list/tuple/np.ndarray of '
                         'str.')

    def __setitem__(self, key, value):
        if not isinstance(key, str):
            raise ValueError('key should be a str.')
        try:
            self._fun[key] = value[0]
            self._jac[key] = value[1]
        except Exception:
            raise ValueError('failed to get the values for fun and jac.')

    @property
    def fun(self):
        return self._fun

    @property
    def jac(self):
        return self._jac

    @classmethod
    def get(cls, var_dicts, key, target='fun'):
        if not isinstance(key, str):
            raise ValueError('key should be a str.')
        if target not in ('fun', 'jac'):
            raise ValueError('target should be fun or jac.')
        if isinstance(var_dicts, VariableDict):
            return getattr(var_dicts, target)[key]
        elif hasattr(var_dicts, '__iter__'):
            return np.asarray([cls.get(vd, key, target) for vd in var_dicts])


class PropertyList:
    """List wrapper re-running a validation callback on every mutation."""

    def __init__(self, iterable=(), check=None):
        if isinstance(iterable, PropertyList):
            self._list = iterable._list.copy()
        elif isinstance(iterable, str):
            self._list = [iterable]
        else:
            self._list = list(iterable)
        self._check = check
        if callable(self._check):
            self.check()
        elif self._check is not None:
            raise ValueError('check should be callable or None.')

    def check(self):
        if self._check is not None:
            self._list = list(self._check(self._list))

    def _mutator(self, name):
        f = getattr(self._list, name)

        def wrapped(*args, **kwargs):
            res = f(*args, **kwargs)
            self.check()
            return res

        return wrapped

    def __getattr__(self, name):
        if name in ('append', 'extend', 'insert', 'remove', 'pop', 'clear',
                    'sort', 'reverse'):
            return self._mutator(name)
        if name in ('index', 'count'):
            return getattr(self._list, name)
        if name == 'copy':
            return lambda: copy.copy(self)
        raise AttributeError(name)

    def __getitem__(self, key):
        return self._list[key]

    def __setitem__(self, key, item):
        self._list[key] = item
        self.check()

    def __delitem__(self, key):
        del self._list[key]
        self.check()

    def __len__(self):
        return len(self._list)

    def __iter__(self):
        return iter(self._list)

    def __str__(self):
        return str(self._list)

    def __repr__(self):
        return repr(self._list)
