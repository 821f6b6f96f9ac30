from . import random
from . import sobol
from .random import get_generator, set_generator, spawn_generator

__all__ = ['random', 'sobol', 'get_generator', 'set_generator',
           'spawn_generator', 'all_isinstance']


def all_isinstance(iterable, class_or_tuple):
    return (hasattr(iterable, '__iter__') and
            all(isinstance(i, class_or_tuple) for i in iterable))
