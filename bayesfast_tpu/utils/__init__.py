from . import random
from . import sobol
from .random import get_generator, set_generator, spawn_generator

__all__ = ['random', 'sobol', 'get_generator', 'set_generator',
           'spawn_generator', 'all_isinstance', 'Laplace',
           'SystematicResampler', 'make_positive', 'integrated_time',
           'effective_sample_size', 'rhat',
           'VariableDict', 'PropertyList']


def all_isinstance(iterable, class_or_tuple):
    return (hasattr(iterable, '__iter__') and
            all(isinstance(i, class_or_tuple) for i in iterable))


from .misc import make_positive, SystematicResampler  # noqa: E402
from .acor import integrated_time, effective_sample_size, \
    rhat  # noqa: E402
from .laplace import Laplace  # noqa: E402
from .collections import VariableDict, PropertyList  # noqa: E402
