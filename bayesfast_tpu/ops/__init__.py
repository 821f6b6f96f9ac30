from . import constraint
from . import ica

__all__ = ['constraint', 'ica']
