from . import constraint

__all__ = ['constraint']
