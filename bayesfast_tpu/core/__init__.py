from .density import Density, DensityLite, Pipeline
from .sample import sample

__all__ = ['Density', 'DensityLite', 'Pipeline', 'sample']
