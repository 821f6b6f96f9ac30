from .density import Density, DensityLite, Pipeline
from .module import ModuleBase, Module, Surrogate
from .sample import sample
from .recipe import (Recipe, RecipeTrace, OptimizeStep, SampleStep, PostStep,
                     StaticSample, DynamicSample)

__all__ = ['Density', 'DensityLite', 'Pipeline', 'ModuleBase', 'Module',
           'Surrogate', 'sample', 'Recipe', 'RecipeTrace', 'OptimizeStep',
           'SampleStep', 'PostStep', 'StaticSample', 'DynamicSample']
