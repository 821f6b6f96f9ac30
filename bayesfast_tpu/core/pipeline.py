"""Module-graph pipelines and graph densities (Phase 2).

Placeholder: ``Pipeline`` / ``Density`` (the named-variable module DAG with
surrogate substitution, ``bayesfast/core/density.py:205-838``) land with the
surrogate phase. ``DensityLite`` in ``core.density`` already covers direct
log-density sampling.
"""

__all__ = ['Pipeline', 'Density']


class Pipeline:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError('Pipeline lands in the surrogate phase.')


class Density(Pipeline):
    pass
