"""Gaussianized evidence estimators: GBS / GIS / GHM
(``bayesfast/evidence/gaussianized.py``).

GBS fits a SIT flow on the first half of the chains, draws proposal samples,
evaluates true logp on both sets (batched on device — the reference farms
these over a process pool, ``gaussianized.py:171-176``) and calls the bridge
estimator. GIS fits on all samples and importance-samples; GHM fits on the
first half and harmonic-means the second half.
"""

import warnings

import numpy as np

from .bridge import bridge
from .importance import importance
from .harmonic import harmonic
from ..transforms import SIT
from ..samplers import TraceTuple

__all__ = ['GBS', 'GIS', 'GHM']


class _GBase:
    """Shared utilities (``gaussianized.py:37-76``)."""

    def __init__(self, sit=None, parallel_backend=None):
        self.sit = sit
        self._parallel_backend = parallel_backend  # accepted, unused

    @property
    def sit(self):
        return self._sit

    @sit.setter
    def sit(self, s):
        if s is None:
            s = {}
        if isinstance(s, dict):
            s = SIT(**s)
        elif not isinstance(s, SIT):
            raise ValueError('invalid value for sit.')
        self._sit = s

    def _map(self, logp, x):
        """Batched logp evaluation preserving leading shape."""
        x_shape = x.shape
        flat = x.reshape((-1, x_shape[-1]))
        out = np.asarray(logp(flat))
        return out.reshape(x_shape[:-1])

    def run(self, x_p, logp, logp_p=None):
        raise NotImplementedError('abstract method.')

    __call__ = run


class _GBaseQ(_GBase):
    """Shared by GBS and GIS: proposal-size selection
    (``gaussianized.py:79-176``)."""

    def __init__(self, sit=None, parallel_backend=None, n_q=None,
                 f_call=0.05, n_q_max=None):
        super().__init__(sit, parallel_backend)
        self.n_q = n_q
        self.f_call = f_call
        # With massively parallel chains, call-budget-proportional sizing
        # (f_call * TraceTuple.n_call, ``gaussianized.py:135-154``) can
        # explode n_q; n_q_max caps it (None = reference behavior).
        if n_q_max is not None:
            n_q_max = int(n_q_max)
            if n_q_max <= 0:
                raise ValueError('n_q_max should be a positive int or None.')
        self.n_q_max = n_q_max

    @property
    def n_q(self):
        return self._n_q

    @n_q.setter
    def n_q(self, n):
        if n is not None:
            n = int(n)
            if n <= 0:
                raise ValueError('invalid value for n_q.')
        self._n_q = n

    @property
    def f_call(self):
        return self._f_call

    @f_call.setter
    def f_call(self, f):
        if f is not None:
            f = float(f)
            if f <= 0:
                raise ValueError('invalid value for f_call.')
        self._f_call = f

    def run(self, x_p, logp, logp_p=None):
        if not callable(logp):
            raise ValueError('logp should be callable.')
        if not isinstance(x_p, TraceTuple):
            x_p = np.asarray(x_p)
            if not 2 <= x_p.ndim <= 3:
                raise ValueError('invalid value for x_p.')

        if self.n_q is not None:
            n_q = self.n_q
            if isinstance(x_p, TraceTuple):
                x_p = x_p.get(flatten=False)
        else:
            f_call = self.f_call
            if f_call is not None:
                if isinstance(x_p, TraceTuple):
                    n_p = x_p.n_call
                    n_q = int(n_p * f_call)
                    x_p = x_p.get(flatten=False)
                else:
                    warnings.warn('f_call should be used only when x_p is a '
                                  'TraceTuple. Using equal-sample allocation '
                                  'for now.', RuntimeWarning)
                    f_call = None
            if f_call is None:
                if isinstance(x_p, TraceTuple):
                    x_p = x_p.get(flatten=False)
                n_q = int(np.prod(x_p.shape[:-1]))

        if not (x_p.shape[-1] > 1 and np.prod(x_p.shape[:-1]) > 1):
            raise ValueError('invalid shape for x_p.')
        if x_p.shape[0] == 1:
            x_p = x_p[0]  # single chain
        if self.n_q_max is not None:
            n_q = min(n_q, self.n_q_max)
        return self._compute_evidence(logp, x_p, logp_p, n_q)

    __call__ = run

    def _compute_evidence(self, logp, x_p, logp_p, n_q):
        raise NotImplementedError('abstract method.')


class GBS(_GBaseQ):
    """Gaussianized Bridge Sampling (``gaussianized.py:179-215``)."""

    def _compute_evidence(self, logp, x_p, logp_p, n_q):
        n_half = x_p.shape[0] // 2
        self.sit.fit(data=x_p[:n_half])
        x_q = self.sit.sample(n_q)[0]

        if logp_p is not None:
            logp_p = np.asarray(logp_p)
            if logp_p.shape == x_p.shape[:-1]:
                logp_p = logp_p[n_half:]
            else:
                warnings.warn('the logp_p you gave me seems not correct. '
                              'Will recompute it from logp and x_p.',
                              RuntimeWarning)
                logp_p = None
        if logp_p is None:
            logp_p = self._map(logp, x_p[n_half:])

        logp_q = self._map(logp, x_q)
        logq_p = self.sit.logq(x_p[n_half:])
        logq_q = self.sit.logq(x_q)
        return bridge(logp_p, logp_q, logq_p, logq_q)


class GIS(_GBaseQ):
    """Gaussianized Importance Sampling (``gaussianized.py:218-233``)."""

    def _compute_evidence(self, logp, x_p, logp_p, n_q):
        self.sit.fit(data=x_p)
        x_q = self.sit.sample(n_q)[0]
        logp_q = self._map(logp, x_q)
        logq_q = self.sit.logq(x_q)
        return importance(logp_q, logq_q)


class GHM(_GBase):
    """Gaussianized Harmonic Mean (``gaussianized.py:236-286``)."""

    def run(self, x_p, logp=None, logp_p=None):
        if isinstance(x_p, TraceTuple):
            x_p = x_p.get(flatten=False)
        else:
            x_p = np.asarray(x_p)
            if not 2 <= x_p.ndim <= 3:
                raise ValueError('invalid value for x_p.')
        if not (x_p.shape[-1] > 1 and np.prod(x_p.shape[:-1]) > 1):
            raise ValueError('invalid shape for x_p.')
        if x_p.shape[0] == 1:
            x_p = x_p[0]

        n_half = x_p.shape[0] // 2
        if logp_p is not None:
            logp_p = np.asarray(logp_p)
            if logp_p.shape == x_p.shape[:-1]:
                logp_p = logp_p[n_half:]
            else:
                warnings.warn('the logp_p you gave me seems not correct. '
                              'Will recompute it from logp and x_p.',
                              RuntimeWarning)
                logp_p = None
        if logp_p is None:
            if not callable(logp):
                raise ValueError('you gave me neither the correct logp_p nor '
                                 'a callable logp function.')
            logp_p = self._map(logp, x_p[n_half:])

        self.sit.fit(data=x_p[:n_half])
        logq_p = self.sit.logq(x_p[n_half:])
        return harmonic(logp_p, logq_p)

    __call__ = run
