"""Importance-sampling evidence estimator
(``bayesfast/evidence/importance.py:8-33``)."""

import warnings

import numpy as np
from scipy.special import logsumexp

__all__ = ['importance']


def importance(logp_q, logq_q):
    lpq = np.asarray(logp_q)
    lqq = np.asarray(logq_q)
    if lqq.ndim not in (1, 2):
        raise ValueError(f'dim of logq_q should be 1 or 2, instead of '
                         f'{lqq.ndim}.')
    if lpq.shape != lqq.shape:
        raise ValueError('shape of logp_q is different from shape of logq_q.')

    n_q = lqq.size
    lpqf, lqqf = lpq.reshape(-1), lqq.reshape(-1)

    logr = logsumexp(lpqf - lqqf, b=1 / n_q)
    foo = np.exp(lpqf - lqqf - logr)
    logr_err = (np.var(foo) / np.mean(foo) ** 2 / n_q) ** 0.5

    if logr_err > 0.25:
        warnings.warn('the estimated error for logr may be unreliable, since '
                      'the result is larger than 0.25.', RuntimeWarning)
    return logr, logr_err
