"""Optimal bridge sampling estimator (``bayesfast/evidence/bridge.py:10-76``).

Solves the 1-d root of the optimal-bridge score function for log r = log Z,
with an error estimate combining the proposal-sample variance and the
chain-autocorrelation-corrected posterior-sample variance (computed both
flattened and unflattened; warns on inconsistency).
"""

import warnings

import numpy as np
from scipy.special import logsumexp
from scipy.optimize import root_scalar

from ..utils.acor import integrated_time

__all__ = ['bridge']


def bridge(logp_p, logp_q, logq_p, logq_q):
    lpp = np.asarray(logp_p)
    lpq = np.asarray(logp_q)
    lqp = np.asarray(logq_p)
    lqq = np.asarray(logq_q)

    if lqq.ndim not in (1, 2):
        raise ValueError(f'dim of logq_q should be 1 or 2, instead of '
                         f'{lqq.ndim}.')
    if lpp.ndim not in (1, 2):
        raise ValueError(f'dim of logp_p should be 1 or 2, instead of '
                         f'{lpp.ndim}.')
    if lpp.shape != lqp.shape:
        raise ValueError('shape of logp_p is different from shape of logq_p.')
    if lpq.shape != lqq.shape:
        raise ValueError('shape of logp_q is different from shape of logq_q.')

    n_p = lpp.size
    n_q = lqq.size
    lppf, lpqf = lpp.reshape(-1), lpq.reshape(-1)
    lqpf, lqqf = lqp.reshape(-1), lqq.reshape(-1)

    _a = lqpf - lppf - np.log(n_p / n_q)
    _b = lpqf - lqqf + np.log(n_p / n_q)

    def score(logr):
        _c = logsumexp(logr + _a - logsumexp(
            np.stack((logr + _a, np.zeros_like(_a))), axis=0))
        _d = logsumexp(-logr + _b - logsumexp(
            np.stack((-logr + _b, np.zeros_like(_b))), axis=0))
        return _c - _d

    logr = root_scalar(score, x0=0., x1=5.).root

    f1 = np.exp(lpqf - logr - logsumexp(
        np.stack((lpqf - logr + np.log(n_p / (n_p + n_q)),
                  lqqf + np.log(n_q / (n_p + n_q)))), axis=0))
    f2 = np.exp(lqpf - logsumexp(
        np.stack((lppf - logr + np.log(n_p / (n_p + n_q)),
                  lqpf + np.log(n_q / (n_p + n_q)))), axis=0))
    re2_q = np.var(f1) / np.mean(f1) ** 2 / n_q

    tau_uf = integrated_time(f2.reshape(lpp.shape)[..., np.newaxis],
                             quiet=True)[0]
    re2_p_uf = tau_uf * np.var(f2) / np.mean(f2) ** 2 / n_p
    logr_err_uf = (re2_p_uf + re2_q) ** 0.5

    tau_f = integrated_time(f2[..., np.newaxis], quiet=True)[0]
    re2_p_f = tau_f * np.var(f2) / np.mean(f2) ** 2 / n_p
    logr_err_f = (re2_p_f + re2_q) ** 0.5

    diff_err = abs(logr_err_f - logr_err_uf) / min(logr_err_f, logr_err_uf)
    logr_err = max(logr_err_f, logr_err_uf)

    if diff_err > 0.25:
        warnings.warn('the estimated error for logr may be unreliable, since '
                      'flattening before estimating tau makes the result '
                      'differ by more than 25%.', RuntimeWarning)
    if logr_err > 0.25:
        warnings.warn('the estimated error for logr may be unreliable, since '
                      'the result is larger than 0.25.', RuntimeWarning)
    return logr, logr_err
