"""Nesterov dual-averaging step-size adaptation, functional.

Counterpart of ``bayesfast/samplers/hmc_utils/step_size.py:10-68`` (itself the
Hoffman-Gelman scheme): the mutable adaptation object becomes an immutable
pytree carried per chain through the sampling scan. The post-warmup
acceptance-probability bookkeeping (``_accept_after_warmup``) is kept as a
running (sum, count) pair, which is sufficient for the beta-interval
``check_acceptance`` diagnostic.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy import stats as _sp_stats

__all__ = ['StepSizeState', 'init_step_size', 'current_step_size',
           'update_step_size', 'check_acceptance']


class StepSizeState(NamedTuple):
    log_step: jnp.ndarray   # warmup (noisy) log step size
    log_bar: jnp.ndarray    # averaged log step size, used after warmup
    hbar: jnp.ndarray
    count: jnp.ndarray      # float scalar, starts at 1
    mu: jnp.ndarray         # log(10 * initial_step)
    accept_sum: jnp.ndarray   # post-warmup acceptance accumulator
    accept_count: jnp.ndarray


def init_step_size(initial_step, dtype=jnp.float32):
    initial_step = jnp.asarray(initial_step, dtype)
    log_step = jnp.log(initial_step)
    return StepSizeState(
        log_step=log_step, log_bar=log_step,
        hbar=jnp.zeros((), dtype), count=jnp.ones((), dtype),
        mu=jnp.log(10.0 * initial_step),
        accept_sum=jnp.zeros((), dtype), accept_count=jnp.zeros((), dtype))


def current_step_size(state, warmup):
    return jnp.where(warmup, jnp.exp(state.log_step), jnp.exp(state.log_bar))


def update_step_size(state, accept_stat, warmup, target=0.8, gamma=0.05,
                     k=0.75, t_0=10., adapt=True):
    """One dual-averaging update (``step_size.py:31-45``), masked by warmup."""
    w = 1.0 / (state.count + t_0)
    hbar = (1.0 - w) * state.hbar + w * (target - accept_stat)
    log_step = state.mu - hbar * jnp.sqrt(state.count) / gamma
    mk = state.count ** (-k)
    log_bar = mk * log_step + (1.0 - mk) * state.log_bar

    do = jnp.asarray(warmup) & jnp.asarray(adapt)
    new = StepSizeState(
        log_step=jnp.where(do, log_step, state.log_step),
        log_bar=jnp.where(do, log_bar, state.log_bar),
        hbar=jnp.where(do, hbar, state.hbar),
        count=jnp.where(do, state.count + 1, state.count),
        mu=state.mu,
        accept_sum=jnp.where(warmup, state.accept_sum,
                             state.accept_sum + accept_stat),
        accept_count=jnp.where(warmup, state.accept_count,
                               state.accept_count + 1),
    )
    return new


def check_acceptance(state, target, chain_id=None):
    """Post-hoc beta-interval acceptance check (``step_size.py:53-68``).

    Host-side diagnostic; emits a warning string or None.
    """
    n = float(np.asarray(state.accept_count))
    if n <= 0:
        return None
    mean_accept = float(np.asarray(state.accept_sum)) / n
    n_bound = min(100.0, n)
    n_good, n_bad = mean_accept * n_bound, (1.0 - mean_accept) * n_bound
    lower, upper = _sp_stats.beta(n_good + 1, n_bad + 1).interval(0.95)
    if target < lower or target > upper:
        msg_0 = f'for chain #{chain_id}, ' if chain_id is not None else ''
        return (msg_0 + 'the acceptance probability does not match the '
                f'target. It is {mean_accept}, but should be close to '
                f'{target}. Try to increase the number of tuning steps.')
    return None
