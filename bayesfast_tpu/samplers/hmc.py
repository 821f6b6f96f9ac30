"""Fixed-length HMC transition kernel (``bayesfast/samplers/hmc.py:10-60``).

A ``fori_loop`` of ``n_int_step`` leapfrog steps followed by a
Metropolis-Hastings accept/reject; divergence when the energy error exceeds
``max_change`` or the final energy is non-finite (forces rejection).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .integration import compute_state, leapfrog
from .metrics import sample_momentum

__all__ = ['HmcStats', 'hmc_transition']


class HmcStats(NamedTuple):
    logp: jnp.ndarray
    energy: jnp.ndarray
    n_int_step: jnp.ndarray
    accept_stat: jnp.ndarray
    accepted: jnp.ndarray
    energy_change: jnp.ndarray
    diverging: jnp.ndarray


def hmc_transition(key, q0, metric, step_size, logp_and_grad, n_int_step,
                   max_change):
    """One HMC iteration for a single chain; returns ``(q_new, stats)``."""
    key, k_mom, k_acc = jax.random.split(key, 3)
    p0 = sample_momentum(metric, k_mom)
    start = compute_state(metric, logp_and_grad, q0, p0)

    def body(_, s):
        return leapfrog(metric, logp_and_grad, step_size, s)

    state = jax.lax.fori_loop(0, n_int_step, body, start)

    finite = jnp.isfinite(state.energy)
    energy_change = jnp.where(finite, start.energy - state.energy, -jnp.inf)
    diverging = ~finite | (jnp.abs(energy_change) > max_change)
    accept_stat = jnp.minimum(1.0, jnp.exp(energy_change))
    accepted = ~diverging & (jax.random.uniform(k_acc) < accept_stat)
    q_new = jnp.where(accepted, state.q, start.q)

    stats = HmcStats(
        logp=state.logp, energy=state.energy,
        n_int_step=jnp.int32(n_int_step), accept_stat=accept_stat,
        accepted=accepted, energy_change=energy_change, diverging=diverging)
    return q_new, stats
