"""Continuously-tempered HMC/NUTS (THMC / TNUTS).

Counterpart of the reference's tempered machinery: the extended-state
leapfrog ``TCpuLeapfrogIntegrator`` (``hmc_utils/integration.py:98-222``),
``BaseTHMC`` (``base_hmc.py:220-262``), and the TNUTS tree (``tnuts.py``).

The state is extended with a temperature coordinate ``u`` (and momentum
``v_u`` of unit mass); the Hamiltonian interpolates the target potential
``phi = -logp`` and a base potential ``psi = -logp_base`` through
``beta(u) = sigmoid(u)`` plus the temperature prior ``U(u) = u +
2 log(1 + e^{-u})``. Each sample carries the importance weight
``delta / expm1(delta)`` with ``delta = phi - psi``
(``integration.py:148``). The U-turn checks use only the q-space momenta —
``(u, v_u)`` ride along as passengers, exactly as in the reference where
``Tree`` operates on ``state.p``/``state.velocity``.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

import numpy as np

from .metrics import velocity, kinetic_energy, sample_momentum, \
    sample_momentum_b
from .nuts import nuts_core_batched, _metric_t, _velocity_t, _make_vel_fn

__all__ = ['TState', 'TnutsStats', 'ThmcStats', 'tnuts_transition',
           'tnuts_transition_batched', 'thmc_transition']


class TState(NamedTuple):
    q: jnp.ndarray        # (dim,)
    p: jnp.ndarray        # (dim,) q-space momentum
    v: jnp.ndarray        # (dim,) q-space velocity (M^{-1} p)
    u: jnp.ndarray        # temperature coordinate (scalar)
    vu: jnp.ndarray       # temperature momentum (scalar, unit mass)
    weight: jnp.ndarray   # importance weight
    energy: jnp.ndarray
    logp: jnp.ndarray


class _TProposal(NamedTuple):
    q: jnp.ndarray
    u: jnp.ndarray
    weight: jnp.ndarray
    energy: jnp.ndarray
    logp: jnp.ndarray


class TnutsStats(NamedTuple):
    u: jnp.ndarray
    weight: jnp.ndarray
    logp: jnp.ndarray
    energy: jnp.ndarray
    tree_depth: jnp.ndarray
    tree_size: jnp.ndarray
    mean_tree_accept: jnp.ndarray
    energy_change: jnp.ndarray
    max_energy_change: jnp.ndarray
    diverging: jnp.ndarray


class ThmcStats(NamedTuple):
    u: jnp.ndarray
    weight: jnp.ndarray
    logp: jnp.ndarray
    energy: jnp.ndarray
    n_int_step: jnp.ndarray
    accept_stat: jnp.ndarray
    accepted: jnp.ndarray
    energy_change: jnp.ndarray
    diverging: jnp.ndarray


def _beta(u):
    return 1.0 / (1.0 + jnp.exp(-u))


def _d_beta(u):
    e = jnp.exp(-u)
    return e / (1.0 + e) ** 2


def _temp_potential(u):
    return u + 2.0 * jnp.log1p(jnp.exp(-u))


def _d_temp_potential(u):
    e = jnp.exp(u)
    return (e - 1.0) / (e + 1.0)


def _weight(delta):
    """delta / expm1(delta), with the delta -> 0 limit of 1."""
    safe = jnp.where(jnp.abs(delta) < 1e-12, 1.0, delta)
    w = safe / jnp.expm1(safe)
    return jnp.where(jnp.abs(delta) < 1e-12, 1.0, w)


def t_compute_state(metric, lpg_target, lpg_base, q, p, u, vu):
    """Extended Hamiltonian state (``integration.py:131-149``)."""
    lp_t, _ = lpg_target(q)
    lp_b, _ = lpg_base(q)
    phi, psi = -lp_t, -lp_b
    v = velocity(metric, p)
    kinetic = kinetic_energy(p, v) + 0.5 * vu * vu
    beta = _beta(u)
    potential = beta * phi + (1.0 - beta) * psi + _temp_potential(u)
    energy = kinetic + potential
    delta = phi - psi
    return TState(q, p, v, u, vu, _weight(delta), energy, -phi)


def t_leapfrog(metric, lpg_target, lpg_base, eps, s):
    """Position-Verlet step of the tempered Hamiltonian
    (``integration.py:151-222``): half-drift, full kick, half-drift."""
    dt = 0.5 * eps
    # first half drift (using the cached velocity)
    u = s.u + s.vu * dt
    q = s.q + s.v * dt
    # potential derivatives at the midpoint
    lp_t, g_t = lpg_target(q)
    lp_b, g_b = lpg_base(q)
    phi, psi = -lp_t, -lp_b
    dphi, dpsi = -g_t, -g_b
    beta = _beta(u)
    d_pot_du = _d_beta(u) * (phi - psi) + _d_temp_potential(u)
    d_pot_dq = beta * dphi + (1.0 - beta) * dpsi
    # full momentum kick
    vu = s.vu - d_pot_du * eps
    p = s.p - d_pot_dq * eps
    # second half drift with the updated velocity
    u = u + vu * dt
    v = velocity(metric, p)
    q = q + v * dt
    # energy at the endpoint (fresh evaluation, as in the reference)
    lp_t2, _ = lpg_target(q)
    lp_b2, _ = lpg_base(q)
    phi2, psi2 = -lp_t2, -lp_b2
    kinetic = kinetic_energy(p, v) + 0.5 * vu * vu
    beta2 = _beta(u)
    energy = kinetic + beta2 * phi2 + (1.0 - beta2) * psi2 + \
        _temp_potential(u)
    delta = phi2 - psi2
    return TState(q, p, v, u, vu, _weight(delta), energy, -phi2)


def t_compute_state_t(metric_t, lpg_target, lpg_base, q, p, u, vu):
    """Lane-minor extended Hamiltonian state: ``q``/``p`` (D, C), ``u``/
    ``vu`` (C,); lpg maps (D, C) -> ((C,), (D, C))."""
    lp_t, _ = lpg_target(q)
    lp_b, _ = lpg_base(q)
    phi, psi = -lp_t, -lp_b
    v = _velocity_t(metric_t, p)
    kinetic = 0.5 * jnp.sum(p * v, axis=0) + 0.5 * vu * vu
    beta = _beta(u)
    potential = beta * phi + (1.0 - beta) * psi + _temp_potential(u)
    energy = kinetic + potential
    delta = phi - psi
    return TState(q, p, v, u, vu, _weight(delta), energy, -phi)


def t_leapfrog_t(metric_t, lpg_target, lpg_base, eps, s):
    """Lane-minor position-Verlet step; ``eps`` is (C,) signed steps
    (broadcasts against (D, C) along the minor chain axis)."""
    dt = 0.5 * eps
    u = s.u + s.vu * dt
    q = s.q + s.v * dt
    lp_t, g_t = lpg_target(q)
    lp_b, g_b = lpg_base(q)
    phi, psi = -lp_t, -lp_b
    dphi, dpsi = -g_t, -g_b
    beta = _beta(u)
    d_pot_du = _d_beta(u) * (phi - psi) + _d_temp_potential(u)
    d_pot_dq = beta * dphi + (1.0 - beta) * dpsi
    vu = s.vu - d_pot_du * eps
    p = s.p - d_pot_dq * eps
    u = u + vu * dt
    v = _velocity_t(metric_t, p)
    q = q + v * dt
    lp_t2, _ = lpg_target(q)
    lp_b2, _ = lpg_base(q)
    phi2, psi2 = -lp_t2, -lp_b2
    kinetic = 0.5 * jnp.sum(p * v, axis=0) + 0.5 * vu * vu
    beta2 = _beta(u)
    energy = kinetic + beta2 * phi2 + (1.0 - beta2) * psi2 + \
        _temp_potential(u)
    delta = phi2 - psi2
    return TState(q, p, v, u, vu, _weight(delta), energy, -phi2)


def tnuts_transition_batched(key, q0, u0, metric, step_size, lpg_target,
                             lpg_base, max_treedepth, max_change):
    """One TNUTS iteration for all chains; returns ``(q_new, u_new, stats)``
    with batched leaves. ``q0`` is (C, D) and ``lpg_*`` map (C, D) ->
    ((C,), (C, D)); internally everything runs lane-minor like
    ``nuts_transition_batched``."""
    C, D = q0.shape
    dtype = q0.dtype
    key, k_mom, k_vu, k_core = jax.random.split(key, 4)
    p0 = sample_momentum_b(metric, k_mom, (C, D), dtype)
    vu0 = jax.random.normal(k_vu, (C,), dtype)
    metric_t = _metric_t(metric)

    def make_lpg_t(lpg):
        def lpg_t(x_t):
            logp, grad = lpg(x_t.T)
            return logp, grad.T
        return lpg_t

    lpg_target_t = make_lpg_t(lpg_target)
    lpg_base_t = make_lpg_t(lpg_base)
    start = t_compute_state_t(metric_t, lpg_target_t, lpg_base_t,
                              q0.T, p0.T, u0, vu0)
    step_size = jnp.broadcast_to(jnp.asarray(step_size, dtype), (C,))

    step_fn = lambda eps, s: t_leapfrog_t(metric_t, lpg_target_t,
                                          lpg_base_t, eps, s)
    prop_of = lambda s: _TProposal(s.q, s.u, s.weight, s.energy, s.logp)
    out = nuts_core_batched(k_core, start, step_fn, prop_of, step_size,
                            max_treedepth, max_change,
                            _make_vel_fn(metric_t))

    prop = out['prop']
    n_prop_f = jnp.maximum(out['n_prop'], 1).astype(dtype)
    stats = TnutsStats(
        u=prop.u, weight=prop.weight, logp=prop.logp, energy=prop.energy,
        tree_depth=out['depth'], tree_size=out['n_prop'],
        mean_tree_accept=out['accept_sum'] / n_prop_f,
        energy_change=prop.energy - start.energy,
        max_energy_change=out['max_de'], diverging=out['diverging'])
    return prop.q.T, prop.u, stats


def tnuts_transition(key, q0, u0, metric, step_size, lpg_target, lpg_base,
                     max_treedepth, max_change):
    """Single-chain TNUTS wrapper: batch of one over the batched kernel
    (do not vmap; the driver uses ``tnuts_transition_batched``)."""
    metric_b = jax.tree.map(lambda l: l[None], metric)
    q_new, u_new, stats = tnuts_transition_batched(
        key, q0[None], jnp.reshape(u0, (1,)), metric_b,
        jnp.reshape(step_size, (1,)), jax.vmap(lpg_target),
        jax.vmap(lpg_base), max_treedepth, max_change)
    return q_new[0], u_new[0], jax.tree.map(lambda l: l[0], stats)


def thmc_transition(key, q0, u0, metric, step_size, lpg_target, lpg_base,
                    n_int_step, max_change):
    """One THMC iteration (fixed trajectory + MH; ``hmc.py:16-49``)."""
    key, k_mom, k_vu, k_acc = jax.random.split(key, 4)
    p0 = sample_momentum(metric, k_mom)
    vu0 = jax.random.normal(k_vu, (), q0.dtype)
    start = t_compute_state(metric, lpg_target, lpg_base, q0, p0, u0, vu0)

    def body(_, s):
        return t_leapfrog(metric, lpg_target, lpg_base, step_size, s)

    state = jax.lax.fori_loop(0, n_int_step, body, start)

    finite = jnp.isfinite(state.energy)
    energy_change = jnp.where(finite, start.energy - state.energy, -jnp.inf)
    diverging = ~finite | (jnp.abs(energy_change) > max_change)
    accept_stat = jnp.minimum(1.0, jnp.exp(energy_change))
    accepted = ~diverging & (jax.random.uniform(k_acc) < accept_stat)
    q_new = jnp.where(accepted, state.q, start.q)
    u_new = jnp.where(accepted, state.u, start.u)

    stats = ThmcStats(
        u=state.u, weight=state.weight, logp=state.logp, energy=state.energy,
        n_int_step=jnp.int32(n_int_step), accept_stat=accept_stat,
        accepted=accepted, energy_change=energy_change, diverging=diverging)
    return q_new, u_new, stats
