"""Pallas whole-transition NUTS megakernel, validated in interpret mode.

The kernel's RNG is counter-based pure-jnp (identical stream compiled vs
interpreted), so these CPU tests exercise the exact arithmetic the TPU
runs. Checks: transition-level invariants, statistical agreement with the
XLA tree kernel on the same density, and the full ``bf.sample`` driver on
``set_nuts_kernel('pallas')``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import bayesfast_tpu as bf
from bayesfast_tpu import config
from bayesfast_tpu.samplers.metrics import init_diag_metric
from bayesfast_tpu.samplers.nuts import nuts_transition_batched
from bayesfast_tpu.samplers.nuts_pallas import nuts_transition_batched_pallas


def _run_chain(transition, key, q0, n_iter, **kw):
    qs = []
    stats_all = []
    q = q0
    for i in range(n_iter):
        key, sub = jax.random.split(key)
        q, st = transition(sub, q, **kw)
        qs.append(np.asarray(q))
        stats_all.append(st)
    return np.stack(qs), stats_all


@pytest.fixture
def _f32():
    # the megakernel is a float32 TPU kernel; run these tests in f32
    prev = jax.config.jax_enable_x64
    jax.config.update('jax_enable_x64', False)
    config.set_dtype(None)
    yield
    jax.config.update('jax_enable_x64', prev)
    config.set_dtype(None)


def test_pallas_transition_invariants(_f32):
    D, C = 6, 128
    logp = lambda x: -0.5 * jnp.sum(x ** 2)
    lpg_b = jax.vmap(jax.value_and_grad(logp))
    metric = init_diag_metric(jnp.zeros(D, jnp.float32),
                              jnp.ones(D, jnp.float32))
    key = jax.random.PRNGKey(1)
    q0 = jax.random.normal(key, (C, D), jnp.float32)
    q, st = nuts_transition_batched_pallas(
        key, q0, metric, 0.4, jax.value_and_grad(logp), 8, 1000.0,
        interpret=True)
    assert q.shape == (C, D) and np.all(np.isfinite(np.asarray(q)))
    depth = np.asarray(st.tree_depth)
    size = np.asarray(st.tree_size)
    assert np.all(depth >= 1) and np.all(depth <= 8)
    # leaves evaluated never exceed the full tree of the reached depth
    assert np.all(size <= 2 ** depth)
    acc = np.asarray(st.mean_tree_accept)
    assert np.all((acc >= 0) & (acc <= 1)) and acc.mean() > 0.5
    assert not np.asarray(st.diverging).any()
    # logp matches the density at the proposal
    lp, _ = lpg_b(q)
    assert np.allclose(np.asarray(lp), np.asarray(st.logp), atol=1e-4)


def test_pallas_matches_xla_statistics(_f32):
    """Same density, same step size/metric: the two kernels must produce
    statistically indistinguishable chains (they implement the identical
    algorithm with different random streams)."""
    D, C, n_iter = 4, 256, 60
    logp = lambda x: -0.5 * jnp.sum(x ** 2)
    lpg_b = jax.vmap(jax.value_and_grad(logp))
    metric = init_diag_metric(jnp.zeros(D, jnp.float32),
                              jnp.ones(D, jnp.float32))
    q0 = jax.random.normal(jax.random.PRNGKey(2), (C, D), jnp.float32)

    t_pl = jax.jit(lambda k, q: nuts_transition_batched_pallas(
        k, q, metric, 0.5, jax.value_and_grad(logp), 8, 1000.0,
        interpret=True))
    t_xla = jax.jit(lambda k, q: nuts_transition_batched(
        k, q, metric, jnp.float32(0.5), lpg_b, 8, 1000.0))

    qs_p, st_p = _run_chain(t_pl, jax.random.PRNGKey(3), q0, n_iter)
    qs_x, st_x = _run_chain(t_xla, jax.random.PRNGKey(4), q0, n_iter)

    half = n_iter // 2
    # posterior moments agree with the exact N(0, I) target
    for qs in (qs_p, qs_x):
        tail = qs[half:].reshape(-1, D)
        assert np.abs(tail.mean(0)).max() < 0.15
        assert np.abs(tail.var(0) - 1.0).max() < 0.2
    # tree statistics agree between kernels
    d_p = np.mean([np.asarray(s.tree_depth) for s in st_p])
    d_x = np.mean([np.asarray(s.tree_depth) for s in st_x])
    assert abs(d_p - d_x) < 0.25, (d_p, d_x)
    a_p = np.mean([np.asarray(s.mean_tree_accept) for s in st_p])
    a_x = np.mean([np.asarray(s.mean_tree_accept) for s in st_x])
    assert abs(a_p - a_x) < 0.05, (a_p, a_x)


def test_pallas_full_sample_driver(_f32):
    """bf.sample end-to-end on the pallas kernel (dual averaging + Welford
    adaptation wrap the megakernel transition)."""
    D = 4
    logp = lambda x: -0.5 * jnp.sum((x - 1.5) ** 2) / 0.5
    den = bf.DensityLite(logp=logp, input_size=D)
    config.set_nuts_kernel('pallas')
    try:
        bf.utils.set_generator(5)
        tt = bf.sample(den, {'n_chain': 128, 'n_iter': 250,
                             'n_warmup': 120}, verbose=False)
    finally:
        config.set_nuts_kernel('xla')
    s = tt.get(flatten=True)
    assert np.all(np.isfinite(s))
    assert np.abs(s.mean(0) - 1.5).max() < 0.1
    # logp = -(x-m)^2 => 2 sigma^2 = 1 => var = 0.5
    assert np.abs(s.var(0) - 0.5).max() < 0.12


def test_auto_mode_falls_back_on_unloweable_density(_f32, monkeypatch):
    """'auto' must silently fall back to the XLA kernel when the density
    cannot lower into Mosaic. Interpret mode executes gathers happily, so
    the Mosaic failure is simulated by making the pallas transition raise
    (as a real lowering error would at compile time)."""
    from bayesfast_tpu.samplers import nuts_pallas

    def _boom(*a, **kw):
        raise RuntimeError('simulated Mosaic lowering failure')

    monkeypatch.setattr(nuts_pallas, 'nuts_transition_batched_pallas',
                        _boom)
    D = 4
    logp = lambda x: -0.5 * jnp.sum(x ** 2)
    den = bf.DensityLite(logp=logp, input_size=D)
    config.set_nuts_kernel('auto')
    try:
        bf.utils.set_generator(6)
        tt = bf.sample(den, {'n_chain': 64, 'n_iter': 120, 'n_warmup': 60},
                       verbose=False)
    finally:
        config.set_nuts_kernel('xla')
    s = tt.get(flatten=True)
    assert np.all(np.isfinite(s))
    assert np.abs(s.mean(0)).max() < 0.2


def test_kernel_stream_is_topology_invariant():
    """The counter RNG is keyed by GLOBAL chain index: running chains
    [0, C) in one kernel call must equal running [0, C/2) and [C/2, C)
    in separate calls with the matching chain_start — the property that
    makes mesh-sharded runs bitwise-equal to single-device runs."""
    import jax
    import jax.numpy as jnp
    from bayesfast_tpu.samplers.nuts_pallas import (
        nuts_transition_batched_pallas, nuts_chunk_batched_pallas)
    from bayesfast_tpu.samplers.metrics import init_diag_metric

    C, D = 16, 3
    metric = init_diag_metric(jnp.zeros(D, jnp.float64),
                              jnp.ones(D, jnp.float64))
    lpg1 = jax.value_and_grad(lambda x: -0.5 * jnp.sum(x ** 2))
    q0 = jax.random.normal(jax.random.PRNGKey(0), (C, D), jnp.float64)
    eps = jnp.full((C,), 0.45, jnp.float64)
    key = jax.random.PRNGKey(7)

    q_full, st_full = nuts_transition_batched_pallas(
        key, q0, metric, eps, lpg1, 10, 1000., interpret=True)
    h = C // 2
    q_a, _ = nuts_transition_batched_pallas(
        key, q0[:h], metric, eps[:h], lpg1, 10, 1000., interpret=True,
        chain_start=0)
    q_b, _ = nuts_transition_batched_pallas(
        key, q0[h:], metric, eps[h:], lpg1, 10, 1000., interpret=True,
        chain_start=h)
    assert np.array_equal(np.asarray(q_full),
                          np.concatenate([np.asarray(q_a),
                                          np.asarray(q_b)]))

    # same property for the multi-transition chunk kernel
    qc_full, qlast_full, _ = nuts_chunk_batched_pallas(
        key, q0, metric, eps, 5, 10, 1000., interpret=True, lpg_1=lpg1)
    qc_a, _, _ = nuts_chunk_batched_pallas(
        key, q0[:h], metric, eps[:h], 5, 10, 1000., interpret=True,
        lpg_1=lpg1, chain_start=0)
    qc_b, _, _ = nuts_chunk_batched_pallas(
        key, q0[h:], metric, eps[h:], 5, 10, 1000., interpret=True,
        lpg_1=lpg1, chain_start=h)
    assert np.array_equal(np.asarray(qc_full),
                          np.concatenate([np.asarray(qc_a),
                                          np.asarray(qc_b)], axis=1))
