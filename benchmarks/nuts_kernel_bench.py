"""NUTS transition-kernel utilization benchmark.

Measures the batched NUTS transition against its own leapfrog floor on the
banana-32 density (the BASELINE.md flagship config) under the *equilibrium
warmup workload*: a real adaptive warmup runs first, then the adapted step
sizes / metric / positions are frozen and the raw transition kernel and a
pure ``lax.scan`` of batched leapfrog steps are timed on identical state.
The overhead ratio is

    (transition wall / leapfrog-equivalents) / (floor wall / steps)

where leapfrog-equivalents = mean over chains of the summed tree sizes. The
round-1 one-hot kernel measured ~10x over the floor at 2048 chains; the
round-2 target is <= 3x (VERDICT.md next-round item 2).

Prints one JSON line with the floor, the per-leapfrog-equivalent cost, the
overhead ratio, and HBM-bandwidth / FLOP estimates for the floor.
"""

import json
import os
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy.stats import special_ortho_group

import sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from _common import setup_cache, sync

setup_cache()

import bayesfast_tpu as bf
from bayesfast_tpu.samplers import nuts


def make_density(D=32, Q=0.01):
    lower = np.full(D, -15.)
    upper = np.full(D, 15.)
    bound = np.stack((lower, upper)).T
    const = float(np.sum(np.log(upper - lower)))
    A = jnp.asarray(special_ortho_group.rvs(D, random_state=0),
                    dtype=jnp.float32)
    # even-pair mask formulation of the banana terms: identical math to the
    # z[::2]/z[1::2] strided form, but strided slices become GATHERS under
    # vmap, which the Pallas megakernel cannot lower — roll+mask stays pure
    # elementwise and is equally good XLA
    even = jnp.asarray((np.arange(D) % 2) == 0, jnp.float32)

    def logp(x):
        z = x @ A.T
        zn = jnp.roll(z, -1, axis=-1)   # pairs (z_even, z_odd) aligned
        t = (z * z - zn) ** 2 / Q + (z - 1.0) ** 2
        return -jnp.sum(t * even) - const

    return bf.DensityLite(logp=logp, input_size=D, input_scales=bound,
                          hard_bounds=True)


def main():
    C = int(os.environ.get('BENCH_N_CHAIN', 2048))
    D = 32
    # enough transitions that the ~3 ms tunnel round-trip is <1%
    n_iter = int(os.environ.get('BENCH_N_ITER', 400))

    # ---- adapt: real warmup to the equilibrium workload ----
    den = make_density(D)
    bf.utils.set_generator(32)
    x_0 = 0.05 * np.asarray(bf.utils.sobol.multivariate_normal(
        np.zeros(D), np.eye(D), C))
    tt = bf.sample(den, {'n_chain': C, 'n_iter': 400, 'n_warmup': 399,
                         'x_0': x_0}, verbose=False, n_update=50)
    carry = tt.trace._carry
    q_eq = carry.q                                   # (C, D) equilibrium
    step = jnp.exp(carry.step.log_bar)               # adapted per-chain eps
    metric = carry.metric                            # adapted Welford state

    lpg = den.device_logp_and_grad(original_space=False)
    lpg_b = jax.vmap(lambda x: lpg((), x))

    # ---- leapfrog floor on the same frozen configuration ----
    metric_t = nuts._metric_t(metric)

    def lpg_t(x_t):
        lp, g = lpg_b(x_t.T)
        return lp, g.T

    start = nuts.compute_state_t(metric_t, lpg_t, q_eq.T,
                                 jnp.zeros((D, C), q_eq.dtype))

    @partial(jax.jit, static_argnums=1)
    def floor_scan(s, n):
        def body(s, _):
            return nuts.leapfrog_t(metric_t, lpg_t, step, s), ()
        s, _ = jax.lax.scan(body, s, None, length=n)
        return s

    n_floor = 65536
    sync(floor_scan(start, n_floor).q)  # compile
    t0 = time.time()
    sync(floor_scan(start, n_floor).q)
    floor_us = (time.time() - t0) / n_floor * 1e6

    # ---- full transitions on the frozen configuration ----
    @jax.jit
    def run(key, q):
        def body(carry, _):
            key, q = carry
            key, sub = jax.random.split(key)
            q, st = nuts.nuts_transition_batched(
                sub, q, metric, step, lpg_b, 10, 1000.)
            return (key, q), (st.tree_size, st.tree_depth, st.diverging)
        (_, q), (sizes, depths, div) = jax.lax.scan(
            body, (key, q), None, length=n_iter)
        return q, sizes, depths, div

    key = jax.random.PRNGKey(0)
    q, sizes, depths, div = run(key, q_eq)
    sync(q)  # compile
    t0 = time.time()
    q, sizes, depths, div = run(key, q_eq)
    sync(q)
    wall = time.time() - t0

    mean_leapfrogs = float(jnp.sum(jnp.mean(sizes.astype(jnp.float32),
                                            axis=1)))
    us_per_lf_eq = wall / mean_leapfrogs * 1e6
    ratio = us_per_lf_eq / floor_us

    # ---- Pallas whole-transition megakernel on the same frozen config ----
    from bayesfast_tpu.samplers.nuts_pallas import (
        nuts_transition_batched_pallas)

    @jax.jit
    def run_pl(key, q):
        def body(carry, _):
            key, q = carry
            key, sub = jax.random.split(key)
            q, st = nuts_transition_batched_pallas(
                sub, q, metric, step, lambda x: lpg((), x), 10, 1000.)
            return (key, q), (st.tree_size, st.tree_depth, st.diverging)
        (_, q), (sizes, depths, div) = jax.lax.scan(
            body, (key, q), None, length=n_iter)
        return q, sizes, depths, div

    q_p, sizes_p, depths_p, div_p = run_pl(key, q_eq)
    sync(q_p)  # compile
    t0 = time.time()
    q_p, sizes_p, depths_p, div_p = run_pl(key, q_eq)
    sync(q_p)
    wall_p = time.time() - t0
    mean_lf_p = float(jnp.sum(jnp.mean(sizes_p.astype(jnp.float32),
                                       axis=1)))
    us_per_lf_p = wall_p / mean_lf_p * 1e6
    ratio_p = us_per_lf_p / floor_us

    # ---- multi-transition chunk kernel (the driver's actual post path):
    # 64 frozen transitions per pallas_call, momentum refresh in-kernel ----
    from bayesfast_tpu.samplers.nuts_pallas import nuts_chunk_batched_pallas
    K = int(os.environ.get('BENCH_CHUNK', 64))
    n_chunks = max(1, n_iter // K)

    @jax.jit
    def run_ck(key, q):
        def body(q, i):
            _, q_last, st = nuts_chunk_batched_pallas(
                key, q, metric, step, K, 10, 1000.,
                lpg_pb=lpg, params=(), i0=i * K)
            return q_last, (st.tree_size, st.tree_depth, st.diverging)
        q, (sizes, depths, div) = jax.lax.scan(
            body, q, jnp.arange(n_chunks))
        return (q, sizes.reshape(-1, C), depths.reshape(-1, C),
                div.reshape(-1, C))

    q_c, sizes_c, depths_c, div_c = run_ck(key, q_eq)
    sync(q_c)  # compile
    t0 = time.time()
    q_c, sizes_c, depths_c, div_c = run_ck(key, q_eq)
    sync(q_c)
    wall_c = time.time() - t0
    mean_lf_c = float(jnp.sum(jnp.mean(sizes_c.astype(jnp.float32),
                                       axis=1)))
    us_per_lf_c = wall_c / mean_lf_c * 1e6
    ratio_c = us_per_lf_c / floor_us

    # speed-of-light estimates for the floor: each leapfrog reads/writes the
    # state pytree (~8 (D, C) f32 arrays touched) and runs the (C, D) x
    # (D, D) rotation matmul twice (value + grad)
    hbm_bytes = 8 * D * C * 4
    hbm_gbs = hbm_bytes / (floor_us * 1e-6) / 1e9
    flops = 2 * 2 * 2 * C * D * D  # fwd+bwd matmul, 2 flops/MAC
    tflops = flops / (floor_us * 1e-6) / 1e12

    rec = dict({
        'n_chain': C, 'dim': D, 'n_iter': n_iter,
        'floor_us_per_leapfrog': round(floor_us, 2),
        'kernel_us_per_leapfrog_eq': round(us_per_lf_eq, 2),
        'overhead_ratio': round(ratio, 2),
        'pallas_us_per_leapfrog_eq': round(us_per_lf_p, 2),
        'pallas_overhead_ratio': round(ratio_p, 2),
        'pallas_speedup_vs_xla': round(us_per_lf_eq / us_per_lf_p, 2),
        'chunk_us_per_leapfrog_eq': round(us_per_lf_c, 2),
        'chunk_overhead_ratio': round(ratio_c, 2),
        'chunk_speedup_vs_xla': round(us_per_lf_eq / us_per_lf_c, 2),
        'chunk_size': K,
        'chunk_mean_tree_size': round(float(jnp.mean(sizes_c.astype(
            jnp.float32))), 1),
        'chunk_diverging_frac': round(float(jnp.mean(div_c.astype(
            jnp.float32))), 4),
        'mean_tree_depth': round(float(jnp.mean(depths.astype(
            jnp.float32))), 2),
        'mean_tree_size': round(float(jnp.mean(sizes.astype(
            jnp.float32))), 1),
        'pallas_mean_tree_depth': round(float(jnp.mean(depths_p.astype(
            jnp.float32))), 2),
        'pallas_mean_tree_size': round(float(jnp.mean(sizes_p.astype(
            jnp.float32))), 1),
        'diverging_frac': round(float(jnp.mean(div.astype(
            jnp.float32))), 4),
        'pallas_diverging_frac': round(float(jnp.mean(div_p.astype(
            jnp.float32))), 4),
        'floor_hbm_gb_s': round(hbm_gbs, 1),
        'floor_matmul_tflops': round(tflops, 3),
    })
    rec = {'metric': 'nuts_kernel_overhead', **rec}
    print(json.dumps(rec))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'results.jsonl')
    with open(path, 'a') as f:
        f.write(json.dumps(rec) + '\n')


if __name__ == '__main__':
    main()
