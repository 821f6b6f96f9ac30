"""Benchmark: batched NUTS on the 32-d Banana density (BASELINE.md flagship).

Reference anchor: the bayesfast banana-gbs example runs 8 chains on an
8-process Cori node at ~11 warmup iterations/sec/chain (~88 it/s aggregate).
Here the same density (D=32, Q=0.01, hard bounds [-15, 15], random SO(32)
rotation, identical NUTS configuration) runs as one jitted float32 program
with the chain axis batched on a single chip.

Unlike round 1, the chains start from the honest raw Sobol cold start: the
framework's start-descent + reasonable-step probe (exact-n_call-accounted
features, see ``core.sample``) handle the |logp| ~ 3e6 landing zone that
float32 energies cannot resolve. Warmup throughput is the headline
(vs_baseline); the JSON line also carries post-warmup ESS/sec/chip (the
BASELINE.json north-star metric), leapfrogs/sec, mean tree depth, and an
HBM-bandwidth estimate under "extra".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bayesfast_tpu as bf
    from bayesfast_tpu.utils.acor import effective_sample_size

    n_chain = int(os.environ.get('BENCH_N_CHAIN', 1024))
    n_warmup = int(os.environ.get('BENCH_N_WARMUP', 400))
    n_post = int(os.environ.get('BENCH_N_POST', 300))

    D, Q = 32, 0.01
    lower = np.full(D, -15.)
    upper = np.full(D, 15.)
    bound = np.stack((lower, upper)).T
    const = float(np.sum(np.log(upper - lower)))
    from scipy.stats import special_ortho_group
    A = jnp.asarray(special_ortho_group.rvs(D, random_state=0),
                    dtype=jnp.float32)

    def logp(x):
        x = x @ A.T
        return (-jnp.sum((x[::2] ** 2 - x[1::2]) ** 2 / Q
                         + (x[::2] - 1) ** 2) - const)

    bf.utils.set_generator(32)
    den = bf.DensityLite(logp=logp, input_size=D, input_scales=bound,
                         hard_bounds=True)

    trace = bf.NTrace(n_chain=n_chain, n_iter=n_warmup + n_post,
                      n_warmup=n_warmup)

    # compile + start-descent + probe warm pass (2 iterations)
    tt = bf.sample(den, trace, n_run=2, verbose=False, n_update=2)

    t0 = time.time()
    # chunked device calls: the remote-TPU tunnel kills minutes-long
    # single XLA programs, and chunking costs <1% at these shapes
    tt = bf.sample(den, tt, n_run=n_warmup - 2, verbose=False,
                   n_update=50)
    dt_warm = time.time() - t0

    t0 = time.time()
    tt = bf.sample(den, tt, n_run=n_post, verbose=False, n_update=50)
    dt_post = time.time() - t0

    warm_iters_per_sec = n_chain * (n_warmup - 2) / dt_warm
    baseline = 88.0  # 8 chains x ~11 warmup it/s/chain on the Cori node

    # post-warmup effective samples per second on this one chip
    s = tt.get(flatten=False)                      # (chain, iter, dim)
    ess = float(np.sum(effective_sample_size(s)) / s.shape[-1])
    ess_per_sec = ess / dt_post

    st = tt.trace._stats_arrays
    depth_post = float(np.mean(st['tree_depth'][:, n_warmup:]))
    size_post = float(np.mean(st['tree_size'][:, n_warmup:]))
    leapfrogs_per_sec = n_chain * n_post * size_post / dt_post
    # each leapfrog touches ~8 (D, C) f32 state arrays in HBM
    hbm_gbs = leapfrogs_per_sec * 8 * D * 4 / 1e9

    print(json.dumps({
        'metric': 'banana32_nuts_warmup_iters_per_sec',
        'value': round(warm_iters_per_sec, 2),
        'unit': 'iterations/sec (all chains, 1 chip)',
        'vs_baseline': round(warm_iters_per_sec / baseline, 3),
        'extra': {
            'n_chain': n_chain,
            'ess_per_sec_per_chip': round(ess_per_sec, 1),
            'post_iters_per_sec': round(n_chain * n_post / dt_post, 1),
            'mean_tree_depth_post': round(depth_post, 2),
            'mean_tree_size_post': round(size_post, 1),
            'leapfrogs_per_sec': round(leapfrogs_per_sec, 0),
            'hbm_gb_per_sec_estimate': round(hbm_gbs, 1),
            'n_call': int(tt.n_call),
        },
    }))


if __name__ == '__main__':
    main()
