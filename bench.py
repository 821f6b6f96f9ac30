"""Benchmark: batched NUTS warmup throughput on the 32-d Banana density.

Reference anchor (BASELINE.md): the bayesfast banana-gbs example runs 8
chains on an 8-process Cori node at ~11 warmup iterations/sec/chain, i.e.
~88 iterations/sec aggregate. Here the same density (D=32, Q=0.01, hard
bounds [-15, 15], random SO(32) rotation, identical NUTS configuration)
runs as one jitted program with the chain axis vmapped on a single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import bayesfast_tpu as bf

    n_chain = int(os.environ.get('BENCH_N_CHAIN', 1024))
    n_iter = int(os.environ.get('BENCH_N_ITER', 500))

    D, Q = 32, 0.01
    lower = np.full(D, -15.)
    upper = np.full(D, 15.)
    bound = np.stack((lower, upper)).T
    diff = upper - lower
    const = float(np.sum(np.log(diff)))
    rng = np.random.default_rng(0)
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

    # Start near the typical set: the sobol N(0, I) cold start lands at
    # |logp| ~ 3e6 where float32 energy differences lose the adaptation
    # signal (the f64 path escapes fine but is ~12x slower — see
    # examples/banana_gbs.py). The equilibrium warmup workload (adapted
    # step size -> tree depth ~8-9) is the same either way, so this
    # measures the same per-iteration work as the reference's healthy
    # warmup, in the dtype the chip is built for.
    x_0 = 0.05 * np.asarray(bf.utils.sobol.multivariate_normal(
        np.zeros(D), np.eye(D), n_chain))

    # warm up compile with a tiny run on the same driver configuration
    trace = bf.NTrace(n_chain=n_chain, n_iter=n_iter + 3, n_warmup=n_iter + 2,
                      x_0=x_0)
    tt = bf.sample(den, trace, n_run=2, verbose=False, n_update=2)

    t0 = time.time()
    bf.sample(den, tt, n_run=n_iter, verbose=False, n_update=n_iter)
    dt = time.time() - t0

    total_iters = n_chain * n_iter
    value = total_iters / dt
    baseline = 88.0  # 8 chains x ~11 warmup it/s/chain on the Cori node
    print(json.dumps({
        'metric': 'banana32_nuts_warmup_iters_per_sec',
        'value': round(value, 2),
        'unit': 'iterations/sec (all chains, 1 chip)',
        'vs_baseline': round(value / baseline, 3),
    }))


if __name__ == '__main__':
    main()
