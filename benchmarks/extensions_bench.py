"""Do the TPU-native extensions earn their keep? (VERDICT round-1 item 10)

Head-to-head ESS/sec of the two extensions against the batched-NUTS
default, on the geometry each one targets:

1. ChEES-HMC vs NUTS — 64-d ill-conditioned Gaussian (condition number
   1e4): ChEES runs lockstep jittered-length trajectories with no tree
   bookkeeping, so when NUTS trees are deep the per-iteration overhead
   difference shows up directly in ESS/sec.
2. Pooled-metric NUTS vs per-chain NUTS at a SHORT warmup (150
   iterations) — the pooled Welford sees n_chain samples per iteration,
   so the mass matrix converges ~n_chain times faster in iterations;
   per-chain adaptation is still raw when the warmup budget is tight.

Each case prints one JSON line; float32, 1024 chains, one chip.
"""

import json
import os
import time

import numpy as np


def main():
    import jax.numpy as jnp
    import bayesfast_tpu as bf
    from bayesfast_tpu.utils.acor import effective_sample_size

    C = int(os.environ.get('BENCH_N_CHAIN', 1024))
    D = 64
    scales = np.logspace(0, 2, D)  # condition number 1e4
    s2 = jnp.asarray(scales ** 2, jnp.float32)

    def logp(x):
        return -0.5 * jnp.sum(x * x / s2)

    def run(sampler, n_warmup, n_post, **trace_kw):
        bf.utils.set_generator(7)
        den = bf.DensityLite(logp=logp, input_size=D)
        trace_kw.update(n_chain=C, n_iter=n_warmup + n_post,
                        n_warmup=n_warmup)
        tt = bf.sample(den, trace_kw, sampler=sampler, n_run=2,
                       verbose=False, n_update=2)
        tt = bf.sample(den, tt, n_run=n_warmup - 2, verbose=False,
                       n_update=n_warmup)
        t0 = time.time()
        tt = bf.sample(den, tt, n_run=n_post, verbose=False, n_update=n_post)
        dt = time.time() - t0
        s = tt.get(flatten=False)
        ess = float(np.sum(effective_sample_size(s)) / D)
        # worst-dimension ESS is what converges slowest on anisotropic
        # targets
        ess_min = float(np.min(effective_sample_size(s)))
        return {'ess_per_sec': round(ess / dt, 1),
                'ess_min_per_sec': round(ess_min / dt, 1),
                'post_wall_s': round(dt, 1),
                'n_call': int(tt.n_call)}

    out = {'n_chain': C, 'dim': D, 'condition': 1e4, 'cases': {}}

    out['cases']['nuts'] = run('NUTS', 500, 500)
    out['cases']['chees'] = run('CHEES', 500, 500)
    out['cases']['nuts_short_warmup'] = run('NUTS', 150, 500)
    out['cases']['pooled_short_warmup'] = run('NUTS', 150, 500,
                                              pooled_metric=True)
    # ultra-short warmup: per-chain Welford cannot even fill its first
    # adaptation window (60 iters), the pooled metric sees n_chain samples
    # per iteration
    out['cases']['nuts_w50'] = run('NUTS', 50, 500)
    out['cases']['pooled_w50'] = run('NUTS', 50, 500, pooled_metric=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
