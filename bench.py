"""Benchmark: batched NUTS on the 32-d Banana density (BASELINE.md flagship).

Reference anchor: the bayesfast banana-gbs example runs 8 chains on an
8-process Cori node at ~11 warmup iterations/sec/chain (~88 it/s aggregate).
Here the same density (D=32, Q=0.01, hard bounds [-15, 15], random SO(32)
rotation, identical NUTS configuration) runs as one jitted float32 program
with the chain axis batched on a single chip.

The chains start from the honest raw Sobol cold start: the framework's
start-descent + reasonable-step probe (exact-n_call-accounted features, see
``core.sample``) handle the |logp| ~ 3e6 landing zone. Since round 3 the
package forces float32-accurate matmuls (``config.set_matmul_precision``),
which removed the bf16-matmul gradient noise that previously saturated every
float32 tree at the max-depth cap: post-warmup mean tree depth now sits below
the cap and float32 matches float64 acceptance.

Warmup throughput is the headline (vs_baseline); "extra" carries post-warmup
ESS/sec/chip with a cross-chain-group error bar (the BASELINE.json
north-star metric), tree statistics, leapfrogs/sec, and a measured roofline:
the kernel's implied HBM traffic per second against the chip's *achieved*
copy bandwidth measured in the same process.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import os
import time

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))


def _setup_cache(jax):
    """Persistent XLA compile cache: the flat-tree NUTS program takes
    minutes to compile at large chain counts; repeat runs of the same
    configuration (including the driver's) should pay it once."""
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(_REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)


def _measured_copy_bw(jnp, reps=8):
    """Achieved HBM streaming bandwidth (read+write) for big f32 buffers.

    Times a chain of full-array multiplies at two sizes and differences
    them, so the fixed per-dispatch latency (milliseconds over a remote-TPU
    tunnel) cancels: BW = (bytes_big - bytes_small) / (t_big - t_small).
    Two platform gotchas force this shape: device-side repeat loops are
    useless (XLA unrolls/fuses elementwise chains into one memory pass and
    hoists scaled reductions — both measured as absurd >100 TB/s), and
    ``block_until_ready`` does not synchronize on the tunneled platform, so
    completion is forced by a 4-byte element transfer.
    """
    import jax
    f = jax.jit(lambda a: a * 1.0000001)

    def time_chain(n_bytes):
        x = jnp.ones(n_bytes // 4, jnp.float32)
        y = f(x)
        float(y[0])  # warm compile (pass + slice)
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                x = f(x)
            float(x[0])
            best = min(best, (time.time() - t0) / reps)
        return best

    small, big = 1 << 27, 1 << 30
    t_small = time_chain(small)
    t_big = time_chain(big)
    return 2 * (big - small) / max(t_big - t_small, 1e-9) / 1e9


def _measured_matmul_tflops(jnp, reps=8):
    """Achieved f32 matmul throughput at the session's matmul precision.

    Same differenced-size shape as ``_measured_copy_bw`` so the tunnel's
    per-dispatch latency cancels. This is the honest MXU "peak" for the
    FLOP-side roofline: the package forces f32-accurate matmuls
    (multi-pass bf16 on the MXU), so the nominal bf16 peak is not the
    achievable ceiling for this workload.
    """
    import jax
    f = jax.jit(lambda x, w: x @ w)

    def time_mm(n):
        x = jnp.ones((n, n), jnp.float32)
        w = jnp.eye(n, dtype=jnp.float32) * 1.0000001
        y = f(x, w)
        float(y[0, 0])  # warm compile
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                x = f(x, w)
            float(x[0, 0])
            best = min(best, (time.time() - t0) / reps)
        return best

    # both sizes sit well inside the compute-bound regime, so the
    # differenced rate assumes equal MXU efficiency at the two sizes —
    # at 4096/8192 that holds to a few percent (a 2048 small size ran at
    # visibly lower efficiency and overstated the differenced peak)
    small, big = 4096, 8192
    t_small = time_mm(small)
    t_big = time_mm(big)
    flops = 2 * (big ** 3 - small ** 3)
    return flops / max(t_big - t_small, 1e-9) / 1e12


def main():
    import jax
    _setup_cache(jax)
    import jax.numpy as jnp
    import bayesfast_tpu as bf
    from bayesfast_tpu.utils.acor import effective_sample_size

    n_chain = int(os.environ.get('BENCH_N_CHAIN', 1024))
    n_warmup = int(os.environ.get('BENCH_N_WARMUP', 400))
    n_post = int(os.environ.get('BENCH_N_POST', 300))
    # the Pallas whole-transition megakernel with XLA fallback; override
    # with BENCH_NUTS_KERNEL=xla to bench the flat XLA tree loop
    bf.config.set_nuts_kernel(os.environ.get('BENCH_NUTS_KERNEL', 'auto'))

    D, Q = 32, 0.01
    lower = np.full(D, -15.)
    upper = np.full(D, 15.)
    bound = np.stack((lower, upper)).T
    const = float(np.sum(np.log(upper - lower)))
    from scipy.stats import special_ortho_group
    A = jnp.asarray(special_ortho_group.rvs(D, random_state=0),
                    dtype=jnp.float32)
    # even-pair mask formulation: same math as z[::2]/z[1::2], but strided
    # slices become gathers under vmap, which Mosaic cannot lower
    even = jnp.asarray((np.arange(D) % 2) == 0, jnp.float32)

    def logp(x):
        z = x @ A.T
        zn = jnp.roll(z, -1, axis=-1)
        t = (z * z - zn) ** 2 / Q + (z - 1.0) ** 2
        return -jnp.sum(t * even) - const

    bf.utils.set_generator(32)
    den = bf.DensityLite(logp=logp, input_size=D, input_scales=bound,
                         hard_bounds=True)

    trace = bf.NTrace(n_chain=n_chain, n_iter=n_warmup + n_post,
                      n_warmup=n_warmup)

    # compile + start-descent + probe warm pass (2 iterations)
    tt = bf.sample(den, trace, n_run=2, verbose=False, n_update=2)

    # chunked device calls: the remote-TPU tunnel kills minutes-long
    # single XLA programs, and chunking costs <1% at these shapes
    t0 = time.time()
    tt = bf.sample(den, tt, n_run=n_warmup - 2, verbose=False, n_update=100)
    dt_warm = time.time() - t0

    # post phase in 3 timed segments: the segment-rate spread is the
    # run-to-run stability bar for the headline numbers (tunnel variance
    # was the suspected source of the r3 bench-vs-RESULTS discrepancy)
    seg_rates = []
    dt_post = 0.0
    seg = n_post // 3
    for i in range(3):
        n_seg = seg if i < 2 else n_post - 2 * seg
        t0 = time.time()
        tt = bf.sample(den, tt, n_run=n_seg, verbose=False,
                       n_update=n_seg)
        dt = time.time() - t0
        seg_rates.append(n_chain * n_seg / dt)
        dt_post += dt

    warm_iters_per_sec = n_chain * (n_warmup - 2) / dt_warm
    baseline = 88.0  # 8 chains x ~11 warmup it/s/chain on the Cori node

    # post-warmup effective samples per second on this one chip, with a
    # cross-group error bar: ESS is estimated independently on 8 disjoint
    # chain groups; the total is their sum and the quoted error is the
    # group scatter propagated to the sum
    s = tt.get(flatten=False)                      # (chain, iter, dim)
    n_grp = 8
    gs = n_chain // n_grp
    ess_g = np.array([
        np.sum(effective_sample_size(s[g * gs:(g + 1) * gs])) / s.shape[-1]
        for g in range(n_grp)])
    ess = float(np.sum(ess_g))
    ess_err = float(np.std(ess_g, ddof=1) * np.sqrt(n_grp))
    ess_per_sec = ess / dt_post
    # integrated autocorrelation time and the emcee-style N >= 50 tau
    # reliability check for the autocorrelation fit
    tau = s.shape[1] / max(ess / n_chain, 1e-12)
    ess_reliable = bool(s.shape[1] >= 50 * tau)

    st = tt.trace._stats_arrays
    depth_post = float(np.mean(st['tree_depth'][:, n_warmup:]))
    size_post = float(np.mean(st['tree_size'][:, n_warmup:]))
    leapfrogs_per_sec = n_chain * n_post * size_post / dt_post

    # ---- measured roofline (HBM side; this kernel is bandwidth/VPU bound,
    # the only matmul is the (C,32)x(32,32) rotation) ----
    # implied bytes per tree-leaf iteration, from the kernel layout
    # (samplers/nuts.py): leapfrog reads+writes the 8-vector (D, C) state
    # twice over (Kahan q/p + v + grad) ~ 16 D C f32 transfers; the fused
    # first merge / frame push move ~2 frames of (3D+1+D+2) rows; cur-select
    # rewrites the 8-vector state once more.
    frame_rows = 4 * D + 3
    bytes_per_leaf = (16 * D + 8 * D + 2 * frame_rows) * 4
    implied_gbs = leapfrogs_per_sec * bytes_per_leaf / 1e9
    copy_bw = _measured_copy_bw(jnp)
    hbm_util = implied_gbs / copy_bw

    # ---- FLOP side: each leaf runs the (C, D) x (D, D) rotation twice
    # (value + grad), 2 flops/MAC, per chain -> 4 D^2 flops/leaf/chain.
    # Utilization is quoted against the chip's *measured* f32 matmul rate
    # at the same (forced-accurate) precision, not a nominal bf16 peak.
    implied_tflops = leapfrogs_per_sec * 4 * D * D / 1e12
    mm_peak = _measured_matmul_tflops(jnp)
    mxu_util = implied_tflops / mm_peak

    print(json.dumps({
        'metric': 'banana32_nuts_warmup_iters_per_sec',
        'value': round(warm_iters_per_sec, 2),
        'unit': 'iterations/sec (all chains, 1 chip)',
        'vs_baseline': round(warm_iters_per_sec / baseline, 3),
        'extra': {
            'n_chain': n_chain,
            'ess_per_sec_per_chip': round(ess_per_sec, 1),
            'ess_per_sec_err': round(ess_err / dt_post, 1),
            'ess_total': round(ess, 1),
            'tau_iterations': round(tau, 2),
            'ess_estimate_reliable_n_ge_50tau': ess_reliable,
            'post_iters_per_sec': round(n_chain * n_post / dt_post, 1),
            'post_iters_per_sec_segments': [round(r, 1)
                                            for r in seg_rates],
            'nuts_kernel': bf.config.get_nuts_kernel(),
            'mean_tree_depth_post': round(depth_post, 2),
            'mean_tree_size_post': round(size_post, 1),
            'leapfrogs_per_sec': round(leapfrogs_per_sec, 0),
            'implied_hbm_gb_per_sec': round(implied_gbs, 1),
            'measured_copy_bw_gb_per_sec': round(copy_bw, 1),
            'hbm_utilization_vs_copy_peak': round(hbm_util, 3),
            'implied_matmul_tflops': round(implied_tflops, 3),
            'measured_matmul_peak_tflops': round(mm_peak, 1),
            'mxu_utilization_vs_measured_peak': round(mxu_util, 4),
            'n_call': int(tt.n_call),
        },
    }))


if __name__ == '__main__':
    main()
