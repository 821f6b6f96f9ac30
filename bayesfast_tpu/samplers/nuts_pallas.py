"""Whole-transition NUTS megakernel (Pallas TPU).

Motivation: the XLA formulation of the iterative tree loop
(``nuts.nuts_core_batched``) is structurally tight but executes ~90 small
sequential HLO ops per leaf iteration, each paying fixed dispatch latency —
profiled at ~17.9x the leapfrog memory floor at 2048 chains, with the chip
>98% idle. This kernel collapses an ENTIRE NUTS transition (momentum
in-hand, every doubling, every binary-counter merge, every U-turn check)
into ONE ``pallas_call``: the tree loop runs as a ``lax.while_loop``
*inside* the kernel, all state lives in VMEM for the duration, and the
per-iteration uniforms come from the on-core PRNG
(``pltpu.prng_random_bits``) instead of counter-based host keys.

Semantics mirror ``nuts.nuts_core_batched`` (itself matching the
reference's recursive builder, ``bayesfast/samplers/nuts.py:22-217``):
multinomial proposal via log-size logbern at every merge, generalized
U-turn checks including the extra inner-subtree checks at merged depth > 1
and at every main-tree extension, divergence on ``|dE| >= max_change``,
per-leaf acceptance statistics, aborted extensions never merging. The ONLY
behavioral difference is the random stream (hardware PRNG vs
``jax.random``) — per-transition statistics are distribution-identical but
not bitwise-reproducible against the XLA kernel.

Scope (the fast path's contract, checked by the wrapper):
  * diagonal metric (shared or per-chain);
  * the density's batched ``logp_and_grad`` must trace into Mosaic — pure
    ``jnp`` elementwise + ``dot`` ops (the wrapper falls back to the XLA
    kernel at build time if lowering fails);
  * float32 lane-minor blocks: chains are tiled in ``block`` lanes per
    grid cell, every vector is (D, block), per-chain scalars (1, block).

Each grid cell runs its own while loop to completion, so a block whose
chains all finish early stops integrating — finer-grained than the global
all-lanes loop of the XLA path.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .metrics import DiagMetricState
from .nuts import NutsStats

__all__ = ['nuts_transition_batched_pallas', 'nuts_chunk_batched_pallas',
           'nuts_warmup_chunk_batched_pallas',
           'make_nuts_pallas', 'make_nuts_pallas_multi',
           'make_nuts_pallas_warmup']


def _fmix32(x):
    """murmur3 finalizer: full-avalanche bijection on uint32."""
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _uniforms(seed, it, salt, shape, lane_off):
    """Counter-based f32 uniforms in [0, 1), pure jnp uint32 ops.

    Stateless — (seed, iteration, salt, GLOBAL chain index) fully
    determine the draw — so the stream is identical in compiled Mosaic
    and interpret mode, letting CPU tests validate the exact compiled
    behavior (the TPU hardware PRNG has no interpret-mode
    implementation), AND identical across topologies: ``lane_off`` is
    the block's global chain offset (shard start + block start), so a
    mesh-sharded run, a single-chip run, and a resumed run with a
    different block size all draw the same numbers for the same chain.
    Two murmur3 finalizer rounds over golden-ratio-spread counters give
    full avalanche between neighboring counters.
    """
    lane = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + lane_off
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    x = (seed
         ^ (lane * jnp.uint32(0x9E3779B9))
         ^ (row * jnp.uint32(0x7FEB352D))
         ^ (it.astype(jnp.uint32) * jnp.uint32(0x85EBCA77))
         ^ jnp.uint32(salt) * jnp.uint32(0xC2B2AE3D))
    x = _fmix32(_fmix32(x) + jnp.uint32(0x165667B1))
    fl = jax.lax.bitcast_convert_type(
        (x >> jnp.uint32(9)) | jnp.uint32(0x3F800000), jnp.float32)
    return fl - 1.0


@functools.lru_cache(maxsize=None)
def _schedule_table(max_treedepth):
    """Precomputed per-iteration tree schedule.

    The binary-counter schedule (which subtree a leaf belongs to, how many
    merges follow it, where its frame pushes) is a pure function of the
    global leaf index — no data dependence — so it is tabulated host-side
    and read back as cheap SMEM scalar loads. Computing it in-kernel (a
    scalar fori for the trailing-ones count plus shift/compare chains)
    serializes the scalar core against the vector pipeline every
    iteration.

    Rows: [pending, sub_done, w_idx, depth_s] for every global leaf index
    of a full tree (sum over doublings of 2^d leaves).
    """
    n_lvl = max(int(max_treedepth) - 1, 1)
    rows = []
    for depth_s in range(int(max_treedepth)):
        for k in range(2 ** depth_s):
            x, pending = k, 0
            while x & 1:
                pending += 1
                x >>= 1
            sub_done = int(k + 1 == 2 ** depth_s)
            w_idx = n_lvl if sub_done else pending
            rows.append((pending, sub_done, w_idx, depth_s))
    return np.asarray(rows, np.int32).T.copy()  # (4, total_leaves)


def _transition_core(seed, q0, p0, step_size, sched_ref, stack_ref,
                     lane_off, *, velocity, lpg_t, D, Cb, max_treedepth,
                     max_change, dtype):
    """One full NUTS transition for one chain block, as VMEM values.

    Shared by the single-transition kernel and the multi-transition chunk
    kernel. All shapes static: vectors (D, Cb), per-chain scalars (1, Cb).
    Returns ``(q_prop, energy, logp, d_energy, depth, tree_size,
    accept_sum, max_de, diverging)``.
    """
    n_lvl = max(int(max_treedepth) - 1, 1)
    P = D + 2                      # proposal rows: q, energy, logp
    TOT = 3 * D + 1 + P            # stack frame rows

    def energy_of(p, v, logp2):
        return 0.5 * jnp.sum(p * v, axis=0, keepdims=True) - logp2

    def kahan_add(x, c, delta):
        y = delta - c
        t = x + y
        return t, (t - x) - y

    # ---- start state ----
    logp0, grad0 = lpg_t(q0)
    v0 = velocity(p0)
    e0 = energy_of(p0, v0, logp0)
    # zeros DERIVED FROM LOADED DATA, not jnp.zeros: Mosaic lays constant
    # vectors out replicated, the while carry inherits that layout from the
    # init, and the body's (non-replicated) updates then fail to relayout
    # back into the carry ("invalid relayout ... replicated in destination")
    zero_v = q0 * 0
    zero_s = step_size * 0
    zero_i = zero_s.astype(jnp.int32)

    def leapfrog(eps, q, p, grad, cq, cp):
        """eps (1, Cb) signed; returns the new (q, p, v, grad, e, logp,
        cq, cp)."""
        dt = 0.5 * eps
        p_half, cp = kahan_add(p, cp, dt * grad)
        v_half = velocity(p_half)
        q_new, cq = kahan_add(q, cq, eps * v_half)
        logp, grad = lpg_t(q_new)
        p_new, cp = kahan_add(p_half, cp, dt * grad)
        v_new = velocity(p_new)
        e = energy_of(p_new, v_new, logp)
        return q_new, p_new, v_new, grad, e, logp, cq, cp

    def pack_state(q, p, grad, cq, cp, e, logp):
        return (q, p, grad, cq, cp, e, logp)

    def sel_state(m, a, b):
        return tuple(jnp.where(m, x, y) for x, y in zip(a, b))

    start = pack_state(q0, p0, grad0, zero_v, zero_v, e0, logp0)

    def leaf_frame(q, p, e, logp, d_energy):
        """Depth-1 frame: [left_p | right_p | p_sum | log_size | prop]."""
        return jnp.concatenate(
            [p, p, p, -d_energy, q, e, logp], axis=0)

    def merge_frames(u, t1, t2, merged_depth):
        """Join older/left frame t1 with newer/right frame t2 (both
        (TOT, Cb)); mirrors ``nuts._merge_b`` with the extra inner U-turn
        checks when the merged depth exceeds 1."""
        ps1 = t1[2 * D:3 * D]
        ps2 = t2[2 * D:3 * D]
        p_sum = ps1 + ps2
        p_sum1 = ps1 + t2[0:D]
        p_sum2 = t1[D:2 * D] + ps2
        v1l = velocity(t1[0:D])
        v1r = velocity(t1[D:2 * D])
        v2l = velocity(t2[0:D])
        v2r = velocity(t2[D:2 * D])
        d0 = jnp.sum(p_sum * v1l, axis=0, keepdims=True)
        d1 = jnp.sum(p_sum * v2r, axis=0, keepdims=True)
        d2 = jnp.sum(p_sum1 * v1l, axis=0, keepdims=True)
        d3 = jnp.sum(p_sum1 * v2l, axis=0, keepdims=True)
        d4 = jnp.sum(p_sum2 * v1r, axis=0, keepdims=True)
        d5 = jnp.sum(p_sum2 * v2r, axis=0, keepdims=True)
        turning = (d0 <= 0) | (d1 <= 0)
        extra = (d2 <= 0) | (d3 <= 0) | (d4 <= 0) | (d5 <= 0)
        turning = turning | ((merged_depth > 1) & extra)
        ls1 = t1[3 * D:3 * D + 1]
        ls2 = t2[3 * D:3 * D + 1]
        log_size = jnp.logaddexp(ls1, ls2)
        take2 = jnp.log(u) < ls2 - log_size
        tail = jnp.where(take2, t2[3 * D + 1:], t1[3 * D + 1:])
        merged = jnp.concatenate(
            [t1[0:D], t2[D:2 * D], p_sum, log_size, tail], axis=0)
        return merged, turning

    # ---- loop carry (values; Mosaic keeps them in VMEM) ----
    init = (
        start,                    # cur integrator state (7-tuple)
        start,                    # left
        start,                    # right
        jnp.concatenate([q0, e0, logp0], axis=0),   # prop (P, Cb)
        p0,                       # p_sum
        zero_s,                   # log_size
        zero_i,                   # depth
        # per-lane flags carried as int32 — Mosaic cannot round-trip i1
        # vectors through the loop carry (i8 memory -> i1 truncation)
        (_uniforms(seed, jnp.int32(-1), 7, (1, Cb), lane_off) < 0.5
         ).astype(jnp.int32),     # go_right
        zero_s,                   # eps (filled below)
        zero_s,                   # accept_sum
        zero_i,                   # n_prop
        zero_s,                   # max_de
        zero_i,                   # diverging
        zero_i,                   # done
        jnp.int32(0),             # it (global iteration counter for RNG)
    )
    # stale frames must hold finite momenta (masked merges still compute
    # on them), so the scratch stack is zeroed up front (per transition:
    # frames left by a previous transition could hold -inf log-sizes)
    stack_ref[...] = jnp.zeros((n_lvl + 1, TOT, Cb), dtype)
    eps0 = jnp.where(init[7] != 0, step_size, -step_size)
    init = init[:8] + (eps0,) + init[9:]

    def cond(c):
        return jnp.any(c[13] == 0)

    def body(c):
        (cur, left, right, prop, p_sum, log_size,
         depth, go_right_i, eps, accept_sum, n_prop, max_de, diverging_i,
         done_i, it) = c
        go_right = go_right_i != 0
        diverging = diverging_i != 0
        done = done_i != 0
        u = _uniforms(seed, it, 0, (3, Cb), lane_off)
        u0 = u[0:1]
        u1 = u[1:2]
        u2 = u[2:3]
        active = ~done

        # ---- one leapfrog, every iteration ----
        cq, cp = cur[3], cur[4]
        nq, npm, nv, ng, ne, nlp, ncq, ncp = leapfrog(
            eps, cur[0], cur[1], cur[2], cq, cp)
        new_state = pack_state(nq, npm, ng, ncq, ncp, ne, nlp)
        d_energy = ne - e0
        d_energy = jnp.where(jnp.isnan(d_energy), jnp.inf, d_energy)
        div = active & ~(jnp.abs(d_energy) < max_change)
        upd = active & (jnp.abs(d_energy) > jnp.abs(max_de))
        max_de = jnp.where(upd, d_energy, max_de)
        accept = jnp.minimum(1.0, jnp.exp(-d_energy))
        accept_sum = accept_sum + jnp.where(active & ~div, accept, 0.)
        # int arithmetic, not active.astype: Mosaic gives i1->i32 extensions
        # of carried-flag predicates a replicated layout that the add then
        # cannot consume (invalid relayout)
        n_prop = n_prop + 1 - done_i
        cur = sel_state(active & ~div, new_state, cur)
        diverging = diverging | div

        # data-independent tree schedule, tabulated host-side (SMEM loads)
        pending = sched_ref[0, it]
        sub_done = sched_ref[1, it] == 1
        w_idx = sched_ref[2, it]

        # ---- binary-counter merges, branched on the SCALAR schedule: the
        # false branch of a Mosaic cond is a real jump (unlike XLA:TPU
        # conds, which materialize pass-through copies), so iterations
        # with no pending merge (half of all leaves) skip the merge math
        # entirely ----
        leaf_vec = leaf_frame(nq, npm, ne, nlp, d_energy)
        ok_merge = active & ~div

        def first_merge(_):
            t1 = stack_ref[0]
            merged, mturn = merge_frames(u0, t1, leaf_vec, jnp.int32(1))
            inc = jnp.where(ok_merge, merged, t1)
            turned = ok_merge & mturn

            def deep_cond(s):
                return s[0] < pending

            def deep_body(s):
                m, inc, turned_i = s
                turned = turned_i != 0
                # counter stride tied to max_treedepth so (it, m) pairs
                # never collide for user-raised tree depths (> 16 would
                # have reused uniforms across merges with a fixed 16)
                um = _uniforms(
                    seed, it * jnp.int32(max_treedepth + 1) + m, 3,
                    (1, Cb), lane_off)
                t1 = stack_ref[m]
                merged, mturn = merge_frames(um, t1, inc, m + 1)
                ok = ok_merge & ~turned
                inc = jnp.where(ok, merged, inc)
                return m + 1, inc, (turned | (ok & mturn)).astype(jnp.int32)

            _, inc, turned_i = jax.lax.while_loop(
                deep_cond, deep_body,
                (jnp.int32(1), inc, turned.astype(jnp.int32)))
            return inc, turned_i

        inc, turning_sub_i = jax.lax.cond(
            pending > 0, first_merge,
            lambda _: (leaf_vec, zero_i), None)
        turning_sub = turning_sub_i != 0

        abort = div | turning_sub
        stack_ref[w_idx] = inc
        # depth counts completed doublings plus the aborted extension
        # (data-derived 0/1 operands: see the n_prop layout note above)
        depth = depth + jnp.where(active & (abort | sub_done),
                                  zero_i + 1, zero_i)
        done = done | (active & abort)

        # ---- subtree completion: runs only when the schedule says the
        # subtree is whole (once per doubling) ----
        def completion(args):
            (cur, left, right, prop, p_sum, log_size, go_right_i, eps,
             done_i2) = args
            go_right = go_right_i != 0
            done = done_i2 != 0
            ok = active & ~abort
            sub_ls = inc[3 * D:3 * D + 1]
            take = ok & (jnp.log(u1) < sub_ls - log_size)
            prop = jnp.where(take, inc[3 * D + 1:], prop)
            log_size = jnp.where(ok, jnp.logaddexp(log_size, sub_ls),
                                 log_size)
            sub_p_sum = inc[2 * D:3 * D]
            p_sum_new = p_sum + sub_p_sum

            new_left = sel_state(go_right, left, cur)
            new_right = sel_state(go_right, cur, right)

            # main-tree U-turn checks (halves in spatial order)
            inc_left_p = inc[0:D]
            inc_left_v = velocity(inc_left_p)
            left_v = velocity(left[1])
            right_v = velocity(right[1])
            cur_v = velocity(cur[1])
            lm_psum = jnp.where(go_right, p_sum, sub_p_sum)
            rm_psum = jnp.where(go_right, sub_p_sum, p_sum)
            lm_begin_v = jnp.where(go_right, left_v, cur_v)
            lm_end_p = jnp.where(go_right, right[1], inc_left_p)
            lm_end_v = jnp.where(go_right, right_v, inc_left_v)
            rm_begin_p = jnp.where(go_right, inc_left_p, left[1])
            rm_begin_v = jnp.where(go_right, inc_left_v, left_v)
            rm_end_v = jnp.where(go_right, cur_v, right_v)
            p_sum1 = lm_psum + rm_begin_p
            p_sum2 = lm_end_p + rm_psum
            nl_v = velocity(new_left[1])
            nr_v = velocity(new_right[1])
            t0 = jnp.sum(p_sum_new * nl_v, axis=0, keepdims=True)
            t1d = jnp.sum(p_sum_new * nr_v, axis=0, keepdims=True)
            t2d = jnp.sum(p_sum1 * lm_begin_v, axis=0, keepdims=True)
            t3d = jnp.sum(p_sum1 * rm_begin_v, axis=0, keepdims=True)
            t4d = jnp.sum(p_sum2 * lm_end_v, axis=0, keepdims=True)
            t5d = jnp.sum(p_sum2 * rm_end_v, axis=0, keepdims=True)
            turning_full = ((t0 <= 0) | (t1d <= 0) | (t2d <= 0) |
                            (t3d <= 0) | (t4d <= 0) | (t5d <= 0))

            left = sel_state(ok, new_left, left)
            right = sel_state(ok, new_right, right)
            p_sum = jnp.where(ok, p_sum_new, p_sum)
            finished = ok & (turning_full | (depth >= max_treedepth))
            done = done | finished

            start_next = ok & ~finished
            gr_new = u2 < 0.5
            # selects over BOOL values trip Mosaic's i1/i8 legalization —
            # keep flags int32 through updates, bools only as predicates
            go_right_i = jnp.where(start_next, gr_new.astype(jnp.int32),
                                   go_right_i)
            eps = jnp.where(start_next,
                            jnp.where(gr_new, step_size, -step_size), eps)
            next_end = sel_state(gr_new, right, left)
            cur = sel_state(start_next, next_end, cur)
            return (cur, left, right, prop, p_sum, log_size, go_right_i,
                    eps, done.astype(jnp.int32))

        (cur, left, right, prop, p_sum, log_size, go_right_i, eps,
         done_i3) = jax.lax.cond(
            sub_done, completion, lambda a: a,
            (cur, left, right, prop, p_sum, log_size,
             go_right.astype(jnp.int32), eps, done.astype(jnp.int32)))

        return (cur, left, right, prop, p_sum, log_size,
                depth, go_right_i, eps, accept_sum, n_prop,
                max_de, diverging.astype(jnp.int32),
                done_i3, it + 1)

    out = jax.lax.while_loop(cond, body, init)
    prop = out[3]
    return (prop[0:D],               # q_prop
            prop[D:D + 1],           # energy
            prop[D + 1:D + 2],       # logp
            prop[D:D + 1] - e0,      # energy_change
            out[6],                  # tree_depth
            out[10],                 # tree_size
            out[9],                  # accept_sum
            out[11],                 # max_de
            out[12].astype(jnp.int32))  # diverging


def _gauss_from_uniforms(seed, counter, salt, shape, lane_off):
    """Box-Muller standard normals from the counter-based uniform stream.

    Two uniforms per normal (one pair per element — simple and exact;
    the draw happens once per transition, amortized over ~hundreds of
    leapfrogs). ``1 - u`` keeps the log argument in (0, 1].
    """
    u1 = _uniforms(seed, counter, salt, shape, lane_off)
    u2 = _uniforms(seed, counter, salt + 1, shape, lane_off)
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _nuts_block_kernel(seed_ref, q0_ref, var_ref, eps_ref, sched_ref,
                       qo_ref, logp_ref, en_ref, de_ref, depth_ref,
                       size_ref, asum_ref, mde_ref, div_ref, stack_ref,
                       *, lpg_t, D, Cb, max_treedepth, max_change, dtype):
    """One chain block, one full NUTS transition (momentum drawn
    in-kernel from the global-chain-indexed counter RNG, so the stream
    is identical under any sharding/block geometry)."""
    seed = seed_ref[0, 0].astype(jnp.uint32)
    lane_off = (seed_ref[0, 1].astype(jnp.uint32)
                + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(Cb))

    def velocity(p):
        return var_ref[:] * p

    z = _gauss_from_uniforms(seed, jnp.int32(-9), 16, (D, Cb), lane_off)
    p0 = z / jnp.sqrt(var_ref[:])
    (q_prop, en, logp, de, depth, size, asum, mde, div) = _transition_core(
        seed, q0_ref[:], p0, eps_ref[:], sched_ref, stack_ref, lane_off,
        velocity=velocity, lpg_t=lpg_t, D=D, Cb=Cb,
        max_treedepth=max_treedepth, max_change=max_change, dtype=dtype)
    qo_ref[:] = q_prop
    en_ref[:] = en
    logp_ref[:] = logp
    de_ref[:] = de
    depth_ref[:] = depth
    size_ref[:] = size
    asum_ref[:] = asum
    mde_ref[:] = mde
    div_ref[:] = div


def _nuts_multi_kernel(seed_ref, q0_ref, var_ref, eps_ref, sched_ref,
                       qo_ref, logp_ref, en_ref, de_ref, depth_ref,
                       size_ref, asum_ref, mde_ref, div_ref, qf_ref,
                       stack_ref, *, lpg_t, K, D, Cb, max_treedepth,
                       max_change, dtype):
    """One chain block, ``K`` consecutive NUTS transitions in ONE kernel.

    The post-warmup fast path: step size and metric are frozen after
    warmup (dual averaging and Welford adaptation mask to no-ops,
    ``step_size.py``/``metrics.py``), so an entire driver chunk collapses
    into a single ``pallas_call`` — momentum refreshes run in-kernel
    (Box-Muller over the counter RNG), and each transition's sample and
    stats are written to output row ``t`` (a scalar index — transitions
    stay block-synchronous). This removes the per-transition XLA glue
    that dominated the driver wall (measured 17.7k vs 74.8k raw-kernel
    chain-samples/s at banana-32 f32 @1024 on one v5e chip).

    Outputs are (K, D, block) / (K, 1, block) blocks plus the final
    position ``qf`` consumed as the next chunk's start.
    """
    seed = seed_ref[0, 0].astype(jnp.uint32)
    i0 = seed_ref[0, 1].astype(jnp.uint32)   # global iteration offset
    lane_off = (seed_ref[0, 2].astype(jnp.uint32)
                + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(Cb))

    def velocity(p):
        return var_ref[:] * p

    step_size = eps_ref[:]
    sqrt_var = jnp.sqrt(var_ref[:])    # p ~ N(0, var^-1): p = z / sqrt(var)

    def body(t, q):
        # an independent counter-stream per transition, keyed by the
        # GLOBAL iteration index (i0 + t): the stream then depends only on
        # the chain key and the transition's position in the run, so a
        # checkpoint resumed with different chunk boundaries reproduces
        # the uninterrupted run bitwise. In-tree counters (leaf its, merge
        # products) stay well below 2^24, so folding the index through the
        # full-avalanche finalizer gives non-overlapping streams.
        seed_t = seed ^ _fmix32(i0 + t.astype(jnp.uint32)
                                + jnp.uint32(0x9E3779B9))
        z = _gauss_from_uniforms(seed_t, jnp.int32(-9), 16, (D, Cb),
                                 lane_off)
        p0 = z / sqrt_var
        (q_prop, en, logp, de, depth, size, asum, mde, div) = \
            _transition_core(
                seed_t, q, p0, step_size, sched_ref, stack_ref, lane_off,
                velocity=velocity, lpg_t=lpg_t, D=D, Cb=Cb,
                max_treedepth=max_treedepth, max_change=max_change,
                dtype=dtype)
        qo_ref[t] = q_prop
        en_ref[t] = en
        logp_ref[t] = logp
        de_ref[t] = de
        depth_ref[t] = depth
        size_ref[t] = size
        asum_ref[t] = asum
        mde_ref[t] = mde
        div_ref[t] = div
        return q_prop

    q_fin = jax.lax.fori_loop(0, K, body, q0_ref[:])
    qf_ref[:] = q_fin


def _lane_bytes(D):
    """Measured scoped-VMEM footprint per lane at D=32 is ~43 KB (stack +
    double-buffered while carry + density temporaries) ~= 1350 bytes x D."""
    return 1350 * D


@functools.lru_cache(maxsize=None)
def _block_for(C, D):
    """Lane-block width: multiples of 128 lanes, capped by a VMEM budget.

    128 lanes measured fastest at D=32 (43.4 vs 47.7/48.1 us per
    leapfrog-equivalent for 256/512 at 2048 chains): a block retires
    with its SLOWEST lane's tree, so narrower blocks waste fewer
    iterations on block-synchronous retirement, and at the VPU-native
    128-lane tile the per-op cost does not grow. Wider blocks remain
    available for shapes that need them.
    """
    budget = 56 * 2 ** 20
    for b in (128, 256, 512):
        if C % b == 0 and _lane_bytes(D) * b <= budget:
            return b
    # small/odd chain counts: single block
    return C


def _pack_const(c):
    """Lower one hoisted closure constant to a Pallas-friendly input:
    bools ride as int32, sub-2-d shapes get leading singleton dims."""
    c = jnp.asarray(c)
    is_bool = c.dtype == jnp.bool_
    if is_bool:
        c = c.astype(jnp.int32)
    shape = c.shape
    if c.ndim == 0:
        c = c.reshape(1, 1)
    elif c.ndim == 1:
        c = c.reshape(1, -1)
    return c, shape, is_bool


def _unpack_const(ref, shape, is_bool):
    if shape == ():               # scalar: riding in SMEM
        x = ref[0, 0]
    else:
        x = ref[:]
        x = x.reshape(shape) if shape != x.shape else x
    return (x != 0) if is_bool else x


def _trace_density(lpg_pb, params, D, block, dtype):
    """Trace the per-point density to a closed jaxpr over lane-minor
    (D, block) positions; pack its closure constants and dynamic-parameter
    example leaves into Pallas-friendly inputs. Shared by the single- and
    multi-transition kernel builders."""
    flat_params, params_tree = jax.tree.flatten(params)
    p_ex = [jax.ShapeDtypeStruct(jnp.shape(l), jnp.result_type(l))
            for l in flat_params]
    n_params = len(flat_params)

    def flatfn(*args):
        p = jax.tree.unflatten(params_tree, list(args[:n_params]))
        # LANE-MINOR vmap: batch the per-point density over axis 1 so the
        # traced jaxpr operates on (D, block) directly — a batch-major
        # trace would force (D,C)<->(C,D) transposes (cross-lane shuffles,
        # the dominant in-kernel cost when profiled) around every logp
        return jax.vmap(lambda x: lpg_pb(p, x),
                        in_axes=1, out_axes=(0, 1))(args[n_params])

    cj = jax.make_jaxpr(flatfn)(
        *p_ex, jax.ShapeDtypeStruct((D, block), dtype))
    packed = [_pack_const(c) for c in cj.consts]
    const_vals = [p[0] for p in packed]
    const_meta = [(p[1], p[2]) for p in packed]

    # parameter meta is computed on example shapes; concrete leaves are
    # packed per call (they are traced runtime values)
    param_meta, param_packed = [], []
    for ex in p_ex:
        pk, shape, is_bool = _pack_const(jnp.zeros(ex.shape, ex.dtype))
        param_meta.append((shape, is_bool))
        param_packed.append(pk)
    return cj, const_vals, const_meta, param_meta, param_packed, n_params


def make_nuts_pallas(lpg_pb, params, D, C, max_treedepth, max_change, dtype,
                     block=None, interpret=False):
    """Build the jittable whole-transition kernel.

    ``lpg_pb(params, x)`` maps a dynamic-parameter pytree plus ONE (D,)
    position to (scalar logp, (D,) grad) and must trace into Mosaic; it is
    vmapped over axis 1 so the kernel-resident jaxpr is natively
    lane-minor (no transposes around the density). The function is
    traced ONCE to a closed jaxpr: its captured constants (rotation
    matrices, bound masks...) and the flattened ``params`` leaves
    (surrogate coefficients — runtime values, so refits never rebuild the
    kernel) all become replicated kernel inputs, and the jaxpr is
    re-evaluated inside the kernel via ``eval_jaxpr``. Momentum is drawn
    in-kernel from the global-chain-indexed counter RNG (``chain_start``
    = this shard's first global chain), so the same seed produces the
    same transition for a chain under ANY sharding/block geometry.
    Returns ``fn(seed, chain_start, q0_t, var_t, eps, flat_params) ->
    dict`` of lane-minor outputs.
    """
    if block is None:
        block = _block_for(C, D)
    if C % block:
        raise ValueError(f'n_chain {C} not divisible by block {block}.')
    grid = (C // block,)

    (cj, const_vals, const_meta, _param_meta, _param_packed,
     n_params) = _trace_density(lpg_pb, params, D, block, dtype)
    n_consts = len(const_vals)

    def kernel(*refs):
        const_refs = refs[5:5 + n_consts]
        param_refs = refs[5 + n_consts:5 + n_consts + n_params]
        cvals = [_unpack_const(r, s, b)
                 for r, (s, b) in zip(const_refs, const_meta)]

        def lpg_t(q_t):
            pvals = [_unpack_const(r, s, b)
                     for r, (s, b) in zip(param_refs, _param_meta)]
            logp, grad = jax.core.eval_jaxpr(
                cj.jaxpr, cvals, *pvals, q_t)
            return logp[None, :], grad

        rest = refs[5 + n_consts + n_params:]
        _nuts_block_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], *rest,
            lpg_t=lpg_t, D=D, Cb=block, max_treedepth=int(max_treedepth),
            max_change=float(max_change), dtype=dtype)

    vec_spec = pl.BlockSpec((D, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    sca_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    def _zero_map(nd):
        return lambda i: (0,) * nd

    def _const_spec(v, orig_shape):
        space = pltpu.SMEM if orig_shape == () else pltpu.VMEM
        return pl.BlockSpec(v.shape, _zero_map(v.ndim), memory_space=space)

    const_specs = [_const_spec(v, m[0])
                   for v, m in zip(const_vals, const_meta)]
    _param_specs = [_const_spec(pk, m[0])
                    for pk, m in zip(_param_packed, _param_meta)]

    sched = _schedule_table(int(max_treedepth))
    sched_spec = pl.BlockSpec(sched.shape, lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    def run(seed, chain_start, q0_t, var_t, eps, flat_p):
        packed_p = [_pack_const(l)[0] for l in flat_p]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                seed_spec,
                vec_spec, vec_spec, sca_spec, sched_spec,
                *const_specs, *_param_specs,
            ],
            out_specs=(
                vec_spec, sca_spec, sca_spec, sca_spec,
                sca_spec, sca_spec, sca_spec, sca_spec, sca_spec,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((D, C), dtype),       # q_new
                jax.ShapeDtypeStruct((1, C), dtype),       # logp
                jax.ShapeDtypeStruct((1, C), dtype),       # energy
                jax.ShapeDtypeStruct((1, C), dtype),       # energy_change
                jax.ShapeDtypeStruct((1, C), jnp.int32),   # tree_depth
                jax.ShapeDtypeStruct((1, C), jnp.int32),   # tree_size
                jax.ShapeDtypeStruct((1, C), dtype),       # accept_sum
                jax.ShapeDtypeStruct((1, C), dtype),       # max_de
                jax.ShapeDtypeStruct((1, C), jnp.int32),   # diverging
            ),
            scratch_shapes=[
                pltpu.VMEM((max(int(max_treedepth) - 1, 1) + 1,
                            4 * D + 3, block), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(16 * 2 ** 20,
                                     int(_lane_bytes(D) * block * 1.25))),
            interpret=interpret,
        )(jnp.stack([jnp.asarray(seed, jnp.int32),
                     jnp.asarray(chain_start, jnp.int32)]).reshape(1, 2),
          q0_t, var_t, jnp.broadcast_to(eps, (1, C)).astype(dtype),
          jnp.asarray(sched), *const_vals, *packed_p)
        names = ('q', 'logp', 'energy', 'energy_change', 'tree_depth',
                 'tree_size', 'accept_sum', 'max_de', 'diverging')
        return dict(zip(names, outs))

    return run


@functools.lru_cache(maxsize=None)
def _window_schedule(n_samples0, prev_update0, adapt_window0, n_steps,
                     update_window, doubling):
    """Host-side simulation of the Welford window schedule for a warmup
    chunk: per-step [do_refresh, do_switch] flags (identical for every
    chain — the schedule is iteration-counted, ``metrics.py:150-175``),
    plus the final (n_samples, prev_update, adapt_window) ints."""
    flags = np.zeros((2, n_steps), np.int32)
    ns, pu, aw = int(n_samples0), int(prev_update0), int(adapt_window0)
    for t in range(n_steps):
        delta = ns - pu
        flags[0, t] = int(((delta + 1) % update_window) == 0)
        do_switch = delta >= aw
        flags[1, t] = int(do_switch)
        if do_switch:
            pu = ns
            aw = aw * 2 if doubling else aw
        ns += 1
    return flags, (ns, pu, aw)


def _nuts_warmup_kernel(seed_ref, q0_ref, sched_ref, wsched_ref,
                        ls_ref, lb_ref, hb_ref, ct_ref, mu_ref,
                        var_ref, fgm_ref, fgr_ref, fgw_ref,
                        bgm_ref, bgr_ref, bgw_ref,
                        qo_ref, logp_ref, en_ref, de_ref, depth_ref,
                        size_ref, asum_ref, mde_ref, div_ref,
                        sso_ref, ssbo_ref,
                        qf_ref, lsf_ref, lbf_ref, hbf_ref, ctf_ref,
                        varf_ref, fgmf_ref, fgrf_ref, fgwf_ref,
                        bgmf_ref, bgrf_ref, bgwf_ref,
                        stack_ref, *, lpg_t, K, D, Cb, max_treedepth,
                        max_change, dtype, target, gamma, k_exp, t_0,
                        adapt_step, adapt_metric):
    """K WARMUP transitions in one kernel: the NUTS transition plus the
    per-transition dual-averaging step-size update (``step_size.py``,
    Hoffman-Gelman) and windowed diag-Welford metric adaptation
    (``metrics.py:140-186``, incl. the Stan-style shrinkage refresh) all
    run in VMEM. The window switch schedule is iteration-counted and
    data-independent, so it rides in as a host-computed SMEM table."""
    seed = seed_ref[0, 0].astype(jnp.uint32)
    i0 = seed_ref[0, 1].astype(jnp.uint32)
    lane_off = (seed_ref[0, 2].astype(jnp.uint32)
                + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(Cb))

    mu = mu_ref[:]

    def body(t, carry):
        (q, log_step, log_bar, hbar, count, var,
         fgm, fgr, fgw, bgm, bgr, bgw) = carry
        seed_t = seed ^ _fmix32(i0 + t.astype(jnp.uint32)
                                + jnp.uint32(0x9E3779B9))
        eps = jnp.exp(log_step)
        z = _gauss_from_uniforms(seed_t, jnp.int32(-9), 16, (D, Cb),
                                 lane_off)
        p0 = z / jnp.sqrt(var)

        def velocity(p):
            return var * p

        (q_prop, en, logp, de, depth, size, asum, mde, div) = \
            _transition_core(
                seed_t, q, p0, eps, sched_ref, stack_ref, lane_off,
                velocity=velocity, lpg_t=lpg_t, D=D, Cb=Cb,
                max_treedepth=max_treedepth, max_change=max_change,
                dtype=dtype)
        accept = asum / jnp.maximum(size.astype(dtype), 1.0)

        # ---- dual averaging (``step_size.update_step_size``) ----
        if adapt_step:
            w = 1.0 / (count + t_0)
            hbar = (1.0 - w) * hbar + w * (target - accept)
            log_step = mu - hbar * jnp.sqrt(count) / gamma
            # count^(-k) via exp/log (Mosaic has no fractional pow)
            mk = jnp.exp(-k_exp * jnp.log(count))
            log_bar = mk * log_step + (1.0 - mk) * log_bar
            count = count + 1.0

        # ---- diag Welford (``metrics._welford_add`` + update) ----
        if adapt_metric:
            n_f = fgw + 1.0
            od = q_prop - fgm
            fgm = fgm + od / n_f
            fgr = fgr + od * (q_prop - fgm)
            fgw = n_f
            n_b = bgw + 1.0
            od_b = q_prop - bgm
            bgm = bgm + od_b / n_b
            bgr = bgr + od_b * (q_prop - bgm)
            bgw = n_b
            do_refresh = wsched_ref[0, t] == 1
            do_switch = wsched_ref[1, t] == 1
            var_new = (fgr + 5e-3) / (fgw + 5.0)
            var = jnp.where(do_refresh, var_new, var)
            fgm2 = jnp.where(do_switch, bgm, fgm)
            fgr2 = jnp.where(do_switch, bgr, fgr)
            fgw2 = jnp.where(do_switch, bgw, fgw)
            zero_v = q * 0
            zero_s = log_step * 0
            bgm = jnp.where(do_switch, zero_v, bgm)
            bgr = jnp.where(do_switch, zero_v, bgr)
            bgw = jnp.where(do_switch, zero_s, bgw)
            fgm, fgr, fgw = fgm2, fgr2, fgw2

        qo_ref[t] = q_prop
        logp_ref[t] = logp
        en_ref[t] = en
        de_ref[t] = de
        depth_ref[t] = depth
        size_ref[t] = size
        asum_ref[t] = asum
        mde_ref[t] = mde
        div_ref[t] = div
        # recorded AFTER the update, as in the scan path / reference
        # (``base_hmc.py:80-84``)
        sso_ref[t] = jnp.exp(log_step)
        ssbo_ref[t] = jnp.exp(log_bar)
        return (q_prop, log_step, log_bar, hbar, count, var,
                fgm, fgr, fgw, bgm, bgr, bgw)

    init = (q0_ref[:], ls_ref[:], lb_ref[:], hb_ref[:], ct_ref[:],
            var_ref[:], fgm_ref[:], fgr_ref[:], fgw_ref[:],
            bgm_ref[:], bgr_ref[:], bgw_ref[:])
    out = jax.lax.fori_loop(0, K, body, init)
    (qf_ref[:], lsf_ref[:], lbf_ref[:], hbf_ref[:], ctf_ref[:],
     varf_ref[:], fgmf_ref[:], fgrf_ref[:], fgwf_ref[:],
     bgmf_ref[:], bgrf_ref[:], bgwf_ref[:]) = out


def make_nuts_pallas_multi(lpg_pb, params, D, C, K, max_treedepth,
                           max_change, dtype, block=None, interpret=False):
    """Build the jittable K-transition chunk kernel (post-warmup fast path).

    Same density-tracing contract as ``make_nuts_pallas``; returns
    ``fn(seed, q0_t, var_t, eps, flat_params) -> dict`` whose entries are
    stacked over the leading transition axis: ``q`` (K, D, C), scalars
    (K, 1, C), plus ``q_final`` (D, C) — the next chunk's start.
    """
    if block is None:
        block = _block_for(C, D)
    if C % block:
        raise ValueError(f'n_chain {C} not divisible by block {block}.')
    grid = (C // block,)
    K = int(K)

    (cj, const_vals, const_meta, _param_meta, _param_packed,
     n_params) = _trace_density(lpg_pb, params, D, block, dtype)
    n_consts = len(const_vals)

    def kernel(*refs):
        const_refs = refs[5:5 + n_consts]
        param_refs = refs[5 + n_consts:5 + n_consts + n_params]
        cvals = [_unpack_const(r, s, b)
                 for r, (s, b) in zip(const_refs, const_meta)]

        def lpg_t(q_t):
            pvals = [_unpack_const(r, s, b)
                     for r, (s, b) in zip(param_refs, _param_meta)]
            logp, grad = jax.core.eval_jaxpr(
                cj.jaxpr, cvals, *pvals, q_t)
            return logp[None, :], grad

        rest = refs[5 + n_consts + n_params:]
        _nuts_multi_kernel(
            refs[0], refs[1], refs[2], refs[3], refs[4], *rest,
            lpg_t=lpg_t, K=K, D=D, Cb=block,
            max_treedepth=int(max_treedepth),
            max_change=float(max_change), dtype=dtype)

    vec_spec = pl.BlockSpec((D, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    sca_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    kvec_spec = pl.BlockSpec((K, D, block), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    ksca_spec = pl.BlockSpec((K, 1, block), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)

    def _zero_map(nd):
        return lambda i: (0,) * nd

    def _const_spec(v, orig_shape):
        space = pltpu.SMEM if orig_shape == () else pltpu.VMEM
        return pl.BlockSpec(v.shape, _zero_map(v.ndim), memory_space=space)

    const_specs = [_const_spec(v, m[0])
                   for v, m in zip(const_vals, const_meta)]
    _param_specs = [_const_spec(pk, m[0])
                    for pk, m in zip(_param_packed, _param_meta)]

    sched = _schedule_table(int(max_treedepth))
    sched_spec = pl.BlockSpec(sched.shape, lambda i: (0, 0),
                              memory_space=pltpu.SMEM)

    def run(seed, i0, chain_start, q0_t, var_t, eps, flat_p):
        packed_p = [_pack_const(l)[0] for l in flat_p]
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                seed_spec, vec_spec, vec_spec, sca_spec, sched_spec,
                *const_specs, *_param_specs,
            ],
            out_specs=(
                kvec_spec, ksca_spec, ksca_spec, ksca_spec,
                ksca_spec, ksca_spec, ksca_spec, ksca_spec, ksca_spec,
                vec_spec,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((K, D, C), dtype),      # q per trans
                jax.ShapeDtypeStruct((K, 1, C), dtype),      # logp
                jax.ShapeDtypeStruct((K, 1, C), dtype),      # energy
                jax.ShapeDtypeStruct((K, 1, C), dtype),      # energy_change
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # tree_depth
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # tree_size
                jax.ShapeDtypeStruct((K, 1, C), dtype),      # accept_sum
                jax.ShapeDtypeStruct((K, 1, C), dtype),      # max_de
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # diverging
                jax.ShapeDtypeStruct((D, C), dtype),         # q_final
            ),
            scratch_shapes=[
                pltpu.VMEM((max(int(max_treedepth) - 1, 1) + 1,
                            4 * D + 3, block), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(
                    16 * 2 ** 20,
                    int(_lane_bytes(D) * block * 1.25)
                    + K * (D + 8) * block * 4)),
            interpret=interpret,
        )(jnp.stack([jnp.asarray(seed, jnp.int32),
                     jnp.asarray(i0, jnp.int32),
                     jnp.asarray(chain_start, jnp.int32)]).reshape(1, 3),
          q0_t, var_t, jnp.broadcast_to(eps, (1, C)).astype(dtype),
          jnp.asarray(sched), *const_vals, *packed_p)
        names = ('q', 'logp', 'energy', 'energy_change', 'tree_depth',
                 'tree_size', 'accept_sum', 'max_de', 'diverging',
                 'q_final')
        return dict(zip(names, outs))

    return run


def make_nuts_pallas_warmup(lpg_pb, params, D, C, K, max_treedepth,
                            max_change, dtype, wsched, target, gamma,
                            k_exp, t_0, adapt_step, adapt_metric,
                            block=None, interpret=False):
    """Build the jittable K-transition WARMUP chunk kernel (in-kernel
    dual averaging + windowed diag-Welford adaptation). ``wsched`` is the
    host-precomputed (2, K) window schedule from ``_window_schedule``."""
    if block is None:
        block = _block_for(C, D)
    if C % block:
        raise ValueError(f'n_chain {C} not divisible by block {block}.')
    grid = (C // block,)
    K = int(K)

    (cj, const_vals, const_meta, _param_meta, _param_packed,
     n_params) = _trace_density(lpg_pb, params, D, block, dtype)
    n_consts = len(const_vals)
    N_IN = 16   # seed, q0, sched, wsched, 5 step leaves, 7 metric leaves

    def kernel(*refs):
        const_refs = refs[N_IN:N_IN + n_consts]
        param_refs = refs[N_IN + n_consts:N_IN + n_consts + n_params]
        cvals = [_unpack_const(r, s, b)
                 for r, (s, b) in zip(const_refs, const_meta)]

        def lpg_t(q_t):
            pvals = [_unpack_const(r, s, b)
                     for r, (s, b) in zip(param_refs, _param_meta)]
            logp, grad = jax.core.eval_jaxpr(
                cj.jaxpr, cvals, *pvals, q_t)
            return logp[None, :], grad

        rest = refs[N_IN + n_consts + n_params:]
        _nuts_warmup_kernel(
            *refs[:N_IN], *rest,
            lpg_t=lpg_t, K=K, D=D, Cb=block,
            max_treedepth=int(max_treedepth),
            max_change=float(max_change), dtype=dtype,
            target=float(target), gamma=float(gamma),
            k_exp=float(k_exp), t_0=float(t_0),
            adapt_step=bool(adapt_step), adapt_metric=bool(adapt_metric))

    vec_spec = pl.BlockSpec((D, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    sca_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    kvec_spec = pl.BlockSpec((K, D, block), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    ksca_spec = pl.BlockSpec((K, 1, block), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 3), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)

    def _zero_map(nd):
        return lambda i: (0,) * nd

    def _const_spec(v, orig_shape):
        space = pltpu.SMEM if orig_shape == () else pltpu.VMEM
        return pl.BlockSpec(v.shape, _zero_map(v.ndim), memory_space=space)

    const_specs = [_const_spec(v, m[0])
                   for v, m in zip(const_vals, const_meta)]
    _param_specs = [_const_spec(pk, m[0])
                    for pk, m in zip(_param_packed, _param_meta)]

    sched = _schedule_table(int(max_treedepth))
    sched_spec = pl.BlockSpec(sched.shape, lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
    wsched_spec = pl.BlockSpec(wsched.shape, lambda i: (0, 0),
                               memory_space=pltpu.SMEM)

    def run(seed, i0, chain_start, q0_t, step_leaves, metric_leaves,
            flat_p, wsched_arr):
        packed_p = [_pack_const(l)[0] for l in flat_p]
        ls, lb, hb, ct, mu = step_leaves
        var_t, fgm, fgr, fgw, bgm, bgr, bgw = metric_leaves
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                seed_spec, vec_spec, sched_spec, wsched_spec,
                sca_spec, sca_spec, sca_spec, sca_spec, sca_spec,
                vec_spec, vec_spec, vec_spec, sca_spec,
                vec_spec, vec_spec, sca_spec,
                *const_specs, *_param_specs,
            ],
            out_specs=(
                kvec_spec, *([ksca_spec] * 10),
                vec_spec, sca_spec, sca_spec, sca_spec, sca_spec,
                vec_spec, vec_spec, vec_spec, sca_spec,
                vec_spec, vec_spec, sca_spec,
            ),
            out_shape=(
                jax.ShapeDtypeStruct((K, D, C), dtype),      # q rows
                *[jax.ShapeDtypeStruct((K, 1, C), dtype)
                  for _ in range(3)],                        # logp, en, de
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # depth
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # size
                *[jax.ShapeDtypeStruct((K, 1, C), dtype)
                  for _ in range(2)],                        # asum, mde
                jax.ShapeDtypeStruct((K, 1, C), jnp.int32),  # div
                *[jax.ShapeDtypeStruct((K, 1, C), dtype)
                  for _ in range(2)],                        # ss, ssb
                jax.ShapeDtypeStruct((D, C), dtype),         # q_final
                *[jax.ShapeDtypeStruct((1, C), dtype)
                  for _ in range(4)],                        # ls lb hb ct
                jax.ShapeDtypeStruct((D, C), dtype),         # var
                jax.ShapeDtypeStruct((D, C), dtype),         # fgm
                jax.ShapeDtypeStruct((D, C), dtype),         # fgr
                jax.ShapeDtypeStruct((1, C), dtype),         # fgw
                jax.ShapeDtypeStruct((D, C), dtype),         # bgm
                jax.ShapeDtypeStruct((D, C), dtype),         # bgr
                jax.ShapeDtypeStruct((1, C), dtype),         # bgw
            ),
            scratch_shapes=[
                pltpu.VMEM((max(int(max_treedepth) - 1, 1) + 1,
                            4 * D + 3, block), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=max(
                    16 * 2 ** 20,
                    int(_lane_bytes(D) * block * 1.6)
                    + K * (D + 10) * block * 4)),
            interpret=interpret,
        )(jnp.stack([jnp.asarray(seed, jnp.int32),
                     jnp.asarray(i0, jnp.int32),
                     jnp.asarray(chain_start, jnp.int32)]).reshape(1, 3),
          q0_t, jnp.asarray(sched), jnp.asarray(wsched_arr, jnp.int32),
          ls, lb, hb, ct, mu, var_t, fgm, fgr, fgw, bgm, bgr, bgw,
          *const_vals, *packed_p)
        names = ('q', 'logp', 'energy', 'energy_change', 'tree_depth',
                 'tree_size', 'accept_sum', 'max_de', 'diverging',
                 'step_size', 'step_size_bar',
                 'q_final', 'log_step', 'log_bar', 'hbar', 'count',
                 'var', 'fg_mean', 'fg_raw', 'fg_w',
                 'bg_mean', 'bg_raw', 'bg_w')
        return dict(zip(names, outs))

    return run


def nuts_warmup_chunk_batched_pallas(key, q0, step_state, metric, n_steps,
                                     max_treedepth, max_change, target,
                                     gamma, k_exp, t_0, adapt_step,
                                     adapt_metric, wsched,
                                     interpret=False, block=None,
                                     params=None, lpg_pb=None, i0=0,
                                     chain_start=0):
    """Run ``n_steps`` WARMUP transitions (with live step-size + metric
    adaptation) in one kernel. Same (key, global-iteration) RNG contract
    as the frozen chunk. ``step_state`` is the per-chain
    ``StepSizeState``; ``metric`` a per-chain ``DiagMetricState``;
    ``wsched`` the (2, n_steps) window schedule from
    ``_window_schedule`` (a runtime input — it changes per chunk).
    Returns the kernel's output dict (transition rows + final states)."""
    if not isinstance(metric, DiagMetricState):
        raise ValueError('the Pallas warmup path supports the diagonal '
                         'metric only.')
    C, D = q0.shape
    dtype = q0.dtype

    def _row(a):    # (C,) or scalar -> (1, C)
        a = jnp.asarray(a, dtype)
        if a.ndim == 0:
            a = jnp.broadcast_to(a, (C,))
        return a.reshape(1, C)

    def _mat(a):    # (C, D) or (D,) -> (D, C)
        a = jnp.asarray(a, dtype)
        if a.ndim == 2:
            return a.T
        return jnp.broadcast_to(a[:, None], (D, C))

    step_leaves = (_row(step_state.log_step), _row(step_state.log_bar),
                   _row(step_state.hbar), _row(step_state.count),
                   _row(step_state.mu))
    metric_leaves = (_mat(metric.var),
                     _mat(metric.fg.mean), _mat(metric.fg.raw),
                     _row(metric.fg.weight),
                     _mat(metric.bg.mean), _mat(metric.bg.raw),
                     _row(metric.bg.weight))

    seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    if lpg_pb is None:
        raise ValueError('lpg_pb is required.')
    run = make_nuts_pallas_warmup(
        lpg_pb, params, D, C, n_steps, max_treedepth, max_change, dtype,
        wsched, target, gamma, k_exp, t_0, adapt_step, adapt_metric,
        block=block, interpret=interpret)
    return run(seed, i0, chain_start, q0.T, step_leaves, metric_leaves,
               jax.tree.leaves(params), wsched)


def nuts_chunk_batched_pallas(key, q0, metric, step_size, n_steps,
                              max_treedepth, max_change, interpret=False,
                              block=None, params=None, lpg_pb=None,
                              lpg_1=None, i0=0, chain_start=0):
    """Run ``n_steps`` frozen-configuration NUTS transitions in one kernel.

    The chunk analog of ``nuts_transition_batched_pallas``: same
    (key, q0 (C, D), diag metric, per-chain step size) contract, but the
    momentum refresh between transitions runs in-kernel and every
    transition's sample + stats come back stacked over a leading
    ``n_steps`` axis. Valid ONLY when step size and metric are frozen
    (post-warmup — the reference freezes both after tuning,
    ``step_size.py:31-45``). Returns ``(q_chunk (n_steps, C, D),
    q_last (C, D), NutsStats with (n_steps, C) leaves)``.
    """
    if not isinstance(metric, DiagMetricState):
        raise ValueError('the Pallas NUTS path supports the diagonal '
                         'metric only.')
    C, D = q0.shape
    dtype = q0.dtype
    var = metric.var
    var_t = (var.T if var.ndim == 2
             else jnp.broadcast_to(var[:, None], (D, C))).astype(dtype)
    # NO key split: the key stays fixed across a run's frozen chunks and
    # the per-transition stream is salted by the global iteration index
    # (``i0 + t``), so chunk boundaries cannot change the random stream —
    # required for bitwise checkpoint resume
    seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    if lpg_pb is None:
        lpg_pb = lambda p, x: lpg_1(x)
        params = ()
    run = make_nuts_pallas_multi(lpg_pb, params, D, C, n_steps,
                                 max_treedepth, max_change, dtype,
                                 block=block, interpret=interpret)
    o = run(seed, i0, chain_start, q0.T, var_t, step_size,
            jax.tree.leaves(params))
    n_prop = jnp.maximum(o['tree_size'][:, 0], 1).astype(dtype)
    stats = NutsStats(
        logp=o['logp'][:, 0], energy=o['energy'][:, 0],
        tree_depth=o['tree_depth'][:, 0], tree_size=o['tree_size'][:, 0],
        mean_tree_accept=o['accept_sum'][:, 0] / n_prop,
        energy_change=o['energy_change'][:, 0],
        max_energy_change=o['max_de'][:, 0],
        diverging=o['diverging'][:, 0].astype(bool))
    q_chunk = jnp.swapaxes(o['q'], 1, 2)   # (n_steps, C, D)
    return q_chunk, o['q_final'].T, stats


def nuts_transition_batched_pallas(key, q0, metric, step_size, lpg_1,
                                   max_treedepth, max_change,
                                   interpret=False, block=None,
                                   params=None, lpg_pb=None,
                                   chain_start=0):
    """Drop-in twin of ``nuts.nuts_transition_batched`` on the megakernel.

    Same (key, q0 (C, D), diag metric, step_size) interface and the same
    ``NutsStats``, but takes the PER-POINT ``lpg_1(x (D,)) -> (logp,
    grad)`` (e.g. ``jax.value_and_grad(logp)``) — the kernel vmaps it
    lane-minor itself. The in-tree randomness comes from the counter-based
    kernel RNG seeded from ``key`` (distribution-identical, not
    bitwise-equal to the XLA path). For densities with dynamic parameters
    pass ``lpg_pb(params, x)`` plus ``params`` instead — the leaves ride
    as kernel inputs so surrogate refits never rebuild the kernel.
    """
    if not isinstance(metric, DiagMetricState):
        raise ValueError('the Pallas NUTS path supports the diagonal '
                         'metric only.')
    C, D = q0.shape
    dtype = q0.dtype
    var = metric.var
    var_t = (var.T if var.ndim == 2
             else jnp.broadcast_to(var[:, None], (D, C))).astype(dtype)
    # momentum is drawn in-kernel (global-chain-indexed counter RNG), so
    # a mesh shard running chains [chain_start, chain_start + C) draws
    # exactly what the unsharded kernel draws for those chains
    seed = jax.random.randint(key, (), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    if lpg_pb is None:
        lpg_pb = lambda p, x: lpg_1(x)
        params = ()
    run = make_nuts_pallas(lpg_pb, params, D, C, max_treedepth, max_change,
                           dtype, block=block, interpret=interpret)
    o = run(seed, chain_start, q0.T, var_t, step_size,
            jax.tree.leaves(params))
    n_prop = jnp.maximum(o['tree_size'][0], 1).astype(dtype)
    stats = NutsStats(
        logp=o['logp'][0], energy=o['energy'][0],
        tree_depth=o['tree_depth'][0], tree_size=o['tree_size'][0],
        mean_tree_accept=o['accept_sum'][0] / n_prop,
        energy_change=o['energy_change'][0],
        max_energy_change=o['max_de'][0],
        diverging=o['diverging'][0].astype(bool))
    return o['q'].T, stats
