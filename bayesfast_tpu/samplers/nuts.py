"""Iterative No-U-Turn transition kernel, batch-first over chains.

TPU-native reformulation of the reference's recursive tree builder
(``bayesfast/samplers/nuts.py:22-217``, a modified pymc3 NUTS). Recursion is
control-flow the XLA compiler cannot trace, so the binary tree is built
*iteratively* with a fixed-size checkpoint stack (one frame per depth level,
the classic binary-counter merge): after leaf ``k`` is integrated it is merged
with the stack top once per trailing 1-bit of ``k``, which reproduces the
recursive merge order exactly.

Design — ONE flat ``lax.while_loop`` over *leaf iterations*, written
batch-first (the chain axis is explicit in every array, nothing is vmapped),
with a **lane-minor layout**: every vector is (dim, chains) and the
checkpoint stack is (levels, width, chains), so the chain axis lands on the
TPU's 128-lane minor tiling with zero padding. Decisions measured on TPU v5
at 2048 chains, D=32 (profiles in the repo history):

  * a vmapped ``while_loop`` is batched by re-running the body until *all*
    lanes finish and selecting the whole carry per iteration — with nested
    tree loops, finished chains re-integrate their entire subtree at every
    outer doubling, so wall-clock scales with ``sum_d max_lanes 2^depth``
    instead of ``max_lanes tree_size``. The flat loop advances every lane
    every iteration.
  * chain-major (C, D) arrays pad the minor dim 32 -> 128 (4x traffic), and
    a (C, levels, width) stack pads (levels, width) = (10, 195) -> (16, 256)
    (2.1x). Lane-minor shapes tile exactly; profiling showed the two stack
    passes (one-hot read + one-hot write select) were 68% of the kernel.
  * stack access uses one-hot selects, not per-lane gather/scatter (measured
    ~200x slower at this batch size).
  * each leaf iteration performs the leapfrog AND the first binary-counter
    merge; only leaves with >=2 trailing 1-bits need extra merge-only
    iterations, cutting iterations per subtree from 2*2^d to 1.5*2^d. The
    final push of a completed subtree is skipped (nothing ever reads it), so
    the stack needs only ``max_treedepth - 1`` levels.

Semantics faithfully kept from the reference (they affect sampling statistics):
  * multinomial proposal sampling via ``logbern(log_size2 - log_size_total)``
    at every merge (``nuts.py:81-85, 163-167``);
  * the generalized U-turn check ``p_sum . v_left <= 0 or p_sum . v_right <= 0``
    plus the *extra* inner-subtree checks at merged depth > 1 and at every
    main-tree extension (``nuts.py:88-101, 148-161``);
  * divergence when ``|E - E_0| >= max_change`` with nan -> inf
    (``nuts.py:113-128``);
  * per-leaf acceptance statistics ``min(1, exp(-dE))`` accumulated over all
    non-divergent proposals (``nuts.py:120-130``);
  * aborted extensions (divergence/turning inside the new subtree) do not
    merge the subtree's proposal or momentum sum (``nuts.py:78-79``).
"""

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .metrics import DiagMetricState, sample_momentum_b

__all__ = ['NutsStats', 'nuts_transition', 'nuts_transition_batched',
           'nuts_core_batched']


class NutsStats(NamedTuple):
    logp: jnp.ndarray
    energy: jnp.ndarray
    tree_depth: jnp.ndarray
    tree_size: jnp.ndarray
    mean_tree_accept: jnp.ndarray
    energy_change: jnp.ndarray
    max_energy_change: jnp.ndarray
    diverging: jnp.ndarray


class _Proposal(NamedTuple):
    q: jnp.ndarray       # (D, C)
    energy: jnp.ndarray  # (C,)
    logp: jnp.ndarray    # (C,)


class TIntegratorState(NamedTuple):
    """Lane-minor Hamiltonian state: vectors are (D, C), scalars (C,)."""
    q: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    grad: jnp.ndarray
    energy: jnp.ndarray
    logp: jnp.ndarray


def _velocity_t(metric_t, p):
    """Lane-minor ``M^{-1} p``: ``p`` is (D, C); ``metric_t`` is the
    transposed metric payload from ``_metric_t``."""
    kind, payload = metric_t
    if kind == 'diag':
        return payload * p
    return jnp.einsum('ijc,jc->ic', payload, p) if payload.ndim == 3 \
        else payload @ p


def _metric_t(metric):
    """Transpose a Diag/FullMetricState's payload to lane-minor once."""
    if isinstance(metric, DiagMetricState):
        var = metric.var
        return ('diag', var.T if var.ndim == 2 else var[:, None])
    cov = metric.cov
    return ('full', jnp.moveaxis(cov, 0, -1) if cov.ndim == 3 else cov)


def compute_state_t(metric_t, lpg_t, q, p):
    """Lane-minor Hamiltonian state; ``lpg_t`` maps (D, C) -> ((C,), (D, C))."""
    logp, grad = lpg_t(q)
    v = _velocity_t(metric_t, p)
    energy = 0.5 * jnp.sum(p * v, axis=0) - logp
    return TIntegratorState(q, p, v, grad, energy, logp)


def leapfrog_t(metric_t, lpg_t, eps, s):
    """Lane-minor leapfrog step; ``eps`` is (C,) signed per-chain steps
    (broadcasts against (D, C) along the minor chain axis)."""
    dt = 0.5 * eps
    p_half = s.p + dt * s.grad
    v_half = _velocity_t(metric_t, p_half)
    q_new = s.q + eps * v_half
    logp, grad = lpg_t(q_new)
    p_new = p_half + dt * grad
    v_new = _velocity_t(metric_t, p_new)
    energy = 0.5 * jnp.sum(p_new * v_new, axis=0) - logp
    return TIntegratorState(q_new, p_new, v_new, grad, energy, logp)


def _bwhere(mask, new, old):
    """Select over a state pytree; ``mask`` (C,) broadcasts against the
    minor chain axis of every (…, C) leaf."""
    return jax.tree.map(lambda n, o: jnp.where(mask, n, o), new, old)


class _TreeLayout:
    """Flat-vector layout of a subtree summary, lane-minor.

    Rows ``[left_p(D) | left_v(D) | right_p(D) | right_v(D) | p_sum(D) |
    log_size(1) | prop(P)]`` over columns = chains, so stack writes and
    merge selects are single fused passes with the chain axis on the
    128-lane tiling.
    """

    def __init__(self, dim, prop_example):
        self.dim = dim
        leaves = jax.tree.leaves(prop_example)
        self.prop_treedef = jax.tree.structure(prop_example)
        self.prop_shapes = [jnp.shape(l)[:-1] for l in leaves]
        self.prop_sizes = [max(1, int(np.prod(jnp.shape(l)[:-1])))
                           for l in leaves]
        self.prop_len = sum(self.prop_sizes)
        self.total = 5 * dim + 1 + self.prop_len
        d = dim
        self.sl_left_p = slice(0, d)
        self.sl_left_v = slice(d, 2 * d)
        self.sl_right_p = slice(2 * d, 3 * d)
        self.sl_right_v = slice(3 * d, 4 * d)
        self.sl_p_sum = slice(4 * d, 5 * d)
        self.i_log_size = 5 * d
        self.sl_left = slice(0, 2 * d)
        self.sl_right = slice(2 * d, 4 * d)
        self.sl_prop = slice(5 * d + 1, self.total)

    def flat_prop(self, prop):
        leaves = jax.tree.leaves(prop)
        return jnp.concatenate(
            [l.reshape(-1, l.shape[-1]) for l in leaves], axis=0)

    def unflat_prop(self, vec):
        parts = []
        off = 0
        for shp, sz in zip(self.prop_shapes, self.prop_sizes):
            part = vec[off:off + sz]
            parts.append(part.reshape(shp + (vec.shape[-1],))
                         if shp else part[0])
            off += sz
        return jax.tree.unflatten(self.prop_treedef, parts)

    def leaf(self, state, d_energy, prop_of):
        return jnp.concatenate([
            state.p, state.v, state.p, state.v, state.p,
            -d_energy[None], self.flat_prop(prop_of(state))], axis=0)


def _merge_b(u, L, t1, t2, merged_depth):
    """Join adjacent flat subtrees t1 (older/left of) and t2 (newer/right):
    t1/t2 are (total, C), ``u`` (C,) uniforms, ``merged_depth`` (C,).

    Mirrors the join in ``nuts.py:146-167`` including the extra U-turn
    checks when the merged depth exceeds 1; the six U-turn dot products run
    as one packed (6, D, C) contraction.
    """
    ps1 = t1[L.sl_p_sum]
    ps2 = t2[L.sl_p_sum]
    p_sum = ps1 + ps2
    p_sum1 = ps1 + t2[L.sl_left_p]
    p_sum2 = t1[L.sl_right_p] + ps2
    lhs = jnp.stack([p_sum, p_sum, p_sum1, p_sum1, p_sum2, p_sum2], axis=0)
    rhs = jnp.stack([t1[L.sl_left_v], t2[L.sl_right_v],
                     t1[L.sl_left_v], t2[L.sl_left_v],
                     t1[L.sl_right_v], t2[L.sl_right_v]], axis=0)
    dots = jnp.sum(lhs * rhs, axis=1)
    turning = (dots[0] <= 0) | (dots[1] <= 0)
    turning1 = (dots[2] <= 0) | (dots[3] <= 0)
    turning2 = (dots[4] <= 0) | (dots[5] <= 0)
    turning = turning | ((merged_depth > 1) & (turning1 | turning2))

    ls1 = t1[L.i_log_size]
    ls2 = t2[L.i_log_size]
    log_size = jnp.logaddexp(ls1, ls2)
    take2 = jnp.log(u) < ls2 - log_size
    tail = jnp.where(take2, t2[L.sl_prop], t1[L.sl_prop])
    merged = jnp.concatenate([
        t1[L.sl_left], t2[L.sl_right], p_sum,
        log_size[None], tail], axis=0)
    return merged, turning


def _stack_read(stack, m, n_lvl):
    """Read per-lane level ``m`` via a one-hot multiply-reduce (fused single
    pass; per-lane gathers measured ~200x slower at 2048 chains)."""
    oh = jnp.arange(n_lvl)[:, None] == m[None, :]
    return jnp.sum(jnp.where(oh[:, None, :], stack, 0), axis=0)


def _stack_write(stack, m, val, mask, n_lvl):
    """Write ``val`` at per-lane level ``m`` where ``mask`` (one-hot select,
    no scatter)."""
    sel = (jnp.arange(n_lvl)[:, None] == m[None, :]) & mask[None, :]
    return jnp.where(sel[:, None, :], val[None], stack)


def _trailing_ones(k):
    """Number of trailing 1-bits of k = number of binary-counter merges
    after integrating leaf ``k``."""
    x = k + 1
    return jax.lax.population_count((x & -x) - 1)


def nuts_core_batched(key, start, step_fn, prop_of, step_size, max_treedepth,
                      max_change):
    """Batch-first iterative tree-doubling core over any lane-minor
    integrator state with ``.q/.p/.v/.energy/.logp`` fields — vectors
    (D, C), scalars (C,) (shared by NUTS and tempered TNUTS).

    ``step_fn(eps, state)`` integrates one batched leapfrog step with
    per-chain signed steps ``eps`` of shape (C,). ``step_size`` is (C,)
    positive. Returns a dict of batched results (proposal pytree, depth,
    tree size, acceptance statistics, divergence flag, loop_iters).
    """
    D, C = start.q.shape
    dtype = start.q.dtype
    L = _TreeLayout(D, prop_of(start))
    # a depth-d subtree reads levels 0..d-2 and writes 0..d-1 (its final
    # merge result goes straight to the main tree), and d <= max_treedepth-1
    n_lvl = max(int(max_treedepth) - 1, 1)
    start_energy = start.energy

    key, k0 = jax.random.split(key)
    go_right0 = jax.random.uniform(k0, (C,)) < 0.5
    eps0 = jnp.where(go_right0, step_size, -step_size).astype(dtype)

    init = dict(
        key=key,
        cur=start, left=start, right=start,
        prop=L.flat_prop(prop_of(start)),
        p_sum=start.p,
        log_size=jnp.zeros((C,), dtype),
        stack=jnp.zeros((n_lvl, L.total, C), dtype),
        inc=jnp.zeros((L.total, C), dtype),
        k=jnp.zeros((C,), jnp.int32),
        depth=jnp.zeros((C,), jnp.int32),
        go_right=go_right0,
        eps=eps0,
        pending=jnp.zeros((C,), jnp.int32),
        need_leaf=jnp.ones((C,), bool),
        m=jnp.zeros((C,), jnp.int32),
        accept_sum=jnp.zeros((C,), dtype),
        n_prop=jnp.zeros((C,), jnp.int32),
        max_de=jnp.zeros((C,), dtype),
        diverging=jnp.zeros((C,), bool),
        done=jnp.zeros((C,), bool),
        loop_iters=jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.any(~c['done'])

    def body(c):
        key, sub = jax.random.split(c['key'])
        u = jax.random.uniform(sub, (3, C))
        active = ~c['done']
        do_leaf = active & c['need_leaf']

        # ---- leaf: one leapfrog (masked by do_leaf) ----
        new_state = step_fn(c['eps'], c['cur'])
        d_energy = new_state.energy - start_energy
        d_energy = jnp.where(jnp.isnan(d_energy), jnp.inf, d_energy)
        div = do_leaf & ~(jnp.abs(d_energy) < max_change)
        leaf_vec = L.leaf(new_state, d_energy, prop_of)

        upd = do_leaf & (jnp.abs(d_energy) > jnp.abs(c['max_de']))
        max_de = jnp.where(upd, d_energy, c['max_de'])
        accept = jnp.minimum(1.0, jnp.exp(-d_energy))
        accept_sum = c['accept_sum'] + jnp.where(do_leaf & ~div, accept, 0.)
        n_prop = c['n_prop'] + do_leaf.astype(jnp.int32)

        cur = _bwhere(do_leaf & ~div, new_state, c['cur'])
        diverging = c['diverging'] | div
        t_ones = _trailing_ones(c['k'])

        inc = jnp.where(do_leaf, leaf_vec, c['inc'])
        m = jnp.where(do_leaf, 0, c['m'])
        pending = jnp.where(do_leaf, t_ones, c['pending'])

        # ---- one binary-counter merge, fused into the same iteration
        # (leaves with >=2 trailing 1-bits take extra merge-only passes) ----
        do_merge = active & ~div & (pending > 0)
        t1 = _stack_read(c['stack'], m, n_lvl)
        merged, mturn = _merge_b(u[0], L, t1, inc, m + 1)
        turning_sub = do_merge & mturn
        inc = jnp.where(do_merge, merged, inc)
        m = jnp.where(do_merge, m + 1, m)
        pending = jnp.where(do_merge, pending - 1, pending)

        abort = div | turning_sub
        fin = ~abort & (pending == 0) & (do_leaf | do_merge)
        k = jnp.where(fin, c['k'] + 1, c['k'])
        n_leaf = jnp.left_shift(jnp.int32(1), c['depth'])
        sub_done = fin & (k == n_leaf)
        # completed subtrees skip their (never-read) final push
        stack = _stack_write(c['stack'], m, inc, fin & ~sub_done, n_lvl)

        # ---- subtree completion: main-tree doubling bookkeeping ----
        sub_ls = inc[L.i_log_size]
        take = sub_done & (jnp.log(u[1]) < sub_ls - c['log_size'])
        prop = jnp.where(take, inc[L.sl_prop], c['prop'])
        log_size = jnp.where(sub_done,
                             jnp.logaddexp(c['log_size'], sub_ls),
                             c['log_size'])
        sub_p_sum = inc[L.sl_p_sum]
        p_sum_new = c['p_sum'] + sub_p_sum

        # spatial ends: the subtree's integration-order right end is ``cur``
        go_right = c['go_right']
        new_left = _bwhere(go_right, c['left'], cur)
        new_right = _bwhere(go_right, cur, c['right'])

        # main-tree turning checks (``nuts.py:88-101``): six dots packed
        # into one (6, D, C) contraction, halves in spatial order
        lm_psum = jnp.where(go_right, c['p_sum'], sub_p_sum)
        rm_psum = jnp.where(go_right, sub_p_sum, c['p_sum'])
        lm_begin_v = jnp.where(go_right, c['left'].v, cur.v)
        lm_end_p = jnp.where(go_right, c['right'].p, inc[L.sl_left_p])
        lm_end_v = jnp.where(go_right, c['right'].v, inc[L.sl_left_v])
        rm_begin_p = jnp.where(go_right, inc[L.sl_left_p], c['left'].p)
        rm_begin_v = jnp.where(go_right, inc[L.sl_left_v], c['left'].v)
        rm_end_v = jnp.where(go_right, cur.v, c['right'].v)
        p_sum1 = lm_psum + rm_begin_p
        p_sum2 = lm_end_p + rm_psum
        lhs = jnp.stack([p_sum_new, p_sum_new, p_sum1, p_sum1,
                         p_sum2, p_sum2], axis=0)
        rhs = jnp.stack([new_left.v, new_right.v, lm_begin_v, rm_begin_v,
                         lm_end_v, rm_end_v], axis=0)
        dots = jnp.sum(lhs * rhs, axis=1)
        turning_full = ((dots[0] <= 0) | (dots[1] <= 0) |
                        (dots[2] <= 0) | (dots[3] <= 0) |
                        (dots[4] <= 0) | (dots[5] <= 0))

        left = _bwhere(sub_done, new_left, c['left'])
        right = _bwhere(sub_done, new_right, c['right'])
        p_sum = jnp.where(sub_done, p_sum_new, c['p_sum'])
        # the aborted extension still counts toward tree_depth, as in the
        # reference where depth increments before the abort check
        depth = jnp.where(sub_done | abort, c['depth'] + 1, c['depth'])
        finished = abort | (sub_done & (turning_full |
                                        (depth >= max_treedepth)))
        done = c['done'] | finished

        # start the next doubling for lanes that completed and continue
        start_next = sub_done & ~finished
        gr_new = u[2] < 0.5
        go_right = jnp.where(start_next, gr_new, go_right)
        eps = jnp.where(start_next,
                        jnp.where(gr_new, step_size, -step_size),
                        c['eps']).astype(dtype)
        next_end = _bwhere(gr_new, right, left)
        cur = _bwhere(start_next, next_end, cur)
        k = jnp.where(start_next, 0, k)
        need_leaf = jnp.where(active, fin, c['need_leaf'])

        return dict(
            key=key, cur=cur, left=left, right=right, prop=prop,
            p_sum=p_sum, log_size=log_size, stack=stack, inc=inc,
            k=k, depth=depth, go_right=go_right, eps=eps,
            pending=pending, need_leaf=need_leaf, m=m,
            accept_sum=accept_sum, n_prop=n_prop, max_de=max_de,
            diverging=diverging, done=done,
            loop_iters=c['loop_iters'] + 1)

    out = jax.lax.while_loop(cond, body, init)
    out = dict(out)
    out['prop'] = L.unflat_prop(out['prop'])
    return out


def nuts_transition_batched(key, q0, metric, step_size, logp_and_grad,
                            max_treedepth, max_change):
    """One full NUTS iteration for all chains at once (``nuts.py:205-217``).

    ``q0`` is (C, D); ``metric`` state leaves may carry a leading chain axis
    or be shared across chains (pooled adaptation); ``step_size`` is (C,) or
    scalar; ``logp_and_grad`` maps (C, D) -> ((C,), (C, D)). All per-lane
    randomness (momenta, multinomial draws, directions) comes from
    counter-based draws of the single ``key``. Internally everything runs
    lane-minor (chains on the 128-lane tiling); the (C, D) interface
    transposes once at entry/exit.
    """
    C, D = q0.shape
    dtype = q0.dtype
    key, k_mom, k_core = jax.random.split(key, 3)
    p0 = sample_momentum_b(metric, k_mom, (C, D), dtype)
    metric_t = _metric_t(metric)

    def lpg_t(x_t):
        logp, grad = logp_and_grad(x_t.T)
        return logp, grad.T

    start = compute_state_t(metric_t, lpg_t, q0.T, p0.T)
    step_size = jnp.broadcast_to(jnp.asarray(step_size, dtype), (C,))

    step_fn = lambda eps, s: leapfrog_t(metric_t, lpg_t, eps, s)
    prop_of = lambda s: _Proposal(s.q, s.energy, s.logp)
    out = nuts_core_batched(k_core, start, step_fn, prop_of, step_size,
                            max_treedepth, max_change)

    prop = out['prop']
    n_prop_f = jnp.maximum(out['n_prop'], 1).astype(dtype)
    stats = NutsStats(
        logp=prop.logp, energy=prop.energy,
        tree_depth=out['depth'], tree_size=out['n_prop'],
        mean_tree_accept=out['accept_sum'] / n_prop_f,
        energy_change=prop.energy - start.energy,
        max_energy_change=out['max_de'], diverging=out['diverging'])
    return prop.q.T, stats


def nuts_transition(key, q0, metric, step_size, logp_and_grad, max_treedepth,
                    max_change):
    """Single-chain convenience wrapper: batch of one over the batched
    kernel. The multi-chain driver calls ``nuts_transition_batched``
    directly — prefer that (do NOT vmap this wrapper; vmapping a batched
    ``while_loop`` reintroduces the whole-carry select per iteration)."""
    metric_b = jax.tree.map(lambda l: l[None], metric)
    lpg_b = jax.vmap(logp_and_grad)
    q_new, stats = nuts_transition_batched(
        key, q0[None], metric_b, jnp.reshape(step_size, (1,)), lpg_b,
        max_treedepth, max_change)
    return q_new[0], jax.tree.map(lambda l: l[0], stats)
