"""Iterative No-U-Turn transition kernel, vmappable over chains.

TPU-native reformulation of the reference's recursive tree builder
(``bayesfast/samplers/nuts.py:22-217``, a modified pymc3 NUTS). Recursion is
control-flow the XLA compiler cannot trace, so the binary tree is built
*iteratively* with a fixed-size checkpoint stack (one frame per depth level,
the classic binary-counter merge): after leaf ``k`` is integrated it is merged
with the stack top once per trailing 1-bit of ``k``, which reproduces the
recursive merge order exactly. All loops are ``lax.while_loop``s, so under
``vmap`` thousands of chains run the same lockstep program with masking.

Performance notes (measured on TPU v5e at 2048 chains):
  * stack access uses one-hot contractions, not gathers/scatters — per-lane
    dynamic indices lower to XLA gathers that cost ~40x the leapfrog;
  * each subtree/merge summary is ONE flat vector (momenta, velocities,
    p_sum, proposal, scalars packed together), so merges execute as a few
    fused vector ops instead of ~30 small kernels whose per-op dispatch
    otherwise dominates the transition.

Semantics faithfully kept from the reference (they affect sampling statistics):
  * multinomial proposal sampling via ``logbern(log_size2 - log_size_total)``
    at every merge (``nuts.py:81-85, 163-167``);
  * the generalized U-turn check ``p_sum . v_left <= 0 or p_sum . v_right <= 0``
    plus the *extra* inner-subtree checks at merged depth > 1 and at every
    main-tree extension (``nuts.py:88-101, 148-161``);
  * divergence when ``|E - E_0| >= max_change`` with nan -> inf
    (``nuts.py:113-128``);
  * per-leaf acceptance statistics ``min(1, exp(-dE))`` accumulated over all
    proposals including divergent ones (``nuts.py:120-130``);
  * aborted extensions (divergence/turning inside the new subtree) do not
    merge the subtree's proposal or momentum sum (``nuts.py:78-79``).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .integration import IntegratorState, compute_state, leapfrog

__all__ = ['NutsStats', 'nuts_transition', 'nuts_core']


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
    q: jnp.ndarray
    energy: jnp.ndarray
    logp: jnp.ndarray


class _TreeLayout:
    """Flat-vector layout of a subtree summary.

    ``[left_p(D) | left_v(D) | right_p(D) | right_v(D) | p_sum(D) |
       log_size(1) | prop(P)]``

    where ``prop`` is the flattened proposal pytree (position + energy +
    logp, plus u/weight for the tempered variant). One flat vector means
    stack reads/writes and merge selects are single fused ops.
    """

    def __init__(self, dim, prop_example):
        self.dim = dim
        leaves = jax.tree.leaves(prop_example)
        self.prop_treedef = jax.tree.structure(prop_example)
        self.prop_shapes = [jnp.shape(l) for l in leaves]
        self.prop_sizes = [max(1, int(jnp.size(l))) for l in leaves]
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
        return jnp.concatenate(
            [jnp.atleast_1d(l) for l in jax.tree.leaves(prop)])

    def unflat_prop(self, vec):
        parts = []
        off = 0
        for shp, sz in zip(self.prop_shapes, self.prop_sizes):
            parts.append(vec[off:off + sz].reshape(shp))
            off += sz
        return jax.tree.unflatten(self.prop_treedef, parts)

    def leaf(self, state, d_energy, prop_of):
        return jnp.concatenate([
            state.p, state.v, state.p, state.v, state.p,
            jnp.reshape(-d_energy, (1,)), self.flat_prop(prop_of(state))])

    def start_tree(self, state, prop_of):
        return jnp.concatenate([
            state.p, state.v, state.p, state.v, state.p,
            jnp.zeros((1,), state.p.dtype),
            self.flat_prop(prop_of(state))])


def _logbern(key, log_p):
    return jnp.log(jax.random.uniform(key)) < log_p


def _uturn(p_sum, v_left, v_right):
    return (jnp.dot(p_sum, v_left) <= 0) | (jnp.dot(p_sum, v_right) <= 0)


def _merge(key, L, t1, t2, merged_depth):
    """Join adjacent flat subtrees t1 (older/left) and t2 (newer/right).

    Mirrors the join in ``nuts.py:146-167`` including the extra U-turn
    checks when the merged depth exceeds 1; the six U-turn dot products run
    as one packed (6, D) contraction.
    """
    ps1 = t1[L.sl_p_sum]
    ps2 = t2[L.sl_p_sum]
    p_sum = ps1 + ps2
    p_sum1 = ps1 + t2[L.sl_left_p]
    p_sum2 = t1[L.sl_right_p] + ps2
    lhs = jnp.stack([p_sum, p_sum, p_sum1, p_sum1, p_sum2, p_sum2])
    rhs = jnp.stack([t1[L.sl_left_v], t2[L.sl_right_v],
                     t1[L.sl_left_v], t2[L.sl_left_v],
                     t1[L.sl_right_v], t2[L.sl_right_v]])
    dots = jnp.sum(lhs * rhs, axis=-1)
    turning = (dots[0] <= 0) | (dots[1] <= 0)
    turning1 = (dots[2] <= 0) | (dots[3] <= 0)
    turning2 = (dots[4] <= 0) | (dots[5] <= 0)
    turning = turning | ((merged_depth > 1) & (turning1 | turning2))

    ls1 = t1[L.i_log_size]
    ls2 = t2[L.i_log_size]
    log_size = jnp.logaddexp(ls1, ls2)
    take2 = _logbern(key, ls2 - log_size)
    tail = jnp.where(take2, t2[L.sl_prop], t1[L.sl_prop])
    merged = jnp.concatenate([
        t1[L.sl_left], t2[L.sl_right], p_sum,
        jnp.reshape(log_size, (1,)), tail])
    return merged, turning


def _stack_read(stack, m, n_lvl):
    """Read level ``m`` via a one-hot multiply-reduce.

    Per-lane dynamic gathers measured ~40x a leapfrog; an einsum form lowers
    to a heavily padded batched matmul under vmap — the broadcast
    multiply + sum stays on the VPU.
    """
    oh = (jnp.arange(n_lvl) == m)
    return jnp.sum(jnp.where(oh[:, None], stack, 0), axis=0)


def _stack_write(stack, m, val, n_lvl):
    """Write ``val`` at level ``m`` via a one-hot select (no scatter)."""
    sel = (jnp.arange(n_lvl) == m)
    return jnp.where(sel[:, None], val[None, :], stack)


def _build_subtree(key, L, step_fn, prop_of, start_state, depth, eps,
                   start_energy, max_change, max_treedepth):
    """Iteratively build a subtree of ``2**depth`` leaves from start_state.

    Returns (key, tree_flat, end_state, accept_sum, n_prop, max_dE,
    diverging, turning). ``end_state`` is the last successfully integrated
    state (the subtree's right end in integration order).
    """
    dtype = start_state.q.dtype
    max_lvl = max(max_treedepth, 1)
    stack = jnp.zeros((max_lvl, L.total), dtype)
    n_leaf = jnp.left_shift(jnp.int32(1), depth)
    dummy = L.start_tree(start_state, prop_of)

    def cond(c):
        return (c['k'] < n_leaf) & ~c['diverging'] & ~c['turning']

    def body(c):
        key = c['key']
        new_state = step_fn(eps, c['cur'])
        d_energy = new_state.energy - start_energy
        d_energy = jnp.where(jnp.isnan(d_energy), jnp.inf, d_energy)
        max_de = jnp.where(jnp.abs(d_energy) > jnp.abs(c['max_de']),
                           d_energy, c['max_de'])
        div = ~(jnp.abs(d_energy) < max_change)
        accept = jnp.minimum(1.0, jnp.exp(-d_energy))
        accept_sum = c['accept_sum'] + jnp.where(div, 0.0, accept)
        n_prop = c['n_prop'] + 1

        leaf = L.leaf(new_state, d_energy, prop_of)

        # Binary-counter merges: merge while bit m of k is 1 (skipped when
        # the new leaf diverged, ``nuts.py:130-132``). The stack is
        # read-only here and captured by closure, not carried.
        stack_ro = c['stack']

        def mcond(mc):
            return (((c['k'] >> mc['m']) & 1) == 1) & ~mc['turning'] & ~div

        def mbody(mc):
            key, sub = jax.random.split(mc['key'])
            t1 = _stack_read(stack_ro, mc['m'], max_lvl)
            merged, turning = _merge(sub, L, t1, mc['inc'], mc['m'] + 1)
            return dict(key=key, m=mc['m'] + 1, inc=merged, turning=turning)

        mc = jax.lax.while_loop(
            mcond, mbody,
            dict(key=key, m=jnp.int32(0), inc=leaf,
                 turning=jnp.zeros((), bool)))
        key, turning, inc, m = mc['key'], mc['turning'], mc['inc'], mc['m']

        # Push unconditionally: on divergence/turning the subtree aborts
        # and the stack is never read again (fresh per extension).
        stack = _stack_write(c['stack'], m, inc, max_lvl)

        return dict(
            key=key, k=jnp.where(div, c['k'], c['k'] + 1),
            cur=jax.tree.map(lambda a, b: jnp.where(div, a, b),
                             c['cur'], new_state),
            stack=stack, tree=inc,
            accept_sum=accept_sum, n_prop=n_prop, max_de=max_de,
            diverging=div, turning=turning)

    init = dict(key=key, k=jnp.int32(0), cur=start_state, stack=stack,
                tree=dummy, accept_sum=jnp.zeros((), dtype),
                n_prop=jnp.int32(0), max_de=jnp.zeros((), dtype),
                diverging=jnp.zeros((), bool), turning=jnp.zeros((), bool))
    out = jax.lax.while_loop(cond, body, init)
    return (out['key'], out['tree'], out['cur'], out['accept_sum'],
            out['n_prop'], out['max_de'], out['diverging'], out['turning'])


def nuts_core(key, start, step_fn, prop_of, step_size, max_treedepth,
              max_change):
    """Generic iterative tree-doubling core over any integrator state with
    ``.q/.p/.v/.energy/.logp`` fields (shared by NUTS and tempered TNUTS).

    Returns the final loop state dict (proposal, depth, tree size,
    acceptance statistics, divergence flag).
    """
    start_energy = start.energy
    dtype = start.q.dtype
    L = _TreeLayout(start.p.shape[0], prop_of(start))

    def cond(c):
        return (c['depth'] < max_treedepth) & ~c['done']

    def body(c):
        key, k_dir = jax.random.split(c['key'])
        go_right = jax.random.uniform(k_dir) < 0.5
        eps = jnp.where(go_right, step_size, -step_size)
        start_side = jax.tree.map(
            lambda a, b: jnp.where(go_right, b, a), c['left'], c['right'])

        (key, sub, end_state, acc, npp, mde, div, turn) = _build_subtree(
            key, L, step_fn, prop_of, start_side, c['depth'], eps,
            start_energy, max_change, max_treedepth)

        accept_sum = c['accept_sum'] + acc
        n_prop = c['n_prop'] + npp
        max_de = jnp.where(jnp.abs(mde) > jnp.abs(c['max_de']), mde,
                           c['max_de'])
        depth = c['depth'] + 1
        aborted = div | turn

        # multinomial proposal swap between main tree and new subtree
        key, k_swap = jax.random.split(key)
        sub_ls = sub[L.i_log_size]
        take = _logbern(k_swap, sub_ls - c['log_size'])
        prop = jnp.where(~aborted & take, sub[L.sl_prop], c['prop'])
        log_size = jnp.where(aborted, c['log_size'],
                             jnp.logaddexp(c['log_size'], sub_ls))
        sub_p_sum = sub[L.sl_p_sum]
        p_sum_new = c['p_sum'] + sub_p_sum

        # new spatial ends; sub's right (integration order) is end_state
        new_left = jax.tree.map(
            lambda old, new: jnp.where(go_right, old, new),
            c['left'], end_state)
        new_right = jax.tree.map(
            lambda old, new: jnp.where(go_right, new, old),
            c['right'], end_state)

        # main-tree turning checks (``nuts.py:88-101``): six dots packed
        # into one (6, D) contraction, halves in spatial order
        lm_psum = jnp.where(go_right, c['p_sum'], sub_p_sum)
        rm_psum = jnp.where(go_right, sub_p_sum, c['p_sum'])
        lm_begin_v = jnp.where(go_right, c['left'].v, end_state.v)
        lm_end_p = jnp.where(go_right, c['right'].p, sub[L.sl_left_p])
        lm_end_v = jnp.where(go_right, c['right'].v, sub[L.sl_left_v])
        rm_begin_p = jnp.where(go_right, sub[L.sl_left_p], c['left'].p)
        rm_begin_v = jnp.where(go_right, sub[L.sl_left_v], c['left'].v)
        rm_end_v = jnp.where(go_right, end_state.v, c['right'].v)
        p_sum1 = lm_psum + rm_begin_p
        p_sum2 = lm_end_p + rm_psum
        lhs = jnp.stack([p_sum_new, p_sum_new, p_sum1, p_sum1,
                         p_sum2, p_sum2])
        rhs = jnp.stack([new_left.v, new_right.v, lm_begin_v, rm_begin_v,
                         lm_end_v, rm_end_v])
        dots = jnp.sum(lhs * rhs, axis=-1)
        turning_full = ((dots[0] <= 0) | (dots[1] <= 0) | (dots[2] <= 0) |
                        (dots[3] <= 0) | (dots[4] <= 0) | (dots[5] <= 0))

        done = aborted | turning_full
        sel = lambda old, new: jnp.where(aborted, old, new)
        return dict(
            key=key,
            left=jax.tree.map(sel, c['left'], new_left),
            right=jax.tree.map(sel, c['right'], new_right),
            p_sum=jnp.where(aborted, c['p_sum'], p_sum_new),
            log_size=log_size, prop=prop, depth=depth,
            accept_sum=accept_sum, n_prop=n_prop, max_de=max_de,
            diverging=c['diverging'] | div, done=done)

    init = dict(
        key=key, left=start, right=start, p_sum=start.p,
        log_size=jnp.zeros((), dtype),
        prop=L.flat_prop(prop_of(start)),
        depth=jnp.int32(0), accept_sum=jnp.zeros((), dtype),
        n_prop=jnp.int32(0), max_de=jnp.zeros((), dtype),
        diverging=jnp.zeros((), bool), done=jnp.zeros((), bool))
    out = jax.lax.while_loop(cond, body, init)
    out = dict(out)
    out['prop'] = L.unflat_prop(out['prop'])
    return out


def nuts_transition(key, q0, metric, step_size, logp_and_grad, max_treedepth,
                    max_change):
    """One full NUTS iteration for a single chain (``nuts.py:205-217``).

    Draws the momentum, computes the start state, runs up to
    ``max_treedepth`` tree doublings, and returns ``(q_new, stats)``.
    Vmapped over chains by the driver; the key/metric/step-size are per chain.
    """
    from .metrics import sample_momentum

    key, k_mom = jax.random.split(key)
    p0 = sample_momentum(metric, k_mom)
    start = compute_state(metric, logp_and_grad, q0, p0)
    dtype = q0.dtype

    step_fn = lambda eps, s: leapfrog(metric, logp_and_grad, eps, s)
    prop_of = lambda s: _Proposal(s.q, s.energy, s.logp)
    out = nuts_core(key, start, step_fn, prop_of, step_size, max_treedepth,
                    max_change)

    prop = out['prop']
    n_prop_f = jnp.maximum(out['n_prop'], 1).astype(dtype)
    stats = NutsStats(
        logp=prop.logp, energy=prop.energy,
        tree_depth=out['depth'], tree_size=out['n_prop'],
        mean_tree_accept=out['accept_sum'] / n_prop_f,
        energy_change=prop.energy - start.energy,
        max_energy_change=out['max_de'], diverging=out['diverging'])
    return prop.q, stats
