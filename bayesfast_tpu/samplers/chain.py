"""Batched multi-chain driver: vmap over chains, scan over iterations.

This replaces the reference's process-per-chain architecture
(``bayesfast/core/sample.py:165-214`` + ``base_hmc.py:87-172``): instead of a
worker pool picking one chain each, all chains advance in lockstep inside a
single jitted program, with the chain axis ready to be sharded over a device
mesh. Per-chain adaptation state (dual-averaging step size, Welford metric)
lives in the scan carry; samples and per-iteration statistics come out as
stacked arrays.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .chees import chees_transition_batched, chees_adapt_update, halton2
from .hmc import hmc_transition
from .metrics import update_metric, update_metric_pooled
from .nuts import nuts_transition_batched
from .step_size import current_step_size, update_step_size
from .tempered import tnuts_transition_batched, thmc_transition

__all__ = ['ChainCarry', 'ChainDriver']


class ChainCarry(NamedTuple):
    key: Any      # (n_chain,) PRNG keys
    q: Any        # (n_chain, dim)
    step: Any     # StepSizeState, batched over chains
    metric: Any   # Diag/FullMetricState, batched over chains


class ChainDriver:
    """Compiles and runs the batched sampling loop for one configuration.

    Parameters mirror the reference trace configs (``sample_trace.py:157-537``).
    ``algorithm`` is 'nuts' or 'hmc'.
    """

    def __init__(self, logp_and_grad, algorithm='nuts', max_treedepth=10,
                 n_int_step=32, max_change=1000., target_accept=0.8,
                 gamma=0.05, k=0.75, t_0=10., adapt_step_size=True,
                 update_window=1, doubling=True, adapt_metric=True,
                 logp_and_grad_base=None, pooled_metric=False,
                 max_leapfrogs=1024, adapt_traj_len=True, chees_lr=0.025,
                 nuts_kernel='xla', mesh=None):
        self._nuts_kernel = nuts_kernel
        self._mesh = mesh
        self._max_leapfrogs = int(max_leapfrogs)
        self._adapt_traj_len = bool(adapt_traj_len)
        self._chees_lr = float(chees_lr)
        self._logp_and_grad = logp_and_grad
        self._logp_and_grad_base = logp_and_grad_base
        self._algorithm = algorithm
        self._max_treedepth = int(max_treedepth)
        self._n_int_step = int(n_int_step)
        self._max_change = float(max_change)
        self._target_accept = float(target_accept)
        self._gamma = float(gamma)
        self._k = float(k)
        self._t_0 = float(t_0)
        self._adapt_step_size = bool(adapt_step_size)
        self._update_window = int(update_window)
        self._doubling = bool(doubling)
        self._adapt_metric = bool(adapt_metric)
        self._pooled_metric = bool(pooled_metric)
        self._compiled = None
        self._compiled_chunks = {}

    def _one_chain_step(self, key, q, step_state, metric, warmup, params):
        """Per-chain transition for the fixed-trajectory algorithms
        (hmc/thmc); vmapped over chains by ``_build``."""
        tempered = self._algorithm == 'thmc'
        if tempered:
            # q holds [u, q...] (the extended tempering coordinate first)
            params_t, params_b = params
            lpg = lambda x: self._logp_and_grad(params_t, x)
            lpg_b = lambda x: self._logp_and_grad_base(params_b, x)
            u, qq = q[0], q[1:]
        else:
            lpg = lambda x: self._logp_and_grad(params, x)
        eps = current_step_size(step_state, warmup)
        key, k_t = jax.random.split(key)
        if self._algorithm == 'hmc':
            q_new, stats = hmc_transition(
                k_t, q, metric, eps, lpg,
                self._n_int_step, self._max_change)
            accept_stat = stats.accept_stat
        elif self._algorithm == 'thmc':
            q_new, u_new, stats = thmc_transition(
                k_t, qq, u, metric, eps, lpg, lpg_b,
                self._n_int_step, self._max_change)
            accept_stat = stats.accept_stat
            q_new = jnp.concatenate([u_new[None], q_new])
        else:
            raise ValueError(f'unknown algorithm {self._algorithm}.')
        step_state = update_step_size(
            step_state, accept_stat, warmup, self._target_accept, self._gamma,
            self._k, self._t_0, self._adapt_step_size)
        # step sizes recorded *after* the update, as in ``base_hmc.py:80-84``;
        # the metric update happens at the batch level in scan_fn (shared or
        # per chain depending on pooled_metric)
        extras = {'step_size': jnp.exp(step_state.log_step),
                  'step_size_bar': jnp.exp(step_state.log_bar),
                  'warmup': warmup}
        return key, q_new, step_state, (stats, extras)

    def _batched_step(self, keys, q, step_state, metric, warmup, params):
        """Batch-first transition for the tree algorithms (nuts/tnuts): the
        whole chain batch advances in one flat tree-building loop (see
        ``nuts.nuts_core_batched``), with adaptation updates running as
        elementwise batched ops — nothing here is vmapped."""
        tempered = self._algorithm == 'tnuts'
        # advance the per-chain key streams; the kernel's per-lane
        # randomness comes from counter-based (C,)-shaped draws of one key
        splits = jax.vmap(lambda kk: jax.random.split(kk, 2))(keys)
        new_keys, k_core = splits[:, 0], splits[:, 1][0]
        eps = current_step_size(step_state, warmup)
        if tempered:
            params_t, params_b = params
            lpg_b = jax.vmap(lambda x: self._logp_and_grad(params_t, x))
            lpg_base_b = jax.vmap(
                lambda x: self._logp_and_grad_base(params_b, x))
            u, qq = q[:, 0], q[:, 1:]
            q_new, u_new, stats = tnuts_transition_batched(
                k_core, qq, u, metric, eps, lpg_b, lpg_base_b,
                self._max_treedepth, self._max_change)
            q_new = jnp.concatenate([u_new[:, None], q_new], axis=1)
        else:
            lpg_b = jax.vmap(lambda x: self._logp_and_grad(params, x))
            from .metrics import DiagMetricState
            if (self._nuts_kernel == 'pallas'
                    and isinstance(metric, DiagMetricState)):
                from .nuts_pallas import nuts_transition_batched_pallas
                interp = jax.default_backend() == 'cpu'
                if self._mesh is not None:
                    q_new, stats = self._sharded_pallas_single(
                        k_core, q, metric.var, eps, params, interp)
                else:
                    q_new, stats = nuts_transition_batched_pallas(
                        k_core, q, metric, eps, None,
                        self._max_treedepth, self._max_change,
                        interpret=interp,
                        params=params, lpg_pb=self._logp_and_grad)
            else:
                q_new, stats = nuts_transition_batched(
                    k_core, q, metric, eps, lpg_b,
                    self._max_treedepth, self._max_change)
        accept_stat = stats.mean_tree_accept
        step_state = update_step_size(
            step_state, accept_stat, warmup, self._target_accept, self._gamma,
            self._k, self._t_0, self._adapt_step_size)
        extras = {'step_size': jnp.exp(step_state.log_step),
                  'step_size_bar': jnp.exp(step_state.log_bar),
                  'warmup': jnp.broadcast_to(warmup, accept_stat.shape)}
        return new_keys, q_new, step_state, (stats, extras)

    def _chees_step(self, keys, q, adapt, metric, warmup, params):
        """Batch-first ChEES-HMC step: shared jittered trajectory, per-chain
        MH, cross-chain trajectory-length/step-size adaptation."""
        splits = jax.vmap(lambda kk: jax.random.split(kk, 2))(keys)
        new_keys, k_core = splits[:, 0], splits[:, 1][0]
        lpg_b = jax.vmap(lambda x: self._logp_and_grad(params, x))
        eps = current_step_size(adapt.step, warmup)
        h = halton2(adapt.count)
        traj_len = jnp.exp(adapt.log_T)
        q_new, stats, (q_prop, v_prop, ap) = chees_transition_batched(
            k_core, q, metric, eps, traj_len, h, lpg_b,
            self._max_leapfrogs, self._max_change)
        adapt = chees_adapt_update(
            adapt, q, q_prop, v_prop, ap, h, eps, warmup,
            self._target_accept, self._gamma, self._k, self._t_0,
            self._adapt_step_size, self._adapt_traj_len, self._chees_lr,
            self._max_leapfrogs)
        shape = stats.accept_stat.shape
        extras = {
            'step_size': jnp.broadcast_to(jnp.exp(adapt.step.log_step),
                                          shape),
            'step_size_bar': jnp.broadcast_to(jnp.exp(adapt.step.log_bar),
                                              shape),
            'warmup': jnp.broadcast_to(warmup, shape)}
        return new_keys, q_new, adapt, (stats, extras)

    def _build(self):
        if self._algorithm == 'chees':
            batched = self._chees_step
        elif self._algorithm in ('nuts', 'tnuts'):
            batched = self._batched_step
        else:
            metric_axis = None if self._pooled_metric else 0
            batched = jax.vmap(self._one_chain_step,
                               in_axes=(0, 0, 0, metric_axis, None, None))
        tempered = self._algorithm in ('tnuts', 'thmc')

        def scan_fn(carry, warmup_flags, params):
            def step(c, w):
                key, q, ss, out = batched(c.key, c.q, c.step, c.metric, w,
                                          params)
                qm = q[:, 1:] if tempered else q
                if not self._adapt_metric:
                    ms = c.metric
                elif self._pooled_metric:
                    # shared mass matrix fed by all chains (cross-chain
                    # pooled adaptation; a TPU-native extension)
                    ms = update_metric_pooled(c.metric, qm, w,
                                              self._update_window,
                                              self._doubling)
                else:
                    ms = jax.vmap(update_metric,
                                  in_axes=(0, 0, None, None, None))(
                        c.metric, qm, w, self._update_window, self._doubling)
                return ChainCarry(key, q, ss, ms), (q, out)
            return jax.lax.scan(step, carry, warmup_flags)

        return jax.jit(scan_fn, donate_argnums=(0,))

    @staticmethod
    def _flat_shard_index(axes):
        """Row-major flat index of this shard over the given mesh axes."""
        idx = jax.lax.axis_index(axes[0])
        for a in axes[1:]:
            idx = idx * jax.lax.psum(1, a) + jax.lax.axis_index(a)
        return idx

    def _sharded_pallas_single(self, k_core, q, var, eps, params, interp):
        """One NUTS transition on the Pallas kernel, mesh-sharded over
        chains via ``shard_map`` — each device runs the kernel on its
        local chain shard. The kernel RNG is keyed by GLOBAL chain index
        (``chain_start``), so the result is bitwise identical to the
        unsharded kernel (auto-SPMD cannot partition a ``pallas_call``,
        which is why this is a manual region)."""
        from jax.sharding import PartitionSpec as P
        from .metrics import DiagMetricState
        from .nuts_pallas import nuts_transition_batched_pallas
        from .nuts import NutsStats
        mesh = self._mesh
        axes = tuple(mesh.axis_names)
        pc, pr = P(axes), P()
        var_spec = pc if var.ndim == 2 else pr
        eps_spec = pc if getattr(eps, 'ndim', 0) >= 1 else pr

        def local(k, q_l, var_l, eps_l, params_l):
            cs = self._flat_shard_index(axes) * q_l.shape[0]
            metric_l = DiagMetricState(var=var_l, fg=None, bg=None,
                                       n_samples=None, prev_update=None,
                                       adapt_window=None)
            return nuts_transition_batched_pallas(
                k, q_l, metric_l, eps_l, None, self._max_treedepth,
                self._max_change, interpret=interp, params=params_l,
                lpg_pb=self._logp_and_grad, chain_start=cs)

        # check_vma=False: the pallas_call's ShapeDtypeStructs carry no
        # varying-mesh-axes annotation, which the checker would reject
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(pr, pc, var_spec, eps_spec, pr),
                           out_specs=(pc, NutsStats(*([pc] * 8))),
                           check_vma=False)
        return fn(k_core, q, var, eps, params)

    def _build_frozen_chunk(self, n_steps):
        from .metrics import DiagMetricState  # noqa: F401 (contract doc)
        from .nuts_pallas import nuts_chunk_batched_pallas

        def chunk_fn(carry, params, i0):
            # the chain key does NOT advance: frozen-chunk randomness is
            # (key, global-iteration) keyed, so any chunk partitioning —
            # including a checkpoint resume — reproduces the same stream
            eps = jnp.exp(carry.step.log_bar)  # frozen post-warmup size
            interp = jax.default_backend() == 'cpu'
            if self._mesh is not None:
                q_chunk, q_last, stats = self._sharded_pallas_chunk(
                    carry.key[0], carry.q, carry.metric.var, eps,
                    n_steps, params, i0, interp)
            else:
                q_chunk, q_last, stats = nuts_chunk_batched_pallas(
                    carry.key[0], carry.q, carry.metric, eps, n_steps,
                    self._max_treedepth, self._max_change,
                    interpret=interp,
                    params=params, lpg_pb=self._logp_and_grad, i0=i0)
            accept = stats.mean_tree_accept          # (n_steps, C)
            # the only live adaptation state post-warmup is the acceptance
            # diagnostic accumulator (``step_size.update_step_size``)
            step = carry.step._replace(
                accept_sum=carry.step.accept_sum + jnp.sum(accept, axis=0),
                accept_count=carry.step.accept_count + float(n_steps))
            # step sizes are frozen here: the caller reconstructs the
            # (n_steps, C) extras rows host-side from one tiny per-chain
            # fetch instead of shipping three broadcast arrays per chunk
            new_carry = ChainCarry(carry.key, q_last, step, carry.metric)
            return new_carry, (q_chunk, (stats, None))

        return jax.jit(chunk_fn, donate_argnums=(0,))

    def _sharded_pallas_chunk(self, key, q, var, eps, n_steps, params, i0,
                              interp):
        """Mesh-sharded frozen chunk: the K-transition kernel runs per
        shard under ``shard_map``; global-chain-indexed RNG keeps the
        stream bitwise-equal to the unsharded chunk kernel."""
        from jax.sharding import PartitionSpec as P
        from .metrics import DiagMetricState
        from .nuts_pallas import nuts_chunk_batched_pallas
        from .nuts import NutsStats
        mesh = self._mesh
        axes = tuple(mesh.axis_names)
        pc, pr = P(axes), P()
        pkc = P(None, axes)          # (n_steps, C) stats
        pkv = P(None, axes, None)    # (n_steps, C, D) samples
        var_spec = pc if var.ndim == 2 else pr
        eps_spec = pc if getattr(eps, 'ndim', 0) >= 1 else pr

        def local(k, q_l, var_l, eps_l, params_l, i0_l):
            cs = self._flat_shard_index(axes) * q_l.shape[0]
            metric_l = DiagMetricState(var=var_l, fg=None, bg=None,
                                       n_samples=None, prev_update=None,
                                       adapt_window=None)
            return nuts_chunk_batched_pallas(
                k, q_l, metric_l, eps_l, n_steps, self._max_treedepth,
                self._max_change, interpret=interp, params=params_l,
                lpg_pb=self._logp_and_grad, i0=i0_l, chain_start=cs)

        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(pr, pc, var_spec, eps_spec, pr, pr),
            out_specs=(pkv, pc, NutsStats(*([pkc] * 8))),
            check_vma=False)
        return fn(key, q, var, eps, params, i0)

    def _sharded_pallas_warmup(self, carry, params, n_steps, i0, wsched,
                               interp):
        """Mesh-sharded warmup chunk: adaptation is strictly per-chain (the
        window schedule is a global host-computed table), so the adapting
        kernel shards over chains exactly like the frozen chunk — and the
        global-chain-indexed RNG keeps mesh runs bitwise-equal to
        single-device runs."""
        from jax.sharding import PartitionSpec as P
        from .metrics import DiagMetricState, _Welford
        from .step_size import StepSizeState
        from .nuts_pallas import nuts_warmup_chunk_batched_pallas
        mesh = self._mesh
        axes = tuple(mesh.axis_names)
        pc, pr = P(axes), P()

        step = carry.step
        metric = carry.metric
        s_leaves = (step.log_step, step.log_bar, step.hbar, step.count,
                    step.mu)
        m_leaves = (metric.var, metric.fg.mean, metric.fg.raw,
                    metric.fg.weight, metric.bg.mean, metric.bg.raw,
                    metric.bg.weight)

        def local(k, q_l, s_l, m_l, params_l, i0_l, wsched_l):
            cs = self._flat_shard_index(axes) * q_l.shape[0]
            zero = q_l[:, 0] * 0
            step_l = StepSizeState(log_step=s_l[0], log_bar=s_l[1],
                                   hbar=s_l[2], count=s_l[3], mu=s_l[4],
                                   accept_sum=zero, accept_count=zero)
            metric_l = DiagMetricState(
                var=m_l[0], fg=_Welford(m_l[1], m_l[2], m_l[3]),
                bg=_Welford(m_l[4], m_l[5], m_l[6]),
                n_samples=None, prev_update=None, adapt_window=None)
            return nuts_warmup_chunk_batched_pallas(
                k, q_l, step_l, metric_l, n_steps,
                self._max_treedepth, self._max_change,
                self._target_accept, self._gamma, self._k, self._t_0,
                self._adapt_step_size, self._adapt_metric, wsched_l,
                interpret=interp, params=params_l,
                lpg_pb=self._logp_and_grad, i0=i0_l, chain_start=cs)

        # all kernel outputs are lane-minor (chain axis LAST)
        names_rows = ('q', 'logp', 'energy', 'energy_change', 'tree_depth',
                      'tree_size', 'accept_sum', 'max_de', 'diverging',
                      'step_size', 'step_size_bar')
        names_fin = ('q_final', 'log_step', 'log_bar', 'hbar', 'count',
                     'var', 'fg_mean', 'fg_raw', 'fg_w',
                     'bg_mean', 'bg_raw', 'bg_w')
        out_specs = {}
        for n in names_rows:
            out_specs[n] = P(None, None, axes)
        for n in names_fin:
            out_specs[n] = P(None, axes)
        fn = jax.shard_map(
            local, mesh=mesh,
            in_specs=(pr, pc, (pc,) * 5, (pc,) * 7, pr, pr, pr),
            out_specs=out_specs, check_vma=False)
        return fn(carry.key[0], carry.q, s_leaves, m_leaves, params,
                  i0, wsched)

    def _build_warmup_chunk(self, n_steps):
        from .metrics import DiagMetricState, _Welford
        from .step_size import StepSizeState
        from .nuts import NutsStats
        from .nuts_pallas import nuts_warmup_chunk_batched_pallas

        def fn(carry, params, i0, wsched, ints_new):
            interp = jax.default_backend() == 'cpu'
            if self._mesh is not None:
                o = self._sharded_pallas_warmup(
                    carry, params, n_steps, i0, wsched, interp)
            else:
                o = nuts_warmup_chunk_batched_pallas(
                    carry.key[0], carry.q, carry.step, carry.metric,
                    n_steps, self._max_treedepth, self._max_change,
                    self._target_accept, self._gamma, self._k, self._t_0,
                    self._adapt_step_size, self._adapt_metric, wsched,
                    interpret=interp,
                    params=params, lpg_pb=self._logp_and_grad, i0=i0)
            dtype = carry.q.dtype
            q_chunk = jnp.swapaxes(o['q'], 1, 2)
            n_prop = jnp.maximum(o['tree_size'][:, 0], 1).astype(dtype)
            stats = NutsStats(
                logp=o['logp'][:, 0], energy=o['energy'][:, 0],
                tree_depth=o['tree_depth'][:, 0],
                tree_size=o['tree_size'][:, 0],
                mean_tree_accept=o['accept_sum'][:, 0] / n_prop,
                energy_change=o['energy_change'][:, 0],
                max_energy_change=o['max_de'][:, 0],
                diverging=o['diverging'][:, 0].astype(bool))
            extras = {'step_size': o['step_size'][:, 0],
                      'step_size_bar': o['step_size_bar'][:, 0],
                      'warmup': jnp.ones(o['logp'][:, 0].shape, bool)}
            step = StepSizeState(
                log_step=o['log_step'][0], log_bar=o['log_bar'][0],
                hbar=o['hbar'][0], count=o['count'][0],
                mu=carry.step.mu,
                # the post-warmup acceptance diagnostic stays untouched
                # during warmup (``step_size.update_step_size``)
                accept_sum=carry.step.accept_sum,
                accept_count=carry.step.accept_count)
            C = carry.q.shape[0]
            metric = DiagMetricState(
                var=o['var'].T,
                fg=_Welford(o['fg_mean'].T, o['fg_raw'].T, o['fg_w'][0]),
                bg=_Welford(o['bg_mean'].T, o['bg_raw'].T, o['bg_w'][0]),
                n_samples=jnp.broadcast_to(ints_new[0], (C,)),
                prev_update=jnp.broadcast_to(ints_new[1], (C,)),
                adapt_window=jnp.broadcast_to(ints_new[2], (C,)))
            new_carry = ChainCarry(carry.key, o['q_final'].T, step, metric)
            return new_carry, (q_chunk, (stats, extras))

        return jax.jit(fn, donate_argnums=(0,))

    def run_warmup_chunk(self, carry, n_steps, params=(), i0=0,
                         win_ints=None):
        """Warmup fast path: ``n_steps`` adapting transitions per Pallas
        kernel call (dual averaging + windowed Welford run in-kernel).
        ``win_ints`` threads the (n_samples, prev_update, adapt_window)
        window counters across chunks host-side (they evolve
        deterministically); pass None to read them from the carry (one
        tiny fetch). Returns ``(carry, out, win_ints)``."""
        from .nuts_pallas import _window_schedule
        import numpy as _np
        n_steps = int(n_steps)
        if win_ints is None:
            def _glob(x):
                # multi-process meshes shard the per-chain metric leaves;
                # gather so every process reads the same window counters
                if isinstance(x, jax.Array) and not x.is_fully_addressable:
                    from jax.experimental import multihost_utils
                    x = multihost_utils.process_allgather(x, tiled=True)
                return int(_np.asarray(x).ravel()[0])
            m = carry.metric
            win_ints = (_glob(m.n_samples), _glob(m.prev_update),
                        _glob(m.adapt_window))
        pieces = []
        done = 0
        while done < n_steps:
            k = min(self._CHUNK_CAP, n_steps - done)
            wsched, win_ints = _window_schedule(
                win_ints[0], win_ints[1], win_ints[2], k,
                self._update_window, self._doubling)
            key_fn = ('warm', k)
            fn = self._compiled_chunks.get(key_fn)
            if fn is None:
                fn = self._compiled_chunks[key_fn] = \
                    self._build_warmup_chunk(k)
            carry, out = fn(carry, params, jnp.asarray(i0 + done,
                                                      jnp.int32),
                            jnp.asarray(wsched),
                            jnp.asarray(win_ints, jnp.int32))
            pieces.append(out)
            done += k
        if len(pieces) == 1:
            return carry, pieces[0], win_ints
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *pieces)
        return carry, stacked, win_ints

    # transitions per kernel call: bounds the (K, D+8, block)-shaped VMEM
    # output windows (a 200-transition call measured over the v5e scoped
    # limit and failed to compile; 64 leaves ample headroom at D=32)
    _CHUNK_CAP = 64

    def run_frozen_chunk(self, carry, n_steps, params=(), i0=0):
        """Post-warmup fast path: ``n_steps`` transitions in Pallas chunk
        kernel calls (in-kernel momentum refresh, no per-transition XLA
        glue). Only valid for algorithm='nuts' with the Pallas kernel and
        a diagonal metric, AFTER warmup (step size and metric frozen);
        output layout matches ``run``. Chunks larger than ``_CHUNK_CAP``
        loop over sub-chunks (the per-call glue is one key split).
        """
        n_steps = int(n_steps)
        pieces = []
        done = 0
        while done < n_steps:
            k = min(self._CHUNK_CAP, n_steps - done)
            fn = self._compiled_chunks.get(k)
            if fn is None:
                fn = self._compiled_chunks[k] = self._build_frozen_chunk(k)
            carry, out = fn(carry, params, jnp.asarray(i0 + done,
                                                       jnp.int32))
            pieces.append(out)
            done += k
        if len(pieces) == 1:
            return carry, pieces[0]
        stacked = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *pieces)
        return carry, stacked

    def run(self, carry, warmup_flags, params=()):
        """Run ``len(warmup_flags)`` iterations; returns (carry, (samples, stats)).

        ``samples`` has shape (n_steps, n_chain, dim); stats leaves are
        (n_steps, n_chain). ``params`` is the density's dynamic-parameter
        pytree (surrogate coefficients etc.), threaded as a runtime argument
        so refits do not recompile.
        """
        if self._compiled is None:
            self._compiled = self._build()
        return self._compiled(carry, jnp.asarray(warmup_flags), params)
