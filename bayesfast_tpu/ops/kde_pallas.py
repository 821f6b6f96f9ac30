"""Pallas TPU kernel for the weighted Gaussian-KDE cdf.

The SIT Gaussianization fit evaluates ``cdf(x_i) = sum_k w_k *
Phi((x_i - d_k) / h)`` at every spline knot for every dimension and flow
layer — an O(n_x * n_data) reduction. A naive XLA formulation materializes
the full (n_x, n_data) difference matrix in HBM; this kernel streams data
blocks through VMEM and accumulates the weighted Phi sums on the VPU, so
HBM traffic is O(n_x + n_data).

Falls back to a blocked-jnp implementation off-TPU (e.g. the CPU test
mesh).
"""

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ['kde_cdf_device', 'kde_cdf_batch']

_BLOCK_X = 512
_BLOCK_D = 1024

_SQRT1_2 = 0.7071067811865476


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7).

    Pallas TC has no erf lowering; this is exp/mul-only and fits the VPU.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _phi(z, exact=True):
    erf = jax.lax.erf if exact else _erf_approx
    return 0.5 * (1.0 + erf(z * _SQRT1_2))


_ROWS = 8  # sublane tile: rows of x processed per grid step


def _pallas_kernel(x_ref, data_ref, w_ref, h_ref, out_ref):
    from jax.experimental import pallas as pl

    inv_h = 1.0 / h_ref[0]
    n_d_blocks = data_ref.shape[0]

    def body(j, acc):
        d = data_ref[pl.ds(j, 1), :][0]    # (BLOCK_D,)
        w = w_ref[pl.ds(j, 1), :][0]
        # static unroll over sublane rows (tuple carry: no scatter ops)
        new = []
        for r in range(_ROWS):
            x = x_ref[r, :]
            z = (x[:, None] - d[None, :]) * inv_h
            new.append(acc[r] + _phi(z, exact=False) @ w)
        return tuple(new)

    zero = jnp.zeros((_BLOCK_X,), x_ref.dtype)
    acc = jax.lax.fori_loop(0, n_d_blocks, body,
                            tuple(zero for _ in range(_ROWS)))
    for r in range(_ROWS):
        out_ref[r, :] = acc[r]


def _pad_rows(a, m, value):
    n = a.shape[0]
    r = (-n) % m
    if r:
        a = jnp.concatenate([a, jnp.full((r,), value, a.dtype)])
    return a.reshape((-1, m))


@partial(jax.jit, static_argnames=('use_pallas',))
def _cdf_impl(x, data, w, h, use_pallas):
    dtype = x.dtype
    n_x = x.shape[0]
    xp = _pad_rows(x, _BLOCK_X, 0.0)         # (n_xb, BLOCK_X)
    # round the row count up to the sublane tile
    r = (-xp.shape[0]) % _ROWS
    if r:
        xp = jnp.concatenate([xp, jnp.zeros((r, _BLOCK_X), xp.dtype)])
    dp = _pad_rows(data, _BLOCK_D, 1e30)     # far pad: Phi(-inf) = 0
    wp = _pad_rows(w, _BLOCK_D, 0.0)

    if use_pallas:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu
        out = pl.pallas_call(
            _pallas_kernel,
            out_shape=jax.ShapeDtypeStruct(xp.shape, dtype),
            grid=(xp.shape[0] // _ROWS,),
            in_specs=[
                pl.BlockSpec((_ROWS, _BLOCK_X), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_ROWS, _BLOCK_X), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(xp, dp, wp, jnp.reshape(h, (1,)))
    else:
        # blocked jnp fallback with the same O(n_x + n_data) HBM footprint
        def body(j, acc):
            d = dp[j]
            wj = wp[j]
            z = (xp.reshape(-1)[:, None] - d[None, :]) / h
            return acc + (_phi(z) @ wj).reshape(xp.shape)
        out = jax.lax.fori_loop(0, dp.shape[0], body,
                                jnp.zeros(xp.shape, dtype))
    return out.reshape(-1)[:n_x]


_BLK_N = 1024


@jax.jit
def _cdf_batch_impl(x, data, w, h):
    """Batched-over-columns weighted KDE cdf: ``x`` (D, M) queries,
    ``data`` (D, N) per-column samples (N padded to a block multiple with
    +1e30), ``w`` (N,) shared weights (0 on padding), ``h`` (D,)
    bandwidths. Blocked over N so HBM holds O(D*M*BLK) intermediates."""
    D, M = x.shape
    n_blocks = data.shape[1] // _BLK_N

    def body(j, acc):
        d = jax.lax.dynamic_slice_in_dim(data, j * _BLK_N, _BLK_N, axis=1)
        wj = jax.lax.dynamic_slice_in_dim(w, j * _BLK_N, _BLK_N, axis=0)
        z = (x[:, :, None] - d[:, None, :]) / h[:, None, None]
        return acc + jnp.einsum('dmn,n->dm', _phi(z), wj)

    return jax.lax.fori_loop(0, n_blocks, body,
                             jnp.zeros((D, M), x.dtype))


def kde_cdf_batch(x, data, weights, h):
    """Batched KDE cdf across columns; see ``_cdf_batch_impl``. The caller
    pads queries (far positive -> cdf garbage rows it slices off); this
    wrapper pads the data axis.

    When a device mesh is configured (``parallel.mesh.set_mesh``) the data
    axis is sharded over it and each device accumulates the weighted-Phi
    partial sums for its shard, combined with one ``psum`` — the TPU-native
    form of the reference farming SIT per-dim fits over a process pool
    (``bayesfast/transforms/sit.py:230``). The padded data length is rounded
    up to a multiple of (mesh size x block) so every shard sees whole
    blocks; padding rows carry zero weight, preserving exact sums.
    """
    from ..parallel.mesh import get_mesh, mesh_size

    x = jnp.asarray(x)
    data = jnp.asarray(data, x.dtype)
    weights = jnp.asarray(weights, x.dtype)
    h = jnp.asarray(h, x.dtype)
    mesh = get_mesh()
    n_dev = mesh_size(mesh)
    blk = _BLK_N * n_dev if n_dev > 1 else _BLK_N
    pad = (-data.shape[1]) % blk
    if pad:
        data = jnp.concatenate(
            [data, jnp.full((data.shape[0], pad), 1e30, data.dtype)], axis=1)
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad,), weights.dtype)])
    if n_dev > 1:
        from functools import partial
        from jax.sharding import PartitionSpec as P
        axes = tuple(mesh.axis_names)

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(P(), P(None, axes), P(axes), P()),
                 out_specs=P(), check_vma=False)
        def sharded(xq, d, w, hh):
            part = _cdf_batch_impl(xq, d, w, hh)
            for ax in axes:
                part = jax.lax.psum(part, ax)
            return part

        return sharded(x, data, weights, h)
    return _cdf_batch_impl(x, data, weights, h)


def kde_cdf_device(x, data, weights, h, use_pallas=False):
    """Weighted 1-d KDE cdf on device; shapes (n_x,), (n_data,), (n_data,).

    Default is the blocked-jnp formulation: measured on v5e, XLA fuses the
    erf chain into the reduction and matches or beats the hand-written
    Pallas kernel, while the blocking still guarantees an O(n_x + n_data)
    HBM footprint. ``use_pallas=True`` selects the explicit VMEM-streaming
    kernel (TPU only; uses the A&S erf approximation, |err| < 2e-5 in f32).
    """
    x = jnp.asarray(x)
    data = jnp.asarray(data, x.dtype)
    weights = jnp.asarray(weights, x.dtype)
    h = jnp.asarray(h, x.dtype)
    use_pallas = bool(use_pallas) and jax.default_backend() == 'tpu'
    return _cdf_impl(x, data, weights, h, use_pallas)
