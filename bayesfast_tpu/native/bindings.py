"""ctypes bindings for the bf_native host library.

Builds ``libbf_native.so`` from ``src/bf_native.c`` on first use (gcc +
OpenMP), caches it next to this file, and exposes numpy-friendly wrappers.
Every entry point has a pure-numpy fallback so the package works without a
compiler; ``available()`` reports which path is active.
"""

import ctypes
import os
import subprocess
import warnings

import numpy as np

__all__ = ['available', 'sobol_points', 'kde_cdf', 'spline_eval',
           'spline_deriv', 'spline_solve']

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, 'src', 'bf_native.c')
_BUILD_DIR = os.environ.get('BF_NATIVE_BUILD_DIR',
                            os.path.join(_HERE, 'build'))
_LIB_PATH = os.path.join(_BUILD_DIR, 'libbf_native.so')
_lib = None
_tried = False

_c_dbl_p = ctypes.POINTER(ctypes.c_double)
_c_u32_p = ctypes.POINTER(ctypes.c_uint32)
_i64 = ctypes.c_int64


def _build():
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = _LIB_PATH + f'.tmp{os.getpid()}'
    cmd = ['gcc', '-O3', '-march=native', '-fopenmp', '-shared', '-fPIC',
           '-fvisibility=hidden', '-o', tmp, _SRC, '-lm']
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _LIB_PATH)  # atomic vs concurrent builders


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB_PATH) or
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.bf_sobol_points.argtypes = [_c_u32_p, _i64, _i64, _i64, _i64,
                                        _c_dbl_p]
        lib.bf_kde_cdf.argtypes = [_c_dbl_p, _c_dbl_p, _i64,
                                   ctypes.c_double, _c_dbl_p, _i64, _c_dbl_p]
        lib.bf_kde_cdf_sorted.argtypes = [_c_dbl_p, _c_dbl_p, _c_dbl_p, _i64,
                                          ctypes.c_double, _c_dbl_p, _i64,
                                          _c_dbl_p]
        lib.bf_set_threads.argtypes = [ctypes.c_int]
        lib.bf_spline_eval.argtypes = [_c_dbl_p, _c_dbl_p, _i64, _c_dbl_p,
                                       _i64, _c_dbl_p]
        lib.bf_spline_deriv.argtypes = lib.bf_spline_eval.argtypes
        lib.bf_spline_solve.argtypes = [_c_dbl_p, _c_dbl_p, _c_dbl_p, _i64,
                                        _c_dbl_p, _i64, _c_dbl_p]
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        warnings.warn(f'bf_native unavailable ({e}); using numpy fallbacks.',
                      RuntimeWarning)
        _lib = None
    return _lib


def available():
    return _load() is not None


def set_threads(n):
    """Cap (n > 0) or restore (n = 0) the OpenMP team size of every native
    kernel — callers that fan out over host threads set 1 to avoid
    oversubscription."""
    lib = _load()
    if lib is not None:
        lib.bf_set_threads(int(n))


def _dp(a):
    return a.ctypes.data_as(_c_dbl_p)


def sobol_points(V, n, skip=0):
    """Sobol points from a (d, n_bits) uint32 direction matrix; (n, d)."""
    V = np.ascontiguousarray(V, np.uint32)
    d, n_bits = V.shape
    lib = _load()
    out = np.empty((int(n), d))
    if lib is not None:
        lib.bf_sobol_points(V.ctypes.data_as(_c_u32_p), d, n_bits, int(n),
                            int(skip), _dp(out))
        return out
    # numpy fallback: gray-code XOR
    i = np.arange(skip, skip + n, dtype=np.uint64)
    g = i ^ (i >> np.uint64(1))
    X = np.zeros((int(n), d), np.uint32)
    for b in range(n_bits):
        mask = ((g >> np.uint64(b)) & np.uint64(1)).astype(bool)
        X[mask] ^= V[:, b]
    return X.astype(np.float64) * 2.0 ** -32


def kde_cdf(data, weights, h, x):
    """Weighted 1-d Gaussian KDE cdf at points x."""
    data = np.ascontiguousarray(data, np.float64)
    weights = np.ascontiguousarray(weights, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    lib = _load()
    if lib is not None:
        out = np.empty_like(x)
        lib.bf_kde_cdf(_dp(data), _dp(weights), data.size, float(h), _dp(x),
                       x.size, _dp(out))
        return out
    from scipy.special import ndtr
    return ndtr((x[:, None] - data[None, :]) / h) @ weights


def kde_cdf_sorted(sdata, sweights, prefix, h, x):
    """Windowed KDE cdf on presorted data with prefix weight sums: only the
    +-8h kernel window needs erf terms; the caller sorts once per kde."""
    sdata = np.ascontiguousarray(sdata, np.float64)
    sweights = np.ascontiguousarray(sweights, np.float64)
    prefix = np.ascontiguousarray(prefix, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    lib = _load()
    if lib is not None:
        out = np.empty_like(x)
        lib.bf_kde_cdf_sorted(_dp(sdata), _dp(sweights), _dp(prefix),
                              sdata.size, float(h), _dp(x), x.size, _dp(out))
        return out
    from scipy.special import ndtr
    lo = np.searchsorted(sdata, x - 8 * h, side='right')
    out = prefix[lo]
    for i, xi in enumerate(x):
        hi = np.searchsorted(sdata, xi + 8 * h, side='right')
        sl = slice(lo[i], hi)
        out[i] += ndtr((xi - sdata[sl]) / h) @ sweights[sl]
    return out


def _check_spline(c, x):
    c = np.ascontiguousarray(c, np.float64)
    x = np.ascontiguousarray(x, np.float64)
    assert c.ndim == 2 and c.shape[1] == 4 and c.shape[0] == x.shape[0] + 1
    return c, x


def spline_eval(c, x, xp):
    c, x = _check_spline(c, x)
    xp = np.ascontiguousarray(xp, np.float64)
    lib = _load()
    if lib is None:
        raise RuntimeError('bf_native unavailable; use the device kernels in '
                           'utils.cubic instead.')
    out = np.empty_like(xp)
    lib.bf_spline_eval(_dp(c), _dp(x), x.size, _dp(xp), xp.size, _dp(out))
    return out


def spline_deriv(c, x, xp):
    c, x = _check_spline(c, x)
    xp = np.ascontiguousarray(xp, np.float64)
    lib = _load()
    if lib is None:
        raise RuntimeError('bf_native unavailable; use the device kernels in '
                           'utils.cubic instead.')
    out = np.empty_like(xp)
    lib.bf_spline_deriv(_dp(c), _dp(x), x.size, _dp(xp), xp.size, _dp(out))
    return out


def spline_solve(c, x, y, yp):
    c, x = _check_spline(c, x)
    y = np.ascontiguousarray(y, np.float64)
    yp = np.ascontiguousarray(yp, np.float64)
    lib = _load()
    if lib is None:
        raise RuntimeError('bf_native unavailable; use the device kernels in '
                           'utils.cubic instead.')
    out = np.empty_like(yp)
    lib.bf_spline_solve(_dp(c), _dp(x), _dp(y), x.size, _dp(yp), yp.size,
                        _dp(out))
    return out
