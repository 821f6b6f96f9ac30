"""Sliced Iterative Transform — a Gaussianizing normalizing flow fitted to
samples (``bayesfast/transforms/sit.py:28-459``).

Per iteration: (i) FastICA rotation (device, ``ops.ica``), (ii) per-dimension
1-d Gaussianization ``ndtri(KDE_cdf(x))`` approximated by a monotone cubic
spline. The reference farms the per-dim spline fits over a process pool
(``sit.py:230``); here the fits are a fast host loop (percentile/tridiagonal
numpy) while every bulk evaluation — forward/backward transforms, Jacobians,
spline inversion — runs as batched device kernels (``utils.cubic``), with all
dims of a layer evaluated by one kernel over padded knot arrays.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import ndtri

from ..utils.kde import kde
from ..utils.cubic import cubic_spline, CubicSplineSet
from ..utils.sobol import multivariate_normal
from ..utils.random import get_generator, next_key
from ..ops.ica import fast_ica

__all__ = ['SIT']


class SIT:
    """Sliced Iterative Transform generative model.

    Parameters mirror the reference; ``parallel_backend`` is accepted and
    ignored (per-dim work is batched on device instead of pool-mapped).
    """

    def __init__(self, n_iter=10, parallel_backend=None, bw_factor=1.,
                 m_ica=20000, random_generator=None, m_plot=8,
                 cubic_options=None, ica_options=None, mvn_generator=None):
        self._data = None
        self._spline_sets = []
        self.n_iter = n_iter
        self.bw_factor = bw_factor
        self.m_ica = m_ica
        self.random_generator = random_generator
        self.m_plot = int(m_plot)
        self.cubic_options = dict(cubic_options or {})
        self.ica_options = dict(ica_options if ica_options is not None
                                else {'max_iter': 100})
        self.mvn_generator = (multivariate_normal if mvn_generator is None
                              else mvn_generator)

    @property
    def data(self):
        return self._data

    @property
    def data_init(self):
        return self._data_init

    @property
    def dim(self):
        return self._data.shape[-1]

    @property
    def weights(self):
        return self._weights

    @property
    def n_iter(self):
        return self._n_iter

    @n_iter.setter
    def n_iter(self, n):
        n = int(n)
        if n <= 0:
            raise ValueError('n_iter should be a positive int.')
        self._n_iter = n

    @property
    def i_iter(self):
        return len(self._spline_sets)

    def add_iter(self, n):
        self.n_iter = self.n_iter + n

    @property
    def random_generator(self):
        if self._random_key is None:
            return get_generator()
        return self._random_key

    @random_generator.setter
    def random_generator(self, generator):
        if generator is None:
            self._random_key = None
        elif isinstance(generator, (int, np.integer)):
            self._random_key = jax.random.PRNGKey(int(generator))
        else:
            self._random_key = generator

    def _next_key(self):
        if self._random_key is None:
            return next_key()
        self._random_key, sub = jax.random.split(self._random_key)
        return sub

    # ------------- fitting -------------

    def _gaussianize_1d(self, x):
        """KDE-cdf -> ndtri -> monotone spline for one dimension
        (``sit.py:223-227``)."""
        k = kde(x, bw_factor=self.bw_factor, weights=self._weights)
        return cubic_spline(x, lambda xx: ndtri(k.cdf(xx)),
                            **self.cubic_options)

    def _gaussianize_nd(self, y):
        splines = [self._gaussianize_1d(np.asarray(y[:, i]))
                   for i in range(self.dim)]
        sset = CubicSplineSet(splines)
        self._spline_sets.append(sset)
        out = np.asarray(sset.evaluate(np.asarray(y).T)).T
        return out

    def _ica(self, x):
        key = self._next_key()
        x = np.asarray(x)
        if self.m_ica is not None and x.shape[0] > self.m_ica:
            idx = np.asarray(jax.random.choice(
                jax.random.fold_in(key, 1), x.shape[0], (self.m_ica,),
                replace=False))
            x_fit = x[idx]
        else:
            x_fit = x
        components, mean = fast_ica(
            x_fit, key, max_iter=self.ica_options.get('max_iter', 100),
            tol=self.ica_options.get('tol', 1e-4))
        components = np.asarray(components, np.float64)
        mean = np.asarray(mean, np.float64)
        y = (x - mean) @ components.T
        s = np.std(y, axis=0)
        y = y / s
        A = components / s[:, None]
        B = np.linalg.inv(A)
        m = np.mean(x, axis=0)
        return y, A, B, m

    def _init_data(self, data, weights):
        if data is None:
            if self._data is None:
                raise ValueError('you have not given me the data to fit.')
            return
        data = np.array(data, np.float64)
        if data.ndim == 2:
            self._data = data
        elif data.ndim >= 3:
            self._data = data.reshape((-1, data.shape[-1]))
        else:
            raise ValueError('invalid shape for data.')
        self._data_init = self._data.copy()
        if self.dim == 1:
            raise ValueError('I cannot do rotations for only one variable.')
        n = self._data.shape[0]
        if weights is not None:
            weights = np.asarray(weights)
            if weights.shape != (n,):
                raise ValueError('invalid value for weights.')
            self._weights = weights
        else:
            self._weights = np.ones(n) / n
        self._spline_sets = []
        self._A = np.zeros((0, self.dim, self.dim))
        self._B = np.zeros((0, self.dim, self.dim))
        self._m = np.zeros((0, self.dim))
        self._logdetA = np.zeros(0)

    def fit(self, data=None, weights=None, n_run=None, plot=0):
        """Fit ``n_run`` more Gaussianization layers (``sit.py:292-344``)."""
        self._init_data(data, weights)
        if n_run is None:
            n_run = self.n_iter - self.i_iter
        else:
            n_run = int(n_run)
            if n_run <= 0:
                raise ValueError('invalid value for n_run.')
            if n_run > self.n_iter - self.i_iter:
                self.n_iter = self.i_iter + n_run

        for _ in range(n_run):
            try:
                y, A, B, m = self._ica(self._data)
                data_new = self._gaussianize_nd(y)
            except Exception:
                warnings.warn(
                    'we found that sometimes it goes wrong, but actually it '
                    'can work if we use a different random seed, so let us '
                    'give it one more chance.', RuntimeWarning)
                y, A, B, m = self._ica(self._data)
                data_new = self._gaussianize_nd(y)
            self._data = data_new
            self._A = np.concatenate((self._A, A[np.newaxis]), axis=0)
            self._B = np.concatenate((self._B, B[np.newaxis]), axis=0)
            self._m = np.concatenate((self._m, m[np.newaxis]), axis=0)
            self._logdetA = np.append(
                self._logdetA, np.log(np.abs(np.linalg.det(A))))
            finite_index = np.isfinite(self._data).all(axis=1)
            if np.sum(finite_index) < self._data.shape[0]:
                warnings.warn('inf encountered for some data points. We will '
                              'remove these inf points for now.',
                              RuntimeWarning)
            self._data = self._data[finite_index, :]
            self._weights = self._weights[finite_index]

    # ------------- transforms -------------

    def forward_transform(self, x, use_parallel=False):
        """Data space -> latent (approximately N(0, I)); returns (y, log_j)
        (``sit.py:385-419``)."""
        y = np.array(x, np.float64)
        if y.ndim == 1:
            y = y[np.newaxis, :]
        if y.shape[-1] != self.dim:
            raise ValueError('invalid shape for x.')
        original_shape = y.shape
        y = y.reshape((-1, original_shape[-1]))
        log_j = np.zeros(y.shape[0])

        for i in range(self.i_iter):
            y = (y - self._m[i]) @ self._A[i].T
            yT = jnp.asarray(y.T)
            sset = self._spline_sets[i]
            der = np.asarray(sset.derivative(yT))
            log_j += np.sum(np.log(der), axis=0)
            y = np.asarray(sset.evaluate(yT)).T
        log_j += np.sum(self._logdetA)

        y = y.reshape(original_shape)
        log_j = log_j.reshape(original_shape[:-1])
        return y, log_j

    def backward_transform(self, y, use_parallel=False):
        """Latent -> data space; returns (x, log_j) (``sit.py:421-455``)."""
        x = np.array(y, np.float64)
        if x.ndim == 1:
            x = x[np.newaxis, :]
        if x.shape[-1] != self.dim:
            raise ValueError('invalid shape for y.')
        original_shape = x.shape
        x = x.reshape((-1, original_shape[-1]))
        log_j = np.zeros(x.shape[0])

        for i in reversed(range(self.i_iter)):
            sset = self._spline_sets[i]
            x = np.asarray(sset.solve(jnp.asarray(x.T))).T
            der = np.asarray(sset.derivative(jnp.asarray(x.T)))
            log_j += np.sum(np.log(der), axis=0)
            x = x @ self._B[i].T + self._m[i]
        log_j += np.sum(self._logdetA)

        x = x.reshape(original_shape)
        log_j = log_j.reshape(original_shape[:-1])
        return x, log_j

    def sample(self, n, use_parallel=False):
        """Draw ``n`` Sobol-normal latents and push back (``sit.py:366-374``)."""
        n = int(n)
        if n <= 0:
            raise ValueError('n should be a positive int.')
        y = self.mvn_generator(np.zeros(self.dim), np.eye(self.dim), n)
        x, log_j = self.backward_transform(y, use_parallel)
        return x, log_j, y

    def logq(self, x, use_parallel=False):
        """Model log-density: N(0,I) pullback (``sit.py:457-459``)."""
        y, log_j = self.forward_transform(x, use_parallel)
        const = -0.5 * np.log(2 * np.pi)
        return np.sum(const - 0.5 * y ** 2, axis=-1) + log_j

    def triangle_plot(self, *args, **kwargs):
        raise NotImplementedError('plotting requires getdist; not bundled.')
