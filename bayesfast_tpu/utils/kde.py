"""Weighted Gaussian kernel density estimation
(``bayesfast/utils/kde.py``, a scipy fork in the reference).

Compact reimplementation: weighted Scott/Silverman bandwidth with a
``bw_factor`` multiplier, n-d logpdf, and the 1-d ``cdf`` (sum of ndtr terms)
that drives the SIT Gaussianization.
"""

import numpy as np
from scipy.special import ndtr, logsumexp

__all__ = ['kde']


class kde:
    """Gaussian KDE with optional weights.

    Parameters
    ----------
    dataset : (n,) or (n, d) array
        Data points (rows are points).
    bw_method : 'scott' | 'silverman' | float
        Bandwidth rule.
    bw_factor : float
        Extra multiplicative factor on the bandwidth.
    weights : (n,) array or None
        Point weights (normalized internally).
    """

    def __init__(self, dataset, bw_method='scott', bw_factor=1.,
                 weights=None):
        dataset = np.asarray(dataset, np.float64)
        if dataset.ndim == 1:
            dataset = dataset[:, None]
        if dataset.ndim != 2 or dataset.shape[0] < 2:
            raise ValueError('dataset should have at least 2 points.')
        self.dataset = dataset
        self.n, self.d = dataset.shape
        if weights is None:
            self._weights = np.full(self.n, 1.0 / self.n)
        else:
            weights = np.asarray(weights, np.float64)
            if weights.shape != (self.n,):
                raise ValueError('invalid shape for weights.')
            self._weights = weights / np.sum(weights)
        self._neff = 1.0 / np.sum(self._weights ** 2)
        self._bw_factor = float(bw_factor)
        self.set_bandwidth(bw_method)

    @property
    def weights(self):
        return self._weights

    @property
    def neff(self):
        return self._neff

    def scotts_factor(self):
        return self._neff ** (-1.0 / (self.d + 4))

    def silverman_factor(self):
        return (self._neff * (self.d + 2) / 4.0) ** (-1.0 / (self.d + 4))

    def set_bandwidth(self, bw_method):
        if bw_method == 'scott':
            factor = self.scotts_factor()
        elif bw_method == 'silverman':
            factor = self.silverman_factor()
        elif np.isscalar(bw_method):
            factor = float(bw_method)
        else:
            raise ValueError('invalid bw_method.')
        factor *= self._bw_factor
        mean = self._weights @ self.dataset
        diff = self.dataset - mean
        cov = (diff * self._weights[:, None]).T @ diff / (
            1.0 - np.sum(self._weights ** 2))
        self.covariance = np.atleast_2d(cov) * factor ** 2
        self.inv_cov = np.linalg.inv(self.covariance)
        self._norm_factor = np.sqrt(
            np.linalg.det(2 * np.pi * self.covariance))

    def _diff(self, x):
        x = np.asarray(x, np.float64)
        if self.d == 1 and x.ndim <= 1:
            x = np.atleast_1d(x)[:, None]
        elif x.ndim == 1:
            x = x[None, :]
        return x[:, None, :] - self.dataset[None, :, :]

    def logpdf(self, x):
        diff = self._diff(x)
        energy = np.einsum('lmi,ij,lmj->lm', diff, self.inv_cov / 2, diff)
        return logsumexp(-energy, b=self._weights / self._norm_factor,
                         axis=1)

    def pdf(self, x):
        return np.exp(self.logpdf(x))

    __call__ = pdf

    def cdf(self, x):
        """1-d cdf (``kde.py:322-354``): weighted sum of normal cdfs.

        Uses the OpenMP native kernel when available (this O(n_data * n_x)
        sum is the inner loop of every SIT Gaussianization fit).
        """
        if self.d != 1:
            raise NotImplementedError('currently only supports cdf for 1-d '
                                      'kde')
        x = np.atleast_1d(np.asarray(x, np.float64))
        h = np.sqrt(self.covariance[0, 0])

        from ..config import kde_on_device
        if kde_on_device() and x.size * self.n >= 100_000:
            return self._cdf_device(x, h)

        from ..native import bindings as _native
        # sort once per kde; each Gaussianization spline fit evaluates the
        # cdf several times, and the windowed kernel only touches the +-8h
        # neighborhood of each query in the sorted data
        if getattr(self, '_cdf_cache', None) is None:
            order = np.argsort(self.dataset[:, 0], kind='stable')
            sdata = np.ascontiguousarray(self.dataset[order, 0])
            sw = np.ascontiguousarray(self._weights[order])
            prefix = np.concatenate(([0.0], np.cumsum(sw)))
            self._cdf_cache = (sdata, sw, prefix)
        sdata, sw, prefix = self._cdf_cache
        return _native.kde_cdf_sorted(sdata, sw, prefix, h, x)

    def resample(self, size=None, random_generator=None):
        """Draw samples from the estimated density (reference
        ``kde.py:356-381``): pick a data point by weight, add kernel noise.

        Parameters
        ----------
        size : int, optional
            Number of draws; defaults to the effective sample size.
        random_generator : np.random.Generator, optional
            Defaults to the framework's global generator registry.

        Returns
        -------
        (size, d) ndarray of draws.
        """
        if size is None:
            size = int(self.neff)
        if random_generator is None:
            # derive a host generator from the framework's global jax key
            from .random import next_key
            import jax
            seed = int(jax.random.randint(next_key(), (), 0, 2 ** 31 - 1))
            random_generator = np.random.default_rng(seed)
        indices = random_generator.choice(self.n, size=size, p=self._weights)
        noise = random_generator.multivariate_normal(
            np.zeros(self.d), self.covariance, size=size)
        return self.dataset[indices] + noise

    # bucket query counts so the jitted device kernel compiles O(1) times
    _CDF_BUCKET = 128

    def _cdf_device(self, x, h):
        """float32 device evaluation of the weighted cdf sum.

        The tree-structured XLA reduction keeps the absolute error at
        ~1e-6 — well under the KDE approximation error itself — while a
        few-core TPU-host VM would spend seconds per flow layer in the
        host kernel. Queries are padded to a fixed bucket so repeated fit
        calls reuse one compiled kernel per data size.
        """
        import jax.numpy as jnp
        from ..ops.kde_pallas import kde_cdf_device
        if getattr(self, '_dev_cache', None) is None:
            self._dev_cache = (
                jnp.asarray(self.dataset[:, 0], jnp.float32),
                jnp.asarray(self._weights, jnp.float32))
        data, w = self._dev_cache
        pad = (-x.size) % self._CDF_BUCKET
        xp = np.concatenate([x, np.full(pad, x[-1])]) if pad else x
        out = np.asarray(kde_cdf_device(
            jnp.asarray(xp, jnp.float32), data, w, np.float32(h)))
        return out[:x.size].astype(np.float64)
