"""Host-side concurrent map for external (non-traceable) likelihoods.

Role in the TPU build: everything traceable runs as one batched device
program, so the reference's process-pool chain parallelism
(``bayesfast/utils/parallel.py:34-204``) has no device-side counterpart here.
What remains host-bound is the *external* true-model path — the DES/cosmosis
pattern where each likelihood call shells out to a foreign pipeline for
seconds at a time (``bayesfast/core/recipe.py:1085-1087`` farms those over a
64-process pool). ``ParallelBackend`` fills that role with a thread pool:
threads are the right tool because external models release the GIL (they
sleep on subprocesses, sockets, or BLAS), and they share the in-process JAX
runtime, which a forked worker cannot.

``set_backend(n)`` fixes the worker count; the default backend sizes a
transient pool to the work. ``set_backend(ParallelBackend(serial=True))``
restores a plain serial map for debugging. An existing
``concurrent.futures`` executor can also be passed and will be used as-is
(not shut down on exit).
"""

import os
from concurrent.futures import Executor, ThreadPoolExecutor

__all__ = ['ParallelBackend', 'get_backend', 'set_backend']


def _auto_workers(n_items):
    """Pool size for the default backend: enough threads to overlap every
    pending external call, capped so pathological batch sizes don't spawn
    thousands of threads."""
    cap = max(32, 4 * (os.cpu_count() or 1))
    return max(1, min(n_items, cap))


class ParallelBackend:
    """Concurrent host map with the reference's map/map_async/gather surface.

    Parameters
    ----------
    backend : None, int, Executor or ParallelBackend, optional
        ``None`` (default) uses a transient thread pool sized to each map
        call. An int pins the pool width. An ``Executor`` is used directly.
    serial : bool, optional
        Force a plain in-order Python map (useful under pdb or when the
        external model is not thread-safe).
    """

    def __init__(self, backend=None, serial=False):
        if isinstance(backend, ParallelBackend):
            serial = serial or backend._serial
            backend = backend._spec
        if not (backend is None or isinstance(backend, (int, Executor))):
            raise ValueError('backend should be None, an int worker count, '
                             'an Executor, or another ParallelBackend.')
        if isinstance(backend, int) and backend <= 0:
            raise ValueError('worker count should be positive.')
        self._spec = backend
        self._serial = bool(serial)
        self._entered = None  # pool owned by an active `with` block

    @property
    def kind(self):
        if self._serial:
            return 'serial'
        if isinstance(self._spec, Executor):
            return 'executor'
        return 'threads'

    @property
    def backend(self):
        return self._spec

    def _pool_for(self, n_items):
        """(executor, owns_it) for a map over ``n_items`` elements."""
        if self._serial or n_items <= 1:
            return None, False
        if self._entered is not None:
            return self._entered, False
        if isinstance(self._spec, Executor):
            return self._spec, False
        width = self._spec if isinstance(self._spec, int) else \
            _auto_workers(n_items)
        return ThreadPoolExecutor(width), True

    def __enter__(self):
        # Pre-open a pool so repeated map() calls inside the block reuse it.
        if not self._serial and not isinstance(self._spec, Executor):
            width = self._spec if isinstance(self._spec, int) else \
                _auto_workers(_auto_workers(1 << 30))
            self._entered = ThreadPoolExecutor(width)
        return self

    def __exit__(self, *exc):
        if self._entered is not None:
            self._entered.shutdown()
            self._entered = None
        return False

    def map(self, fun, *iters):
        jobs = list(zip(*iters))
        pool, owns = self._pool_for(len(jobs))
        if pool is None:
            return [fun(*args) for args in jobs]
        try:
            return list(pool.map(lambda args: fun(*args), jobs))
        finally:
            if owns:
                pool.shutdown()

    def map_async(self, fun, *iters):
        jobs = list(zip(*iters))
        pool, owns = self._pool_for(len(jobs))
        if pool is None:
            return [fun(*args) for args in jobs]
        futures = [pool.submit(fun, *args) for args in jobs]
        if owns:
            # transient pool: keep it alive until the futures are gathered
            futures = _OwnedFutures(futures, pool)
        return futures

    def gather(self, async_result):
        if isinstance(async_result, _OwnedFutures):
            try:
                return [f.result() for f in async_result]
            finally:
                async_result.pool.shutdown()
        if async_result and hasattr(async_result[0], 'result'):
            return [f.result() for f in async_result]
        return async_result


class _OwnedFutures(list):
    """Futures plus the transient pool that must outlive them."""

    def __init__(self, futures, pool):
        super().__init__(futures)
        self.pool = pool


_backend = ParallelBackend()


def get_backend():
    return _backend


def set_backend(backend):
    """Replace the global backend (int = fixed thread count, None = auto)."""
    global _backend
    _backend = ParallelBackend(backend)
