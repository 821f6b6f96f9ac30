"""ParallelBackend API shim.

The reference's ``ParallelBackend`` (``bayesfast/utils/parallel.py:34-204``)
multiplexes a process pool (multiprocess/ray/dask/sharedmem/loky) behind
``map``/``map_async``/``gather``. In the TPU build that role is played by the
device mesh: chains are a sharded array axis and batched density evaluations
replace pool maps. This module keeps the reference API importable —
``bf.utils.parallel.set_backend(8)`` in existing scripts keeps working — and
``ParallelBackend.map`` provides a genuinely parallel host-side map (thread
pool) for user code that calls it directly with Python functions.
"""

from concurrent.futures import ThreadPoolExecutor

__all__ = ['ParallelBackend', 'get_backend', 'set_backend']


class ParallelBackend:
    """Host-side map/gather facade (kind='mesh' covers the device path)."""

    def __init__(self, backend=None):
        if isinstance(backend, ParallelBackend):
            backend = backend.backend
        self._backend = backend
        self._pool = None

    @property
    def kind(self):
        return 'mesh' if self._backend is None else 'threads'

    @property
    def backend(self):
        return self._backend

    def __enter__(self):
        if isinstance(self._backend, int):
            self._pool = ThreadPoolExecutor(self._backend)
        return self

    def __exit__(self, *exc):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None
        return False

    def map(self, fun, *iters):
        if self._pool is not None:
            return list(self._pool.map(fun, *iters))
        return [fun(*args) for args in zip(*iters)]

    def map_async(self, fun, *iters):
        if self._pool is not None:
            return [self._pool.submit(fun, *args) for args in zip(*iters)]
        return self.map(fun, *iters)

    def gather(self, async_result):
        if self._pool is not None:
            return [f.result() for f in async_result]
        return async_result


_backend = ParallelBackend()


def get_backend():
    return _backend


def set_backend(backend):
    """Accepted for reference compatibility.

    An int (worker count) configures the host thread pool used by
    ``ParallelBackend.map``; device parallelism is configured with
    ``bayesfast_tpu.parallel.set_mesh`` instead.
    """
    global _backend
    _backend = ParallelBackend(backend)
