"""Checkpoint/resume: a saved + reloaded trace continues bit-for-bit
identically to an uninterrupted run (RNG and adaptation state ride in the
carry)."""

import os

import numpy as np
import jax.numpy as jnp

import bayesfast_tpu as bf


def _density():
    return bf.DensityLite(logp=lambda x: -0.5 * jnp.sum(x ** 2),
                          input_size=3)


def test_trace_resume_bitwise(tmp_path):
    den = _density()

    bf.utils.set_generator(42)
    tt_a = bf.sample(den, {'n_chain': 4, 'n_iter': 600, 'n_warmup': 200},
                     verbose=False)

    bf.utils.set_generator(42)
    tt_b = bf.sample(den, {'n_chain': 4, 'n_iter': 600, 'n_warmup': 200},
                     n_run=300, verbose=False)
    path = os.path.join(tmp_path, 'trace.pkl')
    tt_b.save(path)
    tt_c = bf.TraceTuple.load(path)
    tt_c = bf.sample(den, tt_c, verbose=False)

    assert tt_c.i_iter == 600
    assert np.array_equal(tt_a.samples, tt_c.samples)
    assert np.array_equal(tt_a.logp, tt_c.logp)
