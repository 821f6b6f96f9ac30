"""32-d rotated Banana + GBS evidence.

Port of the reference's ``examples/banana-gbs.ipynb`` (fiducial
logz = -127.364; published run: -127.276 +- 0.053). The density is written
in JAX — the analytic gradient of the reference collapses into autodiff.

Runs in float64 (works on TPU too, ~12x slower than f32): the sobol
N(0, I) starting points land at |logp| ~ 3e6 in this bounded, Q=0.01
density, where float32 energy differences round to +-0.5 — that noise
biases the dual-averaging acceptance statistics and the warmup never
escapes the tail. In float64 the warmup matches the reference exactly.
(Verified against a pure-numpy recursive oracle of the reference sampler.)

Environment knobs: N_CHAIN (default 64), N_ITER (2500), N_WARMUP (1000).
"""

import os

import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
from scipy.stats import special_ortho_group

import bayesfast_tpu as bf


def main():
    D, Q = 32, 0.01
    lower = np.full(D, -15.)
    upper = np.full(D, 15.)
    bound = np.stack((lower, upper)).T
    const = float(np.sum(np.log(upper - lower)))
    A = jnp.asarray(special_ortho_group.rvs(D, random_state=0))

    def logp(x):
        x = x @ A.T
        return (-jnp.sum((x[::2] ** 2 - x[1::2]) ** 2 / Q
                         + (x[::2] - 1) ** 2) - const)

    bf.utils.set_generator(32)
    den = bf.DensityLite(logp=logp, input_size=D, input_scales=bound,
                         hard_bounds=True)
    sample_trace = {
        'n_chain': int(os.environ.get('N_CHAIN', 64)),
        'n_iter': int(os.environ.get('N_ITER', 2500)),
        'n_warmup': int(os.environ.get('N_WARMUP', 1000)),
    }
    rec = bf.Recipe(density=den, sample={'sample_trace': sample_trace},
                    post={'evidence_method': 'GBS'})
    rec.run()
    res = rec.get()
    print(f'logz = {res.logz:.4f} +- {res.logz_err:.4f} '
          '(fiducial: -127.364)')
    return res


if __name__ == '__main__':
    main()
