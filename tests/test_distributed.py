"""Multi-process (DCN) validation: 2 jax.distributed processes x 4 CPU
devices vs one process x 8 devices, same (2, 4) host-chip mesh.

This closes the last structural unknown that CAN be closed without real
multi-host hardware (VERDICT r3 item 3): the distributed runtime, the
global mesh spanning a process boundary, the cross-DCN psum of the pooled
metric, and the allgather that brings sharded results back to every host.
The single-process run must be reproduced (bitwise for the collective-free
path).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), '_distributed_worker.py')


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)       # workers set their own device count
    env.pop('JAX_PLATFORMS', None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    return env


@pytest.mark.slow
def test_two_process_mesh_matches_single(tmp_path):
    env = _clean_env()
    out_s = os.path.join(tmp_path, 'single.npz')
    single = subprocess.run(
        [sys.executable, _WORKER, 'single', out_s],
        env=env, capture_output=True, text=True, timeout=600)
    assert single.returncode == 0, single.stderr[-3000:]
    assert 'WORKER_OK' in single.stdout

    port = _free_port()
    out_d = os.path.join(tmp_path, 'dist.npz')
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, 'dist', out_d, str(pid), '2', str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-3000:]
        assert 'WORKER_OK' in so

    a = np.load(out_s)
    b = np.load(out_d)
    # per-chain adaptation path: no collectives -> bitwise equality
    assert np.array_equal(a['s'], b['s']), (
        'distributed sampler diverged from the single-process run')
    assert np.array_equal(a['logp'], b['logp'])
    # pooled metric crosses DCN (psum over the host axis); reduction
    # association may differ across partitionings, so allow float slop
    assert np.allclose(a['s_pooled'], b['s_pooled'], atol=1e-8), (
        np.max(np.abs(a['s_pooled'] - b['s_pooled'])))
