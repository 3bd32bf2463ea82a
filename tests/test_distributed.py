"""Two-process ``jax.distributed`` execution on CPU (VERDICT r1 item 5).

Launches 2 subprocesses, each with 4 virtual CPU devices, initializes
``jax.distributed`` via ``mile_tpu.parallel.distributed``, builds one
8-device chain mesh spanning both processes, runs a vmapped MCLMC block
with a cross-process reduction, and checks the draws match the
single-process run of the same workload bit-for-bit.

Multi-CHIP hardware is out of scope in this environment; this exercises
the process-spanning mesh construction, global-array creation, collective
insertion, and allgather egress that multi-host TPU execution relies on
(SURVEY §2.4).
"""
import os
import socket
import subprocess
import sys

import numpy as np

from tests._distributed_workload import run_chains
from mile_tpu.parallel import mesh as pm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    workers = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, 'tests',
                                          '_distributed_worker.py'),
             str(rank), '2', str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for rank in range(2)
    ]
    outs = []
    for w in workers:
        out, _ = w.communicate(timeout=600)
        outs.append(out)
    for rank, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f'rank {rank} failed:\n{out}'
        assert f'rank {rank} ok' in out

    dist = np.load(tmp_path / 'distributed.npz')

    # single-process reference on the 8-virtual-device test mesh
    mesh = pm.chain_mesh(8)
    pos, pooled = run_chains(mesh, n_chains=8, dim=16, n_steps=50)

    np.testing.assert_array_equal(dist['positions'], np.asarray(pos))
    np.testing.assert_allclose(float(dist['pooled']), float(pooled),
                               rtol=1e-6)
    assert np.isfinite(dist['positions']).all()
