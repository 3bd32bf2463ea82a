"""Worker process for the two-process ``jax.distributed`` test.

Usage: python tests/_distributed_worker.py RANK NPROC PORT OUTDIR

Each process owns 4 virtual CPU devices; together they form one 8-device
chain mesh spanning both processes (SURVEY §2.4 multi-host translation).
The worker runs a short vmapped MCLMC block over the process-spanning
mesh plus ONE genuinely cross-process collective (the pooled mean energy
under jit over the chain-sharded axis), then rank 0 writes results.
"""
import os
import sys

rank, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_threefry_partitionable', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mile_tpu.parallel.distributed import initialize_distributed  # noqa: E402

initialize_distributed(f'localhost:{port}', nproc, rank)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc
assert jax.local_device_count() == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tests._distributed_workload import run_chains  # noqa: E402

from mile_tpu.parallel import mesh as pm  # noqa: E402

mesh = pm.chain_mesh()
assert mesh.devices.size == 4 * nproc

positions, pooled = run_chains(mesh, n_chains=8, dim=16, n_steps=50)

from jax.experimental import multihost_utils  # noqa: E402

# gather the chain-sharded result to every host (cross-process allgather)
positions_full = multihost_utils.process_allgather(positions, tiled=True)

# orbax across processes: every process writes ITS OWN shards of the
# chain-sharded array, restore places them back onto the global mesh
from mile_tpu.train.checkpoint_orbax import (  # noqa: E402
    load_ensemble,
    save_ensemble,
)

ckpt_dir = os.path.join(outdir, 'orbax_ens')
save_ensemble(ckpt_dir, {'positions': positions})
restored = load_ensemble(ckpt_dir, template={'positions': positions})
restored_full = multihost_utils.process_allgather(restored['positions'],
                                                  tiled=True)
assert np.array_equal(np.asarray(restored_full),
                      np.asarray(positions_full)), 'orbax roundtrip mismatch'

if rank == 0:
    np.savez(os.path.join(outdir, 'distributed.npz'),
             positions=np.asarray(positions_full),
             pooled=np.asarray(pooled))
multihost_utils.sync_global_devices('done')
print(f'rank {rank} ok', flush=True)
