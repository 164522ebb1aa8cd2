"""Worker for the real 2-process multi-host test (gloo CPU collectives):
validates host-major mesh construction and `global_batch` process-local
assembly across actual jax processes."""

import os
import sys

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nprocs, process_id=proc_id)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hqtransformer_tpu.parallel.mesh import global_batch, make_mesh  # noqa

assert jax.process_count() == nprocs
assert jax.device_count() == 2 * nprocs
mesh = make_mesh(tp=2)  # tp within each host's 2 local devices
rows = {d.process_index for row in mesh.devices for d in row}
for row in mesh.devices.reshape(-1, 2):
    assert len({d.process_index for d in row}) == 1, 'tp row spans hosts'

local = np.arange(proc_id * 4, proc_id * 4 + 4, dtype=np.float32).reshape(2, 2)
with mesh:
    g = global_batch(mesh, local)
    assert g.shape == (2 * nprocs, 2)
    total = jax.jit(lambda x: jnp.sum(x * 2.0))(g)
expected = 2.0 * sum(range(4 * nprocs))
assert float(total) == expected, (float(total), expected)
print(f'MULTIHOST OK {proc_id}')
