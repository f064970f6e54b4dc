'''
Real multi-process jax.distributed exercise (SURVEY.md section 2.6): two
OS processes on localhost form a DCN "cluster", build the
('host', 'freq', 'src') multihost mesh, and run a global psum across it.
Rounds 1-2 tested the multi-host helpers only in degenerate single-host
form; this drives the actual distributed code path CI-safely.
'''

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r'''
import sys
import jax
jax.config.update('jax_platforms', 'cpu')

pid = int(sys.argv[1])
port = sys.argv[2]

sys.path.insert(0, %(repo)r)
from zephyr_tpu.parallel.mesh import initialize_distributed, \
    make_multihost_mesh

ok = initialize_distributed('localhost:' + port, 2, pid)
assert ok is True
assert jax.process_count() == 2
assert jax.device_count() == 4          # 2 local x 2 processes
assert jax.local_device_count() == 2

mesh = make_multihost_mesh(freq=2, src=1)
assert mesh.axis_names == ('host', 'freq', 'src')
assert mesh.devices.shape == (2, 2, 1)

from functools import partial
import numpy as np
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

sharding = NamedSharding(mesh, P('host', 'freq', 'src'))
local = np.full((1, 2, 1), float(pid + 1))
glob = jax.make_array_from_process_local_data(sharding, local, (2, 2, 1))

@partial(shard_map, mesh=mesh, in_specs=P('host', 'freq', 'src'),
         out_specs=P())
def total(x):
    return jax.lax.psum(jnp.sum(x), ('host', 'freq', 'src'))[None]

out = jax.device_get(total(glob))
# process 0 contributes 2x1.0, process 1 contributes 2x2.0
assert float(out[0]) == 6.0, out
print('DIST_OK process %%d' %% pid)
'''


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _WORKER % {'repo': repo}
    port = str(_free_port())

    env = dict(os.environ)
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    # a fresh jax runtime per worker: drop any inherited forcing
    env.pop('JAX_NUM_PROCESSES', None)
    env.pop('JAX_PROCESS_ID', None)

    procs = [subprocess.Popen([sys.executable, '-c', code, str(pid), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail('distributed workers timed out')

    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, 'worker %d failed:\n%s\n%s' % (pid, out,
                                                       err[-2000:])
        assert 'DIST_OK process %d' % pid in out
