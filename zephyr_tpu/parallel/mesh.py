'''
Device-mesh helpers for zephyr_tpu.

The reference's parallelism is a multiprocessing pool over frequency /
ky subproblems (zephyr/backend/distributors.py:70-193) plus an unused
ipyparallel stub for multi-node (distributors.py:196-240). The TPU-native
equivalent: a jax.sharding.Mesh whose named axes carry the same
decomposition — 'freq' (independent operators) and 'src' (batched
right-hand sides within one operator) — with GSPMD inserting the
collectives. Multi-host extends the same mesh over DCN via
jax.distributed (the axes are laid out so 'freq' lands across hosts and
'src' rides ICI).
'''

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(freq=None, src=None, devices=None):
    '''
    Build a ('freq', 'src') mesh over the available devices.

    Args:
        freq, src: axis sizes; by default all devices go to 'freq'.
        devices: optional explicit device list.

    Returns:
        jax.sharding.Mesh
    '''

    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if freq is None and src is None:
        freq, src = n, 1
    elif freq is None:
        freq = n // src
    elif src is None:
        src = n // freq
    assert freq * src <= n, 'mesh larger than device count'
    dev_array = np.array(devices[:freq * src]).reshape((freq, src))
    return Mesh(dev_array, axis_names=('freq', 'src'))


def freq_src_sharding(mesh):
    'NamedSharding that splits axis 0 over freq and axis 1 over src.'
    return NamedSharding(mesh, P('freq', 'src'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    '''
    Multi-host (DCN) bring-up: initialize the JAX distributed runtime so
    every host sees the global device set and global meshes span hosts.

    This is the TPU-native realization of the reference's (stub)
    multi-node axis — the never-wired ipyparallel client of
    zephyr/backend/distributors.py:196-240. Call it ONCE per process,
    before any other JAX API, on every host of the pod slice:

        initialize_distributed()                      # TPU pods: all
                                                      # args auto-detected
        initialize_distributed('host0:8476', 4, rank) # CPU/manual

    Arguments default to the standard environment conventions
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) and, on TPU pods, to the values the TPU runtime
    auto-detects when ``ZT_MULTIHOST=1`` is set; single-process calls (one
    process) are a no-op so the same driver script runs unmodified on
    one host.

    Returns True if the distributed runtime was (already) initialized,
    False for the single-process no-op.
    '''

    import os

    coordinator_address = (coordinator_address
                           or os.environ.get('JAX_COORDINATOR_ADDRESS'))
    if num_processes is None:
        env = os.environ.get('JAX_NUM_PROCESSES')
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get('JAX_PROCESS_ID')
        process_id = int(env) if env else None

    if jax.distributed.is_initialized():
        return True     # already initialized

    if coordinator_address is None:
        if os.environ.get('ZT_MULTIHOST'):
            # TPU pod slices: jax auto-detects coordinator/processes
            # from the TPU runtime metadata
            jax.distributed.initialize()
            return True
        if num_processes in (None, 1):
            return False   # single-process: nothing to initialize
        raise ValueError(
            'initialize_distributed: num_processes=%r needs a '
            'coordinator_address (or JAX_COORDINATOR_ADDRESS, or '
            'ZT_MULTIHOST=1 for TPU-pod auto-detection)'
            % (num_processes,))

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def make_multihost_mesh(freq=None, src=None):
    '''
    A ('host', 'freq', 'src') mesh over the GLOBAL device set: the
    leading axis enumerates processes (DCN), the trailing axes subdivide
    each host's local devices (ICI). Lay frequency blocks across hosts —
    frequencies are independent subproblems, so the only DCN traffic is
    the final gradient/misfit psum, exactly the communication pattern
    the reference's per-process frequency pool implies
    (zephyr/backend/distributors.py:127-173 over multiprocessing,
    SURVEY.md section 2.6).

    Requires ``initialize_distributed()`` first on multi-host. On a
    single host this degenerates to a ('host'=1, 'freq', 'src') mesh,
    so sharding specs written against it run unmodified.
    '''

    nproc = jax.process_count()
    local = jax.local_device_count()
    if freq is None and src is None:
        freq, src = local, 1
    elif freq is None:
        freq = local // src
    elif src is None:
        src = local // freq
    assert freq * src <= local, 'per-host mesh larger than local devices'
    devs = np.empty((nproc, freq, src), dtype=object)
    for d in jax.devices():
        pid = d.process_index
        # fill per-process blocks in local-id order
        k = sum(1 for x in devs[pid].ravel() if x is not None)
        if k < freq * src:
            devs[pid].ravel()[k] = d
    assert all(x is not None for x in devs.ravel()), \
        'uneven device distribution across processes'
    return Mesh(devs, axis_names=('host', 'freq', 'src'))
