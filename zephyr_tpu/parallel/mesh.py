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
