'''
Test configuration for zephyr_tpu.

Tests run on CPU with float64/complex128 enabled (matching the reference's
complex128 numerics) and an 8-device virtual platform so that sharding
tests exercise a multi-device mesh without TPU hardware, per the
reference-survey test strategy (SURVEY.md section 4.3).
'''

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# bound the compat distributor's eager multi-device dispatch: every
# device it touches compiles its own executables, and this box has one
# CPU core — two devices prove the path without blowing up compile time
os.environ.setdefault('ZEPHYR_TPU_MAX_WORKERS', '2')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
