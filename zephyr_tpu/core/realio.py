'''
Real-I/O boundary for TPU backends without complex transfer support.

The axon TPU runtime compiles and executes complex64 arithmetic fine, but
host<->device TRANSFER of complex arrays is unimplemented (empirically:
``jnp.ones((8,128), jnp.complex64)`` fails at materialization, while a
jitted function that builds complex values from real inputs via
``lax.complex`` and returns real/imag parts runs correctly).

This module provides the boundary convention used by every zephyr_tpu jit
entry point:

- ``C(re, im)``: a pytree pair standing in for a complex array at the
  host/device boundary.
- ``split_complex`` / ``join_complex``: convert pytrees between complex
  leaves and C pairs (host side: numpy; traced side: jnp/lax).
- ``realio_jit(fn, ...)``: wrap a complex-valued function so that its
  jitted signature carries only real arrays. On CPU the wrapping is exact
  (complex128 <-> two float64 planes); on TPU it is what makes the
  function runnable at all.
'''

from functools import partial
from typing import NamedTuple, Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


class C(NamedTuple):
    'A complex array split into real and imaginary parts (pytree).'
    re: Any
    im: Any


def _is_c(x):
    return isinstance(x, C)


def _is_complex_leaf(x):
    if isinstance(x, (np.ndarray, jnp.ndarray)):
        return jnp.iscomplexobj(x)
    return isinstance(x, (complex, np.complexfloating))


def split_complex(tree):
    'Replace every complex leaf with a C(re, im) pair.'

    def split(x):
        if _is_complex_leaf(x):
            if isinstance(x, (complex, np.complexfloating)):
                return C(np.real(x), np.imag(x))
            return C(jnp.real(x) if isinstance(x, jnp.ndarray)
                     else np.ascontiguousarray(x.real),
                     jnp.imag(x) if isinstance(x, jnp.ndarray)
                     else np.ascontiguousarray(x.imag))
        return x

    return jax.tree_util.tree_map(split, tree)


def join_complex(tree):
    'Recombine every C(re, im) pair into a complex array (traced-safe).'

    def join(x):
        if _is_c(x):
            re = jnp.asarray(x.re)
            im = jnp.asarray(x.im)
            return lax.complex(re, im)
        return x

    return jax.tree_util.tree_map(join, tree, is_leaf=_is_c)


def join_complex_host(tree):
    'Recombine C pairs host-side into numpy complex arrays.'

    def join(x):
        if _is_c(x):
            return np.asarray(x.re) + 1j * np.asarray(x.im)
        return x

    return jax.tree_util.tree_map(join, tree, is_leaf=_is_c)


def realio_jit(fn, host_output=False, **jit_kwargs):
    '''
    jit ``fn`` with a real-only transfer boundary: complex leaves of the
    inputs are split host-side (C pairs pass through untouched),
    recombined on-device; complex leaves of the outputs are split
    on-device. With ``host_output=True`` the outputs are materialized to
    numpy complex; otherwise they stay as device-resident C pairs that
    can be fed back into other realio functions.

    Static configuration must be closed over by ``fn`` (use
    functools.partial), not passed as arguments.
    '''

    @partial(jax.jit, **jit_kwargs)
    def inner(split_args, split_kwargs):
        args = join_complex(split_args)
        kwargs = join_complex(split_kwargs)
        out = fn(*args, **kwargs)
        return jax.tree_util.tree_map(
            lambda x: C(jnp.real(x), jnp.imag(x))
            if jnp.iscomplexobj(x) else x, out)

    def wrapped(*args, **kwargs):
        out = inner(split_complex(args), split_complex(kwargs))
        return join_complex_host(out) if host_output else out

    return wrapped


@jax.jit
def _combine(re, im):
    return lax.complex(re, im)


def to_device_complex(x, sharding=None):
    '''
    Materialize a host complex array as a device-resident complex array
    without a complex host->device transfer: upload re/im separately and
    combine on device.
    '''

    if not _is_complex_leaf(x):
        return jax.device_put(np.asarray(x), sharding)
    re = jax.device_put(np.ascontiguousarray(np.real(x)), sharding)
    im = jax.device_put(np.ascontiguousarray(np.imag(x)), sharding)
    return _combine(re, im)


def device_put_c(x, sharding=None):
    'device_put a (possibly complex) array via the real-pair boundary.'

    if _is_complex_leaf(x):
        re = jax.device_put(np.ascontiguousarray(np.real(x)), sharding)
        im = jax.device_put(np.ascontiguousarray(np.imag(x)), sharding)
        return C(re, im)
    return jax.device_put(np.asarray(x), sharding)
