'''
Fused Pallas TPU kernels for the multigrid transfer operators.

The XLA lowerings of full-weighting restriction and bilinear
prolongation cost ~33 ms per pair at 2048^2 x 16 on v5e (multiple
full-resolution passes and layout changes). These kernels express both
transfers as small banded matmuls per tile, which is the TPU-native
formulation: for an output tile O and its input window W,

    restrict:  O = Rz @ W @ Rx^T      (Rz, Rx encode 0.5*[.5 1 .5] tent
                                       weights at stride 2)
    prolong:   O = Pz @ W @ Px^T      (Pz, Px encode the interleaved
                                       tent rows)

so the stride-2 decimation / interleaving runs on the MXU instead of as
lane-strided vector ops (which defeat the (8, 128) tiling — measured
2.6x slower than even the multi-pass XLA form). Complex fields travel as
separate re/im f32 planes; the halo windows reuse the double-buffered
DMA pipeline of the stencil kernels.

Preconditioner-internal only: no AD rules (the V-cycle and the spectral
wrap are under stop_gradient in the solver).
'''

from functools import partial, lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stencil import _double_buffered_halo_fetch

#: tent weights per axis offset (-1, 0, 1)
_W = (0.5, 1.0, 0.5)


@lru_cache(maxsize=None)
def _restrict_mats(TZc, TXc):
    'Rz (TZc, 2TZc+8) and RxT (2TXc+128, TXc): window -> coarse tile.'

    Rz = np.zeros((TZc, 2 * TZc + 8), np.float32)
    for I in range(TZc):
        for a in (-1, 0, 1):
            Rz[I, 2 * I + a + 1] = 0.5 * _W[a + 1]
    RxT = np.zeros((2 * TXc + 128, TXc), np.float32)
    for J in range(TXc):
        for b in (-1, 0, 1):
            RxT[2 * J + b + 1, J] = 0.5 * _W[b + 1]
    return Rz, RxT


@lru_cache(maxsize=None)
def _prolong_mats(TZf, TXf):
    'Pz (TZf, TZf//2+8) and PxT (TXf//2+128, TXf): coarse window -> fine.'

    Hz, Hx = TZf // 2, TXf // 2
    Pz = np.zeros((TZf, Hz + 8), np.float32)
    for f in range(TZf):
        for Ip in range((f - 1) // 2, f // 2 + 2):
            a = f - 2 * Ip
            if -1 <= a <= 1 and 0 <= Ip + 1 < Hz + 8:
                Pz[f, Ip + 1] = _W[a + 1]
    PxT = np.zeros((Hx + 128, TXf), np.float32)
    for g in range(TXf):
        for Jp in range((g - 1) // 2, g // 2 + 2):
            b = g - 2 * Jp
            if -1 <= b <= 1 and 0 <= Jp + 1 < Hx + 128:
                PxT[Jp + 1, g] = _W[b + 1]
    return Pz, PxT


def _transfer_kernel(mz_ref, mxT_ref, ur_hbm, ui_hbm, or_ref, oi_ref,
                     ur_tile, ui_tile, sem, *, WZ, WX):
    '''
    Grid (nOz, nOx, R): output tile O = Mz @ W @ MxT where W is the
    (WZ+8, WX+128) input window DMA'd from the padded HBM array. The
    window step per grid position is (WZ, WX).
    '''

    urt, uit = _double_buffered_halo_fetch(ur_hbm, ui_hbm, ur_tile,
                                           ui_tile, sem, WZ, WX)
    mz = mz_ref[...]
    mxT = mxT_ref[...]
    for win, out in ((urt, or_ref), (uit, oi_ref)):
        t = jax.lax.dot(win[...], mxT,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
        out[0] = jax.lax.dot(mz, t, preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)


def _transfer_call(v, mz, mxT, out_zx, WZ, WX, interpret):
    '''
    Shared pallas_call scaffolding: v is the PRE-PADDED (R, *, *) real
    pair source; output is (R,) + out_zx. Window step (WZ, WX), window
    shape (WZ+8, WX+128), out tile (mz.shape[0], mxT.shape[1]).
    '''

    R = v.shape[0]
    TOz, TOx = mz.shape[0], mxT.shape[1]
    nOz, nOx = out_zx
    grid = (nOz // TOz, nOx // TOx, R)

    ur = jnp.real(v).astype(jnp.float32)
    ui = jnp.imag(v).astype(jnp.float32)

    kernel = partial(_transfer_kernel, WZ=WZ, WX=WX)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(mz.shape, lambda i, j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mxT.shape, lambda i, j, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TOz, TOx), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TOz, TOx), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, nOz, nOx), jnp.float32),
            jax.ShapeDtypeStruct((R, nOz, nOx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, WZ + 8, WX + 128), jnp.float32),
            pltpu.VMEM((2, WZ + 8, WX + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(jnp.asarray(mz), jnp.asarray(mxT), ur, ui)
    return lax.complex(out_r, out_i)


def _tile(n, cap):
    'Largest divisor tile <= cap that is a multiple of the alignment.'
    t = min(cap, n)
    while t > 0 and n % t != 0:
        t -= 8 if cap <= 128 else 128
    return t


def _restrict_tiles(nzc, nxc):
    TZc = _tile(nzc, 64)
    TXc = _tile(nxc, 256)
    return TZc, TXc


def _prolong_tiles(nz, nx):
    TZf = _tile(nz, 128)
    TXf = _tile(nx, 512)
    return TZf, TXf


def restrict_pallas_applicable(v):
    'Batched (R, nz, nx) complex64 with even, tile-aligned dims.'

    if v.ndim != 3 or v.dtype != jnp.complex64:
        return False
    nz, nx = v.shape[-2:]
    if nz % 2 or nx % 2:
        return False
    nzc, nxc = nz // 2, nx // 2
    TZc, TXc = _restrict_tiles(nzc, nxc)
    return (TZc >= 8 and TXc >= 128 and TZc % 8 == 0 and TXc % 128 == 0
            and nzc % TZc == 0 and nxc % TXc == 0)


def prolong_pallas_applicable(vc, nz, nx):
    if vc.ndim != 3 or vc.dtype != jnp.complex64:
        return False
    nzc, nxc = vc.shape[-2:]
    if nz != 2 * nzc or nx != 2 * nxc:
        return False
    TZf, TXf = _prolong_tiles(nz, nx)
    return (TZf >= 16 and TXf >= 256 and TZf % 16 == 0 and TXf % 256 == 0
            and nz % TZf == 0 and nx % TXf == 0)


@partial(jax.jit, static_argnames=('interpret',))
def restrict_pallas_batched(v, interpret=False):
    '''
    Full-weighting restriction of (R, nz, nx) complex64 (even dims) to
    (R, nz//2, nx//2): out[I, J] = 0.25 sum w(a) w(b) v[2I+a, 2J+b].
    '''

    R, nz, nx = v.shape
    nzc, nxc = nz // 2, nx // 2
    TZc, TXc = _restrict_tiles(nzc, nxc)
    vp = jnp.pad(v, ((0, 0), (1, 7), (1, 127)))
    mz, mxT = _restrict_mats(TZc, TXc)
    return _transfer_call(vp, mz, mxT, (nzc, nxc), 2 * TZc, 2 * TXc,
                          interpret)


@partial(jax.jit, static_argnames=('nz', 'nx', 'interpret'))
def prolong_pallas_batched(vc, nz, nx, interpret=False):
    '''
    Bilinear prolongation of (R, nzc, nxc) complex64 to (R, nz, nx) with
    nz = 2 nzc, nx = 2 nxc: out[2I+a, 2J+b] += w(a) w(b) vc[I, J].
    '''

    R, nzc, nxc = vc.shape
    TZf, TXf = _prolong_tiles(nz, nx)
    vp = jnp.pad(vc, ((0, 0), (1, 7), (1, 127)))
    mz, mxT = _prolong_mats(TZf, TXf)
    return _transfer_call(vp, mz, mxT, (nz, nx), TZf // 2, TXf // 2,
                          interpret)
