'''
Fused parallel-cyclic-reduction sweep kernel.

The stratified interior solve's RHS sweep (solver/stratified.py
``pcr_apply``) runs ~log2(nz) sequential levels of
    b <- b + alpha_s * shift(b, -s) + gamma_s * shift(b, +s),
and on the jnp path every level is a separate XLA pass: the field is
read and written from HBM at each level, so one apply moves
~nsteps x (2 field + 1 bf16-factor) half-grid planes — measured the
single largest HBM stream of the production hybrid preconditioner
(~12F of the ~44F total per outer iteration per RHS at 2048^2, F = one
fine-grid complex64 field).

This kernel keeps the field resident in VMEM across ALL levels: grid
(nx/TX, R); each program owns one full-z (nz, TX) column block of one
RHS, level factor windows stream double-buffered from HBM, and the
level update is computed band-wise from static-offset ref slices of a
ping-pong VMEM work buffer (see ``_pcr_kernel``). HBM traffic per
apply per RHS drops to field-in + field-out + bf16 factors.

Reference context: the reference has no preconditioner at all (sparse
direct LU, zephyr/backend/discretization.py:79-85); this kernel is
TPU-native machinery for the CSLP-hybrid replacement.
'''

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# levels with shift below this use a whole-block sublane rotate +
# boundary mask instead of banded static slices (which are sublane-
# unaligned for s < 8 in f32 and force Mosaic relayouts); override for
# experiments via ZT_PCR_ROLL_MAX
import os as _os
_ROLL_MAX_S = int(_os.environ.get('ZT_PCR_ROLL_MAX', 8))




def _pcr_kernel(a_hbm, g_hbm, dr_ref, di_ref, br_ref, bi_ref,
                xr_ref, xi_ref, a_tile, g_tile, wr, wi, sem,
                *, NSTEPS, NZ, TX):
    '''
    One (full-z, TX) column block of one RHS, all reduction levels.
    a_hbm/g_hbm are the full (nsteps, 2, nz, nx) bf16 factor stacks in
    HBM; each level's (2, nz, TX) window streams into a two-slot
    scratch behind the previous level's compute.

    The level update b' = b + a * b[z-s] + g * b[z+s] is computed
    BAND-WISE with static-offset ref slices out of a two-slot ping-pong
    work buffer — rows [0, s) take only the +s term, rows [nz-s, nz)
    only the -s term, the middle both — so the shifted operands are
    plain VMEM loads at static offsets. (The earlier value-level
    formulation built each shift as a concatenate: Mosaic materializes
    those through registers and does NOT reuse the unrolled levels'
    stack temporaries — 24 MB scoped-VMEM stack at nz = 1024 AND
    compute-bound at ~2.5x the pure-traffic time.)
    '''

    jx = pl.program_id(0)

    def _copies(lvl, slot):
        a = pltpu.make_async_copy(
            a_hbm.at[lvl, :, :, pl.ds(jx * TX, TX)],
            a_tile.at[slot], sem.at[slot, 0])
        g = pltpu.make_async_copy(
            g_hbm.at[lvl, :, :, pl.ds(jx * TX, TX)],
            g_tile.at[slot], sem.at[slot, 1])
        return a, g

    for cp in _copies(0, 0):
        cp.start()

    wr[0] = br_ref[0]
    wi[0] = bi_ref[0]
    for lvl in range(NSTEPS):
        s = 1 << lvl
        slot = lvl % 2
        src, dst = slot, 1 - slot
        if lvl + 1 < NSTEPS:
            for cp in _copies(lvl + 1, 1 - slot):
                cp.start()
        for cp in _copies(lvl, slot):
            cp.wait()

        def roll_level():
            '''
            Whole-block level update via sublane rotates: for s below
            the f32 sublane granularity (8 rows) the banded static
            slices are sublane-UNALIGNED and Mosaic lowers each one to
            a full relayout — measured to make the kernel compute-
            bound (~200 us per (1024, 128) column program vs ~14 us of
            traffic). A rotate + boundary mask is one cheap sublane
            permute per operand instead.
            '''
            zidx = lax.broadcasted_iota(jnp.int32, (NZ, TX), 0)
            src_r, src_i = wr[src], wi[src]
            ar = a_tile[slot, 0].astype(jnp.float32)
            ai = a_tile[slot, 1].astype(jnp.float32)
            gr = g_tile[slot, 0].astype(jnp.float32)
            gi = g_tile[slot, 1].astype(jnp.float32)
            # b[z-s] = roll(b, +s) valid for z >= s;
            # b[z+s] = roll(b, -s) valid for z < NZ - s
            mr = pltpu.roll(src_r, s, 0)
            mi = pltpu.roll(src_i, s, 0)
            pr = pltpu.roll(src_r, NZ - s, 0)
            pi = pltpu.roll(src_i, NZ - s, 0)
            mok = (zidx >= s).astype(jnp.float32)
            pok = (zidx < NZ - s).astype(jnp.float32)
            wr[dst] = (src_r + mok * (ar * mr - ai * mi)
                       + pok * (gr * pr - gi * pi))
            wi[dst] = (src_i + mok * (ar * mi + ai * mr)
                       + pok * (gr * pi + gi * pr))

        def band(z0, z1, with_m, with_p):
            'dst[z0:z1] = src[z0:z1] + a*src[z0-s:...] + g*src[z0+s:...]'
            out_r = wr[src, z0:z1]
            out_i = wi[src, z0:z1]
            if with_m:
                ar = a_tile[slot, 0, z0:z1].astype(jnp.float32)
                ai = a_tile[slot, 1, z0:z1].astype(jnp.float32)
                mr = wr[src, z0 - s:z1 - s]
                mi = wi[src, z0 - s:z1 - s]
                out_r = out_r + (ar * mr - ai * mi)
                out_i = out_i + (ar * mi + ai * mr)
            if with_p:
                gr = g_tile[slot, 0, z0:z1].astype(jnp.float32)
                gi = g_tile[slot, 1, z0:z1].astype(jnp.float32)
                pr = wr[src, z0 + s:z1 + s]
                pi = wi[src, z0 + s:z1 + s]
                out_r = out_r + (gr * pr - gi * pi)
                out_i = out_i + (gr * pi + gi * pr)
            wr[dst, z0:z1] = out_r
            wi[dst, z0:z1] = out_i

        # banding by operand validity: b[z+s] exists for z < NZ - s,
        # b[z-s] for z >= s (both windows are static ref slices)
        if s >= NZ:
            band(0, NZ, False, False)
        elif s < _ROLL_MAX_S:
            roll_level()
        else:
            lo, hi = min(s, NZ - s), max(s, NZ - s)
            if lo > 0:
                band(0, lo, False, True)
            if lo < hi:
                band(lo, hi, s <= NZ - s, s <= NZ - s)
            band(hi, NZ, True, False)

    last = NSTEPS % 2
    dr = dr_ref[0].astype(jnp.float32)
    di = di_ref[0].astype(jnp.float32)
    br = wr[last]
    bi = wi[last]
    xr_ref[0] = br * dr - bi * di
    xi_ref[0] = br * di + bi * dr


@partial(jax.jit, static_argnames=('interpret',))
def pcr_sweep_pallas(alphas, gammas, dinv, b, interpret=False):
    '''
    Fused RHS cyclic-reduction sweep: alphas/gammas (nsteps, 2, nz, nx)
    bfloat16 re/im pairs, dinv (2, nz, nx) bfloat16, b (R, nz, nx)
    complex64. Returns x = dinv * reduce(b), (R, nz, nx) complex64.
    Bit-for-bit the same arithmetic as ``stratified.pcr_apply`` on the
    bf16-packed path (factors upcast to f32 per level, f32 accumulate):
    ONE pallas_call runs all levels with the field resident in a
    ping-pong VMEM work buffer.
    '''

    R, nz, nx = b.shape
    nsteps = alphas.shape[0]
    TX = _pick_tx_pcr(nx)
    assert nx % TX == 0 and TX % 128 == 0

    br = jnp.real(b).astype(jnp.float32)
    bi = jnp.imag(b).astype(jnp.float32)

    grid = (nx // TX, R)
    kernel = partial(_pcr_kernel, NSTEPS=nsteps, NZ=nz, TX=TX)

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # alphas (HBM)
            pl.BlockSpec(memory_space=pl.ANY),    # gammas (HBM)
            pl.BlockSpec((1, nz, TX), lambda j, r: (0, 0, j),
                         memory_space=pltpu.VMEM),   # dinv re
            pl.BlockSpec((1, nz, TX), lambda j, r: (0, 0, j),
                         memory_space=pltpu.VMEM),   # dinv im
            pl.BlockSpec((1, nz, TX), lambda j, r: (r, 0, j),
                         memory_space=pltpu.VMEM),   # b re
            pl.BlockSpec((1, nz, TX), lambda j, r: (r, 0, j),
                         memory_space=pltpu.VMEM),   # b im
        ],
        out_specs=[
            pl.BlockSpec((1, nz, TX), lambda j, r: (r, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, TX), lambda j, r: (r, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, nz, TX), jnp.bfloat16),
            pltpu.VMEM((2, 2, nz, TX), jnp.bfloat16),
            pltpu.VMEM((2, nz, TX), jnp.float32),
            pltpu.VMEM((2, nz, TX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(alphas, gammas, dinv[None, 0], dinv[None, 1], br, bi)

    return lax.complex(out_r, out_i)


def _pick_tx_pcr(nx):
    '''
    Tile width for the sweep kernel: 128 (one lane) always — Mosaic
    does not reuse stack across the unrolled levels' temporaries, so
    wider tiles scale the scoped-VMEM stack linearly and OOM it.
    '''

    return 128 if nx % 128 == 0 else nx


def pcr_pallas_applicable(alphas, dinv, b):
    '''
    Whether the fused sweep kernel supports these shapes/dtypes, with
    the VMEM budget check: two-slot factor scratch (2 x (2, 2, nz, TX)
    bf16), the pipelined field/output blocks, and the kernel's value
    temporaries (field + 4 shifted copies per level in f32) must fit
    the 16 MB scoped limit.
    '''

    if b.ndim != 3 or alphas.dtype != jnp.bfloat16:
        return False
    R, nz, nx = b.shape
    TX = _pick_tx_pcr(nx)
    if nx % TX or TX % 128 or nz < 8 or nz % 8:
        return False
    col_mb = nz * TX * 4 / 1e6             # one (nz, TX) f32 plane
    factors_mb = 2 * 2 * 2 * col_mb / 2    # bf16 two-slot a + g
    blocks_mb = 5 * 2 * col_mb             # in/out re+im f32 + bf16
                                           # dinv, double-buffered
    temps_mb = 10 * col_mb                 # br/bi + shifts + products
    return (factors_mb + blocks_mb + temps_mb < 14.0
            and b.dtype == jnp.complex64)
