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


def _pcr_kernel_rb(a_hbm, g_hbm, d_hbm, br_hbm, bi_hbm,
                   xr_hbm, xi_hbm, a_all, g_all, d_tile,
                   wr, wi, sem, osem,
                   *, NSTEPS, NZ, TX, R):
    '''
    Whole-batch column program: ONE grid step per (nz, TX) column block
    runs ALL RHS through ALL reduction levels. Every level's factor
    window is DMA'd ONCE per program into a VMEM-resident
    (nsteps, 2, nz, TX) stack — the two-slot streaming variant
    re-fetched the same windows for every RHS (nsteps x 1 MB x R of
    redundant HBM traffic per column) and its grid of nx/TX x R short
    programs paid per-program dispatch/DMA-issue latency that dominated
    the wall clock (measured ~200 us/program vs ~14 us of traffic).

    VMEM layout (~14 MB at nz=1024, TX=128 — the 16 MB/core budget
    leaves no room for staging buffers): the RHS streams through the
    work ping-pong itself. The field loads into slot 0, levels bounce
    0 -> 1 -> 0 ..., the final dinv product is written to the slot the
    last level did NOT land in, and the output DMA from that slot
    overlaps the next RHS's first levels (its first write to that slot
    comes one level later, after an explicit wait).
    '''

    jx = pl.program_id(0)

    cpa = pltpu.make_async_copy(
        a_hbm.at[:, :, :, pl.ds(jx * TX, TX)], a_all, sem.at[0])
    cpg = pltpu.make_async_copy(
        g_hbm.at[:, :, :, pl.ds(jx * TX, TX)], g_all, sem.at[1])
    cpd = pltpu.make_async_copy(
        d_hbm.at[:, :, pl.ds(jx * TX, TX)], d_tile, sem.at[2])

    def _bin_copy(rr):
        cr = pltpu.make_async_copy(
            br_hbm.at[rr, :, pl.ds(jx * TX, TX)], wr.at[0], sem.at[3])
        ci = pltpu.make_async_copy(
            bi_hbm.at[rr, :, pl.ds(jx * TX, TX)], wi.at[0], sem.at[4])
        return cr, ci

    # the final reduced field lands in slot NSTEPS % 2; the dinv
    # product goes to the OTHER slot so its output DMA can overlap the
    # next RHS's first level (which touches out_slot only at lvl <= 1,
    # where the wait guard sits; requires NSTEPS >= 2 — see
    # pcr_rb_applicable)
    out_slot = 1 - NSTEPS % 2

    def _out_copy(rr):
        cr = pltpu.make_async_copy(
            wr.at[out_slot], xr_hbm.at[rr, :, pl.ds(jx * TX, TX)],
            osem.at[0])
        ci = pltpu.make_async_copy(
            wi.at[out_slot], xi_hbm.at[rr, :, pl.ds(jx * TX, TX)],
            osem.at[1])
        return cr, ci

    cpa.start()
    cpg.start()
    cpd.start()
    for cp in _bin_copy(0):
        cp.start()
    cpa.wait()
    cpg.wait()
    cpd.wait()

    zidx = lax.broadcasted_iota(jnp.int32, (NZ, TX), 0)
    last = NSTEPS % 2
    # first level that writes out_slot (the out-DMA wait point)
    first_out_write = 0 if out_slot == 1 else 1

    def body(r, carry):
        # r is traced (fori_loop keeps ONE copy of the unrolled level
        # chain on the Mosaic stack instead of R)
        for cp in _bin_copy(r):
            cp.wait()

        for lvl in range(NSTEPS):
            s = 1 << lvl
            src, dst = lvl % 2, 1 - lvl % 2
            if dst == out_slot and lvl == first_out_write:
                # about to overwrite the slot whose output DMA (r-1)
                # may still be in flight
                @pl.when(r > 0)
                def _():
                    for cp in _out_copy(r - 1):
                        cp.wait()
            src_r, src_i = wr[src], wi[src]
            if s >= NZ:
                wr[dst] = src_r
                wi[dst] = src_i
                continue
            ar = a_all[lvl, 0].astype(jnp.float32)
            ai = a_all[lvl, 1].astype(jnp.float32)
            gr = g_all[lvl, 0].astype(jnp.float32)
            gi = g_all[lvl, 1].astype(jnp.float32)
            # whole-block sublane rotates + boundary masks at every
            # level (see roll_level in _pcr_kernel)
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

        dr = d_tile[0].astype(jnp.float32)
        di = d_tile[1].astype(jnp.float32)
        br_f = wr[last]
        bi_f = wi[last]
        wr[out_slot] = br_f * dr - bi_f * di
        wi[out_slot] = br_f * di + bi_f * dr
        for cp in _out_copy(r):
            cp.start()

        @pl.when(r + 1 < R)
        def _():
            # next field loads into slot 0 over the consumed iterate
            for cp in _bin_copy(r + 1):
                cp.start()
        return carry

    lax.fori_loop(0, R, body, 0)
    for cp in _out_copy(R - 1):
        cp.wait()


@partial(jax.jit, static_argnames=('interpret',))
def pcr_sweep_pallas_rb(alphas, gammas, dinv, b, interpret=False):
    '''
    Whole-batch fused RHS cyclic-reduction sweep (see _pcr_kernel_rb):
    same inputs/outputs and the same roll-path arithmetic as
    ``pcr_sweep_pallas``, with grid (nx/TX,) instead of (nx/TX, R).
    '''

    R, nz, nx = b.shape
    nsteps = alphas.shape[0]
    TX = _pick_tx_pcr(nx)
    assert nx % TX == 0 and TX % 128 == 0

    br = jnp.real(b).astype(jnp.float32)
    bi = jnp.imag(b).astype(jnp.float32)

    kernel = partial(_pcr_kernel_rb, NSTEPS=nsteps, NZ=nz, TX=TX, R=R)

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(nx // TX,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nsteps, 2, nz, TX), jnp.bfloat16),   # a_all
            pltpu.VMEM((nsteps, 2, nz, TX), jnp.bfloat16),   # g_all
            pltpu.VMEM((2, nz, TX), jnp.bfloat16),           # dinv
            pltpu.VMEM((2, nz, TX), jnp.float32),            # work re
            pltpu.VMEM((2, nz, TX), jnp.float32),            # work im
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the resident factor stack + work buffers + the roll
        # temporaries exceed the 16 MB default scoped limit by <1 MB at
        # nz=1024; the physical VMEM budget accommodates the raise
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(alphas, gammas, dinv, br, bi)

    return lax.complex(out_r, out_i)


def pcr_rb_applicable(alphas, dinv, b):
    'VMEM-budget check for the whole-batch sweep kernel.'

    if b.ndim != 3 or alphas.dtype != jnp.bfloat16:
        return False
    R, nz, nx = b.shape
    TX = _pick_tx_pcr(nx)
    if nx % TX or TX % 128 or nz < 8 or nz % 8:
        return False
    nsteps = alphas.shape[0]
    if nsteps < 2:
        return False
    col = nz * TX
    mb = (2 * nsteps * 2 * col * 2        # a_all + g_all (bf16)
          + 2 * col * 2                   # dinv (bf16)
          + 2 * col * 4 * 2               # work ping-pong (f32 re+im)
          ) / 1e6
    return mb < 14.0 and b.dtype == jnp.complex64


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
