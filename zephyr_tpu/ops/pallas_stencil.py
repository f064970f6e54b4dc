'''
Fused Pallas TPU kernel for the 9-point block-stencil apply.

The XLA lowering of ``apply_stencil`` is ~20 separate HBM-bound ops
(9 shifted slices, 9 multiplies, adds); on the experimental TPU runtime
per-op dispatch overhead dominates the solve (measured ~35x off the
bandwidth roofline at 512^2). This kernel fuses the whole apply — all nine
offsets, complex arithmetic as real/imaginary planes — into a single
pallas_call with manual halo DMA:

- ``u`` is zero-padded by one cell outside the kernel; each (TZ, TX)
  output tile DMAs its (TZ+2, TX+2) halo window from HBM into VMEM.
- The nine coefficient planes stream through VMEM as disjoint (TZ, TX)
  tiles via BlockSpec.
- Complex multiply-accumulate runs on the VPU as four real FMA streams.

Correctness is pinned against the jnp reference implementation in
tests/test_utils_realio.py (interpret mode on CPU, compiled on TPU).
'''

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import OFFSETS


def _pick_tx(nx):
    '''
    Largest lane-aligned tile width dividing nx. Keeps the fused kernels
    applicable on the intermediate grid sizes produced by per-frequency
    grid adaptation (e.g. 1280, 1792 — multiples of 256 but not 512).

    The fallthrough (nx not a multiple of 128 at all, e.g. the 448-wide
    half grid of a 896-point level) returns nx itself, which is NOT
    Mosaic-lane-aligned: every applicability predicate must reject it
    (``TX % 128``) so those shapes fall back to the jnp path instead of
    failing at compile time with 'Slice shape along dimension 2 must be
    aligned to tiling (128)'.
    '''

    for tx in (512, 256, 128):
        if nx % tx == 0:
            return tx
    return min(512, nx)


def _pick_tz(nz, cap):
    'Largest sublane-aligned tile height (<= cap) dividing nz.'

    t = cap
    while t > 8 and nz % t:
        t //= 2
    return t if nz % t == 0 else min(cap, nz)


def _apply_kernel(pr_ref, pi_ref, ur_hbm, ui_hbm, or_ref, oi_ref,
                  ur_tile, ui_tile, sem, *, TZ, TX):
    '''
    One (TZ, TX) output tile; u refs are the padded full arrays in HBM.
    The halo window is DMA'd as an aligned (TZ+8, TX+128) block (Mosaic
    requires slice shapes aligned to the (8, 128) tiling); the nine
    shifted reads then slice inside VMEM.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)

    copy_r = pltpu.make_async_copy(
        ur_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
        ur_tile, sem.at[0])
    copy_i = pltpu.make_async_copy(
        ui_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
        ui_tile, sem.at[1])
    copy_r.start()
    copy_i.start()
    copy_r.wait()
    copy_i.wait()

    acc_r = jnp.zeros((TZ, TX), jnp.float32)
    acc_i = jnp.zeros((TZ, TX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        ur = ur_tile[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        ui = ui_tile[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        pr = pr_ref[k]
        pi = pi_ref[k]
        acc_r += pr * ur - pi * ui
        acc_i += pr * ui + pi * ur
    or_ref[...] = acc_r
    oi_ref[...] = acc_i


@partial(jax.jit, static_argnames=('interpret',))
def apply_stencil_pallas(planes, u, interpret=False):
    '''
    Pallas-fused equivalent of ``stencil.apply_stencil`` for a scalar
    operator: planes (9, nz, nx) complex64, u (nz, nx) complex64.
    Grid dims must be multiples of 8 (z) and 128 (x); callers fall back
    to the jnp path otherwise.
    '''

    nz, nx = u.shape[-2:]
    # tile sizes chosen to fit the 16 MB scoped-VMEM limit:
    # 9 plane tiles (re+im) + halo scratch + outputs ~= 8 MB
    TZ = _pick_tz(nz, 128)
    TX = _pick_tx(nx)
    assert nz % TZ == 0 and nx % TX == 0

    pr = jnp.real(planes).astype(jnp.float32)
    pi = jnp.imag(planes).astype(jnp.float32)
    # pad so every tile's aligned (TZ+8, TX+128) halo window is in bounds
    up = jnp.pad(u, ((1, 7), (1, 127)))
    ur = jnp.real(up).astype(jnp.float32)
    ui = jnp.imag(up).astype(jnp.float32)

    grid = (nz // TZ, nx // TX)
    kernel = partial(_apply_kernel, TZ=TZ, TX=TX)

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, TZ, TX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TZ, TX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((TZ, TX), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TZ, TX), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((TZ + 8, TX + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pr, pi, ur, ui)

    return lax.complex(out_r, out_i)


def pallas_applicable(planes, u):
    'Whether the fused kernel supports these shapes/dtypes.'

    if planes.ndim != 3 or u.ndim != 2:
        return False
    nz, nx = u.shape
    TZ = _pick_tz(nz, 128)
    TX = _pick_tx(nx)
    return (nz % TZ == 0 and nx % TX == 0 and TX % 128 == 0
            and nz >= 8 and nx >= 128
            and planes.dtype == jnp.complex64)


# ---------------------------------------------------------------------------
# Batched apply: one kernel over a (R, nz, nx) field batch. XLA fuses the
# 9-offset apply well at <= 512^2 but falls apart at 2048^2 (measured
# 20.4 ms for R=16 — exactly the 27-pass unfused-traffic prediction);
# this kernel streams each halo window once.
# ---------------------------------------------------------------------------


def _double_buffered_halo_fetch(ur_hbm, ui_hbm, ur_tile, ui_tile, sem,
                                TZ, TX):
    """
    Shared double-buffered halo-window DMA for the batched kernels on
    grid (nz/TZ, nx/TX, R): start the NEXT grid step's copy before
    waiting on this step's, hiding the (strided, latency-bound) halo
    transfer behind the compute. Returns the (TZ+8, TX+128) re/im tile
    refs for the current step.
    """

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR

    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot

    def _start(rr, zz, xx, s):
        cr = pltpu.make_async_copy(
            ur_hbm.at[rr, pl.ds(zz * TZ, TZ + 8), pl.ds(xx * TX, TX + 128)],
            ur_tile.at[s], sem.at[s, 0])
        ci = pltpu.make_async_copy(
            ui_hbm.at[rr, pl.ds(zz * TZ, TZ + 8), pl.ds(xx * TX, TX + 128)],
            ui_tile.at[s], sem.at[s, 1])
        cr.start()
        ci.start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    cr = pltpu.make_async_copy(
        ur_hbm.at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
        ur_tile.at[slot], sem.at[slot, 0])
    ci = pltpu.make_async_copy(
        ui_hbm.at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
        ui_tile.at[slot], sem.at[slot, 1])
    cr.wait()
    ci.wait()
    return ur_tile.at[slot], ui_tile.at[slot]


def _accumulate_offsets(pr_ref, pi_ref, urt, uit, TZ, TX):
    "9-offset complex FMA over the halo tile: (A u) as real/imag pair."

    acc_r = jnp.zeros((TZ, TX), jnp.float32)
    acc_i = jnp.zeros((TZ, TX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        ur = urt[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        ui = uit[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        pr = pr_ref[k]
        pi = pi_ref[k]
        acc_r += pr * ur - pi * ui
        acc_i += pr * ui + pi * ur
    return acc_r, acc_i


def _apply_kernel_batched(pr_ref, pi_ref, ur_hbm, ui_hbm, or_ref, oi_ref,
                          ur_tile, ui_tile, sem, *, TZ, TX):
    "Grid (nz/TZ, nx/TX, R); u refs are the padded (R, nzp, nxp) arrays."

    urt, uit = _double_buffered_halo_fetch(ur_hbm, ui_hbm, ur_tile,
                                           ui_tile, sem, TZ, TX)
    acc_r, acc_i = _accumulate_offsets(pr_ref, pi_ref, urt, uit, TZ, TX)
    or_ref[0] = acc_r
    oi_ref[0] = acc_i


def _batched_call(kernel, extra_inputs, extra_specs, planes, u, TZ, TX,
                  interpret):
    """
    Shared pad/split/pallas_call scaffolding for the batched kernels:
    planes (9, nz, nx) tiles in VMEM, u as padded real/imag pairs in ANY
    memory (manually DMA'd), (R, nz, nx) re/im outputs.
    """

    R, nz, nx = u.shape
    assert nz % TZ == 0 and nx % TX == 0

    pr = jnp.real(planes).astype(jnp.float32)
    pi = jnp.imag(planes).astype(jnp.float32)
    up = jnp.pad(u, ((0, 0), (1, 7), (1, 127)))
    ur = jnp.real(up).astype(jnp.float32)
    ui = jnp.imag(up).astype(jnp.float32)

    grid = (nz // TZ, nx // TX, R)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, TZ, TX), lambda i, j, r: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TZ, TX), lambda i, j, r: (0, i, j),
                         memory_space=pltpu.VMEM),
        ] + list(extra_specs) + [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pr, pi, *extra_inputs, ur, ui)

    return lax.complex(out_r, out_i)


def _apply_kernel_rb(pr_ref, pi_ref, ur_hbm, ui_hbm, or_hbm, oi_hbm,
                     ur_tile, ui_tile, out_tile, sem, osem,
                     *, TZ, TX, R):
    '''
    Whole-batch tile program: grid (nz/TZ, nx/TX); each program loops
    ALL R right-hand sides over its tile with the coefficient tile
    resident. The (tile, RHS)-per-program variant paid a fixed
    ~5-6 us of dispatch/DMA-issue latency per program across
    R x more programs — measured to dominate every batched stencil
    kernel at production sizes (matvec 8.7 ms vs ~2 ms of traffic at
    2048^2 x 16). Fields stream through two-slot halo buffers
    (prefetch r+1 behind r's compute); outputs stage through a
    two-slot buffer so the write-back DMA overlaps the next RHS.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)

    def _in_copy(rr, s):
        cr = pltpu.make_async_copy(
            ur_hbm.at[rr, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)],
            ur_tile.at[s], sem.at[s, 0])
        ci = pltpu.make_async_copy(
            ui_hbm.at[rr, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)],
            ui_tile.at[s], sem.at[s, 1])
        return cr, ci

    def _out_copy(rr, s):
        cr = pltpu.make_async_copy(
            out_tile.at[s, 0],
            or_hbm.at[rr, pl.ds(iz * TZ, TZ), pl.ds(jx * TX, TX)],
            osem.at[s, 0])
        ci = pltpu.make_async_copy(
            out_tile.at[s, 1],
            oi_hbm.at[rr, pl.ds(iz * TZ, TZ), pl.ds(jx * TX, TX)],
            osem.at[s, 1])
        return cr, ci

    for cp in _in_copy(0, 0):
        cp.start()

    def body(r, carry):
        # traced r: ONE copy of the compute on the Mosaic stack
        slot = lax.rem(r, 2)

        @pl.when(r + 1 < R)
        def _():
            for cp in _in_copy(r + 1, 1 - slot):
                cp.start()
        for cp in _in_copy(r, slot):
            cp.wait()
        acc_r, acc_i = _accumulate_offsets(pr_ref, pi_ref,
                                           ur_tile.at[slot],
                                           ui_tile.at[slot], TZ, TX)

        @pl.when(r >= 2)
        def _():
            for cp in _out_copy(r - 2, slot):
                cp.wait()
        out_tile[slot, 0] = acc_r
        out_tile[slot, 1] = acc_i
        for cp in _out_copy(r, slot):
            cp.start()
        return carry

    lax.fori_loop(0, R, body, 0)
    for r in range(max(R - 2, 0), R):
        for cp in _out_copy(r, r % 2):
            cp.wait()


def _batched_call_rb(kernel, planes, u, TZ, TX, n_extra_scratch,
                     extra_inputs=(), interpret=False):
    '''
    Scaffolding for the whole-batch (rb) kernels: grid (nz/TZ, nx/TX),
    planes as pipelined VMEM blocks, u and the outputs as padded re/im
    pairs in ANY memory (manually DMA'd inside the kernel).
    '''

    R, nz, nx = u.shape

    pr = jnp.real(planes).astype(jnp.float32)
    pi = jnp.imag(planes).astype(jnp.float32)
    up = jnp.pad(u, ((0, 0), (1, 7), (1, 127)))
    ur = jnp.real(up).astype(jnp.float32)
    ui = jnp.imag(up).astype(jnp.float32)

    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(nz // TZ, nx // TX),
        in_specs=[
            pl.BlockSpec((9, TZ, TX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, TZ, TX), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * (2 + len(extra_inputs)),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ, TX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ] + list(n_extra_scratch),
        interpret=interpret,
    )(pr, pi, *extra_inputs, ur, ui)

    return lax.complex(out_r, out_i)


@partial(jax.jit, static_argnames=('interpret',))
def apply_stencil_pallas_batched(planes, u, interpret=False):
    """
    Pallas-fused batched stencil apply: planes (9, nz, nx) complex64,
    u (R, nz, nx) complex64 -> (R, nz, nx). Whole-batch tile programs
    (see _apply_kernel_rb): each program holds its coefficient tile and
    loops the full RHS batch with double-buffered halo-in and
    write-back DMAs.

    No AD rules: use only where gradients are not traced through (the
    preconditioner and the non-differentiable chunked/info solvers).
    """

    nz, nx = u.shape[-2:]
    R = u.shape[0]
    TZ = _pick_tz(nz, 128)
    TX = _pick_tx(nx)
    kernel = partial(_apply_kernel_rb, TZ=TZ, TX=TX, R=R)
    return _batched_call_rb(kernel, planes, u, TZ, TX, (),
                            interpret=interpret)


def _jacobi_kernel_batched(pr_ref, pi_ref, dr_ref, di_ref, br_ref, bi_ref,
                           ur_hbm, ui_hbm, or_ref, oi_ref,
                           ur_tile, ui_tile, sem, *, TZ, TX):
    """
    Fused damped-Jacobi sweep: u' = u + Dinv_eff (b - A u), with
    Dinv_eff = omega * Dinv pre-multiplied by the caller.
    """

    urt, uit = _double_buffered_halo_fetch(ur_hbm, ui_hbm, ur_tile,
                                           ui_tile, sem, TZ, TX)
    acc_r, acc_i = _accumulate_offsets(pr_ref, pi_ref, urt, uit, TZ, TX)
    # r = b - A u; u' = u_c + Dinv_eff r
    rr = br_ref[0] - acc_r
    ri = bi_ref[0] - acc_i
    uc_r = urt[1:1 + TZ, 1:1 + TX]
    uc_i = uit[1:1 + TZ, 1:1 + TX]
    dr = dr_ref[...]
    di = di_ref[...]
    or_ref[0] = uc_r + dr * rr - di * ri
    oi_ref[0] = uc_i + dr * ri + di * rr


@partial(jax.jit, static_argnames=('interpret',))
def jacobi_sweep_pallas_batched(planes, dinv_eff, b, u, interpret=False):
    """
    One fused damped-Jacobi sweep u' = u + dinv_eff * (b - A u) for a
    (R, nz, nx) batch; ``dinv_eff`` is the (nz, nx) pointwise inverse
    diagonal already multiplied by the damping factor. No AD rules.
    """

    nz, nx = u.shape[-2:]
    # smaller z-tile than the plain apply: the extra dinv/b blocks (each
    # pipeline-double-buffered by Mosaic) blow the 16 MB scoped-VMEM
    # limit at (128, 512)
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)

    dr = jnp.real(dinv_eff).astype(jnp.float32)
    di = jnp.imag(dinv_eff).astype(jnp.float32)
    br = jnp.real(b).astype(jnp.float32)
    bi = jnp.imag(b).astype(jnp.float32)
    extra_specs = [
        pl.BlockSpec((TZ, TX), lambda i, j, r: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TZ, TX), lambda i, j, r: (i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                     memory_space=pltpu.VMEM),
    ]
    kernel = partial(_jacobi_kernel_batched, TZ=TZ, TX=TX)
    return _batched_call(kernel, (dr, di, br, bi), extra_specs, planes, u,
                         TZ, TX, interpret)


# ---------------------------------------------------------------------------
# Fused double Jacobi sweep: two damped sweeps in ONE pass with redundant
# halo compute. Traffic is that of a single sweep (planes + b + u + out),
# and the coefficient windows are fetched once per spatial tile (the
# batch index is the innermost grid dimension), so the pair costs ~1x
# instead of 2x a single sweep. u' = u + D (b - A u), applied twice.
# ---------------------------------------------------------------------------


def _accumulate_offsets_shaped(pr, pi, urt, uit, oz, ox, SZ, SX):
    '''
    9-offset complex FMA producing an (SZ, SX) block whose [0, 0] output
    element corresponds to window element [oz, ox]: out = (A u)[oz:oz+SZ,
    ox:ox+SX] with plane windows indexed identically to u windows.
    '''

    acc_r = jnp.zeros((SZ, SX), jnp.float32)
    acc_i = jnp.zeros((SZ, SX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        ur = urt[oz + dz:oz + dz + SZ, ox + dx:ox + dx + SX]
        ui = uit[oz + dz:oz + dz + SZ, ox + dx:ox + dx + SX]
        kr = pr[k, oz:oz + SZ, ox:ox + SX]
        ki = pi[k, oz:oz + SZ, ox:ox + SX]
        acc_r += kr * ur - ki * ui
        acc_i += kr * ui + ki * ur
    return acc_r, acc_i


def _jacobi2_kernel(pr_hbm, pi_hbm, dr_hbm, di_hbm, br_hbm, bi_hbm,
                    ur_hbm, ui_hbm, or_ref, oi_ref,
                    p_tile, d_tile, bu_tile, sem_p, sem_bu,
                    *, TZ, TX, from_zero):
    '''
    Grid (nz/TZ, nx/TX, R). All inputs are padded ((2, 6), (2, 126)) so
    each (TZ+8, TX+128) window carries a >= 2-cell halo. Coefficient
    windows (planes, dinv) are fetched once per spatial tile (at r == 0);
    b (and u unless from_zero) stream double-buffered per batch step.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR
    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot

    nbu = 2 if from_zero else 4      # (br, bi) or (br, bi, ur, ui)

    # coefficient windows: once per spatial tile
    @pl.when(r == 0)
    def _():
        cp0 = pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[0], sem_p.at[0])
        cp1 = pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[1], sem_p.at[1])
        cd0 = pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_p.at[2])
        cd1 = pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_p.at[3])
        cp0.start(); cp1.start(); cd0.start(); cd1.start()
        cp0.wait(); cp1.wait(); cd0.wait(); cd1.wait()

    hbm = (br_hbm, bi_hbm, ur_hbm, ui_hbm)[:nbu]

    def _start(rr, zz, xx, s):
        for a in range(nbu):
            pltpu.make_async_copy(
                hbm[a].at[rr, pl.ds(zz * TZ, TZ + 8),
                          pl.ds(xx * TX, TX + 128)],
                bu_tile.at[s, a], sem_bu.at[s, a]).start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    for a in range(nbu):
        pltpu.make_async_copy(
            hbm[a].at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            bu_tile.at[slot, a], sem_bu.at[slot, a]).wait()

    pr = p_tile[0]
    pi = p_tile[1]
    dr = d_tile[0]
    di = d_tile[1]
    br = bu_tile[slot, 0]
    bi = bu_tile[slot, 1]

    # sweep 1 on the (TZ+2, TX+2) halo block whose [0,0] is window [1,1]
    SZ1, SX1 = TZ + 2, TX + 2
    if from_zero:
        u1r = (dr[1:1 + SZ1, 1:1 + SX1] * br[1:1 + SZ1, 1:1 + SX1]
               - di[1:1 + SZ1, 1:1 + SX1] * bi[1:1 + SZ1, 1:1 + SX1])
        u1i = (dr[1:1 + SZ1, 1:1 + SX1] * bi[1:1 + SZ1, 1:1 + SX1]
               + di[1:1 + SZ1, 1:1 + SX1] * br[1:1 + SZ1, 1:1 + SX1])
    else:
        ur = bu_tile[slot, 2]
        ui = bu_tile[slot, 3]
        a_r, a_i = _accumulate_offsets_shaped(pr, pi, ur, ui, 1, 1,
                                              SZ1, SX1)
        rr1 = br[1:1 + SZ1, 1:1 + SX1] - a_r
        ri1 = bi[1:1 + SZ1, 1:1 + SX1] - a_i
        u1r = ur[1:1 + SZ1, 1:1 + SX1] \
            + dr[1:1 + SZ1, 1:1 + SX1] * rr1 - di[1:1 + SZ1,
                                                  1:1 + SX1] * ri1
        u1i = ui[1:1 + SZ1, 1:1 + SX1] \
            + dr[1:1 + SZ1, 1:1 + SX1] * ri1 + di[1:1 + SZ1,
                                                  1:1 + SX1] * rr1

    # sweep 2 on the (TZ, TX) tile; u1's [0,0] is window [1,1], so the
    # tile's window offset (2,2) is u1 offset (1,1)
    a2_r = jnp.zeros((TZ, TX), jnp.float32)
    a2_i = jnp.zeros((TZ, TX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        u1r_s = u1r[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        u1i_s = u1i[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        kr = pr[k, 2:2 + TZ, 2:2 + TX]
        ki = pi[k, 2:2 + TZ, 2:2 + TX]
        a2_r += kr * u1r_s - ki * u1i_s
        a2_i += kr * u1i_s + ki * u1r_s
    rr2 = br[2:2 + TZ, 2:2 + TX] - a2_r
    ri2 = bi[2:2 + TZ, 2:2 + TX] - a2_i
    dr_c = dr[2:2 + TZ, 2:2 + TX]
    di_c = di[2:2 + TZ, 2:2 + TX]
    or_ref[0] = u1r[1:1 + TZ, 1:1 + TX] + dr_c * rr2 - di_c * ri2
    oi_ref[0] = u1i[1:1 + TZ, 1:1 + TX] + dr_c * ri2 + di_c * rr2


@partial(jax.jit, static_argnames=('interpret',))
def jacobi_sweep2_pallas_batched(planes, dinv_eff, b, u, interpret=False):
    '''
    TWO fused damped-Jacobi sweeps for a (R, nz, nx) complex64 batch:
    u'' where u' = u + dinv_eff (b - A u), u'' = u' + dinv_eff (b - A u').
    Pass u=None for the from-zero variant (u treated as 0, i.e. the
    V-cycle's first smoothing call). No AD rules.
    '''

    nz, nx = b.shape[-2:]
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)

    pr = jnp.pad(jnp.real(planes).astype(jnp.float32),
                 ((0, 0), (2, 6), (2, 126)))
    pi = jnp.pad(jnp.imag(planes).astype(jnp.float32),
                 ((0, 0), (2, 6), (2, 126)))
    dr = jnp.pad(jnp.real(dinv_eff).astype(jnp.float32), ((2, 6), (2, 126)))
    di = jnp.pad(jnp.imag(dinv_eff).astype(jnp.float32), ((2, 6), (2, 126)))
    bp = jnp.pad(b, ((0, 0), (2, 6), (2, 126)))
    br = jnp.real(bp).astype(jnp.float32)
    bi = jnp.imag(bp).astype(jnp.float32)
    from_zero = u is None
    if from_zero:
        ur = ui = jnp.zeros((1, 1, 1), jnp.float32)   # unused
    else:
        up = jnp.pad(u, ((0, 0), (2, 6), (2, 126)))
        ur = jnp.real(up).astype(jnp.float32)
        ui = jnp.imag(up).astype(jnp.float32)

    R = b.shape[0]
    grid = (nz // TZ, nx // TX, R)
    nbu = 2 if from_zero else 4
    kernel = partial(_jacobi2_kernel, TZ=TZ, TX=TX, from_zero=from_zero)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=[
            pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 4, TZ + 8, TX + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(pr, pi, dr, di, br, bi, ur, ui)
    return lax.complex(out_r, out_i)


def pallas_jacobi2_applicable(planes, b):
    "Whether the fused double-sweep kernel supports these shapes/dtypes."

    return _batched_tiles_ok(planes, b, 64)


def _batched_tiles_ok(planes, u, tz):
    if planes.ndim != 3 or u.ndim != 3:
        return False
    nz, nx = u.shape[-2:]
    TZ = _pick_tz(nz, tz)
    TX = _pick_tx(nx)
    return (nz % TZ == 0 and nx % TX == 0 and TX % 128 == 0
            and nz >= 8 and nx >= 128
            and planes.dtype == jnp.complex64 and u.dtype == jnp.complex64)


def pallas_batched_applicable(planes, u):
    "Whether the batched fused apply supports these shapes/dtypes."

    return _batched_tiles_ok(planes, u, 128)


def pallas_jacobi_applicable(planes, u):
    "Whether the fused Jacobi-sweep kernel supports these shapes/dtypes."

    return _batched_tiles_ok(planes, u, 64)


# ---------------------------------------------------------------------------
# Fused pre-smooth + residual: TWO from-zero damped-Jacobi sweeps AND the
# masked fine-grid residual of the smoothed iterate in ONE pass (the
# V-cycle's entire fine-level downstroke). Redundant halo compute; traffic
# is b + coefficients in, u2 + masked residual out — one full read/write
# round-trip of the iterate less than sweep-kernel + residual-kernel.
# ---------------------------------------------------------------------------


def _ps2r_kernel(pr_hbm, pi_hbm, dr_hbm, di_hbm, mr_hbm, br_hbm, bi_hbm,
                 ur_ref, ui_ref, rr_ref, ri_ref,
                 p_tile, d_tile, m_tile, bu_tile, sem_p, sem_bu,
                 *, TZ, TX):
    '''
    Grid (nz/TZ, nx/TX, R). All inputs padded ((2, 6), (2, 126)) so each
    (TZ+8, TX+128) window carries a >= 2-cell halo. u1 = D b on the
    halo-2 block, u2 = u1 + D (b - A u1) on the halo-1 block,
    res = mask * (b - A u2) on the output tile. Coefficient windows
    (planes, dinv, mask) are fetched once per spatial tile (at r == 0);
    b streams double-buffered per batch step.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR
    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot

    @pl.when(r == 0)
    def _():
        cp0 = pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[0], sem_p.at[0])
        cp1 = pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[1], sem_p.at[1])
        cd0 = pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_p.at[2])
        cd1 = pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_p.at[3])
        cm = pltpu.make_async_copy(
            mr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            m_tile, sem_p.at[4])
        cp0.start(); cp1.start(); cd0.start(); cd1.start(); cm.start()
        cp0.wait(); cp1.wait(); cd0.wait(); cd1.wait(); cm.wait()

    hbm = (br_hbm, bi_hbm)

    def _start(rr_i, zz, xx, s):
        for a in range(2):
            pltpu.make_async_copy(
                hbm[a].at[rr_i, pl.ds(zz * TZ, TZ + 8),
                          pl.ds(xx * TX, TX + 128)],
                bu_tile.at[s, a], sem_bu.at[s, a]).start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    for a in range(2):
        pltpu.make_async_copy(
            hbm[a].at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            bu_tile.at[slot, a], sem_bu.at[slot, a]).wait()

    pr = p_tile[0]
    pi = p_tile[1]
    dr = d_tile[0]
    di = d_tile[1]
    br = bu_tile[slot, 0]
    bi = bu_tile[slot, 1]

    # sweep 1 from zero on the halo-2 block: u1 = D b on (TZ+4, TX+4)
    # whose [0, 0] is window [0, 0]
    SZ1, SX1 = TZ + 4, TX + 4
    u1r = (dr[:SZ1, :SX1] * br[:SZ1, :SX1]
           - di[:SZ1, :SX1] * bi[:SZ1, :SX1])
    u1i = (dr[:SZ1, :SX1] * bi[:SZ1, :SX1]
           + di[:SZ1, :SX1] * br[:SZ1, :SX1])

    # sweep 2 on the halo-1 block (TZ+2, TX+2), [0,0] = window [1,1]
    SZ2, SX2 = TZ + 2, TX + 2
    a1_r = jnp.zeros((SZ2, SX2), jnp.float32)
    a1_i = jnp.zeros((SZ2, SX2), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        ur = u1r[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
        ui = u1i[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
        kr = pr[k, 1:1 + SZ2, 1:1 + SX2]
        ki = pi[k, 1:1 + SZ2, 1:1 + SX2]
        a1_r += kr * ur - ki * ui
        a1_i += kr * ui + ki * ur
    rr1 = br[1:1 + SZ2, 1:1 + SX2] - a1_r
    ri1 = bi[1:1 + SZ2, 1:1 + SX2] - a1_i
    u2r = u1r[1:1 + SZ2, 1:1 + SX2] \
        + dr[1:1 + SZ2, 1:1 + SX2] * rr1 - di[1:1 + SZ2, 1:1 + SX2] * ri1
    u2i = u1i[1:1 + SZ2, 1:1 + SX2] \
        + dr[1:1 + SZ2, 1:1 + SX2] * ri1 + di[1:1 + SZ2, 1:1 + SX2] * rr1

    # masked residual on the (TZ, TX) tile; u2's [0,0] is window [1,1]
    a2_r = jnp.zeros((TZ, TX), jnp.float32)
    a2_i = jnp.zeros((TZ, TX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        ur = u2r[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        ui = u2i[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        kr = pr[k, 2:2 + TZ, 2:2 + TX]
        ki = pi[k, 2:2 + TZ, 2:2 + TX]
        a2_r += kr * ur - ki * ui
        a2_i += kr * ui + ki * ur
    m = m_tile[2:2 + TZ, 2:2 + TX]
    ur_ref[0] = u2r[1:1 + TZ, 1:1 + TX]
    ui_ref[0] = u2i[1:1 + TZ, 1:1 + TX]
    rr_ref[0] = m * (br[2:2 + TZ, 2:2 + TX] - a2_r)
    ri_ref[0] = m * (bi[2:2 + TZ, 2:2 + TX] - a2_i)


@partial(jax.jit, static_argnames=('interpret',))
def presmooth2_residual_pallas_batched(planes, dinv_eff, mask, b,
                                       interpret=False):
    '''
    The V-cycle fine-level downstroke in one kernel, for a (R, nz, nx)
    complex64 batch: u2 = two damped Jacobi sweeps from zero on b, and
    resm = mask * (b - A u2). Returns (u2, resm). No AD rules.
    '''

    nz, nx = b.shape[-2:]
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)

    pr = jnp.pad(jnp.real(planes).astype(jnp.float32),
                 ((0, 0), (2, 6), (2, 126)))
    pi = jnp.pad(jnp.imag(planes).astype(jnp.float32),
                 ((0, 0), (2, 6), (2, 126)))
    dr = jnp.pad(jnp.real(dinv_eff).astype(jnp.float32), ((2, 6), (2, 126)))
    di = jnp.pad(jnp.imag(dinv_eff).astype(jnp.float32), ((2, 6), (2, 126)))
    mr = jnp.pad(jnp.real(mask).astype(jnp.float32), ((2, 6), (2, 126)))
    bp = jnp.pad(b, ((0, 0), (2, 6), (2, 126)))
    br = jnp.real(bp).astype(jnp.float32)
    bi = jnp.imag(bp).astype(jnp.float32)

    R = b.shape[0]
    grid = (nz // TZ, nx // TX, R)
    kernel = partial(_ps2r_kernel, TZ=TZ, TX=TX)
    u2r, u2i, rr_, ri_ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[
            pl.BlockSpec((1, TZ, TX), lambda i, j, r: (r, i, j),
                         memory_space=pltpu.VMEM)] * 4,
        out_shape=[jax.ShapeDtypeStruct((R, nz, nx), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 9, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ + 8, TX + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(pr, pi, dr, di, mr, br, bi)
    return lax.complex(u2r, u2i), lax.complex(rr_, ri_)


def pallas_ps2r_applicable(planes, b):
    'Whether the fused presmooth+residual kernel supports these shapes.'

    return _batched_tiles_ok(planes, b, 64)


# ---------------------------------------------------------------------------
# Fused BLOCK (B = 2) apply: the Eurus TTI 2x2 system in ONE pass. The
# generic path applies four scalar kernels (one per block pair) plus adds,
# which re-streams each field component's halo window twice and round-trips
# two partial sums through HBM; this kernel reads both components once and
# writes both outputs once.
# ---------------------------------------------------------------------------


def _double_buffered_halo_fetch_multi(hbm_refs, tile_refs, sem, TZ, TX):
    '''
    ``_double_buffered_halo_fetch`` generalized to N (hbm, tile) pairs on
    grid (nz/TZ, nx/TX, R); sem has shape (2, N). Returns the current
    step's tile refs.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR

    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot

    def _start(rr, zz, xx, s):
        for q, (hbm, tile) in enumerate(zip(hbm_refs, tile_refs)):
            pltpu.make_async_copy(
                hbm.at[rr, pl.ds(zz * TZ, TZ + 8),
                       pl.ds(xx * TX, TX + 128)],
                tile.at[s], sem.at[s, q]).start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    out = []
    for q, (hbm, tile) in enumerate(zip(hbm_refs, tile_refs)):
        pltpu.make_async_copy(
            hbm.at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            tile.at[slot], sem.at[slot, q]).wait()
        out.append(tile.at[slot])
    return out


def _apply_block_kernel_batched(pr_ref, pi_ref,
                                u0r_hbm, u0i_hbm, u1r_hbm, u1i_hbm,
                                o0r_ref, o0i_ref, o1r_ref, o1i_ref,
                                u0r_t, u0i_t, u1r_t, u1i_t, sem,
                                *, TZ, TX):
    '''
    One (TZ, TX) output tile of the 2x2 block apply on grid
    (nz/TZ, nx/TX, R). pr/pi carry the (2, 2, 9, TZ, TX) coefficient
    tiles; the four field-component arrays are padded re/im planes in
    HBM, halo-fetched with double buffering.
    '''

    u0r, u0i, u1r, u1i = _double_buffered_halo_fetch_multi(
        (u0r_hbm, u0i_hbm, u1r_hbm, u1i_hbm),
        (u0r_t, u0i_t, u1r_t, u1i_t), sem, TZ, TX)
    comps = ((u0r, u0i), (u1r, u1i))
    outs = ((o0r_ref, o0i_ref), (o1r_ref, o1i_ref))
    for i in range(2):
        acc_r = jnp.zeros((TZ, TX), jnp.float32)
        acc_i = jnp.zeros((TZ, TX), jnp.float32)
        for j in range(2):
            urt, uit = comps[j]
            for k, (dz, dx) in enumerate(OFFSETS):
                ur = urt[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
                ui = uit[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
                prk = pr_ref[i, j, k]
                pik = pi_ref[i, j, k]
                acc_r += prk * ur - pik * ui
                acc_i += prk * ui + pik * ur
        outs[i][0][0] = acc_r
        outs[i][1][0] = acc_i


def _apply_block_kernel_rb(pr_ref, pi_ref,
                           u0r_hbm, u0i_hbm, u1r_hbm, u1i_hbm,
                           o0r_hbm, o0i_hbm, o1r_hbm, o1i_hbm,
                           u_tile, out_tile, sem, osem,
                           *, TZ, TX, R):
    '''
    Whole-batch variant of ``_apply_block_kernel_batched``: grid
    (nz/TZ, nx/TX); each program keeps its (2, 2, 9) coefficient tiles
    resident and loops ALL R right-hand sides (see _apply_kernel_rb).
    The four field components stream double-buffered; the four outputs
    stage through a two-slot buffer with async write-back.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    fields = (u0r_hbm, u0i_hbm, u1r_hbm, u1i_hbm)
    outs_hbm = (o0r_hbm, o0i_hbm, o1r_hbm, o1i_hbm)

    def _in_copy(rr, s):
        return [pltpu.make_async_copy(
            fields[a].at[rr, pl.ds(iz * TZ, TZ + 8),
                         pl.ds(jx * TX, TX + 128)],
            u_tile.at[s, a], sem.at[s, a]) for a in range(4)]

    def _out_copy(rr, s):
        return [pltpu.make_async_copy(
            out_tile.at[s, a],
            outs_hbm[a].at[rr, pl.ds(iz * TZ, TZ), pl.ds(jx * TX, TX)],
            osem.at[s, a]) for a in range(4)]

    for cp in _in_copy(0, 0):
        cp.start()

    def body(r, carry):
        slot = lax.rem(r, 2)

        @pl.when(r + 1 < R)
        def _():
            for cp in _in_copy(r + 1, 1 - slot):
                cp.start()
        for cp in _in_copy(r, slot):
            cp.wait()

        comps = ((u_tile.at[slot, 0], u_tile.at[slot, 1]),
                 (u_tile.at[slot, 2], u_tile.at[slot, 3]))

        @pl.when(r >= 2)
        def _():
            for cp in _out_copy(r - 2, slot):
                cp.wait()
        for i in range(2):
            acc_r = jnp.zeros((TZ, TX), jnp.float32)
            acc_i = jnp.zeros((TZ, TX), jnp.float32)
            for j in range(2):
                urt, uit = comps[j]
                for k, (dz, dx) in enumerate(OFFSETS):
                    ur = urt[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
                    ui = uit[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
                    prk = pr_ref[i, j, k]
                    pik = pi_ref[i, j, k]
                    acc_r += prk * ur - pik * ui
                    acc_i += prk * ui + pik * ur
            out_tile[slot, 2 * i] = acc_r
            out_tile[slot, 2 * i + 1] = acc_i
        for cp in _out_copy(r, slot):
            cp.start()
        return carry

    lax.fori_loop(0, R, body, 0)
    for r in range(max(R - 2, 0), R):
        for cp in _out_copy(r, r % 2):
            cp.wait()


@partial(jax.jit, static_argnames=('interpret',))
def apply_block_stencil_pallas_batched(planes, u, interpret=False):
    '''
    Fused batched 2x2 block-stencil apply: planes (2, 2, 9, nz, nx)
    complex64, u (R, 2, nz, nx) complex64 -> (R, 2, nz, nx), in
    whole-batch tile programs (see _apply_block_kernel_rb).
    No AD rules: preconditioner internals and the non-differentiable
    chunked/info solvers only.
    '''

    R, B, nz, nx = u.shape
    assert B == 2
    TZ = _pick_tz(nz, 32)
    TX = _pick_tx(nx)
    assert nz % TZ == 0 and nx % TX == 0

    pr = jnp.real(planes).astype(jnp.float32)
    pi = jnp.imag(planes).astype(jnp.float32)
    up = jnp.pad(u, ((0, 0), (0, 0), (1, 7), (1, 127)))
    comps = []
    for j in range(2):
        comps.append(jnp.real(up[:, j]).astype(jnp.float32))
        comps.append(jnp.imag(up[:, j]).astype(jnp.float32))

    kernel = partial(_apply_block_kernel_rb, TZ=TZ, TX=TX, R=R)
    o0r, o0i, o1r, o1i = pl.pallas_call(
        kernel,
        grid=(nz // TZ, nx // TX),
        in_specs=[
            pl.BlockSpec((2, 2, 9, TZ, TX), lambda i, j: (0, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, 9, TZ, TX), lambda i, j: (0, 0, 0, i, j),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_shape=[jax.ShapeDtypeStruct((R, nz, nx), jnp.float32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 4, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 4, TZ, TX), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(pr, pi, *comps)
    return jnp.stack([lax.complex(o0r, o0i), lax.complex(o1r, o1i)],
                     axis=1)


def pallas_block_applicable(planes, u):
    'Whether the fused block apply supports these shapes/dtypes.'

    if planes.ndim != 5 or u.ndim != 4:
        return False
    if planes.shape[:2] != (2, 2) or u.shape[1] != 2:
        return False
    nz, nx = u.shape[-2:]
    TZ = _pick_tz(nz, 32)
    TX = _pick_tx(nx)
    return (nz % TZ == 0 and nx % TX == 0 and TX % 128 == 0
            and nz >= 8 and nx >= 128
            and planes.dtype == jnp.complex64 and u.dtype == jnp.complex64)


# ---------------------------------------------------------------------------
# Fused V-cycle upstroke: u' = jacobi(u + mask * prolong(ec), b) in ONE
# pass — prolongation (zero-interleave + separable tent), masked add of the
# coarse correction, and the first post-smoothing sweep. Replaces three
# kernels (prolong, axpy, sweep) and saves the intermediate iterate's two
# extra HBM round-trips.
# ---------------------------------------------------------------------------


def _prolong_mats(TZ, TX):
    '''
    Banded tent-interpolation matrices for prolonging a (TZh+2, TXh+2)
    coarse halo block to a fine (TZ+2, TX+2) block: fine = Pz @ e @ PxT.
    Row i of the zero-interleaved+tent-filtered fine axis draws from
    coarse j with weights 1.0 (2j == i+1) and 0.5 (2j == i or i+2) —
    the same [0.5, 1, 0.5] tent the previous in-kernel interleave
    expressed, now as MXU matmuls (Mosaic's vector layout inference
    rejects the (n, m, 2) -> (n, 2m) interleaving shape cast).
    '''

    TZh, TXh = TZ // 2, TX // 2
    Pz = np.zeros((TZ + 2, TZh + 2), np.float32)
    for i in range(TZ + 2):
        for j in range(TZh + 2):
            if 2 * j == i + 1:
                Pz[i, j] += 1.0
            if 2 * j == i or 2 * j == i + 2:
                Pz[i, j] += 0.5
    PxT = np.zeros((TXh + 2, TX + 2), np.float32)
    for p in range(TX + 2):
        for q in range(TXh + 2):
            if 2 * q == p + 1:
                PxT[q, p] += 1.0
            if 2 * q == p or 2 * q == p + 2:
                PxT[q, p] += 0.5
    return Pz, PxT


def _pas_kernel(pz_ref, pxT_ref, pr_hbm, pi_hbm, dr_hbm, di_hbm, mr_hbm,
                br_hbm, bi_hbm, ur_hbm, ui_hbm, er_hbm, ei_hbm,
                or_ref, oi_ref,
                p_tile, d_tile, m_tile, bu_tile, e_tile, sem_c, sem_s,
                *, TZ, TX):
    '''
    Grid (nz/TZ, nx/TX, R). Fine-grid inputs padded ((1, 7), (1, 127))
    so each (TZ+8, TX+128) window carries a 1-cell halo at [0, 0]; the
    coarse input padded the same so its (TZ/2+8, TX/2+128) window
    carries the 1-cell coarse halo. Coefficient windows (planes, dinv,
    mask) are fetched once per spatial tile (r == 0); b/u/ec stream
    double-buffered per batch step.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR
    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot
    TZh, TXh = TZ // 2, TX // 2

    @pl.when(r == 0)
    def _():
        cp0 = pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[0], sem_c.at[0])
        cp1 = pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[1], sem_c.at[1])
        cd0 = pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_c.at[2])
        cd1 = pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_c.at[3])
        cm = pltpu.make_async_copy(
            mr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            m_tile, sem_c.at[4])
        cp0.start(); cp1.start(); cd0.start(); cd1.start(); cm.start()
        cp0.wait(); cp1.wait(); cd0.wait(); cd1.wait(); cm.wait()

    fine = (br_hbm, bi_hbm, ur_hbm, ui_hbm)
    coarse = (er_hbm, ei_hbm)

    def _start(rr_i, zz, xx, s):
        for a in range(4):
            pltpu.make_async_copy(
                fine[a].at[rr_i, pl.ds(zz * TZ, TZ + 8),
                           pl.ds(xx * TX, TX + 128)],
                bu_tile.at[s, a], sem_s.at[s, a]).start()
        for a in range(2):
            pltpu.make_async_copy(
                coarse[a].at[rr_i, pl.ds(zz * TZh, TZh + 8),
                             pl.ds(xx * TXh, TXh + 128)],
                e_tile.at[s, a], sem_s.at[s, 4 + a]).start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    for a in range(4):
        pltpu.make_async_copy(
            fine[a].at[r, pl.ds(iz * TZ, TZ + 8),
                       pl.ds(jx * TX, TX + 128)],
            bu_tile.at[slot, a], sem_s.at[slot, a]).wait()
    for a in range(2):
        pltpu.make_async_copy(
            coarse[a].at[r, pl.ds(iz * TZh, TZh + 8),
                         pl.ds(jx * TXh, TXh + 128)],
            e_tile.at[slot, a], sem_s.at[slot, 4 + a]).wait()

    pr = p_tile[0]
    pi = p_tile[1]
    dr = d_tile[0]
    di = d_tile[1]
    br = bu_tile[slot, 0]
    bi = bu_tile[slot, 1]
    ur = bu_tile[slot, 2]
    ui = bu_tile[slot, 3]

    # prolong the (TZh+2, TXh+2) coarse halo block to fine (TZ+2, TX+2):
    # zero-interleave + separable [0.5, 1, 0.5] tent, expressed as two
    # banded MXU matmuls (see _prolong_mats); interleaved index k maps
    # to fine row (iz*TZ - 1) + (k - 1)
    pz = pz_ref[...]
    pxT = pxT_ref[...]

    def _prolong_part(e_sub):
        t = lax.dot(pz, e_sub, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        return lax.dot(t, pxT, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)  # (TZ+2, TX+2)

    SZ, SX = TZ + 2, TX + 2
    p_re = _prolong_part(e_tile[slot, 0, :TZh + 2, :TXh + 2])
    p_im = _prolong_part(e_tile[slot, 1, :TZh + 2, :TXh + 2])
    m1 = m_tile[:SZ, :SX]
    u1r = ur[:SZ, :SX] + m1 * p_re
    u1i = ui[:SZ, :SX] + m1 * p_im

    # one damped-Jacobi sweep on the output tile; u1's [0, 0] is fine
    # row/col (tile origin - 1)
    acc_r = jnp.zeros((TZ, TX), jnp.float32)
    acc_i = jnp.zeros((TZ, TX), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        wr = u1r[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        wi = u1i[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
        kr = pr[k, 1:1 + TZ, 1:1 + TX]
        ki = pi[k, 1:1 + TZ, 1:1 + TX]
        acc_r += kr * wr - ki * wi
        acc_i += kr * wi + ki * wr
    rr1 = br[1:1 + TZ, 1:1 + TX] - acc_r
    ri1 = bi[1:1 + TZ, 1:1 + TX] - acc_i
    dr1 = dr[1:1 + TZ, 1:1 + TX]
    di1 = di[1:1 + TZ, 1:1 + TX]
    or_ref[0] = u1r[1:1 + TZ, 1:1 + TX] + dr1 * rr1 - di1 * ri1
    oi_ref[0] = u1i[1:1 + TZ, 1:1 + TX] + dr1 * ri1 + di1 * rr1


def _pas_kernel_rb(pz_ref, pxT_ref, pr_hbm, pi_hbm, dr_hbm, di_hbm,
                   mr_hbm, br_hbm, bi_hbm, ur_hbm, ui_hbm, er_hbm,
                   ei_hbm, or_hbm, oi_hbm,
                   p_tile, d_tile, m_tile, bu_tile, e_tile, out_tile,
                   sem_c, sem_s, sem_o,
                   *, TZ, TX, R):
    '''
    Whole-batch variant of ``_pas_kernel``: grid (nz/TZ, nx/TX); each
    program fetches its coefficient windows once and loops ALL R
    right-hand sides (see _apply_kernel_rb for why). b/u/ec stream
    double-buffered; the output stages through a two-slot buffer with
    async write-back.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    TZh, TXh = TZ // 2, TX // 2

    cps = [
        pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)], p_tile.at[0],
            sem_c.at[0]),
        pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)], p_tile.at[1],
            sem_c.at[1]),
        pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_c.at[2]),
        pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_c.at[3]),
        pltpu.make_async_copy(
            mr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            m_tile, sem_c.at[4]),
    ]
    fine = (br_hbm, bi_hbm, ur_hbm, ui_hbm)
    coarse = (er_hbm, ei_hbm)

    def _in_copy(rr, s):
        out = [pltpu.make_async_copy(
            fine[a].at[rr, pl.ds(iz * TZ, TZ + 8),
                       pl.ds(jx * TX, TX + 128)],
            bu_tile.at[s, a], sem_s.at[s, a]) for a in range(4)]
        out += [pltpu.make_async_copy(
            coarse[a].at[rr, pl.ds(iz * TZh, TZh + 8),
                         pl.ds(jx * TXh, TXh + 128)],
            e_tile.at[s, a], sem_s.at[s, 4 + a]) for a in range(2)]
        return out

    def _out_copy(rr, s):
        return [pltpu.make_async_copy(
            out_tile.at[s, a],
            (or_hbm, oi_hbm)[a].at[rr, pl.ds(iz * TZ, TZ),
                                   pl.ds(jx * TX, TX)],
            sem_o.at[s, a]) for a in range(2)]

    for cp in cps:
        cp.start()
    for cp in _in_copy(0, 0):
        cp.start()
    for cp in cps:
        cp.wait()

    pz = pz_ref[...]
    pxT = pxT_ref[...]

    def body(r, carry):
        slot = lax.rem(r, 2)

        @pl.when(r + 1 < R)
        def _():
            for cp in _in_copy(r + 1, 1 - slot):
                cp.start()
        for cp in _in_copy(r, slot):
            cp.wait()

        pr = p_tile[0]
        pi = p_tile[1]
        dr = d_tile[0]
        di = d_tile[1]
        br = bu_tile[slot, 0]
        bi = bu_tile[slot, 1]
        ur = bu_tile[slot, 2]
        ui = bu_tile[slot, 3]

        def _prolong_part(e_sub):
            t = lax.dot(pz, e_sub, preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
            return lax.dot(t, pxT, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)

        SZ, SX = TZ + 2, TX + 2
        p_re = _prolong_part(e_tile[slot, 0, :TZh + 2, :TXh + 2])
        p_im = _prolong_part(e_tile[slot, 1, :TZh + 2, :TXh + 2])
        m1 = m_tile[:SZ, :SX]
        u1r = ur[:SZ, :SX] + m1 * p_re
        u1i = ui[:SZ, :SX] + m1 * p_im

        acc_r = jnp.zeros((TZ, TX), jnp.float32)
        acc_i = jnp.zeros((TZ, TX), jnp.float32)
        for k, (dz, dx) in enumerate(OFFSETS):
            wr_ = u1r[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
            wi_ = u1i[1 + dz:1 + dz + TZ, 1 + dx:1 + dx + TX]
            kr = pr[k, 1:1 + TZ, 1:1 + TX]
            ki = pi[k, 1:1 + TZ, 1:1 + TX]
            acc_r += kr * wr_ - ki * wi_
            acc_i += kr * wi_ + ki * wr_
        rr1 = br[1:1 + TZ, 1:1 + TX] - acc_r
        ri1 = bi[1:1 + TZ, 1:1 + TX] - acc_i
        dr1 = dr[1:1 + TZ, 1:1 + TX]
        di1 = di[1:1 + TZ, 1:1 + TX]

        @pl.when(r >= 2)
        def _():
            for cp in _out_copy(r - 2, slot):
                cp.wait()
        out_tile[slot, 0] = u1r[1:1 + TZ, 1:1 + TX] \
            + dr1 * rr1 - di1 * ri1
        out_tile[slot, 1] = u1i[1:1 + TZ, 1:1 + TX] \
            + dr1 * ri1 + di1 * rr1
        for cp in _out_copy(r, slot):
            cp.start()
        return carry

    lax.fori_loop(0, R, body, 0)
    for r in range(max(R - 2, 0), R):
        for cp in _out_copy(r, r % 2):
            cp.wait()


@partial(jax.jit, static_argnames=('interpret',))
def prolong_add_smooth_pallas_batched(planes, dinv_eff, mask, b, u, ec,
                                      interpret=False):
    '''
    Fused V-cycle upstroke for a (R, nz, nx) complex64 batch:
    u' = one damped-Jacobi sweep of (u + mask * prolong(ec)) against b,
    in whole-batch tile programs (see _pas_kernel_rb).
    ec is the (R, nz/2, nx/2) coarse correction. No AD rules.
    '''

    nz, nx = b.shape[-2:]
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)

    pad2 = ((0, 0), (1, 7), (1, 127))
    pr = jnp.pad(jnp.real(planes).astype(jnp.float32),
                 ((0, 0), (1, 7), (1, 127)))
    pi = jnp.pad(jnp.imag(planes).astype(jnp.float32),
                 ((0, 0), (1, 7), (1, 127)))
    dr = jnp.pad(jnp.real(dinv_eff).astype(jnp.float32), ((1, 7), (1, 127)))
    di = jnp.pad(jnp.imag(dinv_eff).astype(jnp.float32), ((1, 7), (1, 127)))
    mr = jnp.pad(jnp.real(mask).astype(jnp.float32), ((1, 7), (1, 127)))
    bp = jnp.pad(b, pad2)
    up = jnp.pad(u, pad2)
    ep = jnp.pad(ec, pad2)

    R = b.shape[0]
    Pz, PxT = _prolong_mats(TZ, TX)
    kernel = partial(_pas_kernel_rb, TZ=TZ, TX=TX, R=R)
    out_r, out_i = pl.pallas_call(
        kernel,
        grid=(nz // TZ, nx // TX),
        in_specs=[
            pl.BlockSpec(Pz.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(PxT.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 11,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((R, nz, nx), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 9, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 4, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ // 2 + 8, TX // 2 + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ, TX), jnp.float32),     # out staging
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(jnp.asarray(Pz), jnp.asarray(PxT), pr, pi, dr, di, mr,
      jnp.real(bp).astype(jnp.float32), jnp.imag(bp).astype(jnp.float32),
      jnp.real(up).astype(jnp.float32), jnp.imag(up).astype(jnp.float32),
      jnp.real(ep).astype(jnp.float32), jnp.imag(ep).astype(jnp.float32))
    return lax.complex(out_r, out_i)


def pallas_pas_applicable(planes, b, ec):
    'Whether the fused upstroke kernel supports these shapes/dtypes.'

    if planes.ndim != 3 or b.ndim != 3 or ec.ndim != 3:
        return False
    nz, nx = b.shape[-2:]
    if ec.shape[-2:] != (nz // 2, nx // 2) or nz % 2 or nx % 2:
        return False
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)
    # the coarse windows start at (iz*TZ/2, jx*TX/2): Mosaic needs
    # (8, 128)-aligned DMA starts, so TZ/2 and TX/2 must stay aligned
    return (nz % TZ == 0 and nx % TX == 0 and TZ % 16 == 0
            and TX % 256 == 0 and nz >= 16 and nx >= 256
            and planes.dtype == jnp.complex64 and b.dtype == jnp.complex64)


# ---------------------------------------------------------------------------
# Fused downstroke WITH restriction: two from-zero damped-Jacobi sweeps,
# the masked residual on a halo-1 block, and the full-weighting
# restriction of that residual (as banded MXU matmuls) — the V-cycle's
# complete fine-level downstroke INCLUDING the transfer, in one pass.
# Replaces presmooth+residual kernel + restrict kernel and saves the
# residual's HBM round-trip.
# ---------------------------------------------------------------------------


def _restrict_resm_mats(TZ, TX):
    'Banded tent-decimation matrices for a (TZ+2, TX+2) halo-1 window.'

    W = (0.5, 1.0, 0.5)
    TZc, TXc = TZ // 2, TX // 2
    Rz = np.zeros((TZc, TZ + 2), np.float32)
    for I in range(TZc):
        for a in (-1, 0, 1):
            Rz[I, 2 * I + a + 1] = 0.5 * W[a + 1]
    RxT = np.zeros((TX + 2, TXc), np.float32)
    for J in range(TXc):
        for b in (-1, 0, 1):
            RxT[2 * J + b + 1, J] = 0.5 * W[b + 1]
    return Rz, RxT


def _ps2rr_kernel(rz_ref, rxT_ref, pr_hbm, pi_hbm, dr_hbm, di_hbm, mr_hbm,
                  br_hbm, bi_hbm,
                  ur_ref, ui_ref, cr_ref, ci_ref,
                  p_tile, d_tile, m_tile, bu_tile, sem_p, sem_bu,
                  *, TZ, TX):
    '''
    Grid (nz/TZ, nx/TX, R). All fine inputs padded ((3, 5), (3, 125)) so
    each (TZ+8, TX+128) window carries a >= 3-cell halo. u1 = D b on the
    halo-3 block, u2 = u1 + D (b - A u1) on the halo-2 block,
    resm = mask * (b - A u2) on the halo-1 block, rc = Rz resm Rx^T
    (full-weighting restriction) on the (TZ/2, TX/2) coarse tile.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    r = pl.program_id(2)
    nJ = pl.num_programs(1)
    nR = pl.num_programs(2)
    total = pl.num_programs(0) * nJ * nR
    step = (iz * nJ + jx) * nR + r
    slot = lax.rem(step, jnp.int32(2))
    nslot = 1 - slot

    @pl.when(r == 0)
    def _():
        cp0 = pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[0], sem_p.at[0])
        cp1 = pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            p_tile.at[1], sem_p.at[1])
        cd0 = pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_p.at[2])
        cd1 = pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_p.at[3])
        cm = pltpu.make_async_copy(
            mr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            m_tile, sem_p.at[4])
        cp0.start(); cp1.start(); cd0.start(); cd1.start(); cm.start()
        cp0.wait(); cp1.wait(); cd0.wait(); cd1.wait(); cm.wait()

    hbm = (br_hbm, bi_hbm)

    def _start(rr_i, zz, xx, s):
        for a in range(2):
            pltpu.make_async_copy(
                hbm[a].at[rr_i, pl.ds(zz * TZ, TZ + 8),
                          pl.ds(xx * TX, TX + 128)],
                bu_tile.at[s, a], sem_bu.at[s, a]).start()

    @pl.when(step == 0)
    def _():
        _start(r, iz, jx, 0)

    nstep = step + 1

    @pl.when(nstep < total)
    def _():
        nr = lax.rem(nstep, jnp.int32(nR))
        t1 = nstep // nR
        njx = lax.rem(t1, jnp.int32(nJ))
        niz = t1 // nJ
        _start(nr, niz, njx, nslot)

    for a in range(2):
        pltpu.make_async_copy(
            hbm[a].at[r, pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            bu_tile.at[slot, a], sem_bu.at[slot, a]).wait()

    pr = p_tile[0]
    pi = p_tile[1]
    dr = d_tile[0]
    di = d_tile[1]
    br = bu_tile[slot, 0]
    bi = bu_tile[slot, 1]

    # sweep 1 from zero on the halo-3 block (TZ+6, TX+6); [0, 0] is
    # fine (tile origin - 3)
    SZ1, SX1 = TZ + 6, TX + 6
    u1r = (dr[:SZ1, :SX1] * br[:SZ1, :SX1]
           - di[:SZ1, :SX1] * bi[:SZ1, :SX1])
    u1i = (dr[:SZ1, :SX1] * bi[:SZ1, :SX1]
           + di[:SZ1, :SX1] * br[:SZ1, :SX1])

    # sweep 2 on the halo-2 block (TZ+4, TX+4); [0, 0] = window [1, 1]
    SZ2, SX2 = TZ + 4, TX + 4
    a1_r = jnp.zeros((SZ2, SX2), jnp.float32)
    a1_i = jnp.zeros((SZ2, SX2), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        wr = u1r[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
        wi = u1i[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
        kr = pr[k, 1:1 + SZ2, 1:1 + SX2]
        ki = pi[k, 1:1 + SZ2, 1:1 + SX2]
        a1_r += kr * wr - ki * wi
        a1_i += kr * wi + ki * wr
    rr1 = br[1:1 + SZ2, 1:1 + SX2] - a1_r
    ri1 = bi[1:1 + SZ2, 1:1 + SX2] - a1_i
    u2r = u1r[1:1 + SZ2, 1:1 + SX2] \
        + dr[1:1 + SZ2, 1:1 + SX2] * rr1 - di[1:1 + SZ2, 1:1 + SX2] * ri1
    u2i = u1i[1:1 + SZ2, 1:1 + SX2] \
        + dr[1:1 + SZ2, 1:1 + SX2] * ri1 + di[1:1 + SZ2, 1:1 + SX2] * rr1

    # masked residual on the halo-1 block (TZ+2, TX+2); u2's [0, 0] is
    # window [1, 1]
    SZ3, SX3 = TZ + 2, TX + 2
    a2_r = jnp.zeros((SZ3, SX3), jnp.float32)
    a2_i = jnp.zeros((SZ3, SX3), jnp.float32)
    for k, (dz, dx) in enumerate(OFFSETS):
        wr = u2r[1 + dz:1 + dz + SZ3, 1 + dx:1 + dx + SX3]
        wi = u2i[1 + dz:1 + dz + SZ3, 1 + dx:1 + dx + SX3]
        kr = pr[k, 2:2 + SZ3, 2:2 + SX3]
        ki = pi[k, 2:2 + SZ3, 2:2 + SX3]
        a2_r += kr * wr - ki * wi
        a2_i += kr * wi + ki * wr
    m3 = m_tile[2:2 + SZ3, 2:2 + SX3]
    resm_r = m3 * (br[2:2 + SZ3, 2:2 + SX3] - a2_r)
    resm_i = m3 * (bi[2:2 + SZ3, 2:2 + SX3] - a2_i)

    ur_ref[0] = u2r[2:2 + TZ, 2:2 + TX]
    ui_ref[0] = u2i[2:2 + TZ, 2:2 + TX]

    rz = rz_ref[...]
    rxT = rxT_ref[...]
    for resm, out in ((resm_r, cr_ref), (resm_i, ci_ref)):
        t = lax.dot(resm, rxT, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
        out[0] = lax.dot(rz, t, preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)


def _ps2rr_kernel_rb(rz_ref, rxT_ref, pr_hbm, pi_hbm, dr_hbm, di_hbm,
                     mr_hbm, br_hbm, bi_hbm,
                     ur_hbm, ui_hbm, cr_hbm, ci_hbm,
                     p_tile, d_tile, m_tile, bu_tile, uo_tile, co_tile,
                     sem_p, sem_bu, sem_o,
                     *, TZ, TX, R, NSWEEPS=2):
    '''
    Whole-batch variant of ``_ps2rr_kernel``: grid (nz/TZ, nx/TX); each
    program fetches its coefficient windows once and loops ALL R
    right-hand sides (same per-program-overhead cure as
    ``_apply_kernel_rb`` — the (tile, RHS) grid paid a fixed ~5-6 us
    of dispatch/DMA latency per program, which dominated the V-cycle's
    fine-level cost at production sizes). b streams double-buffered;
    u2 and rc outputs stage through two-slot buffers with async
    write-back.
    '''

    iz = pl.program_id(0)
    jx = pl.program_id(1)
    TZc, TXc = TZ // 2, TX // 2

    cps = [
        pltpu.make_async_copy(
            pr_hbm.at[:, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)], p_tile.at[0],
            sem_p.at[0]),
        pltpu.make_async_copy(
            pi_hbm.at[:, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)], p_tile.at[1],
            sem_p.at[1]),
        pltpu.make_async_copy(
            dr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[0], sem_p.at[2]),
        pltpu.make_async_copy(
            di_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            d_tile.at[1], sem_p.at[3]),
        pltpu.make_async_copy(
            mr_hbm.at[pl.ds(iz * TZ, TZ + 8), pl.ds(jx * TX, TX + 128)],
            m_tile, sem_p.at[4]),
    ]
    hbm = (br_hbm, bi_hbm)

    def _in_copy(rr, s):
        return [pltpu.make_async_copy(
            hbm[a].at[rr, pl.ds(iz * TZ, TZ + 8),
                      pl.ds(jx * TX, TX + 128)],
            bu_tile.at[s, a], sem_bu.at[s, a]) for a in range(2)]

    def _out_copy(rr, s):
        outs = [pltpu.make_async_copy(
            uo_tile.at[s, a],
            (ur_hbm, ui_hbm)[a].at[rr, pl.ds(iz * TZ, TZ),
                                   pl.ds(jx * TX, TX)],
            sem_o.at[s, a]) for a in range(2)]
        outs += [pltpu.make_async_copy(
            co_tile.at[s, a],
            (cr_hbm, ci_hbm)[a].at[rr, pl.ds(iz * TZc, TZc),
                                   pl.ds(jx * TXc, TXc)],
            sem_o.at[s, 2 + a]) for a in range(2)]
        return outs

    for cp in cps:
        cp.start()
    for cp in _in_copy(0, 0):
        cp.start()
    for cp in cps:
        cp.wait()

    rz = rz_ref[...]
    rxT = rxT_ref[...]

    def body(r, carry):
        slot = lax.rem(r, 2)

        @pl.when(r + 1 < R)
        def _():
            for cp in _in_copy(r + 1, 1 - slot):
                cp.start()
        for cp in _in_copy(r, slot):
            cp.wait()

        pr = p_tile[0]
        pi = p_tile[1]
        dr = d_tile[0]
        di = d_tile[1]
        br = bu_tile[slot, 0]
        bi = bu_tile[slot, 1]

        # sweep 1 from zero on the halo-3 block (TZ+6, TX+6)
        SZ1, SX1 = TZ + 6, TX + 6
        u1r = (dr[:SZ1, :SX1] * br[:SZ1, :SX1]
               - di[:SZ1, :SX1] * bi[:SZ1, :SX1])
        u1i = (dr[:SZ1, :SX1] * bi[:SZ1, :SX1]
               + di[:SZ1, :SX1] * br[:SZ1, :SX1])

        # sweep 2 on the halo-2 block (TZ+4, TX+4); with NSWEEPS=1 the
        # halo-2 restriction of u1 feeds the residual directly
        SZ2, SX2 = TZ + 4, TX + 4
        if NSWEEPS >= 2:
            a1_r = jnp.zeros((SZ2, SX2), jnp.float32)
            a1_i = jnp.zeros((SZ2, SX2), jnp.float32)
            for k, (dz, dx) in enumerate(OFFSETS):
                wr_ = u1r[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
                wi_ = u1i[1 + dz:1 + dz + SZ2, 1 + dx:1 + dx + SX2]
                kr = pr[k, 1:1 + SZ2, 1:1 + SX2]
                ki = pi[k, 1:1 + SZ2, 1:1 + SX2]
                a1_r += kr * wr_ - ki * wi_
                a1_i += kr * wi_ + ki * wr_
            rr1 = br[1:1 + SZ2, 1:1 + SX2] - a1_r
            ri1 = bi[1:1 + SZ2, 1:1 + SX2] - a1_i
            u2r = u1r[1:1 + SZ2, 1:1 + SX2] \
                + dr[1:1 + SZ2, 1:1 + SX2] * rr1 \
                - di[1:1 + SZ2, 1:1 + SX2] * ri1
            u2i = u1i[1:1 + SZ2, 1:1 + SX2] \
                + dr[1:1 + SZ2, 1:1 + SX2] * ri1 \
                + di[1:1 + SZ2, 1:1 + SX2] * rr1
        else:
            u2r = u1r[1:1 + SZ2, 1:1 + SX2]
            u2i = u1i[1:1 + SZ2, 1:1 + SX2]

        # masked residual on the halo-1 block (TZ+2, TX+2)
        SZ3, SX3 = TZ + 2, TX + 2
        a2_r = jnp.zeros((SZ3, SX3), jnp.float32)
        a2_i = jnp.zeros((SZ3, SX3), jnp.float32)
        for k, (dz, dx) in enumerate(OFFSETS):
            wr_ = u2r[1 + dz:1 + dz + SZ3, 1 + dx:1 + dx + SX3]
            wi_ = u2i[1 + dz:1 + dz + SZ3, 1 + dx:1 + dx + SX3]
            kr = pr[k, 2:2 + SZ3, 2:2 + SX3]
            ki = pi[k, 2:2 + SZ3, 2:2 + SX3]
            a2_r += kr * wr_ - ki * wi_
            a2_i += kr * wi_ + ki * wr_
        m3 = m_tile[2:2 + SZ3, 2:2 + SX3]
        resm_r = m3 * (br[2:2 + SZ3, 2:2 + SX3] - a2_r)
        resm_i = m3 * (bi[2:2 + SZ3, 2:2 + SX3] - a2_i)

        @pl.when(r >= 2)
        def _():
            for cp in _out_copy(r - 2, slot):
                cp.wait()
        uo_tile[slot, 0] = u2r[2:2 + TZ, 2:2 + TX]
        uo_tile[slot, 1] = u2i[2:2 + TZ, 2:2 + TX]
        for q, resm in enumerate((resm_r, resm_i)):
            t = lax.dot(resm, rxT, preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST)
            co_tile[slot, q] = lax.dot(
                rz, t, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
        for cp in _out_copy(r, slot):
            cp.start()
        return carry

    lax.fori_loop(0, R, body, 0)
    for r in range(max(R - 2, 0), R):
        for cp in _out_copy(r, r % 2):
            cp.wait()


@partial(jax.jit, static_argnames=('interpret', 'nsweeps'))
def presmooth2_restrict_pallas_batched(planes, dinv_eff, mask, b,
                                        interpret=False, nsweeps=2):
    '''
    The V-cycle's complete fine-level downstroke (``nsweeps`` from-zero
    sweeps, masked residual, full-weighting restriction) for a
    (R, nz, nx) complex64 batch, in one kernel — whole-batch tile
    programs (see _ps2rr_kernel_rb). Returns (u2 (R, nz, nx),
    rc (R, nz/2, nx/2)). No AD rules.
    '''

    nz, nx = b.shape[-2:]
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)
    TZc, TXc = TZ // 2, TX // 2

    pr = jnp.pad(jnp.real(planes).astype(jnp.float32),
                 ((0, 0), (3, 5), (3, 125)))
    pi = jnp.pad(jnp.imag(planes).astype(jnp.float32),
                 ((0, 0), (3, 5), (3, 125)))
    dr = jnp.pad(jnp.real(dinv_eff).astype(jnp.float32), ((3, 5), (3, 125)))
    di = jnp.pad(jnp.imag(dinv_eff).astype(jnp.float32), ((3, 5), (3, 125)))
    mr = jnp.pad(jnp.real(mask).astype(jnp.float32), ((3, 5), (3, 125)))
    bp = jnp.pad(b, ((0, 0), (3, 5), (3, 125)))
    br = jnp.real(bp).astype(jnp.float32)
    bi = jnp.imag(bp).astype(jnp.float32)
    Rz, RxT = _restrict_resm_mats(TZ, TX)

    R = b.shape[0]
    kernel = partial(_ps2rr_kernel_rb, TZ=TZ, TX=TX, R=R,
                     NSWEEPS=nsweeps)
    u2r, u2i, rcr, rci = pl.pallas_call(
        kernel,
        grid=(nz // TZ, nx // TX),
        in_specs=[
            pl.BlockSpec(Rz.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(RxT.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pl.ANY)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((R, nz // 2, nx // 2), jnp.float32),
            jax.ShapeDtypeStruct((R, nz // 2, nx // 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 9, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ + 8, TX + 128), jnp.float32),
            pltpu.VMEM((2, 2, TZ, TX), jnp.float32),     # u2 staging
            pltpu.VMEM((2, 2, TZc, TXc), jnp.float32),   # rc staging
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(jnp.asarray(Rz), jnp.asarray(RxT), pr, pi, dr, di, mr, br, bi)
    return lax.complex(u2r, u2i), lax.complex(rcr, rci)


def pallas_ps2rr_applicable(planes, b):
    'Whether the fused downstroke+restrict kernel supports these shapes.'

    if planes.ndim != 3 or b.ndim != 3:
        return False
    nz, nx = b.shape[-2:]
    if nz % 2 or nx % 2:
        return False
    TZ = _pick_tz(nz, 64)
    TX = _pick_tx(nx)
    # coarse output tiles (TZ/2, TX/2) must stay (8, 128)-aligned
    return (nz % TZ == 0 and nx % TX == 0 and TZ % 16 == 0
            and TX % 256 == 0 and nz >= 16 and nx >= 256
            and planes.dtype == jnp.complex64 and b.dtype == jnp.complex64)
