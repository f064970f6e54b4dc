'''
In-process TPU-vs-CPU bisection of the Eurus TTI block solve: computes
each component of the block preconditioned solve on the default (TPU)
backend AND on the host CPU backend of the SAME process, printing the
relative difference after every step (flushed immediately, so a hang
still leaves the completed comparisons on stdout).

Round-4 context: layered/iso TTI diverges on TPU at 128^2 (relres
1e2..1e18 / nan) where CPU converges in 40-200 iterations, with Pallas
disabled too — so some jnp-level block component computes differently
on TPU. Scalar solves converge on TPU.

Usage: python tools/exp_tti_bisect.py [n]   (TPU required)
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bench import _layered_c

N = int(sys.argv[1]) if len(sys.argv) > 1 else 64
WAVELEN = 16.0


def rel(a, b):
    a = np.asarray(a).astype(np.complex128)
    b = np.asarray(b).astype(np.complex128)
    d = np.linalg.norm((a - b).ravel())
    n = max(np.linalg.norm(b.ravel()), 1e-300)
    return d / n


def both(tag, fn, *args):
    'Run fn on TPU and CPU backends; print the relative difference.'
    from zephyr_tpu.core.realio import realio_jit
    cpu = jax.devices('cpu')[0]
    # default-backend branch: complex inputs/outputs cross the
    # host<->device boundary as re/im pairs (the axon TPU runtime
    # computes complex fine but cannot TRANSFER complex arrays —
    # core/realio.py; a direct jnp.asarray/np.asarray would fail at
    # first materialization on the backend this tool exists to debug)
    out_t = jax.tree.map(np.asarray, realio_jit(fn, host_output=True)(
        *args))
    with jax.default_device(cpu):
        args_c = [jnp.asarray(np.asarray(a)) for a in args]
        out_c = jax.tree.map(np.asarray, jax.jit(fn)(*args_c))
    flat_t = jax.tree.leaves(out_t)
    flat_c = jax.tree.leaves(out_c)
    rels = [rel(t, c) for t, c in zip(flat_t, flat_c)]
    fin = all(np.isfinite(t).all() for t in flat_t
              if np.issubdtype(np.asarray(t).dtype, np.number))
    print('%-26s rel=%s finite(tpu)=%s' % (
        tag, '/'.join('%.2e' % r for r in rels[:6]), fin), flush=True)
    return out_t, out_c


def main():
    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    from zephyr_tpu.ops.stencil import _apply_block_ref, sanitize_planes
    from zephyr_tpu.solver.helmholtz import (SolverConfig,
                                             shifted_velocity)
    from zephyr_tpu.solver import multigrid as mg
    from zephyr_tpu.solver import stratified as st

    print('default backend:', jax.default_backend(), flush=True)
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       gmres_restart=20, mg_nu1=1, mg_nu2=1)
    n = N
    freq = 1500.0 / WAVELEN
    c_np = _layered_c(n, np.float32)
    rng = np.random.default_rng(7)
    x_np = (rng.standard_normal((2, n, n))
            + 1j * rng.standard_normal((2, n, n))).astype(np.complex64)

    def build(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        aniso = dict(theta=jnp.full((n, n), 0.3, jnp.float32),
                     eps=jnp.full((n, n), 0.2, jnp.float32),
                     delta=jnp.full((n, n), 0.1, jnp.float32))
        planes = eurus_planes(c, rho, freq, **aniso)
        pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho,
                               freq, pml_cap=cfg.pml_cap, **aniso)
        return planes, pplanes

    (planes_t, pp_t), (planes_c, pp_c) = both('eurus_planes', build,
                                              c_np)

    # matvec on identical (CPU-built) planes: isolates the apply
    both('apply_block(jnp)', _apply_block_ref, planes_c, x_np)

    # hierarchy build (line states, galerkin, coarse inverse)
    def hier_probe(pp, x):
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='line')
        lvl1 = h.levels[1].planes if len(h.levels) > 1 else h.levels[0].planes
        return {'cinv': h.coarse_inv, 'lvl1': lvl1,
                'vcyc': mg.v_cycle(h, x[None], omega=cfg.mg_omega,
                                   nu1=cfg.mg_nu1, nu2=cfg.mg_nu2)}
    both('hier+vcycle', hier_probe, pp_c, x_np)

    # inside the v-cycle: one line-smoother stage, the coarse dense
    # apply, and the block transfers (mg_only diverges on TPU too, so
    # the culprit is in THIS set, not the stratified solve)
    def vparts_probe(pp, x):
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='line')
        lvl0 = h.levels[0]
        sm1 = mg._smooth(lvl0, jnp.zeros_like(x[None]), x[None],
                         cfg.mg_omega, 1)
        from zephyr_tpu.solver.stratified import pcr_apply_block
        linez = pcr_apply_block(lvl0.linez, x)
        linex = pcr_apply_block(lvl0.linex, jnp.swapaxes(x, -1, -2))
        rc = mg.restrict(x)
        pc = mg.prolong(rc, x.shape[-2], x.shape[-1])
        nzc = h.levels[-1].planes.shape[-2]
        bc = x[:, :nzc, :nzc]
        coarse = mg._coarse_solve(h, bc)
        return {'smooth1': sm1, 'linez': linez, 'linex': linex,
                'restrict': rc, 'prolong': pc, 'coarse': coarse}
    both('vcycle parts', vparts_probe, pp_c, x_np)

    # jacobi-smoother hierarchy: does removing the line smoother fix it?
    def vjac_probe(pp, x):
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='jacobi')
        return mg.v_cycle(h, x[None], omega=cfg.mg_omega,
                          nu1=cfg.mg_nu1, nu2=cfg.mg_nu2)
    both('vcycle jacobi', vjac_probe, pp_c, x_np)

    # stratified block interior solve
    def strat_probe(planes, pp, x):
        L, D, U = st.stratified_coeffs_block(planes, pp, cfg.shift,
                                             cfg.fft_shift)
        pcr = st.pcr_precompute_block(L, D, U)
        xf = jnp.fft.fft(x, axis=-1)
        y = st.pcr_apply_block(pcr, xf)
        return {'L': L, 'y': jnp.fft.ifft(y, axis=-1)}
    both('strat_block', strat_probe, planes_c, pp_c, x_np)

    # one full preconditioner application via _make_precond
    from zephyr_tpu.solver.helmholtz import prepare_operator, _make_precond

    def precond_probe(planes, pp, x):
        op = prepare_operator(planes, pp, cfg, with_transpose=False)
        M = _make_precond(op, cfg)
        return M(x[None])
    both('full_precond', precond_probe, planes_c, pp_c, x_np)

    # two hand-unrolled Arnoldi steps of gmres_cycle's exact ops (plain
    # jacobi-MG preconditioner, CPU-built planes): pinpoints the first
    # quantity that diverges between backends inside the Krylov cycle
    def arnoldi2_probe(planes, pp, x):
        from zephyr_tpu.ops.stencil import apply_block_stencil_fast
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='jacobi')
        Mfn = lambda r: mg.v_cycle(h, r, omega=cfg.mg_omega,
                                   nu1=cfg.mg_nu1, nu2=cfg.mg_nu2)
        mv = lambda v: apply_block_stencil_fast(planes, v)
        q = jnp.zeros((2, n, n), jnp.complex64)
        q = q.at[0, n // 2, n // 3].set(1.0 + 0.0j)
        r0 = q
        beta = jnp.linalg.norm(r0.ravel())
        v0 = r0 / beta.astype(r0.dtype)
        w0 = mv(Mfn(v0))
        h00 = jnp.vdot(v0, w0)
        w0o = w0 - h00 * v0
        h10 = jnp.linalg.norm(w0o.ravel()).astype(r0.dtype)
        v1 = w0o / h10
        w1 = mv(Mfn(v1))
        h01 = jnp.vdot(v0, w1)
        h11 = jnp.vdot(v1, w1)
        w1o = w1 - h01 * v0 - h11 * v1
        return {'w0': w0, 'h00': h00, 'h10': h10, 'v1': v1,
                'w1': w1, 'h01': h01, 'h11': h11, 'w1o': w1o,
                'Mv0': Mfn(v0)}
    both('arnoldi2(jacobi-mg)', arnoldi2_probe, planes_c, pp_c, x_np)

    # gmres_cycle itself with the SAME jacobi-MG setup the unrolled
    # probe used: if this diverges while arnoldi2 matches, the cycle's
    # loop machinery (masked fori + dynamic indexing of the 4D basis
    # stack) is the broken piece on TPU
    def gmres_cycle_probe(planes, pp, x):
        from zephyr_tpu.ops.stencil import apply_block_stencil_fast
        from zephyr_tpu.solver.krylov import gmres_cycle
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='jacobi')
        Mfn = lambda r: mg.v_cycle(h, r, omega=cfg.mg_omega,
                                   nu1=cfg.mg_nu1, nu2=cfg.mg_nu2)
        mv = lambda v: apply_block_stencil_fast(planes, v)
        q = jnp.zeros((2, n, n), jnp.complex64)
        q = q.at[0, n // 2, n // 3].set(1.0 + 0.0j)
        res = gmres_cycle(mv, q, M=Mfn, m=20)
        return {'x': res.x, 'rr': res.relres}
    both('gmres_cycle(jacobi-mg)', gmres_cycle_probe, planes_c, pp_c,
         x_np)

    # the SAME cycle under vmap over a 2-RHS batch (the production
    # chunked path vmaps gmres_cycle; the un-vmapped probe matches
    # backends — if THIS one diverges, the batched 5D basis updates
    # are the TPU-miscompiled piece)
    def vmap_gmres_probe(planes, pp, x):
        from zephyr_tpu.ops.stencil import apply_block_stencil_fast
        from zephyr_tpu.solver.krylov import gmres_cycle
        h = mg.build_hierarchy(pp, min_size=cfg.mg_min_size,
                               coarse=cfg.mg_coarse, smoother='jacobi')
        Mfn = lambda r: mg.v_cycle(h, r, omega=cfg.mg_omega,
                                   nu1=cfg.mg_nu1, nu2=cfg.mg_nu2)
        mv = lambda v: apply_block_stencil_fast(planes, v)
        q = jnp.zeros((2, 2, n, n), jnp.complex64)
        q = q.at[0, 0, n // 2, n // 3].set(1.0 + 0.0j)
        q = q.at[1, 0, n // 3, n // 2].set(1.0 + 0.0j)
        res = jax.vmap(lambda qi: gmres_cycle(mv, qi, M=Mfn, m=20))(q)
        return {'x': res.x, 'rr': res.relres}
    both('vmap gmres_cycle', vmap_gmres_probe, planes_c, pp_c, x_np)

    # 20 GMRES iterations of the real solve path
    from zephyr_tpu.solver.helmholtz import solve_info

    def solve_probe(planes, pp, x):
        op = prepare_operator(planes, pp, cfg, with_transpose=False)
        q = jnp.zeros((1, 2, n, n), jnp.complex64)
        q = q.at[0, 0, n // 2, n // 3].set(1.0 + 0.0j)
        cfg2 = cfg._replace(maxiter=20)
        xx, it, rr = solve_info(op, q, cfg2)
        return {'x': xx, 'rr': rr}
    both('solve20', solve_probe, planes_c, pp_c, x_np)


if __name__ == '__main__':
    main()
