'''
Per-component TPU wall-clock breakdown of the headline solve.

Times, at the bench configuration (2048^2 hom, 16 RHS, chunk 16):
  - the fused stencil matvec alone
  - the hybrid preconditioner application alone
  - one full BiCGStab chunk (16 iterations)
and converts each to achieved HBM GB/s against the modeled traffic, so
the gap between bw_util(component) and bw_util(whole solve) localizes
where the bandwidth goes (kernel inefficiency vs dispatch/reduction
stalls between kernels).

Usage:  python tools/profile_components.py [N [NSRC]]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nsrc = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    chunk = 16

    import jax
    import jax.numpy as jnp
    from zephyr_tpu.core.realio import realio_jit
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.ops.stencil import apply_block_stencil_fast
    from zephyr_tpu.solver.helmholtz import (prepare_operator,
                                             make_chunked_solver,
                                             _make_precond,
                                             shifted_velocity,
                                             SolverConfig)

    cval = 1500.0
    freq = cval / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       hybrid_comp='fused', mg_nu1=2, mg_nu2=1)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    c_real = cval * np.ones((n, n), dtype=np.float32)
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0,
                    pos[:, 0], pos[:, 1]].set(1.0 + 0.0j)

    rng = np.random.default_rng(0)
    pos = rng.integers(n // 8, 7 * n // 8,
                       size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(jnp.asarray(pos))

    FB = n * n * 8  # one complex64 field in bytes

    def _sync(out):
        '''
        Force completion with a SCALAR host fetch: on the axon runtime
        ``block_until_ready`` returns without waiting for remoted
        computations (observed: 0.16 ms "matvec" at 2048^2 x16), so the
        only reliable fence is fetching data that depends on the result.
        Device ops execute in order, so summing one leaf waits for the
        whole dispatched program.
        '''

        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, 'dtype')]
        return float(np.asarray(jnp.sum(
            leaves[0].astype(jnp.float32).ravel()[:8])))

    def timeit(label, fn, *args, reps=5, traffic=None):
        out = fn(*args)
        _sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _sync(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        line = '%-28s %8.2f ms' % (label, t * 1e3)
        if traffic is not None:
            line += '   %7.1f GB/s (modeled %d MB)' % (
                traffic / t / 1e9, traffic / 1e6)
        print(line, flush=True)
        return t

    # NOTE: ``op`` is a device-resident C-pair tree; every timed
    # function takes it as an ARGUMENT so realio_jit joins the pairs
    # inside the jit boundary (a closure would capture raw C pairs).
    # Every stage loops LOOPN times inside ONE device program
    # (lax.fori_loop feeding output back to input) so the tunnel's
    # ~20 ms per-dispatch latency amortizes away.
    from jax import lax as _lax
    LOOPN = 8

    def _loop(body):
        def looped(op_in, v):
            return _lax.fori_loop(0, LOOPN, lambda i, x: body(op_in, x),
                                  v)
        return looped

    # 1. matvec: batched fused stencil apply over all 16 RHS
    def mv_all(op_in, v):
        return jax.vmap(lambda vi:
                        apply_block_stencil_fast(op_in.planes, vi))(v)

    mv_rio = realio_jit(_loop(mv_all))
    t_mv = timeit('matvec x%d' % nsrc, mv_rio, op, b,
                  traffic=LOOPN * nsrc * (9 * FB / nsrc + 2 * FB))

    # 1a. the repack glue alone: every Pallas kernel call pads the
    # complex field and splits it to f32 re/im pairs on the way in and
    # recombines on the way out — XLA passes with full-field traffic
    # that the kernel-centric view never sees
    def glue_one(op_in, v):
        up = jnp.pad(v, ((0, 0), (0, 0), (1, 7), (1, 127)))
        ur = jnp.real(up).astype(jnp.float32)
        ui = jnp.imag(up).astype(jnp.float32)
        return _lax.complex(ur, ui)[..., 1:-7, 1:-127] + 0.25 * v

    timeit('repack glue (pad+split+join)',
           realio_jit(_loop(glue_one)), op, b,
           traffic=LOOPN * nsrc * 6 * FB)

    # 1b. the stratified PCR interior solve alone (x-FFT + precomputed
    # cyclic-reduction sweep + inverse FFT at the half grid), plus its
    # separated sub-stages (FFT only / PCR sweep only)
    from zephyr_tpu.solver.stratified import stratified_apply, pcr_apply
    op_host_strat = op.strat  # C-pair view, only for shapes
    if op_host_strat is not None:
        import numpy as _np
        nzh, nxh = op_host_strat.dinv.re.shape[-2:] \
            if hasattr(op_host_strat.dinv, 're') \
            else op_host_strat.dinv.shape[-2:]

        def half_input(op_in, v):
            # real data at the half-grid shape (derived from b, NOT
            # zeros: constants fold at compile time)
            return v[..., :nzh, :nxh] + 0.1

        def strat_one(op_in, v):
            return jax.vmap(lambda vi: stratified_apply(op_in.strat,
                                                        vi))(v)

        def strat_all(op_in, v):
            return _lax.fori_loop(
                0, LOOPN, lambda i, x: strat_one(op_in, x),
                half_input(op_in, v))

        Fh = nzh * nxh * 8
        nsteps = int(_np.ceil(_np.log2(max(nzh, 2))))
        timeit('strat PCR+FFT x%d' % nsrc, realio_jit(strat_all), op, b,
               traffic=LOOPN * nsrc * (nsteps * 0.5 + 2 + 4) * Fh)

        def fft_all(op_in, v):
            return _lax.fori_loop(
                0, LOOPN,
                lambda i, x: jnp.fft.ifft(jnp.fft.fft(x, axis=-1),
                                          axis=-1),
                half_input(op_in, v))

        timeit('  x-FFT+iFFT x%d' % nsrc, realio_jit(fft_all), op, b,
               traffic=LOOPN * nsrc * 4 * Fh)

        def pcr_all(op_in, v):
            return _lax.fori_loop(
                0, LOOPN,
                lambda i, x: jax.vmap(lambda vi: pcr_apply(op_in.strat,
                                                           vi))(x),
                half_input(op_in, v))

        timeit('  PCR sweep x%d' % nsrc, realio_jit(pcr_all), op, b,
               traffic=LOOPN * nsrc * (2 + nsteps * 0.5) * Fh)

    # 1c. V-cycle pieces at the fine grid (the fused hybrid's stages):
    # down+up is a loopable fine->fine unit; adding the coarse V-cycle
    # between them gives the full 'mg' preconditioner, so the coarse
    # tail cost is (mg − down+up)
    from zephyr_tpu.solver.multigrid import (presmooth_restrict,
                                             prolong_add_smooth, v_cycle)

    def downup_one(op_in, v):
        lvl0 = op_in.hier.levels[0]
        u, rc = jax.vmap(lambda vi: presmooth_restrict(
            lvl0, vi, cfg.mg_omega, cfg.mg_nu1))(v)
        return jax.vmap(lambda ui, bi, ei: prolong_add_smooth(
            lvl0, ui, bi, ei, cfg.mg_omega, cfg.mg_nu2))(u, v, rc)

    t_downup = timeit('fine down+up', realio_jit(_loop(downup_one)),
                      op, b, traffic=LOOPN * nsrc * 6 * FB)

    def mgfull_one(op_in, v):
        return jax.vmap(lambda vi: v_cycle(
            op_in.hier, vi, omega=cfg.mg_omega, nu1=cfg.mg_nu1,
            nu2=cfg.mg_nu2, coarse_iters=cfg.mg_coarse_iters))(v)

    timeit('full v-cycle (all levels)', realio_jit(_loop(mgfull_one)),
           op, b, traffic=LOOPN * nsrc * 8 * FB)

    # 2. preconditioner application (the fused hybrid)
    def prec_one(op_in, v):
        M = _make_precond(op_in, cfg)
        return jax.vmap(M)(v)

    t_pc = timeit('precond x%d' % nsrc, realio_jit(_loop(prec_one)),
                  op, b, traffic=LOOPN * nsrc * 22 * FB)
    t_mv, t_pc = t_mv / LOOPN, t_pc / LOOPN

    # 3. one full chunk (chunk BiCGStab iterations, batched)
    solver = make_chunked_solver(cfg, chunk=chunk)
    x, iters, relres = solver(op, b, max_chunks=1)
    jax.block_until_ready(x)

    def one_chunk():
        return solver(op, b, max_chunks=1)

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = one_chunk()
        jax.block_until_ready(out[0])
        ts.append(time.perf_counter() - t0)
    t_chunk = min(ts)
    per_iter = t_chunk / chunk
    print('%-28s %8.2f ms  (%.2f ms/iter)' % (
        'bicgstab chunk(%d)' % chunk, t_chunk * 1e3, per_iter * 1e3),
        flush=True)

    # decomposition: BiCGStab does 2 matvecs + 2 precond apps per
    # iteration plus ~5 dots/norms and ~6 axpys over the RHS batch
    t_mv_share = 2 * t_mv
    t_pc_share = 2 * t_pc
    rest = per_iter - t_mv_share - t_pc_share
    print()
    print('per-iteration budget:')
    print('  2x matvec   %7.2f ms (%4.1f%%)' % (
        t_mv_share * 1e3, 100 * t_mv_share / per_iter))
    print('  2x precond  %7.2f ms (%4.1f%%)' % (
        t_pc_share * 1e3, 100 * t_pc_share / per_iter))
    print('  vector ops  %7.2f ms (%4.1f%%)  <- dots/axpys/residual'
          % (rest * 1e3, 100 * rest / per_iter))


if __name__ == '__main__':
    main()
