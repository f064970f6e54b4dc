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

    def timeit(label, fn, *args, reps=10, traffic=None):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        line = '%-28s %8.2f ms' % (label, t * 1e3)
        if traffic is not None:
            line += '   %7.1f GB/s (modeled %d MB)' % (
                traffic / t / 1e9, traffic / 1e6)
        print(line, flush=True)
        return t

    # 1. matvec: batched fused stencil apply over all 16 RHS
    def mv_all(v):
        return jax.vmap(lambda vi:
                        apply_block_stencil_fast(op.planes, vi))(v)

    mv_rio = realio_jit(mv_all)
    # traffic: 9 complex planes read once per RHS pass (amortized across
    # the batch inside one fused kernel is NOT what vmap gives us — each
    # RHS re-reads the planes) + in/out fields
    t_mv = timeit('matvec x%d' % nsrc, mv_rio, b,
                  traffic=nsrc * (9 * FB + 2 * FB))

    # 1b. the stratified PCR interior solve alone (x-FFT + precomputed
    # cyclic-reduction sweep + inverse FFT at the half grid) — the
    # modeled-traffic audit: each PCR level re-reads and re-writes the
    # RHS (no fusion across levels), so its REAL traffic is
    # ~nsteps x (r/w + bf16 factors) at the half grid, far above the
    # 1.5F the roofline model books
    from zephyr_tpu.solver.stratified import stratified_apply
    nzh = op.strat.dinv.shape[-2] if op.strat is not None else 0
    if op.strat is not None:
        import numpy as _np

        def strat_all(v):
            # apply at the spectral-solve resolution (fft_scale=2:
            # half grid)
            return jax.vmap(lambda vi: stratified_apply(op.strat,
                                                        vi))(v)

        bh = realio_jit(lambda p: jnp.zeros((nsrc, 1, nzh,
                                             op.strat.dinv.shape[-1]),
                                            jnp.complex64))(b)
        Fh = nzh * op.strat.dinv.shape[-1] * 8
        nsteps = int(_np.ceil(_np.log2(max(nzh, 2))))
        strat_rio = realio_jit(strat_all)
        timeit('strat PCR+FFT x%d' % nsrc, strat_rio, bh,
               traffic=nsrc * (nsteps * (2 + 0.5) + 4) * Fh)

    # 2. preconditioner application (the V-cycle hybrid)
    M = _make_precond(op, cfg)

    def prec_all(v):
        return jax.vmap(M)(v)

    prec_rio = realio_jit(prec_all)
    t_pc = timeit('precond x%d' % nsrc, prec_rio, b,
                  traffic=nsrc * 22 * FB)

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
