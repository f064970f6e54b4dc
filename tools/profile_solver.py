'''
Per-component wall-clock profile of the Helmholtz solve on the current
default device (TPU under axon, or CPU), at the BASELINE north-star
configuration. Each component is jitted and looped on device
(lax.fori_loop) to amortize the ~27 ms tunnel dispatch latency.

Usage: python tools/profile_solver.py [N] [NSRC] [REPS]
'''

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NSRC = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
FFT_MODE = sys.argv[4] if len(sys.argv) > 4 else 'strat'
FFT_SCALE = int(sys.argv[5]) if len(sys.argv) > 5 else 2

cache_dir = os.environ.get('ZT_JAX_CACHE', '/tmp/zephyr_tpu_jaxcache')
try:
    if jax.default_backend() in ('tpu', 'axon'):
        # TPU-only: /tmp cache can survive snapshot/restore onto a host
        # with different CPU features; XLA:CPU then loads foreign AOT
        # results (SIGILL risk). TPU executables are host-agnostic.
        jax.config.update('jax_compilation_cache_dir',
                          os.environ.get('ZT_JAX_CACHE',
                                         '/tmp/zephyr_tpu_jaxcache'))
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
except Exception:
    pass

from zephyr_tpu.core.realio import realio_jit
from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
from zephyr_tpu.solver.helmholtz import (SolverConfig, prepare_operator,
                                         shifted_velocity, _make_precond)
from zephyr_tpu.solver.multigrid import v_cycle, restrict, prolong
from zephyr_tpu.ops.stencil import apply_block_stencil_fast


def _fetch(out):
    '''
    Force full materialization: block_until_ready does not reliably block
    on the experimental axon runtime, so fetch a host scalar instead.
    '''

    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jnp.real(jnp.sum(leaves[0]))))


def timeit(name, fn, *args):
    _fetch(fn(*args))                      # warm-up / compile
    t0 = time.time()
    _fetch(fn(*args))
    dt = (time.time() - t0) / REPS
    print('%-34s %8.2f ms' % (name, 1e3 * dt), flush=True)
    return dt


def loop(fn):
    'Apply fn REPS times on device, threading the field argument.'
    def run(x, *rest):
        def body(_, x):
            return fn(x, *rest)
        return lax.fori_loop(0, REPS, body, x)
    return run


def main():
    cval = 1500.0
    freq = cval / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode=FFT_MODE,
                       fft_scale=FFT_SCALE)
    print('config: fft_mode=%s fft_scale=%d' % (FFT_MODE, FFT_SCALE),
          flush=True)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg, with_transpose=False)

    c_real = cval * np.ones((N, N), dtype=np.float32)
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    rng = np.random.default_rng(0)
    u_np = rng.standard_normal((NSRC, 1, N, N)).astype(np.float32)

    def make_u(u_r):
        return u_r.astype(jnp.complex64)

    u = realio_jit(make_u)(jnp.asarray(u_np))

    # dispatch + fetch overhead baseline (subtract from everything)
    null = realio_jit(lambda u: loop(lambda x: x * 1.000001)(u))
    timeit('null (dispatch+fetch)/REPS', null, u)

    # ---- components (all batch NSRC) ----
    mv = realio_jit(lambda u, op: loop(
        lambda x: jax.vmap(lambda xi: apply_block_stencil_fast(
            op.planes, xi))(x))(u))
    t_mv = timeit('stencil matvec', mv, u, op)

    if op.fft_sinv is not None:
        def fftpair(u, op):
            def one(x):
                R = jnp.fft.fft2(x)
                return jnp.fft.ifft2(op.fft_sinv[0, 0] * R)
            return loop(lambda x: jax.vmap(one)(x))(u)
        timeit('FFT pair + sinv mult', realio_jit(fftpair), u, op)
    if op.strat is not None:
        from zephyr_tpu.solver.stratified import stratified_apply

        def strat_apply(u, op):
            snz, snx = op.strat.dinv.shape[-2:]

            def one(x):
                if (snz, snx) != x.shape[-2:]:
                    rc = restrict(x)
                    return prolong(stratified_apply(op.strat, rc), N, N)
                return stratified_apply(op.strat, x)
            return loop(lambda x: jax.vmap(one)(x))(u)
        timeit('strat P (PCR + transfers)', realio_jit(strat_apply), u, op)

    def vc(u, op):
        def one(x):
            return v_cycle(op.hier, x, omega=cfg.mg_omega, nu1=cfg.mg_nu1,
                           nu2=cfg.mg_nu2, coarse_iters=cfg.mg_coarse_iters)
        return loop(lambda x: jax.vmap(one)(x))(u)
    t_vc = timeit('V-cycle', realio_jit(vc), u, op)

    def transfer(u, op):
        def one(x):
            rc = restrict(x)
            return prolong(rc, N, N) + x
        return loop(lambda x: jax.vmap(one)(x))(u)
    t_tr = timeit('restrict+prolong (fine level)', realio_jit(transfer),
                  u, op)

    def smooth1(u, op):
        from zephyr_tpu.ops.stencil import jacobi_sweep_fast
        lvl = op.hier.levels[0]
        dinv_eff = cfg.mg_omega * lvl.dinv[0, 0]

        def one(x):
            u0 = jacobi_sweep_fast(lvl.planes[0, 0], dinv_eff,
                                   x[0], x[0])
            return u0[None]
        return loop(lambda x: jax.vmap(one)(x))(u)
    t_sm = timeit('1 Jacobi sweep (fine level)', realio_jit(smooth1), u, op)

    def precond(u, op):
        M = _make_precond(op, cfg)
        return loop(lambda x: jax.vmap(M)(x))(u)
    t_pc = timeit('full precond M', realio_jit(precond), u, op)

    def axpydot(u, op):
        def one(x):
            a = jnp.vdot(x, x)
            return x * (a / (jnp.abs(a) + 1.0))
        return loop(lambda x: jax.vmap(one)(x))(u)
    t_ax = timeit('vdot + axpy', realio_jit(axpydot), u, op)

    # one full BiCGStab iteration = 2 mv + 2 M + ~4 dots + ~6 axpy
    est = 2 * t_mv + 2 * t_pc + 2.5 * t_ax
    print('%-34s %8.2f ms' % ('est. per BiCGStab iteration', 1e3 * est))

    from zephyr_tpu.solver.helmholtz import make_chunked_solver
    solver = make_chunked_solver(cfg, chunk=16)

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, N, N), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    pos = rng.integers(N // 8, 7 * N // 8, size=(NSRC, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(jnp.asarray(pos))
    x, iters, relres = solver(op, b)   # warm-up
    t0 = time.time()
    x, iters, relres = solver(op, b)
    t_full = time.time() - t0
    print('%-34s %8.2f ms  (%d iters, relres %.1e, %.2f solves/s)'
          % ('full chunked solve', 1e3 * t_full, iters, relres,
             NSRC / t_full))
    print('measured per-iteration:            %8.2f ms'
          % (1e3 * t_full / max(iters, 1)))


if __name__ == '__main__':
    main()
