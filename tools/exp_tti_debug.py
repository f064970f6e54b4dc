'''
Numerics probe for the Eurus TTI block path: build the 128^2 layered
block operator, apply the matvec and the preconditioner to fixed
pseudo-random inputs, and dump the outputs to an .npz — run once per
platform / Pallas setting and diff the dumps to localize where the TPU
block solve diverges (round-4 finding: layered TTI diverges on TPU at
128^2 where CPU converges in 84 iterations).

Usage:
  python tools/exp_tti_debug.py out_cpu.npz                # CPU
  EXP_TPU=1 python tools/exp_tti_debug.py out_tpu.npz      # TPU+Pallas
  EXP_TPU=1 ZEPHYR_TPU_NO_PALLAS=1 python tools/exp_tti_debug.py \
      out_tpu_nopallas.npz

  python tools/exp_tti_debug.py --diff a.npz b.npz
'''

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np


def main_diff(fa, fb):
    a = np.load(fa)
    b = np.load(fb)
    for k in a.files:
        if k not in b.files:
            print('%-18s missing in %s' % (k, fb))
            continue
        x, y = a[k], b[k]
        d = np.linalg.norm((x - y).ravel())
        n = max(np.linalg.norm(y.ravel()), 1e-30)
        fx = np.isfinite(x).all()
        fy = np.isfinite(y).all()
        print('%-18s rel=%.3e  finite=%s/%s  |a|=%.3e |b|=%.3e'
              % (k, d / n, fx, fy, np.abs(x).max(), np.abs(y).max()))


def main_dump(out):
    import jax
    if os.environ.get('EXP_TPU', '0') != '1':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    from zephyr_tpu.core.realio import realio_jit, join_complex_host
    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    from zephyr_tpu.ops.stencil import apply_block_stencil
    from zephyr_tpu.solver.helmholtz import (SolverConfig,
                                             prepare_operator,
                                             _make_precond,
                                             shifted_velocity)
    from bench import _layered_c

    n = int(os.environ.get('EXP_N', 128))
    freq = 1500.0 / 16.0
    cfg = SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                       mg_min_size=32, fft_mode='strat', fft_scale=2,
                       gmres_restart=20, mg_nu1=1, mg_nu2=1)
    c_np = _layered_c(n, np.float32)

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        aniso = dict(theta=jnp.full((n, n), 0.3, jnp.float32),
                     eps=jnp.full((n, n), 0.2, jnp.float32),
                     delta=jnp.full((n, n), 0.1, jnp.float32))
        planes = eurus_planes(c, rho, freq, **aniso)
        pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho,
                               freq, pml_cap=cfg.pml_cap, **aniso)
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    # every host<->device crossing is a re/im pair (realio): the axon
    # TPU runtime computes complex fine but cannot TRANSFER complex
    # arrays, and this tool's whole point is to run on that backend
    op = realio_jit(prep_fn)(jnp.asarray(c_np))   # device C-pair tree

    rng = np.random.default_rng(7)
    x_np = (rng.standard_normal((1, 2, n, n))
            + 1j * rng.standard_normal((1, 2, n, n))).astype(np.complex64)

    def mv_fn(op_in, u):
        return apply_block_stencil(op_in.planes, u)

    ax = realio_jit(mv_fn, host_output=True)(op, x_np)

    def mx_fn(op_in, u):
        return _make_precond(op_in, cfg)(u)

    mx = realio_jit(mx_fn, host_output=True)(op, x_np)

    # one left-preconditioned Richardson step: x - M(A x - x) exercises
    # the full outer-iteration data path
    def rich_fn(op_in, u):
        M = _make_precond(op_in, cfg)
        return u - M(apply_block_stencil(op_in.planes, u) - u)

    rich = realio_jit(rich_fn, host_output=True)(op, x_np)

    # host materialization of the operator parts: join the C pairs on
    # the host from their (transferable) real planes
    op_host = join_complex_host(op)
    out_d = {'Ax': ax, 'Mx': mx, 'rich': rich,
             'planes': np.asarray(op_host.planes)}
    if getattr(op_host, 'strat', None) is not None:
        s = op_host.strat
        for f in s._fields:
            v = getattr(s, f)
            try:
                out_d['strat_' + f] = np.asarray(v, dtype=np.complex64
                                                 if np.iscomplexobj(v)
                                                 else np.float32)
            except Exception:
                pass
    np.savez(out, **out_d)
    print('wrote', out, 'backend', jax.default_backend())
    for k, v in out_d.items():
        print('  %-14s %s finite=%s max=%.3e'
              % (k, v.shape, np.isfinite(v).all()
                 if np.issubdtype(v.dtype, np.number) else '-',
                 np.abs(v).max() if np.issubdtype(v.dtype, np.number)
                 else 0))


if __name__ == '__main__':
    if sys.argv[1] == '--diff':
        main_diff(sys.argv[2], sys.argv[3])
    else:
        main_dump(sys.argv[1])
