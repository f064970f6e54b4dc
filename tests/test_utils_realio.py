'''
Utility subsystems: the realio complex-transfer boundary, the Pallas
fused stencil kernel (interpret mode), profiling decorators, and
checkpoint/resume.
'''

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zephyr_tpu.core.realio import (C, split_complex, join_complex,
                                    join_complex_host, realio_jit,
                                    device_put_c)


RNG = np.random.default_rng(0)


def test_split_join_roundtrip():
    tree = {'a': RNG.standard_normal(4) + 1j * RNG.standard_normal(4),
            'b': RNG.standard_normal(3),
            'c': 1.5 + 2.5j}
    split = split_complex(tree)
    assert isinstance(split['a'], C)
    assert not isinstance(split['b'], C)
    back = join_complex_host(split)
    assert np.allclose(back['a'], tree['a'])
    assert np.allclose(back['c'], tree['c'])


def test_realio_jit_matches_direct():
    z = RNG.standard_normal((8, 8)) + 1j * RNG.standard_normal((8, 8))

    def fn(x):
        return jnp.exp(x) * (2 + 1j), jnp.real(x).sum()

    direct = fn(jnp.asarray(z))
    wrapped = realio_jit(fn, host_output=True)(z)
    assert np.allclose(wrapped[0], np.asarray(direct[0]))
    assert np.allclose(wrapped[1], np.asarray(direct[1]))


def test_realio_device_pairs_feed_back():
    z = RNG.standard_normal((4, 4)) + 1j * RNG.standard_normal((4, 4))
    stage1 = realio_jit(lambda x: x * 2)          # device C pairs out
    stage2 = realio_jit(lambda x: jnp.sum(jnp.abs(x)), host_output=True)
    out = stage2(stage1(z))
    assert np.allclose(float(out), np.abs(z * 2).sum())


def test_device_put_c():
    z = RNG.standard_normal(8) + 1j * RNG.standard_normal(8)
    pair = device_put_c(z)
    assert isinstance(pair, C)
    assert np.allclose(np.asarray(join_complex(pair)), z)


def test_pallas_stencil_interpret_matches_reference():
    from zephyr_tpu.ops.pallas_stencil import (apply_stencil_pallas,
                                               pallas_applicable)
    from zephyr_tpu.ops.stencil import apply_stencil

    nz, nx = 16, 128
    planes = jnp.asarray(
        (RNG.standard_normal((9, nz, nx))
         + 1j * RNG.standard_normal((9, nz, nx))).astype(np.complex64))
    u = jnp.asarray((RNG.standard_normal((nz, nx))
                     + 1j * RNG.standard_normal((nz, nx))
                     ).astype(np.complex64))
    assert pallas_applicable(planes, u)
    ref = apply_stencil(planes, u)
    out = apply_stencil_pallas(planes, u, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_batched_stencil_interpret_matches_reference():
    from zephyr_tpu.ops.pallas_stencil import (apply_stencil_pallas_batched,
                                               pallas_batched_applicable)
    from zephyr_tpu.ops.stencil import apply_stencil

    R, nz, nx = 3, 16, 128
    planes = jnp.asarray(
        (RNG.standard_normal((9, nz, nx))
         + 1j * RNG.standard_normal((9, nz, nx))).astype(np.complex64))
    u = jnp.asarray((RNG.standard_normal((R, nz, nx))
                     + 1j * RNG.standard_normal((R, nz, nx))
                     ).astype(np.complex64))
    assert pallas_batched_applicable(planes, u)
    ref = jax.vmap(lambda x: apply_stencil(planes, x))(u)
    out = apply_stencil_pallas_batched(planes, u, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_fast_apply_vmap_dispatch_matches_reference():
    'custom_vmap fast path (jnp fallback on CPU) equals the plain apply.'
    from zephyr_tpu.ops.stencil import (apply_block_stencil,
                                        apply_block_stencil_fast)

    R, B, nz, nx = 2, 2, 12, 20
    planes = jnp.asarray(
        RNG.standard_normal((B, B, 9, nz, nx))
        + 1j * RNG.standard_normal((B, B, 9, nz, nx)))
    u = jnp.asarray(RNG.standard_normal((R, B, nz, nx))
                    + 1j * RNG.standard_normal((R, B, nz, nx)))
    ref = jax.vmap(lambda x: apply_block_stencil(planes, x))(u)
    out = jax.vmap(lambda x: apply_block_stencil_fast(planes, x))(u)
    assert float(jnp.abs(out - ref).max()) < 1e-12


def test_pallas_jacobi_sweep_interpret_matches_reference():
    from zephyr_tpu.ops.pallas_stencil import jacobi_sweep_pallas_batched
    from zephyr_tpu.ops.stencil import apply_stencil

    R, nz, nx = 2, 16, 128
    mk = lambda *s: jnp.asarray((RNG.standard_normal(s)
                                 + 1j * RNG.standard_normal(s)
                                 ).astype(np.complex64))
    planes, dinv, b, u = mk(9, nz, nx), mk(nz, nx), mk(R, nz, nx), mk(R, nz, nx)
    ref = u + dinv * (b - jax.vmap(lambda x: apply_stencil(planes, x))(u))
    out = jacobi_sweep_pallas_batched(planes, dinv, b, u, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_presmooth_residual_interpret_matches_reference():
    from zephyr_tpu.ops.pallas_stencil import (
        presmooth2_residual_pallas_batched, pallas_ps2r_applicable)
    from zephyr_tpu.ops.stencil import _ps2r_ref

    R, nz, nx = 2, 16, 128
    mk = lambda *s: jnp.asarray((RNG.standard_normal(s)
                                 + 1j * RNG.standard_normal(s)
                                 ).astype(np.complex64))
    planes, dinv, b = mk(9, nz, nx), mk(nz, nx), mk(R, nz, nx)
    mask = jnp.asarray(RNG.standard_normal((nz, nx)).astype(np.float32))
    assert pallas_ps2r_applicable(planes, b)
    u_ref, r_ref = jax.vmap(lambda bb: _ps2r_ref(planes, dinv, mask, bb))(b)
    u, r = presmooth2_residual_pallas_batched(planes, dinv, mask, b,
                                              interpret=True)
    assert float(jnp.abs(u - u_ref).max() / jnp.abs(u_ref).max()) < 1e-5
    assert float(jnp.abs(r - r_ref).max() / jnp.abs(r_ref).max()) < 1e-5


def test_profiling_decorators():
    from zephyr_tpu.utils import timeIt, count, stats

    @timeIt
    def f(x):
        return x + 1

    @count
    def g(x):
        return x * 2

    for i in range(3):
        f(i)
        g(i)
    st = stats()
    fk = [k for k in st if k.endswith('f')][0]
    gk = [k for k in st if k.endswith('g')][0]
    assert st[fk]['calls'] == 3
    assert st[gk]['calls'] == 3


def test_checkpointer_roundtrip(tmp_path):
    from zephyr_tpu.utils import InversionCheckpointer

    ckpt = InversionCheckpointer(str(tmp_path / 'ckpt'))
    state = {'model': np.arange(12.).reshape(3, 4),
             'misfit': np.array(0.5),
             'block': np.array(2)}
    ckpt.save(3, state)
    ckpt.save(7, {k: v * 2 for k, v in state.items()})
    assert ckpt.steps() == [3, 7]
    step, restored = ckpt.restore()
    assert step == 7
    assert np.allclose(restored['model'], state['model'] * 2)
    step, restored = ckpt.restore(3)
    assert np.allclose(restored['model'], state['model'])


def test_fullwv_model_convention(tmp_path):
    from zephyr_tpu.utils import save_fullwv_model, latest_fullwv_model

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model = 2000. * np.ones((30, 40))
        save_fullwv_model('proj', 1, model)
        save_fullwv_model('proj', 12, model + 100)
        it, fn = latest_fullwv_model('proj')
        assert it == 12 and fn == 'proj12.vp'
        from zephyr_tpu.middleware.segy import SEGYFile
        back = SEGYFile(fn)[:].T
        assert np.allclose(back, model + 100, rtol=1e-6)
    finally:
        os.chdir(cwd)


def test_pallas_block_apply_interpret_matches_reference():
    from zephyr_tpu.ops.pallas_stencil import (
        apply_block_stencil_pallas_batched, pallas_block_applicable)
    from zephyr_tpu.ops.stencil import apply_block_stencil

    R, nz, nx = 3, 16, 128
    planes = jnp.asarray(
        (RNG.standard_normal((2, 2, 9, nz, nx))
         + 1j * RNG.standard_normal((2, 2, 9, nz, nx))).astype(np.complex64))
    u = jnp.asarray((RNG.standard_normal((R, 2, nz, nx))
                     + 1j * RNG.standard_normal((R, 2, nz, nx))
                     ).astype(np.complex64))
    assert pallas_block_applicable(planes, u)
    ref = jax.vmap(lambda x: apply_block_stencil(planes, x))(u)
    out = apply_block_stencil_pallas_batched(planes, u, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_jacobi2_interpret_matches_reference():
    'Fused DOUBLE sweep (and its from-zero variant) vs two jnp sweeps.'
    from zephyr_tpu.ops.pallas_stencil import (jacobi_sweep2_pallas_batched,
                                               pallas_jacobi2_applicable)
    from zephyr_tpu.ops.stencil import apply_stencil

    R, nz, nx = 2, 16, 128
    mk = lambda *s: jnp.asarray((RNG.standard_normal(s)
                                 + 1j * RNG.standard_normal(s)
                                 ).astype(np.complex64))
    planes, dinv, b, u = mk(9, nz, nx), mk(nz, nx), mk(R, nz, nx), mk(R, nz, nx)
    assert pallas_jacobi2_applicable(planes, b)

    def sweep(x):
        return x + dinv * (b - jax.vmap(lambda q: apply_stencil(planes, q))(x))

    ref = sweep(sweep(u))
    out = jacobi_sweep2_pallas_batched(planes, dinv, b, u, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5

    ref0 = sweep(dinv * b)
    out0 = jacobi_sweep2_pallas_batched(planes, dinv, b, None, interpret=True)
    assert float(jnp.abs(out0 - ref0).max() / jnp.abs(ref0).max()) < 1e-5


def test_pallas_transfers_interpret_match_reference():
    'Pallas restrict/prolong vs the jnp separable references.'
    from zephyr_tpu.ops.pallas_transfer import (
        restrict_pallas_batched, restrict_pallas_applicable,
        prolong_pallas_batched, prolong_pallas_applicable)
    from zephyr_tpu.solver.multigrid import _restrict_ref, _prolong_ref

    R, nz, nx = 2, 16, 256
    v = jnp.asarray((RNG.standard_normal((R, nz, nx))
                     + 1j * RNG.standard_normal((R, nz, nx))
                     ).astype(np.complex64))
    assert restrict_pallas_applicable(v)
    ref = _restrict_ref(v)
    out = restrict_pallas_batched(v, interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5

    vc = ref
    assert prolong_pallas_applicable(vc, nz, nx)
    refp = _prolong_ref(vc, nz, nx)
    outp = prolong_pallas_batched(vc, nz, nx, interpret=True)
    assert float(jnp.abs(outp - refp).max() / jnp.abs(refp).max()) < 1e-5


def test_pallas_prolong_add_smooth_interpret_matches_reference():
    'Fused upstroke kernel vs prolong + masked add + one jnp sweep.'
    from zephyr_tpu.ops.pallas_stencil import (
        prolong_add_smooth_pallas_batched, pallas_pas_applicable)
    from zephyr_tpu.ops.stencil import apply_stencil
    from zephyr_tpu.solver.multigrid import _prolong_ref

    R, nz, nx = 2, 16, 256
    mk = lambda *s: jnp.asarray((RNG.standard_normal(s)
                                 + 1j * RNG.standard_normal(s)
                                 ).astype(np.complex64))
    planes, dinv = mk(9, nz, nx), mk(nz, nx)
    b, u = mk(R, nz, nx), mk(R, nz, nx)
    ec = mk(R, nz // 2, nx // 2)
    mask = jnp.asarray(RNG.integers(0, 2, (nz, nx)).astype(np.float32))
    assert pallas_pas_applicable(planes, b, ec)

    u1 = u + mask * jax.vmap(lambda e: _prolong_ref(e, nz, nx))(ec)
    ref = u1 + dinv * (b - jax.vmap(lambda x: apply_stencil(planes, x))(u1))
    out = prolong_add_smooth_pallas_batched(planes, dinv, mask, b, u, ec,
                                            interpret=True)
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_pallas_presmooth_restrict_interpret_matches_reference():
    'Fused downstroke+restrict kernel vs jnp sweeps + restriction.'
    from zephyr_tpu.ops.pallas_stencil import (
        presmooth2_restrict_pallas_batched, pallas_ps2rr_applicable)
    from zephyr_tpu.ops.stencil import _ps2r_ref
    from zephyr_tpu.solver.multigrid import _restrict_ref

    R, nz, nx = 2, 16, 256
    mk = lambda *s: jnp.asarray((RNG.standard_normal(s)
                                 + 1j * RNG.standard_normal(s)
                                 ).astype(np.complex64))
    planes, dinv, b = mk(9, nz, nx), mk(nz, nx), mk(R, nz, nx)
    mask = jnp.asarray(RNG.integers(0, 2, (nz, nx)).astype(np.float32))
    assert pallas_ps2rr_applicable(planes, b)

    u_ref, resm_ref = jax.vmap(
        lambda x: _ps2r_ref(planes, dinv, mask, x))(b)
    rc_ref = _restrict_ref(resm_ref)
    u, rc = presmooth2_restrict_pallas_batched(planes, dinv, mask, b,
                                               interpret=True)
    assert float(jnp.abs(u - u_ref).max() / jnp.abs(u_ref).max()) < 1e-5
    assert float(jnp.abs(rc - rc_ref).max() / jnp.abs(rc_ref).max()) < 1e-5


def test_pallas_pcr_sweep_interpret_matches_reference():
    '''
    The fused PCR sweep kernel (field VMEM-resident across all
    reduction levels, ops/pallas_pcr.py) must reproduce the per-level
    jnp sweep bit-for-bit-ish (same f32 arithmetic on the bf16-unpacked
    factors) on the bf16-packed production path.
    '''
    from zephyr_tpu.ops.pallas_pcr import (pcr_sweep_pallas,
                                           pcr_pallas_applicable)
    from zephyr_tpu.solver.stratified import (pcr_precompute,
                                              _pcr_sweep_bf16_jnp)

    nz, nx, R = 32, 256, 3
    mk = lambda: jnp.asarray(
        (RNG.standard_normal((nz, nx))
         + 1j * RNG.standard_normal((nz, nx))).astype(np.complex64))
    l, u = mk(), mk()
    d = mk() + 4.0
    pcr = pcr_precompute(l, d, u, quantize=True)
    b = jnp.asarray(
        (RNG.standard_normal((R, nz, nx))
         + 1j * RNG.standard_normal((R, nz, nx))).astype(np.complex64))
    assert pcr_pallas_applicable(pcr.alphas, pcr.dinv, b)
    ref = _pcr_sweep_bf16_jnp(pcr.alphas, pcr.gammas, pcr.dinv, b)
    out = pcr_sweep_pallas(pcr.alphas, pcr.gammas, pcr.dinv, b,
                           interpret=True)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-6, rel

    # the whole-batch (rb) production variant must agree too
    from zephyr_tpu.ops.pallas_pcr import (pcr_sweep_pallas_rb,
                                           pcr_rb_applicable)
    assert pcr_rb_applicable(pcr.alphas, pcr.dinv, b)
    out_rb = pcr_sweep_pallas_rb(pcr.alphas, pcr.gammas, pcr.dinv, b,
                                 interpret=True)
    rel = float(jnp.linalg.norm(out_rb - ref) / jnp.linalg.norm(ref))
    assert rel < 1e-5, rel
