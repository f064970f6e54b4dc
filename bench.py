'''
zephyr_tpu benchmark driver.

Headline: multi-source Helmholtz solve throughput on one chip at the
BASELINE.md north-star configuration (2048^2 grid, multi-source batch,
homogeneous medium) against the reference's solver path — single-core
SciPy sparse-LU (problemo.BestSolver's SuperLU default), measured at a
smaller grid and extrapolated by the standard 2D nested-dissection
complexity model (factor ~ O(N^1.5), triangular solve ~ O(N log N)).

Additional recorded cases (in "detail"):
- oracle_error: on-chip accuracy pin — the homogeneous solution against
  the analytical Green's function (windowed element-norm, the
  reference's own test metric, zephyr/backend/Tests/test_MiniZephyr.py).
- layered: heterogeneous throughput (4-layer 1500-3000 m/s model).
- eurus: TTI block-system throughput (Thomsen anisotropy + PML).
- gradient: FWI misfit+gradient wall-clock at scale via the chunked
  adjoint-state driver, vs the LU-gradient estimate.

Prints the result JSON line
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
after EVERY completed row (flushed; the driver reads the last line, so a
mid-run kill still leaves the newest complete result parseable), and the
whole run — probe, headline, LU baseline, extras — is budgeted against
ZT_BENCH_TOTAL_BUDGET so it finishes inside the driver's timeout.
'''

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_N = int(os.environ.get('ZT_BENCH_N', 2048))
BENCH_NSRC = int(os.environ.get('ZT_BENCH_NSRC', 16))
# headline total source count: the reference amortizes ONE factorization
# over a whole survey (151 sources in notebooks/Test Inversion.ipynb);
# the TPU side amortizes one prepared operator + compile the same way,
# so the headline solves NSRC_TOTAL sources in HBM-sized batches of
# BENCH_NSRC through the SAME prepared operator (VERDICT r4 #2)
BENCH_NSRC_TOTAL = int(os.environ.get('ZT_BENCH_NSRC_TOTAL', 96))
BENCH_WAVELEN_CELLS = float(os.environ.get('ZT_BENCH_WAVELEN', 16.0))
BENCH_REPEATS = int(os.environ.get('ZT_BENCH_REPEATS', 3))
LU_N = int(os.environ.get('ZT_BENCH_LU_N', 512))
GRAD_NFREQ = int(os.environ.get('ZT_BENCH_GRAD_NFREQ', 8))
EURUS_N = int(os.environ.get('ZT_BENCH_EURUS_N', 512))
RUN_EXTRAS = os.environ.get('ZT_BENCH_EXTRAS', '1') != '0'


def _common_setup():
    import jax

    if os.environ.get('ZT_BENCH_FORCE_CPU'):
        jax.config.update('jax_platforms', 'cpu')
    cache_dir = os.environ.get('ZT_JAX_CACHE', '/tmp/zephyr_tpu_jaxcache')
    try:
        # TPU-only: the cache dir can survive VM snapshot/restore onto a
        # host with different CPU features, and XLA:CPU will then load
        # AOT results compiled for the OLD host (observed: cpu_aot_loader
        # errors + SIGILL warnings). TPU executables are host-agnostic.
        if jax.default_backend() in ('tpu', 'axon'):
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              1.0)
    except Exception:
        pass
    return jax


def _solver_cfg():
    '''
    The production solver config. strat_panels stays at its 0 ('auto')
    default unless ZT_BENCH_PANELS forces a value; each measurement
    resolves the auto via ``resolve_panels(cfg, c)`` so laterally
    heterogeneous media (marmousi) get the panelled interior solve and
    layered/homogeneous media keep the global one.
    '''

    from zephyr_tpu.solver.helmholtz import SolverConfig
    extra = {}
    panels = int(os.environ.get('ZT_BENCH_PANELS', 0))
    if panels >= 1:
        extra = dict(strat_panels=panels,
                     strat_overlap=int(os.environ.get('ZT_BENCH_OVERLAP',
                                                      32)))
    if os.environ.get('ZT_BENCH_DFT'):
        extra['strat_dft'] = os.environ['ZT_BENCH_DFT']
    base = dict(tol=1e-5, maxiter=2000, mg_coarse='inv',
                mg_min_size=32, fft_mode='strat', fft_scale=2,
                hybrid_comp='fused', mg_nu1=2, mg_nu2=1)
    base.update(extra)
    if os.environ.get('ZT_BENCH_NU1'):
        base['mg_nu1'] = int(os.environ['ZT_BENCH_NU1'])
    return SolverConfig(**base)


def _layered_c(n, dtype=np.float32):
    c = np.zeros((n, n), dtype=dtype)
    for i, v in enumerate([1500., 2000., 2500., 3000.]):
        c[i * n // 4:(i + 1) * n // 4] = v
    return c


def _marmousi_c(n, dtype=np.float32, rough=True):
    '''
    Synthetic Marmousi-style medium (deterministic): dipping folded
    THIN-BED stratigraphy with a lateral velocity trend, fault-block
    offsets, a low-velocity lens, AND (``rough=True``, the bench
    default) band-limited stochastic roughness with a ~1/k power
    spectrum (von-Karman-like, the measured spectral character of
    Marmousi-class models) — heterogeneous in BOTH directions at ALL
    scales down to a few cells, so the depth-stratified interior solve
    is genuinely approximate, not just layered-with-offsets (round-4
    VERDICT "de-flatter config 4"). ``rough=False`` keeps only the
    smooth lateral-block structure (the panel-mechanism test model).
    Mirrors BASELINE.md staged config 4's "Marmousi-style 2D model"
    intent without shipping the licensed Marmousi grid.
    '''

    z = np.linspace(0., 1., n)[:, None]
    x = np.linspace(0., 1., n)[None, :]
    horizon = z + 0.15 * x + 0.05 * np.sin(6.0 * np.pi * x) * (0.3 + z)
    for fx, dzo in ((0.3, 0.06), (0.55, -0.08), (0.8, 0.05)):
        horizon = horizon + dzo * (x > fx)
    # thin beds: 24 layers over the model depth (Marmousi has ~160 over
    # 3 km; at bench resolution this gives beds of ~n/30 cells)
    nlayer = 24
    idx = np.clip(np.floor(horizon * nlayer).astype(int), 0, nlayer + 4)
    rng = np.random.default_rng(42)
    vels = (1500. + 2200. * np.arange(nlayer + 5) / (nlayer + 4)
            + rng.uniform(-220., 220., nlayer + 5))
    vels = np.maximum.accumulate(vels)          # compaction trend
    c = vels[idx]
    r2 = (z - 0.45) ** 2 + (x - 0.5) ** 2
    c = c - 300. * np.exp(-r2 / 0.01)
    # band-limited roughness: filtered white noise with a 1/k radial
    # spectrum between ~2 cycles across the model and the bench
    # wavelength scale (16 cells — shorter structures would be
    # SUB-wavelength scatterers, a strong-scattering regime harder than
    # Marmousi-class media: measured 1901 iterations at 2048^2 with an
    # n/8-cycle cutoff vs Marmousi-class solver literature at ~100-300),
    # normalized to 120 m/s rms
    if not rough:
        return np.asarray(np.maximum(c, 1400.), dtype)
    w = rng.standard_normal((n, n))
    kz = np.fft.fftfreq(n)[:, None]
    kx = np.fft.fftfreq(n)[None, :]
    k = np.sqrt(kz ** 2 + kx ** 2)
    lo, hi = 2.0 / n, 1.0 / 16.0
    filt = np.where((k >= lo) & (k <= hi), 1.0 / np.maximum(k, lo), 0.0)
    rough = np.real(np.fft.ifft2(np.fft.fft2(w) * filt))
    rough = rough / max(rough.std(), 1e-30)
    c = c + 120.0 * rough
    return np.asarray(np.maximum(c, 1400.), dtype)


# public peak HBM bandwidth per chip (bytes/s) by device kind substring
_PEAK_HBM_BW = (('v5p', 2765e9), ('v5 lite', 819e9), ('v5e', 819e9),
                ('v6', 1640e9), ('v4', 1228e9), ('v3', 900e9),
                ('v2', 700e9))


def _peak_bw(device_kind):
    dk = device_kind.lower()
    for key, bw in _PEAK_HBM_BW:
        if key in dk:
            return bw
    return None


def _traffic_model(n, B, chunk_krylov, nsrc=16, fused_pcr=True):
    '''
    Modeled HBM traffic per outer Krylov iteration per RHS, in bytes —
    the auditable basis of the reported bandwidth utilization. Counted
    streams (complex64 = 8 B/elem). The batched Pallas kernels keep the
    RHS batch as the INNERMOST grid axis, so the shared coefficient-
    plane tiles stay VMEM-resident across the batch (Mosaic dedupes
    same-index block fetches): plane streams amortize over ``nsrc``.

    scalar (B=1) BiCGStab step with the fused hybrid preconditioner:
    - 2 matvecs: (9/nsrc) true planes + read x + write y
    - 2 precond applies, each:
      - fused downstroke: read r + 9/nsrc precond planes + write
        smoothed iterate + write coarse residual ~ 2.8 F
      - stratified interior solve at the half grid (F_h = F/4): x-FFT
        passes ~ 4 F_h, plus the PCR sweep — with the fused Pallas
        kernel (ops/pallas_pcr.py) field-in + field-out + factors/nsrc
        ~ 4.5 F_h; on the jnp path every one of the ~log2(nz/2) levels
        re-reads/re-writes the field (~25 F_h). This term is why the
        round-3 model (1.5 F flat) undercounted the real traffic.
      - coarse V-cycle tail ~ 0.7 F; fused upstroke ~ 2.8 F
    - BiCGStab vector updates + dots ~ 12 F
    F = n^2 * 8 B.

    block (B=2) GMRES step: one block matvec (4 x 9 half-size plane
    families ~ 18 F_B / nsrc + r/w fields 2 F_B), one precond (block
    line smoother + transfers ~ 22 F_B), Arnoldi orthogonalization
    (~restart/2 basis reads + 4 F_B updates), F_B = B n^2 * 8 B.
    '''

    F = n * n * 8
    if B == 1:
        pl = 9.0 / max(nsrc, 1)
        nsteps = np.ceil(np.log2(max(n // 2, 2)))
        pcr = (4.5 if fused_pcr
               else (2.5 * nsteps + 2)) / 4.0   # in F units (F_h = F/4)
        fft = 4 / 4.0
        terms = {'matvec': 2 * (pl + 2) * F,
                 'precond': 2 * (2 * pl + 2 * 2.8 + 0.7 + pcr + fft) * F,
                 'krylov_vec': 12 * F}
    else:
        FB = B * n * n * 8
        terms = {'matvec': (18.0 / max(nsrc, 1) + 2) * FB,
                 'precond': 22 * FB,
                 'krylov_vec': (chunk_krylov / 2 + 4) * FB}
    return sum(terms.values()), {k: round(v / 1e6, 1)
                                 for k, v in terms.items()}


def measure_tpu(n, nsrc, medium='hom'):
    jax = _common_setup()
    import jax.numpy as jnp

    from zephyr_tpu.core.realio import realio_jit
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.solver.helmholtz import (prepare_operator,
                                             make_chunked_solver,
                                             shifted_velocity)

    cval = 1500.0
    freq = cval / BENCH_WAVELEN_CELLS  # wavelength in cells at dx=1
    cfg = _solver_cfg()
    # Short device programs: the axon runtime kills its worker on very
    # long loop programs, and chunk restarts also remove f32
    # recursive-residual drift. Chunk 32 measured best at 2048^2 hom
    # (46 iters / 2.62 solves/s vs 55 / 2.15 at chunk 16 — the round-3
    # "headline drift" was chunk-granularity overshoot of the final
    # restart, tools/exp_hom_drift.py).
    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 32))

    # complex arrays never cross the host<->device boundary (realio)
    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        planes = minizephyr_planes(c, rho, freq)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 1, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0], pos[:, 1]].set(
            1.0 + 0.0j)

    if medium == 'hom':
        c_real = cval * np.ones((n, n), dtype=np.float32)
    elif medium == 'layered':
        c_real = _layered_c(n)
    elif medium == 'marmousi':
        c_real = _marmousi_c(n)
    else:
        raise ValueError(medium)
    from zephyr_tpu.solver.helmholtz import resolve_panels
    cfg = resolve_panels(cfg, c_real)
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    rng = np.random.default_rng(0)
    # the survey: NSRC_TOTAL distinct sources solved in HBM-sized
    # batches of nsrc through ONE prepared operator (mirrors the
    # reference's one-factorization-per-survey amortization); the hom
    # headline runs the full survey, heterogeneous extras keep a single
    # batch to protect the bench budget
    total = BENCH_NSRC_TOTAL if medium == 'hom' else nsrc
    nbatch = max(1, total // nsrc)
    pos_all = rng.integers(n // 8, 7 * n // 8,
                           size=(nbatch, nsrc, 2)).astype(np.int32)
    bs = [realio_jit(make_rhs)(p) for p in pos_all]

    solver = make_chunked_solver(cfg, chunk=chunk)

    # warm-up / compile
    _, iters, relres = solver(op, bs[0])

    reps = BENCH_REPEATS if nbatch == 1 else 1
    times = []
    iters_bat = []
    for _ in range(reps):
        t0 = time.time()
        for bb in bs:
            _, iters, relres = solver(op, bb)
            iters_bat.append(int(iters))
        times.append(time.time() - t0)
    t = min(times) / nbatch   # per-batch seconds (throughput basis)

    info = {
        'iters': int(round(np.mean(iters_bat))),
        'relres': float(relres),
        'device': str(jax.devices()[0]),
        'freq_hz': freq,
        'wavelengths_across': n / BENCH_WAVELEN_CELLS,
        'chunk': chunk,
        'medium': medium,
        'panels': cfg.strat_panels,
        'nsrc_total': nbatch * nsrc,
        'batches': nbatch,
    }

    # roofline accounting: modeled HBM bytes moved per iteration x
    # iterations x RHS count over the measured wall-clock, vs chip peak
    bytes_per_iter, terms = _traffic_model(n, 1, chunk, nsrc=nsrc)
    achieved = bytes_per_iter * int(iters) * nsrc / t
    kind = getattr(jax.devices()[0], 'device_kind', '')
    peak = _peak_bw(str(kind))
    info['roofline'] = {
        'modeled_bytes_per_iter_per_rhs_MB': round(bytes_per_iter / 1e6,
                                                   1),
        'terms_MB': terms,
        'achieved_GBps': round(achieved / 1e9, 1),
        'peak_GBps': round(peak / 1e9, 1) if peak else None,
        'bw_util': round(achieved / peak, 3) if peak else None,
        'device_kind': str(kind),
    }

    if medium == 'hom' and os.environ.get('ZT_BENCH_COMPONENTS',
                                          '1') != '0':
        # per-component wall-clock/bandwidth breakdown (localizes where
        # the headline's achieved bandwidth goes: kernels vs the
        # dispatch/reduction glue between them) — the in-bench version
        # of tools/profile_components.py
        from zephyr_tpu.ops.stencil import apply_block_stencil_fast
        from zephyr_tpu.solver.helmholtz import _make_precond

        def _time_rio(fn, arg, reps=5):
            out = fn(arg)
            jax.block_until_ready(jax.tree_util.tree_leaves(out))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(arg)
                jax.block_until_ready(jax.tree_util.tree_leaves(out))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        from jax import lax as _lax
        from zephyr_tpu.core.realio import realio_jit as _rj

        # op is a device-resident C-pair pytree: recombine INSIDE the
        # jit boundary (complex leaves never cross host<->device).
        # Each timed program loops LOOPN applications so the tunnel's
        # per-dispatch latency (measured ~20 ms — it made single-apply
        # timings exceed the whole 32-iteration chunk per-iter cost)
        # amortizes away.
        LOOPN = 8

        def mv_loop(op_in, v):
            def body(i, x):
                return jax.vmap(lambda vi: apply_block_stencil_fast(
                    op_in.planes, vi))(x)
            return _lax.fori_loop(0, LOOPN, body, v)

        def prec_loop(op_in, v):
            M = _make_precond(op_in, cfg)

            def body(i, x):
                return jax.vmap(M)(x)
            return _lax.fori_loop(0, LOOPN, body, v)

        mv_rio = _rj(mv_loop)
        prec_rio = _rj(prec_loop)
        F = n * n * 8
        t_mv = _time_rio(lambda bb: mv_rio(op, bb), bs[0]) / LOOPN
        t_pc = _time_rio(lambda bb: prec_rio(op, bb), bs[0]) / LOOPN
        t_ch = _time_rio(lambda bb: solver(op, bb, max_chunks=1)[0],
                         bs[0])
        per_iter = t_ch / chunk
        glue = per_iter - 2 * t_mv - 2 * t_pc
        info['components'] = {
            'matvec_ms': round(t_mv * 1e3, 2),
            'matvec_GBps': round(nsrc * (9. / nsrc + 2) * F / t_mv / 1e9,
                                 1),
            'precond_ms': round(t_pc * 1e3, 2),
            'precond_GBps': round(nsrc * (2 * 9. / nsrc + 6.2) * F
                                  / t_pc / 1e9, 1),
            'chunk_per_iter_ms': round(per_iter * 1e3, 2),
            'glue_ms_per_iter': round(glue * 1e3, 2),
            'glue_pct': round(100 * glue / per_iter, 1),
        }

    if medium == 'hom':
        # on-chip accuracy pin: solve one centre source and compare to
        # the analytical Green's function on the reference's windowed
        # element-norm metric (test_MiniZephyr.py:109-114 semantics)
        from zephyr_tpu.ops.special import hankel1_0

        def oracle_err(x_re, x_im, pos0):
            u = jnp.conj(jax.lax.complex(x_re, x_im))
            k = 2 * np.pi * freq / cval
            Z, X = jnp.mgrid[0:n, 0:n]
            r = jnp.sqrt((Z.astype(jnp.float32)
                          - pos0[0].astype(jnp.float32)) ** 2
                         + (X.astype(jnp.float32)
                            - pos0[1].astype(jnp.float32)) ** 2)
            uA = jnp.nan_to_num(0.5 * (-0.5j) * hankel1_0(k * r))
            w0, w1 = n // 8, 7 * n // 8
            rel = (uA - u)[w0:w1, w0:w1] / jnp.abs(uA[w0:w1, w0:w1])
            num = jnp.sqrt(jnp.real(jnp.sum(jnp.conj(rel) * rel)))
            return num / rel.size

        # source OUTSIDE the comparison window (the reference's oracle
        # test also excludes the source/near-field from its window)
        pos0 = np.array([[n // 16, n // 16]], np.int32)
        b0 = realio_jit(make_rhs)(pos0)
        x0, _, _ = solver(op, b0)
        err = realio_jit(oracle_err, host_output=True)(
            x0.re[0, 0], x0.im[0, 0], jnp.asarray(pos0[0]))
        info['oracle_error'] = float(np.asarray(err))

    return nsrc / t, info


def measure_eurus(n, nsrc, medium='hom'):
    'TTI block-system throughput (Thomsen anisotropy, PML).'

    jax = _common_setup()
    import jax.numpy as jnp

    from zephyr_tpu.core.realio import realio_jit
    from zephyr_tpu.ops.eurus_coeff import eurus_planes
    from zephyr_tpu.solver.helmholtz import (prepare_operator,
                                             make_chunked_solver,
                                             shifted_velocity)

    cval = 1500.0
    freq = cval / BENCH_WAVELEN_CELLS
    # block systems smooth with alternating z/x lines: one (z, x)
    # alternation per smoothing stage is the measured sweet spot
    cfg = _solver_cfg()._replace(gmres_restart=20, mg_nu1=1, mg_nu2=1)
    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 16))

    def prep_fn(c_real):
        c = c_real.astype(jnp.complex64)
        rho = jnp.ones_like(c_real)
        aniso = dict(theta=jnp.full((n, n), 0.3, jnp.float32),
                     eps=jnp.full((n, n), 0.2, jnp.float32),
                     delta=jnp.full((n, n), 0.1, jnp.float32))
        planes = eurus_planes(c, rho, freq, **aniso)
        pplanes = eurus_planes(shifted_velocity(c, cfg.shift), rho, freq,
                               pml_cap=cfg.pml_cap, **aniso)
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    def make_rhs(pos):
        q = jnp.zeros((pos.shape[0], 2, n, n), jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0], pos[:, 1]].set(
            1.0 + 0.0j)

    c_np = (cval * np.ones((n, n), np.float32) if medium == 'hom'
            else _layered_c(n))
    op = realio_jit(prep_fn)(jnp.asarray(c_np))
    rng = np.random.default_rng(1)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)
    solver = make_chunked_solver(cfg, chunk=chunk)
    _, iters, relres = solver(op, b)
    t0 = time.time()
    _, iters, relres = solver(op, b)
    t = time.time() - t0

    bytes_per_iter, terms = _traffic_model(n, 2, chunk, nsrc=nsrc)
    achieved = bytes_per_iter * int(iters) * nsrc / t
    peak = _peak_bw(str(getattr(jax.devices()[0], 'device_kind', '')))
    return nsrc / t, {'iters': int(iters), 'relres': float(relres),
                      'grid': n, 'medium': 'TTI ' + medium,
                      'device': str(jax.devices()[0]),
                      'roofline': {
                          'modeled_bytes_per_iter_per_rhs_MB':
                              round(bytes_per_iter / 1e6, 1),
                          'achieved_GBps': round(achieved / 1e9, 1),
                          'bw_util': (round(achieved / peak, 3)
                                      if peak else None)}}


def measure_freqblock(n=None, nfreq=16, nsrc=96):
    '''
    BASELINE.md staged config 3 as specified: a 16-frequency block with
    96 sources batched per frequency on the layered model, one chip —
    the production multi-frequency forward-modelling shape
    (reference notebooks/Test Inversion.ipynb cell 3 is the same
    workflow at 100x200/8f/151src). Runs the production chunked
    per-frequency driver with constant-gridpoints-per-wavelength grid
    adaptation (the reference's MultiGridMultiFreq semantics,
    zephyr/backend/distributors.py:384-435). Returns total wall seconds
    + per-frequency diagnostics.
    '''

    _common_setup()
    # 768^2 default: BASELINE staged config 3 fixes the block shape
    # (16 freqs x 96 sources, layered) but not the grid; at 1024^2 the
    # row costs 434 s warm (measured round 5) and starves the rows
    # after it inside the driver window
    n = n or int(os.environ.get('ZT_BENCH_FB_N', 768))
    nfreq = int(os.environ.get('ZT_BENCH_FB_NFREQ', nfreq))
    nsrc = int(os.environ.get('ZT_BENCH_FB_NSRC', nsrc))

    import jax.numpy as jnp
    from zephyr_tpu.core.realio import realio_jit
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.parallel.multifreq import freq_grid_plan
    from zephyr_tpu.backend.interpolation import resample_field
    from zephyr_tpu.solver.helmholtz import (prepare_operator,
                                             make_chunked_solver,
                                             shifted_velocity)

    from zephyr_tpu.solver.helmholtz import resolve_panels
    cfg = _solver_cfg()
    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 16))
    cval = 1500.0
    c_np = _layered_c(n)
    cfg = resolve_panels(cfg, c_np)   # layered -> global (panels off)
    # one octave up to the headline frequency, constant GPW per freq
    freqs = np.linspace(0.5, 1.0, nfreq) * (cval / BENCH_WAVELEN_CELLS)
    plans = freq_grid_plan(n, n, freqs, cval, target_gpw=
                           BENCH_WAVELEN_CELLS, quantum=max(n // 4, 256))

    def prep_fn(c_real, freq, shape):
        c = c_real.astype(jnp.complex64)
        if shape != (n, n):
            c = resample_field(c, shape)
        dxf = float(n) / shape[1]
        rho = jnp.ones(shape, jnp.float32)
        pk = dict(dx=dxf, dz=float(n) / shape[0])
        planes = minizephyr_planes(c, rho, freq, **pk)[None, None]
        pplanes = minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                    freq, pml_cap=cfg.pml_cap,
                                    **pk)[None, None]
        return prepare_operator(planes, pplanes, cfg,
                                with_transpose=False)

    rng = np.random.default_rng(3)
    solver = make_chunked_solver(cfg, chunk=chunk)
    prep_by_shape = {}

    def _prep(freq, shape):
        if shape not in prep_by_shape:
            prep_by_shape[shape] = realio_jit(
                lambda cr, f: prep_fn(cr, f, shape))
        return prep_by_shape[shape](jnp.asarray(c_np),
                                    jnp.asarray(float(freq)))

    def make_rhs(pos, shape):
        q = jnp.zeros((pos.shape[0], 1) + shape, jnp.complex64)
        return q.at[jnp.arange(pos.shape[0]), 0, pos[:, 0],
                    pos[:, 1]].set(1.0 + 0.0j)

    # warm-up/compile pass: one small solve per distinct shape so the
    # timed loop measures steady-state throughput, like the other rows
    for shape in dict.fromkeys(plans):
        op = _prep(freqs[plans.index(shape)], shape)
        pos = rng.integers(shape[0] // 8, 7 * shape[0] // 8,
                           size=(chunk, 2)).astype(np.int32)
        solver(op, realio_jit(lambda p: make_rhs(p, shape))(pos))

    iters_by_freq = []
    t0 = time.time()
    for i, f in enumerate(freqs):
        shape = plans[i]
        op = _prep(f, shape)
        pos = rng.integers(shape[0] // 8, 7 * shape[0] // 8,
                           size=(nsrc, 2)).astype(np.int32)
        tot_iters = 0
        for s0 in range(0, nsrc, chunk):
            b = realio_jit(lambda p: make_rhs(p, shape))(
                pos[s0:s0 + chunk])
            _, iters, relres = solver(op, b)
            tot_iters += int(iters)
        iters_by_freq.append(tot_iters // max(1, nsrc // chunk))
    wall = time.time() - t0
    import jax
    return wall, {'grid': n, 'nfreq': nfreq, 'nsrc': nsrc,
                  'medium': 'layered', 'chunk': chunk,
                  'grid_plan': sorted(set(plans)),
                  'iters_by_freq': iters_by_freq,
                  'device': str(jax.devices()[0])}


def measure_gradient(n, nsrc, nfreq, medium='layered'):
    '''
    FWI misfit + gradient wall-clock at scale: chunked adjoint-state
    driver (forward + transpose solves per frequency, explicit gradient)
    with per-frequency grid adaptation (targetGPW, the reference's
    MultiGridMultiFreq semantics) — on a fixed grid the ref-parity PML
    profile is frequency-independent, so low frequencies both converge
    poorly and waste resolution; constant gridpoints-per-wavelength
    keeps iteration counts flat across the band.
    '''

    _common_setup()

    from zephyr_tpu.parallel.multifreq import fwi_misfit_grad_chunked

    cfg = _solver_cfg()
    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 16))
    c = (_marmousi_c(n, np.float64) if medium == 'marmousi'
         else _layered_c(n, np.float64))
    rho = np.ones((n, n))
    freqs = np.linspace(0.6, 1.0, nfreq) * (1500.0 / BENCH_WAVELEN_CELLS)
    rng = np.random.default_rng(2)
    src_pos = rng.integers(n // 8, 7 * n // 8,
                           size=(nsrc, 2)).astype(np.float64)
    nrec = 64
    rx = np.linspace(n // 8, 7 * n // 8, nrec)
    rec_pos = np.stack([rx, np.full(nrec, float(n // 8))], axis=1)
    dobs = np.zeros((nfreq, nsrc, nrec), np.complex64)  # zero-data misfit

    t0 = time.time()
    misfit, grad = fwi_misfit_grad_chunked(
        c, rho, freqs, None, None, dobs, config=cfg, chunk=chunk,
        target_gpw=BENCH_WAVELEN_CELLS, src_pos=src_pos, rec_pos=rec_pos,
        cmin=1500.0)
    t_total = time.time() - t0
    return t_total, {'misfit': float(misfit),
                     'grad_norm': float(np.linalg.norm(grad)),
                     'grid': n, 'nfreq': nfreq, 'nsrc': nsrc,
                     'medium': medium,
                     'finite': bool(np.isfinite(grad).all())}


_LU_CACHE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              'LU_CACHE.json')


def _load_lu_cache():
    '''
    Persisted SuperLU measurements (tools/measure_lu_cache.py): the
    factorization is deterministic per grid, so it is measured ONCE —
    at 512^2 AND 1024^2, which pins the factor-time exponent with two
    points instead of the assumed 1.5 — and every driver bench run just
    loads it (round-4 postmortem: the in-run LU measurement ate driver
    budget before any extras row, three rounds running).
    '''

    try:
        with open(_LU_CACHE_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def measure_lu_baseline(n, nsrc):
    '''
    Single-core SciPy SuperLU at an LU_N x LU_N version of the same
    physics, extrapolated to n x n: factor time x scale^p (p fitted
    from the 512/1024 cache pair when available, else the standard 2D
    nested-dissection 1.5), solve time x scale^p_s (fitted) or
    x scale x log ratio. Throughput = nsrc / (factor + nsrc * solve).
    Uses LU_CACHE.json when present; measures in-run only as fallback.
    '''

    cache = _load_lu_cache()
    p_f, p_s, source = 1.5, None, 'measured in-run'
    if cache and str(LU_N) in cache.get('grids', {}):
        e = cache['grids'][str(LU_N)]
        t_factor, t_solve = float(e['t_factor']), float(e['t_solve'])
        p_f = float(cache.get('factor_exponent', 1.5))
        p_s = cache.get('solve_exponent')
        source = 'LU_CACHE.json (host %s, grids %s)' % (
            cache.get('host', '?'), sorted(cache.get('grids', {})))
    else:
        from tools.measure_lu_cache import measure_lu
        t_factor, t_solve = measure_lu(LU_N, nsrc)

    N0 = LU_N * LU_N
    N = n * n
    scale = N / N0
    t_factor_big = t_factor * scale ** p_f
    if p_s is not None:
        t_solve_big = t_solve * scale ** float(p_s)
    else:
        t_solve_big = t_solve * scale * (np.log(N) / np.log(N0))
    throughput = nsrc / (t_factor_big + nsrc * t_solve_big)
    # RHS-amortization assumption (stated explicitly: the headline ratio
    # is sensitive to it). The factorization is amortized over the SAME
    # nsrc the TPU side solves; at the reference's typical 151-source
    # surveys (notebooks/Test Inversion.ipynb) the LU amortizes better,
    # so that harsher baseline is recorded alongside.
    amortized_151 = 151 / (t_factor_big + 151 * t_solve_big)
    return throughput, {'t_factor_measured': t_factor,
                        't_solve_measured': t_solve,
                        't_factor_extrapolated': t_factor_big,
                        't_solve_extrapolated': t_solve_big,
                        'lu_grid': LU_N,
                        'factor_exponent': p_f,
                        'solve_exponent': p_s,
                        'source': source,
                        'amortization': 'factor amortized over %d RHS'
                                        % nsrc,
                        'lu_throughput_151src': amortized_151}


def measure_multiscale(n=None):
    '''
    BASELINE.md staged config 5: frequency-continuation multiscale FWI
    (the reference's Test Inversion / MultiScale workflow,
    notebooks/Test Inversion.ipynb cells 4-5) at a small benchmark
    scale — 2 frequency blocks swept low-to-high, 3 gradient iterations
    per block, warm-started — on the production chunked TPU drivers
    (data: multifreq_dpred_chunked; gradient: fwi_misfit_grad_chunked).
    Returns total wall seconds + the misfit trajectory.
    '''

    _common_setup()
    n = n or int(os.environ.get('ZT_BENCH_MS_N', 256))
    nsrc, nrec, nfreq = 8, 32, 4
    iters_pb = int(os.environ.get('ZT_BENCH_MS_ITERS', 3))

    from zephyr_tpu.parallel.multifreq import (multifreq_dpred_chunked,
                                               fwi_misfit_grad_chunked)
    cfg = _solver_cfg()
    cval = 1500.0
    freqs = np.linspace(0.4, 1.0, nfreq) * (cval / BENCH_WAVELEN_CELLS)

    c_true = _layered_c(n, np.float64)
    c_true[(3 * n) // 8:(5 * n) // 8, (3 * n) // 8:(5 * n) // 8] -= 150.
    # start from the depth trend only (no layers, no anomaly)
    m0 = np.broadcast_to(np.linspace(1500., 3000., n)[:, None],
                         (n, n)).copy()
    rho = np.ones((n, n))

    sx = np.linspace(n // 8, 7 * n // 8, nsrc).astype(int)
    q = np.zeros((nfreq, nsrc, n, n), np.complex64)
    for i in range(nfreq):
        q[i, np.arange(nsrc), n // 8, sx] = 1.0
    rxs = np.linspace(n // 8, 7 * n // 8, nrec).astype(int)
    R = np.zeros((nrec, n * n), np.complex64)
    R[np.arange(nrec), (n // 8) * n + rxs] = 1.0

    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 16))
    t0 = time.time()
    dobs = multifreq_dpred_chunked(c_true, rho, freqs, q, R, config=cfg,
                                   chunk=chunk)
    t_data = time.time() - t0

    blocks = [[0, 1], [2, 3]]
    m = m0.copy()
    hist = []
    t0 = time.time()
    for blk in blocks:
        lr = None
        for _ in range(iters_pb):
            mis, grad = fwi_misfit_grad_chunked(
                m, rho, freqs[blk], q[blk], R, dobs[blk], config=cfg,
                chunk=chunk)
            if lr is None:
                # first step ~30 m/s at the gradient peak; fixed within
                # the block (a wall-clock row, not a convergence study)
                lr = 30.0 / max(float(np.abs(grad).max()), 1e-30)
            m = m - lr * grad
            hist.append(float(mis))
    wall = time.time() - t0
    import jax
    err0 = float(np.linalg.norm(m0 - c_true))
    err1 = float(np.linalg.norm(m - c_true))
    return wall, {'grid': n, 'nfreq': nfreq, 'nsrc': nsrc, 'nrec': nrec,
                  'blocks': blocks, 'iters_per_block': iters_pb,
                  'data_gen_s': round(t_data, 2),
                  'misfit_trajectory': [round(h, 4) for h in hist],
                  'misfit_reduction': round(hist[-1] / hist[0], 4)
                  if hist and hist[0] else None,
                  'model_err_reduction': round(err1 / err0, 4),
                  'device': str(jax.devices()[0])}


def _probe_device(timeout_s=300):
    '''
    Probe device availability in a subprocess with a hard timeout: the
    experimental TPU runtime can hang at backend init after a worker
    crash, which would otherwise wedge the whole benchmark.
    Returns 'tpu', 'cpu', or None.
    '''

    import subprocess
    code = ("import jax\nd = jax.devices()[0]\n"
            "print('PLATFORM:' + d.platform)")
    try:
        proc = subprocess.run([sys.executable, '-c', code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
        for line in proc.stdout.splitlines():
            if line.startswith('PLATFORM:'):
                return line.split(':', 1)[1]
    except subprocess.TimeoutExpired:
        return None
    return None


def _measure_subprocess(mode, timeout=None, **env_overrides):
    '''
    Run one measurement mode in a subprocess (the experimental TPU
    runtime can crash its worker on very large programs; isolation lets
    the parent fall back / record the error and continue).
    '''

    import subprocess
    env = dict(os.environ)
    env['ZT_BENCH_MEASURE_ONLY'] = mode
    for k, v in env_overrides.items():
        env[k] = str(v)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env,
            timeout=timeout or int(os.environ.get('ZT_BENCH_TIMEOUT',
                                                  3000)))
    except subprocess.TimeoutExpired:
        return {'error': 'timeout'}
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
    return {'error': 'no output (rc=%d): %s'
            % (proc.returncode, proc.stderr[-300:])}


def _run_measure_only(mode):
    if mode in ('hom', 'layered', 'marmousi'):
        throughput, info = measure_tpu(BENCH_N, BENCH_NSRC, medium=mode)
        print(json.dumps({'throughput': throughput, 'info': info}))
    elif mode in ('eurus', 'eurus_layered'):
        # the layered-TTI tail is the slowest solver case (VERDICT r3
        # item 4 targets <= 300 iterations at 256^2); record it at the
        # grid that target names rather than risking the whole budget
        n_e = (EURUS_N if mode == 'eurus'
               else int(os.environ.get('ZT_BENCH_EURUS_LAY_N', 256)))
        throughput, info = measure_eurus(
            n_e, BENCH_NSRC,
            medium='hom' if mode == 'eurus' else 'layered')
        print(json.dumps({'throughput': throughput, 'info': info}))
    elif mode == 'gradient':
        t_total, info = measure_gradient(
            BENCH_N, BENCH_NSRC, GRAD_NFREQ,
            medium=os.environ.get('ZT_BENCH_GRAD_MEDIUM', 'layered'))
        print(json.dumps({'wall_s': t_total, 'info': info}))
    elif mode == 'freqblock':
        t_total, info = measure_freqblock()
        print(json.dumps({'wall_s': t_total, 'info': info}))
    elif mode == 'multiscale':
        t_total, info = measure_multiscale()
        print(json.dumps({'wall_s': t_total, 'info': info}))


_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'BENCH_PARTIAL.json')


def _flush_partial(result):
    'Write the accumulating result to disk after EVERY completed row.'
    try:
        with open(_PARTIAL_PATH, 'w') as f:
            json.dump(result, f, indent=1)
    except OSError:
        pass


def _probe_with_backoff(window_s):
    '''
    Probe the TPU runtime with retries spread across ``window_s``
    seconds of the GLOBAL budget: the tunnel worker wedges transiently
    after client crashes (round-2 postmortem), and a single failed
    probe at the wrong moment turned the round-2 official record into a
    CPU-fallback number — but an unbudgeted 13-minute probe window was
    one of the reasons round 3 blew the driver timeout entirely.
    '''

    attempts = int(os.environ.get('ZT_BENCH_PROBE_ATTEMPTS', 4))
    wait = float(os.environ.get('ZT_BENCH_PROBE_WAIT', 45))
    timeout_s = float(os.environ.get('ZT_BENCH_PROBE_TIMEOUT', 120))
    t0 = time.time()
    for i in range(attempts):
        rem = window_s - (time.time() - t0)
        if rem <= 5:
            return None, i
        platform = _probe_device(timeout_s=min(timeout_s, rem))
        if platform:
            return platform, i + 1
        rem = window_s - (time.time() - t0)
        if i < attempts - 1 and rem > wait + 10:
            time.sleep(wait)
    return None, attempts


def main():
    # Global wall-clock budget covering EVERYTHING — probe, headline,
    # LU baseline, extras (round-3 postmortem: only the extras were
    # budgeted; probe + headline + LU alone could exceed the driver
    # timeout, and the single result line printed only at the very end,
    # so BENCH_r03.json recorded nothing). Every row always appears in
    # the detail, as a result or a {'skipped': ...}; the result is
    # flushed to BENCH_PARTIAL.json AND re-printed as a complete JSON
    # line after every row (the driver reads the last line).
    t_start = time.time()
    # 1580 s default: round 4's 2400 s default exceeded the driver's
    # kill window (rc=124 mid-extras, third round running; the round-4
    # timeline brackets the window at >= ~1800 s). The warm-cache row
    # set measures ~1460 s total (round-5 rehearsals: gradient 410,
    # freqblock 287, marmousi 140, gradient_marmousi ~130/512^2,
    # multiscale ~110, headline+probe ~260, the rest ~210), so 1580
    # fits every row with margin while staying inside the window
    budget = float(os.environ.get('ZT_BENCH_TOTAL_BUDGET', 1580))

    def _left():
        return budget - (time.time() - t_start)

    def _under_budget(label, detail, reserve=90):
        left = _left() - reserve
        if left < 120:
            detail[label] = {'skipped': 'wall-clock budget exhausted'}
            return None
        return left

    result = {'metric': 'Helmholtz solves/sec/chip', 'value': 0.0,
              'unit': 'solves/s', 'vs_baseline': 0.0, 'detail': {}}
    detail = result['detail']

    def _checkpoint():
        'Persist AND print the newest complete result (last-line-wins).'
        _flush_partial(result)
        print(json.dumps(result), flush=True)

    # every row appears in the flushed detail from the very start, so a
    # killed run is always distinguishable from a crash or a skip
    _EXTRA_ROWS = ('gradient', 'layered', 'marmousi', 'eurus',
                   'eurus_layered', 'freqblock', 'gradient_marmousi',
                   'multiscale')
    for label in ('tpu', 'lu_baseline') + _EXTRA_ROWS:
        detail[label] = {'skipped': 'not reached'}

    platform, probes = _probe_with_backoff(min(float(
        os.environ.get('ZT_BENCH_PROBE_WINDOW', 240)), budget / 5))
    if platform is None:
        # TPU runtime hung at init across all retries: fall back to CPU
        # so the benchmark still produces a (clearly labelled) number
        os.environ['ZT_BENCH_FORCE_CPU'] = '1'
        platform = 'cpu-fallback(tpu-init-hang;%d probes)' % probes

    if os.environ.get('ZT_BENCH_FORCE_CPU'):
        sizes = [min(BENCH_N, 512), 256]
    else:
        sizes = [BENCH_N, BENCH_N // 2, BENCH_N // 4]

    detail['platform_probe'] = platform
    detail['requested_grid'] = BENCH_N
    detail.setdefault('row_seconds', {})['probe'] = round(
        time.time() - t_start, 1)
    _checkpoint()

    measured = None
    for n in sizes:
        left = _under_budget('tpu', detail)
        if not left:
            break
        # the per-component breakdown costs ~8 min of cold compiles;
        # run it only on clearly-extended budgets (rehearsals) — at the
        # 1450 s production default the driver window cannot absorb it
        extra = {} if left > 2000 else {'ZT_BENCH_COMPONENTS': 0}
        out = _measure_subprocess('hom', timeout=left, ZT_BENCH_N=n,
                                  **extra)
        if out and 'throughput' in out:
            measured = out
            measured['grid'] = n
            break
        detail.setdefault('failures', {})[str(n)] = out
        _checkpoint()
    if measured is None:
        if detail.get('tpu', {}).get('skipped') == 'not reached':
            detail['tpu'] = {'skipped': 'all grid sizes failed'}
        _checkpoint()
        return

    n = measured['grid']
    tpu_throughput = measured['throughput']
    detail['tpu'] = measured['info']
    kind = measured['info'].get('roofline', {}).get('device_kind', '')
    if kind and 'v5p' not in kind.lower():
        # goal normalization (VERDICT r4 weak #8): BASELINE.md names a
        # v5p-8 (2765 GB/s peak HBM/chip); record what this run's
        # bandwidth-bound numbers are measured on so the ratio is not
        # silently under-read
        detail['hardware_note'] = (
            'measured on "%s" (not the v5p named in BASELINE.md; v5p '
            'has ~%.1fx this chip\'s HBM bandwidth and this solver is '
            'bandwidth-bound — vs_baseline is NOT rescaled)'
            % (kind, 2765e9 / (_peak_bw(kind) or 2765e9)))
    result['metric'] = (
        'Helmholtz solves/sec/chip at %d^2, %d sources through one '
        'prepared operator (batches of %d); vs_baseline = vs single-'
        'core SuperLU amortized over 151 RHS/factorization'
        % (n, measured['info'].get('nsrc_total', BENCH_NSRC),
           BENCH_NSRC))
    result['value'] = round(tpu_throughput, 4)
    _checkpoint()

    detail.setdefault('row_seconds', {})['headline'] = round(
        time.time() - t_start, 1)
    lu_throughput, lu_info = measure_lu_baseline(n, BENCH_NSRC)
    detail['lu_baseline'] = lu_info
    detail['lu_throughput'] = lu_throughput
    # headline comparator (VERDICT r4 #2): the LU amortized at the
    # reference's own survey scale (151 sources/factorization, Test
    # Inversion.ipynb) — the comparator MOST favorable to the
    # reference. The looser same-16-RHS ratio stays in the detail.
    result['vs_baseline'] = round(
        tpu_throughput / lu_info['lu_throughput_151src'], 2)
    detail['vs_lu_151src_amortized'] = result['vs_baseline']
    detail['vs_lu_16src_amortized'] = round(
        tpu_throughput / lu_throughput, 2)
    _checkpoint()

    run_extras = RUN_EXTRAS and not os.environ.get('ZT_BENCH_FORCE_CPU')

    def _lu_scaled(grid):
        '''
        LU factor/solve times rescaled from the measured LU_N grid,
        with the cache-fitted exponents when available (two measured
        points, 512^2 + 1024^2 — VERDICT r4 weak #7).
        '''
        s = (grid * grid) / (LU_N * LU_N)
        tf = lu_info['t_factor_measured'] * s ** lu_info.get(
            'factor_exponent', 1.5)
        p_s = lu_info.get('solve_exponent')
        if p_s is not None:
            ts = lu_info['t_solve_measured'] * s ** float(p_s)
        else:
            ts = (lu_info['t_solve_measured'] * s
                  * (np.log(grid * grid) / np.log(LU_N * LU_N)))
        return tf, ts

    # Extras, in priority order. The gradient row runs FIRST: it is the
    # BASELINE.md metric that has never been recorded on TPU (rounds 1-2
    # ran out of budget before reaching it at the old last position).
    def _grad_row(label='gradient', medium='layered', grid=None):
        left = _under_budget(label, detail)
        if not left:
            return
        grid = grid or n
        # per-row cap: the 2048^2 gradient is the budget hog that
        # starved every later row in rounds 2-4; capping it loses at
        # most this one row instead of everything after it
        cap = float(os.environ.get('ZT_BENCH_GRAD_CAP', 700))
        grad = _measure_subprocess('gradient', timeout=min(left, cap),
                                   ZT_BENCH_N=grid,
                                   ZT_BENCH_GRAD_MEDIUM=medium)
        if grad and 'wall_s' in grad:
            # LU-gradient estimate: per frequency one factorization plus
            # forward + adjoint batched triangular solves (the reference
            # "mux" path, zephyr/middleware/problem.py:144-152)
            tf, ts = _lu_scaled(grid)
            lu_grad = GRAD_NFREQ * (tf + 2 * BENCH_NSRC * ts)
            detail[label] = dict(grad['info'],
                                 wall_s=round(grad['wall_s'], 2),
                                 lu_gradient_estimate_s=round(lu_grad, 2),
                                 vs_lu=round(lu_grad / grad['wall_s'], 2))
        else:
            detail[label] = grad or {'skipped': 'no output'}

    def _throughput_row(label, mode, **env):
        left = _under_budget(label, detail)
        if not left:
            return
        out = _measure_subprocess(mode, timeout=left, **env)
        if out and 'throughput' in out:
            thr = out['throughput']
            info = out['info']
            # flag rows whose solve missed its tolerance by far so the
            # record is not mistaken for a converged result. For the
            # TTI rows this is currently EXPECTED on TPU: the block
            # preconditioner is marginally stable in complex64 and the
            # chunked driver returns the best iterate it reached
            # (round-5 root cause, STATUS.md item 6) — the same solve
            # converges on XLA:CPU
            if float(info.get('relres', 0.0) or 0.0) > 100 * 1e-5:
                info['suspect_runtime'] = (
                    'NOT converged: best-iterate record (TTI block '
                    'preconditioner is marginally stable on this '
                    'backend - STATUS.md round-5 item 6)')
            row_grid = info.get('grid', n)
            if row_grid != n or str(info.get('medium',
                                             '')).startswith('TTI'):
                # rescale the LU comparator to THIS row's grid; the
                # Eurus system has 2N unknowns (reference
                # zephyr/backend/eurus.py:430-464: A = bmat 2x2), so
                # its factor costs ~(2)^1.5 and solves ~2x the scalar
                # model at the same grid
                tf, ts = _lu_scaled(row_grid)
                if str(info.get('medium', '')).startswith('TTI'):
                    tf, ts = tf * 2 ** 1.5, ts * 2
                lu_thr = BENCH_NSRC / (tf + BENCH_NSRC * ts)
            else:
                lu_thr = lu_throughput
            detail[label] = dict(info,
                                 solves_per_s=round(thr, 4),
                                 vs_lu=round(thr / lu_thr, 2))
        else:
            detail[label] = out or {'skipped': 'no output'}

    def _freqblock_row():
        'BASELINE staged config 3: 16 freqs x 96 sources, layered.'
        left = _under_budget('freqblock', detail)
        if not left:
            return
        cap = float(os.environ.get('ZT_BENCH_FB_CAP', 520))
        out = _measure_subprocess('freqblock', timeout=min(left, cap))
        if out and 'wall_s' in out:
            info = out['info']
            fb_n = info['grid']
            tf, ts = _lu_scaled(fb_n)
            nf, ns = info['nfreq'], info['nsrc']
            lu_wall = nf * (tf + ns * ts)
            lu_wall_151 = nf * (tf + 151 * ts)   # per-source cost at the
            # reference's 151-source amortization (Test Inversion config)
            solves = nf * ns
            detail['freqblock'] = dict(
                info, wall_s=round(out['wall_s'], 2),
                solves_per_s=round(solves / out['wall_s'], 4),
                lu_wall_estimate_s=round(lu_wall, 2),
                vs_lu=round(lu_wall / out['wall_s'], 2),
                vs_lu_151src_amortized=round(
                    (lu_wall_151 / 151 * ns) / out['wall_s'], 2))
        else:
            detail['freqblock'] = out or {'skipped': 'no output'}

    def _multiscale_row():
        'BASELINE staged config 5: frequency-continuation FWI, timed.'
        left = _under_budget('multiscale', detail)
        if not left:
            return
        out = _measure_subprocess('multiscale', timeout=left)
        if out and 'wall_s' in out:
            info = out['info']
            ms_n = info['grid']
            tf, ts = _lu_scaled(ms_n)
            # per gradient evaluation per frequency the LU path pays one
            # factorization (the model changed) + forward & adjoint
            # batched solves (the reference mux,
            # zephyr/middleware/problem.py:144-152); the data
            # generation adds one factor + forward per frequency
            nblk = len(info['blocks'])
            nf_blk = info['nfreq'] // max(nblk, 1)
            ns = info['nsrc']
            lu_wall = (nblk * info['iters_per_block'] * nf_blk
                       * (tf + 2 * ns * ts)
                       + info['nfreq'] * (tf + ns * ts))
            total_wall = out['wall_s'] + info.get('data_gen_s', 0.0)
            detail['multiscale'] = dict(
                info, wall_s=round(out['wall_s'], 2),
                lu_wall_estimate_s=round(lu_wall, 2),
                vs_lu=round(lu_wall / total_wall, 2))
        else:
            detail['multiscale'] = out or {'skipped': 'no output'}

    # rough-model FWI gradient at 512^2: the de-flattered config-4
    # model costs ~400 iterations/solve at 2048^2 — at 1024^2 the row
    # blew a 3300 s rehearsal budget; 512^2 (91 iters/solve) keeps the
    # rough-model gradient evidence inside the driver window
    gradm_n = int(os.environ.get('ZT_BENCH_GRADM_N', min(BENCH_N, 512)))
    rows = [('gradient', _grad_row),
            ('layered', lambda: _throughput_row('layered', 'layered',
                                                ZT_BENCH_N=n)),
            ('marmousi', lambda: _throughput_row('marmousi', 'marmousi',
                                                 ZT_BENCH_N=n)),
            ('eurus', lambda: _throughput_row('eurus', 'eurus')),
            ('eurus_layered',
             lambda: _throughput_row('eurus_layered', 'eurus_layered')),
            ('freqblock', _freqblock_row),
            ('gradient_marmousi',
             lambda: _grad_row('gradient_marmousi', medium='marmousi',
                               grid=gradm_n)),
            ('multiscale', _multiscale_row)]
    timing = detail.setdefault('row_seconds', {})
    for label, fn in rows:
        t_row = time.time()
        if not run_extras:
            detail[label] = {'skipped': 'extras disabled (%s)'
                             % ('cpu fallback'
                                if os.environ.get('ZT_BENCH_FORCE_CPU')
                                else 'ZT_BENCH_EXTRAS=0')}
        else:
            fn()
        timing[label] = round(time.time() - t_row, 1)
        timing['_elapsed'] = round(time.time() - t_start, 1)
        _checkpoint()


if __name__ == '__main__':
    mode = os.environ.get('ZT_BENCH_MEASURE_ONLY')
    if mode:
        _run_measure_only(mode)
    else:
        main()
