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

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
'''

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_N = int(os.environ.get('ZT_BENCH_N', 2048))
BENCH_NSRC = int(os.environ.get('ZT_BENCH_NSRC', 16))
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
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    return jax


def _solver_cfg():
    from zephyr_tpu.solver.helmholtz import SolverConfig
    return SolverConfig(tol=1e-5, maxiter=2000, mg_coarse='inv',
                        mg_min_size=32, fft_mode='strat', fft_scale=2,
                        hybrid_comp='fused', mg_nu1=2, mg_nu2=1)


def _layered_c(n, dtype=np.float32):
    c = np.zeros((n, n), dtype=dtype)
    for i, v in enumerate([1500., 2000., 2500., 3000.]):
        c[i * n // 4:(i + 1) * n // 4] = v
    return c


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
    # recursive-residual drift.
    chunk = int(os.environ.get('ZT_BENCH_CHUNK', 16))

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

    c_real = (cval * np.ones((n, n), dtype=np.float32) if medium == 'hom'
              else _layered_c(n))
    op = realio_jit(prep_fn)(jnp.asarray(c_real))

    rng = np.random.default_rng(0)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)   # device-resident C-pair RHS

    solver = make_chunked_solver(cfg, chunk=chunk)

    # warm-up / compile
    _, iters, relres = solver(op, b)

    times = []
    for _ in range(BENCH_REPEATS):
        t0 = time.time()
        _, iters, relres = solver(op, b)
        times.append(time.time() - t0)
    t = min(times)

    info = {
        'iters': int(iters),
        'relres': float(relres),
        'device': str(jax.devices()[0]),
        'freq_hz': freq,
        'wavelengths_across': n / BENCH_WAVELEN_CELLS,
        'chunk': chunk,
        'medium': medium,
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


def measure_eurus(n, nsrc):
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

    op = realio_jit(prep_fn)(jnp.asarray(
        cval * np.ones((n, n), np.float32)))
    rng = np.random.default_rng(1)
    pos = rng.integers(n // 8, 7 * n // 8, size=(nsrc, 2)).astype(np.int32)
    b = realio_jit(make_rhs)(pos)
    solver = make_chunked_solver(cfg, chunk=chunk)
    _, iters, relres = solver(op, b)
    t0 = time.time()
    _, iters, relres = solver(op, b)
    t = time.time() - t0
    return nsrc / t, {'iters': int(iters), 'relres': float(relres),
                      'grid': n, 'medium': 'TTI hom',
                      'device': str(jax.devices()[0])}


def measure_gradient(n, nsrc, nfreq):
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
    c = _layered_c(n, np.float64)
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
                     'finite': bool(np.isfinite(grad).all())}


def measure_lu_baseline(n, nsrc):
    '''
    Single-core SciPy SuperLU at an LU_N x LU_N version of the same
    physics, extrapolated to n x n: factor time x (N/N0)^1.5, solve time
    x (N/N0) x log ratio. Throughput = nsrc / (factor + nsrc * solve).
    '''

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    import jax
    # the LU baseline runs in the parent process: never initialize the
    # (possibly wedged) TPU backend here
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from zephyr_tpu.ops.minizephyr_coeff import minizephyr_planes
    from zephyr_tpu.ops.stencil import OFFSETS

    cval = 1500.0
    freq = cval / BENCH_WAVELEN_CELLS
    planes = np.asarray(minizephyr_planes(
        (cval * jnp.ones((LU_N, LU_N))).astype(jnp.complex64),
        jnp.ones((LU_N, LU_N), jnp.float32), freq))

    nz = nx = LU_N
    N0 = nz * nx
    I, J = np.mgrid[0:nz, 0:nx]
    rows = (I * nx + J).ravel()
    rr, cc, vv = [], [], []
    for k, (dz, dx) in enumerate(OFFSETS):
        In, Jn = I + dz, J + dx
        valid = ((In >= 0) & (In < nz) & (Jn >= 0) & (Jn < nx)).ravel()
        cols = (np.clip(In, 0, nz - 1) * nx + np.clip(Jn, 0, nx - 1)).ravel()
        rr.append(rows[valid])
        cc.append(cols[valid])
        vv.append(planes[k].ravel()[valid])
    A = sp.coo_matrix((np.concatenate(vv),
                       (np.concatenate(rr), np.concatenate(cc))),
                      shape=(N0, N0)).tocsc()

    t0 = time.time()
    lu = spla.splu(A)
    t_factor = time.time() - t0

    b = np.zeros((N0, nsrc), dtype=np.complex64)
    for i in range(nsrc):
        b[(LU_N // 2) * LU_N + LU_N // 2 + i, i] = 1.0
    t0 = time.time()
    lu.solve(b)
    t_solve = (time.time() - t0) / nsrc

    N = n * n
    scale = N / N0
    t_factor_big = t_factor * scale ** 1.5
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
                        'amortization': 'factor amortized over %d RHS'
                                        % nsrc,
                        'lu_throughput_151src': amortized_151}


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
    if mode in ('hom', 'layered'):
        throughput, info = measure_tpu(BENCH_N, BENCH_NSRC, medium=mode)
        print(json.dumps({'throughput': throughput, 'info': info}))
    elif mode == 'eurus':
        throughput, info = measure_eurus(EURUS_N, BENCH_NSRC)
        print(json.dumps({'throughput': throughput, 'info': info}))
    elif mode == 'gradient':
        t_total, info = measure_gradient(BENCH_N, BENCH_NSRC, GRAD_NFREQ)
        print(json.dumps({'wall_s': t_total, 'info': info}))


def main():
    # Global wall-clock budget: the headline measurement always runs;
    # each extra (layered/eurus/gradient) is attempted only while under
    # budget, so a slow tunnel or cold compile cache degrades the detail
    # instead of timing out the whole benchmark with no output.
    t_start = time.time()
    budget = float(os.environ.get('ZT_BENCH_TOTAL_BUDGET', 2100))

    def _under_budget(label, detail):
        left = budget - (time.time() - t_start)
        if left < 120:
            detail[label] = {'skipped': 'wall-clock budget exhausted'}
            return None
        return left

    platform = _probe_device()
    if platform is None:
        # TPU runtime hung at init: fall back to CPU so the benchmark
        # still produces a (clearly labelled) number
        os.environ['ZT_BENCH_FORCE_CPU'] = '1'
        platform = 'cpu-fallback(tpu-init-hang)'

    if os.environ.get('ZT_BENCH_FORCE_CPU'):
        sizes = [min(BENCH_N, 512), 256]
    else:
        sizes = [BENCH_N, BENCH_N // 2, BENCH_N // 4]

    measured = None
    for n in sizes:
        out = _measure_subprocess('hom', ZT_BENCH_N=n)
        if out and 'throughput' in out:
            measured = out
            measured['grid'] = n
            break
    if measured is None:
        print(json.dumps({'metric': 'Helmholtz solves/sec/chip',
                          'value': 0.0, 'unit': 'solves/s',
                          'vs_baseline': 0.0,
                          'detail': 'all grid sizes failed'}))
        return

    n = measured['grid']
    lu_throughput, lu_info = measure_lu_baseline(n, BENCH_NSRC)
    tpu_throughput = measured['throughput']

    detail = {'tpu': measured['info'], 'lu_baseline': lu_info,
              'lu_throughput': lu_throughput,
              'requested_grid': BENCH_N,
              'platform_probe': platform}

    if RUN_EXTRAS and not os.environ.get('ZT_BENCH_FORCE_CPU'):
        left = _under_budget('layered', detail)
        if left:
            lay = _measure_subprocess('layered', timeout=left,
                                      ZT_BENCH_N=n)
            if lay and 'throughput' in lay:
                lay_thr = lay['throughput']
                detail['layered'] = dict(lay['info'],
                                         solves_per_s=round(lay_thr, 4),
                                         vs_lu=round(lay_thr
                                                     / lu_throughput, 2))
            else:
                detail['layered'] = lay
        left = _under_budget('eurus', detail)
        if left:
            eur = _measure_subprocess('eurus', timeout=left)
            if eur and 'throughput' in eur:
                detail['eurus'] = dict(eur['info'],
                                       solves_per_s=round(
                                           eur['throughput'], 4))
            else:
                detail['eurus'] = eur
        left = _under_budget('gradient', detail)
        grad = (_measure_subprocess('gradient', timeout=left,
                                    ZT_BENCH_N=n) if left else None)
        if grad and 'wall_s' in grad:
            # LU-gradient estimate: per frequency one factorization plus
            # forward + adjoint batched triangular solves (the reference
            # "mux" path, zephyr/middleware/problem.py:144-152)
            lu_grad = GRAD_NFREQ * (lu_info['t_factor_extrapolated']
                                    + 2 * BENCH_NSRC
                                    * lu_info['t_solve_extrapolated'])
            detail['gradient'] = dict(grad['info'],
                                      wall_s=round(grad['wall_s'], 2),
                                      lu_gradient_estimate_s=round(
                                          lu_grad, 2),
                                      vs_lu=round(lu_grad
                                                  / grad['wall_s'], 2))
        elif grad is not None:
            detail['gradient'] = grad

    detail['vs_lu_151src_amortized'] = round(
        tpu_throughput / lu_info['lu_throughput_151src'], 2)
    result = {
        'metric': 'Helmholtz solves/sec/chip at %d^2, %d sources batched'
                  % (n, BENCH_NSRC),
        'value': round(tpu_throughput, 4),
        'unit': 'solves/s',
        'vs_baseline': round(tpu_throughput / lu_throughput, 2),
        'detail': detail,
    }
    print(json.dumps(result))


if __name__ == '__main__':
    mode = os.environ.get('ZT_BENCH_MEASURE_ONLY')
    if mode:
        _run_measure_only(mode)
    else:
        main()
