'''
The zephyr_tpu Helmholtz solve: multigrid-preconditioned BiCGStab wrapped in
``lax.custom_linear_solve`` for exact implicit differentiation.

This is the drop-in TPU replacement for the reference's
``u = Ainv * rhs`` direct solve (reference zephyr/backend/
discretization.py:79-103). Differences by design:

- The operator is the matrix-free stencil apply over coefficient planes.
- The solve is iterative (BiCGStab + complex-shifted-Laplacian multigrid),
  so there is no factorization; throughput comes from batching right-hand
  sides (vmap) and frequencies (vmap/shard_map) instead of factor reuse.
- Gradients: because the solve is expressed through
  ``lax.custom_linear_solve``, JVPs/VJPs of the wavefield w.r.t. the
  coefficient planes (and hence w.r.t. c, rho through the differentiable
  plane builders) are computed by ONE extra solve with the same (or
  transposed) operator — the implicit-function / adjoint-state method.
  This subsumes the reference's hand-written Jvec/Jtvec
  (zephyr/middleware/problem.py:87-163).
'''

from functools import partial
from typing import NamedTuple, Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.stencil import (apply_block_stencil, apply_block_stencil_fast,
                           transpose_block_planes)
from .multigrid import build_hierarchy, transpose_hierarchy, v_cycle
from .krylov import bicgstab, gmres, fgmres, gmres_cycle


class SolverConfig(NamedTuple):
    '''
    Static configuration of the iterative Helmholtz solver.

    Defaults were selected by parameter sweeps on the reference's oracle
    configurations and on 512^2-2048^2 TPU runs with the hybrid
    (spectral + multigrid) preconditioner: ~25 outer iterations at 32
    wavelengths across, ~48 at 128 wavelengths (homogeneous, tol 1e-5).
    Key levers: ``precond``/``fft_shift`` (the spectral interior solve),
    ``pml_cap`` (capped-PML preconditioner planes — see
    ops/minizephyr_coeff.py), and ``krylov`` ('auto' picks BiCGStab for
    scalar operators, restarted GMRES for TTI block systems).
    '''
    tol: float = 1e-7
    maxiter: int = 500
    mg_omega: float = 0.5     # Jacobi damping in the MG smoother
    mg_nu1: int = 2           # pre-smoothing sweeps
    mg_nu2: int = 2           # post-smoothing sweeps
    mg_min_size: int = 32     # coarsest-grid size for the dense solve
    mg_coarse_iters: int = 12  # coarse BiCGStab cap (iterative coarse)
    shift: complex = 0.5j     # shifted-Laplacian beta (k^2 -> (1-beta) k^2)
    mg_coarse: str = 'lu'     # 'lu' (dense direct) or 'iterative'
    pml_cap: float = 1.0      # preconditioner PML strength cap (x |omega|)
    krylov: str = 'auto'      # 'auto' (bicgstab for scalar systems,
                              # gmres for block/TTI systems — BiCGStab's
                              # short recurrence diverges on the Eurus
                              # 2x2 block system in complex64),
                              # 'bicgstab', 'gmres', or 'fgmres'
                              # (flexible GMRES: the preconditioner is
                              # wrapped in fgmres_inner steps of inner
                              # GMRES — a deeper effective subspace per
                              # stored basis vector, for restart-limited
                              # block/TTI solves)
    gmres_restart: int = 40
    fgmres_inner: int = 4     # inner GMRES steps per FGMRES direction
                              # (0 = plain flexible GMRES on the base
                              # preconditioner)
    precond: str = 'hybrid'   # 'hybrid' (spectral + MG) or 'mg'
    mg_smoother: str = 'auto'  # 'auto' (alternating z/x line smoothing
                              # for block/TTI systems, fused damped
                              # Jacobi for scalar operators), 'jacobi',
                              # or 'line' (block systems only; scalar
                              # operators always smooth with Jacobi).
                              # Block-Jacobi cannot damp the PML-stretch-
                              # coupled error modes of the Eurus 2x2
                              # system under velocity contrast: layered
                              # TTI stalls at 1e-2 with Jacobi and
                              # converges with line smoothing, which
                              # also cuts homogeneous TTI from 80 to 60
                              # iterations (128^2, tol 1e-5).
    fft_shift: Any = 'auto'   # CSLP shift of the spectral solve (complex,
                              # or 'auto': 0.03j near-homogeneous / 0.25j
                              # heterogeneous, from the mass-plane contrast)
    fft_delta: float = 1e-3   # relative symbol-magnitude clamp
    fft_scale: int = 1        # spectral-solve resolution: 1 = full grid;
                              # 2 = solve the Galerkin-coarsened interior
                              # symbol at half resolution between the MG
                              # transfer operators (4x cheaper FFTs; the
                              # resonant ring at >= 8 cells/wavelength
                              # stays far below the coarse Nyquist)
    hybrid_comp: str = 'mult'  # composition of the spectral solve P and
                              # the V-cycle V in the hybrid
                              # preconditioner:
                              # 'mult': M r = P r + V (r - A P r) — P at
                              #   fine resolution (through the transfer
                              #   ops when fft_scale=2) plus one extra
                              #   fine-grid matvec per application;
                              # 'add':  M r = P r + V r — cheaper per
                              #   application but measured 112 vs 48
                              #   iterations at 2048^2 homogeneous:
                              #   strictly worse, kept for experiments;
                              # 'fused' (fft_scale=2, scalar, forward
                              #   only): ONE cycle where the PCR solve
                              #   becomes the level-1 coarse boost —
                              #   fine pre-smooth, restrict, xc = PCR rc,
                              #   coarse TRUE-operator residual, V-cycle
                              #   from level 1, prolong, fine post-smooth.
                              #   Same algebraic family as 'mult' with
                              #   the fine<->half transfer passes and the
                              #   fine matvec deduplicated (~25% cheaper
                              #   per application). Transpose solves fall
                              #   back to 'mult'.
    strat_panels: int = 0     # x-panel count of the stratified interior
                              # solve: 0 = auto (the production default:
                              # drivers resolve it host-side from the
                              # model's lateral contrast via
                              # ``resolve_panels`` — laterally
                              # heterogeneous media get ~nx/256 panels,
                              # layered/homogeneous stay global; an
                              # unresolved 0 behaves as 1); 1 = global
                              # per-row means; P > 1 partitions x into P
                              # overlapping panels (partition-of-unity
                              # blend) whose per-row means capture
                              # LATERAL velocity structure — the
                              # Marmousi-style iteration cure (2048^2
                              # rough model, 8 panels: 940 -> 403
                              # iterations, 2.0x wall; the pre-round-5
                              # smooth model measured 564 -> 169;
                              # scalar operators only)
    strat_overlap: int = 16   # panel overlap halo (cells per side)
    strat_taper: str = 'in'   # where the panel partition-of-unity
                              # weights act (see
                              # stratified.stratified_apply_panels):
                              # 'in' (default: taper the gathered
                              # residual — the panel-FFT wraparound
                              # cure), 'out' (taper the solved output;
                              # the original scheme, regresses 256^2
                              # Marmousi), 'sym', or 'dst'
                              # (zero-Dirichlet panel solves via odd
                              # extension, 2x panel cost)
    strat_dft: str = 'fft'    # x-transform implementation of the
                              # stratified interior solve: 'fft'
                              # (default: jnp.fft), 'dft' (DFT-matrix
                              # matmuls on the MXU), 'auto' (matmuls
                              # for solve widths <= 2048). CPU parity
                              # is clean; on the axon TPU runtime the
                              # HIGHEST-precision complex matmul path
                              # measured no faster than the FFT and the
                              # 2048^2 dft headline failed its run, so
                              # fft stays the production default
    fft_mode: str = 'strat'   # 'strat' (default) = depth-stratified
                              # interior solve (per-row mean
                              # coefficients, x-FFT + tridiagonal-in-z
                              # cyclic reduction): exact for layered
                              # media, dominates or ties '2d' on every
                              # measured medium class (512^2 iterations:
                              # layered 39 vs 231, vertical gradient 35
                              # vs 157, homogeneous 19 vs 20, random 30
                              # vs 31, x-varying 212 vs 234). Block/TTI
                              # (B=2) systems use the block-tridiagonal
                              # stratified family built from the FINE
                              # planes (see prepare_operator); other
                              # block sizes fall back to '2d'.


def resolve_solver_config(opts=None):
    '''
    Build a SolverConfig from a user options dict with the
    precision-aware default tolerance applied: SolverConfig's 1e-7
    default is below single-precision resolution, so on the complex64
    (TPU) path an unconfigured solve would burn ``maxiter`` iterations
    on every RHS and still miss the target — 1e-5 is the reachable
    production default there (and the BASELINE.md agreement target).
    complex128 (x64) keeps the full 1e-7. This is the single source of
    truth for both the backend (discretization.Ainv) and middleware
    (problem.Jvec/Jtvec) solve paths.
    '''

    opts = dict(opts or {})
    if not jax.config.jax_enable_x64:
        opts.setdefault('tol', 1e-5)
    return SolverConfig(**opts)


def resolve_panels(config, c, nx=None, core=256, overlap=32,
                   contrast_threshold=1.02):
    '''
    Host-side resolution of ``strat_panels=0`` ('auto'), the production
    default of the x-panelled stratified interior solve: measure the
    LATERAL (within-row) relative velocity contrast of the model over
    the interior window; if the medium is laterally heterogeneous,
    partition x into ~nx/core panels with an ``overlap``-cell
    partition-of-unity halo, else keep the global per-row solve (panels
    cost ~25%% per application and are pure overhead on layered or
    homogeneous media). Measured at 2048^2 on the ROUGH Marmousi-style
    bench model, tol 1e-5: 940 -> 403 outer iterations (2.0x wall);
    at 512^2 (2 panels) the effect is neutral (91/91) — the win needs
    panel cores narrow relative to the lateral structure. Layered and
    homogeneous media resolve to the global solve and are untouched.

    ``c`` is the (host) velocity model; ``nx`` overrides the panelled
    width when the solve runs on a coarser grid than ``c`` (per-
    frequency grid adaptation). Explicit ``strat_panels`` values pass
    through unchanged. Call ONCE per medium at driver level — the
    decision must be static under jit.
    '''

    cfg = config
    c = np.abs(np.asarray(c, dtype=np.complex128))
    nz, nxc = c.shape[-2:]
    nx = int(nx or nxc)
    zi = slice(nz // 8, nz - nz // 8)
    xi = slice(nxc // 8, nxc - nxc // 8)
    w = c[..., zi, xi]
    # OPT-IN (ZT_NU_ADAPT=1): near-homogeneous media drop the second
    # fine-level pre-smoothing sweep. Measured at 512^2 hom the outer
    # count is unchanged (25/25) and the sweep is a full VPU-bound
    # stencil apply — but at the 2048^2 production headline nu1=1
    # costs 46 -> 51 iterations and nets SLOWER (2.55 vs 2.61
    # solves/s), so the adaptation is off by default
    total_contrast = float(w.max() / max(w.min(), 1e-30))
    import os as _os
    if (total_contrast < contrast_threshold and cfg.mg_nu1 == 2
            and _os.environ.get('ZT_NU_ADAPT', '0') == '1'):
        cfg = cfg._replace(mg_nu1=1)
    if cfg.strat_panels != 0:
        return cfg
    rm = np.maximum(w.mean(axis=-1, keepdims=True), 1e-30)
    rn = w / rm
    contrast = float(rn.max() / max(rn.min(), 1e-30))
    P = int(max(1, round(nx / core)))
    if contrast < contrast_threshold or P < 2:
        return cfg._replace(strat_panels=1)
    return cfg._replace(strat_panels=P, strat_overlap=overlap)


def shifted_velocity(c, shift=0.5j):
    '''
    Velocity substitution implementing the complex-shifted-Laplacian
    preconditioner: building the operator with c' = c / sqrt(1 - i*beta)
    turns the mass term omega^2/c^2 into (1 - i*beta) omega^2/c^2.
    '''

    return jnp.asarray(c) / jnp.sqrt(1.0 - shift)


class HelmholtzOperator(NamedTuple):
    '''
    A prepared Helmholtz system: coefficient planes plus the multigrid
    hierarchies (forward and transposed) built from the *shifted* operator,
    and (for the hybrid preconditioner) the regularized inverse Fourier
    symbol of the interior operator. This is a pytree, so it can be passed
    through jit/vmap/shard_map.
    '''

    planes: Any       # (B, B, 9, nz, nx)
    hier: Any         # MGHierarchy of the shifted operator
    hierT: Any        # MGHierarchy of the transposed shifted operator
    fft_sinv: Any = None   # (B, B, nz, nx) inverse interior symbol
    planesT: Any = None    # transposed true planes (hybrid transpose path)
    strat: Any = None      # (l, d, u) stratified interior tridiagonals
                           # (fft_mode='strat'; replaces fft_sinv)
    cplanes: Any = None    # Galerkin-coarsened TRUE planes (the level-1
                           # residual operator of hybrid_comp='fused')


def _mean_interior_coeffs(planes):
    '''
    Mean stencil coefficients (B, B, 9) over the central quarter window,
    which excludes the boundary ring, the PML frame, and free-surface rows
    for any sensible nPML < min(nz, nx)/4.
    '''

    nz, nx = planes.shape[-2:]
    z0, z1 = nz // 4, max(nz // 4 + 1, (3 * nz) // 4)
    x0, x1 = nx // 4, max(nx // 4 + 1, (3 * nx) // 4)
    return jnp.mean(planes[..., z0:z1, x0:x1], axis=(-2, -1))


def _fft_symbol_inverse(planes, precond_planes, config):
    '''
    Regularized inverse Fourier symbol of the constant-coefficient interior
    operator, at the spectral CSLP shift ``config.fft_shift``.

    The true operator decomposes as A = L + M (Laplacian-like + mass), and
    the CSLP substitution multiplies the mass term by (1 - shift)
    (see ``shifted_velocity``), so with mean interior coefficients c0 of
    the true planes and cP of the ``config.shift``-shifted precond planes,
    the mass coefficients are cM = (c0 - cP) / shift and the symbol at any
    other shift is assembled analytically — no third plane build.

    Returns (B, B, nz, nx) pointwise-inverse blocks (B <= 2), with the
    symbol determinant clamped to ``fft_delta`` times its max magnitude so
    near-resonant Fourier modes stay bounded.
    '''

    from ..ops.stencil import OFFSETS

    c0 = _mean_interior_coeffs(planes)            # (B, B, 9) true
    cP = _mean_interior_coeffs(precond_planes)    # (B, B, 9) shifted
    shift = jnp.asarray(config.shift, dtype=c0.dtype)
    cM = (c0 - cP) / shift

    fft_shift = config.fft_shift
    if isinstance(fft_shift, str):  # 'auto'
        # Spatial contrast of the mass term (pointwise (A - A_shift)/shift
        # center plane ~ omega^2 / c^2): a small spectral shift is optimal
        # when the interior symbol is exact (near-homogeneous media), but
        # destabilizes the outer iteration under strong heterogeneity —
        # measured: 0.03 gives 48 vs 128 iterations at 2048^2 homogeneous,
        # while layered 1500->3000 m/s media need >= 0.25 to converge.
        from ..ops.stencil import CENTER
        nz, nx = planes.shape[-2:]
        z0, z1 = nz // 4, max(nz // 4 + 1, (3 * nz) // 4)
        x0, x1 = nx // 4, max(nx // 4 + 1, (3 * nx) // 4)
        if planes.shape[0] > 1:
            # block (TTI) systems: the small near-homogeneous shift makes
            # the outer iteration diverge; use the damped setting always
            fft_shift = 0.25j
        else:
            mass = (planes[0, 0, CENTER, z0:z1, x0:x1]
                    - precond_planes[0, 0, CENTER, z0:z1, x0:x1]) / shift
            ma = jnp.abs(mass)
            tiny = jnp.finfo(ma.dtype).tiny
            contrast = jnp.sqrt(jnp.max(ma)
                                / jnp.maximum(jnp.min(ma), tiny))
            fft_shift = jnp.where(contrast < 1.05, 0.03, 0.25) * 1j
    cF = c0 - jnp.asarray(fft_shift).astype(c0.dtype) * cM

    B = planes.shape[0]
    nz, nx = planes.shape[-2:]
    kz = (2 * jnp.pi) * jnp.fft.fftfreq(nz).astype(jnp.real(c0).dtype)
    kx = (2 * jnp.pi) * jnp.fft.fftfreq(nx).astype(jnp.real(c0).dtype)
    KZ, KX = jnp.meshgrid(kz, kx, indexing='ij')
    # explicit multiply-add, NOT einsum: an einsum contraction lowers to
    # an MXU dot at default (bfloat16) precision on TPU, which destroys
    # the near-cancelling Laplacian part of the symbol (measured 23%
    # error in the inverse symbol -> divergent outer iteration)
    sym = jnp.zeros((B, B, nz, nx), dtype=c0.dtype)
    for k, (dz, dx) in enumerate(OFFSETS):
        phase = jnp.exp(1j * (KZ * dz + KX * dx)).astype(c0.dtype)
        sym = sym + cF[:, :, k, None, None] * phase

    def _clamp(d):
        a = jnp.abs(d)
        dmin = config.fft_delta * jnp.max(a)
        scale = jnp.where(a < dmin, dmin / jnp.maximum(a, 1e-30), 1.0)
        return d * scale.astype(d.dtype)

    if B == 1:
        return (1.0 / _clamp(sym[0, 0]))[None, None]
    if B == 2:
        a, bb = sym[0, 0], sym[0, 1]
        c, d = sym[1, 0], sym[1, 1]
        det = _clamp(a * d - bb * c)
        inv = jnp.stack([jnp.stack([d, -bb], 0), jnp.stack([-c, a], 0)], 0)
        return inv / det
    raise NotImplementedError('hybrid preconditioner: B > 2')


def prepare_operator(planes, precond_planes=None, config=SolverConfig(),
                     with_transpose=True, interior_mask=None):
    '''
    Build a HelmholtzOperator from coefficient planes. ``precond_planes``
    are the planes of the complex-shifted operator (defaults to the true
    planes, which works but converges more slowly at high frequency).
    The hierarchies and spectral symbol are built under stop_gradient: the
    preconditioner does not participate in differentiation.
    ``interior_mask`` marks extra Dirichlet-like rows to exclude from the
    multigrid coarse correction (overlapped-Schwarz slabs — see
    ``multigrid.build_hierarchy``).
    '''

    if precond_planes is None:
        precond_planes = planes
    pp = lax.stop_gradient(precond_planes)
    if interior_mask is not None:
        interior_mask = lax.stop_gradient(interior_mask)
    smoother = ('line' if planes.shape[0] > 1
                and config.mg_smoother in ('auto', 'line') else 'jacobi')
    hier = build_hierarchy(pp, min_size=config.mg_min_size,
                           coarse=config.mg_coarse, smoother=smoother,
                           interior_mask=interior_mask)
    hierT = transpose_hierarchy(hier) if with_transpose else None
    sinv = None
    planesT = None
    # the Galerkin-coarsened true/precond planes feed the reduced-
    # resolution spectral solve and the fused cycle's level-1 residual;
    # the B=2 stratified branch never consumes them (it always builds
    # from the FINE planes), so skip the coarsening work there
    block_strat = config.fft_mode == 'strat' and planes.shape[0] == 2
    need_coarse = (config.precond == 'hybrid'
                   and (config.fft_scale > 1
                        or config.hybrid_comp == 'fused')
                   and not block_strat)
    ctrue = cpp = None
    if need_coarse:
        # Galerkin-coarsened TRUE operator (preconditioner-internal:
        # stop_gradient throughout), used by the reduced-resolution
        # spectral solve. Interior masking matches build_hierarchy:
        # Dirichlet ring rows are excluded.
        from .multigrid import (_mask_ring_planes, _ring_mask,
                                _fix_empty_rows, galerkin_coarsen)
        tp = lax.stop_gradient(planes)
        nz, nx = tp.shape[-2:]
        rdtype = jnp.real(jnp.zeros((), tp.dtype)).dtype
        mask = _ring_mask(nz, nx, rdtype)
        if interior_mask is not None:
            mask = mask * interior_mask.astype(rdtype)
        ctrue = _fix_empty_rows(galerkin_coarsen(
            _mask_ring_planes(tp, mask)))
        if len(hier.levels) > 1:
            cpp = hier.levels[1].planes
        else:
            cpp = _fix_empty_rows(galerkin_coarsen(
                _mask_ring_planes(pp, mask)))

    strat = None
    if config.precond == 'hybrid':
        if config.fft_scale > 1:
            assert config.fft_scale == 2, 'fft_scale: only 1 or 2'
            src_true, src_pp = ctrue, cpp
        else:
            src_true, src_pp = lax.stop_gradient(planes), pp
        if config.fft_mode == 'strat' and planes.shape[0] == 1:
            from .stratified import (stratified_coeffs,
                                     stratified_coeffs_panels,
                                     pcr_precompute, panel_layout)
            if config.strat_panels > 1:
                l, d, u = stratified_coeffs_panels(
                    src_true, src_pp, config.shift, config.fft_shift,
                    config.strat_panels, config.strat_overlap,
                    dst=config.strat_taper == 'dst')
                _, w_solve = panel_layout(src_true.shape[-1],
                                          config.strat_panels,
                                          config.strat_overlap)
                if config.strat_taper == 'dst':
                    w_solve *= 2
            else:
                l, d, u = stratified_coeffs(src_true, src_pp,
                                            config.shift,
                                            config.fft_shift)
                w_solve = src_true.shape[-1]
            use_dft = (config.strat_dft == 'dft'
                       or (config.strat_dft == 'auto'
                           and w_solve <= 2048))
            strat = pcr_precompute(l, d, u,
                                   dft=w_solve if use_dft else None)
        elif config.fft_mode == 'strat' and planes.shape[0] == 2:
            from .stratified import (stratified_coeffs_block,
                                     pcr_precompute_block)
            # block (TTI) stratified coefficients always come from the
            # FINE planes: the Galerkin-coarsened block symbol destroys
            # outer convergence (measured: layered TTI 96x80 converges
            # in 80 iterations at full resolution, stalls at fft_scale=2)
            L, D, U = stratified_coeffs_block(lax.stop_gradient(planes),
                                              pp, config.shift,
                                              config.fft_shift)
            strat = pcr_precompute_block(L, D, U)
        else:
            sinv = _fft_symbol_inverse(src_true, src_pp, config)
    if with_transpose and config.precond == 'hybrid':
        planesT = transpose_block_planes(lax.stop_gradient(planes))

    cplanes = ctrue if config.hybrid_comp == 'fused' else None
    return HelmholtzOperator(planes, hier, hierT, sinv, planesT,
                             strat, cplanes)


def _effective_krylov(config, block_size):
    '''
    Resolve krylov='auto': BiCGStab for scalar (B=1) operators, GMRES
    for block systems (the Eurus TTI 2x2 system makes BiCGStab's short
    recurrence diverge in complex64; restarted GMRES is monotone).
    '''

    if config.krylov != 'auto':
        return config.krylov
    return 'gmres' if block_size > 1 else 'bicgstab'


def _inner_precond(matvec, M, config):
    '''
    The FGMRES "strong" variable preconditioner: ``fgmres_inner`` steps
    of inner GMRES on the SAME operator, preconditioned by the base M.
    Each outer Arnoldi direction then carries an inner_m-deep Krylov
    correction, so one outer restart cycle spans an effectively
    (restart x inner_m)-dimensional space while storing only
    2 x restart basis vectors — the cure for restart-limited tails
    (layered TTI, STATUS round-2 known issue 3). Nonlinear in r, hence
    legal only inside flexible GMRES.
    '''

    inner = int(config.fgmres_inner)
    if inner <= 0:
        return M

    def Mv(r):
        return gmres_cycle(matvec, r, M=M, m=inner).x
    return Mv


def _make_precond(op, config, transpose=False):
    '''
    The preconditioner application r -> M r (a fixed linear operator).

    'mg': one V-cycle on the shifted hierarchy.
    'hybrid': spectral interior solve + V-cycle correction,
        M r = P r + V (r - A P r),
    where P inverts the mean interior symbol in Fourier space (exact for
    the interior of homogeneous media) and the V-cycle absorbs what P
    cannot represent (PML frame, boundary rows, heterogeneity). Measured
    at 512^2 / 32 wavelengths: 112 -> 25 outer iterations homogeneous, and
    converges on layered/random media where MG-only BiCGStab diverges.

    With ``transpose=True`` returns the same construction built from the
    transposed parts, P^T + V^T (I - A^T P^T) — a preconditioner FOR the
    transposed operator, not the algebraic transpose of M (which would be
    P^T + (I - P^T A^T) V^T; the two differ because V^T and P^T A^T do
    not commute). custom_linear_solve only requires that the transpose
    solve converge on A^T x = b, and the preconditioner choice is free,
    so gradients are exact to solve tolerance either way.
    P^T = F D^T F^{-1} since the DFT matrix is symmetric.
    '''

    hier = op.hierT if transpose else op.hier
    mg = lambda r: v_cycle(hier, r, omega=config.mg_omega,
                           nu1=config.mg_nu1, nu2=config.mg_nu2,
                           coarse_iters=config.mg_coarse_iters)
    # honor the solve-time config: an operator prepared with the hybrid
    # spectral symbol can still be solved with the plain-MG preconditioner
    # (the reverse needs the symbol, which only prepare_operator builds)
    has_spec = op.fft_sinv is not None or op.strat is not None
    if not has_spec or config.precond == 'mg':
        M0 = mg
    else:
        planes = lax.stop_gradient(op.planesT if transpose else op.planes)

        if op.strat is not None:
            from .stratified import (StratPCRBlock, stratified_apply,
                                     stratified_apply_block,
                                     stratified_apply_panels)
            is_block = isinstance(op.strat, StratPCRBlock)
            # the panel layout concatenates P windows along x, so the
            # full-vs-reduced-resolution decision below keys on nz only
            # (2:1 coarsening always halves nz; the bf16 pack only adds a
            # LEADING re/im axis, so shape[-2] is always nz)
            spec_nz = op.strat.dinv.shape[-2]
            if not is_block and config.strat_panels > 1:
                def P0(r):
                    return stratified_apply_panels(
                        op.strat, r, config.strat_panels,
                        config.strat_overlap, transpose=transpose,
                        taper=config.strat_taper)
            else:
                strat_fn = (stratified_apply_block if is_block
                            else stratified_apply)

                def P0(r):
                    # P^T is applied as the algebraic transpose of the
                    # same tridiagonal family (the x-DFT matrix is
                    # symmetric)
                    return strat_fn(op.strat, r, transpose=transpose)
        else:
            sinv = op.fft_sinv
            if transpose:
                sinv = jnp.swapaxes(sinv, 0, 1)
            spec_nz = sinv.shape[-2]

            def _sinv_apply(R):
                # explicit block multiply-add (B <= 2): einsum would
                # contract on the MXU at bfloat16 default precision
                B = sinv.shape[0]
                outs = []
                for i in range(B):
                    acc = None
                    for j in range(B):
                        term = sinv[i, j] * R[..., j, :, :]
                        acc = term if acc is None else acc + term
                    outs.append(acc)
                return jnp.stack(outs, axis=-3)

            if transpose:
                def P0(r):
                    R = jnp.fft.ifft2(r)
                    return jnp.fft.fft2(_sinv_apply(R))
            else:
                def P0(r):
                    R = jnp.fft.fft2(r)
                    return jnp.fft.ifft2(_sinv_apply(R))

        nzf, nxf = planes.shape[-2:]
        if (config.hybrid_comp == 'fused' and not transpose
                and op.cplanes is not None and len(hier.levels) > 1
                and spec_nz != nzf):
            # fused hybrid cycle: the PCR interior solve becomes the
            # level-1 coarse-grid boost of ONE V-cycle — fine pre-smooth,
            # restricted residual, xc = PCR rc, residual against the
            # Galerkin-coarsened TRUE operator, V-cycle from level 1,
            # prolong, fine post-smooth. Algebraically the same family
            # as 'mult' with the duplicate fine<->half transfer passes
            # and the fine-grid correction matvec removed.
            from .multigrid import presmooth_restrict, prolong_add_smooth
            lvl0 = hier.levels[0]
            cpl = lax.stop_gradient(op.cplanes)

            def M0(r):
                u, rc = presmooth_restrict(lvl0, r, config.mg_omega,
                                           config.mg_nu1)
                xc = P0(rc)
                rc2 = rc - apply_block_stencil_fast(cpl, xc)
                xc = xc + v_cycle(hier, rc2, omega=config.mg_omega,
                                  nu1=config.mg_nu1, nu2=config.mg_nu2,
                                  level=1,
                                  coarse_iters=config.mg_coarse_iters)
                return prolong_add_smooth(lvl0, u, r, xc,
                                          config.mg_omega, config.mg_nu2)

        else:
            if spec_nz == nzf:
                P = P0
            else:
                # reduced-resolution spectral solve (fft_scale=2):
                # interior solve on the Galerkin-coarsened operator
                # between the MG transfer operators. Q = P_2h S_c R_2h;
                # its transpose is P_2h S_c^T R_2h because R = (1/4) P^T
                # exactly.
                from .multigrid import restrict, prolong
                maskP = hier.levels[0].mask

                def P(r):
                    rc = restrict(maskP * r)
                    return maskP * prolong(P0(rc), nzf, nxf)

            if config.hybrid_comp == 'add':
                def M0(r):
                    return P(r) + mg(r)
            else:
                def M0(r):
                    x1 = P(r)
                    r2 = r - apply_block_stencil_fast(planes, x1)
                    return x1 + mg(r2)

    return M0


def solve(op, b, config=SolverConfig()):
    '''
    Solve A x = b for a single right-hand side b of shape (B, nz, nx),
    with implicit differentiation through ``lax.custom_linear_solve``.
    '''

    def mv(x):
        return apply_block_stencil(op.planes, x)

    M = _make_precond(op, config)
    MT = (_make_precond(op, config, transpose=True)
          if op.hierT is not None else None)
    krylov = _effective_krylov(config, op.planes.shape[0])

    def krylov_solve(matvec, rhs, Mfn):
        if krylov == 'fgmres':
            return fgmres(matvec, rhs,
                          M=_inner_precond(matvec, Mfn, config),
                          tol=config.tol, maxiter=config.maxiter,
                          restart=config.gmres_restart).x
        if krylov == 'gmres':
            return gmres(matvec, rhs, M=Mfn, tol=config.tol,
                         maxiter=config.maxiter,
                         restart=config.gmres_restart).x
        return bicgstab(matvec, rhs, M=Mfn, tol=config.tol,
                        maxiter=config.maxiter).x

    def solve_fn(matvec, rhs):
        return krylov_solve(matvec, rhs, M)

    if op.hierT is None:
        return lax.custom_linear_solve(mv, b, solve_fn)

    def tsolve_fn(vecmat, rhs):
        return krylov_solve(vecmat, rhs, MT)

    return lax.custom_linear_solve(mv, b, solve_fn,
                                   transpose_solve=tsolve_fn)


def solve_batched(op, b_batch, config=SolverConfig()):
    'vmap of ``solve`` over a leading right-hand-side axis (R, B, nz, nx).'

    return jax.vmap(partial(solve, op, config=config))(b_batch)


@partial(jax.jit, static_argnames=('config',))
def solve_batched_jit(op, b_batch, config):
    'Jitted, trace-cached entry point for repeated host-driven solves.'

    return solve_batched(op, b_batch, config)


def make_chunked_solver(config=SolverConfig(), chunk=64):
    '''
    Host-driven restarted solve: BiCGStab runs in fixed-size device
    chunks; between chunks the TRUE residual is recomputed and the
    iteration restarts from the current iterate. Two independent wins:

    - single precision: restarting from the true residual removes the
      recursive-residual drift that stalls f32 BiCGStab on large grids;
    - runtime robustness: each device program is short (the experimental
      TPU runtime kills its worker on very long-running loop programs —
      empirically, the un-chunked 2048^2 batched solve crashes it while
      16-iteration chunks run fine).

    All device entry points go through the realio boundary, so this is
    the large-grid path on TPU runtimes without complex host<->device
    transfer. ``b_batch`` may be a numpy/jnp complex array or an
    already-device-resident C-pair pytree.

    Returns ``solve(op, b_batch) -> (x_batch, iters, relres)`` where
    b_batch has shape (R, B, nz, nx) and x_batch is a device-resident
    C-pair pytree (use ``zephyr_tpu.core.realio.join_complex_host`` to
    materialize it). Not differentiable (use ``solve`` for autodiff).
    '''

    from ..core.realio import realio_jit

    def chunk_step(op, b, x):
        # the chunked solver is non-differentiable by contract, so the
        # matvec itself can take the fused fast path
        def mv(v):
            return apply_block_stencil_fast(op.planes, v)

        M = _make_precond(op, config)

        krylov = _effective_krylov(config, b.shape[-3])

        def one(bi, xi):
            r = bi - mv(xi)
            if krylov == 'fgmres':
                from .krylov import fgmres_cycle
                res = fgmres_cycle(mv, r,
                                   M=_inner_precond(mv, M, config),
                                   m=chunk)
            elif krylov == 'gmres':
                res = gmres_cycle(mv, r, M=M, m=chunk)
            else:
                # rescale the chunk tolerance so the stop target stays
                # tol * ||b|| GLOBALLY: BiCGStab solves the correction
                # system A dx = r, and a plain relative tol against
                # ||r|| would force every chunk to converge 1e-5
                # RELATIVE TO THE CURRENT RESIDUAL — the final chunk
                # then overshoots by up to a whole chunk of iterations
                # (measured: 64 instead of ~50 at 2048^2 homogeneous,
                # 20% of the headline wall-clock). The 0.7 margin
                # absorbs f32 recursive-vs-true residual drift: a chunk
                # that stops on its RECURSIVE residual exactly at the
                # global target can still fail the outer TRUE-residual
                # check, and the extra restart breaks the BiCGStab
                # recurrence trajectory (measured: layered 2048^2 went
                # 96 -> 109 iterations without the margin).
                import os as _os
                margin_env = _os.environ.get('ZT_CHUNK_TOL_MARGIN',
                                             '0.7')
                bnorm0 = jnp.linalg.norm(bi)
                rnorm = jnp.linalg.norm(r)
                tiny = jnp.finfo(rnorm.dtype).tiny
                if margin_env == 'rel':
                    # pre-global-rescale behavior (experiment hook):
                    # plain relative tolerance against the chunk's own
                    # starting residual
                    tol_c = jnp.asarray(config.tol, rnorm.dtype)
                else:
                    tol_c = (float(margin_env) * config.tol * bnorm0
                             / jnp.maximum(rnorm, tiny))
                res = bicgstab(mv, r, M=M, tol=tol_c, maxiter=chunk)
            xi = xi + res.x
            bnorm = jnp.linalg.norm(bi)
            bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
            rr = jnp.linalg.norm(bi - mv(xi)) / bnorm
            return xi, rr, res.iters

        x, rr, its = jax.vmap(one)(b, x)
        return x, jnp.max(rr), jnp.max(its)

    def zeros_like_fn(b):
        return jnp.zeros_like(b)

    step_rio = realio_jit(chunk_step)
    zeros_rio = realio_jit(zeros_like_fn)

    def solve_chunked(op, b_batch, max_chunks=None):
        from ..core.realio import device_put_c, C
        if max_chunks is None:
            max_chunks = max(1, config.maxiter // chunk)
        # upload b once (as real pairs); every chunk then reuses the
        # device-resident copy instead of re-transferring the batch
        if not isinstance(b_batch, C):
            if isinstance(b_batch, jnp.ndarray):
                # already device-resident: split on device — np.asarray
                # here would be a complex device->host transfer, which is
                # exactly what this path exists to avoid
                b_batch = C(jnp.real(b_batch), jnp.imag(b_batch))
            else:
                b_batch = device_put_c(np.asarray(b_batch))
        x = zeros_rio(b_batch)
        iters = 0
        worst = None
        best = None
        for i in range(max_chunks):
            x_new, rr, its = step_rio(op, b_batch, x)
            worst = float(np.asarray(rr))
            iters += int(np.asarray(its))
            if not np.isfinite(worst) or (best is not None
                                          and worst > 4.0 * best[1]):
                # the restart made the TRUE residual materially worse
                # (or non-finite): keep the best iterate and stop. On
                # marginally-stable systems (the Eurus TTI block
                # operator in complex64) a restart cycle can amplify
                # instead of correct — measured on TPU: chunk residuals
                # 0.49 -> 1.2e2 -> ... -> NaN while XLA:CPU converges —
                # and without this guard the recorded "solution" is
                # garbage rather than the best achieved iterate.
                x, worst = best
                break
            x = x_new
            if best is None or worst < best[1]:
                best = (x, worst)
            if worst <= config.tol:
                break
        return x, iters, worst

    return solve_chunked


def solve_info(op, b, config=SolverConfig()):
    '''
    Like ``solve`` for a single RHS but also returns (iters, relres)
    diagnostics. Not differentiable; intended for tests and profiling.
    '''

    def mv(x):
        return apply_block_stencil_fast(op.planes, x)

    M = _make_precond(op, config)
    krylov = _effective_krylov(config, op.planes.shape[0])
    if krylov == 'fgmres':
        res = fgmres(mv, b, M=_inner_precond(mv, M, config),
                     tol=config.tol, maxiter=config.maxiter,
                     restart=config.gmres_restart)
    elif krylov == 'gmres':
        res = gmres(mv, b, M=M, tol=config.tol, maxiter=config.maxiter,
                    restart=config.gmres_restart)
    else:
        res = bicgstab(mv, b, M=M, tol=config.tol, maxiter=config.maxiter)
    return res.x, res.iters, res.relres
