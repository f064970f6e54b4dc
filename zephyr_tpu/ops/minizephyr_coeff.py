'''
Differentiable coefficient-plane builder for the MiniZephyr discretization.

Reproduces, as a pure JAX function of the physical-property fields, the
9-point mixed-grid FDFD Helmholtz stencil of the reference implementation
(uwoseis/zephyr, zephyr/backend/minizephyr.py:40-254): the OMEGA/FULLWV
(Pratt et al.) optimal 9-point operator with Roecker-style quadratic-profile
PML, buoyancy (1/rho) averaging at the 9 stencil points, 2.5D cross-line
wavenumber support (ky enters the mass term), Laplace-domain damping
(omega -> omega - i/tau), and Dirichlet/free-surface boundary rows
(minizephyr.py:256-298: off-diagonals zeroed, diagonal set to +/-1).

The output is a (9, nz, nx) complex plane array in the ordering of
``zephyr_tpu.ops.stencil.OFFSETS``; the mapping from the reference's
diagonal keys (with its default mord=(nx, +1), minizephyr.py:309-312) is

    AD->(-1,-1)  DD->(-1,0)  CD->(-1,+1)
    AA->( 0,-1)  BE->( 0,0)  CC->( 0,+1)
    AF->(+1,-1)  FF->(+1,0)  CF->(+1,+1)

Because this builder is pure jnp, gradients of wavefields (and of any misfit
downstream of the solve) with respect to ``c`` and ``rho`` flow through it
automatically — replacing the reference's hand-written sensitivity scalings
(zephyr/middleware/problem.py:79-85).
'''

import jax.numpy as jnp

# Optimal 9-point stencil weights (Jo/Shin/Suh-style, as used by OMEGA;
# reference minizephyr.py:204-209)
ACOEF = 0.5461
BCOEF = 0.4539
CCOEF = 0.6248
DCOEF = 0.09381
ECOEF = 0.000001297

PMLR = 1e-3  # PML target reflection coefficient (minizephyr.py:94)


def _edge_pad(arr):
    'Pad a 2D field by one cell on every side, replicating edges.'
    return jnp.pad(arr, ((1, 1), (1, 1)), mode='edge')


def minizephyr_planes(c, rho, freq, dx=1.0, dz=1.0, nPML=10, ky=0.0,
                      tau=jnp.inf, freeSurf=(False, False, False, False),
                      pml=True, pml_cap=None):
    '''
    Build the (9, nz, nx) coefficient planes of the MiniZephyr operator.

    Args:
        c: (nz, nx) complex wave velocity
        rho: (nz, nx) real bulk density
        freq: frequency in Hz (real or complex scalar)
        dx, dz: grid spacing
        nPML: PML thickness in grid points (static)
        ky: cross-line wavenumber for 2.5D operation
        tau: Laplace-domain damping time constant (inf = none)
        freeSurf: 4-tuple of free-surface flags, (bottom, right, top, left)
            in the reference's row ordering — index 0 applies to grid row 0,
            index 2 to the last grid row (minizephyr.py:105-115, 273-298).
        pml: if False, build the interior stencil everywhere (r1 = 1,
            r2 = 0; no absorbing layer). Used for the multigrid
            preconditioner, whose absorption comes from the complex shift
            instead — the PML complex stretch destroys smoother stability
            (point-Jacobi amplifies oscillatory modes inside the layer).
        pml_cap: if set (e.g. 2.0), limit the PML decay strength to
            pml_cap * |omega| — a preconditioner-only compromise that
            keeps the absorbing character (spectral match to the true
            operator) while bounding the grid anisotropy that breaks
            multigrid smoothing, especially at low frequency where the
            quadratic PML profile is badly overdamped.

    Returns:
        (9, nz, nx) complex planes.
    '''

    c = jnp.asarray(c)
    cdtype = jnp.result_type(c.dtype, jnp.complex64)
    c = c.astype(cdtype)
    rho = jnp.asarray(rho).real.astype(jnp.real(jnp.zeros((), cdtype)).dtype)
    nz, nx = c.shape

    omega = 2 * jnp.pi * jnp.asarray(freq, dtype=cdtype)
    dampCoeff = 1j / jnp.asarray(tau, dtype=cdtype)
    omegaDamped = omega - dampCoeff

    cPad = _edge_pad(c)
    rhoPad = _edge_pad(rho)

    aky = 2 * jnp.pi * ky

    dxx = dx ** 2
    dzz = dz ** 2
    dxz = (dxx + dzz) / 2
    dd = jnp.sqrt(dxz)
    iom = 1j * omegaDamped

    # --- PML decay profiles (quadratic, Roecker fdfdpml.f style) -----------
    pmldx = dx * (nPML - 1)
    pmldz = dz * (nPML - 1)
    pmlfx = 3.0 * jnp.log(1.0 / PMLR) / (2 * pmldx ** 3)
    pmlfz = 3.0 * jnp.log(1.0 / PMLR) / (2 * pmldz ** 3)

    dpmlx = jnp.zeros((nz, nx), dtype=cdtype)
    dpmlx = dpmlx.at[:, :nPML].set(
        (jnp.arange(nPML, 0, -1) * dx).astype(cdtype)[None, :])
    dpmlx = dpmlx.at[:, -nPML:].set(
        (jnp.arange(1, nPML + 1) * dx).astype(cdtype)[None, :])

    dpmlz = jnp.zeros((nz, nx), dtype=cdtype)
    dpmlz = dpmlz.at[:nPML, :].set(
        (jnp.arange(nPML, 0, -1) * dz).astype(cdtype)[:, None])
    dpmlz = dpmlz.at[-nPML:, :].set(
        (jnp.arange(1, nPML + 1) * dz).astype(cdtype)[:, None])

    # Sign masks: PML absorbing term enabled only where no free surface
    isnx = jnp.zeros((nz, nx), dtype=rho.dtype)
    isnz = jnp.zeros((nz, nx), dtype=rho.dtype)
    if not freeSurf[2]:
        isnz = isnz.at[-nPML:, :].set(-1.0)   # top
    if not freeSurf[1]:
        isnx = isnx.at[:, -nPML:].set(-1.0)   # right
    if not freeSurf[0]:
        isnz = isnz.at[:nPML, :].set(1.0)     # bottom
    if not freeSurf[3]:
        isnx = isnx.at[:, :nPML].set(1.0)     # left

    if pml:
        dnx = pmlfx * c * dpmlx ** 2
        ddnx = 2 * pmlfx * c * dpmlx
        dnz = pmlfz * c * dpmlz ** 2
        ddnz = 2 * pmlfz * c * dpmlz

        if pml_cap is not None:
            cap = pml_cap * jnp.abs(omegaDamped)
            fx = jnp.minimum(1.0, cap / jnp.maximum(jnp.abs(dnx), 1e-30))
            fz = jnp.minimum(1.0, cap / jnp.maximum(jnp.abs(dnz), 1e-30))
            dnx, ddnx = fx * dnx, fx * ddnx
            dnz, ddnz = fz * dnz, fz * ddnz

        denx = dnx + iom
        r1x = iom / denx
        r1xsq = r1x ** 2
        r2x = isnx * r1xsq * ddnx / denx

        denz = dnz + iom
        r1z = iom / denz
        r1zsq = r1z ** 2
        r2z = isnz * r1zsq * ddnz / denz
    else:
        one = jnp.ones((nz, nx), dtype=cdtype)
        zero = jnp.zeros((nz, nx), dtype=cdtype)
        r1xsq = r1zsq = one
        r2x = r2z = zero

    # --- Buoyancies, averaged between centre and neighbours ----------------
    bMM = 1.0 / rhoPad[0:-2, 0:-2]
    bME = 1.0 / rhoPad[0:-2, 1:-1]
    bMP = 1.0 / rhoPad[0:-2, 2:]
    bEM = 1.0 / rhoPad[1:-1, 0:-2]
    bEE = 1.0 / rhoPad[1:-1, 1:-1]
    bEP = 1.0 / rhoPad[1:-1, 2:]
    bPM = 1.0 / rhoPad[2:, 0:-2]
    bPE = 1.0 / rhoPad[2:, 1:-1]
    bPP = 1.0 / rhoPad[2:, 2:]

    bMM = (bEE + bMM) / 2
    bME = (bEE + bME) / 2
    bMP = (bEE + bMP) / 2
    bEM = (bEE + bEM) / 2
    bEP = (bEE + bEP) / 2
    bPM = (bEE + bPM) / 2
    bPE = (bEE + bPE) / 2
    bPP = (bEE + bPP) / 2

    # --- Mass term ----------------------------------------------------------
    K = ((omegaDamped ** 2 / cPad ** 2) - aky ** 2) / rhoPad
    kMM = K[0:-2, 0:-2]
    kME = K[0:-2, 1:-1]
    kMP = K[0:-2, 2:]
    kEM = K[1:-1, 0:-2]
    kEE = K[1:-1, 1:-1]
    kEP = K[1:-1, 2:]
    kPM = K[2:, 0:-2]
    kPE = K[2:, 1:-1]
    kPP = K[2:, 2:]

    # --- The nine diagonals (minizephyr.py:219-243 verbatim semantics) -----
    AD = ECOEF * kMM \
        + BCOEF * bMM * ((r1zsq + r1xsq) / (4 * dxz) - (r2z + r2x) / (4 * dd))
    DD = DCOEF * kME \
        + ACOEF * bME * (r1zsq / dz - r2z / 2) / dz \
        + BCOEF * (r1zsq - r1xsq) * (bMP + bMM) / (4 * dxz)
    CD = ECOEF * kMP \
        + BCOEF * bMP * ((r1zsq + r1xsq) / (4 * dxz) - (r2z - r2x) / (4 * dd))
    AA = DCOEF * kEM \
        + ACOEF * bEM * (r1xsq / dx - r2x / 2) / dx \
        + BCOEF * (r1xsq - r1zsq) * (bPM + bMM) / (4 * dxz)
    BE = CCOEF * kEE \
        + ACOEF * (r2x * (bEM - bEP) / (2 * dx) + r2z * (bME - bPE) / (2 * dz)
                   - r1xsq * (bEM + bEP) / dxx - r1zsq * (bME + bPE) / dzz) \
        + BCOEF * (((r2x + r2z) * (bMM - bPP) + (r2z - r2x) * (bMP - bPM))
                   / (4 * dd)
                   - (r1xsq + r1zsq) * (bMM + bPP + bPM + bMP) / (4 * dxz))
    CC = DCOEF * kEP \
        + ACOEF * bEP * (r1xsq / dx + r2x / 2) / dx \
        + BCOEF * (r1xsq - r1zsq) * (bMP + bPP) / (4 * dxz)
    AF = ECOEF * kPM \
        + BCOEF * bPM * ((r1zsq + r1xsq) / (4 * dxz) + (r2z - r2x) / (4 * dd))
    FF = DCOEF * kPE \
        + ACOEF * bPE * (r1zsq / dz + r2z / 2) / dz \
        + BCOEF * (r1zsq - r1xsq) * (bPM + bPP) / (4 * dxz)
    CF = ECOEF * kPP \
        + BCOEF * bPP * ((r1zsq + r1xsq) / (4 * dxz) + (r2z + r2x) / (4 * dd))

    # Plane order: see module docstring / stencil.OFFSETS
    planes = jnp.stack([AD, DD, CD, AA, BE, CC, AF, FF, CF], axis=0)

    return _apply_boundary(planes, freeSurf, cdtype)


def _apply_boundary(planes, freeSurf, cdtype):
    '''
    Dirichlet / free-surface boundary rows (minizephyr.py:256-298): every
    off-diagonal plane is zeroed on the boundary ring; the centre plane is
    set to -1 where the corresponding free surface is active, else +1.
    Applied in the reference's order (left, right, bottom, top) so corner
    values match.
    '''

    def pick(side):
        return -1.0 if freeSurf[side] else 1.0

    CENTER = 4
    off = jnp.asarray([k != CENTER for k in range(9)])[:, None]

    # left column
    planes = planes.at[:, :, 0].set(
        jnp.where(off, jnp.zeros((), cdtype), jnp.asarray(pick(3), cdtype)))
    # right column
    planes = planes.at[:, :, -1].set(
        jnp.where(off, jnp.zeros((), cdtype), jnp.asarray(pick(1), cdtype)))
    off_row = jnp.asarray([k != CENTER for k in range(9)])[:, None]
    # bottom row (grid row 0)
    planes = planes.at[:, 0, :].set(
        jnp.where(off_row, jnp.zeros((), cdtype),
                  jnp.asarray(pick(0), cdtype)))
    # top row (last grid row)
    planes = planes.at[:, -1, :].set(
        jnp.where(off_row, jnp.zeros((), cdtype),
                  jnp.asarray(pick(2), cdtype)))

    return planes
