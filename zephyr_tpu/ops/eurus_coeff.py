'''
Differentiable coefficient-plane builder for the Eurus TTI discretization.

Reproduces, as a pure JAX function of the physical-property fields, the
9-point mixed-grid anisotropic (TTI viscoacoustic) FDFD stencil of the
reference implementation (uwoseis/zephyr, zephyr/backend/eurus.py:28-464),
after Operto et al. (2009): Thomsen parameters (theta, eps, delta) map to
direction coefficients Ax..Hz; the PML is the Operto/Hustedt cosine-profile
complex stretch Xi = 1 - i*gamma/omega with gamma = cPML cos(pi/2 d/L); the
mass term uses the anti-lumped 9-point weights wm1/wm2/wm3 and Laplacian
weight w1; and the operator is a coupled pair of wavefields, i.e. a 2x2
block of 9-point stencils  A = [[M1, M2], [M3, M4]] (eurus.py:430-464).

Output: (2, 2, 9, nz, nx) complex planes in the ordering of
``zephyr_tpu.ops.stencil.OFFSETS``. With the reference's Eurus default
mord=(-nx, +1) (eurus.py:494-498), its diagonal keys map to offsets

    AA->(-1,-1)  BB->(-1,0)  CC->(-1,+1)
    DD->( 0,-1)  EE->( 0,0)  FF->( 0,+1)
    GG->(+1,-1)  HH->(+1,0)  II->(+1,+1)

Note (faithfully reproduced quirk): because of that mord sign flip, the
K/buoyancy slices named "bottom" (z-1 in array coordinates) are applied to
the z+1 neighbour and vice versa — i.e. the coefficient sampling and the
application stencil are z-mirrored relative to MiniZephyr. For homogeneous
and z-symmetric media (all reference test configurations) this is
indistinguishable; we preserve the reference behaviour exactly.

Boundary rows zero every off-centre plane on the boundary ring and leave
the EE diagonal untouched (eurus.py:466-485) — unlike MiniZephyr, the ring
diagonal keeps its physical value.
'''

import jax.numpy as jnp

# Anti-lumped mass weights and Laplacian weight (eurus.py:244-252)
WM1 = 0.6287326
WM2 = 0.3712667
W1 = 0.4382634


def _edge_pad2(arr):
    return jnp.pad(arr, ((1, 1), (1, 1)), mode='edge')


def _edge_pad1(arr):
    return jnp.pad(arr, (1, 1), mode='edge')


def eurus_planes(c, rho, freq, theta=None, eps=None, delta=None,
                 dx=1.0, dz=1.0, nPML=10, cPML=1e3, tau=jnp.inf,
                 freeSurf=(False, False, False, False), pml=True,
                 pml_cap=None):
    '''
    Build the (2, 2, 9, nz, nx) coefficient planes of the Eurus operator.

    Args:
        c: (nz, nx) complex velocity; rho: (nz, nx) density
        freq: frequency (may be complex, per eurus.py:23)
        theta, eps, delta: (nz, nx) Thomsen fields (default zero)
        nPML: PML thickness in cells; cPML: PML amplitude (eurus.py:500-504)
        tau: Laplace damping constant
        freeSurf: kept for API parity (the Eurus boundary treatment does
            not branch on it; eurus.py:466-485)
        pml: if False, Xi = 1 everywhere (clean preconditioner variant)
        pml_cap: if set, limit the PML decay gamma to pml_cap * |omega|
            (preconditioner-only: bounds the complex stretch so multigrid
            smoothing stays stable; see ops/minizephyr_coeff.py)

    Returns:
        (2, 2, 9, nz, nx) complex planes.
    '''

    c = jnp.asarray(c)
    cdtype = jnp.result_type(c.dtype, jnp.complex64)
    c = c.astype(cdtype)
    rdtype = jnp.real(jnp.zeros((), cdtype)).dtype
    rho = jnp.asarray(rho).real.astype(rdtype)
    nz, nx = c.shape

    zeros = jnp.zeros((nz, nx), dtype=rdtype)
    theta = zeros if theta is None else jnp.asarray(theta).astype(rdtype)
    eps = zeros if eps is None else jnp.asarray(eps).astype(rdtype)
    delta = zeros if delta is None else jnp.asarray(delta).astype(rdtype)

    omega = 2 * jnp.pi * jnp.asarray(freq, dtype=cdtype)
    dampCoeff = 1j / jnp.asarray(tau, dtype=cdtype)
    omegaDamped = omega - dampCoeff

    cPad = _edge_pad2(c)
    rhoPad = _edge_pad2(rho)

    dxx = dx ** 2
    dzz = dz ** 2

    # --- PML complex stretch (eurus.py:76-97) ------------------------------
    if pml:
        pmldx = dx * (nPML - 1)
        pmldz = dz * (nPML - 1)
        x_vals = jnp.arange(nPML) * dx
        z_vals = jnp.arange(nPML) * dz

        gamma_x = jnp.zeros((nx,), dtype=cdtype)
        gamma_x = gamma_x.at[:nPML].set(
            cPML * jnp.cos((jnp.pi / 2) * (x_vals / pmldx)))
        gamma_x = gamma_x.at[-nPML:].set(
            cPML * jnp.cos((jnp.pi / 2) * (x_vals[::-1] / pmldx)))

        gamma_z = jnp.zeros((nz,), dtype=cdtype)
        gamma_z = gamma_z.at[:nPML].set(
            cPML * jnp.cos((jnp.pi / 2) * (z_vals / pmldz)))
        gamma_z = gamma_z.at[-nPML:].set(
            cPML * jnp.cos((jnp.pi / 2) * (z_vals[::-1] / pmldz)))

        if pml_cap is not None:
            cap = pml_cap * jnp.abs(omegaDamped)
            gamma_x = gamma_x * jnp.minimum(
                1.0, cap / jnp.maximum(jnp.abs(gamma_x), 1e-30))
            gamma_z = gamma_z * jnp.minimum(
                1.0, cap / jnp.maximum(jnp.abs(gamma_z), 1e-30))

        gamma_x = _edge_pad1(gamma_x)
        gamma_z = _edge_pad1(gamma_z)

        Xi_x = 1 - (1j * gamma_x.reshape((1, nx + 2))) / omegaDamped
        Xi_z = 1 - (1j * gamma_z.reshape((nz + 2, 1))) / omegaDamped
    else:
        Xi_x = jnp.ones((1, nx + 2), dtype=cdtype)
        Xi_z = jnp.ones((nz + 2, 1), dtype=cdtype)

    Xi_x1 = Xi_x[:, 0:-2]
    Xi_x2 = Xi_x[:, 1:-1]
    Xi_x3 = Xi_x[:, 2:]
    Xi_z1 = Xi_z[0:-2, :]
    Xi_z2 = Xi_z[1:-1, :]
    Xi_z3 = Xi_z[2:, :]

    Xi_x_M = (Xi_x1 + Xi_x2) / 2
    Xi_x_C = Xi_x2
    Xi_x_P = (Xi_x2 + Xi_x3) / 2
    Xi_z_M = (Xi_z1 + Xi_z2) / 2
    Xi_z_C = Xi_z2
    Xi_z_P = (Xi_z2 + Xi_z3) / 2

    L_x4 = 1 / (4 * Xi_x_C * dxx)
    L_x = 1 / (Xi_x_C * dxx)
    L_z4 = 1 / (4 * Xi_z_C * dzz)
    L_z = 1 / (Xi_z_C * dzz)

    # --- Buoyancies (eurus.py:171-226) -------------------------------------
    b_GG = 1. / rhoPad[0:-2, 0:-2]
    b_HH = 1. / rhoPad[0:-2, 1:-1]
    b_II = 1. / rhoPad[0:-2, 2:]
    b_DD = 1. / rhoPad[1:-1, 0:-2]
    b_EE = 1. / rhoPad[1:-1, 1:-1]
    b_FF = 1. / rhoPad[1:-1, 2:]
    b_AA = 1. / rhoPad[2:, 0:-2]
    b_BB = 1. / rhoPad[2:, 1:-1]
    b_CC = 1. / rhoPad[2:, 2:]

    b_SQ1_x = ((b_AA + b_BB + b_DD + b_EE) / 4) / Xi_x_M
    b_SQ2_x = ((b_BB + b_CC + b_EE + b_FF) / 4) / Xi_x_P
    b_SQ3_x = ((b_DD + b_EE + b_GG + b_HH) / 4) / Xi_x_M
    b_SQ4_x = ((b_EE + b_FF + b_HH + b_II) / 4) / Xi_x_P

    b_SQ1_z = ((b_AA + b_BB + b_DD + b_EE) / 4) / Xi_z_M
    b_SQ2_z = ((b_BB + b_CC + b_EE + b_FF) / 4) / Xi_z_M
    b_SQ3_z = ((b_DD + b_EE + b_GG + b_HH) / 4) / Xi_z_P
    b_SQ4_z = ((b_EE + b_FF + b_HH + b_II) / 4) / Xi_z_P

    b_LN1 = ((b_BB + b_EE) / 2) / Xi_z_M
    b_LN2 = ((b_DD + b_EE) / 2) / Xi_x_M
    b_LN3 = ((b_EE + b_FF) / 2) / Xi_x_P
    b_LN4 = ((b_EE + b_HH) / 2) / Xi_z_P

    b_LN1_C = ((b_BB + b_EE) / 2) / Xi_x_C
    b_LN2_C = ((b_DD + b_EE) / 2) / Xi_z_C
    b_LN3_C = ((b_EE + b_FF) / 2) / Xi_z_C
    b_LN4_C = ((b_EE + b_HH) / 2) / Xi_x_C

    # --- Mass term with anti-lumped weights (eurus.py:229-269) -------------
    K = (omegaDamped * omegaDamped) / (rhoPad * cPad ** 2)
    wm3 = 0.25 * (1. - WM1 - WM2)
    wm2 = 0.25 * WM2
    KGG = wm3 * K[0:-2, 0:-2]
    KHH = wm2 * K[0:-2, 1:-1]
    KII = wm3 * K[0:-2, 2:]
    KDD = wm2 * K[1:-1, 0:-2]
    KEE = WM1 * K[1:-1, 1:-1]
    KFF = wm2 * K[1:-1, 2:]
    KAA = wm3 * K[2:, 0:-2]
    KBB = wm2 * K[2:, 1:-1]
    KCC = wm3 * K[2:, 2:]

    # --- Direction coefficients (eurus.py:279-295) -------------------------
    cos2 = jnp.cos(theta) ** 2
    sin2 = jnp.sin(theta) ** 2
    sin2t = jnp.sin(2 * theta)

    Ax = 1. + (2. * delta) * cos2
    Bx = (-1. * delta) * sin2t
    Cx = (1. + 2. * delta) * cos2
    Dx = (-0.5 * (1. + 2. * delta)) * sin2t
    Ex = (2. * (eps - delta)) * cos2
    Fx = (-1. * (eps - delta)) * sin2t
    Gx = Ex
    Hx = Fx

    Az = Bx
    Bz = 1. + (2. * delta) * sin2
    Cz = Dx
    Dz = (1. + 2. * delta) * sin2
    Ez = Fx
    Fz = (2. * (eps - delta)) * sin2
    Gz = Fx
    Hz = Fz

    def generate(massTerm, c1x, c1z, c2x, c2z):
        '''
        The nine diagonals of one block of the anisotropic mixed-grid
        stencil (eurus.py:300-427, Operto et al. 2009 Appendix).
        '''

        GG = (massTerm * KGG) \
            + W1 * ((L_x4 * c1x) * b_SQ3_x
                    + (-1 * L_x4 * c2x) * b_SQ3_z
                    + (-1 * L_z4 * c1z) * b_SQ3_x
                    + (L_z4 * c2z) * b_SQ3_z) \
            + (1 - W1) * ((-1 * L_x4 * c2x) * b_LN2_C
                          + (-1 * L_z4 * c1z) * b_LN4_C)
        HH = (massTerm * KHH) \
            + W1 * ((L_x4 * c1x) * (- b_SQ3_x - b_SQ4_x)
                    + (L_x4 * c2x) * (- b_SQ3_z + b_SQ4_z)
                    + (L_z4 * c1z) * (b_SQ3_x - b_SQ4_x)
                    + (L_z4 * c2z) * (b_SQ3_z + b_SQ4_z)) \
            + (1 - W1) * ((L_x4 * c2x) * (- b_LN2_C + b_LN3_C)
                          + (L_z * c2z) * b_LN4)
        II = (massTerm * KII) \
            + W1 * ((L_x4 * c1x) * b_SQ4_x
                    + (L_x4 * c2x) * b_SQ4_z
                    + (L_z4 * c1z) * b_SQ4_x
                    + (L_z4 * c2z) * b_SQ4_z) \
            + (1 - W1) * ((L_x4 * c2x) * b_LN3_C
                          + (L_z4 * c1z) * b_LN4_C)
        DD = (massTerm * KDD) \
            + W1 * ((L_x4 * c1x) * (b_SQ3_x + b_SQ1_x)
                    + (L_x4 * c2x) * (b_SQ3_z - b_SQ1_z)
                    + (L_z4 * c1z) * (- b_SQ3_x + b_SQ1_x)
                    + (L_z4 * c2z) * (- b_SQ3_z - b_SQ1_z)) \
            + (1 - W1) * ((L_x * c1x) * b_LN2
                          + (L_z4 * c1z) * (- b_LN4_C + b_LN1_C))
        EE = (massTerm * KEE) \
            + W1 * ((-1 * L_x4 * c1x) * (b_SQ1_x + b_SQ2_x + b_SQ3_x
                                         + b_SQ4_x)
                    + (L_x4 * c2x) * (b_SQ2_z + b_SQ3_z - b_SQ1_z - b_SQ4_z)
                    + (L_z4 * c1z) * (b_SQ2_x + b_SQ3_x - b_SQ1_x - b_SQ4_x)
                    + (-1 * L_z4 * c2z) * (b_SQ1_z + b_SQ2_z + b_SQ3_z
                                           + b_SQ4_z)) \
            + (1 - W1) * ((L_x * c1x) * (- b_LN2 - b_LN3)
                          + (L_z * c2z) * (- b_LN1 - b_LN4))
        FF = (massTerm * KFF) \
            + W1 * ((L_x4 * c1x) * (b_SQ2_x + b_SQ4_x)
                    + (L_x4 * c2x) * (b_SQ2_z - b_SQ4_z)
                    + (L_z4 * c1z) * (- b_SQ2_x + b_SQ4_x)
                    + (L_z4 * c2z) * (- b_SQ2_z - b_SQ4_z)) \
            + (1 - W1) * ((L_x * c1x) * b_LN3
                          + (L_z4 * c1z) * (b_LN4_C - b_LN1_C))
        AA = (massTerm * KAA) \
            + W1 * ((L_x4 * c1x) * b_SQ1_x
                    + (L_x4 * c2x) * b_SQ1_z
                    + (L_z4 * c1z) * b_SQ1_x
                    + (L_z4 * c2z) * b_SQ1_z) \
            + (1 - W1) * ((L_x4 * c2x) * b_LN2_C
                          + (L_z4 * c1z) * b_LN1_C)
        BB = (massTerm * KBB) \
            + W1 * ((L_x4 * c1x) * (- b_SQ2_x - b_SQ1_x)
                    + (L_x4 * c2x) * (- b_SQ2_z + b_SQ1_z)
                    + (L_z4 * c1z) * (b_SQ2_x - b_SQ1_x)
                    + (L_z4 * c2z) * (b_SQ2_z + b_SQ1_z)) \
            + (1 - W1) * ((L_x4 * c2x) * (- b_LN3_C + b_LN2_C)
                          + (L_z * c2z) * b_LN1)
        CC = (massTerm * KCC) \
            + W1 * ((L_x4 * c1x) * b_SQ2_x
                    + (-1 * L_x4 * c2x) * b_SQ2_z
                    + (-1 * L_z4 * c1z) * b_SQ2_x
                    + (L_z4 * c2z) * b_SQ2_z) \
            + (1 - W1) * ((-1 * L_x4 * c2x) * b_LN3_C
                          + (-1 * L_z4 * c1z) * b_LN1_C)

        # Plane order k0..k8 per stencil.OFFSETS, using the Eurus offset
        # mapping (module docstring): [AA BB CC DD EE FF GG HH II]
        planes = jnp.stack(
            [jnp.broadcast_to(p, (nz, nx)).astype(cdtype)
             for p in (AA, BB, CC, DD, EE, FF, GG, HH, II)], axis=0)
        return _eurus_boundary(planes)

    def _eurus_boundary(planes):
        'Zero off-centre planes on the boundary ring; EE untouched.'
        CENTER = 4
        for k in range(9):
            if k == CENTER:
                continue
            planes = planes.at[k, :, 0].set(0)
            planes = planes.at[k, :, -1].set(0)
            planes = planes.at[k, 0, :].set(0)
            planes = planes.at[k, -1, :].set(0)
        return planes

    M1 = generate(1., Ax, Az, Bx, Bz)
    M2 = generate(0., Cx, Cz, Dx, Dz)
    M3 = generate(0., Ex, Ez, Fx, Fz)
    M4 = generate(1., Gx, Gz, Hx, Hz)

    return jnp.stack([jnp.stack([M1, M2], axis=0),
                      jnp.stack([M3, M4], axis=0)], axis=0)
