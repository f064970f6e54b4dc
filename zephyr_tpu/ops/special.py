'''
On-device special functions for zephyr_tpu.

The reference reaches these through scipy (Fortran/C under the hood):
- ``scipy.special.hankel1`` for the analytical Green's-function oracle
  (reference zephyr/backend/analytical.py:13,53)
- ``scipy.special.i0`` for Kaiser-windowed sinc sources
  (reference zephyr/backend/source.py:14,201-202)

Here they are implemented directly in JAX so that the oracle and the source
construction run on TPU. J0/Y0 use the classic rational (Cephes-style)
minimax approximations, accurate to ~1e-8 relative — far tighter than any
tolerance in the reference test suite (1e-2 / 3e-2).
'''

import jax.numpy as jnp

_TWO_OVER_PI = 0.636619772367581343
_PI_OVER_4 = 0.785398163397448310


def bessel_j0(x):
    'Bessel function of the first kind, order zero, for real x.'

    x = jnp.asarray(x)
    ax = jnp.abs(x)

    # |x| < 8: rational approximation in y = x^2
    y = x * x
    num = 57568490574.0 + y * (-13362590354.0 + y * (651619640.7
          + y * (-11214424.18 + y * (77392.33017 + y * (-184.9052456)))))
    den = 57568490411.0 + y * (1029532985.0 + y * (9494680.718
          + y * (59272.64853 + y * (267.8532712 + y))))
    small = num / den

    # |x| >= 8: asymptotic form
    z = 8.0 / jnp.where(ax > 0, ax, 1.0)
    y2 = z * z
    xx = ax - _PI_OVER_4
    p = 1.0 + y2 * (-0.1098628627e-2 + y2 * (0.2734510407e-4
        + y2 * (-0.2073370639e-5 + y2 * 0.2093887211e-6)))
    q = -0.1562499995e-1 + y2 * (0.1430488765e-3 + y2 * (-0.6911147651e-5
        + y2 * (0.7621095161e-6 + y2 * (-0.934935152e-7))))
    large = jnp.sqrt(_TWO_OVER_PI / jnp.where(ax > 0, ax, 1.0)) * (
        jnp.cos(xx) * p - z * jnp.sin(xx) * q)

    return jnp.where(ax < 8.0, small, large)


def bessel_y0(x):
    'Bessel function of the second kind, order zero, for real x > 0.'

    x = jnp.asarray(x)
    xs = jnp.where(x > 0, x, 1.0)  # guard the log/sqrt for x <= 0

    y = xs * xs
    num = -2957821389.0 + y * (7062834065.0 + y * (-512359803.6
          + y * (10879881.29 + y * (-86327.92757 + y * 228.4622733))))
    den = 40076544269.0 + y * (745249964.8 + y * (7189466.438
          + y * (47447.26470 + y * (226.1030244 + y))))
    small = num / den + _TWO_OVER_PI * bessel_j0(xs) * jnp.log(xs)

    z = 8.0 / xs
    y2 = z * z
    xx = xs - _PI_OVER_4
    p = 1.0 + y2 * (-0.1098628627e-2 + y2 * (0.2734510407e-4
        + y2 * (-0.2073370639e-5 + y2 * 0.2093887211e-6)))
    q = -0.1562499995e-1 + y2 * (0.1430488765e-3 + y2 * (-0.6911147651e-5
        + y2 * (0.7621095161e-6 + y2 * (-0.934935152e-7))))
    large = jnp.sqrt(_TWO_OVER_PI / xs) * (
        jnp.sin(xx) * p + z * jnp.cos(xx) * q)

    out = jnp.where(xs < 8.0, small, large)
    # Y0 -> -inf as x -> 0+; undefined for x <= 0
    return jnp.where(x > 0, out, -jnp.inf)


def hankel1_0(x):
    '''
    Hankel function of the first kind, order zero: H0^(1)(x) = J0(x) + i Y0(x),
    for real x >= 0. Matches scipy.special.hankel1(0, x) on the real axis.
    '''

    j = bessel_j0(x)
    y = bessel_y0(x)
    cdtype = jnp.result_type(x, jnp.complex64)
    return j.astype(cdtype) + 1j * y.astype(cdtype)


def bessel_i0(x):
    'Modified Bessel function of the first kind, order zero (real x).'

    return jnp.i0(x)


def sinc(x):
    'Normalized sinc, matching numpy.sinc: sin(pi x)/(pi x).'

    return jnp.sinc(x)
