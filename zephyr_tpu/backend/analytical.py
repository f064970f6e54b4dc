'''
Analytical Helmholtz responses (the test oracle), on device.

Mirrors the reference implementation (uwoseis/zephyr,
zephyr/backend/analytical.py:14-80): 2D Green's function
-0.5j * H1^(0)(k r) scaled by ``scaleterm * rho``, 3D Green's function
exp(ikr)/(4 pi r), and tilted-elliptical anisotropy by way of a coordinate
stretch 1/(1 + 2 eps) rotated by theta. The special functions come from
``zephyr_tpu.ops.special`` so the oracle runs on TPU.
'''

import numpy as np
import jax.numpy as jnp

from ..ops.special import hankel1_0


class AnalyticalHelmholtz(object):
    '''
    An implementation of the analytical Helmholtz system, with support for
    the tilted elliptical case by way of coordinate stretching.

    Reference parity: zephyr/backend/analytical.py:14-80 — including its
    quirks: the z-coordinate grid step uses dz but the x extent is computed
    with dz * nx (analytical.py:39-42), and the sign conventions noted in
    its comments (Green2D uses hankel1, i.e. the conjugate-time convention
    matching the discrete solvers' .conjugate()).
    '''

    def __init__(self, systemConfig):

        self.omega = 2 * np.pi * systemConfig['freq']
        self.c = systemConfig['c']
        self.rho = systemConfig.get('rho', 1.)
        self.k = self.omega / self.c
        self.stretch = 1. / (1 + (2. * systemConfig.get('eps', 0.)))
        self.theta = systemConfig.get('theta', 0.)
        self.scaleterm = systemConfig.get('scaleterm', 0.5)

        xorig = systemConfig.get('xorig', 0.)
        zorig = systemConfig.get('zorig', 0.)
        dx = systemConfig.get('dx', 1.)
        dz = systemConfig.get('dz', 1.)
        nx = systemConfig['nx']
        nz = systemConfig['nz']

        # NB: reference uses dz in the x extent (analytical.py:39-42);
        # with the default dx == dz this is indistinguishable.
        Z, X = np.mgrid[0:nz, 0:nx].astype(np.float64)
        self._z = jnp.asarray(zorig + dz * Z)
        self._x = jnp.asarray(xorig + dx * X)

        if systemConfig.get('3D', False):
            self.Green = self.Green3D
        else:
            self.Green = self.Green2D

    def Green2D(self, r):
        'The 2D Green\'s function (hankel1 per the reference FT convention)'

        return self.scaleterm * self.rho * (-0.5j * hankel1_0(self.k * r))

    def Green3D(self, r):
        'The 3D Green\'s function'

        rsafe = jnp.where(r > 0, r, 1.0)
        out = self.scaleterm * self.rho * (1. / (4 * np.pi * rsafe)) \
            * jnp.exp(1j * self.k * rsafe)
        return jnp.where(r > 0, out, 0.0)

    def __call__(self, q):
        'Model the Green\'s function given a source location array (1, 2)'

        q = np.asarray(q)
        x = q[0, 0]
        z = q[0, -1]

        dx = self._x - x
        dz = self._z - z
        dist = jnp.sqrt(dx ** 2 + dz ** 2)
        strangle = jnp.arctan(dz / dx) + self.theta
        stretch = jnp.sqrt(self.stretch * jnp.cos(strangle) ** 2
                           + jnp.sin(strangle) ** 2)

        # NaN at the source point (0/0 in strangle) propagates through the
        # Green's function and is zeroed at the end, as in the reference.
        out = self.Green(dist * stretch)
        return jnp.nan_to_num(out).ravel()

    def __mul__(self, q):
        'Pretend to be a matrix'

        return self(q)
