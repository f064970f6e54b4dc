'''
Regular-grid interpolation for zephyr_tpu.

Reference parity: zephyr/backend/interpolation.py (BaseGridInterpolator /
SplineGridInterpolator): regular-grid to regular-grid resampling with a
scale factor, an energy-conserving option (multiplication by scale^2), a
self-transpose ``T`` building the inverse-scale interpolator, and a
``scaleUpdate`` dict that patches systemConfigs onto the scaled grid.

Two implementations are provided:
- ``SplineGridInterpolator``: bivariate spline (scipy, host-side) matching
  the reference semantics exactly; used at setup time by the multi-grid
  frequency machinery.
- ``resample_field``: a jit-compatible cubic resampler (jax.image.resize)
  for on-device use inside compiled pipelines.
'''

import numpy as np

import jax.image
import jax.numpy as jnp

from ..core.attrmap import BaseSCCache
from .base import BaseModelDependent


def resample_field(field, new_shape, method='cubic'):
    'On-device resampling of a (nz, nx) field to new_shape (jit-safe).'

    if jnp.iscomplexobj(field):
        return (jax.image.resize(field.real, new_shape, method)
                + 1j * jax.image.resize(field.imag, new_shape, method))
    return jax.image.resize(field, new_shape, method)


class BaseGridInterpolator(BaseModelDependent, BaseSCCache):
    '''
    Base class for interpolation between two regular grids
    (parity: interpolation.py:14-169).
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'scale':        (True,      None,           np.float64),
        'eCons':        (False,     '_eCons',       bool),
    }

    @property
    def eCons(self):
        return getattr(self, '_eCons', False)

    @property
    def snx(self):
        return int(np.round(self.nx / self.scale))

    @property
    def snz(self):
        return int(np.round(self.nz / self.scale))

    @property
    def sdx(self):
        return self.dx * self.scale

    @property
    def sdz(self):
        return self.dz * self.scale

    @property
    def Z(self):
        return np.linspace(self.zorig, self.zorig + self.dz * (self.nz - 1),
                           self.nz)

    @property
    def X(self):
        return np.linspace(self.xorig, self.xorig + self.dx * (self.nx - 1),
                           self.nx)

    @property
    def sZ(self):
        return np.linspace(self.zorig,
                           self.zorig + self.sdz * (self.snz - 1), self.snz)

    @property
    def sX(self):
        return np.linspace(self.xorig,
                           self.xorig + self.sdx * (self.snx - 1), self.snx)

    @property
    def compression(self):
        return self.scale ** 2

    @property
    def shape(self):
        return (self.snx * self.snz, self.nx * self.nz)

    @property
    def T(self):
        'The transposed (inverse-scale) interpolator.'
        if not hasattr(self, '_T'):
            configT = dict(self.systemConfig)
            configT.update({
                'scale': 1. / self.scale,
                'nx': self.snx,
                'nz': self.snz,
                'dx': self.sdx,
                'dz': self.sdz,
            })
            self._T = self.__class__(configT)
        return self._T

    @property
    def scaleUpdate(self):
        'Config patch that moves a systemConfig onto the scaled grid.'
        return {
            'nx': self.snx,
            'nz': self.snz,
            'dx': self.sdx,
            'dz': self.sdz,
        }

    def __mul__(self, value):
        raise NotImplementedError

    def __call__(self, value):
        return self * value


class SplineGridInterpolator(BaseGridInterpolator):
    '''
    Bivariate-spline interpolator (parity: interpolation.py:172-198);
    complex fields are resampled as re + 1j * im; multi-column inputs are
    handled column-by-column.
    '''

    def __mul__(self, rhs):

        from scipy.interpolate import RectBivariateSpline

        if self.shape[0] == self.shape[1]:
            return rhs

        rhs = np.asarray(rhs)
        if rhs.ndim == 2:
            out = np.zeros((self.shape[0], rhs.shape[1]),
                           dtype=rhs.dtype)
            for i in range(rhs.shape[1]):
                out[:, i] = self * rhs[:, i]
            return out
        if rhs.ndim > 2:
            raise NotImplementedError(
                '%s does not support %dD inputs'
                % (self.__class__.__name__, rhs.ndim))

        if np.iscomplexobj(rhs):
            return (self * rhs.real) + 1j * (self * rhs.imag)

        rbs = RectBivariateSpline(self.Z, self.X,
                                  rhs.reshape((self.nz, self.nx)))
        result = rbs(self.sZ, self.sX, grid=True)
        if self.eCons:
            result = result * self.compression
        return result.ravel()
