'''
Eurus: TTI anisotropic 2D (visco)acoustic frequency-domain modelling,
TPU-native.

Reference parity: zephyr/backend/eurus.py:14-552 (Operto et al. 2009
mixed-grid stencil; coupled 2N-state system [[M1, M2], [M3, M4]]; RHS
auto-padding of half-size sources with zeros and clipping of the result,
eurus.py:512-533). The coefficient planes come from the differentiable
builder in zephyr_tpu.ops.eurus_coeff; the solve is the block-stencil
multigrid-Krylov of zephyr_tpu.solver.helmholtz.
'''

import numpy as np

import jax.numpy as jnp
import scipy.sparse as sp

from ..ops.eurus_coeff import eurus_planes
from ..solver.helmholtz import shifted_velocity
from .base import BaseAnisotropic
from .discretization import BaseDiscretization, default_complex_dtype


class Eurus(BaseDiscretization, BaseAnisotropic):
    '''
    TTI anisotropic discretization (parity: eurus.py:14-533).
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'nPML':         (False,     '_nPML',        np.int64),
        'freq':         (True,      None,           np.complex128),
        'mord':         (False,     '_mord',        tuple),
        'cPML':         (False,     '_cPML',        np.float64),
    }

    @property
    def mord(self):
        'Matrix ordering (parity; layout is always (z, x) with the flip).'
        return getattr(self, '_mord', (-self.nx, +1))

    @property
    def cPML(self):
        'The convolutional PML coefficient (eurus.py:500-504).'
        return float(getattr(self, '_cPML', 1e3))

    @property
    def nPML(self):
        'The depth of the PML region in gridpoints'
        return int(getattr(self, '_nPML', 10))

    @property
    def nblock(self):
        return 2

    def _tracedPlaneInputs(self):
        return {'freq': np.complex128(self.freq),
                'tau': np.float64(self.tau),
                'theta': np.asarray(self.theta, np.float64),
                'eps': np.asarray(self.eps, np.float64),
                'delta': np.asarray(self.delta, np.float64)}


    def _planeKwargs(self, freq=None, tau=None, theta=None, eps=None,
                     delta=None):
        return dict(
            freq=(complex(np.complex128(self.freq)) if freq is None
                  else freq),
            tau=self.tau if tau is None else tau,
            theta=self.theta if theta is None else theta,
            eps=self.eps if eps is None else eps,
            delta=self.delta if delta is None else delta,
            dx=self.dx, dz=self.dz, nPML=self.nPML, cPML=self.cPML,
            freeSurf=tuple(bool(f) for f in self.freeSurf))

    @staticmethod
    def _planesPure(c, rho, **kw):
        'Pure true-operator plane builder (no instance state).'
        return eurus_planes(c, rho, **kw)

    @staticmethod
    def _precondPlanesPure(c, rho, cfg, **kw):
        'Pure shifted-preconditioner plane builder (no instance state).'
        return eurus_planes(shifted_velocity(c, cfg.shift), rho,
                            pml_cap=cfg.pml_cap, **kw)

    def _planesFromFields(self, c, rho, **traced):
        return self._planesPure(c, rho, **self._planeKwargs(**traced))

    def _precondPlanesFromFields(self, c, rho, **traced):
        return self._precondPlanesPure(c, rho, self.solverConfig,
                                       **self._planeKwargs(**traced))

    def __mul__(self, rhs):
        '''
        Action of the inverse of the 2N-state system. Half-size RHS are
        padded with zeros and the result clipped back (eurus.py:512-533).
        '''

        if sp.issparse(rhs):
            rhs = rhs.toarray()
        rhs = np.asarray(rhs)
        single = rhs.ndim < 2
        if single:
            rhs = rhs.reshape((rhs.size, 1))

        clipResult = False
        if 2 * rhs.shape[0] == self.shape[1]:
            rhs = np.vstack([rhs, np.zeros(rhs.shape, dtype=np.complex128)])
            clipResult = True
        elif rhs.shape[0] != self.shape[1]:
            raise ValueError('dimension mismatch')

        result = self._solve_rhs(rhs.astype(np.complex128))

        if clipResult:
            result = result[:self.shape[1] // 2, :]
        return result.ravel() if single else result


class EurusHD(Eurus):
    '''
    Eurus with half-differentiation of the source by default
    (parity: eurus.py:536-552).
    '''

    @property
    def premul(self):
        cfact = np.sqrt(2j * np.pi * np.complex128(self.freq))
        return getattr(self, '_premul', cfact)
