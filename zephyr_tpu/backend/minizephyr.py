'''
MiniZephyr: 2D / 2.5D (visco)acoustic frequency-domain wave modelling,
TPU-native.

Reference parity: zephyr/backend/minizephyr.py. The 9-point mixed-grid
stencil (OMEGA / Pratt, with Roecker-style PML) is built by the
differentiable plane builder in zephyr_tpu.ops.minizephyr_coeff; the solve
is the on-device multigrid-Krylov of zephyr_tpu.solver.helmholtz instead of
a sparse LU. The 2.5D wrapper (minizephyr.py:346-461) performs the same
Fourier summation over cross-line wavenumbers, but the per-ky subproblems
are solved as a vmapped batch on device rather than a multiprocessing pool.
'''

import numpy as np

from ..core.attrmap import BaseSCCache
from ..ops.minizephyr_coeff import minizephyr_planes
from ..solver.helmholtz import shifted_velocity
from .discretization import (BaseDiscretization, DiscretizationWrapper,
                             default_complex_dtype)


class MiniZephyr(BaseDiscretization):
    '''
    2D (visco)acoustic frequency-domain discretization with accommodations
    for 2.5D modelling (parity: minizephyr.py:27-324).
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'nPML':         (False,     '_nPML',        np.int64),
        'ky':           (False,     '_ky',          np.float64),
        'mord':         (False,     '_mord',        tuple),
    }

    @property
    def mord(self):
        'Matrix ordering (kept for API parity; layout is always (z, x)).'
        return getattr(self, '_mord', (self.nx, +1))

    @property
    def nPML(self):
        'The depth of the PML region in gridpoints'
        return int(getattr(self, '_nPML', 10))

    @property
    def ky(self):
        'The cross-line wavenumber for 2.5D operation'
        return float(getattr(self, '_ky', 0.))

    def _tracedPlaneInputs(self):
        return {'freq': np.complex128(self.freq),
                'tau': np.float64(self.tau),
                'ky': np.float64(self.ky)}


    def _planeKwargs(self, freq=None, tau=None, ky=None):
        return dict(
            freq=(complex(np.complex128(self.freq)) if freq is None
                  else freq),
            tau=self.tau if tau is None else tau,
            ky=self.ky if ky is None else ky,
            dx=self.dx, dz=self.dz, nPML=self.nPML,
            freeSurf=tuple(bool(f) for f in self.freeSurf))

    @staticmethod
    def _planesPure(c, rho, **kw):
        'Pure true-operator plane builder (no instance state).'
        return minizephyr_planes(c, rho, **kw)[None, None]

    @staticmethod
    def _precondPlanesPure(c, rho, cfg, **kw):
        'Pure shifted-preconditioner plane builder (no instance state).'
        return minizephyr_planes(shifted_velocity(c, cfg.shift), rho,
                                 pml_cap=cfg.pml_cap, **kw)[None, None]

    def _planesFromFields(self, c, rho, **traced):
        return self._planesPure(c, rho, **self._planeKwargs(**traced))

    def _precondPlanesFromFields(self, c, rho, **traced):
        return self._precondPlanesPure(c, rho, self.solverConfig,
                                       **self._planeKwargs(**traced))


class MiniZephyrHD(MiniZephyr):
    '''
    MiniZephyr with half-differentiation of the source by default,
    correcting for 3D spreading (parity: minizephyr.py:327-343).
    '''

    @property
    def premul(self):
        cfact = np.sqrt(2j * np.pi * np.complex128(self.freq))
        return getattr(self, '_premul', cfact)


class MiniZephyr25D(BaseDiscretization, DiscretizationWrapper):
    '''
    2.5D modelling by Fourier summation over cross-line wavenumbers
    (parity: minizephyr.py:346-461).

    This compat wrapper keeps the reference's host-driven contract:
    ``__mul__`` loops the ky subproblems SERIALLY on the host, each with
    its own cached factor lifecycle (BaseSCCache semantics), summing the
    weighted wavefields — matching DiscretizationWrapper's behavior so
    spUpdates/maskKeys/factors parity tests hold exactly.

    The TPU-batched production path is elsewhere: the per-ky systems
    share their grid and differ only in the ky mass term, so
    ``parallel.multifreq.multifreq_dpred_25d`` (and the middleware 2.5D
    scan path, middleware/problem.py) builds all ky planes at once and
    solves them as one device-vmapped batch over (ky, rhs). Use those
    for throughput; use this class for reference-compatible semantics.
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'Disc':         (False,     '_Disc',        None),
        'nky':          (True,      '_nky',         np.int64),
        'parallel':     (False,     '_parallel',    bool),
        'cmin':         (False,     '_cmin',        np.float64),
    }

    maskKeys = {'nky', 'Disc', 'parallel'}

    @property
    def Disc(self):
        'The discretization applied to each wavenumber subproblem'
        if getattr(self, '_Disc', None) is None:
            self._Disc = MiniZephyr
        return self._Disc

    @property
    def nky(self):
        'Number of cross-line wavenumber components'
        if getattr(self, '_nky', None) is None:
            self._nky = 1
        return int(self._nky)

    @property
    def cmin(self):
        'Minimum velocity (or configured representative value)'
        if getattr(self, '_cmin', None) is None:
            return np.min(self.c.real)
        return float(self._cmin)

    @property
    def pkys(self):
        '''
        The modelled wavenumbers: regular sampling corresponding to an
        inverse DFT (minizephyr.py:380-394).
        '''

        indices = np.arange(self.nky)
        if self.nky > 1:
            dky = float(np.real(np.complex128(self.freq))) \
                / (self.cmin * (self.nky - 1))
        else:
            dky = 0.
        return indices * dky

    @property
    def kyweights(self):
        'Inverse-DFT weights: 1 for ky = 0, else 2 (minizephyr.py:396-405).'
        indices = np.arange(self.nky)
        return 1. + (indices > 0)

    @property
    def spUpdates(self):
        'Per-ky subProblem config updates (minizephyr.py:417-421).'

        weightfac = 1. / (2 * self.nky - 1) if self.nky > 1 else 1.
        return [{'ky': ky, 'premul': weightfac * (1. + (ky > 0))}
                for ky in self.pkys]

    @property
    def scaleTerm(self):
        'Output scaling exp(i pi) / 4 pi (minizephyr.py:429-433).'
        return getattr(self, '_scaleTerm', 1.) * np.exp(1j * np.pi) \
            / (4 * np.pi)

    @property
    def factors(self):
        return DiscretizationWrapper.factors.fget(self)

    @factors.deleter
    def factors(self):
        DiscretizationWrapper.factors.fdel(self)

    def __mul__(self, rhs):
        '''
        Fan out the right-hand side(s) over the ky subproblems and return
        the weighted Fourier sum of wavefields.
        '''

        import scipy.sparse as sp
        if sp.issparse(rhs):
            rhs = rhs.toarray()
        rhs = np.asarray(rhs)
        single = rhs.ndim < 2
        if single:
            rhs = rhs.reshape((rhs.size, 1))

        u = None
        for subProblem in self.subProblems:
            usub = subProblem * rhs
            u = usub if u is None else u + usub

        u = self.scaleTerm * u
        return u.ravel() if single else u
