'''
Discretization base classes for zephyr_tpu.

Reference parity: zephyr/backend/discretization.py. The universal calling
convention is preserved — a discretization instance IS the inverse
operator: ``u = Ainv * q`` returns wavefields, and
``__mul__`` applies ``(A^{-1} (premul * rhs)).conjugate()`` (the FT
convention of discretization.py:101-103). What changes underneath:

- There is no sparse matrix and no LU. ``A`` is a matrix-free coefficient-
  plane pytree (see zephyr_tpu.ops.stencil) and the solve is the multigrid-
  preconditioned BiCGStab of zephyr_tpu.solver.helmholtz, jitted on device.
- "Factorization" lifecycle (discretization.py:79-99) maps to the prepared
  HelmholtzOperator (planes + multigrid hierarchy), cached per instance and
  droppable via ``del obj.factors``.
'''

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ..core.attrmap import BaseSCCache
from ..solver.helmholtz import (SolverConfig, prepare_operator,
                                resolve_solver_config, solve_batched,
                                shifted_velocity)
from .base import BaseModelDependent


def default_complex_dtype():
    'complex128 when x64 is enabled (CPU tests), else complex64 (TPU).'
    return jnp.complex128 if jax.config.jax_enable_x64 else jnp.complex64


class BaseDiscretization(BaseModelDependent):
    '''
    Base class for all discretizations. Subclasses provide
    ``_planesFromFields(c, rho)`` (the true operator planes, shape
    (B, B, 9, nz, nx)) and ``_precondPlanesFromFields(c, rho)`` (the
    complex-shifted preconditioner), both pure traced functions.
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'c':            (True,      '_c',           np.complex128),
        'rho':          (False,     '_rho',         np.float64),
        'freq':         (True,      None,           np.complex128),
        'Solver':       (False,     '_Solver',      None),
        'tau':          (False,     '_tau',         np.float64),
        'premul':       (False,     '_premul',      np.complex128),
        'solverOpts':   (False,     '_solverOpts',  dict),
    }

    @property
    def tau(self):
        'Laplace-domain damping time constant'
        return getattr(self, '_tau', np.inf)

    @property
    def dampCoeff(self):
        'Computed damping coefficient to be added to real omega'
        return 1j / self.tau

    @property
    def premul(self):
        'A premultiplication factor, used by 2.5D and half differentiation'
        return getattr(self, '_premul', 1.)

    @property
    def c(self):
        'Complex wave velocity'
        if isinstance(self._c, np.ndarray) and self._c.size > 1:
            return self._c.reshape((self.nz, self.nx))
        return np.complex128(self._c) * np.ones((self.nz, self.nx),
                                                dtype=np.complex128)

    @property
    def rho(self):
        'Bulk density; defaults to Gardner\'s relation 310 c^0.25'
        if hasattr(self, '_rho'):
            rho = self._rho
            if isinstance(rho, np.ndarray) and rho.size > 1:
                return rho.reshape((self.nz, self.nx))
            return np.float64(rho) * np.ones((self.nz, self.nx),
                                             dtype=np.float64)
        self._rho = 310. * self.c.real ** 0.25
        return self._rho

    @property
    def solverConfig(self):
        '''
        Static iterative-solver configuration (overridable via the
        ``solverOpts`` config key), with the precision-aware default
        tolerance resolved by the shared helper
        (solver.helmholtz.resolve_solver_config) so the backend and
        middleware solve paths agree, and the auto-panel default
        (strat_panels=0) resolved host-side from this problem's model:
        laterally heterogeneous media get the x-panelled stratified
        interior solve, layered/homogeneous stay global (scalar
        operators only; Eurus block systems ignore the panel config).
        '''
        from ..solver.helmholtz import resolve_panels
        cfg = resolve_solver_config(getattr(self, '_solverOpts', {}))
        if self.nblock == 1:
            cfg = resolve_panels(cfg, self.c)
        return cfg

    @property
    def nblock(self):
        'Number of wavefield blocks (1 scalar; 2 for the Eurus TTI pair).'
        return 1

    @property
    def A(self):
        'The matrix-free operator: (B, B, 9, nz, nx) coefficient planes.'
        if getattr(self, '_A', None) is None:
            cdtype = default_complex_dtype()
            self._A = self._planesFromFields(
                jnp.asarray(self.c, dtype=cdtype), jnp.asarray(self.rho))
        return self._A

    @property
    def shape(self):
        n = self.nblock * self.nrow
        return (n, n)

    def _tracedPlaneInputs(self):
        '''
        Plane-builder inputs that VARY across sibling subproblems (the
        per-frequency / per-ky members of a distributor): passed as
        traced arguments of the shared prepare jit, so e.g. a 50-
        frequency MultiFreq job compiles the operator preparation ONCE
        instead of once per frequency (the reference pays one sparse
        factorization per frequency instead,
        zephyr/backend/distributors.py:243-265).
        '''
        return {'freq': np.complex128(self.freq),
                'tau': np.float64(self.tau)}

    # shared across instances: one prepare trace per
    # (class, shape, dtype, config, static plane attributes)
    _rio_preps = {}

    @property
    def Ainv(self):
        '''
        The prepared on-device solver (planes + multigrid hierarchy),
        built INSIDE a real-I/O jit boundary so the whole preparation
        runs on accelerators without complex host<->device transfer
        (core/realio.py). Held as a device-resident re/im pair pytree.

        The jitted preparation is cached class-wide with frequency-like
        scalars as traced inputs (see ``_tracedPlaneInputs``). The cache
        contract is structural, not by convention: every plane-builder
        argument the class's ``_planeKwargs`` produces is either a
        traced input or part of the cache key, and the cached closure
        captures only those plain static values plus the class's pure
        builders (``_planesPure``/``_precondPlanesPure``) — never the
        instance, so no model arrays are pinned by the cache.
        '''
        if not hasattr(self, '_Ainv'):
            from ..core.realio import realio_jit
            cdtype = default_complex_dtype()
            rdtype = (np.float32 if cdtype == jnp.complex64
                      else np.float64)
            cfg = self.solverConfig
            traced = self._tracedPlaneInputs()
            names = tuple(traced)
            statics = {k: v for k, v in self._planeKwargs().items()
                       if k not in names}
            key = (type(self), self.nz, self.nx, np.dtype(cdtype).name,
                   cfg, tuple(sorted(statics.items())), names)
            cache = BaseDiscretization._rio_preps
            if key not in cache:
                build = type(self)._planesPure
                buildP = type(self)._precondPlanesPure

                def prep(c, rho, *vals):
                    kw = dict(statics)
                    kw.update(zip(names, vals))
                    return prepare_operator(
                        build(c, rho, **kw),
                        buildP(c, rho, cfg, **kw),
                        cfg, with_transpose=False)

                cache[key] = realio_jit(prep)

            def cast(v):
                v = np.asarray(v)
                if np.iscomplexobj(v):
                    return v.astype(cdtype)
                return v.astype(rdtype)

            c = np.asarray(self.c, dtype=np.complex128).astype(cdtype)
            rho = np.asarray(self.rho, dtype=np.float64).astype(rdtype)
            vals = [cast(traced[k]) for k in names]
            dev = getattr(self, '_deviceHint', None)
            if dev is not None:
                # commit the inputs to the hinted device so the jitted
                # preparation (and the prepared operator) live there —
                # the parallel distributor round-robins siblings across
                # local devices this way
                from ..core.realio import device_put_c
                c = device_put_c(c, dev)
                rho = jax.device_put(rho, dev)
                vals = [device_put_c(v, dev) for v in vals]
            self._Ainv = cache[key](c, rho, *vals)
        return self._Ainv

    def _planesFromFields(self, c, rho):
        'True-operator planes as a traced function of (c, rho).'
        raise NotImplementedError

    def _precondPlanesFromFields(self, c, rho):
        'Shifted-preconditioner planes as a traced function of (c, rho).'
        raise NotImplementedError

    @Ainv.deleter
    def Ainv(self):
        if hasattr(self, '_Ainv'):
            del self._Ainv

    @property
    def factors(self):
        return hasattr(self, '_Ainv')

    @factors.deleter
    def factors(self):
        del self.Ainv

    # shared across instances: one solve trace per (shape, config)
    _rio_solvers = {}

    @classmethod
    def _rio_solve(cls, cfg):
        from ..core.realio import realio_jit
        if cfg not in cls._rio_solvers:
            cls._rio_solvers[cfg] = realio_jit(
                lambda op, b: solve_batched(op, b, cfg))
        return cls._rio_solvers[cfg]

    def _dispatch_rhs(self, rhs):
        '''
        Enqueue the solve for rhs (n, nrhs) complex and return the
        device-resident (C-pair) result WITHOUT blocking on completion
        (JAX dispatch is asynchronous). The parallel distributor uses
        this to keep several sibling solves in flight on different
        devices at once — the TPU-native analog of the reference's
        ``pool.apply_async`` (zephyr/backend/distributors.py:161-168).
        '''

        cdtype = default_complex_dtype()
        nrhs = rhs.shape[1]
        b = np.asarray(self.premul * rhs)
        if cdtype == jnp.complex64:
            b = b.astype(np.complex64)
        b = b.T.reshape((nrhs, self.nblock, self.nz, self.nx))
        dev = getattr(self, '_deviceHint', None)
        if dev is not None:
            from ..core.realio import device_put_c
            b = device_put_c(b, dev)
        return self._rio_solve(self.solverConfig)(self.Ainv, b), nrhs

    def _gather_rhs(self, fut, nrhs):
        'Materialize a dispatched solve (blocks), FT-conjugated.'

        from ..core.realio import join_complex_host
        x = np.asarray(join_complex_host(fut))
        x = x.reshape((nrhs, self.nblock * self.nrow)).T
        return x.conjugate()

    def _solve_rhs(self, rhs):
        '''
        Core solve: rhs (n, nrhs) complex -> wavefields (n, nrhs) with the
        reference's premul and conjugation applied.
        '''

        fut, nrhs = self._dispatch_rhs(rhs)
        return self._gather_rhs(fut, nrhs)

    def __mul__(self, rhs):
        'Action of multiplying the inverted system by a right-hand side.'

        if sp.issparse(rhs):
            rhs = rhs.toarray()
        rhs = np.asarray(rhs)
        single = rhs.ndim < 2
        if single:
            rhs = rhs.reshape((rhs.size, 1))
        u = self._solve_rhs(rhs.astype(np.complex128))
        return u.ravel() if single else u

    def __call__(self, value):
        return self * value


class DiscretizationWrapper(BaseSCCache):
    '''
    Base class for objects that wrap around discretizations in order to
    model composite systems (multi-frequency, multi-ky, multi-grid).
    Parity: discretization.py:109-169 — subproblem configs are produced by
    overlaying ``spUpdates`` dicts onto the stored systemConfig.
    '''

    initMap = {
    #   Argument        Required    Rename as ...   Store as type
        'Disc':         (True,      None,           None),
        'scaleTerm':    (False,     '_scaleTerm',   np.complex128),
    }

    maskKeys = {'scaleTerm'}

    cacheItems = ['_subProblems']

    @property
    def scaleTerm(self):
        'A scaling term to apply to the output wavefield.'
        return getattr(self, '_scaleTerm', 1.)

    @property
    def spUpdates(self):
        raise NotImplementedError

    @property
    def _spConfigs(self):
        '''
        Subproblem configs: the stored systemConfig with this wrapper's
        aggregated maskKeys REMOVED (so e.g. MiniZephyr25D's children do
        not re-receive Disc/nky and recurse — the reference's galoshes
        maskKeys semantics), overlaid with each spUpdate.
        '''

        base = self.maskedConfig

        def overlay(spu):
            config = dict(base)
            config.update(spu)
            return config

        return (overlay(spu) for spu in self.spUpdates)

    @property
    def subProblems(self):
        'Instantiated subproblem discretizations (cached).'

        if getattr(self, '_subProblems', None) is None:
            self._subProblems = [self.Disc(config)
                                 for config in self._spConfigs]
        return self._subProblems

    @property
    def factors(self):
        return getattr(self, '_subProblems', None) is not None and \
            any(s.factors for s in self._subProblems)

    @factors.deleter
    def factors(self):
        if getattr(self, '_subProblems', None) is not None:
            for s in self._subProblems:
                del s.factors

    def __mul__(self, rhs):
        raise NotImplementedError
