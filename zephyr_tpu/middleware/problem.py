'''
Inverse-problem layer for zephyr_tpu: the Helmholtz Problem classes.

Reference parity: zephyr/middleware/problem.py (HelmBaseProblem and its
concrete bindings). The public surface is preserved — ``updateModel`` with
EPS-guarded cache clearing, the lazy ``system`` SystemWrapper, ``fields``/
``lazyFields``, and ``Jvec``/``Jtvec`` sensitivity products — but the
derivative machinery is fundamentally different and better suited to TPU:

The reference hand-writes the adjoint-state algebra (problem.py:79-163)
with the -omega^2/c^3 scaling and a reciprocity shortcut that implicitly
assumes the operator is symmetric (true only for homogeneous media). Here
``Jvec``/``Jtvec`` are the EXACT JVP/VJP of the discrete forward map,
obtained by JAX implicit differentiation through the iterative solve
(one extra batched solve with A, resp. A^T, per frequency — the same cost
structure as the reference's "mux" trick, problem.py:144-152). They pass
adjoint dot tests to solver tolerance for arbitrary heterogeneous models.
'''

import numpy as np

import jax
from jax import lax
import jax.numpy as jnp

from ..core.attrmap import BaseSCCache
from ..backend import (BaseModelDependent, MultiFreq, ViscoMultiFreq,
                       ViscoMultiGridMultiFreq)
from ..backend.minizephyr import MiniZephyr, MiniZephyrHD, MiniZephyr25D
from ..backend.eurus import Eurus, EurusHD
from ..backend.discretization import default_complex_dtype
from ..ops.minizephyr_coeff import minizephyr_planes
from ..ops.eurus_coeff import eurus_planes
from ..backend.interpolation import resample_field
from ..solver.helmholtz import (SolverConfig, prepare_operator,
                                resolve_solver_config, solve_batched,
                                shifted_velocity)
from .survey import (HelmBaseSurvey, HelmMultiGridSurvey, Helm2DSurvey,
                     Helm25DSurvey)
from .fields import HelmFields
from .mesh import TensorMesh2D

EPS = 1e-15


class HelmBaseProblem(BaseModelDependent, BaseSCCache):
    'Base frequency-domain problem (parity: problem.py:17-201).'

    initMap = {
    #   Argument            Required    Rename as ...   Store as type
        'SystemWrapper':    (True,      None,           None),
    }

    surveyPair = HelmBaseSurvey
    cacheItems = ['_system', '_dpred_grad_fn']

    def __init__(self, systemConfig, *args, **kwargs):

        BaseSCCache.__init__(self, systemConfig, *args, **kwargs)
        self.mesh = TensorMesh2D(self.nx, self.nz, self.dx, self.dz)
        self.survey = None

    # -- pairing -------------------------------------------------------------

    def pair(self, s):
        self.survey = s
        s.prob = self

    @property
    def ispaired(self):
        return self.survey is not None

    # -- model management ----------------------------------------------------

    def updateModel(self, m, loneKey='c'):
        'EPS-guarded model update with cache clearing (problem.py:51-66).'

        if m is None:
            return
        if isinstance(m, dict):
            self.systemConfig.update(m)
            self.clearCache()
        elif isinstance(m, (np.ndarray, np.inexact, complex, float)):
            m = np.asarray(m)
            current = np.asarray(
                self.systemConfig.get(loneKey, 0.)).ravel()
            if current.size != m.size or \
                    not np.linalg.norm(m.ravel() - current) < EPS:
                self.systemConfig[loneKey] = m
                self.clearCache()
        else:
            raise TypeError(
                "%s doesn't know how to update with model of type %s"
                % (self.__class__.__name__, type(m)))

    @property
    def system(self):
        if getattr(self, '_system', None) is None:
            self._system = self.SystemWrapper(self.systemConfig)
        return self._system

    # -- reference-parity scalings (kept for API completeness) ---------------

    def scaledTerms(self, ifreq):
        omega = 2 * np.pi * self.survey.freqs[ifreq]
        c = self.system.subProblems[ifreq].c
        return omega, c

    def gradientScaler(self, ifreq):
        omega, c = self.scaledTerms(ifreq)
        return self.survey.postProcessors[ifreq](
            -(omega ** 2 / c ** 3).ravel())

    def sensScaler(self, ifreq):
        omega, c = self.scaledTerms(ifreq)
        return self.survey.postProcessors[ifreq](
            -(c ** 3 / omega ** 2).ravel())

    # -- fields --------------------------------------------------------------

    def lazyFields(self, m=None):
        if not self.ispaired:
            raise RuntimeError(
                '%s instance is not paired to a survey'
                % (self.__class__.__name__,))
        self.updateModel(m)
        qf = self.survey.getSources()
        uF = self.system * qf
        if not np.iterable(uF):
            uF = [uF]
        return uF

    def fields(self, m=None):
        uF = self.lazyFields(m)
        uF = (pp(np.asarray(uFi))
              for uFi, pp in zip(uF, self.survey.postProcessors))
        fields = HelmFields(self.mesh, self.survey)
        for ifreq, uFsub in enumerate(uF):
            fields[:, 'u', ifreq] = uFsub
        return fields

    # -- exact sensitivity machinery ----------------------------------------

    @property
    def baseVelocity(self):
        'The (real) base velocity model the sensitivities act on.'
        c = np.asarray(self.systemConfig['c'])
        if c.size == 1:
            c = float(np.real(c)) * np.ones((self.nz, self.nx))
        return np.real(c).reshape((self.nz, self.nx))

    def _discInfo(self):
        'Resolve the discretization family and per-frequency premul.'
        Disc = self.systemConfig.get('Disc', MiniZephyr)
        is_eurus = issubclass(Disc, Eurus)
        is_hd = issubclass(Disc, (MiniZephyrHD, EurusHD))
        is_25d = issubclass(Disc, MiniZephyr25D) or \
            (int(self.systemConfig.get('nky', 1) or 1) > 1
             and not is_eurus)
        return Disc, is_eurus, is_hd, is_25d

    def _modelTransform(self, c, freq, Q=None):
        '''
        The per-frequency complex-velocity transform implemented by the
        SystemWrapper (dispersion for the Visco wrappers), as a pure jnp
        function of the base velocity (distributors.py:326-359 semantics).
        ``Q`` overrides the configured attenuation model (used by the
        MultiGrid path, which resamples an array-valued Q to each
        frequency's grid).
        '''

        wrapper = self.SystemWrapper
        if issubclass(wrapper, ViscoMultiFreq):
            if Q is None:
                Q = self.systemConfig.get('Q', np.inf)
            freqBase = self.systemConfig.get('freqBase', 0.)
            Q = jnp.asarray(Q)
            if bool(jnp.any(Q != jnp.inf)) and freqBase > 0:
                fact = 1. + (jnp.log(freq / freqBase) / (jnp.pi * Q))
                cR = fact * c
                return cR + 0.5j * cR / Q
            return c + 0.5j * c / Q
        return c + 0j

    def _planeKwargs(self):
        sc = self.systemConfig
        kwargs = dict(
            dx=float(sc.get('dx', 1.)), dz=float(sc.get('dz', 1.)),
            nPML=int(sc.get('nPML', 10)),
            tau=float(sc.get('tau', np.inf)),
            freeSurf=tuple(bool(f) for f in sc.get(
                'freeSurf', (False, False, False, False))))
        return kwargs

    @property
    def solverConfig(self):
        '''
        Solver options with the shared precision-aware tol default and
        the auto-panel default resolved host-side from this problem's
        velocity model (scalar systems; Eurus block systems ignore the
        panel config — see backend.discretization.solverConfig).
        '''
        from ..solver.helmholtz import resolve_panels
        cfg = resolve_solver_config(self.systemConfig.get('solverOpts',
                                                          {}))
        c = self.systemConfig.get('c', None)
        if c is not None and np.asarray(c).size > 1:
            nz = int(self.systemConfig['nz'])
            nx = int(self.systemConfig['nx'])
            cfg = resolve_panels(cfg, np.asarray(c).reshape(nz, nx))
        return cfg

    def _solve_25d(self, ci, rho, f, qf_i, cfg, kwargs,
                   scan_threshold=8):
        '''
        Per-frequency 2.5D wavefield: Fourier summation over cross-line
        wavenumbers with the reference MiniZephyr25D conventions
        (minizephyr.py:380-433). Returns (nrow, nsrc).

        Small nky vmaps the whole per-ky pipeline (fastest); above
        ``scan_threshold`` the summation runs as a lax.scan so hierarchy
        memory stays bounded at ONE prepared operator regardless of nky
        (production nky is 20-160, reference minizephyr.py:380-394 — a
        vmapped preparation would multiply the multigrid hierarchy by
        nky).
        '''

        import jax as _jax
        from functools import partial as _partial
        from ..solver.helmholtz import solve as _solve

        sc = self.systemConfig
        nky = int(sc.get('nky', 1) or 1)
        cmin = float(sc.get('cmin', np.min(np.real(
            np.asarray(self.baseVelocity)))))
        weightfac = 1. / (2 * nky - 1) if nky > 1 else 1.
        scale_term = np.exp(1j * np.pi) / (4 * np.pi)
        dky = f / (cmin * (nky - 1)) if nky > 1 else 0.
        kys = jnp.arange(nky) * dky
        premuls = weightfac * (1. + (kys > 0))
        nz, nx = self.nz, self.nx
        b_all = qf_i.T.reshape((-1, 1, nz, nx))

        def per_ky(ky, premul):
            planes = minizephyr_planes(ci, rho, freq=f, ky=ky,
                                       **kwargs)[None, None]
            pplanes = minizephyr_planes(
                shifted_velocity(ci, cfg.shift), rho, freq=f, ky=ky,
                pml_cap=cfg.pml_cap, **kwargs)[None, None]
            op = prepare_operator(planes, pplanes, cfg,
                                  with_transpose=True)
            b = premul.astype(b_all.dtype) * b_all
            x = _jax.vmap(_partial(_solve, op, config=cfg))(b)
            return jnp.conj(x[:, 0])

        if nky <= scan_threshold:
            u_ky = _jax.vmap(per_ky)(kys, premuls)
            u = jnp.sum(u_ky, axis=0)            # (nsrc, nz, nx)
        else:
            def step(acc, inp):
                ky, premul = inp
                return acc + per_ky(ky, premul), None

            u, _ = lax.scan(step, jnp.zeros_like(b_all[:, 0]),
                            (kys, premuls))
        u = scale_term * u
        return u.reshape((u.shape[0], nz * nx)).T

    def _surveyFingerprint(self):
        '''
        Value-based fingerprint of everything the cached forward map
        closes over from the survey (geometry, spectra, grid scales):
        a survey change after the first Jvec/Jtvec must rebuild the
        closure. Model changes are handled by updateModel/cacheItems.
        '''

        import hashlib
        s = self.survey
        h = hashlib.sha1()
        h.update(np.ascontiguousarray(
            np.asarray(s.sLocs, np.float64)).tobytes())
        h.update(np.ascontiguousarray(
            np.asarray(s.rLocs, np.float64)).tobytes())
        h.update(np.asarray(s.freqs, np.float64).tobytes())
        h.update(s.mode.encode())
        h.update(np.ascontiguousarray(np.asarray(s.ssTerms)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(s.srTerms)).tobytes())
        h.update(np.ascontiguousarray(np.asarray(s.tsTerms)).tobytes())
        if isinstance(s, HelmMultiGridSurvey):
            h.update(np.asarray(s.mgHelper.scales).tobytes())
        return (id(s), h.hexdigest())

    def _dpred_fn(self):
        '''
        Build (and cache) the pure, differentiable forward map
        c (nz, nx) real -> data cube (nrec, nsrc, nfreq) complex.

        For MultiGrid surveys (per-frequency computation grids,
        reference survey.py:209-330 + distributors.py:384-435) each
        frequency's system is built on its own scaled grid: the model
        is resampled differentiably (resample_field) inside the traced
        map, and the survey's scaled-grid source/receiver matrices are
        consumed as-is — so Jvec/Jtvec return fine-grid model
        sensitivities with the chain rule through the resampler,
        matching the reference's pre/postProcessor composition
        (problem.py:87-163).
        '''

        key = self._surveyFingerprint()
        if getattr(self, '_dpred_grad_fn', None) is not None \
                and getattr(self, '_dpred_key', None) == key:
            return self._dpred_grad_fn

        survey = self.survey
        cfg = self.solverConfig
        cdtype = default_complex_dtype()
        Disc, is_eurus, is_hd, is_25d = self._discInfo()
        is_mg = isinstance(survey, HelmMultiGridSurvey)
        if is_mg and (is_eurus or is_25d):
            raise NotImplementedError(
                'per-frequency computation grids are bound to the '
                'scalar 2D (visco) problem, as in the reference '
                '(zephyr/middleware/problem.py:224-238)')
        kwargs = self._planeKwargs()
        if is_eurus:
            sc = self.systemConfig
            kwargs['cPML'] = float(sc.get('cPML', 1e3))
            zeros = np.zeros((self.nz, self.nx))
            kwargs['theta'] = jnp.asarray(sc.get('theta', zeros))
            kwargs['eps'] = jnp.asarray(sc.get('eps', zeros))
            kwargs['delta'] = jnp.asarray(sc.get('delta', zeros))
        rho = jnp.asarray(self.systemConfig.get(
            'rho', 310. * self.baseVelocity ** 0.25))
        if rho.size == 1:
            rho = rho * jnp.ones((self.nz, self.nx))
        rho = rho.reshape((self.nz, self.nx))

        freqs = [float(f) for f in survey.freqs]
        # sources with spectrum applied: list of (nrow_i, nsrc) dense
        # (on each frequency's own grid for MultiGrid surveys)
        qf = [jnp.asarray(np.asarray(q.todense()
                                     if hasattr(q, 'todense') else q),
                          dtype=cdtype) for q in survey.getSources()]

        # per-frequency receivers: (nrec, nrow_i) dense (fixed mode) or
        # a (nsrc, nrec, nrow_i) stack (relative mode)
        def _rv(isrc, ifreq):
            return (survey.rVec(isrc, ifreq) if is_mg
                    else survey.rVec(isrc))

        if survey.mode == 'fixed':
            R = [jnp.asarray(np.asarray(_rv(0, i).todense()),
                             dtype=cdtype) for i in range(len(freqs))]
        else:
            R = [jnp.stack([jnp.asarray(
                np.asarray(_rv(s, i).todense()), dtype=cdtype)
                for s in range(survey.nsrc)]) for i in range(len(freqs))]

        nz, nx = self.nz, self.nx
        B = 2 if is_eurus else 1

        # per-frequency grid geometry and (static) resampled aux fields
        if is_mg:
            geoms, Qs, rhos = [], [], []
            Q_cfg = np.asarray(self.systemConfig.get('Q', np.inf))
            for i in range(len(freqs)):
                sc_i = survey.scScales[survey.buildSC(i)]
                snz, snx = int(sc_i['nz']), int(sc_i['nx'])
                geoms.append((snz, snx,
                              dict(kwargs, dx=float(sc_i['dx']),
                                   dz=float(sc_i['dz']))))
                if Q_cfg.size > 1:
                    ds = survey.mgHelper.downScalers[i]
                    Qs.append(jnp.asarray(np.real(
                        np.asarray(ds * Q_cfg.ravel())).reshape(
                            (snz, snx))))
                else:
                    Qs.append(None)
                rhos.append(resample_field(rho, (snz, snx))
                            if (snz, snx) != (nz, nx) else rho)
        else:
            geoms = [(nz, nx, kwargs)] * len(freqs)
            Qs = [None] * len(freqs)
            rhos = [rho] * len(freqs)

        def forward(c_real):
            c_real = c_real.reshape((nz, nx))
            panels = []
            for i, f in enumerate(freqs):
                nz_i, nx_i, kw = geoms[i]
                nrow_i = nz_i * nx_i
                c_i = (resample_field(c_real, (nz_i, nx_i))
                       if (nz_i, nx_i) != (nz, nx) else c_real)
                ci = self._modelTransform(c_i, f, Q=Qs[i]).astype(cdtype)
                if is_25d:
                    u = self._solve_25d(ci, rhos[i], f, qf[i], cfg, kw)
                else:
                    if is_eurus:
                        planes = eurus_planes(ci, rhos[i], freq=f, **kw)
                        pplanes = eurus_planes(
                            shifted_velocity(ci, cfg.shift), rhos[i],
                            freq=f, pml_cap=cfg.pml_cap, **kw)
                    else:
                        planes = minizephyr_planes(ci, rhos[i], freq=f,
                                                   **kw)[None, None]
                        pplanes = minizephyr_planes(
                            shifted_velocity(ci, cfg.shift), rhos[i],
                            freq=f, pml_cap=cfg.pml_cap,
                            **kw)[None, None]
                    op = prepare_operator(planes, pplanes, cfg,
                                          with_transpose=True)
                    premul = np.sqrt(2j * np.pi * f) if is_hd else \
                        complex(self.systemConfig.get('premul', 1.))
                    b = (premul * qf[i]).T  # (nsrc, nrow_i)
                    nsrc = b.shape[0]
                    if is_eurus:
                        b = jnp.concatenate(
                            [b, jnp.zeros_like(b)], axis=1)
                    b = b.reshape((nsrc, B, nz_i, nx_i))
                    x = solve_batched(op, b, cfg)
                    u = jnp.conj(x[:, 0].reshape((nsrc, nrow_i))).T
                if survey.mode == 'fixed':
                    # explicit precision: TPU matmuls default to bf16
                    panels.append(jnp.matmul(
                        R[i], u, precision=lax.Precision.HIGHEST))
                else:
                    nsrc = qf[i].shape[1]
                    panels.append(jnp.einsum(
                        'smn,ns->ms', R[i].reshape((nsrc, -1, nrow_i)),
                        u, precision=lax.Precision.HIGHEST))
            return jnp.stack(panels, axis=-1)  # (nrec, nsrc, nfreq)

        self._dpred_grad_fn = forward
        self._dpred_key = key
        return forward

    def Jvec(self, m=None, v=None, u=None):
        '''
        Sensitivity (Jacobian) times a model vector: the exact JVP of the
        forward map at the current model. Returns the raveled complex
        data-perturbation cube (nrec * nsrc * nfreq,).
        '''

        if not self.ispaired:
            raise RuntimeError('%s instance is not paired to a survey'
                               % (self.__class__.__name__,))
        if v is None:
            raise ValueError('Jvec requires a perturbation vector')

        self.updateModel(m)
        forward = self._dpred_fn()
        c0 = jnp.asarray(self.baseVelocity)
        tangent = jnp.asarray(np.real(v).reshape(c0.shape))
        _, dpert = jax.jvp(forward, (c0,), (tangent,))
        return np.asarray(dpert).ravel()

    def Jtvec(self, m=None, v=None, u=None):
        '''
        Adjoint sensitivity: the exact VJP of the forward map, returning
        the real model-space gradient contribution for a complex data
        vector v. Satisfies Re<w, Jvec(v)> == <Jtvec(w), v> exactly (to
        solver tolerance).
        '''

        if not self.ispaired:
            raise RuntimeError('%s instance is not paired to a survey'
                               % (self.__class__.__name__,))
        if v is None:
            raise ValueError('Jtvec requires a residual vector')

        self.updateModel(m)
        forward = self._dpred_fn()
        c0 = jnp.asarray(self.baseVelocity)
        ct = jnp.asarray(np.asarray(v).reshape(
            (self.survey.nrec, self.survey.nsrc, self.survey.nfreq)))
        _, vjp_fn = jax.vjp(forward, c0)
        (g,) = vjp_fn(jnp.conj(ct))
        return np.real(np.asarray(g)).ravel()

    def misfit_and_gradient(self, m, dobs):
        '''
        0.5 || dpred(m) - dobs ||^2 and its exact gradient w.r.t. the
        (real) velocity model — the fused FWI objective used by the
        inversion loop (replaces SimPEG DataMisfit.evalDeriv).
        '''

        self.updateModel(m)
        forward = self._dpred_fn()
        dobs = jnp.asarray(np.asarray(dobs).reshape(
            (self.survey.nrec, self.survey.nsrc, self.survey.nfreq)))

        def objective(c):
            r = forward(c) - dobs
            return 0.5 * jnp.sum(jnp.abs(r) ** 2)

        val, grad = jax.value_and_grad(objective)(
            jnp.asarray(self.baseVelocity))
        return float(val), np.asarray(grad).ravel()

    @property
    def factors(self):
        return self.system.factors

    @factors.deleter
    def factors(self):
        del self.system.factors


class Helm2DProblem(HelmBaseProblem):

    initMap = {
    #   Argument            Required    Rename as ...   Store as type
        'SystemWrapper':    (False,     None,           None),
    }

    surveyPair = Helm2DSurvey
    SystemWrapper = MultiFreq


class Helm2DViscoProblem(Helm2DProblem):

    SystemWrapper = ViscoMultiFreq


class Helm2DViscoMultiGridProblem(Helm2DProblem):

    SystemWrapper = ViscoMultiGridMultiFreq


class Helm25DProblem(HelmBaseProblem):

    initMap = {
    #   Argument            Required    Rename as ...   Store as type
        'SystemWrapper':    (False,     None,           None),
    }

    surveyPair = Helm25DSurvey
    SystemWrapper = MultiFreq


class Helm25DViscoProblem(Helm25DProblem):

    SystemWrapper = ViscoMultiFreq
