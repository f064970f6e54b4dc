'''
Batched Krylov solvers for zephyr_tpu.

Preconditioned BiCGStab (and a GMRES fallback through
jax.scipy.sparse.linalg) operating on block wavefields of shape
(B, nz, nx). Together with the multigrid preconditioner this replaces the
reference's sparse LU factorization + triangular solves
(reference zephyr/backend/discretization.py:79-103) — the iteration is
matrix-free, fully on device, and vmaps over right-hand sides (the
reference's batched-RHS axis, zephyr/middleware/survey.py:109-112).
'''

from functools import partial
from typing import NamedTuple, Any

import jax
import jax.numpy as jnp
from jax import lax


def _dot(a, b):
    'Complex inner product <a, b> = sum(conj(a) * b).'
    return jnp.vdot(a, b)


def _norm(a):
    return jnp.sqrt(jnp.abs(_dot(a, a)).real)


class BicgstabResult(NamedTuple):
    x: Any
    iters: Any
    relres: Any


def bicgstab(matvec, b, M=None, x0=None, tol=1e-6, maxiter=1000):
    '''
    Right-preconditioned BiCGStab for a single right-hand side.

    Args:
        matvec: x -> A x  (x, b of shape (B, nz, nx))
        b: right-hand side
        M: preconditioner application r -> approx A^{-1} r (or None)
        tol: relative residual target ||r|| <= tol * ||b||
        maxiter: iteration cap

    Returns:
        BicgstabResult(x, iters, relres)
    '''

    if M is None:
        M = lambda r: r

    bnorm = _norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    atol = tol * bnorm

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    rhat = r0

    # scalar carries are derived from b so they inherit its sharding
    # varying-axis type (required for while_loop inside shard_map)
    zero_s = jnp.sum(b) * 0
    one = zero_s + 1
    down0 = jnp.abs(zero_s) > 1
    tiny = jnp.finfo(jnp.real(jnp.zeros((), b.dtype)).dtype).tiny

    def _safe_div(num, den):
        'num / den, or 0 on (near-)breakdown of the denominator.'
        bad = jnp.abs(den) < tiny
        return jnp.where(bad, jnp.zeros((), b.dtype),
                         num / jnp.where(bad, jnp.ones((), b.dtype), den))

    def cond(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        return (_norm(r) > atol) & (k < maxiter) & jnp.logical_not(down)

    def body(state):
        x, r, p, v, rho, alpha, omega, k, down = state
        rho_new = _dot(rhat, r)
        beta = _safe_div(rho_new * alpha, rho * omega)
        p = r + beta * (p - omega * v)
        phat = M(p)
        v = matvec(phat)
        denom = _dot(rhat, v)
        alpha = _safe_div(rho_new, denom)
        s = r - alpha * v
        shat = M(s)
        t = matvec(shat)
        tt = _dot(t, t)
        omega_new = _safe_div(_dot(t, s), tt)
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        # Lanczos breakdown: the next iteration cannot make progress
        down = (jnp.abs(rho_new) < tiny) | (jnp.abs(denom) < tiny) \
            | (jnp.abs(omega_new) < tiny)
        return (x, r, p, v, rho_new, alpha, omega_new, k + 1, down)

    state0 = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one,
              jnp.zeros((), jnp.int32), down0)
    x, r, *_, k, _down = lax.while_loop(cond, body, state0)
    return BicgstabResult(x, k, _norm(r) / bnorm)


def bicgstab_batched(matvec, b_batch, M=None, tol=1e-6, maxiter=1000):
    '''
    vmap of ``bicgstab`` over a leading right-hand-side axis.

    Args:
        b_batch: (R, B, nz, nx)

    Returns:
        BicgstabResult with x (R, B, nz, nx), iters (R,), relres (R,)
    '''

    fn = partial(bicgstab, matvec, M=M, tol=tol, maxiter=maxiter)
    return jax.vmap(fn)(b_batch)


def gmres_cycle(matvec, b, M=None, x0=None, m=20):
    '''
    One cycle of right-preconditioned GMRES(m): x = x0 + M V y where V is
    the m-step Arnoldi basis of the preconditioned residual equation.
    Native implementation (modified Gram-Schmidt + Givens least squares):
    no lax.custom_linear_solve, no LAPACK — runs on any backend and
    composes with non-differentiable fast matvecs. Fixed m steps, no
    early exit (callers restart and check the true residual — see
    ``make_chunked_solver``).
    '''

    if M is None:
        M = lambda r: r

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    beta = _norm(r0)
    safe_beta = jnp.where(beta > 0, beta, 1.0)
    cdtype = b.dtype
    rdtype = jnp.real(jnp.zeros((), cdtype)).dtype
    tiny = jnp.finfo(rdtype).tiny

    V = jnp.zeros((m + 1,) + b.shape, cdtype)
    V = V.at[0].set(r0 / safe_beta.astype(cdtype))
    H = jnp.zeros((m + 1, m), cdtype)
    # Givens-rotated RHS of the least-squares problem
    g = jnp.zeros((m + 1,), cdtype).at[0].set(beta.astype(cdtype))
    cs = jnp.zeros((m,), cdtype)
    sn = jnp.zeros((m,), cdtype)

    def arnoldi_step(j, carry):
        V, H, g, cs, sn = carry
        w = matvec(M(V[j]))

        # modified Gram-Schmidt against all m+1 basis vectors, masked to
        # i <= j (masking keeps the loop body j-independent for fori)
        def mgs(i, acc):
            w, H = acc
            keep = i <= j
            hij = jnp.where(keep, _dot(V[i], w), 0.0)
            w = w - hij * V[i]
            H = H.at[i, j].set(jnp.where(keep, hij, H[i, j]))
            return (w, H)
        w, H = lax.fori_loop(0, m + 1, mgs, (w, H))

        hnext = _norm(w).astype(cdtype)
        H = H.at[j + 1, j].set(hnext)
        vnext = w / jnp.where(jnp.abs(hnext) > tiny, hnext, 1.0)
        V = V.at[j + 1].set(vnext)

        # apply previous Givens rotations to the new column, masked i < j
        def rot(i, H):
            keep = i < j
            h1 = jnp.conj(cs[i]) * H[i, j] + jnp.conj(sn[i]) * H[i + 1, j]
            h2 = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
            H = H.at[i, j].set(jnp.where(keep, h1, H[i, j]))
            H = H.at[i + 1, j].set(jnp.where(keep, h2, H[i + 1, j]))
            return H
        H = lax.fori_loop(0, m, rot, H)

        # new rotation zeroing H[j+1, j]
        h0, h1 = H[j, j], H[j + 1, j]
        denom = jnp.sqrt(jnp.abs(h0) ** 2 + jnp.abs(h1) ** 2)
        denom = jnp.where(denom > tiny, denom, 1.0).astype(cdtype)
        c_j = h0 / denom
        s_j = h1 / denom
        cs = cs.at[j].set(c_j)
        sn = sn.at[j].set(s_j)
        H = H.at[j, j].set(jnp.conj(c_j) * h0 + jnp.conj(s_j) * h1)
        H = H.at[j + 1, j].set(0.0)
        g = g.at[j + 1].set(-s_j * g[j])
        g = g.at[j].set(jnp.conj(c_j) * g[j])
        return (V, H, g, cs, sn)

    V, H, g, cs, sn = lax.fori_loop(0, m, arnoldi_step, (V, H, g, cs, sn))

    # back-substitute the m x m upper-triangular system H y = g
    def back(jj, y):
        j = m - 1 - jj

        def inner(i, s):
            return s + jnp.where(i > j, H[j, i] * y[i], 0.0)
        s = lax.fori_loop(0, m, inner, jnp.zeros((), cdtype))
        hjj = H[j, j]
        hjj = jnp.where(jnp.abs(hjj) > tiny, hjj, 1.0)
        return y.at[j].set((g[j] - s) / hjj)
    y = lax.fori_loop(0, m, back, jnp.zeros((m,), cdtype))

    def accum(j, z):
        return z + y[j] * V[j]
    z = lax.fori_loop(0, m, accum, jnp.zeros_like(b))
    x = x0 + M(z)
    r = b - matvec(x)
    bnorm = _norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    return BicgstabResult(x, jnp.full((), m, jnp.int32), _norm(r) / bnorm)


def fgmres_cycle(matvec, b, M=None, x0=None, m=20):
    '''
    One cycle of FLEXIBLE GMRES(m) (Saad 1993): the preconditioned
    directions Z[j] = M(V[j]) are stored explicitly and the update is
    x = x0 + Z y, so ``M`` may be a VARIABLE (nonlinear) operator — e.g.
    an inner Krylov sweep — which plain right-preconditioned GMRES
    (``gmres_cycle``: x = x0 + M(V y)) silently mis-solves. Costs one
    extra basis array of memory; one fewer M application per cycle.
    '''

    if M is None:
        M = lambda r: r

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    beta = _norm(r0)
    safe_beta = jnp.where(beta > 0, beta, 1.0)
    cdtype = b.dtype
    rdtype = jnp.real(jnp.zeros((), cdtype)).dtype
    tiny = jnp.finfo(rdtype).tiny

    V = jnp.zeros((m + 1,) + b.shape, cdtype)
    V = V.at[0].set(r0 / safe_beta.astype(cdtype))
    Z = jnp.zeros((m,) + b.shape, cdtype)
    H = jnp.zeros((m + 1, m), cdtype)
    g = jnp.zeros((m + 1,), cdtype).at[0].set(beta.astype(cdtype))
    cs = jnp.zeros((m,), cdtype)
    sn = jnp.zeros((m,), cdtype)

    def arnoldi_step(j, carry):
        V, Z, H, g, cs, sn = carry
        z = M(V[j])
        Z = Z.at[j].set(z)
        w = matvec(z)

        def mgs(i, acc):
            w, H = acc
            keep = i <= j
            hij = jnp.where(keep, _dot(V[i], w), 0.0)
            w = w - hij * V[i]
            H = H.at[i, j].set(jnp.where(keep, hij, H[i, j]))
            return (w, H)
        w, H = lax.fori_loop(0, m + 1, mgs, (w, H))

        hnext = _norm(w).astype(cdtype)
        H = H.at[j + 1, j].set(hnext)
        vnext = w / jnp.where(jnp.abs(hnext) > tiny, hnext, 1.0)
        V = V.at[j + 1].set(vnext)

        def rot(i, H):
            keep = i < j
            h1 = jnp.conj(cs[i]) * H[i, j] + jnp.conj(sn[i]) * H[i + 1, j]
            h2 = -sn[i] * H[i, j] + cs[i] * H[i + 1, j]
            H = H.at[i, j].set(jnp.where(keep, h1, H[i, j]))
            H = H.at[i + 1, j].set(jnp.where(keep, h2, H[i + 1, j]))
            return H
        H = lax.fori_loop(0, m, rot, H)

        h0, h1 = H[j, j], H[j + 1, j]
        denom = jnp.sqrt(jnp.abs(h0) ** 2 + jnp.abs(h1) ** 2)
        denom = jnp.where(denom > tiny, denom, 1.0).astype(cdtype)
        c_j = h0 / denom
        s_j = h1 / denom
        cs = cs.at[j].set(c_j)
        sn = sn.at[j].set(s_j)
        H = H.at[j, j].set(jnp.conj(c_j) * h0 + jnp.conj(s_j) * h1)
        H = H.at[j + 1, j].set(0.0)
        g = g.at[j + 1].set(-s_j * g[j])
        g = g.at[j].set(jnp.conj(c_j) * g[j])
        return (V, Z, H, g, cs, sn)

    V, Z, H, g, cs, sn = lax.fori_loop(0, m, arnoldi_step,
                                       (V, Z, H, g, cs, sn))

    def back(jj, y):
        j = m - 1 - jj

        def inner(i, s):
            return s + jnp.where(i > j, H[j, i] * y[i], 0.0)
        s = lax.fori_loop(0, m, inner, jnp.zeros((), cdtype))
        hjj = H[j, j]
        hjj = jnp.where(jnp.abs(hjj) > tiny, hjj, 1.0)
        return y.at[j].set((g[j] - s) / hjj)
    y = lax.fori_loop(0, m, back, jnp.zeros((m,), cdtype))

    def accum(j, x):
        return x + y[j] * Z[j]
    x = lax.fori_loop(0, m, accum, x0)
    r = b - matvec(x)
    bnorm = _norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    return BicgstabResult(x, jnp.full((), m, jnp.int32), _norm(r) / bnorm)


def fgmres(matvec, b, M=None, x0=None, tol=1e-6, maxiter=1000,
           restart=40):
    '''
    Restarted flexible GMRES built from ``fgmres_cycle``; ``maxiter``
    counts OUTER Arnoldi steps (matvecs on the outer operator), matching
    ``gmres`` semantics.
    '''

    ncycles = max(1, maxiter // restart)
    bnorm = _norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        x, k, rr = state
        return (rr > tol) & (k < ncycles)

    def body(state):
        x, k, rr = state
        res = fgmres_cycle(matvec, b, M=M, x0=x, m=restart)
        return (res.x, k + 1, res.relres)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = _norm(b - matvec(x0)) / bnorm
    x, k, rr = lax.while_loop(cond, body,
                              (x0, jnp.zeros((), jnp.int32), r0))
    return BicgstabResult(x, k * restart, rr)


def gmres(matvec, b, M=None, x0=None, tol=1e-6, maxiter=1000, restart=40):
    '''
    Restarted GMRES built from ``gmres_cycle``: runs full cycles until
    the true residual meets tol or the matvec budget is exhausted.
    '''

    if M is None:
        M = lambda r: r
    ncycles = max(1, maxiter // restart)
    bnorm = _norm(b)
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        x, k, rr = state
        return (rr > tol) & (k < ncycles)

    def body(state):
        x, k, rr = state
        res = gmres_cycle(matvec, b, M=M, x0=x, m=restart)
        return (res.x, k + 1, res.relres)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = _norm(b - matvec(x0)) / bnorm
    x, k, rr = lax.while_loop(cond, body, (x0, jnp.zeros((), jnp.int32), r0))
    return BicgstabResult(x, k * restart, rr)
