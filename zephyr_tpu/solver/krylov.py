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


def gmres(matvec, b, M=None, tol=1e-6, maxiter=1000, restart=40):
    'Restarted GMRES fallback via jax.scipy.sparse.linalg.'

    x, _ = jax.scipy.sparse.linalg.gmres(
        matvec, b, M=M, tol=tol, atol=0.0,
        restart=restart, maxiter=max(1, maxiter // restart),
        solve_method='batched')
    r = b - matvec(x)
    return BicgstabResult(x, jnp.zeros((), jnp.int32), _norm(r) / _norm(b))
