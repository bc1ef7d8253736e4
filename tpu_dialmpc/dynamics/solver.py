"""Constrained forward dynamics: MuJoCo-style Newton solver.

Minimizes  Φ(a) = ½(a−a₀)ᵀM(a−a₀) + Σᵢ sᵢ(Jᵢa − arefᵢ)  over accelerations,
where a₀ = qacc_smooth and sᵢ is per-row:
  inequality rows (contacts, limits): ½D x²  when x < 0 and the row is active
  friction-loss rows: two-sided Huber with knee at |x| = floss/D
Newton iterations with dense Cholesky on H = M + Jᵀ diag(h) J and an
approximately-exact line search (Newton on φ'(α), `ls_iterations` steps).
All shapes static; batch via vmap.  Early termination is handled with a
`done` mask replicating MuJoCo's improvement/gradient criteria so compiled
iteration count stays fixed (model.iterations is 1-2 for our scenes).

Replaces the mj_fwdConstraint stage the reference gets from the MuJoCo binary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_dialmpc.dynamics import linalg
from tpu_dialmpc.dynamics.constraint import Constraints
from tpu_dialmpc.dynamics.model import PhysicsModel


class SolveResult(NamedTuple):
    qacc: jnp.ndarray  # (nv,)
    efc_force: jnp.ndarray  # (nefc,) constraint forces (0 when inactive)
    qfrc_constraint: jnp.ndarray  # (nv,)


def _s_terms(x, D, floss, row_active):
    """Per-row cost, first and second derivative wrt x."""
    is_friction = floss > 0.0
    knee = floss / jnp.maximum(D, 1e-30)
    quad_ineq = row_active & (~is_friction) & (x < 0.0)
    quad_fric = row_active & is_friction & (jnp.abs(x) <= knee)
    lin_fric = row_active & is_friction & (jnp.abs(x) > knee)

    quad = quad_ineq | quad_fric
    cost = jnp.where(quad, 0.5 * D * x * x, 0.0) + jnp.where(
        lin_fric, floss * jnp.abs(x) - 0.5 * knee * floss, 0.0
    )
    dcost = jnp.where(quad, D * x, 0.0) + jnp.where(
        lin_fric, floss * jnp.sign(x), 0.0
    )
    hcost = jnp.where(quad, D, 0.0)
    return cost, dcost, hcost


def solve(
    model: PhysicsModel,
    m_mat: jnp.ndarray,
    qacc_smooth: jnp.ndarray,
    qacc_warmstart: jnp.ndarray,
    con: Constraints,
) -> SolveResult:
    nv = model.nv
    nefc = con.J.shape[0]
    dtype = qacc_smooth.dtype
    if nefc == 0:
        return SolveResult(
            qacc=qacc_smooth,
            efc_force=jnp.zeros((0,), dtype),
            qfrc_constraint=jnp.zeros(nv, dtype),
        )

    J, aref, D, floss, row_active = (
        con.J,
        con.aref,
        con.D,
        con.floss,
        con.active,
    )

    def total_cost(a):
        da = a - qacc_smooth
        x = J @ a - aref
        c, _, _ = _s_terms(x, D, floss, row_active)
        return 0.5 * da @ (m_mat @ da) + jnp.sum(c), x

    # warmstart if it beats the smooth acceleration (mj_solWarmstart behavior)
    cost_ws, _ = total_cost(qacc_warmstart)
    cost_sm, _ = total_cost(qacc_smooth)
    a = jnp.where(cost_ws < cost_sm, qacc_warmstart, qacc_smooth)
    cost_prev = jnp.minimum(cost_ws, cost_sm)

    tol_scale = model.tolerance * model.meaninertia * max(1, nv)
    eye = jnp.eye(nv, dtype=dtype)

    def newton_iter(carry, _):
        a, cost_prev, done = carry
        x = J @ a - aref
        _, dcost, hcost = _s_terms(x, D, floss, row_active)
        grad = m_mat @ (a - qacc_smooth) + J.T @ dcost
        H = m_mat + (J.T * hcost[None, :]) @ J
        # unrolled small-matrix cholesky (linalg.py); H is SPD (M SPD, h >= 0)
        delta = -linalg.solve_psd(H, grad)

        # line search: Newton on φ'(α), exact for fixed active set
        jd = J @ delta
        md = m_mat @ delta
        dmd = delta @ md
        dma = delta @ (m_mat @ (a - qacc_smooth))

        def phi_derivs(alpha):
            xa = x + alpha * jd
            _, dc, hc = _s_terms(xa, D, floss, row_active)
            d1 = alpha * dmd + dma + jd @ dc
            d2 = dmd + jd @ (hc * jd)
            return d1, d2

        alpha = jnp.asarray(0.0, dtype)
        for _ in range(max(1, model.ls_iterations)):
            d1, d2 = phi_derivs(alpha)
            alpha = alpha - d1 / jnp.maximum(d2, 1e-30)
        alpha = jnp.maximum(alpha, 0.0)

        a_new = a + alpha * delta
        cost_new, _ = total_cost(a_new)
        improved = cost_prev - cost_new
        grad_norm = jnp.linalg.norm(grad)
        done_new = done | (improved < tol_scale) | (grad_norm < tol_scale)
        a_out = jnp.where(done, a, a_new)
        cost_out = jnp.where(done, cost_prev, cost_new)
        return (a_out, cost_out, done_new), None

    any_active = jnp.any(row_active)
    done0 = ~any_active
    (a, _, _), _ = jax.lax.scan(
        newton_iter, (a, cost_prev, done0), None, length=max(1, model.iterations)
    )
    a = jnp.where(any_active, a, qacc_smooth)

    x = J @ a - aref
    _, dcost, _ = _s_terms(x, D, floss, row_active)
    efc_force = -dcost
    return SolveResult(
        qacc=a, efc_force=efc_force, qfrc_constraint=J.T @ efc_force
    )
