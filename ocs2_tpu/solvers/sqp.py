"""Multiple-shooting SQP solver.

TPU-native re-design of the reference SQP solver
(ocs2_sqp/ocs2_sqp/include/ocs2_sqp/SqpSolver.h:51, main loop
src/SqpSolver.cpp:183-274).  The mapping:

* parallel transcription over ThreadPool workers (SqpSolver.cpp:336-406,
  threads claim node indices :358) -> one vmapped linearization with defects
  (multiple shooting is parallel-in-time by construction — a perfect fit for
  vmap; no sequential rollout anywhere in the iteration);
* HPIPM structured QP (hpipm_catkin/HpipmInterface.h:85) -> the scan /
  associative-scan Riccati kernel on projection-reduced coefficients
  (ops/riccati.py + ops/projection.py) — exact for the equality-constrained
  QP, which is what the reference uses HPIPM for when
  projectStateInputEqualityConstraints=true;
* QR projection of state-input equalities (Transcription.h:87) ->
  batched QR null-space reduction (ops/projection.py);
* filter line search (ocs2_oc/search_strategy/FilterLinesearch.h:44) ->
  vmapped candidate evaluation over the alpha grid with the same
  accept rules expressed as masked selects;
* inequality constraints -> augmented Lagrangian terms in the cost
  (solvers/al.py), as in this framework's DDP; the interior-point treatment
  lives in solvers/ipm.py.

Everything is one jittable function of fixed shapes: `jax.vmap(solve)`
batches thousands of SQP solves per chip.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.integrate import discretize
from ..core.types import PerformanceIndex
from ..oc.approx import approximate_lq, node_params
from ..oc.metrics import (
    TrajectoryMetrics,
    al_dual_ascent,
    al_merit,
    evaluate_trajectory,
)
from ..oc.problem import OptimalControlProblem
from ..oc.time_discretization import TimeGrid
from ..ops.projection import (
    project_lqr_coeffs,
    remap_projected_gain,
    remap_projected_input,
)
from ..ops.riccati import (
    LqrCoeffs,
    convexify,
    lqr_backward,
    lqr_backward_parallel,
    lqr_forward,
)
from .al import AlState, augment_problem
from .ddp import _example_params

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SqpSettings:
    """Analogue of reference SqpSettings.h."""

    max_iterations: int = 10
    integrator: str = "rk2"  # reference SQP default integratorType RK2
    substeps: int = 1
    num_alphas: int = 8
    alpha_decay: float = 0.5
    armijo_factor: float = 1e-4
    # FilterLinesearch thresholds (FilterLinesearch.h g_max/g_min).
    g_max: float = 1e6
    g_min: float = 1e-6
    cost_tol: float = 1e-4
    dynamics_tol: float = 1e-6  # convergence on step + defect size
    project_equalities: bool = True
    hessian_reg: float = 1e-6
    # PSD-project stage Hessians (HessianCorrection.h analogue); required
    # whenever exact Hessians of nonconvex terms can go indefinite.
    convexify: bool = True
    al_rho_init: float = 10.0
    al_rho_growth: float = 10.0
    al_rho_max: float = 1e6
    parallel_riccati: bool = False
    use_feedback_policy: bool = True


class SqpSolution(NamedTuple):
    xs: Array
    us: Array
    gains: Array
    value_S: Array
    value_s: Array
    performance: PerformanceIndex
    iterations: Array
    converged: Array
    al: AlState


class _Carry(NamedTuple):
    xs: Array
    us: Array
    al: AlState
    merit: Array
    viol: Array
    it: Array
    done: Array
    gains: Array
    value_S: Array
    value_s: Array


def _defects(problem, grid, xs, us, params, method, substeps):
    """Multiple-shooting gap b_k = F(t_k, x_k, u_k) - x_{k+1} (vmapped)."""

    def node(k):
        t = grid.times[k]
        dt = grid.times[k + 1] - grid.times[k]
        p = node_params(params, grid, k)
        p_next = node_params(params, grid, k + 1)
        flow = discretize(
            lambda tt, xx, uu: problem.dynamics(tt, xx, uu, p), method, substeps
        )
        x_int = flow(t, xs[k], us[k], dt)
        x_jmp = problem.apply_jump(t, xs[k], p_next)
        m = grid.is_jump[k]
        return (1.0 - m) * x_int + m * x_jmp - xs[k + 1]

    return jax.vmap(node)(jnp.arange(grid.num_intervals))


def solve(
    problem: OptimalControlProblem,
    grid: TimeGrid,
    x0: Array,
    params: Any,
    xs_init: Optional[Array] = None,
    us_init: Optional[Array] = None,
    al_init: Optional[AlState] = None,
    settings: SqpSettings = SqpSettings(),
) -> SqpSolution:
    n = grid.num_intervals
    nx, nu = problem.nx, problem.nu
    assert isinstance(params, dict), "params must be a dict pytree"
    project = settings.project_equalities and bool(problem.equality_terms)
    aug = augment_problem(problem, project_equalities=project)
    dims = problem.constraint_dims(_example_params(params))
    if al_init is None:
        al_init = AlState.init(dims, n, settings.al_rho_init)
    if us_init is None:
        us_init = jnp.zeros((n, nu), x0.dtype)
    if xs_init is None:
        # Constant-state initialization (multiple_shooting/Initialization.h).
        xs_init = jnp.tile(x0[None], (n + 1, 1))
    xs_init = xs_init.at[0].set(x0)

    # The problem used for merit evaluation keeps projected equalities as
    # *metrics* (they enter the filter violation, not the AL merit).
    def eval_traj(xs, us) -> TrajectoryMetrics:
        return evaluate_trajectory(problem, grid, xs, us, params)

    def total_viol(metrics: TrajectoryMetrics, defect_sse) -> Array:
        return jnp.sqrt(metrics.eq_sse + metrics.ineq_sse + defect_sse)

    def defect_sse(xs, us):
        d = _defects(
            problem, grid, xs, us, params, settings.integrator, settings.substeps
        )
        return jnp.sum(jnp.square(d))

    metrics0 = eval_traj(xs_init, us_init)
    merit0 = al_merit(metrics0, al_init)
    alphas = settings.alpha_decay ** jnp.arange(settings.num_alphas, dtype=x0.dtype)

    def iteration(c: _Carry) -> _Carry:
        p_al = dict(params, al=c.al)
        # Transcription: vmapped LQ approximation with defects.
        lq = approximate_lq(
            aug, grid, c.xs, c.us, p_al,
            method=settings.integrator, substeps=settings.substeps,
        )
        defect = lq.dynamics.f - c.xs[1:]
        coeffs = LqrCoeffs(
            A=lq.dynamics.dfdx,
            B=lq.dynamics.dfdu,
            b=defect,
            Qxx=lq.cost.dfdxx[:-1],
            qx=lq.cost.dfdx[:-1],
            Quu=lq.cost.dfduu[:-1]
            + settings.hessian_reg * jnp.eye(nu, dtype=x0.dtype)[None],
            qu=lq.cost.dfdu[:-1],
            Qux=lq.cost.dfdux[:-1],
            Qf=lq.cost.dfdxx[-1],
            qf=lq.cost.dfdx[-1],
        )
        if settings.convexify:
            coeffs = convexify(coeffs, settings.hessian_reg)

        backward = lqr_backward_parallel if settings.parallel_riccati else lqr_backward
        if project:
            reduced, proj = project_lqr_coeffs(coeffs, lq.eq.f, lq.eq.dfdx, lq.eq.dfdu)
            sol = backward(reduced)
            dxs, dvs = lqr_forward(reduced, sol, jnp.zeros((nx,), x0.dtype))
            dus = remap_projected_input(proj, dxs[:-1], dvs)
            gains = remap_projected_gain(proj, sol.gains)
        else:
            sol = backward(coeffs)
            dxs, dus = lqr_forward(coeffs, sol, jnp.zeros((nx,), x0.dtype))
            gains = sol.gains

        # Filter line search over the alpha grid (FilterLinesearch.h:44).
        def try_alpha(alpha):
            xs_a = c.xs + alpha * dxs
            us_a = c.us + alpha * dus
            m = eval_traj(xs_a, us_a)
            d_sse = defect_sse(xs_a, us_a)
            return xs_a, us_a, m, al_merit(m, c.al), total_viol(m, d_sse)

        xs_cand, us_cand, metrics_cand, merits, viols = jax.vmap(try_alpha)(alphas)

        # Armijo slope from the QP gradient: g'd = sum qx.dx + qu.du.
        slope = jnp.sum(coeffs.qx * dxs[:-1]) + jnp.sum(coeffs.qu * dus) + jnp.sum(
            coeffs.qf * dxs[-1]
        )
        armijo = merits <= c.merit + settings.armijo_factor * alphas * slope
        # acceptStep cases (reference FilterLinesearch::acceptStep):
        hi = c.viol > settings.g_max
        lo = jnp.logical_and(c.viol < settings.g_min, viols < settings.g_min)
        accept = jnp.where(
            hi,
            viols < (1.0 - 1e-3) * c.viol,
            jnp.where(
                lo,
                armijo,
                jnp.logical_or(merits < c.merit, viols < (1.0 - 1e-3) * c.viol),
            ),
        )
        first_ok = jnp.argmax(accept)  # largest accepted step (alphas descend)
        any_ok = jnp.any(accept)

        xs_n = jnp.where(any_ok, xs_cand[first_ok], c.xs)
        us_n = jnp.where(any_ok, us_cand[first_ok], c.us)
        metrics_n = jax.tree.map(
            lambda a: None if a is None else a[first_ok],
            metrics_cand,
            is_leaf=lambda v: v is None,
        )
        viol_n = jnp.where(any_ok, viols[first_ok], c.viol)
        merit_n = jnp.where(any_ok, merits[first_ok], c.merit)

        # AL outer update (inequalities and unprojected equalities).
        feasible = viol_n < settings.dynamics_tol * 10.0
        improved = jnp.logical_or(viol_n <= 0.25 * c.viol, feasible)
        take_dual = jnp.logical_and(any_ok, improved)
        dual = al_dual_ascent(metrics_n, c.al)
        al_n = jax.tree.map(
            lambda new, old: jnp.where(take_dual, new, old), dual, c.al
        )
        al_n = al_n._replace(
            rho=jnp.where(
                jnp.logical_and(any_ok, ~improved),
                jnp.minimum(c.al.rho * settings.al_rho_growth, settings.al_rho_max),
                al_n.rho,
            )
        )
        merit_carry = jnp.where(any_ok, al_merit(metrics_n, al_n), c.merit)

        # Convergence (reference SqpSolver convergence: small step AND gaps).
        step_norm = jnp.sqrt(
            jnp.sum(jnp.square(alphas[first_ok] * dxs))
            + jnp.sum(jnp.square(alphas[first_ok] * dus))
        )
        rel_cost = jnp.abs(c.merit - merit_n) / jnp.maximum(jnp.abs(c.merit), 1e-12)
        conv = jnp.logical_and(
            jnp.logical_and(rel_cost < settings.cost_tol, feasible), any_ok
        )
        done = jnp.logical_or(conv, jnp.logical_and(~any_ok, c.it > 0))
        return _Carry(
            xs=xs_n, us=us_n, al=al_n, merit=merit_carry, viol=viol_n,
            it=c.it + 1, done=done,
            gains=gains, value_S=sol.value_S, value_s=sol.value_s,
        )

    init = _Carry(
        xs=xs_init, us=us_init, al=al_init, merit=merit0,
        viol=jnp.asarray(jnp.inf, x0.dtype),
        it=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        gains=jnp.zeros((n, nu, nx), x0.dtype),
        value_S=jnp.zeros((n + 1, nx, nx), x0.dtype),
        value_s=jnp.zeros((n + 1, nx), x0.dtype),
    )

    def cond(c: _Carry):
        return jnp.logical_and(c.it < settings.max_iterations, ~c.done)

    final = jax.lax.while_loop(cond, iteration, init)

    metrics_f = eval_traj(final.xs, final.us)
    merit_f = al_merit(metrics_f, final.al)
    performance = PerformanceIndex(
        merit=merit_f,
        cost=metrics_f.cost,
        dynamics_violation_sse=defect_sse(final.xs, final.us),
        equality_constraints_sse=metrics_f.eq_sse,
        inequality_constraints_sse=metrics_f.ineq_sse,
        equality_lagrangian=merit_f - metrics_f.cost,
        inequality_lagrangian=jnp.zeros(()),
    )
    return SqpSolution(
        xs=final.xs,
        us=final.us,
        gains=final.gains
        if settings.use_feedback_policy
        else jnp.zeros_like(final.gains),
        value_S=final.value_S,
        value_s=final.value_s,
        performance=performance,
        iterations=final.it,
        converged=final.done,
        al=final.al,
    )
