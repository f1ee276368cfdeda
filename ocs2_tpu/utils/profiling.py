"""Solver phase profiling — the reference's per-phase benchmark breakdown.

The reference instruments each solver phase with RepeatedTimers and prints a
percentage breakdown per run (GaussNewtonDDP.cpp:140-165 — initialization /
LQ approximation / backward pass / controller / search strategy;
SqpSolver.cpp:128-150 — LQ approx / QP / linesearch).  Under XLA the whole
solve is one fused program, so phases cannot be timed in situ; instead each
phase is jitted and timed *in isolation* on representative data — that is
the decomposition this module provides, plus wall-clock timing helpers.

Usage:
    from ocs2_tpu.utils.profiling import profile_sqp_phases, format_report
    report = profile_sqp_phases(problem, grid, x0, params, settings)
    print(format_report(report))
"""
from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp


def time_jitted(fn, *args, warmup: int = 2, reps: int = 10) -> float:
    """Median wall-clock seconds of a jitted callable (blocks on outputs)."""
    jfn = jax.jit(fn)
    for _ in range(warmup):
        jax.block_until_ready(jfn(*args))
    times = []
    for _ in range(reps):
        tic = time.perf_counter()
        jax.block_until_ready(jfn(*args))
        times.append(time.perf_counter() - tic)
    times.sort()
    return times[len(times) // 2]


def profile_sqp_phases(
    problem, grid, x0, params, settings=None, us_init=None
) -> Dict[str, float]:
    """Per-phase wall-clock breakdown of one SQP iteration's work, mirroring
    the reference SqpSolver benchmark printout (SqpSolver.cpp:128-150).

    Phases: lq_approx (transcription), convexify, projection, riccati_seq,
    riccati_parallel, qp_forward, linesearch (all alpha candidates),
    full_solve (the complete compiled solve, all iterations).
    """
    from ..oc.approx import approximate_lq
    from ..oc.metrics import evaluate_trajectory
    from ..ops.projection import project_lqr_coeffs
    from ..ops.riccati import (
        LqrCoeffs,
        convexify,
        lqr_backward,
        lqr_backward_parallel,
        lqr_forward,
    )
    from ..solvers import sqp as sqp_mod
    from ..solvers.al import AlState, augment_problem
    from ..solvers.ddp import _example_params

    settings = settings or sqp_mod.SqpSettings()
    n = grid.num_intervals
    nx, nu = problem.nx, problem.nu
    if us_init is None:
        us_init = jnp.zeros((n, nu), x0.dtype)
    xs = jnp.tile(x0[None], (n + 1, 1))
    project = settings.project_equalities and bool(problem.equality_terms)
    aug = augment_problem(problem, project_equalities=project)
    dims = problem.constraint_dims(_example_params(params))
    al = AlState.init(dims, n, settings.al_rho_init, dtype=x0.dtype)
    p_al = dict(params, al=al)

    report: Dict[str, float] = {}

    def lq_fn(xs, us):
        return approximate_lq(
            aug, grid, xs, us, p_al,
            method=settings.integrator, substeps=settings.substeps,
        )

    report["lq_approx"] = time_jitted(lq_fn, xs, us_init)
    lq = jax.jit(lq_fn)(xs, us_init)

    coeffs = LqrCoeffs(
        A=lq.dynamics.dfdx, B=lq.dynamics.dfdu, b=lq.dynamics.f - xs[1:],
        Qxx=lq.cost.dfdxx[:-1], qx=lq.cost.dfdx[:-1],
        Quu=lq.cost.dfduu[:-1]
        + settings.hessian_reg * jnp.eye(nu, dtype=x0.dtype)[None],
        qu=lq.cost.dfdu[:-1], Qux=lq.cost.dfdux[:-1],
        Qf=lq.cost.dfdxx[-1], qf=lq.cost.dfdx[-1],
    )
    report["convexify_eigh"] = time_jitted(
        lambda c: convexify(c, settings.hessian_reg, method="eigh"), coeffs
    )

    if project:
        report["projection"] = time_jitted(
            lambda c: project_lqr_coeffs(c, lq.eq.f, lq.eq.dfdx, lq.eq.dfdu),
            coeffs,
        )
        reduced, _ = jax.jit(
            lambda c: project_lqr_coeffs(c, lq.eq.f, lq.eq.dfdx, lq.eq.dfdu)
        )(coeffs)
    else:
        reduced = coeffs

    report["riccati_seq"] = time_jitted(lambda c: lqr_backward(c), reduced)
    report["riccati_parallel"] = time_jitted(
        lambda c: lqr_backward_parallel(c), reduced
    )
    sol = jax.jit(lqr_backward)(reduced)
    report["qp_forward"] = time_jitted(
        lambda c, s: lqr_forward(c, s, jnp.zeros((c.A.shape[-1],), x0.dtype)),
        reduced, sol,
    )

    alphas = settings.alpha_decay ** jnp.arange(
        settings.num_alphas, dtype=x0.dtype
    )
    dxs = jnp.zeros_like(xs)
    dus = jnp.zeros_like(us_init)

    def linesearch_fn(xs, us):
        def try_alpha(a):
            m = evaluate_trajectory(problem, grid, xs + a * dxs, us + a * dus, params)
            return m.cost, m.eq_sse, m.ineq_sse

        return jax.vmap(try_alpha)(alphas)

    report["linesearch"] = time_jitted(linesearch_fn, xs, us_init)

    report["full_solve"] = time_jitted(
        lambda x: sqp_mod.solve(
            problem, grid, x, params, us_init=us_init, settings=settings
        ).xs,
        x0,
    )
    return report


def format_report(report: Dict[str, float]) -> str:
    """Reference-style percentage breakdown (GaussNewtonDDP.cpp:140-165).
    Percentages are of one estimated iteration (phases can overlap with the
    fused full solve, so they are indicative, not additive to 100%)."""
    full = report.get("full_solve", None)
    lines = ["SQP phase breakdown (isolated-phase medians):"]
    iter_est = sum(
        v for k, v in report.items()
        if k in ("lq_approx", "riccati_seq", "qp_forward", "linesearch", "projection")
    )
    for key, val in sorted(report.items(), key=lambda kv: -kv[1]):
        pct = 100.0 * val / iter_est if iter_est else 0.0
        lines.append(f"  {key:>18}: {1e3 * val:8.3f} ms  ({pct:5.1f}% of iter est)")
    if full is not None and iter_est > 0:
        lines.append(
            f"  est. iterations amortized in full solve: {full / iter_est:.1f}"
        )
    return "\n".join(lines)
