"""Solver-solution query API: value function and Hamiltonian at arbitrary
(t, x[, u]).

Analogue of the reference SolverBase query surface
(ocs2_oc/include/ocs2_oc/oc_solver/SolverBase.h:214 getValueFunction /
:224 getHamiltonian, both returning ScalarFunctionQuadraticApproximation;
DDP implements them by interpolating the Riccati value arrays and
re-deriving the control Hamiltonian, GaussNewtonDDP.cpp).

Every solver solution in this framework carries the Riccati value function
(value_S [N+1, nx, nx], value_s [N+1, nx]) in DELTA coordinates around the
solution trajectory; these helpers interpolate it onto arbitrary query
times and assemble the quadratic expansions users and downstream modules
(MPC-Net, switch-time gradients, analysis) consume.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..core.interpolation import interpolate
from ..core.types import ScalarQuadraticApproximation
from .approx import node_params
from .problem import OptimalControlProblem
from .time_discretization import TimeGrid

Array = jax.Array


class ValueFunctionQuery(NamedTuple):
    """V(t, x) ~ f + dfdx'(x - x_nom) + 1/2 (x - x_nom)' dfdxx (x - x_nom),
    reported at the queried x (f evaluated, gradient at x)."""

    f: Array  # V(t, x)
    dfdx: Array  # dV/dx at (t, x)
    dfdxx: Array  # d2V/dx2 (constant in the quadratic model)


def value_function(
    grid: TimeGrid, xs: Array, value_S: Array, value_s: Array, t, x
) -> ValueFunctionQuery:
    """Quadratic cost-to-go at an arbitrary (t, x)
    (reference SolverBase::getValueFunction).

    Interpolates (S, s, x_nom) onto t and expands around the nominal
    trajectory: V = s'dx + 1/2 dx'S dx with dx = x - x_nom(t).  (The
    reference's value also drops the absolute constant — comparisons are
    meaningful within one solve.)
    """
    times = jnp.asarray(grid.times)
    s_mat = interpolate(times, value_S, t)
    s_vec = interpolate(times, value_s, t)
    x_nom = interpolate(times, xs, t)
    dx = x - x_nom
    sdx = s_mat @ dx
    return ValueFunctionQuery(
        f=jnp.dot(s_vec, dx) + 0.5 * jnp.dot(dx, sdx),
        dfdx=s_vec + sdx,
        dfdxx=s_mat,
    )


def hamiltonian(
    problem: OptimalControlProblem,
    grid: TimeGrid,
    xs: Array,
    value_S: Array,
    value_s: Array,
    t,
    x: Array,
    u: Array,
    params: Any,
) -> Array:
    """Control Hamiltonian H(t, x, u) = L(t, x, u) + dV/dx(t, x)' f(t, x, u)
    at an arbitrary query point (reference SolverBase::getHamiltonian).

    L is the problem's running cost (with the node's mode injected from the
    grid) and dV/dx comes from the interpolated quadratic value model.
    """
    times = jnp.asarray(grid.times)
    k = jnp.clip(
        jnp.searchsorted(times, jnp.asarray(t), side="right") - 1,
        0, grid.num_intervals - 1,
    )
    p = node_params(params, grid.device(), k)
    lagrangian = problem.cost(t, x, u, p)
    vx = value_function(grid, xs, value_S, value_s, t, x).dfdx
    xdot = problem.dynamics(t, x, u, p)
    return lagrangian + jnp.dot(vx, xdot)


def hamiltonian_approx(
    problem: OptimalControlProblem,
    grid: TimeGrid,
    xs: Array,
    value_S: Array,
    value_s: Array,
    t,
    x: Array,
    u: Array,
    params: Any,
) -> ScalarQuadraticApproximation:
    """Quadratic expansion of H in (x, u) at the query point — the
    reference's ScalarFunctionQuadraticApproximation return type, built with
    one jacfwd-of-grad pass over the exact H above."""
    def h_fn(xx, uu):
        return hamiltonian(
            problem, grid, xs, value_S, value_s, t, xx, uu, params
        )

    nx = x.shape[0]
    z = jnp.concatenate([x, u])

    def hz(zz):
        return h_fn(zz[:nx], zz[nx:])

    g = jax.grad(hz)(z)
    h_mat = jax.jacfwd(jax.grad(hz))(z)
    return ScalarQuadraticApproximation(
        f=hz(z),
        dfdx=g[:nx],
        dfdu=g[nx:],
        dfdxx=h_mat[:nx, :nx],
        dfdux=h_mat[nx:, :nx],
        dfduu=h_mat[nx:, nx:],
    )
