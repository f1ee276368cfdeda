"""SQP solver tests (mirrors reference ocs2_sqp/test: testCircularKinematics,
testUnconstrained, plus cross-solver agreement with DDP)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.core.reference import TargetTrajectories
from ocs2_tpu.models import cartpole, double_integrator
from ocs2_tpu.oc.problem import OptimalControlProblem
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import ddp, sqp


class TestUnconstrained:
    def setup_method(self):
        self.problem = double_integrator.make_problem()
        self.params = double_integrator.make_params()
        self.grid = uniform_grid(0.0, 2.0, 40)
        self.x0 = jnp.array([1.0, 0.0])

    def test_lq_converges_fast(self):
        sol = jax.jit(
            lambda x0: sqp.solve(self.problem, self.grid, x0, self.params)
        )(self.x0)
        assert bool(sol.converged)
        assert int(sol.iterations) <= 4
        assert float(sol.performance.dynamics_violation_sse) < 1e-6

    def test_matches_ddp(self):
        s1 = jax.jit(
            lambda x0: sqp.solve(self.problem, self.grid, x0, self.params)
        )(self.x0)
        s2 = jax.jit(
            lambda x0: ddp.solve(self.problem, self.grid, x0, self.params)
        )(self.x0)
        assert np.allclose(s1.us, s2.us, atol=2e-2), np.abs(
            np.asarray(s1.us) - np.asarray(s2.us)
        ).max()

    def test_vmap_batching(self):
        x0s = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.5]])
        batched = jax.jit(
            jax.vmap(lambda x0: sqp.solve(self.problem, self.grid, x0, self.params))
        )(x0s)
        single = jax.jit(
            lambda x0: sqp.solve(self.problem, self.grid, x0, self.params)
        )(x0s[1])
        assert np.allclose(batched.us[1], single.us, atol=1e-4)


def make_circular_kinematics():
    """2D kinematic point constrained to its initial circle — the reference's
    canonical projected-equality fixture (ocs2_oc/test/include/ocs2_oc/test/
    circular_kinematics.h:73-83: dynamics x' = u, constraint x.u = 0, cost
    0.5*(x0*u1 - x1*u0 - 1)^2 + 0.005*|u|^2 driving unit angular rate)."""

    def dynamics(t, x, u, p):
        return u

    def rate_cost(t, x, u, p):
        return 0.5 * (x[0] * u[1] - x[1] * u[0] - 1.0) ** 2 + 0.005 * (u @ u)

    def tangential(t, x, u, p):
        return jnp.array([x @ u])  # stay on the circle of radius |x0|

    return OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(rate_cost,),
        equality_terms=(tangential,),
        nx=2,
        nu=2,
    )


class TestCircularKinematics:
    def setup_method(self):
        self.problem = make_circular_kinematics()
        self.grid = uniform_grid(0.0, jnp.pi, 30)
        self.x0 = jnp.array([1.0, 0.0])
        self.params = {}

    def test_projection_satisfies_constraint(self):
        st = sqp.SqpSettings(project_equalities=True, max_iterations=20)
        sol = jax.jit(
            lambda x0: sqp.solve(
                self.problem, self.grid, x0, self.params, settings=st
            )
        )(self.x0)
        # The pointwise constraint x.u = 0 must hold to projection accuracy.
        gvals = jax.vmap(lambda x, u: x @ u)(sol.xs[:-1], sol.us)
        assert float(jnp.max(jnp.abs(gvals))) < 1e-4
        # Velocity is tangential, so radius growth is bounded by the
        # second-order integration drift dt^2|u|^2/2 per step.
        radii = jnp.linalg.norm(sol.xs, axis=1)
        assert float(jnp.max(radii)) < 1.2
        assert float(jnp.min(radii)) > 0.99

    def test_al_fallback_agrees(self):
        st_p = sqp.SqpSettings(project_equalities=True, max_iterations=20)
        st_al = sqp.SqpSettings(project_equalities=False, max_iterations=40)
        sol_p = jax.jit(
            lambda x0: sqp.solve(self.problem, self.grid, x0, self.params, settings=st_p)
        )(self.x0)
        sol_al = jax.jit(
            lambda x0: sqp.solve(self.problem, self.grid, x0, self.params, settings=st_al)
        )(self.x0)
        assert np.allclose(sol_p.xs, sol_al.xs, atol=5e-2), np.abs(
            np.asarray(sol_p.xs) - np.asarray(sol_al.xs)
        ).max()


class TestCartpoleSqp:
    def test_swing_up(self):
        problem = cartpole.make_problem("soft")
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = cartpole.initial_state_down()
        st = sqp.SqpSettings(max_iterations=40, integrator="rk4")
        sol = jax.jit(
            lambda x0: sqp.solve(problem, grid, x0, cartpole.make_params(), settings=st)
        )(x0)
        assert abs(float(sol.xs[-1, 0])) < 0.3, sol.xs[-1]
        # Shooting gaps nearly closed at termination (observed ~8e-4).
        assert float(sol.performance.dynamics_violation_sse) < 1e-2
