"""IPM solver tests (mirrors reference ocs2_ipm/test: testCircularKinematics,
Exp0/Exp1-style constrained problems, and SQP agreement on unconstrained
problems)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models import double_integrator
from ocs2_tpu.oc.problem import OptimalControlProblem
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import ipm, sqp
from test_sqp import make_circular_kinematics


class TestUnconstrainedMatchesSqp:
    def test_double_integrator(self):
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        grid = uniform_grid(0.0, 2.0, 40)
        x0 = jnp.array([1.0, 0.0])
        si = jax.jit(
            lambda x: ipm.solve(problem, grid, x, params)
        )(x0)
        ss = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params)
        )(x0)
        assert bool(si.converged)
        assert np.allclose(si.us, ss.us, atol=1e-3), np.abs(
            np.asarray(si.us) - np.asarray(ss.us)
        ).max()


def make_bounded_integrator(cap: float):
    """Double integrator with hard input bounds |u| <= cap as state-input
    inequality h(t,x,u) >= 0 (the native-IPM family)."""
    base = double_integrator.make_problem()

    def bounds(t, x, u, p):
        return jnp.array([cap - u[0], u[0] + cap])

    return dataclasses.replace(base, inequality_terms=(bounds,))


class TestInputBounds:
    def setup_method(self):
        self.cap = 1.5
        self.problem = make_bounded_integrator(self.cap)
        self.params = double_integrator.make_params()
        self.grid = uniform_grid(0.0, 2.0, 40)
        self.x0 = jnp.array([2.0, 0.0])

    def test_bounds_active_and_respected(self):
        # Unconstrained solution must exceed the cap (else the test is vacuous).
        free = jax.jit(
            lambda x: sqp.solve(
                double_integrator.make_problem(), self.grid, x, self.params
            )
        )(self.x0)
        assert float(jnp.max(jnp.abs(free.us))) > self.cap

        st = ipm.IpmSettings(max_iterations=30)
        sol = jax.jit(
            lambda x: ipm.solve(self.problem, self.grid, x, self.params, settings=st)
        )(self.x0)
        assert float(jnp.max(jnp.abs(sol.us))) <= self.cap * (1.0 + 1e-3)
        assert float(sol.performance.dynamics_violation_sse) < 1e-5
        # Slacks strictly positive, duals non-negative (interior iterates).
        assert float(jnp.min(sol.ipm.slack_ineq)) > 0.0
        assert float(jnp.min(sol.ipm.dual_ineq)) >= 0.0

    def test_matches_al_sqp(self):
        """IPM and the AL-handling SQP must agree on the constrained optimum."""
        st_i = ipm.IpmSettings(max_iterations=30)
        st_s = sqp.SqpSettings(max_iterations=40)
        si = jax.jit(
            lambda x: ipm.solve(
                self.problem, self.grid, x, self.params, settings=st_i
            )
        )(self.x0)
        ss = jax.jit(
            lambda x: sqp.solve(
                self.problem, self.grid, x, self.params, settings=st_s
            )
        )(self.x0)
        assert np.allclose(si.us, ss.us, atol=5e-2), np.abs(
            np.asarray(si.us) - np.asarray(ss.us)
        ).max()

    def test_vmap_batching(self):
        st = ipm.IpmSettings(max_iterations=20)
        x0s = jnp.array([[2.0, 0.0], [1.0, -0.5]])
        batched = jax.jit(
            jax.vmap(
                lambda x: ipm.solve(
                    self.problem, self.grid, x, self.params, settings=st
                )
            )
        )(x0s)
        single = jax.jit(
            lambda x: ipm.solve(
                self.problem, self.grid, x, self.params, settings=st
            )
        )(x0s[0])
        assert np.allclose(batched.us[0], single.us, atol=1e-4)


class TestProjectedEqualities:
    def test_circular_kinematics(self):
        """IPM with projected state-input equalities (reference
        ocs2_ipm/test/testCircularKinematics.cpp)."""
        problem = make_circular_kinematics()
        grid = uniform_grid(0.0, jnp.pi, 30)
        x0 = jnp.array([1.0, 0.0])
        st = ipm.IpmSettings(max_iterations=20)
        sol = jax.jit(
            lambda x: ipm.solve(problem, grid, x, {}, settings=st)
        )(x0)
        gvals = jax.vmap(lambda x, u: x @ u)(sol.xs[:-1], sol.us)
        assert float(jnp.max(jnp.abs(gvals))) < 1e-4
        radii = jnp.linalg.norm(sol.xs, axis=1)
        assert float(jnp.max(radii)) < 1.2


class TestStateInequality:
    def test_position_ceiling(self):
        """State-only inequality x[0] <= ceiling enforced along the horizon."""
        base = double_integrator.make_problem()
        ceiling = 1.2

        def alt(t, x, p):
            return jnp.array([ceiling - x[0]])

        problem = dataclasses.replace(base, state_inequality_terms=(alt,))
        grid = uniform_grid(0.0, 2.0, 40)
        # Start moving upward so the unconstrained arc overshoots the ceiling.
        x0 = jnp.array([1.0, 1.5])
        free = jax.jit(
            lambda x: sqp.solve(base, grid, x, double_integrator.make_params())
        )(x0)
        assert float(jnp.max(free.xs[:, 0])) > ceiling

        st = ipm.IpmSettings(max_iterations=30)
        sol = jax.jit(
            lambda x: ipm.solve(
                problem, grid, x, double_integrator.make_params(), settings=st
            )
        )(x0)
        assert float(jnp.max(sol.xs[:, 0])) <= ceiling * (1.0 + 5e-3)
