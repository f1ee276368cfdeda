"""Unified Solver facade + initializer tests (SolverBase.h:54-273 parity)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models import double_integrator as di
from ocs2_tpu.oc.initialization import (
    CustomInitializer,
    DefaultInitializer,
    OperatingPoints,
)
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import sqp
from ocs2_tpu.solvers.api import Solver


class TestSolverFacade:
    @pytest.mark.parametrize("algo", ["sqp", "ilqr", "slq", "ipm", "slp"])
    def test_all_algorithms_solve(self, algo):
        problem = di.make_problem()
        grid = uniform_grid(0.0, 2.0, 25)
        solver = Solver(problem, algorithm=algo)
        sol = solver.run(grid, jnp.array([1.0, 0.0]), di.make_params())
        assert bool(jnp.all(jnp.isfinite(sol.xs)))
        # All five algorithms land on the same finite-horizon optimum.
        assert abs(float(sol.xs[-1, 0]) - 0.1304) < 5e-3, (algo, sol.xs[-1])
        times, xs, us, gains = solver.primal_solution()
        assert xs.shape == (26, 2) and us.shape == (25, 1)
        perf = solver.performance_indices()
        assert float(perf.cost) >= 0.0

    def test_value_and_hamiltonian_queries(self):
        problem = di.make_problem()
        grid = uniform_grid(0.0, 2.0, 30)
        solver = Solver(problem, algorithm="sqp")
        sol = solver.run(grid, jnp.array([1.0, 0.0]), di.make_params())
        v = solver.get_value_function(jnp.asarray(grid.times[8]), sol.xs[8])
        assert abs(float(v.f)) < 1e-4  # on-trajectory: zero in delta coords
        h_opt = solver.get_hamiltonian(
            jnp.asarray(grid.times[8]), sol.xs[8], sol.us[8]
        )
        h_off = solver.get_hamiltonian(
            jnp.asarray(grid.times[8]), sol.xs[8], sol.us[8] + 1.0
        )
        assert float(h_off) > float(h_opt)
        hq = solver.get_hamiltonian(
            jnp.asarray(grid.times[8]), sol.xs[8], sol.us[8], quadratic=True
        )
        assert hq.dfduu.shape == (1, 1)

    def test_unknown_algorithm_rejected(self):
        with pytest.raises(ValueError):
            Solver(di.make_problem(), algorithm="nope")


class TestInitializers:
    def test_operating_points_interpolation(self):
        grid = uniform_grid(0.0, 1.0, 10)
        init = OperatingPoints(
            times=[0.0, 1.0],
            states=[[0.0, 0.0], [1.0, 1.0]],
            inputs=[[0.5], [0.5]],
        )
        xs, us = init(grid, jnp.array([9.0, 9.0]), 1)
        # x0 pinned to the measured state, tail interpolates the schedule.
        np.testing.assert_allclose(np.asarray(xs[0]), [9.0, 9.0])
        np.testing.assert_allclose(np.asarray(xs[-1]), [1.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(us), 0.5, atol=1e-6)

    def test_operating_points_initializer_through_solver(self):
        """A task-informed operating trajectory plugs into the Solver facade
        and reaches the same optimum as the default initializer (reference
        OperatingPoints role in the bring-up stack)."""
        problem = di.make_problem()
        grid = uniform_grid(0.0, 2.0, 25)
        params = di.make_params()
        x0 = jnp.array([1.0, 0.0])
        init = OperatingPoints(
            times=[0.0, 2.0],
            states=jnp.stack([x0, jnp.zeros(2)]),
            inputs=jnp.zeros((2, 1)),
        )
        sol_op = Solver(problem, "sqp", initializer=init).run(grid, x0, params)
        sol_def = Solver(problem, "sqp").run(grid, x0, params)
        np.testing.assert_allclose(
            np.asarray(sol_op.xs), np.asarray(sol_def.xs), atol=1e-3
        )

    def test_custom_initializer(self):
        grid = uniform_grid(0.0, 1.0, 5)
        init = CustomInitializer(
            lambda g, x0, nu: (
                jnp.tile(x0[None], (g.num_intervals + 1, 1)),
                jnp.full((g.num_intervals, nu), 7.0),
            )
        )
        xs, us = init(grid, jnp.array([1.0, 2.0]), 3)
        assert float(us[0, 0]) == 7.0 and us.shape == (5, 3)
