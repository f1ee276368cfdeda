"""EXP0/EXP1 switched-system tests pinning absolute optimal costs.

Mirrors reference ocs2_ddp/test/Exp0Test.cpp / Exp1Test.cpp (expected costs
9.766 / 5.4399 within 10*minRelCost) and the corresponding SQP/IPM variants
(ocs2_sqp/test/testSwitchedProblem.cpp, ocs2_ipm/test).  These anchor the
whole switched-system path — mode-indexed dynamics, event-aligned grids —
to analytic ground truth rather than self-consistency.
"""
import jax
import numpy as np
import pytest

from ocs2_tpu.solvers import ddp, ipm, sqp

from exp_fixtures import (
    EXP0_EXPECTED_COST,
    EXP0_X0,
    EXP1_EXPECTED_COST,
    EXP1_X0,
    exp0_grid,
    exp0_params,
    exp0_problem,
    exp1_grid,
    exp1_params,
    exp1_problem,
)

# Discrete-time transcription error at N=100/150 nodes bounds how tightly a
# fixed-step solve can match the reference's adaptive-ODE45 optimal cost.
COST_RTOL = 7e-3


class TestExp0:
    def setup_method(self):
        self.problem = exp0_problem()
        self.grid = exp0_grid(100)
        self.params = exp0_params()

    def _check(self, cost, converged=None):
        assert abs(float(cost) - EXP0_EXPECTED_COST) < COST_RTOL * EXP0_EXPECTED_COST, (
            float(cost),
            EXP0_EXPECTED_COST,
        )

    def test_ilqr_hits_analytic_cost(self):
        st = ddp.DdpSettings(algorithm="ilqr", max_iterations=30)
        sol = jax.jit(
            lambda x: ddp.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP0_X0)
        self._check(sol.performance.cost)

    def test_slq_hits_analytic_cost(self):
        st = ddp.DdpSettings(algorithm="slq", max_iterations=30)
        sol = jax.jit(
            lambda x: ddp.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP0_X0)
        self._check(sol.performance.cost)

    def test_sqp_hits_analytic_cost(self):
        st = sqp.SqpSettings(max_iterations=30, integrator="rk4")
        sol = jax.jit(
            lambda x: sqp.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP0_X0)
        assert float(sol.performance.dynamics_violation_sse) < 1e-6
        self._check(sol.performance.cost)

    def test_ipm_hits_analytic_cost(self):
        st = ipm.IpmSettings(max_iterations=30, integrator="rk4")
        sol = jax.jit(
            lambda x: ipm.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP0_X0)
        assert float(sol.performance.dynamics_violation_sse) < 1e-6
        self._check(sol.performance.cost)


class TestExp1:
    def setup_method(self):
        self.problem = exp1_problem()
        self.grid = exp1_grid(150)
        self.params = exp1_params()

    def _check(self, cost):
        assert abs(float(cost) - EXP1_EXPECTED_COST) < COST_RTOL * EXP1_EXPECTED_COST, (
            float(cost),
            EXP1_EXPECTED_COST,
        )

    def test_ilqr_hits_analytic_cost(self):
        st = ddp.DdpSettings(algorithm="ilqr", max_iterations=40)
        sol = jax.jit(
            lambda x: ddp.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP1_X0)
        self._check(sol.performance.cost)

    def test_sqp_hits_analytic_cost(self):
        st = sqp.SqpSettings(max_iterations=40, integrator="rk4")
        sol = jax.jit(
            lambda x: sqp.solve(self.problem, self.grid, x, self.params, settings=st)
        )(EXP1_X0)
        assert float(sol.performance.dynamics_violation_sse) < 1e-6
        self._check(sol.performance.cost)

    def test_cross_solver_agreement(self):
        """DDP and SQP land on the same trajectory through both switches."""
        st_d = ddp.DdpSettings(algorithm="ilqr", max_iterations=40)
        st_s = sqp.SqpSettings(max_iterations=40, integrator="rk4")
        sd = jax.jit(
            lambda x: ddp.solve(self.problem, self.grid, x, self.params, settings=st_d)
        )(EXP1_X0)
        ss = jax.jit(
            lambda x: sqp.solve(self.problem, self.grid, x, self.params, settings=st_s)
        )(EXP1_X0)
        assert np.allclose(np.asarray(sd.xs), np.asarray(ss.xs), atol=2e-2), np.abs(
            np.asarray(sd.xs) - np.asarray(ss.xs)
        ).max()
