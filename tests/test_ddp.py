"""DDP solver tests: LQ correctness vs dense QP, nonlinear swing-up
convergence, constraint satisfaction, batching.

Mirrors the reference's ocs2_ddp/test suite: CorrectnessTest.cpp (DDP vs
ocs2_qp_solver on LQ problems) and the cartpole example regression tests.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models import cartpole, double_integrator
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import ddp
from ocs2_tpu.solvers.qp import solve_lq_dense
from ocs2_tpu.ops.riccati import LqrCoeffs


class TestDoubleIntegrator:
    def setup_method(self):
        self.problem = double_integrator.make_problem()
        self.params = double_integrator.make_params()
        self.grid = uniform_grid(0.0, 2.0, 40)
        self.x0 = jnp.array([1.0, 0.0])

    def _solve(self, **kw):
        return jax.jit(
            lambda x0: ddp.solve(self.problem, self.grid, x0, self.params, **kw)
        )(self.x0)

    def test_converges_to_origin(self):
        sol = self._solve()
        assert bool(sol.converged)
        # Optimal LQ tracking with these weights settles to ~0.17 by T=2.
        assert np.linalg.norm(sol.xs[-1]) < 0.25
        assert np.linalg.norm(sol.xs[-1]) < np.linalg.norm(self.x0) * 0.3
        # LQ problem: one iteration of DDP is exact Newton, few needed.
        assert int(sol.iterations) <= 4

    def test_matches_dense_qp(self):
        """On an LQ problem the DDP solution IS the QP solution."""
        sol = self._solve()
        # Build the same LQ problem as explicit coefficients (RK4-discretized
        # linear system is exact up to integrator order).
        from ocs2_tpu.oc.approx import approximate_lq

        lq = approximate_lq(
            self.problem, self.grid, jnp.zeros_like(sol.xs),
            jnp.zeros_like(sol.us), dict(self.params),
        )
        coeffs = LqrCoeffs(
            A=lq.dynamics.dfdx,
            B=lq.dynamics.dfdu,
            b=jnp.zeros_like(lq.dynamics.f),
            Qxx=lq.cost.dfdxx[:-1], qx=lq.cost.dfdx[:-1],
            Quu=lq.cost.dfduu[:-1], qu=lq.cost.dfdu[:-1],
            Qux=lq.cost.dfdux[:-1],
            Qf=lq.cost.dfdxx[-1], qf=lq.cost.dfdx[-1],
        )
        dense = solve_lq_dense(coeffs, self.x0)
        assert np.allclose(sol.us, dense.dus, atol=5e-3), np.abs(
            np.asarray(sol.us) - dense.dus
        ).max()

    def test_jit_and_vmap_batching(self):
        solve = jax.jit(
            lambda x0: ddp.solve(self.problem, self.grid, x0, self.params)
        )
        x0s = jnp.array([[1.0, 0.0], [0.5, -0.5], [-1.0, 1.0], [2.0, 0.3]])
        batched = jax.jit(jax.vmap(lambda x0: ddp.solve(
            self.problem, self.grid, x0, self.params)))(x0s)
        single = solve(x0s[2])
        assert np.allclose(batched.us[2], single.us, atol=1e-4)
        assert batched.xs.shape == (4, 41, 2)

    def test_parallel_riccati_same_solution(self):
        sol_p = self._solve(settings=ddp.DdpSettings(parallel_riccati=True))
        sol_s = self._solve()
        assert np.allclose(sol_p.us, sol_s.us, atol=1e-3)


class TestCartpoleSwingUp:
    def test_unconstrained_swing_up(self):
        problem = cartpole.make_problem("none")
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = cartpole.initial_state_down()
        st = ddp.DdpSettings(max_iterations=60, min_rel_cost=1e-5)
        sol = jax.jit(
            lambda x0: ddp.solve(problem, grid, x0, cartpole.make_params(), settings=st)
        )(x0)
        # Pole ends near upright.
        assert abs(float(sol.xs[-1, 0])) < 0.2, sol.xs[-1]

    def test_soft_input_constraint_respected(self):
        problem = cartpole.make_problem("soft")
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = cartpole.initial_state_down()
        st = ddp.DdpSettings(max_iterations=80, min_rel_cost=1e-6)
        sol = jax.jit(
            lambda x0: ddp.solve(problem, grid, x0, cartpole.make_params(), settings=st)
        )(x0)
        assert abs(float(sol.xs[-1, 0])) < 0.3
        assert float(jnp.max(jnp.abs(sol.us))) < cartpole.MAX_FORCE * 1.05

    def test_hard_input_constraint_al(self):
        problem = cartpole.make_problem("hard")
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = cartpole.initial_state_down()
        st = ddp.DdpSettings(max_iterations=100, min_rel_cost=1e-6)
        sol = jax.jit(
            lambda x0: ddp.solve(problem, grid, x0, cartpole.make_params(), settings=st)
        )(x0)
        assert abs(float(sol.xs[-1, 0])) < 0.3
        viol = float(jnp.max(jnp.maximum(jnp.abs(sol.us) - cartpole.MAX_FORCE, 0.0)))
        assert viol < 1e-3, viol
