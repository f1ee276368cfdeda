"""PIPG first-order QP solver tests: agreement with the exact Riccati kernel
on random LQ problems (the reference validates PipgSolver the same way,
ocs2_slp/test/testPipgSolver.cpp), Ruiz equilibration invariants, and the
SLP end-to-end configuration (ocs2_slp/SlpSolver.h)."""
import jax
import jax.numpy as jnp
import numpy as np

from lq_fixtures import random_lq_coeffs
from ocs2_tpu.models import double_integrator
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.ops.pipg import (
    PipgSettings,
    estimate_cost_eigs,
    estimate_sigma,
    pipg_solve,
    ruiz_equilibrate,
)
from ocs2_tpu.ops.riccati import lqr_backward, lqr_forward
from ocs2_tpu.solvers import slp, sqp


class TestPipgMatchesRiccati:
    def test_random_lq(self):
        coeffs = random_lq_coeffs(jax.random.PRNGKey(0), 20, 4, 2)
        sol = lqr_backward(coeffs)
        dxs_ref, dus_ref = lqr_forward(coeffs, sol, jnp.zeros(4))

        scaled, scal = ruiz_equilibrate(coeffs, 5)
        psol = jax.jit(
            lambda c: pipg_solve(c, PipgSettings(num_iterations=6000))
        )(scaled)
        dxs = scal.d_x * psol.dxs
        dus = scal.d_u * psol.dus
        assert float(psol.primal_residual) < 1e-3
        assert np.allclose(dus, dus_ref, atol=5e-3), np.abs(
            np.asarray(dus) - np.asarray(dus_ref)
        ).max()
        assert np.allclose(dxs, dxs_ref, atol=5e-3)

    def test_input_box_projection(self):
        """With an active input box, PIPG must respect the bounds exactly
        (projection), which the unconstrained Riccati solution violates."""
        coeffs = random_lq_coeffs(jax.random.PRNGKey(1), 15, 3, 2)
        sol = lqr_backward(coeffs)
        _, dus_ref = lqr_forward(coeffs, sol, jnp.zeros(3))
        cap = 0.5 * float(jnp.max(jnp.abs(dus_ref)))
        scaled, scal = ruiz_equilibrate(coeffs, 5)
        lo = -cap / scal.d_u
        hi = cap / scal.d_u
        psol = pipg_solve(
            scaled, PipgSettings(num_iterations=4000), u_lower=lo, u_upper=hi
        )
        dus = scal.d_u * psol.dus
        assert float(jnp.max(jnp.abs(dus))) <= cap * (1.0 + 1e-5)
        assert float(psol.primal_residual) < 1e-3


class TestEigenvalueEstimates:
    def test_sigma_upper_bound(self):
        coeffs = random_lq_coeffs(jax.random.PRNGKey(2), 12, 3, 2)
        sigma = float(estimate_sigma(coeffs, 60))
        # Dense G for ground truth.
        n, nx, nu = 12, 3, 2
        nz = (n + 1) * nx + n * nu
        g = np.zeros((n * nx, nz))

        def xcol(k):
            return k * (nx + nu)

        def ucol(k):
            return k * (nx + nu) + nx

        for k in range(n):
            g[k * nx : (k + 1) * nx, xcol(k) : xcol(k) + nx] = np.asarray(
                coeffs.A[k]
            )
            g[k * nx : (k + 1) * nx, ucol(k) : ucol(k) + nu] = np.asarray(
                coeffs.B[k]
            )
            g[k * nx : (k + 1) * nx, xcol(k + 1) : xcol(k + 1) + nx] = -np.eye(nx)
        # dx_0 is pinned: zero its columns.
        g[:, 0:nx] = 0.0
        true_sigma = np.linalg.eigvalsh(g @ g.T).max()
        assert sigma <= true_sigma * 1.001
        assert sigma >= true_sigma * 0.9  # power iteration converged

    def test_cost_eig_bracket(self):
        coeffs = random_lq_coeffs(jax.random.PRNGKey(3), 10, 3, 2)
        mu, lam = estimate_cost_eigs(coeffs, 80)
        assert float(mu) >= 0.0
        assert float(lam) > float(mu)


class TestRuiz:
    def test_preserves_identity_block_and_solution(self):
        """Equilibration must keep the -I dynamics block (stage form) and the
        unscaled optimum: solving the scaled QP and unscaling reproduces the
        original Riccati solution."""
        coeffs = random_lq_coeffs(jax.random.PRNGKey(4), 10, 3, 2)
        sol = lqr_backward(coeffs)
        dxs_ref, dus_ref = lqr_forward(coeffs, sol, jnp.zeros(3))
        scaled, scal = ruiz_equilibrate(coeffs, 5)
        ssol = lqr_backward(scaled)
        dxs_s, dus_s = lqr_forward(scaled, ssol, jnp.zeros(3))
        assert np.allclose(scal.d_x * dxs_s, dxs_ref, atol=1e-4)
        assert np.allclose(scal.d_u * dus_s, dus_ref, atol=1e-4)


class TestSlpSolver:
    def test_double_integrator(self):
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        grid = uniform_grid(0.0, 2.0, 40)
        x0 = jnp.array([1.0, 0.0])
        st = slp.SlpSettings(max_iterations=10, pipg_iterations=4000)
        sol = jax.jit(
            lambda x: slp.solve(problem, grid, x, params, settings=st)
        )(x0)
        ref = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params)
        )(x0)
        assert float(sol.performance.dynamics_violation_sse) < 1e-4
        assert np.allclose(sol.us, ref.us, atol=5e-2), np.abs(
            np.asarray(sol.us) - np.asarray(ref.us)
        ).max()
