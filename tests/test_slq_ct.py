"""Continuous-time SLQ backward pass tests.

Mirrors the reference's SLQ-vs-ILQR distinction (ocs2_ddp: SLQ integrates
ContinuousTimeRiccatiEquations.h:106 with ODE45; ILQR runs the discrete
recursion on discretized transitions).  Validates:
* the Riccati ODE integration against the converged fine-grid discrete
  recursion on an LTI problem (both approximate the same continuous-time
  value function, from opposite directions);
* that on a COARSE grid SLQ's value function is closer to the continuous
  ground truth than iLQR's (the reference's reason SLQ exists);
* that the SLQ-configured DDP solver still converges on nonlinear problems.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.oc.approx import approximate_lq, approximate_lq_ct
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.ops.riccati import LqrCoeffs, lqr_backward
from ocs2_tpu.ops.riccati_ct import CtLqCoeffs, slq_backward
from ocs2_tpu.models import double_integrator
from ocs2_tpu.solvers import ddp


def _lti_ct_coeffs(n_nodes, T, nx=2, nu=1):
    """Double-integrator LTI continuous LQ data sampled on a uniform grid."""
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    b = jnp.array([[0.0], [1.0]])
    q = jnp.diag(jnp.array([2.0, 0.5]))
    r = jnp.eye(nu) * 0.1
    qf = jnp.eye(nx) * 3.0
    times = jnp.linspace(0.0, T, n_nodes + 1)
    rep = lambda m, k: jnp.broadcast_to(m, (k,) + m.shape)  # noqa: E731
    return CtLqCoeffs(
        A=rep(a, n_nodes + 1), B=rep(b, n_nodes + 1),
        Q=rep(q, n_nodes + 1), q=jnp.zeros((n_nodes + 1, nx)),
        R=rep(r, n_nodes + 1), r=jnp.zeros((n_nodes + 1, nu)),
        P=jnp.zeros((n_nodes + 1, nu, nx)),
        A_jump=rep(jnp.eye(nx), n_nodes),
        Q_jump=jnp.zeros((n_nodes, nx, nx)), q_jump=jnp.zeros((n_nodes, nx)),
        Qf=qf, qf=jnp.zeros(nx), times=times, is_jump=jnp.zeros(n_nodes),
    ), (a, b, q, r, qf)


def _fine_discrete_S0(a, b, q, r, qf, T, n_fine=4000):
    """Converged discrete-recursion S(0) on an extremely fine grid = the
    continuous-time Riccati ground truth."""
    dt = T / n_fine
    nx, nu = b.shape
    # Exact-enough discretization for tiny dt: first order.
    ad = jnp.eye(nx) + dt * a
    bd = dt * b
    coeffs = LqrCoeffs(
        A=jnp.broadcast_to(ad, (n_fine, nx, nx)),
        B=jnp.broadcast_to(bd, (n_fine, nx, nu)),
        b=jnp.zeros((n_fine, nx)),
        Qxx=jnp.broadcast_to(dt * q, (n_fine, nx, nx)),
        qx=jnp.zeros((n_fine, nx)),
        Quu=jnp.broadcast_to(dt * r, (n_fine, nu, nu)),
        qu=jnp.zeros((n_fine, nu)),
        Qux=jnp.zeros((n_fine, nu, nx)),
        Qf=qf, qf=jnp.zeros(nx),
    )
    return lqr_backward(coeffs).value_S[0]


class TestContinuousRiccati:
    def test_matches_fine_discrete_ground_truth(self):
        ct, (a, b, q, r, qf) = _lti_ct_coeffs(n_nodes=20, T=1.0)
        s_truth = _fine_discrete_S0(a, b, q, r, qf, T=1.0)
        sol = jax.jit(lambda c: slq_backward(c, substeps=8))(ct)
        err = float(jnp.max(jnp.abs(sol.value_S[0] - s_truth)))
        assert err < 2e-3, f"CT Riccati vs fine-grid truth: {err}"

    def test_closer_than_discrete_on_coarse_grid(self):
        """The point of SLQ: on a coarse grid, integrating the continuous
        Riccati ODE beats the discrete recursion on the SAME grid."""
        n_coarse = 10
        T = 1.0
        ct, (a, b, q, r, qf) = _lti_ct_coeffs(n_nodes=n_coarse, T=T)
        s_truth = _fine_discrete_S0(a, b, q, r, qf, T=T)
        s_slq = slq_backward(ct, substeps=8).value_S[0]

        # Discrete recursion on the same coarse grid (Euler transitions, the
        # matching first-order quadrature).
        dt = T / n_coarse
        nx, nu = b.shape
        coeffs = LqrCoeffs(
            A=jnp.broadcast_to(jnp.eye(nx) + dt * a, (n_coarse, nx, nx)),
            B=jnp.broadcast_to(dt * b, (n_coarse, nx, nu)),
            b=jnp.zeros((n_coarse, nx)),
            Qxx=jnp.broadcast_to(dt * q, (n_coarse, nx, nx)),
            qx=jnp.zeros((n_coarse, nx)),
            Quu=jnp.broadcast_to(dt * r, (n_coarse, nu, nu)),
            qu=jnp.zeros((n_coarse, nu)),
            Qux=jnp.zeros((n_coarse, nu, nx)),
            Qf=qf, qf=jnp.zeros(nx),
        )
        s_disc = lqr_backward(coeffs).value_S[0]
        e_slq = float(jnp.max(jnp.abs(s_slq - s_truth)))
        e_disc = float(jnp.max(jnp.abs(s_disc - s_truth)))
        assert e_slq < 0.1 * e_disc, (e_slq, e_disc)

    def test_gain_sign_and_symmetry(self):
        ct, _ = _lti_ct_coeffs(n_nodes=16, T=1.0)
        sol = slq_backward(ct, substeps=4)
        s0 = np.asarray(sol.value_S[0])
        np.testing.assert_allclose(s0, s0.T, atol=1e-6)
        w = np.linalg.eigvalsh(s0)
        assert w.min() > 0  # value function PD for this LQ problem
        # Velocity gain must damp: du/dv < 0 at every node.
        assert np.all(np.asarray(sol.gains)[:, 0, 1] < 0)


class TestSlqSolver:
    def test_slq_approx_pipeline(self):
        """approximate_lq_ct on a real problem feeds slq_backward and the
        value function matches the discrete path's to discretization order."""
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        grid = uniform_grid(0.0, 2.0, 80)
        xs = jnp.zeros((81, 2)).at[:, 0].set(1.0)
        us = jnp.zeros((80, 1))
        ct = approximate_lq_ct(problem, grid, xs, us, dict(params))
        sol_ct = slq_backward(ct, substeps=4)
        lq = approximate_lq(problem, grid, xs, us, dict(params))
        coeffs = LqrCoeffs(
            A=lq.dynamics.dfdx, B=lq.dynamics.dfdu,
            b=jnp.zeros_like(lq.dynamics.f),
            Qxx=lq.cost.dfdxx[:-1], qx=lq.cost.dfdx[:-1],
            Quu=lq.cost.dfduu[:-1], qu=lq.cost.dfdu[:-1],
            Qux=lq.cost.dfdux[:-1], Qf=lq.cost.dfdxx[-1],
            qf=lq.cost.dfdx[-1],
        )
        sol_d = lqr_backward(coeffs)
        err = float(
            jnp.max(jnp.abs(sol_ct.value_S[0] - sol_d.value_S[0]))
            / (1.0 + jnp.max(jnp.abs(sol_d.value_S[0])))
        )
        assert err < 5e-3, err

    def test_slq_solver_converges_nonlinear(self):
        from ocs2_tpu.models import cartpole

        problem = cartpole.make_problem("none")
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = cartpole.initial_state_down()
        st = ddp.DdpSettings(
            algorithm="slq", max_iterations=60, min_rel_cost=1e-5
        )
        sol = jax.jit(
            lambda x: ddp.solve(problem, grid, x, cartpole.make_params(), settings=st)
        )(x0)
        # Swing-up reached: pole angle near upright at the end.
        assert abs(float(sol.xs[-1, 0])) < 0.2, sol.xs[-1]
