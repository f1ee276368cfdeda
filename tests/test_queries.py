"""Value-function / Hamiltonian query API + rollout-backend seam tests.

Mirrors the reference SolverBase query surface (SolverBase.h:214, :224) and
the RaisimRollout backend-swap seam (ocs2_raisim_core/RaisimRollout.h:46).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models import double_integrator as di
from ocs2_tpu.oc.queries import hamiltonian, hamiltonian_approx, value_function
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import sqp


def _solved():
    problem = di.make_problem()
    grid = uniform_grid(0.0, 2.0, 40)
    params = di.make_params()
    x0 = jnp.array([1.0, 0.0])
    st = sqp.SqpSettings(max_iterations=15, integrator="rk2")
    sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, settings=st))(x0)
    return problem, grid, params, sol


class TestValueFunction:
    def test_zero_on_nominal_trajectory(self):
        """V(t, x_nom(t)) = 0 in delta coordinates — and grows quadratically
        off the trajectory with the PSD Riccati Hessian."""
        problem, grid, params, sol = _solved()
        from ocs2_tpu.core.interpolation import interpolate

        t = jnp.asarray(0.7)
        x_nom = interpolate(jnp.asarray(grid.times), sol.xs, t)
        v_on = value_function(grid, sol.xs, sol.value_S, sol.value_s, t, x_nom)
        assert abs(float(v_on.f)) < 1e-5
        dx = jnp.array([0.3, -0.2])
        v_off = value_function(
            grid, sol.xs, sol.value_S, sol.value_s, t, x_nom + dx
        )
        expect = float(
            jnp.dot(v_on.dfdx, dx) + 0.5 * jnp.dot(dx, v_on.dfdxx @ dx)
        )
        assert abs(float(v_off.f) - expect) < 1e-4
        assert float(v_off.f) > 0.0
        w = np.linalg.eigvalsh(np.asarray(v_off.dfdxx))
        assert np.all(w > -1e-5)

    def test_gradient_matches_finite_difference(self):
        problem, grid, params, sol = _solved()
        t = jnp.asarray(0.9)
        from ocs2_tpu.core.interpolation import interpolate

        x = interpolate(jnp.asarray(grid.times), sol.xs, t) + jnp.array(
            [0.1, 0.05]
        )
        q = value_function(grid, sol.xs, sol.value_S, sol.value_s, t, x)
        eps = 1e-3
        for i in range(2):
            e = jnp.zeros(2).at[i].set(eps)
            vp = value_function(grid, sol.xs, sol.value_S, sol.value_s, t, x + e).f
            vm = value_function(grid, sol.xs, sol.value_S, sol.value_s, t, x - e).f
            fd = float((vp - vm) / (2 * eps))
            assert abs(fd - float(q.dfdx[i])) < 1e-2, (i, fd, float(q.dfdx[i]))


class TestHamiltonian:
    def test_stationary_at_optimal_control(self):
        """dH/du ~ 0 along the optimal trajectory (Pontryagin stationarity;
        discrete-time Riccati value, so tolerance is O(dt))."""
        problem, grid, params, sol = _solved()
        for k in [5, 20, 35]:
            t = jnp.asarray(grid.times[k])
            ha = hamiltonian_approx(
                problem, grid, sol.xs, sol.value_S, sol.value_s,
                t, sol.xs[k], sol.us[k], params,
            )
            assert float(jnp.max(jnp.abs(ha.dfdu))) < 0.08, (
                k, np.asarray(ha.dfdu))

    def test_suboptimal_control_raises_h(self):
        """H(u* + du) > H(u*) (u* minimizes the Hamiltonian)."""
        problem, grid, params, sol = _solved()
        k = 10
        t = jnp.asarray(grid.times[k])
        h_opt = hamiltonian(
            problem, grid, sol.xs, sol.value_S, sol.value_s,
            t, sol.xs[k], sol.us[k], params,
        )
        h_off = hamiltonian(
            problem, grid, sol.xs, sol.value_S, sol.value_s,
            t, sol.xs[k], sol.us[k] + 1.0, params,
        )
        assert float(h_off) > float(h_opt)


class TestRolloutBackendSeam:
    def test_model_mismatch_visible_in_closed_loop(self):
        """Swapping the MRT plant for a mismatched simulator (RaisimRollout
        analogue) changes the closed-loop trajectory but MPC still tracks."""
        from ocs2_tpu.mpc.mpc import Mpc, MpcSettings
        from ocs2_tpu.mpc.mrt import (
            ExternalSimRollout,
            FlowMapRollout,
            MpcMrtInterface,
            Mrt,
            dummy_loop,
        )

        problem = di.make_problem()
        params = di.make_params()
        settings = MpcSettings(time_horizon=1.5, num_intervals=24)
        x0 = jnp.array([1.0, 0.0])

        def run(backend):
            mpc = Mpc(
                problem, params, settings,
                solver_settings=sqp.SqpSettings(max_iterations=6,
                                                integrator="rk2"),
            )
            iface = MpcMrtInterface(mpc, Mrt(problem, rollout_backend=backend))
            ts, xs, us = dummy_loop(
                iface, x0, duration=2.5, mrt_frequency=100.0,
                mpc_frequency=20.0, params=params,
            )
            return np.asarray(xs)

        # Mismatched plant: 30% weaker actuation + drag.
        def sim_dyn(t, x, u, p):
            return di.dynamics(t, x, 0.7 * u, p) - jnp.array([0.0, 0.1]) * x[1]

        xs_nominal = run(FlowMapRollout(problem))
        xs_mismatch = run(ExternalSimRollout(sim_dyn))
        # The two plants genuinely differ...
        assert np.max(np.abs(xs_nominal - xs_mismatch)) > 1e-3
        # ...but closed-loop MPC still drives the mismatched plant home.
        assert abs(xs_mismatch[-1, 0]) < 0.15, xs_mismatch[-1]
        assert abs(xs_nominal[-1, 0]) < 0.1, xs_nominal[-1]
