"""MPC⇄MRT runtime tests: closed-loop regulation, warm-start reuse, target
retargeting (mirrors the reference's in-process MPC_MRT_Interface tests and
the per-robot dummy-loop regression tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.core.reference import TargetTrajectories
from ocs2_tpu.models import cartpole, double_integrator
from ocs2_tpu.mpc.mpc import Mpc, MpcSettings
from ocs2_tpu.mpc.mrt import MpcMrtInterface, Mrt, SystemObservation, dummy_loop
from ocs2_tpu.solvers import ddp, sqp


def make_di_mpc(solver="sqp", horizon=1.0, n=20):
    problem = double_integrator.make_problem()
    params = double_integrator.make_params()
    st = MpcSettings(time_horizon=horizon, num_intervals=n, solver=solver)
    return Mpc(problem, params, settings=st)


class TestMpcTick:
    def test_single_tick_produces_policy(self):
        mpc = make_di_mpc()
        pol = mpc.run(0.0, jnp.array([1.0, 0.0]))
        assert pol.xs.shape == (21, 2)
        u0 = pol.controller(jnp.asarray(0.0), jnp.array([1.0, 0.0]))
        assert u0.shape == (1,)
        assert float(u0[0]) < 0.0  # decelerate toward origin

    def test_warm_start_speeds_convergence(self):
        mpc = make_di_mpc()
        mpc.run(0.0, jnp.array([1.0, 0.0]))
        pol2 = mpc.run(0.02, jnp.array([0.99, -0.05]))
        # Warm-started LQ resolve should need very few iterations.
        assert pol2.performance.cost is not None
        assert mpc.solve_timer.count == 2

    def test_retarget(self):
        mpc = make_di_mpc()
        mpc.run(0.0, jnp.array([0.0, 0.0]))
        mpc.reference_manager.set_target(
            TargetTrajectories.constant(jnp.array([2.0, 0.0]), jnp.zeros(1))
        )
        pol = mpc.run(0.1, jnp.array([0.0, 0.0]))
        # Must accelerate toward the new target.
        assert float(pol.controller(jnp.asarray(0.1), jnp.zeros(2))[0]) > 0.1


class TestClosedLoop:
    def test_double_integrator_regulates(self):
        mpc = make_di_mpc(horizon=1.0, n=20)
        iface = MpcMrtInterface(mpc)
        ts, xs, us = dummy_loop(
            iface, jnp.array([1.0, 0.0]), duration=4.0,
            mrt_frequency=100.0, mpc_frequency=20.0,
        )
        assert float(jnp.linalg.norm(xs[-1])) < 0.05, xs[-1]

    def test_mrt_gating_before_first_policy(self):
        mrt = Mrt(double_integrator.make_problem())
        assert not mrt.initialized
        try:
            mrt.evaluate_policy(0.0, jnp.zeros(2))
            assert False, "should have raised"
        except AssertionError as e:
            assert "MRT gating" in str(e) or "no policy" in str(e)

    def test_cartpole_stabilization_near_upright(self):
        problem = cartpole.make_problem("soft")
        params = cartpole.make_params()
        st = MpcSettings(time_horizon=1.5, num_intervals=30, solver="sqp")
        mpc = Mpc(
            problem, params, settings=st,
            solver_settings=sqp.SqpSettings(max_iterations=10, integrator="rk4"),
        )
        iface = MpcMrtInterface(mpc)
        x0 = jnp.array([0.4, 0.0, 0.0, 0.0])  # tipped, recoverable
        ts, xs, us = dummy_loop(
            iface, x0, duration=3.0, mrt_frequency=100.0, mpc_frequency=25.0,
        )
        assert abs(float(xs[-1, 0])) < 0.1, xs[-1]
