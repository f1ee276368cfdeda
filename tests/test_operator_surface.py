"""Operator-surface tests: term-wise solver observers, trajectory recording
with headless artifact export, and target commands.

Mirrors the reference's SolverObserver term probes
(ocs2_oc/synchronized_module/SolverObserver.h:48-152 +
SolverObserverRosCallbacks), the rqt_multiplot trajectory plotting configs,
and TargetTrajectoriesKeyboardPublisher
(ocs2_ros_interfaces/command/TargetTrajectoriesKeyboardPublisher.h).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models import cartpole, double_integrator
from ocs2_tpu.mpc.mpc import Mpc, MpcSettings
from ocs2_tpu.mpc.mrt import MpcMrtInterface, dummy_loop
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import ddp
from ocs2_tpu.utils.observers import (
    TermObserver,
    evaluate_term,
    term_name,
    term_slices,
)
from ocs2_tpu.utils.recorder import (
    TrajectoryRecorder,
    keyboard_command_loop,
    pose_command_to_target,
)


def _cartpole_solve():
    problem = cartpole.make_problem("hard")
    grid = uniform_grid(0.0, 2.0, 40)
    params = cartpole.make_params()
    sol = jax.jit(
        lambda x: ddp.solve(
            problem, grid, x, params,
            settings=ddp.DdpSettings(max_iterations=30),
        )
    )(cartpole.initial_state_down())
    return problem, grid, params, sol


class TestTermObserver:
    def test_term_slices_names_and_offsets(self):
        from ocs2_tpu.models.legged_robot import interface

        problem = interface.make_problem()
        sl = term_slices(problem, "equality", {"swing_vz": np.zeros((49, 4))})
        assert "foot_constraint" in sl
        assert sl["foot_constraint"] == slice(0, 12)

    def test_evaluate_term_matches_direct_call(self):
        problem, grid, params, sol = _cartpole_solve()
        vals = evaluate_term(
            problem, grid, sol.xs, sol.us, params, "inequality",
            "input_bounds",
        )
        assert vals.shape[0] == 40
        from ocs2_tpu.oc.approx import node_params

        k = 7
        direct = problem.inequality_terms[0](
            grid.times[k], sol.xs[k], sol.us[k], node_params(params, grid, k)
        )
        np.testing.assert_allclose(
            np.asarray(vals[k]), np.asarray(direct), rtol=1e-6
        )

    def test_observe_with_callbacks_and_multipliers(self):
        problem, grid, params, sol = _cartpole_solve()
        got = {}
        obs = TermObserver(
            problem, "inequality", "input_bounds",
            constraint_callback=lambda ts, vs: got.update(c=(ts, vs)),
            multiplier_callback=lambda ts, ms: got.update(m=(ts, ms)),
        )
        obs.observe(0.0, grid, sol, params)
        assert obs.latest() is not None
        ts, vs = got["c"]
        assert vs.shape == (40, 2)  # lower+upper bound rows over N nodes
        # The swing-up saturates the input bound: some node touches 0.
        assert vs.min() < 1e-2
        # AL multipliers extracted for the same slice (nonnegative for an
        # inequality family; zero is legitimate when the line search kept
        # every iterate feasible).
        _, ms = got["m"]
        assert ms.shape == (40, 2)
        assert ms.min() >= 0.0

    def test_term_name(self):
        def my_fn(t, x, u, p):
            return u

        assert term_name(my_fn) == "my_fn"

        class Named:
            name = "cone"

        assert term_name(Named()) == "cone"


class TestRecorder:
    def _run(self, tmpdir="/tmp"):
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        mpc = Mpc(
            problem, params,
            settings=MpcSettings(
                time_horizon=1.0, num_intervals=20, solver="sqp"
            ),
        )
        iface = MpcMrtInterface(mpc)
        rec = TrajectoryRecorder()
        ts, xs, us = dummy_loop(
            iface, jnp.array([1.0, 0.0]), duration=1.0,
            mrt_frequency=50.0, mpc_frequency=10.0, observers=[rec],
        )
        for t_solve, perf in zip(
            np.arange(mpc.solve_timer.count) * 0.1,
            [mpc._prev.performance] * mpc.solve_timer.count,
        ):
            rec.record_solve(t_solve, perf)
        return rec

    def test_record_and_npz(self, tmp_path):
        rec = self._run()
        assert len(rec.times) == 50
        path = os.path.join(str(tmp_path), "run.npz")
        rec.save_npz(path)
        data = np.load(path)
        assert data["x"].shape == (50, 2)
        assert data["u"].shape == (50, 1)
        assert "perf_merit" in data

    def test_plots_export(self, tmp_path):
        rec = self._run()
        path = os.path.join(str(tmp_path), "run.png")
        rec.save_plots(path)
        assert os.path.exists(path) and os.path.getsize(path) > 10_000

    def test_term_trace_in_npz(self, tmp_path):
        rec = self._run()
        rec.record_term("cone", np.arange(5.0), np.ones((5, 4)))
        path = os.path.join(str(tmp_path), "run2.npz")
        rec.save_npz(path)
        data = np.load(path)
        assert data["term_cone_v"].shape == (5, 4)


class TestTargetCommands:
    def test_pose_command_to_target(self):
        x0 = jnp.zeros(12).at[6].set(1.0)
        tt = pose_command_to_target(
            x0, [2.0, 0.0, 0.0, 0.5], t0=1.0, target_velocity=0.5,
            u_target=jnp.zeros(3),
        )
        # Arrival after |d| / v = 4 s.
        assert float(tt.times[-1]) == 5.0
        np.testing.assert_allclose(float(tt.states[-1, 6]), 3.0, rtol=1e-6)
        np.testing.assert_allclose(float(tt.states[-1, 9]), 0.5, rtol=1e-6)

    def test_keyboard_command_loop(self):
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        mpc = Mpc(
            problem, params,
            settings=MpcSettings(
                time_horizon=1.0, num_intervals=20, solver="sqp"
            ),
        )
        mpc.run(0.0, jnp.array([1.0, 0.0]))
        out = []
        keyboard_command_loop(
            mpc,
            stream=["garbage", "0.5 0 0", "q"],
            out=out,
        )
        assert any("cannot parse" in line for line in out)
        assert any("target set" in line for line in out)
        # Buffered-target semantics: the command becomes active at the next
        # solve (reference ReferenceManager BufferedValue swap).
        mpc.run(0.1, jnp.array([1.0, 0.0]))
        tt = mpc.reference_manager.target
        assert abs(float(tt.states[-1, 0]) - 1.5) < 0.2  # x0[0]=1 + 0.5
