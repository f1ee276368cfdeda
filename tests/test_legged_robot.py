"""Legged-robot tests: kinematics, gait expansion, swing planning, standing
and trotting solves (mirrors reference ocs2_legged_robot/test constraint and
interface tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.core.reference import TargetTrajectories
from ocs2_tpu.models.legged_robot import interface, model
from ocs2_tpu.models.legged_robot.gait import (
    GaitSchedule,
    contact_flags,
    mode_number,
    stance_gait,
    trot_gait,
)
from ocs2_tpu.models.legged_robot.swing import plan_swing_references
from ocs2_tpu.oc.time_discretization import make_time_grid
from ocs2_tpu.solvers import sqp


class TestModel:
    def test_standing_feet_on_ground(self):
        x = model.default_state()
        feet = model.foot_positions_world(x)
        assert feet.shape == (4, 3)
        # Feet near the ground plane for the default stance.
        assert np.all(np.abs(np.asarray(feet[:, 2])) < 0.05), feet[:, 2]

    def test_foot_velocity_zero_at_rest(self):
        x = model.default_state()
        u = jnp.zeros(model.NU)
        v = model.foot_velocities_world(x, u)
        assert np.allclose(v, 0.0, atol=1e-6)

    def test_weight_compensation_holds_com(self):
        x = model.default_state()
        u = model.weight_compensating_input(jnp.ones(4))
        dx = model.dynamics(0.0, x, u, {})
        # dv_com = 0 under gravity compensation.
        assert np.allclose(dx[0:3], 0.0, atol=1e-4), dx[0:3]

    def test_mode_encoding_roundtrip(self):
        for flags in ([1, 1, 1, 1], [1, 0, 0, 1], [0, 0, 0, 0], [1, 0, 1, 0]):
            m = mode_number(flags)
            decoded = contact_flags(jnp.asarray(m, jnp.int32))
            assert np.allclose(decoded, flags)


class TestGait:
    def test_trot_schedule_alternates(self):
        gs = GaitSchedule(trot_gait(0.7))
        ms = gs.mode_schedule(0.0, 1.4)
        events = np.asarray(ms.event_times)
        valid = events[np.isfinite(events)]
        assert len(valid) >= 3  # two cycles worth of switches
        modes = np.asarray(ms.mode_sequence)[: len(valid) + 1]
        assert modes[0] != modes[1]  # alternating diagonals

    def test_gait_change_at_boundary(self):
        gs = GaitSchedule(stance_gait())
        gs.set_template(trot_gait(0.7))
        ms = gs.mode_schedule(0.0, 1.0)
        assert int(np.sum(np.isfinite(np.asarray(ms.event_times)))) >= 1

    def test_swing_plan_zero_in_stance(self):
        grid = make_time_grid(0.0, 1.0, 20, mode_sequence=[15])
        swing = plan_swing_references(np.asarray(grid.times), np.asarray(grid.modes))
        assert np.allclose(swing.vz, 0.0)
        assert np.allclose(swing.z, 0.0)

    def test_swing_plan_apex_midway(self):
        gs = GaitSchedule(trot_gait(0.8))
        ms = gs.mode_schedule(0.0, 0.8)
        grid = make_time_grid(
            0.0, 0.8, 32,
            event_times=np.asarray(ms.event_times),
            mode_sequence=np.asarray(ms.mode_sequence),
        )
        swing = plan_swing_references(
            np.asarray(grid.times), np.asarray(grid.modes), swing_height=0.1
        )
        assert float(jnp.max(swing.z)) > 0.05  # lifts toward apex
        assert float(jnp.max(jnp.abs(swing.vz))) > 0.1


def _solve(grid, params, us_init, max_iterations=15):
    problem = interface.make_problem()
    st = sqp.SqpSettings(max_iterations=max_iterations, integrator="rk2")
    return jax.jit(
        lambda x: sqp.solve(problem, grid, x, params, us_init=us_init, settings=st)
    )(model.default_state())


class TestSolve:
    def test_standing(self):
        grid = make_time_grid(0.0, 1.0, 32, mode_sequence=[15])
        params = interface.make_params(grid)
        u0 = model.weight_compensating_input(jnp.ones(4))
        sol = _solve(grid, params, jnp.tile(u0[None], (32, 1)))
        assert bool(sol.converged)
        # Holds height and the stance forces compensate gravity.
        assert abs(float(sol.xs[-1, 8]) - model.STAND_HEIGHT) < 1e-2
        fz = np.asarray(sol.us[0, :12]).reshape(4, 3)[:, 2]
        assert np.allclose(fz, model.MASS * model.GRAVITY / 4, rtol=0.05)
        assert float(sol.performance.equality_constraints_sse) < 1e-6

    def test_trot_tracks_forward_velocity(self):
        gs = GaitSchedule(trot_gait(0.7))
        ms = gs.mode_schedule(0.0, 1.0)
        grid = make_time_grid(
            0.0, 1.0, 48,
            event_times=np.asarray(ms.event_times),
            mode_sequence=np.asarray(ms.mode_sequence),
        )
        u0 = model.weight_compensating_input(jnp.ones(4))
        x_t = model.default_state().at[0].set(0.5)  # 0.5 m/s forward
        tt = TargetTrajectories.create(
            jnp.array([0.0, 1.0]),
            jnp.stack([x_t, x_t.at[6].set(0.5)]),
            jnp.stack([u0, u0]),
        )
        params = dict(interface.make_params(grid), target=tt)
        sol = _solve(grid, params, jnp.tile(u0[None], (48, 1)))
        # Walks forward, keeps height, tiny defects/constraint violation.
        assert float(sol.xs[-1, 6]) > 0.35, sol.xs[-1, 6]
        assert abs(float(sol.xs[-1, 8]) - model.STAND_HEIGHT) < 0.05
        assert float(sol.performance.dynamics_violation_sse) < 1e-6
        assert float(sol.performance.equality_constraints_sse) < 1e-4
        # Swing feet carry no force: check a node in the first swing phase.
        modes = np.asarray(grid.modes)
        k = next(i for i, m in enumerate(modes[:-1]) if m != 15)
        flags = np.array([(int(modes[k]) >> i) & 1 for i in range(4)])
        forces = np.asarray(sol.us[k, :12]).reshape(4, 3)
        swing_force = np.abs(forces[flags == 0]).max() if (flags == 0).any() else 0.0
        assert swing_force < 1e-3, forces
