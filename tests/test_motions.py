"""Motion library + CSV IO + base-reference extrapolation
(ocs2_anymal_commands analogues)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models.legged_robot import model
from ocs2_tpu.models.legged_robot.motions import (
    BaseReferenceCommand,
    MotionLibrary,
    generate_extrapolated_base_reference,
    motion_to_csv,
    read_motion_csv,
)
from ocs2_tpu.mpc.mpc import ReferenceManager


def test_csv_roundtrip():
    lib = MotionLibrary()
    m = lib.motions["squat"]
    times = np.asarray(m.target.times)  # serialize on the native samples
    csv = motion_to_csv(m, times)
    m2 = read_motion_csv(csv)
    for tt in (0.0, 0.7, 1.4):
        x_a = np.asarray(m.target.state_at(np.float32(tt)))
        x_b = np.asarray(m2.target.state_at(np.float32(tt)))
        np.testing.assert_allclose(x_a, x_b, atol=2e-3)
        u_a = np.asarray(m.target.input_at(np.float32(tt)))
        u_b = np.asarray(m2.target.input_at(np.float32(tt)))
        np.testing.assert_allclose(u_a, u_b, atol=2e-3)


def test_csv_contact_flags_to_modes():
    lib = MotionLibrary()
    m = lib.motions["walk_forward"]
    times = np.linspace(0.0, m.duration, 81)
    csv = motion_to_csv(m, times)
    m2 = read_motion_csv(csv)
    # Mode sequence survives the round trip (sampled on the grid).
    for tt in times[:-1:8]:
        a = int(m.mode_schedule.mode_at_time(jnp.float32(tt + 1e-3)))
        b = int(m2.mode_schedule.mode_at_time(jnp.float32(tt + 1e-3)))
        assert a == b, (tt, a, b)


def test_library_publish_shifts_and_buffers():
    lib = MotionLibrary()
    rm = ReferenceManager(lib.motions["squat"].target)
    shifted = lib.publish("squat", rm, t0=5.0)
    assert float(shifted.target.times[0]) == pytest.approx(5.0)
    # Buffered swap semantics: applied only at pre_solver_run.
    rm.pre_solver_run(5.0, 6.0, model.default_state())
    x_ref = np.asarray(rm.target.state_at(np.float32(5.0)))
    np.testing.assert_allclose(x_ref[8], model.STAND_HEIGHT, atol=1e-5)
    # Mid-squat the height reference dips.
    x_mid = np.asarray(rm.target.state_at(np.float32(6.0)))
    assert x_mid[8] < model.STAND_HEIGHT - 0.05


def test_extrapolated_reference_straight():
    cmd = BaseReferenceCommand(heading_velocity=0.5)
    tgt = generate_extrapolated_base_reference(
        0.1, 10, 0.0, model.default_state(), cmd
    )
    xs = np.asarray(tgt.states)
    np.testing.assert_allclose(xs[-1, 6], 0.5, atol=1e-6)  # 0.5 m/s * 1 s
    np.testing.assert_allclose(xs[:, 7], 0.0, atol=1e-9)
    np.testing.assert_allclose(xs[:, 8], model.STAND_HEIGHT, atol=1e-6)


def test_extrapolated_reference_turning():
    cmd = BaseReferenceCommand(heading_velocity=0.5, yaw_rate=1.0)
    tgt = generate_extrapolated_base_reference(
        0.05, 40, 0.0, model.default_state(), cmd
    )
    xs = np.asarray(tgt.states)
    # Yaw integrates the rate; the path curves (y displacement appears).
    np.testing.assert_allclose(xs[-1, 9], 2.0, atol=1e-5)
    assert abs(xs[-1, 7]) > 0.2


def test_extrapolated_reference_terrain_height():
    ramp = lambda xy: 0.5 * xy[0]  # noqa: E731
    cmd = BaseReferenceCommand(heading_velocity=1.0)
    tgt = generate_extrapolated_base_reference(
        0.1, 10, 0.0, model.default_state(), cmd, terrain_height_fn=ramp
    )
    xs = np.asarray(tgt.states)
    np.testing.assert_allclose(
        xs[-1, 8], model.STAND_HEIGHT + 0.5 * xs[-1, 6], atol=1e-5
    )


def test_squat_motion_tracks_in_solver():
    """Integration: the squat motion drives the stance SQP solve — the base
    height follows the dipping reference."""
    import jax

    from ocs2_tpu.models.legged_robot import interface
    from ocs2_tpu.oc.time_discretization import make_time_grid
    from ocs2_tpu.solvers import sqp

    lib = MotionLibrary()
    m = lib.motions["squat"]
    grid = make_time_grid(
        0.0, 2.0, 40,
        event_times=np.asarray([]),
        mode_sequence=np.asarray([15]),  # full stance
    )
    params = interface.make_params(grid, target=m.target)
    x0 = model.default_state()
    u0 = model.weight_compensating_input(jnp.ones(4))
    sol = jax.jit(
        lambda x: sqp.solve(
            interface.make_problem(), grid, x, params,
            us_init=jnp.tile(u0[None], (40, 1)),
            settings=sqp.SqpSettings(max_iterations=10),
        )
    )(x0)
    zs = np.asarray(sol.xs[:, 8])
    ref = np.asarray(
        [m.target.state_at(np.float32(t))[8] for t in np.asarray(grid.times)]
    )
    assert np.max(np.abs(zs - ref)) < 0.05
    assert zs.min() < model.STAND_HEIGHT - 0.06  # actually squats
