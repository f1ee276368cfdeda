"""Mobile-manipulator base-type variants: EE-tracking convergence per base
type over the URDF zoo (reference ocs2_mobile_manipulator dynamics/*.h +
config/{franka,kinova,...} robot configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models import mobile_manipulator as mm
from ocs2_tpu.models.urdf import asset_path, chain_from_urdf
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import sqp


@pytest.fixture(scope="module")
def franka():
    return chain_from_urdf(
        open(asset_path("franka_panda.urdf")).read(),
        "root",
        "panda_hand_tcp",
        remove_joints=("panda_finger_joint1", "panda_finger_joint2"),
    )


@pytest.fixture(scope="module")
def ur5():
    return chain_from_urdf(
        open(asset_path("ur5.urdf")).read(), "base_link", "ee_link"
    )


def _reachable_target(loaded, base_type, x0):
    """EE target displaced from the home EE pose (stays in the workspace)."""
    problem = mm.make_urdf_manipulator_problem(loaded, base_type=base_type)
    nb, _, _, _ = mm._base_dims(base_type, loaded.chain.num_dof)
    pos0, _ = loaded.chain.forward(np.asarray(x0)[nb:])
    return np.asarray(pos0) + np.array([0.15, 0.1, -0.1], np.float32), problem


@pytest.mark.parametrize("base_type", mm.BASE_TYPES)
def test_variant_converges_franka(franka, base_type):
    x0 = mm.variant_home_state(franka, base_type)
    target, problem = _reachable_target(franka, base_type, x0)
    if base_type in ("wheel_based",):
        # Base displaces the EE frame; target relative to arm-mount FK is fine
        # (base starts at the origin with identity yaw).
        pass
    grid = uniform_grid(0.0, 2.0, 40)
    params = mm.make_params(ee_target=tuple(np.asarray(target, np.float64)))
    st = sqp.SqpSettings(max_iterations=25, integrator="rk4")
    sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, settings=st))(x0)
    assert bool(jnp.all(jnp.isfinite(sol.xs)))
    # EE reaches the target.
    nb, _, nx, nu = mm._base_dims(base_type, franka.chain.num_dof)
    assert sol.xs.shape[-1] == nx and sol.us.shape[-1] == nu

    def ee_of(x):
        if base_type == "default":
            rot, pos = jnp.eye(3), jnp.zeros(3)
        elif base_type == "wheel_based":
            from ocs2_tpu.models.kinematics import rot_axis

            rot, pos = rot_axis(2, x[2]), jnp.array([x[0], x[1], 0.0])
        else:
            from ocs2_tpu.models.kinematics import rot_axis

            rot = rot_axis(2, x[3]) @ rot_axis(1, x[4]) @ rot_axis(0, x[5])
            pos = x[0:3]
        return franka.chain.forward(x[nb:], base_rot=rot, base_pos=pos)[0]

    err = np.asarray(ee_of(sol.xs[-1])) - target
    assert np.linalg.norm(err) < 0.03, (base_type, err)


def test_floating_arm_base_is_static(franka):
    """FloatingArm: the base pose must not move (zero flow on the base
    states, FloatingArmManipulatorDynamics.cpp:49-51)."""
    base_pose = np.array([0.2, -0.1, 0.5, 0.3, 0.0, 0.0], np.float32)
    x0 = mm.variant_home_state(franka, "floating_arm", base_pose=base_pose)
    target, problem = _reachable_target(franka, "floating_arm", x0)
    # Move target into the displaced base's workspace.
    target = target + base_pose[:3]
    grid = uniform_grid(0.0, 1.5, 30)
    params = mm.make_params(ee_target=tuple(np.asarray(target, np.float64)))
    st = sqp.SqpSettings(max_iterations=20, integrator="rk4")
    sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, settings=st))(x0)
    np.testing.assert_allclose(
        np.asarray(sol.xs[:, 0:6]),
        np.tile(base_pose, (sol.xs.shape[0], 1)),
        atol=1e-5,
    )


def test_fully_actuated_base_moves_to_far_target(ur5):
    """FullyActuatedFloatingArm: a target far outside the arm's reach is
    attainable by translating the base."""
    # Canonical elbow-up UR5 home (the all-zero midpoint is a fully
    # stretched singular configuration).
    x0 = mm.variant_home_state(
        ur5,
        "fully_actuated_floating_arm",
        q_home=np.array([0.0, -1.2, 1.6, -0.4, 1.5708, 0.0]),
    )
    problem = mm.make_urdf_manipulator_problem(
        ur5, base_type="fully_actuated_floating_arm", base_velocity_limit=2.0
    )
    target = np.array([2.0, 1.0, 0.8], np.float32)  # ~2.4 m away
    grid = uniform_grid(0.0, 3.0, 45)
    params = mm.make_params(ee_target=tuple(np.asarray(target, np.float64)))
    st = sqp.SqpSettings(max_iterations=80, integrator="rk4")
    sol = jax.jit(lambda x: sqp.solve(problem, grid, x, params, settings=st))(x0)
    assert float(jnp.linalg.norm(sol.xs[-1, 0:3])) > 0.5  # base moved
    from ocs2_tpu.models.kinematics import rot_axis

    xf = sol.xs[-1]
    rot = rot_axis(2, xf[3]) @ rot_axis(1, xf[4]) @ rot_axis(0, xf[5])
    pos, _ = ur5.chain.forward(xf[6:], base_rot=rot, base_pos=xf[0:3])
    assert float(jnp.linalg.norm(pos - target)) < 0.05
