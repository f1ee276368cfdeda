"""Mobile manipulator — kinematic MPC with end-effector pose tracking,
joint/velocity limits, sphere self-collision, and optional workspace-SDF
clearance.

Analogue of reference ocs2_robotic_examples/ocs2_mobile_manipulator:
kinematic (velocity-controlled) MPC for a wheeled base + 6-DOF arm with an
end-effector pose-tracking cost (EndEffectorCost: position + orientation
error), joint-limit constraints, and sphere-approximation self-collision
(ocs2_self_collision/SelfCollisionConstraint.h:44 via
ocs2_sphere_approximation); the SDF option mirrors
ocs2_perceptive/end_effector/EndEffectorDistanceConstraint.h.

State x = [base_x, base_y, base_yaw, q_arm (6)]   (nx = 9)
Input u = [v_forward, omega_yaw, dq_arm (6)]      (nu = 8)
(the reference's wheel-based base: forward velocity + yaw rate).

The arm geometry is a generic 6-DOF elbow arm (offsets roughly franka-like);
configs for other arms can swap the Chain (reference config/ per-robot dirs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import penalties as pen
from ..oc.problem import OptimalControlProblem, soft_constraint
from .collision import SphereModel, self_collision_constraint
from .kinematics import Chain, Joint, rot_axis, rotation_error

NX = 9
NU = 8

ARM = Chain(
    joints=(
        Joint(offset=(0.2, 0.0, 0.6), axis="z"),  # shoulder pan (on base)
        Joint(offset=(0.0, 0.0, 0.1), axis="y"),  # shoulder lift
        Joint(offset=(0.0, 0.0, 0.35), axis="y"),  # elbow
        Joint(offset=(0.0, 0.0, 0.30), axis="z"),  # wrist roll
        Joint(offset=(0.0, 0.0, 0.08), axis="y"),  # wrist pitch
        Joint(offset=(0.0, 0.0, 0.06), axis="z"),  # wrist yaw
    ),
    ee_offset=(0.0, 0.0, 0.10),
)

JOINT_LOWER = np.array([-2.9, -1.8, -2.9, -2.9, -1.8, -2.9], np.float32)
JOINT_UPPER = -JOINT_LOWER
VEL_LIMIT = np.array([0.5, 0.8, 1.5, 1.5, 1.5, 2.0, 2.0, 2.0], np.float32)  # [v, w, dq..]


def ee_pose(x):
    """End-effector position/rotation in world frame."""
    base_pos = jnp.array([x[0], x[1], 0.0])
    base_rot = rot_axis(2, x[2])
    return ARM.forward(x[3:9], base_rot=base_rot, base_pos=base_pos)


def dynamics(t, x, u, p):
    del t, p
    yaw = x[2]
    dbase = jnp.array([u[0] * jnp.cos(yaw), u[0] * jnp.sin(yaw), u[1]])
    return jnp.concatenate([dbase, u[2:8]])


def ee_tracking_cost(t, x, u, p):
    """End-effector pose tracking: position error to params['ee_target'] plus
    so(3) orientation error to params['ee_target_rot'] when present
    (reference EndEffectorCost — position + orientation error via
    EndEffectorKinematics.h getOrientationError)."""
    pos, rot = ee_pose(x)
    target = p["ee_target"]  # [3]
    err = pos - target
    c = 50.0 * jnp.sum(err**2)
    if isinstance(p, dict) and "ee_target_rot" in p:
        rot_err = rotation_error(rot, p["ee_target_rot"])
        c = c + 30.0 * jnp.sum(rot_err**2)
    return c


def ee_final_cost(t, x, p):
    """Terminal EE pose cost (reference task.info `finalEndEffector`,
    ocs2_mobile_manipulator/config/*/task.info:195-198) — anchors the end of
    the horizon on the target so tracking error doesn't decay into the
    horizon tail."""
    pos, rot = ee_pose(x)
    err = pos - p["ee_target"]
    c = 50.0 * jnp.sum(err**2)
    if isinstance(p, dict) and "ee_target_rot" in p:
        rot_err = rotation_error(rot, p["ee_target_rot"])
        c = c + 30.0 * jnp.sum(rot_err**2)
    return c


def input_cost(t, x, u, p):
    del t, x, p
    return 0.5 * jnp.sum((u / VEL_LIMIT) ** 2)


def joint_limits(t, x, p):
    """h >= 0 joint position box (reference JointLimits soft constraint)."""
    del t, p
    q = x[3:9]
    return jnp.concatenate([q - JOINT_LOWER, JOINT_UPPER - q])


def velocity_limits(t, x, u, p):
    del t, x, p
    return jnp.concatenate([u + VEL_LIMIT, VEL_LIMIT - u])


# Sphere decomposition for self-collision: base body vs forearm/wrist/EE
# (reference: PinocchioSphereInterface decomposes link geometry; the
# monitored pairs mirror the reference config's collision-pair list).
# Frames from frame_poses(): 0 = world/base-footprint (identity rotation at
# the arm mount), 1..6 after each arm joint, 7 = EE.
SPHERES = SphereModel.create(
    spheres=[
        (0, (0.0, 0.0, 0.25), 0.28),   # base body
        (0, (0.25, 0.0, 0.45), 0.12),  # base top front
        (3, (0.0, 0.0, 0.15), 0.07),   # forearm (after elbow)
        (5, (0.0, 0.0, 0.05), 0.06),   # wrist
        (7, (0.0, 0.0, 0.02), 0.05),   # end effector
    ],
    pair_frames=[(0, 3), (0, 5), (0, 7)],
)


def _arm_frame_poses(x):
    base_pos = jnp.array([x[0], x[1], 0.0])
    base_rot = rot_axis(2, x[2])
    return ARM.frame_poses(x[3:9], base_rot=base_rot, base_pos=base_pos)


self_collision = self_collision_constraint(
    SPHERES, _arm_frame_poses, min_distance=0.02
)


def make_problem(
    constraint_mode: str = "soft",
    self_collision_avoidance: bool = True,
    workspace_sdf=None,
    sdf_clearance: float = 0.0,
) -> OptimalControlProblem:
    """Assemble the manipulator OCP (reference MobileManipulatorInterface):
    EE pose tracking + input cost, joint/velocity limits, sphere
    self-collision, and optionally an EE workspace-clearance constraint
    against a SignedDistanceField (EndEffectorDistanceConstraint.h)."""
    base = OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(ee_tracking_cost, input_cost),
        final_cost_terms=(ee_final_cost,),
        nx=NX,
        nu=NU,
    )
    state_ineq = []
    if self_collision_avoidance:
        state_ineq.append(self_collision)
    if workspace_sdf is not None:
        from .perceptive import ee_distance_constraint

        state_ineq.append(
            ee_distance_constraint(
                workspace_sdf,
                lambda x: ee_pose(x)[0][None, :],
                clearance=sdf_clearance,
            )
        )
    if constraint_mode == "soft":
        barrier = pen.relaxed_barrier(mu=1e-2, delta=1e-3)
        state_soft = tuple(
            soft_constraint(g, barrier, with_input=False)
            for g in [joint_limits] + state_ineq
        )
        return base.add(
            cost_terms=(soft_constraint(velocity_limits, barrier),),
            state_cost_terms=state_soft,
            # Un-integrated running soft constraints carry only ~dt/2 weight
            # at the last node; re-applying them in the final cost keeps the
            # terminal EE from trading clearance against the (equally
            # un-integrated) final pose cost.
            final_cost_terms=state_soft,
        )
    if constraint_mode == "hard":
        return base.add(
            inequality_terms=(velocity_limits,),
            state_inequality_terms=tuple([joint_limits] + state_ineq),
        )
    return base


def make_urdf_arm_problem(
    loaded,
    velocity_weight: float = 0.5,
) -> OptimalControlProblem:
    """Kinematic MPC for a fixed-base URDF-loaded arm (the reference's
    Default-arm manipulatorModelType 0, MobileManipulatorInterface.cpp with
    config/{franka,kinova,ridgeback_ur5,...}/task.info: URDF -> model, EE
    pose cost, joint position/velocity limits).

    State x = q [dof], input u = dq [dof]; EE pose tracked to
    params['ee_target'] (+ optional 'ee_target_rot') through the chain's FK.
    `loaded` is a models.urdf.LoadedChain.
    """
    chain = loaded.chain
    dof = chain.num_dof
    lower = np.asarray(loaded.lower, np.float32)
    upper = np.asarray(loaded.upper, np.float32)
    vmax = np.asarray(
        np.minimum(loaded.velocity, 1e3), np.float32
    )  # cap inf velocity limits

    def dyn(t, x, u, p):
        del t, p
        return u

    def ee_cost(t, x, u, p):
        del t, u
        pos, rot = chain.forward(x)
        c = 50.0 * jnp.sum((pos - p["ee_target"]) ** 2)
        if isinstance(p, dict) and "ee_target_rot" in p:
            c = c + 30.0 * jnp.sum(rotation_error(rot, p["ee_target_rot"]) ** 2)
        return c

    def ee_final(t, x, p):
        pos, rot = chain.forward(x)
        c = 50.0 * jnp.sum((pos - p["ee_target"]) ** 2)
        if isinstance(p, dict) and "ee_target_rot" in p:
            c = c + 30.0 * jnp.sum(rotation_error(rot, p["ee_target_rot"]) ** 2)
        return c

    def in_cost(t, x, u, p):
        del t, x, p
        return velocity_weight * jnp.sum((u / vmax) ** 2)

    def q_limits(t, x, p):
        del t, p
        return jnp.concatenate([x - lower, upper - x])

    def dq_limits(t, x, u, p):
        del t, x, p
        return jnp.concatenate([u + vmax, vmax - u])

    barrier = pen.relaxed_barrier(mu=1e-2, delta=1e-3)
    finite_q = np.all(np.isfinite(lower)) and np.all(np.isfinite(upper))
    state_soft = (
        (soft_constraint(q_limits, barrier, with_input=False),)
        if finite_q
        else ()
    )
    return OptimalControlProblem(
        dynamics=dyn,
        cost_terms=(ee_cost, in_cost, soft_constraint(dq_limits, barrier)),
        state_cost_terms=state_soft,
        final_cost_terms=(ee_final,) + state_soft,
        nx=dof,
        nu=dof,
    )


# ---------------------------------------------------------------------------
# Base-type variants over URDF arms (reference ManipulatorModelType:
# DefaultManipulatorDynamics / WheelBasedMobileManipulatorDynamics /
# FloatingArmManipulatorDynamics / FullyActuatedFloatingArmManipulatorDynamics,
# ocs2_mobile_manipulator/include/ocs2_mobile_manipulator/dynamics/*.h).
# ---------------------------------------------------------------------------

BASE_TYPES = (
    "default",
    "wheel_based",
    "floating_arm",
    "fully_actuated_floating_arm",
)


def _base_dims(base_type: str, dof: int):
    """(num base states, num base inputs, nx, nu) per variant."""
    if base_type == "default":
        return 0, 0, dof, dof
    if base_type == "wheel_based":
        return 3, 2, 3 + dof, 2 + dof
    if base_type == "floating_arm":
        # 6-DOF base pose in the state, unactuated (static platform whose
        # pose is part of the optimization state but has zero flow —
        # FloatingArmManipulatorDynamics.cpp:49-51).
        return 6, 0, 6 + dof, dof
    if base_type == "fully_actuated_floating_arm":
        # 6-DOF base pose, velocity-actuated (...cpp:51: dxdt = input).
        return 6, 6, 6 + dof, 6 + dof
    raise ValueError(f"unknown base_type {base_type!r}; one of {BASE_TYPES}")


def make_urdf_manipulator_problem(
    loaded,
    base_type: str = "default",
    velocity_weight: float = 0.5,
    base_velocity_limit: float = 0.5,
) -> OptimalControlProblem:
    """Kinematic EE-tracking MPC for a URDF arm on any of the reference's
    four base types (MobileManipulatorInterface + dynamics/*.h).

    State/input layouts (arm dof = d):
      default:                     x = q[d],                u = dq[d]
      wheel_based:                 x = [xy, yaw, q],        u = [v, w, dq]
      floating_arm:                x = [pos(3), euler_zyx(3), q],  u = dq
      fully_actuated_floating_arm: x = [pos(3), euler_zyx(3), q],
                                   u = [v_base(3), w_euler_rates(3), dq]
    """
    chain = loaded.chain
    dof = chain.num_dof
    nb, nbu, nx, nu = _base_dims(base_type, dof)
    lower = np.asarray(loaded.lower, np.float32)
    upper = np.asarray(loaded.upper, np.float32)
    vmax_arm = np.asarray(np.minimum(loaded.velocity, 1e3), np.float32)
    if base_type == "wheel_based":
        vmax = np.concatenate(
            [np.array([base_velocity_limit, 1.0], np.float32), vmax_arm]
        )
    elif base_type == "fully_actuated_floating_arm":
        vmax = np.concatenate([np.full(6, base_velocity_limit, np.float32), vmax_arm])
    else:
        vmax = vmax_arm

    def base_pose(x):
        """(base_rot, base_pos) world transform of the arm mount."""
        if base_type == "default":
            return jnp.eye(3), jnp.zeros(3)
        if base_type == "wheel_based":
            return rot_axis(2, x[2]), jnp.array([x[0], x[1], 0.0])
        # floating variants: position + euler zyx.
        yaw, pitch, roll = x[3], x[4], x[5]
        rot = rot_axis(2, yaw) @ rot_axis(1, pitch) @ rot_axis(0, roll)
        return rot, x[0:3]

    def arm_q(x):
        return x[nb:]

    def ee(x):
        rot, pos = base_pose(x)
        return chain.forward(arm_q(x), base_rot=rot, base_pos=pos)

    def dyn(t, x, u, p):
        del t, p
        if base_type == "default":
            return u
        if base_type == "wheel_based":
            yaw = x[2]
            dbase = jnp.array([u[0] * jnp.cos(yaw), u[0] * jnp.sin(yaw), u[1]])
            return jnp.concatenate([dbase, u[2:]])
        if base_type == "floating_arm":
            return jnp.concatenate([jnp.zeros(6, x.dtype), u])
        return u  # fully actuated: dxdt = input

    def ee_cost_xu(t, x, u, p):
        del t, u
        pos, rot = ee(x)
        c = 50.0 * jnp.sum((pos - p["ee_target"]) ** 2)
        if isinstance(p, dict) and "ee_target_rot" in p:
            c = c + 30.0 * jnp.sum(rotation_error(rot, p["ee_target_rot"]) ** 2)
        return c

    def ee_final(t, x, p):
        return ee_cost_xu(t, x, None, p)

    def in_cost(t, x, u, p):
        del t, x, p
        return velocity_weight * jnp.sum((u / vmax) ** 2)

    def q_limits(t, x, p):
        del t, p
        q = arm_q(x)
        return jnp.concatenate([q - lower, upper - q])

    def dq_limits(t, x, u, p):
        del t, x, p
        return jnp.concatenate([u + vmax, vmax - u])

    barrier = pen.relaxed_barrier(mu=1e-2, delta=1e-3)
    finite_q = np.all(np.isfinite(lower)) and np.all(np.isfinite(upper))
    state_soft = (
        (soft_constraint(q_limits, barrier, with_input=False),)
        if finite_q
        else ()
    )
    return OptimalControlProblem(
        dynamics=dyn,
        cost_terms=(ee_cost_xu, in_cost, soft_constraint(dq_limits, barrier)),
        state_cost_terms=state_soft,
        final_cost_terms=(ee_final,) + state_soft,
        nx=nx,
        nu=nu,
    )


def variant_home_state(loaded, base_type: str, base_pose=None, q_home=None):
    """Home state for a base variant; base_pose = [pos(3), euler_zyx(3)] for
    the floating variants.  ``q_home`` overrides the default joint home
    (limit midpoints) — pass a non-singular configuration for arms whose
    midpoint is a kinematic singularity (e.g. a fully stretched UR5)."""
    dof = loaded.chain.num_dof
    nb, _, _, _ = _base_dims(base_type, dof)
    if q_home is not None:
        q_home = jnp.asarray(q_home, jnp.float32)
    else:
        q_home = jnp.asarray(
            np.where(
                np.isfinite(loaded.lower) & np.isfinite(loaded.upper),
                0.5 * (np.asarray(loaded.lower) + np.asarray(loaded.upper)),
                0.0,
            ),
            jnp.float32,
        )
    base = jnp.zeros(nb, jnp.float32)
    if base_pose is not None and nb == 6:
        base = jnp.asarray(base_pose, jnp.float32)
    return jnp.concatenate([base, q_home])


def make_params(ee_target=(1.0, 0.5, 0.8), ee_target_rot=None):
    p = {"ee_target": jnp.asarray(ee_target, jnp.float32)}
    if ee_target_rot is not None:
        p["ee_target_rot"] = jnp.asarray(ee_target_rot, jnp.float32)
    return p


def home_state():
    return jnp.concatenate(
        [jnp.zeros(3), jnp.array([0.0, -0.5, 1.0, 0.0, 0.5, 0.0])]
    ).astype(jnp.float32)
