"""Mobile manipulator — kinematic MPC with end-effector tracking.

Analogue of reference ocs2_robotic_examples/ocs2_mobile_manipulator:
kinematic (velocity-controlled) MPC for a wheeled base + 6-DOF arm with an
end-effector pose-tracking cost, joint-limit and self-collision constraints
(ManipulatorModelInfo; dynamics/WheelBasedMobileManipulatorDynamics.h).

State x = [base_x, base_y, base_yaw, q_arm (6)]   (nx = 9)
Input u = [v_forward, omega_yaw, dq_arm (6)]      (nu = 8)
(the reference's wheel-based base: forward velocity + yaw rate).

The arm geometry is a generic 6-DOF elbow arm (offsets roughly franka-like);
configs for other arms can swap the Chain (reference config/ per-robot dirs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import penalties as pen
from ..oc.problem import OptimalControlProblem, soft_constraint
from .kinematics import Chain, Joint, rot_axis

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

JOINT_LOWER = jnp.array([-2.9, -1.8, -2.9, -2.9, -1.8, -2.9])
JOINT_UPPER = -JOINT_LOWER
VEL_LIMIT = jnp.array([0.5, 0.8, 1.5, 1.5, 1.5, 2.0, 2.0, 2.0])  # [v, w, dq..]


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
    """Position (+ optional orientation) tracking of params['ee_target']
    (reference EndEffectorCost with PinocchioEndEffectorKinematics)."""
    pos, rot = ee_pose(x)
    target = p["ee_target"]  # [3]
    err = pos - target
    return 50.0 * jnp.sum(err**2)


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


def make_problem(constraint_mode: str = "soft") -> OptimalControlProblem:
    base = OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(ee_tracking_cost, input_cost),
        nx=NX,
        nu=NU,
    )
    if constraint_mode == "soft":
        barrier = pen.relaxed_barrier(mu=1e-2, delta=1e-3)
        return base.add(
            cost_terms=(soft_constraint(velocity_limits, barrier),),
            state_cost_terms=(soft_constraint(joint_limits, barrier, with_input=False),),
        )
    if constraint_mode == "hard":
        return base.add(
            inequality_terms=(velocity_limits,),
            state_inequality_terms=(joint_limits,),
        )
    return base


def make_params(ee_target=(1.0, 0.5, 0.8)):
    return {"ee_target": jnp.asarray(ee_target, jnp.float32)}


def home_state():
    return jnp.concatenate(
        [jnp.zeros(3), jnp.array([0.0, -0.5, 1.0, 0.0, 0.5, 0.0])]
    ).astype(jnp.float32)
