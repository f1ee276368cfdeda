"""Quadruped centroidal model (ANYmal-class): state/input layout, leg
kinematics, and single-rigid-body centroidal dynamics.

Analogue of the reference legged-robot model stack:
* state/input layout and centroidal dynamics:
  ocs2_pinocchio/ocs2_centroidal_model (CentroidalModelInfo.h:47-84,
  PinocchioCentroidalDynamics.h — SingleRigidBodyDynamics variant),
* leg kinematics: ocs2_robotic_examples/ocs2_legged_robot +
  Pinocchio URDF chains, here explicit 3-DOF (HAA/HFE/KFE) chains in JAX.

State  x (24) = [ h_com/m (6: v_com, normalized angular momentum),
                  base pose (6: position, euler zyx),
                  joint angles (12: LF RF LH RH x (HAA HFE KFE)) ]
Input  u (24) = [ contact forces (12: 3 per foot), joint velocities (12) ]
matching the reference's 24-state/24-input ANYmal centroidal setup
(LeggedRobotInterface.h:56, task.info model dims).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NX = 24
NU = 24
NUM_LEGS = 4
NUM_JOINTS = 12

MASS = 30.0
GRAVITY = 9.81
# SRBD rotational inertia about the CoM (body frame), ANYmal-like.
INERTIA = np.array([1.0, 2.1, 2.2], np.float32)

# Hip (HAA) mounting points in the base frame: LF, RF, LH, RH.
HIP_OFFSETS = np.array(
    [
        [0.3, 0.2, 0.0],
        [0.3, -0.2, 0.0],
        [-0.3, 0.2, 0.0],
        [-0.3, -0.2, 0.0],
    ],
    np.float32,
)
THIGH_LENGTH = 0.25
SHANK_LENGTH = 0.33
HIP_LATERAL = 0.08  # HAA to leg plane offset (toward body side sign)

# Default standing configuration (x-shaped: knees inward), per leg
# (HAA, HFE, KFE).
DEFAULT_JOINTS = np.array(
    [
        [0.0, 0.4, -0.8],
        [0.0, 0.4, -0.8],
        [0.0, -0.4, 0.8],
        [0.0, -0.4, 0.8],
    ],
    np.float32,
).reshape(-1)
# Kinematically consistent with DEFAULT_JOINTS: (thigh + shank)*cos(0.4) so
# the default stance puts the feet exactly on the ground plane (terrain
# constraints depend on this; a mismatch makes every stance foot hover).
STAND_HEIGHT = float((THIGH_LENGTH + SHANK_LENGTH) * np.cos(0.4))


def leg_side_sign(leg: int) -> float:
    """+1 for left legs (LF, LH), -1 for right (RF, RH)."""
    return 1.0 if leg in (0, 2) else -1.0


def foot_position_base(leg: int, q_leg: Array) -> Array:
    """Foot position in the base frame for leg's (HAA, HFE, KFE) angles.

    Chain: hip offset -> HAA rotation about x -> lateral offset -> HFE about
    y -> thigh -> KFE about y -> shank (replaces Pinocchio FK for the foot
    frames; differentiable, vmapped over legs by callers).
    """
    haa, hfe, kfe = q_leg[0], q_leg[1], q_leg[2]
    side = leg_side_sign(leg)
    # Position in the leg (sagittal) plane after HFE/KFE.
    x_p = -THIGH_LENGTH * jnp.sin(hfe) - SHANK_LENGTH * jnp.sin(hfe + kfe)
    z_p = -THIGH_LENGTH * jnp.cos(hfe) - SHANK_LENGTH * jnp.cos(hfe + kfe)
    p_leg = jnp.array([x_p, side * HIP_LATERAL, z_p])
    # HAA roll about x.
    c, s = jnp.cos(haa), jnp.sin(haa)
    rx = jnp.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    return HIP_OFFSETS[leg] + rx @ p_leg


def euler_zyx_rotation(euler: Array) -> Array:
    yaw, pitch, roll = euler[0], euler[1], euler[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return rz @ ry @ rx


def euler_zyx_rate_matrix(euler: Array) -> Array:
    """Body angular velocity -> ZYX euler rates."""
    pitch, roll = euler[1], euler[2]
    cp = jnp.maximum(jnp.cos(pitch), 1e-3)
    sp = jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    return jnp.array(
        [
            [0.0, sr / cp, cr / cp],
            [0.0, cr, -sr],
            [1.0, sr * sp / cp, cr * sp / cp],
        ]
    )


# -- state accessors (CentroidalModelInfo layout) ---------------------------
def com_velocity(x):
    return x[0:3]


def normalized_ang_momentum(x):
    return x[3:6]


def base_position(x):
    return x[6:9]


def base_euler(x):
    return x[9:12]


def joint_angles(x):
    return x[12:24]


def contact_forces(u):
    return u[0:12].reshape(NUM_LEGS, 3)


def joint_velocities(u):
    return u[12:24]


def foot_positions_world(x) -> Array:
    """[4, 3] foot positions in world frame."""
    r_wb = euler_zyx_rotation(base_euler(x))
    p_base = base_position(x)
    q = joint_angles(x).reshape(NUM_LEGS, 3)

    def one(leg):
        return p_base + r_wb @ foot_position_base(leg, q[leg])

    return jnp.stack([one(leg) for leg in range(NUM_LEGS)])


def foot_velocities_world(x, u) -> Array:
    """[4, 3] world-frame foot velocities.

    v_foot = v_base + omega x (R p_rel) + R J_leg dq_leg; base velocity is
    taken from the centroidal states (SRBD: v_base ~= v_com), angular
    velocity from the normalized angular momentum.
    """
    r_wb = euler_zyx_rotation(base_euler(x))
    v_base = com_velocity(x)
    omega = MASS * normalized_ang_momentum(x) / INERTIA  # I w = m * h_ang_n
    q = joint_angles(x).reshape(NUM_LEGS, 3)
    dq = joint_velocities(u).reshape(NUM_LEGS, 3)

    def one(leg):
        p_rel = foot_position_base(leg, q[leg])
        jac = jax.jacfwd(lambda qq: foot_position_base(leg, qq))(q[leg])
        return v_base + jnp.cross(omega, r_wb @ p_rel) + r_wb @ (jac @ dq[leg])

    return jnp.stack([one(leg) for leg in range(NUM_LEGS)])


def dynamics(t, x, u, p):
    """SRBD centroidal dynamics (reference PinocchioCentroidalDynamics with
    CentroidalModelType::SingleRigidBodyDynamics)."""
    del t
    forces = contact_forces(u)  # [4, 3] world frame
    r_wb = euler_zyx_rotation(base_euler(x))
    p_base = base_position(x)
    q = joint_angles(x).reshape(NUM_LEGS, 3)

    # CoM assumed at the base origin (SRBD).
    feet = jnp.stack(
        [p_base + r_wb @ foot_position_base(leg, q[leg]) for leg in range(NUM_LEGS)]
    )
    total_force = jnp.sum(forces, axis=0)
    torque = jnp.sum(jnp.cross(feet - p_base, forces), axis=0)

    dv_com = total_force / MASS - jnp.array([0.0, 0.0, GRAVITY])
    dh_ang = torque / MASS  # normalized angular momentum rate

    omega = MASS * normalized_ang_momentum(x) / INERTIA
    deuler = euler_zyx_rate_matrix(base_euler(x)) @ omega
    dp_base = com_velocity(x)
    dq_joints = joint_velocities(u)
    return jnp.concatenate([dv_com, dh_ang, dp_base, deuler, dq_joints])


def default_state() -> Array:
    x = jnp.zeros(NX)
    x = x.at[8].set(STAND_HEIGHT)
    x = x.at[12:24].set(DEFAULT_JOINTS)
    return x


def weight_compensating_input(contact_flags: Array) -> Array:
    """Gravity-compensating contact forces split over stance legs
    (reference LeggedRobotInterface initializer)."""
    n_stance = jnp.maximum(jnp.sum(contact_flags), 1.0)
    fz = MASS * GRAVITY / n_stance
    forces = jnp.zeros((NUM_LEGS, 3))
    forces = forces.at[:, 2].set(fz * contact_flags)
    return jnp.concatenate([forces.reshape(-1), jnp.zeros(NUM_JOINTS)])
