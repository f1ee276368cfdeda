"""Motion-tracking cost, torque approximation, torque-limit and
collision-avoidance soft constraints for the quadruped.

Analogues of the perceptive-anymal cost stack
(ocs2_switched_model_interface/cost/):
* MotionTrackingCost.h — Gauss-Newton cost over weighted residuals of base
  pose/twist, joint position/velocity, foot position/velocity, and contact
  force errors (Weights struct defaults reproduced below),
* core/TorqueApproximation.h — tau = J(q)' f (leg dynamics neglected),
* TorqueLimitsSoftConstraint.h — double-sided relaxed-barrier penalty
  -tau_max < tau < tau_max,
* CollisionAvoidanceCost.h — relaxed-barrier penalty on collision-sphere
  clearance (knees + feet vs. the terrain height field; Gauss-Newton PSD
  quadratization via the shared ResidualGaussNewton/soft-constraint path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core import penalties as pen
from ...oc.problem import ResidualGaussNewtonCost, soft_constraint
from . import model
from .model import (
    NUM_LEGS,
    base_euler,
    base_position,
    contact_forces,
    euler_zyx_rotation,
    foot_positions_world,
    foot_velocities_world,
    joint_angles,
    joint_velocities,
)

Array = jax.Array

# Reference MotionTrackingCost::Weights defaults (MotionTrackingCost.h:27-38).
DEFAULT_WEIGHTS = {
    "euler": (100.0, 200.0, 200.0),
    "base_position": (1000.0, 1000.0, 1500.0),
    "angular_velocity": (5.0, 10.0, 10.0),
    "linear_velocity": (15.0, 15.0, 30.0),
    "joint_position": (2.0, 2.0, 1.0),
    "foot_position": (60.0, 60.0, 60.0),
    "joint_velocity": (0.02, 0.02, 0.01),
    "foot_velocity": (1.0, 1.0, 1.0),
    "contact_force": (0.001, 0.001, 0.001),
}


def _weight_vector(weights: dict) -> np.ndarray:
    w = dict(DEFAULT_WEIGHTS, **(weights or {}))
    per_leg = lambda key: np.tile(np.asarray(w[key], np.float32), NUM_LEGS)  # noqa: E731
    return np.concatenate(
        [
            np.asarray(w["euler"], np.float32),
            np.asarray(w["base_position"], np.float32),
            np.asarray(w["angular_velocity"], np.float32),
            np.asarray(w["linear_velocity"], np.float32),
            per_leg("joint_position"),
            per_leg("foot_position"),
            per_leg("joint_velocity"),
            per_leg("foot_velocity"),
            per_leg("contact_force"),
        ]
    )


def motion_tracking_residual(t, x, u, p):
    """[72] residual: state/input tracking errors in the reference's order
    (MotionTrackingCost::costVectorFunction).  Foot position/velocity
    references come from params keys ``mt_foot_pos_ref``/``mt_foot_vel_ref``
    (injected per-node by a reference manager / swing planner, the analogue
    of getParameters reading the SwingTrajectoryPlanner) and default to the
    FK of the target state / zero velocity."""
    target = p["target"]
    x_ref = target.state_at(t)
    u_ref = target.input_at(t)
    foot_pos_ref = p.get("mt_foot_pos_ref")
    if foot_pos_ref is None:
        foot_pos_ref = foot_positions_world(x_ref)
    foot_vel_ref = p.get("mt_foot_vel_ref")
    if foot_vel_ref is None:
        foot_vel_ref = jnp.zeros((NUM_LEGS, 3), x.dtype)
    return jnp.concatenate(
        [
            base_euler(x) - base_euler(x_ref),
            base_position(x) - base_position(x_ref),
            x[3:6] - x_ref[3:6],
            x[0:3] - x_ref[0:3],
            joint_angles(x) - joint_angles(x_ref),
            (foot_positions_world(x) - foot_pos_ref).reshape(-1),
            joint_velocities(u) - joint_velocities(u_ref),
            (foot_velocities_world(x, u) - foot_vel_ref).reshape(-1),
            (contact_forces(u) - contact_forces(u_ref)).reshape(-1),
        ]
    )


def motion_tracking_cost(weights: dict | None = None):
    """The MotionTrackingCost term (state-input, Gauss-Newton PSD)."""
    return ResidualGaussNewtonCost(
        motion_tracking_residual, _weight_vector(weights or {})
    )


# ---------------------------------------------------------------------------
# Torque approximation + limits.
# ---------------------------------------------------------------------------


def torque_approximation(x, u) -> Array:
    """[12] joint torques tau = -J(q)' R_wb' f_world per leg (reference
    torqueApproximation, core/TorqueApproximation.h — contact forces mapped
    through the foot Jacobian, leg dynamics neglected; sign: the actuators
    oppose the reaction of pressing into the ground)."""
    q = joint_angles(x).reshape(NUM_LEGS, 3)
    r_bw = euler_zyx_rotation(base_euler(x)).T
    f = contact_forces(u)

    def leg_tau(leg):
        jac = jax.jacfwd(lambda qq: model.foot_position_base(leg, qq))(q[leg])
        return -jac.T @ (r_bw @ f[leg])

    return jnp.concatenate([leg_tau(leg) for leg in range(NUM_LEGS)])


DEFAULT_TORQUE_LIMITS = np.full(12, 80.0, np.float32)  # ANYmal-class Nm


def make_torque_limits_soft(
    limits=DEFAULT_TORQUE_LIMITS, mu: float = 0.1, delta: float = 5.0
):
    """TorqueLimitsSoftConstraint: relaxed-barrier on the double-sided rows
    [tau_max - tau; tau + tau_max] >= 0 (TorqueLimitsSoftConstraint.h:19)."""
    limits = np.asarray(limits, np.float32)

    def rows(t, x, u, p):
        del t, p
        tau = torque_approximation(x, u)
        return jnp.concatenate([limits - tau, tau + limits])

    return soft_constraint(rows, pen.relaxed_barrier(mu=mu, delta=delta))


# ---------------------------------------------------------------------------
# Collision avoidance (knee/foot spheres vs terrain clearance).
# ---------------------------------------------------------------------------

KNEE_RADIUS = 0.06
FOOT_RADIUS = 0.02


def _knee_positions_world(x) -> Array:
    """[4, 3] knee (HFE->KFE junction) world positions."""
    r_wb = euler_zyx_rotation(base_euler(x))
    p_base = base_position(x)
    q = joint_angles(x).reshape(NUM_LEGS, 3)

    def one(leg):
        haa, hfe = q[leg, 0], q[leg, 1]
        side = model.leg_side_sign(leg)
        p_leg = jnp.array(
            [
                -model.THIGH_LENGTH * jnp.sin(hfe),
                side * model.HIP_LATERAL,
                -model.THIGH_LENGTH * jnp.cos(hfe),
            ]
        )
        c, s = jnp.cos(haa), jnp.sin(haa)
        rx = jnp.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
        return p_base + r_wb @ (jnp.asarray(model.HIP_OFFSETS[leg]) + rx @ p_leg)

    return jnp.stack([one(leg) for leg in range(NUM_LEGS)])


def collision_clearance(t, x, p):
    """[4] knee-sphere clearances above the terrain (>= 0 feasible).  Terrain
    height from the segmented-planes elevation sample grid when present
    (params 'em_heights'/'em_origin'/'em_res' — bilinear), else flat ground
    z = 0.  Feet are excluded: stance feet legitimately touch the terrain
    (the reference's sphere set likewise covers knees/shanks,
    CollisionAvoidanceCost.h + SwitchedModelPrecomputation spheres)."""
    del t
    knees = _knee_positions_world(x)
    heights = p.get("em_heights")
    if heights is None:
        terrain_z = jnp.zeros((NUM_LEGS,), x.dtype)
    else:
        origin = p["em_origin"]
        res = p["em_res"]
        grid = jnp.asarray(heights)
        ij = (knees[:, :2] - origin) / res
        i0 = jnp.clip(jnp.floor(ij).astype(jnp.int32), 0, jnp.asarray(grid.shape)[:2] - 2)
        frac = ij - i0
        g = lambda di, dj: grid[i0[:, 0] + di, i0[:, 1] + dj]  # noqa: E731
        terrain_z = (
            g(0, 0) * (1 - frac[:, 0]) * (1 - frac[:, 1])
            + g(1, 0) * frac[:, 0] * (1 - frac[:, 1])
            + g(0, 1) * (1 - frac[:, 0]) * frac[:, 1]
            + g(1, 1) * frac[:, 0] * frac[:, 1]
        )
    return knees[:, 2] - terrain_z - KNEE_RADIUS


def make_collision_avoidance_cost(mu: float = 0.5, delta: float = 0.05):
    """CollisionAvoidanceCost: state-only relaxed-barrier on sphere
    clearance (CollisionAvoidanceCost.h:21)."""
    return soft_constraint(
        collision_clearance, pen.relaxed_barrier(mu=mu, delta=delta),
        with_input=False,
    )
