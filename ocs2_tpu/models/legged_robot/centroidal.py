"""Full centroidal dynamics + RBD conversions for the quadruped.

Analogue of the reference's centroidal model family
(ocs2_pinocchio/ocs2_centroidal_model/include/ocs2_centroidal_model/
CentroidalModelInfo.h:47-84 — CentroidalModelType::{FullCentroidalDynamics,
SingleRigidBodyDynamics} — PinocchioCentroidalDynamics.h, and
CentroidalModelRbdConversions.h).  model.py implements the SRBD variant
(CoM pinned to the base, constant inertia); this module implements:

* a mass model with per-link point masses on the legs (base keeps its
  rotational inertia), giving a configuration-dependent CoM offset,
* the centroidal momentum matrix A(q) with h = A(q) [v_base, omega, dq]
  (the reference gets A from Pinocchio's computeCentroidalMap; here the
  momentum is assembled from link-CoM velocities and A is its exact
  velocity Jacobian — the momentum is linear in velocities, so this IS the
  matrix, obtained by one jacfwd),
* FullCentroidalDynamics: base velocities recovered from the momentum
  through A (v = A_b^{-1}(m h_n - A_j dq)), torque taken about the true CoM,
* RBD conversions: full-order generalized (q, v) <-> centroidal state
  (CentroidalModelRbdConversions::computeCentroidalStateFromRbdModel and
  the base-velocity direction).

State/input layout is identical to model.py (24/24), so every constraint,
cost, gait, and swing component composes with either dynamics unchanged.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import model
from .model import (
    GRAVITY,
    HIP_OFFSETS,
    MASS,
    NUM_LEGS,
    SHANK_LENGTH,
    THIGH_LENGTH,
    base_euler,
    base_position,
    contact_forces,
    euler_zyx_rate_matrix,
    euler_zyx_rotation,
    joint_angles,
    joint_velocities,
    normalized_ang_momentum,
)

Array = jax.Array

# -- mass model --------------------------------------------------------------
# Per-leg point masses at link CoMs; base carries the rest of the total mass
# (keeps parity with model.MASS so SRBD and full variants describe the same
# robot).  ANYmal-like distribution.
HIP_MASS = 1.5
THIGH_MASS = 1.2
SHANK_MASS = 0.3
LEG_MASS = HIP_MASS + THIGH_MASS + SHANK_MASS
BASE_MASS = MASS - NUM_LEGS * LEG_MASS
BASE_INERTIA = model.INERTIA  # rotational inertia of the base body


class MassModel(NamedTuple):
    hip: float
    thigh: float
    shank: float

    @property
    def leg(self):
        return self.hip + self.thigh + self.shank

    @property
    def base(self):
        return MASS - NUM_LEGS * self.leg


DEFAULT_MASSES = MassModel(HIP_MASS, THIGH_MASS, SHANK_MASS)
SRBD_MASSES = MassModel(0.0, 0.0, 0.0)  # all mass in the base -> SRBD limit


def _leg_link_coms_base(leg: int, q_leg: Array):
    """Link CoM positions of one leg in the BASE frame: hip (at the HAA
    mount), thigh CoM (mid-thigh), shank CoM (mid-shank).  Mirrors
    model.foot_position_base's chain."""
    haa, hfe, kfe = q_leg[0], q_leg[1], q_leg[2]
    side = model.leg_side_sign(leg)
    c, s = jnp.cos(haa), jnp.sin(haa)
    rx = jnp.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    hip_mount = jnp.asarray(HIP_OFFSETS[leg])

    def sagittal(r_thigh, r_shank):
        x_p = -r_thigh * jnp.sin(hfe) - r_shank * jnp.sin(hfe + kfe)
        z_p = -r_thigh * jnp.cos(hfe) - r_shank * jnp.cos(hfe + kfe)
        return jnp.array([x_p, side * model.HIP_LATERAL, z_p])

    p_hip = hip_mount
    p_thigh = hip_mount + rx @ sagittal(0.5 * THIGH_LENGTH, 0.0)
    p_shank = hip_mount + rx @ sagittal(THIGH_LENGTH, 0.5 * SHANK_LENGTH)
    return p_hip, p_thigh, p_shank


def com_offset_base(q_joints: Array, masses: MassModel = DEFAULT_MASSES) -> Array:
    """CoM offset from the base origin, in the base frame (the reference's
    comToBasePosition; SRBD pins this to comToBasePositionNominal)."""
    total = masses.base * jnp.zeros(3)
    q = q_joints.reshape(NUM_LEGS, 3)
    for leg in range(NUM_LEGS):
        p_hip, p_thigh, p_shank = _leg_link_coms_base(leg, q[leg])
        total = total + masses.hip * p_hip + masses.thigh * p_thigh + masses.shank * p_shank
    return total / MASS


def _momentum_world(q_joints, euler, v_base, omega, dq, masses: MassModel):
    """Centroidal momentum (h_lin, h_ang about the CoM), world frame, from
    base velocities (world linear v_base, world angular omega) and joint
    velocities.  Linear in (v_base, omega, dq)."""
    r_wb = euler_zyx_rotation(euler)
    q = q_joints.reshape(NUM_LEGS, 3)
    dql = dq.reshape(NUM_LEGS, 3)

    # Collect point masses: positions relative to base origin (world frame)
    # and velocities.
    ps = [jnp.zeros(3)]  # base CoM at base origin
    vs = [v_base]
    ms = [masses.base]
    for leg in range(NUM_LEGS):
        coms = _leg_link_coms_base(leg, q[leg])
        jacs = jax.jacfwd(lambda qq, leg=leg: jnp.stack(_leg_link_coms_base(leg, qq)))(q[leg])
        for i, m_i in enumerate((masses.hip, masses.thigh, masses.shank)):
            p_rel = r_wb @ coms[i]
            v_i = v_base + jnp.cross(omega, p_rel) + r_wb @ (jacs[i] @ dql[leg])
            ps.append(p_rel)
            vs.append(v_i)
            ms.append(m_i)

    m_arr = jnp.asarray(ms)
    p_arr = jnp.stack(ps)
    v_arr = jnp.stack(vs)
    r_com = jnp.sum(m_arr[:, None] * p_arr, axis=0) / MASS
    h_lin = jnp.sum(m_arr[:, None] * v_arr, axis=0)
    h_ang = r_wb @ (BASE_INERTIA * (r_wb.T @ omega))  # base rotational part
    h_ang = h_ang + jnp.sum(
        m_arr[:, None] * jnp.cross(p_arr - r_com[None], v_arr), axis=0
    )
    return jnp.concatenate([h_lin, h_ang])


def centroidal_momentum_matrix(
    q_joints: Array, euler: Array, masses: MassModel = DEFAULT_MASSES
) -> Array:
    """A(q) [6, 18] with h = A(q) [v_base, omega, dq] (world-frame momentum
    about the CoM) — the reference's Pinocchio computeCentroidalMap."""
    def h_of_v(v):
        return _momentum_world(
            q_joints, euler, v[0:3], v[3:6], v[6:18], masses
        )

    return jax.jacfwd(h_of_v)(jnp.zeros(18, q_joints.dtype))


def base_velocity_from_momentum(
    x: Array, dq: Array, masses: MassModel = DEFAULT_MASSES
):
    """Recover (v_base, omega) from the normalized momentum states —
    [v; w] = A_b^{-1} (m h_n - A_j dq)
    (reference CentroidalModelPinocchioMapping::getPinocchioJointVelocity)."""
    a = centroidal_momentum_matrix(joint_angles(x), base_euler(x), masses)
    h = MASS * jnp.concatenate(
        [x[0:3], x[3:6]]
    )  # reference normalizes by mass (CentroidalModelInfo)
    rhs = h - a[:, 6:18] @ dq
    # A_b is block UPPER-triangular: sum_i m_i (p_i - r_com) = 0 kills the
    # angular-momentum dependence on v_base, so
    #   omega  = I_tot(q)^{-1} rhs_ang      (3x3 SPD, fusable unrolled solve)
    #   v_base = (rhs_lin - A_b[0:3,3:6] omega) / m.
    from ...ops.smallmat import solve_psd_small

    i_tot = a[3:6, 3:6]
    omega = solve_psd_small(i_tot, rhs[3:6])
    v_base = (rhs[0:3] - a[0:3, 3:6] @ omega) / MASS
    return v_base, omega


def make_dynamics(masses: MassModel = DEFAULT_MASSES):
    """FullCentroidalDynamics flow map, same (t, x, u, p) signature and
    24/24 layout as model.dynamics (reference PinocchioCentroidalDynamics
    with CentroidalModelType::FullCentroidalDynamics)."""

    def dynamics(t, x, u, p):
        del t
        forces = contact_forces(u)
        r_wb = euler_zyx_rotation(base_euler(x))
        p_base = base_position(x)
        q = joint_angles(x).reshape(NUM_LEGS, 3)
        dq = joint_velocities(u)

        r_com = p_base + r_wb @ com_offset_base(joint_angles(x), masses)
        feet = jnp.stack(
            [
                p_base + r_wb @ model.foot_position_base(leg, q[leg])
                for leg in range(NUM_LEGS)
            ]
        )
        total_force = jnp.sum(forces, axis=0)
        torque = jnp.sum(jnp.cross(feet - r_com[None], forces), axis=0)
        dv_com = total_force / MASS - jnp.array([0.0, 0.0, GRAVITY])
        dh_ang = torque / MASS

        v_base, omega = base_velocity_from_momentum(x, dq, masses)
        deuler = euler_zyx_rate_matrix(base_euler(x)) @ omega
        return jnp.concatenate([dv_com, dh_ang, v_base, deuler, dq])

    return dynamics


dynamics_full = make_dynamics()


# -- RBD conversions (CentroidalModelRbdConversions.h) -----------------------


def centroidal_state_from_rbd(
    q_rbd: Array, v_rbd: Array, masses: MassModel = DEFAULT_MASSES
) -> Array:
    """Full-order generalized coordinates/velocities -> centroidal state.

    q_rbd [18] = [base position (3), base euler zyx (3), joints (12)]
    v_rbd [18] = [base linear velocity (world), base angular velocity
    (world), joint velocities] -> x [24]
    (reference computeCentroidalStateFromRbdModel)."""
    euler = q_rbd[3:6]
    q_j = q_rbd[6:18]
    h = _momentum_world(q_j, euler, v_rbd[0:3], v_rbd[3:6], v_rbd[6:18], masses)
    return jnp.concatenate([h / MASS, q_rbd[0:3], euler, q_j])


def rbd_state_from_centroidal(
    x: Array, u: Array, masses: MassModel = DEFAULT_MASSES
):
    """Centroidal state/input -> full-order (q_rbd [18], v_rbd [18])
    (reference computeRbdStateFromCentroidalModel)."""
    v_base, omega = base_velocity_from_momentum(x, joint_velocities(u), masses)
    q_rbd = jnp.concatenate([base_position(x), base_euler(x), joint_angles(x)])
    v_rbd = jnp.concatenate([v_base, omega, joint_velocities(u)])
    return q_rbd, v_rbd
