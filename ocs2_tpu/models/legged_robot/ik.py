"""Analytic per-leg inverse kinematics for the quadruped.

Analogue of the reference's closed-form leg IK
(ocs2_switched_model_interface/analytical_inverse_kinematics/
AnalyticalInverseKinematics.h + LegInverseKinematicParameters.h:
getLimbJointPositionsFromPositionBaseToFootInBaseFrame).  The repo's leg
chain (model.foot_position_base) is hip offset -> HAA roll about x ->
lateral offset -> HFE/KFE pitch about y -> thigh/shank, so the closed form
decomposes into a roll solve in the hip's y-z plane followed by planar 2R
in the sagittal plane.  Fully jittable/vmappable (used per-node on device);
the knee convention (front legs knee-backward, hind knee-forward) matches
model.DEFAULT_JOINTS.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import model
from .model import HIP_LATERAL, HIP_OFFSETS, NUM_LEGS, SHANK_LENGTH, THIGH_LENGTH

Array = jax.Array

# Knee bend sign per leg (LF RF LH RH): KFE<0 in front, >0 behind.
KNEE_SIGN = (-1.0, -1.0, 1.0, 1.0)


def leg_ik(leg: int, p_foot_base: Array) -> Array:
    """(HAA, HFE, KFE) reaching p_foot_base (foot position in the BASE
    frame).  Targets outside the workspace are clamped to the reachable
    sphere (reference: limbs saturate at full extension)."""
    rel = p_foot_base - jnp.asarray(HIP_OFFSETS[leg])
    side = model.leg_side_sign(leg)
    x, y, z = rel[0], rel[1], rel[2]

    # -- HAA roll: rotate (y, z) so the lateral offset is side*HIP_LATERAL.
    r_sq = y * y + z * z
    zp_sq = jnp.maximum(r_sq - HIP_LATERAL**2, 1e-10)
    z_p = -jnp.sqrt(zp_sq)  # leg extends downward
    # (y + i z) = e^{i haa} (side*L + i z_p)
    haa = jnp.arctan2(z, y) - jnp.arctan2(z_p, side * HIP_LATERAL)
    # wrap to [-pi, pi]
    haa = jnp.arctan2(jnp.sin(haa), jnp.cos(haa))

    # -- planar 2R in the sagittal plane: reach (x, z_p).
    d_sq = x * x + zp_sq
    reach_max = (THIGH_LENGTH + SHANK_LENGTH) ** 2
    reach_min = (THIGH_LENGTH - SHANK_LENGTH) ** 2
    d_sq = jnp.clip(d_sq, reach_min + 1e-9, reach_max - 1e-9)
    cos_kfe = (d_sq - THIGH_LENGTH**2 - SHANK_LENGTH**2) / (
        2.0 * THIGH_LENGTH * SHANK_LENGTH
    )
    kfe = KNEE_SIGN[leg] * jnp.arccos(jnp.clip(cos_kfe, -1.0, 1.0))
    a = THIGH_LENGTH + SHANK_LENGTH * jnp.cos(kfe)
    b = SHANK_LENGTH * jnp.sin(kfe)
    hfe = jnp.arctan2(-x, -z_p) - jnp.arctan2(b, a)
    hfe = jnp.arctan2(jnp.sin(hfe), jnp.cos(hfe))
    return jnp.stack([haa, hfe, kfe])


def joints_from_foot_positions(feet_base: Array) -> Array:
    """[12] joint vector from [4, 3] base-frame foot targets."""
    return jnp.concatenate(
        [leg_ik(leg, feet_base[leg]) for leg in range(NUM_LEGS)]
    )


def joints_from_foot_positions_world(x_base_pose: Array, feet_world: Array) -> Array:
    """IK from WORLD-frame foot targets given the base pose slice
    [p_base(3), euler(3)] — the reference's common usage when converting
    planned footholds into joint references."""
    p_base, euler = x_base_pose[0:3], x_base_pose[3:6]
    r_bw = model.euler_zyx_rotation(euler).T
    feet_base = jax.vmap(lambda pf: r_bw @ (pf - p_base))(feet_world)
    return joints_from_foot_positions(feet_base)
