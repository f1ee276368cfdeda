"""Differentiable rigid-body kinematics: serial chains and trees in JAX.

TPU-native replacement for the reference's Pinocchio layer
(ocs2_pinocchio/ocs2_pinocchio_interface/PinocchioInterface.h:60,
PinocchioEndEffectorKinematics.h) for the kinematic queries the MPC stack
needs: forward kinematics of end-effector frames and their Jacobians.  A
chain is a static description (pytree of constants); FK is a pure jittable
function; Jacobians come from ``jax.jacfwd`` (replacing both Pinocchio's
analytic derivatives and the CppAd codegen variants).

Only revolute and prismatic joints about principal axes are supported —
sufficient for the shipped robot examples (manipulator arms, quadruped legs).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_AXES = {"x": 0, "y": 1, "z": 2}


def rot_axis(axis: int, angle):
    """Rotation matrix about principal axis (0=x, 1=y, 2=z)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    if axis == 0:
        return jnp.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 1:
        return jnp.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])
    return jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


@dataclasses.dataclass(frozen=True)
class Joint:
    """One joint: fixed translation, then rotation/translation about axis."""

    offset: Tuple[float, float, float]  # parent->joint translation (parent frame)
    axis: str = "z"  # x|y|z
    kind: str = "revolute"  # revolute | prismatic | fixed


@dataclasses.dataclass(frozen=True)
class Chain:
    """Serial kinematic chain ending at an end-effector frame."""

    joints: Tuple[Joint, ...]
    ee_offset: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def num_dof(self) -> int:
        return sum(1 for j in self.joints if j.kind != "fixed")

    def forward(self, q: Array, base_rot=None, base_pos=None):
        """FK: returns (ee position [3], ee rotation [3,3]) in base frame."""
        rot = jnp.eye(3) if base_rot is None else base_rot
        pos = jnp.zeros(3) if base_pos is None else base_pos
        qi = 0
        for joint in self.joints:
            pos = pos + rot @ jnp.asarray(joint.offset)
            if joint.kind == "revolute":
                rot = rot @ rot_axis(_AXES[joint.axis], q[qi])
                qi += 1
            elif joint.kind == "prismatic":
                step = jnp.zeros(3).at[_AXES[joint.axis]].set(q[qi])
                pos = pos + rot @ step
                qi += 1
        pos = pos + rot @ jnp.asarray(self.ee_offset)
        return pos, rot

    def ee_position(self, q: Array, base_rot=None, base_pos=None) -> Array:
        return self.forward(q, base_rot, base_pos)[0]

    def frame_poses(self, q: Array, base_rot=None, base_pos=None):
        """Poses of every frame along the chain: ([F,3,3], [F,3]) with
        F = num joints + 2 (base frame first, EE frame last) — the FK query
        sphere-approximation collision models consume (reference
        PinocchioSphereKinematics computes sphere centers from frame
        placements)."""
        rot = jnp.eye(3) if base_rot is None else base_rot
        pos = jnp.zeros(3) if base_pos is None else base_pos
        rots, poss = [rot], [pos]
        qi = 0
        for joint in self.joints:
            pos = pos + rot @ jnp.asarray(joint.offset)
            if joint.kind == "revolute":
                rot = rot @ rot_axis(_AXES[joint.axis], q[qi])
                qi += 1
            elif joint.kind == "prismatic":
                step = jnp.zeros(3).at[_AXES[joint.axis]].set(q[qi])
                pos = pos + rot @ step
                qi += 1
            rots.append(rot)
            poss.append(pos)
        rots.append(rot)
        poss.append(pos + rot @ jnp.asarray(self.ee_offset))
        return jnp.stack(rots), jnp.stack(poss)

    def position_jacobian(self, q: Array) -> Array:
        """d ee_position / d q  [3, ndof] via forward-mode AD (replaces
        Pinocchio computeFrameJacobian / CppAd codegen)."""
        return jax.jacfwd(self.ee_position)(q)


def rotation_error(r: Array, r_des: Array) -> Array:
    """so(3) log of r_des^T r — the orientation error used by the reference's
    EndEffectorKinematics orientation-error interface."""
    rel = r_des.T @ r
    # Vee of the skew-symmetric part, scaled by the rotation angle.
    cos_angle = jnp.clip(0.5 * (jnp.trace(rel) - 1.0), -1.0 + 1e-6, 1.0 - 1e-6)
    angle = jnp.arccos(cos_angle)
    vee = 0.5 * jnp.array(
        [rel[2, 1] - rel[1, 2], rel[0, 2] - rel[2, 0], rel[1, 0] - rel[0, 1]]
    )
    scale = jnp.where(angle < 1e-5, 1.0, angle / jnp.sin(angle))
    return scale * vee
