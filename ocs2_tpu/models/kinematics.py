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


def matrix_to_quaternion(r: Array) -> Array:
    """Rotation matrix -> unit quaternion [x, y, z, w], branch-robust.

    Shepperd's method evaluated on all four branches with the largest pivot
    selected by masking — jit/vmap friendly and AD-safe (every sqrt argument
    is clamped so unselected branches never produce NaN cotangents)."""
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tw = 1.0 + m00 + m11 + m22  # 4 w^2
    tx = 1.0 + m00 - m11 - m22  # 4 x^2
    ty = 1.0 - m00 + m11 - m22  # 4 y^2
    tz = 1.0 - m00 - m11 + m22  # 4 z^2

    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    sw, sx, sy, sz = safe_sqrt(tw), safe_sqrt(tx), safe_sqrt(ty), safe_sqrt(tz)
    # Candidate quaternions (x, y, z, w), one per pivot.
    q_w = jnp.stack([(m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
                     (m10 - m01) / (2 * sw), 0.5 * sw])
    q_x = jnp.stack([0.5 * sx, (m01 + m10) / (2 * sx),
                     (m02 + m20) / (2 * sx), (m21 - m12) / (2 * sx)])
    q_y = jnp.stack([(m01 + m10) / (2 * sy), 0.5 * sy,
                     (m12 + m21) / (2 * sy), (m02 - m20) / (2 * sy)])
    q_z = jnp.stack([(m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz),
                     0.5 * sz, (m10 - m01) / (2 * sz)])
    ts = jnp.stack([tw, tx, ty, tz])
    qs = jnp.stack([q_w, q_x, q_y, q_z])
    pick = jnp.argmax(ts)
    q = qs[pick]
    return q / jnp.linalg.norm(q)


def quaternion_distance(q: Array, q_ref: Array) -> Array:
    """Reference quaternionDistance (RotationTransforms.h:51):
    e = q.w * qRef.vec - qRef.w * q.vec + q.vec x qRef.vec — zero iff the
    frames align, magnitude sin(theta/2): well-conditioned at every relative
    angle including pi (where the so(3)-log vee degenerates)."""
    qv, qw = q[:3], q[3]
    rv, rw = q_ref[:3], q_ref[3]
    return qw * rv - rw * qv + jnp.cross(qv, rv)


def rotation_error(r: Array, r_des: Array) -> Array:
    """Orientation error between rotation matrices via the reference's
    quaternion distance (ocs2_robotic_tools RotationTransforms.h:51, used by
    EndEffectorKinematics getOrientationError).  Sign-fixed to the hemisphere
    nearest the target so the error is continuous around identity."""
    q = matrix_to_quaternion(r)
    q_ref = matrix_to_quaternion(r_des)
    q = jnp.where(jnp.dot(q, q_ref) < 0.0, -q, q)
    return quaternion_distance(q, q_ref)
