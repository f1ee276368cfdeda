"""Quadrotor — 12-state nonlinear attitude dynamics.

Analogue of reference ocs2_robotic_examples/ocs2_quadrotor
(definitions.h:37-38: STATE_DIM 12, INPUT_DIM 4;
QuadrotorSystemDynamics.h: Newton-Euler with ZYX Euler angles).

State x = [p (3), eulerZYX (3), v_world (3), omega_body (3)];
input u = [total thrust Fz (body), torques Mx My Mz].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.reference import TargetTrajectories
from ..oc.problem import (
    OptimalControlProblem,
    quadratic_cost,
    quadratic_final_cost,
)

NX = 12
NU = 4

MASS = 1.0  # reference task.info quadrotorMass
GRAVITY = 9.81
INERTIA = np.array([0.005, 0.005, 0.009], np.float32)  # Ixx Iyy Izz (task.info)


def euler_zyx_to_rotation(euler):
    """R_world_body from ZYX (yaw-pitch-roll) angles."""
    yaw, pitch, roll = euler[0], euler[1], euler[2]
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    rz = jnp.array([[cy, -sy, 0.0], [sy, cy, 0.0], [0.0, 0.0, 1.0]])
    ry = jnp.array([[cp, 0.0, sp], [0.0, 1.0, 0.0], [-sp, 0.0, cp]])
    rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cr, -sr], [0.0, sr, cr]])
    return rz @ ry @ rx


def euler_zyx_rate_matrix(euler):
    """Maps body angular velocity to ZYX Euler-angle rates."""
    pitch, roll = euler[1], euler[2]
    cp = jnp.cos(pitch)
    sp = jnp.sin(pitch)
    cr = jnp.cos(roll)
    sr = jnp.sin(roll)
    # Guard the pitch singularity for robustness far from hover.
    sec = 1.0 / jnp.maximum(jnp.abs(cp), 1e-3) * jnp.sign(cp + 1e-9)
    return jnp.array(
        [
            [0.0, sr * sec, cr * sec],
            [0.0, cr, -sr],
            [1.0, sr * sp * sec, cr * sp * sec],
        ]
    )


def dynamics(t, x, u, p):
    del t, p
    euler = x[3:6]
    v = x[6:9]
    omega = x[9:12]
    r_wb = euler_zyx_to_rotation(euler)
    thrust_world = r_wb @ jnp.array([0.0, 0.0, u[0]])
    dv = thrust_world / MASS - jnp.array([0.0, 0.0, GRAVITY])
    deuler = euler_zyx_rate_matrix(euler) @ omega
    torque = u[1:4]
    domega = (torque - jnp.cross(omega, INERTIA * omega)) / INERTIA
    return jnp.concatenate([v, deuler, dv, domega])


def hover_input():
    return jnp.array([MASS * GRAVITY, 0.0, 0.0, 0.0])


Q = np.diag(
    np.array([10.0, 10.0, 10.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0, 0.1, 0.1, 0.1], np.float32)
)
R = np.diag(np.array([0.1, 1.0, 1.0, 1.0], np.float32))
QF = 2.0 * Q


def make_problem() -> OptimalControlProblem:
    return OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(quadratic_cost(Q, R),),
        final_cost_terms=(quadratic_final_cost(QF),),
        nx=NX,
        nu=NU,
    )


def make_params(target_position=(0.0, 0.0, 1.0)):
    target_state = jnp.zeros(NX).at[0:3].set(jnp.asarray(target_position))
    return {
        "target": TargetTrajectories.constant(target_state, hover_input())
    }
