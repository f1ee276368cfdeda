"""Ballbot — ball-balancing robot, 10 states / 3 inputs.

Analogue of reference ocs2_robotic_examples/ocs2_ballbot
(definitions.h:37-38: STATE_DIM 10, INPUT_DIM 3).  The reference uses
RobCoGen-generated rigid-body dynamics for the 5-DOF ballbot; here the
equations of motion are derived analytically for a ball + pendulum-body
model in both lean axes with yaw, which reproduces the same state/input
layout and the qualitative balancing behaviour:

  q = [x_ball, y_ball, yaw, pitch, roll]   (base Euler angles zyx, as in
  dq = d/dt q                               reference BallbotSystemDynamics)
  u = [tau_x_wheel, tau_y_wheel, tau_z]    (omni-wheel torques mapped to
                                            ball accelerations + yaw torque)

Delta vs reference: the generated-code mass matrix is replaced by a
planar-decoupled ball-pendulum approximation (exact in the balancing regime
the MPC operates in); cost structure and dimensions match task.info.
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

NX = 10
NU = 3

BALL_RADIUS = 0.125
BALL_MASS = 2.65
BODY_MASS = 8.0
BODY_COM_HEIGHT = 0.32  # above ball center
BODY_INERTIA = 0.4
YAW_INERTIA = 0.1
GRAVITY = 9.81


def _lean_axis_accel(theta, dtheta, tau):
    """Ball-pendulum EoM for one lean axis.

    Ball position q1 and body lean theta couple through the contact:
    returns (ddq_ball, ddtheta) for wheel torque tau applied at the ball.
    """
    m_total = BALL_MASS + BODY_MASS
    ml = BODY_MASS * BODY_COM_HEIGHT
    i_b = BODY_INERTIA + BODY_MASS * BODY_COM_HEIGHT**2
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    force = tau / BALL_RADIUS
    # [m_total, ml*cos; ml*cos, i_b] [ddq; ddth] = [F + ml*dth^2*sin; ml*g*sin - tau]
    a11 = m_total
    a12 = ml * cos_t
    a22 = i_b
    b1 = force + ml * dtheta**2 * sin_t
    b2 = ml * GRAVITY * sin_t - tau
    det = a11 * a22 - a12 * a12
    ddq = (a22 * b1 - a12 * b2) / det
    ddth = (a11 * b2 - a12 * b1) / det
    return ddq, ddth


def dynamics(t, x, u, p):
    del t, p
    # q = [x, y, yaw, pitch, roll], dq likewise.
    dq = x[5:10]
    pitch, roll = x[3], x[4]
    dpitch, droll = dq[3], dq[4]
    ddx, ddpitch = _lean_axis_accel(pitch, dpitch, u[0])
    ddy, ddroll = _lean_axis_accel(roll, droll, u[1])
    ddyaw = u[2] / YAW_INERTIA
    return jnp.concatenate([dq, jnp.array([ddx, ddy, ddyaw, ddpitch, ddroll])])


# Weights mirror ocs2_ballbot/config/mpc/task.info Q/R diagonals.
Q = np.diag(np.array([20.0, 20.0, 10.0, 50.0, 50.0, 2.0, 2.0, 1.0, 5.0, 5.0], np.float32))
R = np.diag(np.array([1.0, 1.0, 1.0], np.float32))
QF = 2.0 * Q


def make_problem() -> OptimalControlProblem:
    return OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(quadratic_cost(Q, R),),
        final_cost_terms=(quadratic_final_cost(QF),),
        nx=NX,
        nu=NU,
    )


def make_params(target_position=(0.0, 0.0, 0.0)):
    target = jnp.zeros(NX)
    target = target.at[0].set(target_position[0])
    target = target.at[1].set(target_position[1])
    target = target.at[2].set(target_position[2])
    return {"target": TargetTrajectories.constant(target, jnp.zeros(NU))}
