"""Cartpole swing-up with input constraints.

Analogue of reference ocs2_robotic_examples/ocs2_cartpole
(definitions.h:37-38: STATE_DIM 4, INPUT_DIM 1; CartPoleSystemDynamics.h
derives the pole/cart equations; task.info sets the relaxed-barrier input
bound |F| <= 6 handled as soft or hard inequality).

State x = [theta, p, theta_dot, p_dot] (pole angle from upright, cart pos),
input u = [force].  Parameters mirror the reference task.info dynamics block.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core import penalties as pen
from ..core.reference import TargetTrajectories
from ..oc.problem import (
    OptimalControlProblem,
    quadratic_cost,
    quadratic_final_cost,
    soft_constraint,
)

NX = 4
NU = 1

CART_MASS = 1.0
POLE_MASS = 0.1
POLE_LENGTH = 0.5  # half-length in the classic formulation
GRAVITY = 9.81
MAX_FORCE = 6.0


def dynamics(t, x, u, p):
    del t, p
    theta, pos, dtheta, dpos = x
    force = u[0]
    sin_t = jnp.sin(theta)
    cos_t = jnp.cos(theta)
    total = CART_MASS + POLE_MASS
    # Standard cartpole (pole pivoting on cart), theta measured from upright.
    temp = (force + POLE_MASS * POLE_LENGTH * dtheta**2 * sin_t) / total
    denom = POLE_LENGTH * (4.0 / 3.0 - POLE_MASS * cos_t**2 / total)
    ddtheta = (GRAVITY * sin_t - cos_t * temp) / denom
    ddpos = temp - POLE_MASS * POLE_LENGTH * ddtheta * cos_t / total
    return jnp.array([dtheta, dpos, ddtheta, ddpos])


def input_bounds(t, x, u, p):
    """h(u) >= 0 box: [u + max, max - u] (reference task.info input bounds)."""
    del t, x, p
    return jnp.array([u[0] + MAX_FORCE, MAX_FORCE - u[0]])


Q = np.diag(np.array([2.0, 1.0, 0.2, 0.2], np.float32))
R = np.diag(np.array([0.1], np.float32))
QF = np.diag(np.array([40.0, 20.0, 4.0, 4.0], np.float32))


def make_problem(constraint_mode: str = "soft") -> OptimalControlProblem:
    """constraint_mode: 'soft' (relaxed barrier in cost, reference default),
    'hard' (inequality terms for AL/IPM), or 'none'."""
    base = OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(quadratic_cost(Q, R),),
        final_cost_terms=(quadratic_final_cost(QF),),
        nx=NX,
        nu=NU,
    )
    if constraint_mode == "soft":
        barrier = pen.relaxed_barrier(mu=0.1, delta=1e-3)
        return base.add(cost_terms=(soft_constraint(input_bounds, barrier),))
    if constraint_mode == "hard":
        return base.add(inequality_terms=(input_bounds,))
    return base


def make_params():
    return {
        "target": TargetTrajectories.constant(
            jnp.zeros((NX,), jnp.float32), jnp.zeros((NU,), jnp.float32)
        )
    }


def initial_state_down():
    """Pole hanging down — the swing-up task initial condition."""
    return jnp.array([jnp.pi, 0.0, 0.0, 0.0], jnp.float32)
