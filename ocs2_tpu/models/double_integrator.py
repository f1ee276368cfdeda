"""Double integrator — the minimal LQ MPC demo.

Analogue of reference ocs2_robotic_examples/ocs2_double_integrator
(definitions.h:37-38: STATE_DIM 2, INPUT_DIM 1).
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

NX = 2
NU = 1

# Cost weights follow the reference task.info (ocs2_double_integrator/config/
# mpc/task.info Q/R/Q_final).
Q = np.diag(np.array([1.0, 1.0], np.float32))
R = np.diag(np.array([1.0], np.float32))
QF = np.diag(np.array([10.0, 10.0], np.float32))


def dynamics(t, x, u, p):
    del t, p
    return jnp.array([x[1], u[0]])


def make_problem() -> OptimalControlProblem:
    return OptimalControlProblem(
        dynamics=dynamics,
        cost_terms=(quadratic_cost(Q, R),),
        final_cost_terms=(quadratic_final_cost(QF),),
        nx=NX,
        nu=NU,
    )


def make_params(target_state=(0.0, 0.0)):
    return {
        "target": TargetTrajectories.constant(
            jnp.asarray(target_state, jnp.float32), jnp.zeros((NU,), jnp.float32)
        )
    }
