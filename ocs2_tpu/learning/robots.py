"""Per-robot MPC-Net definitions: ballbot and legged robot.

Analogue of the reference robot MPC-Net packages
(ocs2_mpcnet/ocs2_ballbot_mpcnet/: BallbotMpcnetDefinition + train.py, and
ocs2_mpcnet/ocs2_legged_robot_mpcnet/: LeggedRobotMpcnetDefinition —
observation generalizes the state with the gait phase, the action transform
biases the network output with the weight-compensating input so the policy
learns deviations from gravity compensation).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import ballbot
from ..models.legged_robot import interface, model
from ..models.legged_robot.gait import GaitSchedule, contact_flags, trot_gait
from ..oc.time_discretization import TimeGrid, make_time_grid
from ..solvers import sqp
from .mpcnet import Mpcnet, MpcnetSettings
from .policy import (
    LinearPolicy,
    MixtureOfLinearExpertsPolicy,
    MixtureOfNonlinearExpertsPolicy,
    NonlinearPolicy,
)

Array = jax.Array

POLICY_ZOO = {
    "linear": LinearPolicy,
    "nonlinear": NonlinearPolicy,
    "mixture_of_linear_experts": MixtureOfLinearExpertsPolicy,
    "mixture_of_nonlinear_experts": MixtureOfNonlinearExpertsPolicy,
}


def make_ballbot_mpcnet(
    policy: str = "nonlinear",
    settings: Optional[MpcnetSettings] = None,
    **policy_kwargs,
) -> Mpcnet:
    """Ballbot MPC-Net (reference ocs2_ballbot_mpcnet: 10-state ballbot,
    state observation, identity action transform)."""
    problem = ballbot.make_problem()
    params = ballbot.make_params()
    cls = POLICY_ZOO[policy]
    if "mixture" in policy and "num_experts" not in policy_kwargs:
        policy_kwargs["num_experts"] = 3
    module = cls(action_dim=problem.nu, **policy_kwargs)
    settings = settings or MpcnetSettings(
        rollout_steps=6,
        control_dt=0.1,
        batch_size=32,
        learning_rate=1e-2,
        learning_iterations=200,
        memory_capacity=1024,
        data_scenarios=8,
        rounds=3,
        mpc_horizon=1.0,
        mpc_intervals=16,
        solver_settings=sqp.SqpSettings(max_iterations=6, integrator="rk4"),
    )
    return Mpcnet(problem, params, module, settings=settings)


def ballbot_x0_sampler(key, n):
    """Random leans/offsets (reference BallbotMpcnetDefinition sampling)."""
    return 0.15 * jax.random.normal(key, (n, ballbot.NX))


# ---------------------------------------------------------------------------
# Legged robot.
# ---------------------------------------------------------------------------


def legged_observation(t: Array, x: Array, gait_cycle: float = 0.7) -> Array:
    """State generalized with the gait phase encoded as (sin, cos)
    (reference LeggedRobotMpcnetDefinition::getGeneralizedTime — the
    observation localizes the sample within the gait cycle)."""
    phase = 2.0 * jnp.pi * (t / gait_cycle % 1.0)
    return jnp.concatenate([jnp.stack([jnp.sin(phase), jnp.cos(phase)]), x])


def legged_action_transform(t: Array, x: Array, a: Array, gait_cycle: float = 0.7):
    """u = u_weight_compensating(contact flags at t) + a (reference
    LeggedRobotMpcnetDefinition::getActionTransformation: the network learns
    the deviation from gravity compensation)."""
    del x
    # Trot contact pattern at time t (mode from phase).
    phase = (t / gait_cycle) % 1.0
    mode_a = jnp.where(phase < 0.5, 9, 6)  # LF+RH then RF+LH
    flags = contact_flags(mode_a)
    return model.weight_compensating_input(flags) + a


def make_legged_mpcnet(
    policy: str = "mixture_of_linear_experts",
    settings: Optional[MpcnetSettings] = None,
    gait_cycle: float = 0.7,
    **policy_kwargs,
) -> Mpcnet:
    """Legged-robot MPC-Net (reference ocs2_legged_robot_mpcnet): trot-gait
    grid, gait-phase observation, weight-compensating action transform."""
    problem = interface.make_problem()
    gs = GaitSchedule(trot_gait(gait_cycle))
    horizon, n_int = 0.7, 14

    def grid_fn(t0):
        # Fixed-shape trot grid starting at t0 (host-side tracing constant:
        # the gait is periodic, so event OFFSETS from t0 depend only on the
        # phase; keep the standard static-shape grid from phase 0 — the
        # observation carries the phase).
        ms = gs.mode_schedule(0.0, horizon)
        g = make_time_grid(
            0.0, horizon, n_int,
            event_times=np.asarray(ms.event_times),
            mode_sequence=np.asarray(ms.mode_sequence),
        )
        return TimeGrid(
            times=g.times + t0,
            modes=g.modes,
            is_jump=g.is_jump,
        )

    grid0 = grid_fn(jnp.zeros(()))
    params = interface.make_params(grid0)
    cls = POLICY_ZOO[policy]
    if "mixture" in policy and "num_experts" not in policy_kwargs:
        policy_kwargs["num_experts"] = 3
    module = cls(action_dim=problem.nu, **policy_kwargs)
    settings = settings or MpcnetSettings(
        rollout_steps=4,
        control_dt=0.05,
        batch_size=32,
        learning_rate=5e-3,
        learning_iterations=150,
        memory_capacity=512,
        data_scenarios=4,
        rounds=2,
        mpc_horizon=horizon,
        mpc_intervals=n_int,
        solver_settings=sqp.SqpSettings(max_iterations=5, integrator="rk2"),
    )
    return Mpcnet(
        problem,
        params,
        module,
        observation_fn=lambda t, x: legged_observation(t, x, gait_cycle),
        action_transform=lambda t, x, a: legged_action_transform(
            t, x, a, gait_cycle
        ),
        settings=settings,
        grid_fn=lambda t0: grid_fn(t0),
    )


def legged_x0_sampler(key, n):
    """Perturbed stands (reference LeggedRobotMpcnetDefinition sampling)."""
    base = model.default_state()
    noise = jax.random.normal(key, (n, model.NX))
    scale = jnp.concatenate(
        [
            0.05 * jnp.ones(6),   # momenta
            0.02 * jnp.ones(3),   # base position
            0.03 * jnp.ones(3),   # orientation
            0.05 * jnp.ones(12),  # joints
        ]
    )
    return base[None] + scale[None] * noise
