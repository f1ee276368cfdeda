"""Frequency-shaped (loopshaping) legged MPC.

Analogue of the reference's first-class loopshaped quadruped product
(ocs2_robotic_examples/ocs2_perceptive_anymal/ocs2_anymal_loopshaping_mpc +
ocs2_quadruped_loopshaping_interface): the switched legged OCP is augmented
with per-channel input filters so high-frequency content in contact forces
and joint velocities is penalized, producing smoother hardware-friendly
commands.

Shaping transfer mirrors the shipped loopshaping.info
(ocs2_anymal_loopshaping_mpc/config/c_series/loopshaping.info):
* force channels (12):          s_inv(s) = 4 * s / (s + 100)
* joint-velocity channels (12): s_inv(s) = 3 * s / (s + 50)

Composition route: the reference outputpattern (r_filter,
oc/loopshaping.wrap_problem_r_filter) — the plant input u REMAINS the
decision variable, filter states low-pass it (xi' = p (u - xi)) and the
quadratic shaping cost lands on the filtered output

    y = g (u - xi)  =  [g s / (s + p)] u  =  s_inv(s) u,

i.e. exactly the anymal shaping transfer of the input is penalized.  Because
u is untouched, the foot equality constraints keep their full-rank
u-Jacobians and the QR projection path behaves identically to the unshaped
problem (the eliminate-pattern route with the improper inverted filter
1/s_inv — how the reference's C++ stack loads this config — puts a ~100:1
conditioning ratio into the projected rows that the f32 line search cannot
survive; penalizing the forward transfer is mathematically the same shaping
objective with the unshaped problem's numerics).

NOTE the filter pole (p = 100) makes the augmented dynamics stiff:
|lambda| dt must stay inside the integrator's stability region — use
substeps >= 2 at dt = 0.025 with RK2 (see make_solver_settings).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...oc.loopshaping import LoopshapingDefinition, wrap_problem_r_filter
from ...oc.problem import OptimalControlProblem
from ...solvers import sqp
from . import model
from .interface import make_problem

Array = jax.Array


def anymal_loopshaping_definition(
    force_pole: float = 100.0,
    force_gain: float = 4.0,
    velocity_pole: float = 50.0,
    velocity_gain: float = 3.0,
    shaping_weight: float = 1e-2,
    dtype=jnp.float32,
) -> LoopshapingDefinition:
    """r_filter realization of y = s_inv(s) u per channel:
    xi' = -p xi + p u (low-pass state), y = g (u - xi).

    shaping_weight balances the filtered-output penalty against this repo's
    task weights (measured on the trot task: w = 1e-2 cuts the shaping
    functional |y|^2 by ~18% vs the unshaped solve while base-height
    tracking stays within 5 cm; w = 1 lets the shaping dominate and the
    tracking collapses — the reference tunes the equivalent balance in
    task.info vs loopshaping.info)."""
    poles = np.concatenate([np.full(12, force_pole), np.full(12, velocity_pole)])
    gains = np.concatenate([np.full(12, force_gain), np.full(12, velocity_gain)])
    return LoopshapingDefinition(
        A=jnp.asarray(np.diag(-poles), dtype),
        B=jnp.asarray(np.diag(poles), dtype),
        C=jnp.asarray(np.diag(-gains), dtype),
        D=jnp.asarray(np.diag(gains), dtype),
        R_v=shaping_weight * jnp.eye(24, dtype=dtype),
    )


def make_loopshaping_problem(
    defn: Optional[LoopshapingDefinition] = None,
    **problem_kwargs,
) -> tuple[OptimalControlProblem, LoopshapingDefinition]:
    """The loopshaped legged OCP (AnymalLoopshapingInterface analogue).
    Returns (augmented problem, definition); augmented state = [x(24),
    xi(24)], input = the PLANT input u(24) (outputpattern)."""
    defn = defn or anymal_loopshaping_definition()
    problem = make_problem(**problem_kwargs)
    return wrap_problem_r_filter(problem, defn), defn


def make_solver_settings(**overrides) -> sqp.SqpSettings:
    """SQP settings stable for the stiff filter pole: RK2 with 2 substeps
    keeps |lambda_max| h = p*dt/substeps inside the stability region at the
    reference dt = 0.025."""
    kw = dict(max_iterations=12, integrator="rk2", substeps=2)
    kw.update(overrides)
    return sqp.SqpSettings(**kw)


def augment_state(defn: LoopshapingDefinition, x: Array, u: Array) -> Array:
    """(plant state, steady input) -> augmented initial state (reference
    LoopshapingSystemObservation.augmentedSystemState): the filter state at
    equilibrium, xi = (-A)^{-1} B u (unit-DC low-pass: xi = u)."""
    xi = jnp.linalg.solve(-defn.A, defn.B @ u)
    return jnp.concatenate([x, xi])


def loopshaped_warm_start(defn: LoopshapingDefinition, grid, x0: Array):
    """Warm start consistent with the gait's contact structure: per-node
    weight-compensating plant inputs and equilibrium filter states (the
    LoopshapingInitializer analogue)."""
    from .gait import contact_flags
    from .model import weight_compensating_input

    n = grid.times.shape[0] - 1
    flags = jax.vmap(contact_flags)(grid.modes)
    u_des = jax.vmap(weight_compensating_input)(flags)  # [n+1, 24]
    xi = jax.vmap(lambda u: jnp.linalg.solve(-defn.A, defn.B @ u))(u_des)
    xs_init = jnp.concatenate(
        [jnp.tile(x0[None], (n + 1, 1)), xi.astype(x0.dtype)], axis=1
    )
    return xs_init.astype(x0.dtype), u_des[:-1].astype(x0.dtype)


def plant_trajectory(defn: LoopshapingDefinition, xs: Array, us: Array):
    """Augmented solution -> plant (x, u) trajectories.  In the
    outputpattern the input IS the plant input (getSystemInput: systemInput
    = input); the state simply drops the filter block."""
    nx = xs.shape[-1] - defn.num_filter_states
    return xs[..., :nx], us


def filtered_output(defn: LoopshapingDefinition, xs: Array, us: Array) -> Array:
    """y_k = C xi_k + D u_k — the shaped quantity (getFilteredInput)."""
    nx = xs.shape[-1] - defn.num_filter_states
    xi = xs[:-1, nx:]
    return xi @ defn.C.T + us @ defn.D.T
