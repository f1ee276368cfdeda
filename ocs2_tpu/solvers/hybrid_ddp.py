"""State-triggered hybrid DDP: optimize through guard-surface mode changes.

TPU-native analogue of the reference's hybrid SLQ pipeline — SLQ consuming a
StateTriggeredRollout so the mode schedule is DETECTED from the trajectory
rather than prescribed (ocs2_ddp/test/HybridSlqTest.cpp,
test/bouncingmass/BouncingMassTest.cpp; machinery:
ocs2_oc/rollout/StateTriggeredRollout.h:46 + SLQ.h:43).

The reference re-detects switching times inside every SLQ iteration by
integrating with an event-handling ODE solver.  The XLA re-design keeps the
whole solve ONE compiled program by splitting it into a small fixed number of
outer rounds; each round

  1. rolls the current policy through the guarded hybrid system
     (oc/hybrid_rollout.py — fixed-step scan + bisection root refinement),
  2. extracts up to ``max_events`` crossing times / post-modes,
  3. builds a TRACED TimeGrid with duplicated nodes at the detected times
     (oc/time_discretization.make_event_grid_traced — event times are data,
     shapes static, so moving events never retrace),
  4. runs the standard DDP/SLQ solve on that grid (time-triggered inner
     iterations at the detected times, exactly the reference's treatment).

Detected event times converge with the policy across rounds; the final
rollout is returned so tests can assert self-consistency (grid events ==
events the optimized policy actually triggers).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.controllers import LinearController
from ..core.interpolation import interpolate
from ..oc.hybrid_rollout import HybridSystem, HybridTrajectory, rollout_state_triggered
from ..oc.problem import OptimalControlProblem
from ..oc.time_discretization import TimeGrid, make_event_grid_traced
from . import ddp

Array = jax.Array


class HybridDdpSolution(NamedTuple):
    ddp: ddp.DdpSolution
    grid: TimeGrid
    event_times: Array  # [E] detected crossing times (inf where unused)
    mode_sequence: Array  # [E+1]
    rollout: HybridTrajectory  # final-policy state-triggered rollout


def _detect_events(traj: HybridTrajectory, max_events: int, mode0):
    """First ``max_events`` guard crossings (sorted by time; inactive slots
    +inf) and the post-jump mode sequence."""
    masked = jnp.where(traj.event_mask > 0.0, traj.event_times, jnp.inf)
    order = jnp.argsort(masked)[:max_events]
    ev = masked[order]
    post_modes = traj.modes[1:][order]
    mode_seq = jnp.concatenate(
        [jnp.asarray(mode0, jnp.int32)[None], post_modes.astype(jnp.int32)]
    )
    return ev, mode_seq


def solve_state_triggered(
    system: HybridSystem,
    problem: OptimalControlProblem,
    t0,
    tf,
    x0: Array,
    params: dict,
    num_base_intervals: int = 60,
    max_events: int = 4,
    outer_rounds: int = 3,
    rollout_steps: Optional[int] = None,
    mode0: int = 0,
    settings: ddp.DdpSettings = ddp.DdpSettings(),
) -> HybridDdpSolution:
    """Jittable end-to-end state-triggered solve.

    ``problem`` must express the same dynamics/jump as ``system`` with the
    active mode read from ``params["mode"]`` (the per-node mode injected by
    the grid) — ``system`` drives detection, ``problem`` drives optimization.
    """
    steps = rollout_steps or 2 * num_base_intervals
    dt_roll = (float(tf) - float(t0)) / steps
    n = num_base_intervals + 2 * max_events
    nu = problem.nu
    mode0_arr = jnp.asarray(mode0, jnp.int32)

    us = jnp.zeros((steps, nu), jnp.asarray(x0).dtype)

    def open_loop(t, x, k):
        del x
        return us[jnp.minimum(k, steps - 1)]

    policy = open_loop
    sol = None
    grid = None
    ev = None
    mode_seq = None

    for _ in range(outer_rounds):
        traj = rollout_state_triggered(
            system, t0, x0, policy, dt_roll, steps, params, mode0=mode0_arr
        )
        ev, mode_seq = _detect_events(traj, max_events, mode0_arr)
        grid = make_event_grid_traced(
            t0, tf, num_base_intervals, ev, mode_seq, dtype=jnp.asarray(x0).dtype
        )
        # Warm start: current policy evaluated along the detected trajectory
        # at the new grid nodes (trajectory-spreading-lite).
        if sol is None:
            us_init = jnp.zeros((n, nu), jnp.asarray(x0).dtype)
        else:
            ctrl = LinearController(
                times=prev_grid.times[:-1], uff=sol.us, gains=sol.gains,
                x_nom=sol.xs[:-1],
            )
            xs_at = jax.vmap(
                lambda t: interpolate(traj.times, traj.xs, t)
            )(grid.times[:-1])
            us_init = jax.vmap(ctrl)(grid.times[:-1], xs_at)
        sol = ddp.solve(
            problem, grid, x0, params, us_init=us_init, settings=settings
        )
        prev_grid = grid

        ctrl = LinearController(
            times=grid.times[:-1], uff=sol.us, gains=sol.gains, x_nom=sol.xs[:-1]
        )
        policy = lambda t, x, k, _c=ctrl: _c(t, x)  # noqa: E731

    final_traj = rollout_state_triggered(
        system, t0, x0, policy, dt_roll, steps, params, mode0=mode0_arr
    )
    return HybridDdpSolution(
        ddp=sol, grid=grid, event_times=ev, mode_sequence=mode_seq,
        rollout=final_traj,
    )
