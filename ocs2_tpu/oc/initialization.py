"""Initializers: producing (xs, us) when no warm start exists.

Analogue of the reference initialization layer
(ocs2_core/include/ocs2_core/initialization/Initializer.h:40,
OperatingPoints.h:40-60, DefaultInitializer.h) and the multiple-shooting
initialization helpers (ocs2_oc/multiple_shooting/Initialization.h).

An initializer maps (grid, x0) -> (xs [N+1, nx], us [N, nu]) host/device
arrays the solvers consume as xs_init/us_init; the MPC runtime uses it on
cold starts (MPC_BASE cold-start path).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..core.interpolation import interpolate_batch
from .time_discretization import TimeGrid

Array = jax.Array


class Initializer:
    """Base contract (reference Initializer.h:40)."""

    def __call__(self, grid: TimeGrid, x0: Array, nu: int):
        raise NotImplementedError


class DefaultInitializer(Initializer):
    """Constant state, zero input (reference DefaultInitializer.h) — what
    the solvers do internally when no initializer is given."""

    def __call__(self, grid: TimeGrid, x0: Array, nu: int):
        n = grid.num_intervals
        xs = jnp.tile(jnp.asarray(x0)[None], (n + 1, 1))
        us = jnp.zeros((n, nu), xs.dtype)
        return xs, us


class OperatingPoints(Initializer):
    """Time-stamped operating trajectories interpolated onto the grid
    (reference OperatingPoints.h:40-60).  A single (state, input) pair gives
    the constant-operating-point behavior; the initial node is always pinned
    to the measured x0."""

    def __init__(self, times, states, inputs):
        self.times = jnp.atleast_1d(jnp.asarray(times, jnp.float32))
        self.states = jnp.atleast_2d(jnp.asarray(states, jnp.float32))
        self.inputs = jnp.atleast_2d(jnp.asarray(inputs, jnp.float32))

    @staticmethod
    def constant(state, input):
        return OperatingPoints([0.0], [state], [input])

    def __call__(self, grid: TimeGrid, x0: Array, nu: int):
        times = jnp.asarray(grid.times)
        xs = interpolate_batch(self.times, self.states, times)
        us = interpolate_batch(self.times, self.inputs, times[:-1])
        xs = xs.at[0].set(jnp.asarray(x0))
        return xs, us


class CustomInitializer(Initializer):
    """Wrap any (grid, x0, nu) -> (xs, us) callable (e.g. the legged robot's
    weight-compensating-input initializer, LeggedRobotInterface.h:127)."""

    def __init__(self, fn: Callable):
        self.fn = fn

    def __call__(self, grid: TimeGrid, x0: Array, nu: int):
        return self.fn(grid, x0, nu)
