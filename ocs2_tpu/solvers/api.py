"""Unified solver interface — the SolverBase analogue.

The reference exposes one abstract solver API
(ocs2_oc/include/ocs2_oc/oc_solver/SolverBase.h:54-273: run(t0, x0, tf),
getPrimalSolution, getPerformanceIndeces, getValueFunction(t, x) :214,
getHamiltonian(t, x, u) :224, reference-manager wiring) that DDP/SQP/IPM/SLP
all implement.  Here the solvers are pure functions returning structurally
identical solution pytrees; this module provides the object-style facade on
top: algorithm selection by name, initializer plumbing, last-solution state,
and the value-function/Hamiltonian query surface (oc/queries.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..oc.initialization import DefaultInitializer, Initializer
from ..oc.problem import OptimalControlProblem
from ..oc.queries import hamiltonian, hamiltonian_approx, value_function
from ..oc.time_discretization import TimeGrid
from . import ddp as _ddp
from . import ipm as _ipm
from . import slp as _slp
from . import sqp as _sqp

Array = jax.Array

ALGORITHMS = {
    "sqp": (_sqp, _sqp.SqpSettings),
    "slq": (_ddp, _ddp.DdpSettings),  # continuous-time DDP configuration
    "ilqr": (_ddp, _ddp.DdpSettings),
    "ipm": (_ipm, _ipm.IpmSettings),
    "slp": (_slp, _slp.SlpSettings),
}


class Solver:
    """Object-style solver with the SolverBase query surface.

    >>> solver = Solver(problem, algorithm="sqp")
    >>> sol = solver.run(grid, x0, params)
    >>> V = solver.get_value_function(t, x)      # SolverBase.h:214
    >>> H = solver.get_hamiltonian(t, x, u)      # SolverBase.h:224
    """

    def __init__(
        self,
        problem: OptimalControlProblem,
        algorithm: str = "sqp",
        settings: Optional[Any] = None,
        initializer: Optional[Initializer] = None,
    ):
        if algorithm not in ALGORITHMS:
            raise ValueError(
                f"unknown algorithm {algorithm!r}; one of {sorted(ALGORITHMS)}"
            )
        self.problem = problem
        self.algorithm = algorithm
        mod, settings_cls = ALGORITHMS[algorithm]
        self._mod = mod
        if settings is None:
            settings = settings_cls()
        if algorithm in ("slq", "ilqr"):
            settings = dataclasses.replace(settings, algorithm=algorithm)
        self.settings = settings
        self.initializer = initializer or DefaultInitializer()
        self._last = None  # (grid, sol, params)
        self._jitted = jax.jit(self._solve_fn)

    def _solve_fn(self, grid, x0, params, xs_init, us_init):
        if self.algorithm in ("slq", "ilqr"):
            return self._mod.solve(
                self.problem, grid, x0, params,
                us_init=us_init, settings=self.settings,
            )
        return self._mod.solve(
            self.problem, grid, x0, params,
            xs_init=xs_init, us_init=us_init, settings=self.settings,
        )

    # -- SolverBase::run ------------------------------------------------------
    def run(self, grid: TimeGrid, x0: Array, params: dict,
            xs_init=None, us_init=None):
        if xs_init is None or us_init is None:
            xs0, us0 = self.initializer(grid, x0, self.problem.nu)
            xs_init = xs0 if xs_init is None else xs_init
            us_init = us0 if us_init is None else us_init
        sol = self._jitted(grid, jnp.asarray(x0), params, xs_init, us_init)
        self._last = (grid, sol, params)
        return sol

    # -- solution getters -----------------------------------------------------
    @property
    def last_solution(self):
        assert self._last is not None, "run() first"
        return self._last[1]

    def primal_solution(self):
        """(times, xs, us, gains) — the reference PrimalSolution payload."""
        grid, sol, _ = self._require()
        return grid.times, sol.xs, sol.us, sol.gains

    def performance_indices(self):
        return self._require()[1].performance

    def _require(self):
        assert self._last is not None, "run() first"
        return self._last

    # -- value-function / Hamiltonian queries (SolverBase.h:214,224) ----------
    def get_value_function(self, t, x):
        grid, sol, _ = self._require()
        return value_function(grid, sol.xs, sol.value_S, sol.value_s, t, x)

    def get_hamiltonian(self, t, x, u, quadratic: bool = False):
        grid, sol, params = self._require()
        fn = hamiltonian_approx if quadratic else hamiltonian
        return fn(
            self.problem, grid, sol.xs, sol.value_S, sol.value_s,
            t, x, u, params,
        )
