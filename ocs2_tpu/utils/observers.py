"""Solver observability: performance-index history, term probes, benchmarks.

TPU-native analogue of the reference's observability stack:
* SolverObserver term-wise probes of constraints/Lagrangians/multipliers
  (ocs2_oc/synchronized_module/SolverObserver.h:48-152) — here callbacks
  over the *solution pytree* after each solve (everything the reference
  observes per term is already materialized in TrajectoryMetrics/AlState).
* PerformanceIndex iteration history (ocs2_oc/oc_solver/SolverBase.h:154-168).
* Per-phase benchmark breakdown printout (GaussNewtonDDP.cpp:140-165,
  SqpSolver.cpp:128-150) built from utils/timers.RepeatedTimer.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from ..core.types import PerformanceIndex
from .timers import RepeatedTimer

Array = jax.Array


@dataclasses.dataclass
class SolverObserver:
    """Observes a named quantity of each solve (SolverObserver.h analogue).

    extractor(solution) -> pytree of arrays; every observation is appended
    to ``history`` with its solve time.  Typical extractors probe constraint
    values, AL multipliers, or solver statistics.
    """

    name: str
    extractor: Callable[[Any], Any]
    history: List[tuple] = dataclasses.field(default_factory=list)

    def observe(self, t: float, solution: Any) -> None:
        value = jax.tree.map(np.asarray, self.extractor(solution))
        self.history.append((t, value))

    def latest(self):
        return self.history[-1] if self.history else None


def constraint_observer(name: str = "equality_sse") -> SolverObserver:
    """Probe of the terminal equality-constraint SSE (the reference's
    LagrangianMetrics topics)."""
    return SolverObserver(
        name=name,
        extractor=lambda sol: sol.performance.equality_constraints_sse,
    )


def multiplier_observer(name: str = "multipliers") -> SolverObserver:
    """Probe of AL multipliers (reference SolverObserver multiplier
    callbacks)."""
    return SolverObserver(name=name, extractor=lambda sol: sol.al)


@dataclasses.dataclass
class PerformanceLog:
    """Per-solve PerformanceIndex history (SolverBase performanceIndeces_)."""

    entries: List[PerformanceIndex] = dataclasses.field(default_factory=list)

    def append(self, perf: PerformanceIndex) -> None:
        self.entries.append(jax.tree.map(lambda a: float(np.asarray(a)), perf))

    def latest(self) -> Optional[PerformanceIndex]:
        return self.entries[-1] if self.entries else None

    def as_arrays(self) -> Dict[str, np.ndarray]:
        if not self.entries:
            return {}
        return {
            field: np.asarray([getattr(e, field) for e in self.entries])
            for field in PerformanceIndex._fields
        }


def benchmark_report(timers: Dict[str, RepeatedTimer]) -> str:
    """Percentage breakdown string (getBenchmarkingInfo analogue,
    GaussNewtonDDP.cpp:140-165)."""
    total = sum(t.total for t in timers.values()) or 1.0
    lines = ["Benchmarking [ms and % of total]:"]
    for name, t in timers.items():
        lines.append(
            f"  {name:<24s} avg {t.average * 1e3:8.3f} ms  "
            f"max {t.max * 1e3:8.3f} ms  ({100.0 * t.total / total:5.1f}%)"
        )
    return "\n".join(lines)
