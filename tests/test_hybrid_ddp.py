"""State-triggered hybrid DDP tests — the bouncing-mass analogue.

Mirrors the reference's hybrid solver coverage: event detection + SLQ
optimizing through state-triggered mode changes
(ocs2_ddp/test/bouncingmass/BouncingMassTest.cpp, HybridSlqTest.cpp) and the
traced event-grid construction backing it
(TimeDiscretization.h:75 timeDiscretizationWithEvents — here with traced
event values, oc/time_discretization.make_event_grid_traced).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.oc.hybrid_rollout import HybridSystem, rollout_state_triggered
from ocs2_tpu.oc.problem import OptimalControlProblem, quadratic_cost
from ocs2_tpu.oc.time_discretization import make_event_grid_traced, make_time_grid
from ocs2_tpu.solvers import ddp
from ocs2_tpu.solvers.hybrid_ddp import solve_state_triggered

G = 9.81
RESTITUTION = 0.8


def _ball_system() -> HybridSystem:
    """Bouncing ball: x = (height, velocity), thrust input; bounce at h = 0
    reverses velocity with restitution and increments the mode counter."""

    def dynamics(t, x, u, p, mode):
        return jnp.array([x[1], u[0] - G])

    def guard(t, x, p, mode):
        return x[0]  # positive above ground

    def jump(t, x, p, mode):
        return jnp.array([1e-4, -RESTITUTION * x[1]]), mode + 1

    return HybridSystem(dynamics=dynamics, guard=guard, jump=jump)


def _ball_problem() -> OptimalControlProblem:
    def dynamics(t, x, u, p):
        return jnp.array([x[1], u[0] - G])

    def jump_map(t, x, p):
        return jnp.array([1e-4, -RESTITUTION * x[1]])

    return OptimalControlProblem(
        dynamics=dynamics,
        jump_map=jump_map,
        cost_terms=(
            quadratic_cost(jnp.diag(jnp.array([4.0, 0.1])), 0.05 * jnp.eye(1)),
        ),
        nx=2,
        nu=1,
    )


class TestTracedEventGrid:
    def test_matches_host_grid_semantics(self):
        ev = jnp.array([0.45, 1.17])
        grid = make_event_grid_traced(
            0.0, 1.5, 20, ev, jnp.array([0, 1, 2], jnp.int32)
        )
        assert grid.times.shape == (20 + 2 * 2 + 1,)
        assert float(jnp.sum(grid.is_jump)) == 2.0
        # Jump intervals are zero-length and located at the event times.
        k = np.where(np.asarray(grid.is_jump) > 0)[0]
        np.testing.assert_allclose(
            np.asarray(grid.times)[k], [0.45, 1.17], atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(grid.times)[k + 1], np.asarray(grid.times)[k], atol=1e-6
        )
        # Mode advances across each jump.
        m = np.asarray(grid.modes)
        assert m[0] == 0 and m[-1] == 2

    def test_inactive_slots_are_inert(self):
        ev = jnp.array([0.5, jnp.inf, jnp.inf])
        grid = make_event_grid_traced(
            0.0, 1.0, 10, ev, jnp.zeros(4, jnp.int32)
        )
        assert float(jnp.sum(grid.is_jump)) == 1.0
        assert grid.times.shape == (10 + 6 + 1,)
        # times stay sorted and end at tf
        t = np.asarray(grid.times)
        assert np.all(np.diff(t) >= 0) and t[-1] == 1.0

    def test_event_on_base_node_single_jump(self):
        """An event exactly on a base node must still mark exactly one jump."""
        ev = jnp.array([0.5])
        grid = make_event_grid_traced(0.0, 1.0, 10, ev, jnp.zeros(2, jnp.int32))
        assert float(jnp.sum(grid.is_jump)) == 1.0

    def test_jittable(self):
        f = jax.jit(
            lambda e: make_event_grid_traced(
                0.0, 1.0, 10, e, jnp.zeros(3, jnp.int32)
            ).times
        )
        t1 = f(jnp.array([0.3, 0.7]))
        t2 = f(jnp.array([0.2, jnp.inf]))  # same shapes, no retrace needed
        assert t1.shape == t2.shape


class TestBouncingMass:
    def test_event_detection_matches_analytic(self):
        """Free-fall bounce times: t1 = sqrt(2 h0 / g), then kinematics with
        restitution — the reference's StateTriggeredRollout ground truth."""
        sys_ = _ball_system()
        traj = jax.jit(
            lambda x0: rollout_state_triggered(
                sys_, 0.0, x0, lambda t, x, k: jnp.zeros(1), 0.0125, 120, {}
            )
        )(jnp.array([1.0, 0.0]))
        t1 = float(np.sqrt(2 * 1.0 / G))
        v1 = RESTITUTION * G * t1
        t2 = t1 + 2 * v1 / G
        ev = np.asarray(traj.event_times)[np.asarray(traj.event_mask) > 0]
        assert len(ev) >= 2
        assert abs(ev[0] - t1) < 2e-3, (ev[0], t1)
        assert abs(ev[1] - t2) < 2e-2, (ev[1], t2)
        # Mode counter incremented per bounce.
        assert int(traj.modes[-1]) >= 2

    def test_hybrid_ddp_optimizes_through_bounce(self):
        """The solver's grid events must match the events its own optimized
        policy triggers (self-consistency — the property HybridSlqTest
        checks via its ReferenceManager synchronization)."""
        sys_ = _ball_system()
        problem = _ball_problem()
        x0 = jnp.array([1.0, 0.0])
        params = {
            "target": __import__(
                "ocs2_tpu.core.reference", fromlist=["TargetTrajectories"]
            ).TargetTrajectories.constant(jnp.array([0.8, 0.0]), jnp.zeros(1)),
        }
        st = ddp.DdpSettings(max_iterations=25, min_rel_cost=1e-4)
        sol = jax.jit(
            lambda x: solve_state_triggered(
                sys_, problem, 0.0, 1.2, x, params,
                num_base_intervals=40, max_events=3, outer_rounds=3,
                settings=st,
            )
        )(x0)
        # The solve produced a finite, improved trajectory.
        assert np.isfinite(float(sol.ddp.performance.cost))
        assert bool(jnp.all(jnp.isfinite(sol.ddp.xs)))

        # Self-consistency: events in the grid == events the final policy
        # actually triggers, within the rollout resolution.
        grid_ev = np.asarray(sol.event_times)
        grid_ev = grid_ev[np.isfinite(grid_ev)]
        final_ev = np.asarray(sol.rollout.event_times)[
            np.asarray(sol.rollout.event_mask) > 0
        ]
        dt_roll = 1.2 / 80
        assert len(final_ev) >= 1  # gravity guarantees at least one bounce
        for ge in grid_ev:
            assert np.min(np.abs(final_ev - ge)) < 4 * dt_roll, (grid_ev, final_ev)

        # Optimized policy beats free fall on the tracking objective.
        from ocs2_tpu.oc.metrics import evaluate_trajectory
        from ocs2_tpu.oc.rollout import open_loop_policy, rollout

        xs0, us0 = rollout(
            problem, sol.grid, x0,
            open_loop_policy(jnp.zeros_like(sol.ddp.us)), params,
        )
        m0 = evaluate_trajectory(problem, sol.grid, xs0, us0, params)
        assert float(sol.ddp.performance.cost) < float(m0.cost)


class TestPendulumWall:
    """Multi-dimensional state-triggered fixture: a pendulum bouncing off a
    wall (the reference's pendulum_dynamics_staterollout.h analogue,
    ocs2_oc/test/include/ocs2_oc/test/pendulum_dynamics_staterollout.h +
    HybridSlqTest.cpp) — nonlinear 2D dynamics, guard on the angle, jump on
    the angular velocity."""

    WALL = -0.2
    E_REST = 0.85
    L = 1.0

    def _system(self):
        def dynamics(t, x, u, p, mode):
            return jnp.array([x[1], -G / self.L * jnp.sin(x[0]) + u[0]])

        def guard(t, x, p, mode):
            return x[0] - self.WALL  # positive while right of the wall

        def jump(t, x, p, mode):
            return jnp.array([self.WALL + 1e-4, -self.E_REST * x[1]]), mode + 1

        return HybridSystem(dynamics=dynamics, guard=guard, jump=jump)

    def _problem(self):
        def dynamics(t, x, u, p):
            return jnp.array([x[1], -G / self.L * jnp.sin(x[0]) + u[0]])

        def jump_map(t, x, p):
            return jnp.array([self.WALL + 1e-4, -self.E_REST * x[1]])

        return OptimalControlProblem(
            dynamics=dynamics,
            jump_map=jump_map,
            cost_terms=(
                quadratic_cost(
                    jnp.diag(jnp.array([6.0, 0.3])), 0.02 * jnp.eye(1)
                ),
            ),
            nx=2,
            nu=1,
        )

    def test_free_swing_hits_wall(self):
        sys_ = self._system()
        traj = jax.jit(
            lambda x0: rollout_state_triggered(
                sys_, 0.0, x0, lambda t, x, k: jnp.zeros(1), 0.01, 150, {}
            )
        )(jnp.array([0.8, 0.0]))
        ev = np.asarray(traj.event_times)[np.asarray(traj.event_mask) > 0]
        assert len(ev) >= 1  # swings down through the wall angle
        # After the bounce the velocity reversed (position stays right of
        # the wall for a while).
        assert int(traj.modes[-1]) >= 1

    def test_hybrid_ddp_pendulum_event_drift_converges(self):
        """The outer loop's detected event times must become stationary
        (drift decreasing / below tolerance) — the switching-time
        stationarity the reference checks in HybridSlqTest."""
        from ocs2_tpu.core.reference import TargetTrajectories

        sys_ = self._system()
        problem = self._problem()
        x0 = jnp.array([0.8, 0.0])
        params = {
            "target": TargetTrajectories.constant(
                jnp.array([0.4, 0.0]), jnp.zeros(1)
            )
        }
        st = ddp.DdpSettings(max_iterations=25, min_rel_cost=1e-4)
        sol = jax.jit(
            lambda x: solve_state_triggered(
                sys_, problem, 0.0, 1.5, x, params,
                num_base_intervals=50, max_events=2, outer_rounds=4,
                settings=st,
            )
        )(x0)
        assert bool(jnp.all(jnp.isfinite(sol.ddp.xs)))
        drift = np.asarray(sol.event_drift)
        # Drift is reported per round (round 0 has no predecessor -> NaN)
        # and the final round's drift is small: events stopped moving.
        finite = drift[np.isfinite(drift)]
        assert len(finite) >= 1
        assert finite[-1] < 0.06, drift

    def test_event_tol_early_stop_outside_jit(self):
        """event_tol cuts outer rounds when events are stationary (host
        path only; under jit all rounds are traced)."""
        from ocs2_tpu.core.reference import TargetTrajectories

        sys_ = self._system()
        problem = self._problem()
        params = {
            "target": TargetTrajectories.constant(
                jnp.array([0.4, 0.0]), jnp.zeros(1)
            )
        }
        st = ddp.DdpSettings(max_iterations=15, min_rel_cost=1e-4)
        sol = solve_state_triggered(
            sys_, problem, 0.0, 1.5, jnp.array([0.8, 0.0]), params,
            num_base_intervals=40, max_events=2, outer_rounds=6,
            settings=st, event_tol=0.05,
        )
        assert int(sol.rounds_run) <= 6
        # If it stopped early, the last recorded drift was below tolerance.
        drift = np.asarray(sol.event_drift)
        finite = drift[np.isfinite(drift)]
        if int(sol.rounds_run) < 6:
            assert finite[-1] < 0.05
