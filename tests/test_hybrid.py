"""Hybrid-systems tests: state-triggered rollout (reference
ocs2_oc/test/rollout/testStateTriggeredRollout.cpp — bouncing ball),
trajectory spreading (TrajectorySpreadingTest.cpp), and switch-time
gradients (ocs2_ocs2 GDDP tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.core.reference import ModeSchedule
from ocs2_tpu.oc.hybrid_rollout import HybridSystem, rollout_state_triggered
from ocs2_tpu.oc.spreading import (
    match_event_times,
    mode_schedules_differ,
    spread_trajectories,
    warp_times,
)


def make_bouncing_ball(restitution=0.9):
    """Reference fixture ball_dynamics_staterollout.h: free fall, bounce at
    z = 0 with velocity restitution."""

    def dynamics(t, x, u, p, mode):
        return jnp.array([x[1], -9.81])

    def guard(t, x, p, mode):
        return x[0]  # positive above ground

    def jump(t, x, p, mode):
        return jnp.array([1e-6, -restitution * x[1]]), mode + 1

    return HybridSystem(dynamics=dynamics, guard=guard, jump=jump)


class TestStateTriggeredRollout:
    def test_bounce_times_match_analytic(self):
        sys = make_bouncing_ball(0.9)
        x0 = jnp.array([1.0, 0.0])
        traj = jax.jit(
            lambda x: rollout_state_triggered(
                sys, 0.0, x, lambda t, xx, k: jnp.zeros(1), dt=0.02,
                num_steps=100, params={},
            )
        )(x0)
        # First impact: t* = sqrt(2 h / g).
        t_star = float(np.sqrt(2.0 / 9.81))
        events = np.asarray(traj.event_times)[np.asarray(traj.event_mask) > 0.5]
        assert len(events) >= 2  # at least two bounces in 2 s
        assert abs(events[0] - t_star) < 1e-3, (events[0], t_star)
        # Post-bounce speed = restitution * impact speed.
        k = int(np.nonzero(np.asarray(traj.event_mask) > 0.5)[0][0])
        v_post = float(traj.xs[k + 1, 1])
        assert abs(v_post - 0.9 * 9.81 * t_star) / (9.81 * t_star) < 0.05
        # Ball never penetrates significantly.
        assert float(jnp.min(traj.xs[:, 0])) > -1e-2
        # Mode counter incremented per bounce.
        assert int(traj.modes[-1]) == len(events)


class TestTrajectorySpreading:
    def test_event_matching_and_warp(self):
        old = ModeSchedule.create([0.5, 1.0], [0, 1, 0], capacity=4)
        new = ModeSchedule.create([0.6, 1.1], [0, 1, 0], capacity=4)
        a_new, a_old = match_event_times(old, new, 0.0, 2.0)
        np.testing.assert_allclose(a_new, [0.6, 1.1])
        np.testing.assert_allclose(a_old, [0.5, 1.0])
        # Warped times hit the old events exactly at the new events.
        tq = warp_times(jnp.array([0.0, 0.6, 1.1, 2.0]), a_new, a_old)
        np.testing.assert_allclose(
            np.asarray(tq), [0.0, 0.5, 1.0, 1.9], atol=1e-6
        )

    def test_spread_preserves_mode_alignment(self):
        """A mode-dependent signal sampled through the warp stays aligned with
        the shifted mode schedule."""
        old = ModeSchedule.create([1.0], [0, 1], capacity=2)
        new = ModeSchedule.create([1.2], [0, 1], capacity=2)
        times = jnp.linspace(0.0, 2.0, 41)
        # Signal = mode indicator under the OLD schedule.
        xs = (times >= 1.0).astype(jnp.float32)[:, None]
        us = xs[:-1]
        new_times = jnp.linspace(0.0, 2.0, 41)
        xs_s, us_s = spread_trajectories(times, xs, us, old, new, new_times)
        # After spreading, the indicator must flip at the NEW event time 1.2.
        flip = float(new_times[int(np.argmax(np.asarray(xs_s[:, 0]) > 0.5))])
        assert abs(flip - 1.2) < 0.11, flip

    def test_differ_check(self):
        a = ModeSchedule.create([0.5], [0, 1], capacity=2)
        b = ModeSchedule.create([0.6], [0, 1], capacity=2)
        assert mode_schedules_differ(a, b)
        assert not mode_schedules_differ(a, a)


class TestSwitchTimeGradient:
    def test_gradient_matches_finite_difference(self):
        """EXP0-style switched linear system: dJ/d(theta) from the Hamiltonian
        jump must match finite differences of the solved cost."""
        import dataclasses

        from ocs2_tpu.oc.problem import OptimalControlProblem
        from ocs2_tpu.oc.time_discretization import make_time_grid
        from ocs2_tpu.solvers import sqp
        from ocs2_tpu.solvers.switch_time import switch_time_gradients

        A0 = jnp.array([[-0.1, 1.0], [0.0, -0.2]])
        A1 = jnp.array([[-0.5, 0.0], [1.0, -0.1]])
        B = jnp.array([[0.0], [1.0]])

        def dynamics(t, x, u, p):
            a = jax.lax.switch(p["mode"], [lambda: A0, lambda: A1])
            return a @ x + B @ u

        def cost(t, x, u, p):
            return 0.5 * (x @ x) + 0.5 * (u @ u)

        problem = OptimalControlProblem(
            dynamics=dynamics, cost_terms=(cost,), nx=2, nu=1
        )
        x0 = jnp.array([1.0, 0.0])
        n = 40

        def solve_cost(theta):
            grid = make_time_grid(
                0.0, 2.0, n, event_times=[theta], mode_sequence=[0, 1]
            )
            sol = sqp.solve(
                problem, grid, x0, {},
                settings=sqp.SqpSettings(max_iterations=15),
            )
            return sol, grid

        theta = 0.9
        sol, grid = solve_cost(theta)
        g_nodes = switch_time_gradients(
            problem, grid, sol.xs, sol.us, sol.value_s, {}
        )
        g = float(jnp.sum(g_nodes))

        eps = 0.02
        cp = float(solve_cost(theta + eps)[0].performance.cost)
        cm = float(solve_cost(theta - eps)[0].performance.cost)
        fd = (cp - cm) / (2 * eps)
        assert abs(g - fd) < 0.25 * max(abs(fd), 0.1), (g, fd)


class TestJumpMap:
    def test_sqp_ddp_agree_with_jump(self):
        """Bouncing-mass analogue (reference ocs2_ddp/test/bouncingmass/
        BouncingMassTest.cpp): LQ problem with a linear state jump at a fixed
        event time; SQP and DDP must agree and the jump node must satisfy the
        jump map exactly."""
        import dataclasses

        from ocs2_tpu.models import double_integrator
        from ocs2_tpu.oc.time_discretization import make_time_grid
        from ocs2_tpu.solvers import ddp, sqp

        J = jnp.array([[1.0, 0.0], [0.0, -0.8]])  # velocity restitution

        def jump_map(t, x, p):
            return J @ x

        problem = dataclasses.replace(
            double_integrator.make_problem(), jump_map=jump_map
        )
        params = double_integrator.make_params()
        grid = make_time_grid(
            0.0, 2.0, 40, event_times=[1.0], mode_sequence=[0, 1]
        )
        x0 = jnp.array([1.0, 0.5])
        s1 = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params,
                                settings=sqp.SqpSettings(max_iterations=10))
        )(x0)
        s2 = jax.jit(
            lambda x: ddp.solve(problem, grid, x, params,
                                settings=ddp.DdpSettings(max_iterations=20))
        )(x0)
        # Jump transition satisfied: x_{k+1} = J x_k at the event node.
        k = int(np.argmax(np.asarray(grid.is_jump)))
        np.testing.assert_allclose(
            np.asarray(s1.xs[k + 1]), np.asarray(J @ s1.xs[k]), atol=1e-4
        )
        # Duplicated node times at the event.
        assert float(grid.times[k + 1] - grid.times[k]) == 0.0
        # Cross-solver agreement.
        assert np.allclose(s1.us, s2.us, atol=5e-2), np.abs(
            np.asarray(s1.us) - np.asarray(s2.us)
        ).max()
