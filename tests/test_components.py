"""Tests for loopshaping, config, CARE, observers, collision, perceptive —
the reference's long-tail subsystems (ocs2_core/test/loopshaping/*,
LoadData, ContinuousTimeLqr, SolverObserver, ocs2_sphere_approximation,
ocs2_perceptive)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models import double_integrator
from ocs2_tpu.oc.loopshaping import (
    LoopshapingDefinition,
    augment_observation,
    first_order_filter,
    split_state,
    wrap_problem,
)
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.ops.care import solve_care
from ocs2_tpu.solvers import sqp
from ocs2_tpu.utils.config import (
    camel_to_snake,
    load_matrix,
    load_settings,
    parse_info,
)


class TestLoopshaping:
    def test_augmented_solve_matches_unfiltered_limit(self):
        """With an all-pass filter (C=0, D=I, fast pole) the augmented problem
        must reproduce the original solution (reference loopshaping tests
        compare wrapped vs manually augmented systems)."""
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        nu = problem.nu
        # Pole chosen grid-stable (|pole|*dt = 0.5 < RK stability bound);
        # with C = 0 the filter state is decoupled, so the pole value does
        # not change the plant solution — only the conditioning.
        defn = LoopshapingDefinition(
            A=-10.0 * jnp.eye(nu),
            B=jnp.eye(nu),
            C=jnp.zeros((nu, nu)),
            D=jnp.eye(nu),
        )
        aug = wrap_problem(problem, defn)
        assert aug.nx == problem.nx + nu
        grid = uniform_grid(0.0, 2.0, 40)
        x0 = jnp.array([1.0, 0.0])
        x0_aug = augment_observation(defn, x0, jnp.zeros(nu))
        sol_aug = jax.jit(
            lambda x: sqp.solve(aug, grid, x, params)
        )(x0_aug)
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params)
        )(x0)
        # With u = D v the plant sees v directly; trajectories must agree.
        assert np.allclose(
            sol_aug.xs[:, : problem.nx], sol.xs, atol=2e-2
        ), np.abs(np.asarray(sol_aug.xs[:, : problem.nx]) - np.asarray(sol.xs)).max()

    def test_filter_smooths_input(self):
        """A strictly-proper filter (D=0) makes the plant input a filter
        state: the resulting plant input trajectory is smoother (bounded
        derivative), the point of loopshaping."""
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        nu = problem.nu
        defn = LoopshapingDefinition(
            A=-5.0 * jnp.eye(nu),
            B=5.0 * jnp.eye(nu),
            C=jnp.eye(nu),
            D=jnp.zeros((nu, nu)),
            R_v=0.01 * jnp.eye(nu),
        )
        aug = wrap_problem(problem, defn)
        grid = uniform_grid(0.0, 2.0, 40)
        x0_aug = jnp.array([1.0, 0.0, 0.0])
        sol = jax.jit(lambda x: sqp.solve(aug, grid, x, params))(x0_aug)
        # Plant input = filter state xi; it starts at the given xi0 exactly.
        _, xi0 = split_state(defn, sol.xs[0])
        assert float(jnp.abs(xi0[0])) < 1e-6
        assert bool(jnp.all(jnp.isfinite(sol.xs)))

    def test_first_order_filter_shapes(self):
        defn = first_order_filter(3, pole=20.0, zero=2.0)
        assert defn.A.shape == (3, 3)
        assert defn.num_filtered_inputs == 3

    def test_eliminate_pattern_matches_output_pattern(self):
        """eliminatePattern (D=0: u is a pure filter-state function, original
        state-input terms become state-only terms) solves the same shaped
        problem as outputPattern — same plant trajectory, but constraints and
        costs land in the state-only slots (reference
        LoopshapingDefinition.h:44 isEliminateInputs path)."""
        problem = double_integrator.make_problem()
        params = double_integrator.make_params()
        nu = problem.nu
        defn = LoopshapingDefinition(
            A=-5.0 * jnp.eye(nu),
            B=5.0 * jnp.eye(nu),
            C=jnp.eye(nu),
            D=jnp.zeros((nu, nu)),
            R_v=0.01 * jnp.eye(nu),
        )
        aug_out = wrap_problem(problem, defn, pattern="output")
        aug_eli = wrap_problem(problem, defn, pattern="eliminate")
        # Classification: the original running cost moved to the state slot.
        assert len(aug_eli.equality_terms) == 0
        assert len(aug_eli.state_cost_terms) == len(problem.cost_terms)
        grid = uniform_grid(0.0, 2.0, 40)
        x0_aug = jnp.array([1.0, 0.0, 0.0])
        s_out = jax.jit(lambda x: sqp.solve(aug_out, grid, x, params))(x0_aug)
        s_eli = jax.jit(lambda x: sqp.solve(aug_eli, grid, x, params))(x0_aug)
        assert np.allclose(
            np.asarray(s_out.xs), np.asarray(s_eli.xs), atol=2e-2
        ), np.abs(np.asarray(s_out.xs) - np.asarray(s_eli.xs)).max()

    def test_eliminate_pattern_requires_proper_filter(self):
        import pytest as _pytest

        problem = double_integrator.make_problem()
        nu = problem.nu
        improper = LoopshapingDefinition(
            A=-5.0 * jnp.eye(nu), B=jnp.eye(nu), C=jnp.eye(nu),
            D=jnp.eye(nu), R_v=jnp.eye(nu),
        )
        with _pytest.raises(AssertionError):
            wrap_problem(problem, improper, pattern="eliminate")


class TestConfig:
    INFO = """
    ; task file in the reference .info grammar
    mpc
    {
      timeHorizon        2.5
      numIntervals       32
      coldStart          true
      solver             sqp
    }
    sqp
    {
      maxIterations      7
      integrator         rk4
      armijoFactor       1e-3
    }
    Q
    {
      scaling 2e0
      (0,0) 1.0
      (1,1) 3.0
    }
    x_init
    {
      (0) 0.5
      (1) -0.5
    }
    """

    def test_parse_and_settings(self):
        tree = parse_info(self.INFO)
        st = load_settings(tree, "sqp", sqp.SqpSettings)
        assert st.max_iterations == 7
        assert st.integrator == "rk4"
        assert abs(st.armijo_factor - 1e-3) < 1e-12
        # Unlisted fields keep defaults.
        assert st.num_alphas == sqp.SqpSettings().num_alphas

    def test_matrices_and_vectors(self):
        tree = parse_info(self.INFO)
        q = load_matrix(tree, "Q", (2, 2))
        np.testing.assert_allclose(np.asarray(q), [[2.0, 0.0], [0.0, 6.0]])
        v = load_matrix(tree, "x_init", (2,))
        np.testing.assert_allclose(np.asarray(v), [0.5, -0.5])

    def test_camel_to_snake(self):
        assert camel_to_snake("timeHorizon") == "time_horizon"
        assert camel_to_snake("useFeedbackPolicy") == "use_feedback_policy"


class TestCare:
    def test_double_integrator_care(self):
        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        B = jnp.array([[0.0], [1.0]])
        Q = jnp.eye(2)
        R = jnp.eye(1)
        sol = jax.jit(lambda: solve_care(A, B, Q, R))()
        assert float(sol.residual) < 1e-3
        # Known analytic solution: P = [[sqrt(3), 1], [1, sqrt(3)]].
        expect = np.array([[np.sqrt(3.0), 1.0], [1.0, np.sqrt(3.0)]])
        np.testing.assert_allclose(np.asarray(sol.P), expect, atol=1e-3)
        # Closed loop stable.
        eig = np.linalg.eigvals(np.asarray(A - B @ sol.K))
        assert np.all(eig.real < 0)


class TestCollision:
    def test_sphere_distances(self):
        from ocs2_tpu.models.collision import SphereModel

        model = SphereModel.create(
            spheres=[(0, [0.0, 0.0, 0.0], 0.1), (1, [0.0, 0.0, 0.0], 0.2)],
            pair_frames=[(0, 1)],
        )
        rots = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        d = model.distances(rots, pos)
        np.testing.assert_allclose(np.asarray(d), [1.0 - 0.3], atol=1e-6)

    def test_gradient_finite(self):
        from ocs2_tpu.models.collision import SphereModel

        model = SphereModel.create(
            spheres=[(0, [0.0, 0.0, 0.0], 0.1), (1, [0.0, 0.0, 0.0], 0.1)],
            pair_frames=[(0, 1)],
        )

        def dist(pos1):
            rots = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
            pos = jnp.stack([jnp.zeros(3), pos1])
            return model.distances(rots, pos)[0]

        g = jax.grad(dist)(jnp.array([0.5, 0.0, 0.0]))
        assert bool(jnp.all(jnp.isfinite(g)))
        np.testing.assert_allclose(np.asarray(g), [1.0, 0.0, 0.0], atol=1e-5)


class TestPerceptive:
    def test_sdf_roundtrip(self):
        from ocs2_tpu.models.perceptive import signed_distance_field

        occ = np.zeros((16, 16, 8), bool)
        occ[8:, :, :] = True  # wall at x >= 8
        sdf = signed_distance_field(jnp.asarray(occ), [0.0, 0.0, 0.0], 0.1)
        # Query in free space, 3 cells from the wall boundary.
        d = float(sdf.query(jnp.array([0.5, 0.8, 0.4])))
        assert abs(d - 0.3) < 0.11, d
        # Inside the wall: negative.
        d_in = float(sdf.query(jnp.array([1.2, 0.8, 0.4])))
        assert d_in < 0.0

    def test_sdf_gradient_points_away_from_obstacle(self):
        from ocs2_tpu.models.perceptive import signed_distance_field

        occ = np.zeros((16, 16, 8), bool)
        occ[8:, :, :] = True
        sdf = signed_distance_field(jnp.asarray(occ), [0.0, 0.0, 0.0], 0.1)
        g = sdf.gradient(jnp.array([0.5, 0.8, 0.4]))
        assert float(g[0]) < 0.0  # distance decreases toward +x wall


class TestObservers:
    def test_performance_log_and_report(self):
        from ocs2_tpu.core.types import PerformanceIndex
        from ocs2_tpu.utils.observers import (
            PerformanceLog,
            benchmark_report,
            constraint_observer,
        )
        from ocs2_tpu.utils.timers import RepeatedTimer

        log = PerformanceLog()
        log.append(PerformanceIndex.zeros())
        assert log.latest().cost == 0.0
        assert "merit" in log.as_arrays()

        t = RepeatedTimer()
        t.record(0.01)
        t.record(0.02)
        rep = benchmark_report({"solve": t})
        assert "solve" in rep and "%" in rep

        class FakeSol:
            class performance:
                equality_constraints_sse = jnp.asarray(0.5)

        obs = constraint_observer()
        obs.observe(0.0, FakeSol())
        assert obs.latest()[1] == 0.5
