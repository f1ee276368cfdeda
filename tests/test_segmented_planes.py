"""Segmented-planes perceptive stack tests: convex planar decomposition of
the elevation map, polygon projection queries, foothold planning with
terrain-adaptive swing, and closed-loop perceptive MPC over a step.

Mirrors the reference perceptive-anymal production pipeline:
SegmentedPlanesTerrainModel.h:15 (plane segmentation consumption),
ConvexTerrain.h (projectToConvex2dPolygonBoundary),
foot_planner/SwingTrajectoryPlanner.h (selectHeuristicFootholds ->
selectNominalFootholdTerrain -> terrain-adaptive SwingPhase),
FootPhase.h (tangentialConstraintsFromConvexTerrain),
constraint/FootNormalConstraint.h.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.core.reference import TargetTrajectories
from ocs2_tpu.models.legged_robot import interface, model
from ocs2_tpu.models.legged_robot.foothold_planner import (
    FootholdPlannerSettings,
    PerceptiveReferenceManager,
    _closest_segment_np,
    make_perceptive_params,
    make_segmented_perceptive_problem,
    plan_footholds,
)
from ocs2_tpu.models.legged_robot.gait import (
    GaitSchedule,
    contact_flags_static,
    trot_gait,
)
from ocs2_tpu.models.legged_robot.segmented_planes import (
    SegmentedPlanesTerrain,
    closest_segment,
    decompose_planes,
    project_to_polygon_2d,
    project_to_segment,
    tangential_constraint,
)
from ocs2_tpu.models.legged_robot.terrain import ElevationMap
from ocs2_tpu.oc.time_discretization import make_time_grid
from ocs2_tpu.solvers import sqp

STEP_X, STEP_H = 0.45, 0.08


def stepped_terrain(step_x=STEP_X, high=STEP_H, extent=4.0, res=0.05):
    n = int(extent / res)
    h = np.zeros((n, n), np.float32)
    xs = -extent / 2 + (np.arange(n) + 0.5) * res
    h[xs > step_x, :] = high
    return ElevationMap.create(h, origin_xy=(-extent / 2, -extent / 2), resolution=res)


def sloped_terrain(grade=0.3, extent=2.0, res=0.05):
    n = int(extent / res)
    xs = (np.arange(n) + 0.5) * res
    h = np.broadcast_to(grade * xs[:, None], (n, n)).astype(np.float32)
    return ElevationMap.create(h, origin_xy=(0.0, 0.0), resolution=res)


class TestDecomposition:
    def test_step_gives_two_level_segments(self):
        terr = decompose_planes(stepped_terrain())
        valid = np.asarray(terr.valid)
        assert valid.sum() == 2
        zs = sorted(float(terr.plane_point[k, 2]) for k in range(2))
        assert zs[0] == pytest.approx(0.0, abs=5e-3)
        assert zs[1] == pytest.approx(STEP_H, abs=5e-3)
        for k in range(2):
            np.testing.assert_allclose(
                np.asarray(terr.plane_normal[k]), [0, 0, 1], atol=1e-3
            )

    def test_slope_normal_matches_analytic(self):
        grade = 0.3
        terr = decompose_planes(sloped_terrain(grade))
        assert bool(terr.valid[0])
        expect = np.array([-grade, 0.0, 1.0])
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(
            np.asarray(terr.plane_normal[0]), expect, atol=5e-3
        )

    def test_max_vertices_respected(self):
        terr = decompose_planes(stepped_terrain(), max_vertices=6)
        nv = np.asarray(terr.num_vertices)[np.asarray(terr.valid)]
        assert (nv <= 6).all() and (nv >= 3).all()

    def test_padded_slots_are_inert(self):
        terr = decompose_planes(stepped_terrain(), max_segments=8)
        # Invalid slots never win the closest-segment race.
        k, _ = closest_segment(terr, jnp.array([0.0, 0.0, 0.0]))
        assert bool(terr.valid[k])


class TestPolygonQueries:
    def _square(self):
        # Unit CCW square, padded to V=6 by repeating the last vertex.
        b = np.array(
            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 1], [0, 1]], np.float32
        )
        return jnp.asarray(b), jnp.asarray(4, jnp.int32)

    def test_inside_point_negative(self):
        b, nv = self._square()
        sq, img = project_to_polygon_2d(b, nv, jnp.array([0.5, 0.5]))
        assert float(sq) < 0.0
        # Image is the closest boundary point (distance 0.5 to any edge).
        assert float(jnp.abs(sq)) == pytest.approx(0.25, abs=1e-5)

    def test_outside_point_projects_to_edge(self):
        b, nv = self._square()
        sq, img = project_to_polygon_2d(b, nv, jnp.array([1.5, 0.5]))
        assert float(sq) == pytest.approx(0.25, abs=1e-5)
        np.testing.assert_allclose(np.asarray(img), [1.0, 0.5], atol=1e-5)

    def test_outside_corner_projects_to_vertex(self):
        b, nv = self._square()
        sq, img = project_to_polygon_2d(b, nv, jnp.array([-1.0, -1.0]))
        np.testing.assert_allclose(np.asarray(img), [0.0, 0.0], atol=1e-5)
        assert float(sq) == pytest.approx(2.0, abs=1e-4)

    def test_closest_segment_picks_level(self):
        terr = decompose_planes(stepped_terrain())
        k_lo, p_lo = closest_segment(terr, jnp.array([0.0, 0.0, 0.0]))
        k_hi, p_hi = closest_segment(terr, jnp.array([1.5, 0.0, 0.0]))
        assert int(k_lo) != int(k_hi)
        assert float(p_lo[2]) == pytest.approx(0.0, abs=5e-3)
        assert float(p_hi[2]) == pytest.approx(STEP_H, abs=5e-3)

    def test_host_mirror_agrees_with_device(self):
        terr = decompose_planes(stepped_terrain())
        rng = np.random.default_rng(0)
        for _ in range(10):
            p = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5), 0.02])
            k_np, proj_np = _closest_segment_np(terr, p)
            k_j, proj_j = closest_segment(terr, jnp.asarray(p, jnp.float32))
            assert int(k_j) == k_np
            np.testing.assert_allclose(np.asarray(proj_j), proj_np, atol=1e-4)

    def test_tangential_rows_separate_in_out(self):
        terr = decompose_planes(stepped_terrain())
        k, proj = closest_segment(terr, jnp.array([0.0, 0.0, 0.0]))
        A, b = tangential_constraint(terr, k)
        inside = np.asarray(A @ proj + b)
        assert (inside >= -1e-3).all()
        # A point on the OTHER side of the step is outside this polygon.
        far = jnp.array([1.5, 0.0, 0.0])
        outside = np.asarray(A @ far + b)
        real = np.arange(A.shape[0]) < int(terr.num_vertices[k])
        assert (outside[real] < 0.0).any()

    def test_project_to_segment_lands_on_plane(self):
        terr = decompose_planes(sloped_terrain(0.3))
        p = jnp.array([1.0, 1.0, 0.9])  # above the slope
        proj = project_to_segment(terr, jnp.asarray(0), p)
        n = np.asarray(terr.plane_normal[0])
        pt = np.asarray(terr.plane_point[0])
        assert abs(float((np.asarray(proj) - pt) @ n)) < 1e-4


def _trot_grid(horizon=1.4, n=46):
    gs = GaitSchedule(trot_gait(0.7))
    ms = gs.mode_schedule(0.0, horizon)
    return make_time_grid(
        0.0, horizon, n,
        event_times=np.asarray(ms.event_times),
        mode_sequence=np.asarray(ms.mode_sequence),
    ), gs


def _walk_target(horizon, goal_x=0.85):
    x0 = model.default_state()
    x_goal = x0.at[6].set(goal_x).at[8].set(model.STAND_HEIGHT + STEP_H)
    u0 = model.weight_compensating_input(jnp.ones(4))
    return TargetTrajectories.create(
        times=[0.0, horizon],
        states=jnp.stack([x0.at[0].set(0.6), x_goal.at[0].set(0.6)]),
        inputs=jnp.stack([u0, u0]),
    )


class TestFootholdPlan:
    def _plan(self):
        em = stepped_terrain()
        terr = decompose_planes(em)
        grid, _ = _trot_grid()
        x0 = model.default_state()
        target = _walk_target(1.4)
        plan = plan_footholds(
            terr, em, np.asarray(grid.times), np.asarray(grid.modes), x0, target
        )
        return terr, grid, plan

    def test_footholds_on_fitted_planes(self):
        terr, grid, plan = self._plan()
        fh = np.asarray(plan.foothold).reshape(-1, 3)
        # Every foothold z is one of the two plane levels.
        lvl = np.minimum(np.abs(fh[:, 2] - 0.0), np.abs(fh[:, 2] - STEP_H))
        assert lvl.max() < 5e-3, lvl.max()

    def test_stance_refs_consistent(self):
        terr, grid, plan = self._plan()
        modes = np.asarray(grid.modes)
        normal = np.asarray(plan.normal)
        pos_n = np.asarray(plan.pos_ref_n)
        fh = np.asarray(plan.foothold)
        checked = 0
        for k in range(len(modes)):
            flags = contact_flags_static(int(modes[k]))
            for leg in range(4):
                if flags[leg] > 0.5:
                    # Stance: pos ref along the normal == n . foothold.
                    assert pos_n[k, leg] == pytest.approx(
                        float(normal[k, leg] @ fh[k, leg]), abs=1e-4
                    )
                    checked += 1
        assert checked > 50

    def test_stance_rows_hold_at_foothold(self):
        terr, grid, plan = self._plan()
        modes = np.asarray(grid.modes)
        A = np.asarray(plan.tang_A)
        b = np.asarray(plan.tang_b)
        fh = np.asarray(plan.foothold)
        for k in range(len(modes)):
            flags = contact_flags_static(int(modes[k]))
            for leg in range(4):
                if flags[leg] > 0.5:
                    vals = A[k, leg] @ fh[k, leg] + b[k, leg]
                    assert (vals >= -1e-3).all(), (k, leg, vals.min())

    def test_swing_apex_clears_step(self):
        """A swing crossing the step edge must lift above step + clearance
        + swing height (reference SwingPhase obstacle clearance)."""
        terr, grid, plan = self._plan()
        modes = np.asarray(grid.modes)
        pos_n = np.asarray(plan.pos_ref_n)
        st = FootholdPlannerSettings()
        # For swing nodes whose upcoming foothold is on the high level, the
        # max normal-position reference must clear the step.
        for leg in range(4):
            zs = []
            for k in range(len(modes)):
                flags = contact_flags_static(int(modes[k]))
                if flags[leg] < 0.5 and float(plan.foothold[k, leg, 2]) > 0.04:
                    zs.append(pos_n[k, leg])
            if zs:
                assert max(zs) > STEP_H + st.sdf_clearance, (leg, max(zs))


class TestPerceptiveSolve:
    def test_walk_onto_step_with_segmented_planes(self):
        em = stepped_terrain()
        terr = decompose_planes(em)
        horizon, n = 1.4, 46
        grid, _ = _trot_grid(horizon, n)
        x0 = model.default_state()
        target = _walk_target(horizon)
        problem = make_segmented_perceptive_problem()
        params = make_perceptive_params(grid, terr, em, x0, target)
        u0 = model.weight_compensating_input(jnp.ones(4))
        st = sqp.SqpSettings(max_iterations=12, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(
                problem, grid, x, params,
                us_init=jnp.tile(u0[None], (n, 1)), settings=st,
            )
        )(x0)
        assert bool(jnp.all(jnp.isfinite(sol.xs)))
        assert float(sol.xs[-1, 6]) > 0.3, float(sol.xs[-1, 6])

        # Stance feet sit on the plan's footholds' plane level and inside
        # the chosen polygon rows.
        feet_all = np.asarray(jax.vmap(model.foot_positions_world)(sol.xs))
        modes = np.asarray(grid.modes)
        A = np.asarray(params["fh_tang_A"])
        b = np.asarray(params["fh_tang_b"])
        nrm = np.asarray(params["fh_normal"])
        ref = np.asarray(params["fh_pos_n"])
        # The FootNormalConstraint drives the normal position error to zero
        # exponentially (rate = position_gain), so check only stance nodes
        # that are a few nodes into their contact phase (settled).
        times = np.asarray(grid.times)
        settle = 0.15  # s; e^{-20 * 0.15} ~ 5% residual
        flags_all = np.stack([contact_flags_static(int(m)) for m in modes])
        worst_n, worst_poly = 0.0, -np.inf
        # Terminal node excluded: state-input equalities are enforced at
        # nodes 0..N-1 only (node N has no input), same as the reference.
        for leg in range(4):
            phase_start = times[0]
            for k in range(n):
                if k > 0 and flags_all[k, leg] != flags_all[k - 1, leg]:
                    phase_start = times[k]
                if flags_all[k, leg] > 0.5 and times[k] - phase_start >= settle:
                    p = feet_all[k, leg]
                    worst_n = max(
                        worst_n, abs(float(nrm[k, leg] @ p) - ref[k, leg])
                    )
                    viol = -(A[k, leg] @ p + b[k, leg]).min()
                    worst_poly = max(worst_poly, viol)
        assert worst_n < 0.04, worst_n
        assert worst_poly < 0.05, worst_poly

        # No ghost thrust: swing legs carry ZERO contact force in ALL THREE
        # components — reference ZeroForceConstraint.h semantics (the r4
        # advisor found the normal component was unconstrained).
        forces = np.asarray(sol.us)[:, : 3 * 4].reshape(n, 4, 3)
        swing = flags_all[:n] < 0.5
        worst_f = float(np.abs(forces[swing]).max()) if swing.any() else 0.0
        assert worst_f < 1e-2, worst_f

    def test_tangential_margin_device_host_agree(self):
        """terrain_margin shifts device rows identically to the host mirror
        (_tangential_rows_np) — r4 advisor low finding."""
        from ocs2_tpu.models.legged_robot.foothold_planner import (
            _tangential_rows_np,
        )

        terr = decompose_planes(stepped_terrain())
        margin = 0.07
        for k in range(2):
            A_d, b_d = tangential_constraint(terr, jnp.asarray(k), margin)
            A_h, b_h = _tangential_rows_np(terr, k, margin)
            real = np.arange(A_h.shape[0]) < int(terr.num_vertices[k])
            np.testing.assert_allclose(np.asarray(A_d)[real], A_h[real], atol=1e-5)
            np.testing.assert_allclose(np.asarray(b_d)[real], b_h[real], atol=1e-4)


class TestClosedLoopPerceptive:
    def test_dummy_loop_over_step(self):
        """Closed-loop perceptive MPC crossing the step: PerceptiveReference-
        Manager re-plans footholds on segmented planes every tick; stance
        feet land on the fitted plane levels (VERDICT r3 item #2 done
        criterion)."""
        from ocs2_tpu.mpc.mpc import Mpc, MpcSettings
        from ocs2_tpu.mpc.mrt import MpcMrtInterface, dummy_loop

        em = stepped_terrain()
        terr = decompose_planes(em)
        horizon, n = 1.0, 32
        gs = GaitSchedule(trot_gait(0.7))
        x0 = model.default_state()
        target = _walk_target(horizon, goal_x=1.2)
        # Constant forward-velocity target over the loop duration.
        x_t = model.default_state().at[0].set(0.4)
        u0 = model.weight_compensating_input(jnp.ones(4))
        tgt = TargetTrajectories.create(
            times=[0.0, 4.0],
            states=jnp.stack(
                [x_t, x_t.at[6].set(1.6).at[8].set(model.STAND_HEIGHT + STEP_H)]
            ),
            inputs=jnp.stack([u0, u0]),
        )
        rm = PerceptiveReferenceManager(terr, em, gs, target=tgt)
        problem = make_segmented_perceptive_problem()
        ms0 = gs.mode_schedule(0.0, horizon)
        grid0 = make_time_grid(
            0.0, horizon, n,
            event_times=np.asarray(ms0.event_times),
            mode_sequence=np.asarray(ms0.mode_sequence),
        )
        params = make_perceptive_params(grid0, terr, em, x0, tgt)
        mpc = Mpc(
            problem, params,
            settings=MpcSettings(
                time_horizon=horizon, num_intervals=n, solver="sqp"
            ),
            solver_settings=sqp.SqpSettings(max_iterations=6, integrator="rk2"),
            reference_manager=rm,
        )
        iface = MpcMrtInterface(mpc)
        ts, xs, us = dummy_loop(
            iface, x0, duration=2.0, mrt_frequency=60.0, mpc_frequency=15.0,
        )
        assert bool(jnp.all(jnp.isfinite(xs)))
        # Crossed toward/onto the step and kept body height above terrain.
        assert float(xs[-1, 6]) > 0.35, float(xs[-1, 6])
        feet = np.asarray(jax.vmap(model.foot_positions_world)(xs))
        # Feet never dig far below the local terrain (contact consistency).
        h = np.asarray(
            jax.vmap(lambda f: jax.vmap(em.height_at)(f[:, :2]))(
                jnp.asarray(feet)
            )
        )
        depth = (h - feet[:, :, 2])
        # Exclude the ambiguous one-cell band at the step edge.
        band = np.abs(feet[:, :, 0] - STEP_X) < 0.1
        assert float(np.where(band, 0.0, depth).max()) < 0.04


class TestKinematicFootPlacementPenalty:
    """Approximate-kinematics foothold scoring (reference
    KinematicFootPlacementPenalty.h/.cpp): over-extension and inward steps
    are penalized in segment selection."""

    def test_penalty_values(self):
        from ocs2_tpu.models.legged_robot.foothold_planner import (
            compute_kinematic_penalty_np,
        )

        hip = np.array([0.3, 0.2, model.STAND_HEIGHT])
        rot = np.eye(3)
        # Foot directly below the hip within reach: zero penalty.
        foot = hip - np.array([0.0, 0.0, 0.45])
        assert compute_kinematic_penalty_np(foot, hip, rot, 0, 0.55, 5.0) == 0.0
        # Over-extended: positive, grows with extension.
        far = hip - np.array([0.0, 0.0, 0.8])
        p1 = compute_kinematic_penalty_np(far, hip, rot, 0, 0.55, 5.0)
        farther = hip - np.array([0.0, 0.0, 0.9])
        p2 = compute_kinematic_penalty_np(farther, hip, rot, 0, 0.55, 5.0)
        assert 0.0 < p1 < p2
        # Inward step (LEFT leg stepping to the RIGHT, under the body).
        inward = hip + np.array([0.0, -0.25, -0.45])
        outward = hip + np.array([0.0, 0.25, -0.45])
        pi_ = compute_kinematic_penalty_np(inward, hip, rot, 0, 0.55, 5.0)
        po = compute_kinematic_penalty_np(outward, hip, rot, 0, 0.55, 5.0)
        assert pi_ > po == 0.0
        # Mirrored for a RIGHT leg (leg 1): stepping LEFT is inward.
        pi_r = compute_kinematic_penalty_np(outward, hip, rot, 1, 0.55, 5.0)
        po_r = compute_kinematic_penalty_np(inward, hip, rot, 1, 0.55, 5.0)
        assert pi_r > po_r == 0.0

    def test_selection_prefers_reachable_segment(self):
        """A raised platform slightly closer to the heuristic loses to the
        ground segment when reaching it would over-extend the leg."""
        from ocs2_tpu.models.legged_robot.foothold_planner import (
            FootholdPlannerSettings,
            _closest_segment_np,
        )

        # Terrain: flat ground + a high platform in x > 0.3.
        res, extent = 0.05, 2.0
        m = int(extent / res)
        h = np.zeros((m, m), np.float32)
        xs = -extent / 2 + (np.arange(m) + 0.5) * res
        h[xs > 0.3, :] = 0.55  # platform nearly at hip height
        em2 = ElevationMap.create(
            h, origin_xy=(-extent / 2, -extent / 2), resolution=res
        )
        terr2 = decompose_planes(em2)
        st = FootholdPlannerSettings()
        # Heuristic right at the platform edge, at platform height (so the
        # platform is marginally closer in pure distance).
        heur = np.array([0.32, 0.0, 0.5])
        hip = np.array([0.25, 0.0, model.STAND_HEIGHT])
        k_plain, proj_plain = _closest_segment_np(terr2, heur)
        k_kin, proj_kin = _closest_segment_np(
            terr2, heur, kin=(hip, np.eye(3), 0, st)
        )
        # Pure distance picks the platform (z ~0.55); kinematic scoring must
        # not pick a WORSE-reaching segment than plain distance does.
        from ocs2_tpu.models.legged_robot.foothold_planner import (
            compute_kinematic_penalty_np,
        )

        pen_kin = compute_kinematic_penalty_np(
            proj_kin, hip, np.eye(3), 0, st.max_leg_extension,
            st.kinematic_penalty_weight,
        )
        pen_plain = compute_kinematic_penalty_np(
            proj_plain, hip, np.eye(3), 0, st.max_leg_extension,
            st.kinematic_penalty_weight,
        )
        assert pen_kin <= pen_plain
