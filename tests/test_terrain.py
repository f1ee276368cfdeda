"""Perceptive locomotion tests: terrain model, plane fitting, and a legged
solve over a stepped terrain grid.

Mirrors the reference perceptive stack's roles: TerrainModel queries
(ocs2_switched_model_interface/terrain/TerrainModel.h), segmented-plane
foothold fitting (SegmentedPlanesTerrainModel.h:15), terrain SDF, and the
perceptive quadruped problem assembly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models.legged_robot import model
from ocs2_tpu.models.legged_robot.terrain import (
    ElevationMap,
    make_perceptive_problem,
    stance_on_terrain,
    terrain_friction_cone,
)


def stepped_terrain(step_x=0.6, low=0.0, high=0.08, extent=4.0, res=0.05):
    n = int(extent / res)
    h = np.full((n, n), low, np.float32)
    xs = -extent / 2 + (np.arange(n) + 0.5) * res
    h[xs > step_x, :] = high
    return ElevationMap.create(h, origin_xy=(-extent / 2, -extent / 2), resolution=res)


class TestElevationMap:
    def test_height_query(self):
        t = stepped_terrain()
        assert float(t.height_at(jnp.array([0.0, 0.0]))) == pytest.approx(0.0, abs=1e-5)
        assert float(t.height_at(jnp.array([1.5, 0.0]))) == pytest.approx(0.08, abs=1e-5)

    def test_plane_fit_flat_regions(self):
        t = stepped_terrain()
        for xy, z in [((-0.5, 0.3), 0.0), ((1.5, -0.4), 0.08)]:
            plane = t.plane_at(jnp.asarray(xy, jnp.float32))
            np.testing.assert_allclose(np.asarray(plane.normal), [0, 0, 1], atol=1e-4)
            assert float(plane.point[2]) == pytest.approx(z, abs=1e-3)

    def test_plane_fit_slope(self):
        """On a uniform slope the fitted normal matches the analytic one."""
        res, extent = 0.05, 2.0
        n = int(extent / res)
        xs = (np.arange(n) + 0.5) * res
        grade = 0.3
        h = np.broadcast_to(grade * xs[:, None], (n, n)).astype(np.float32)
        t = ElevationMap.create(h, origin_xy=(0.0, 0.0), resolution=res)
        plane = t.plane_at(jnp.array([1.0, 1.0]))
        expect = np.array([-grade, 0.0, 1.0])
        expect = expect / np.linalg.norm(expect)
        np.testing.assert_allclose(np.asarray(plane.normal), expect, atol=1e-3)

    def test_sdf_clearance(self):
        t = stepped_terrain()
        sdf = t.sdf(z_min=-0.1, z_max=0.5)
        # Point 0.3 m above the low region: distance ~0.3 (to the ground).
        d = float(sdf.query(jnp.array([0.0, 0.0, 0.3])))
        assert 0.2 < d < 0.4, d
        # Point below the surface is inside (negative).
        d_in = float(sdf.query(jnp.array([1.5, 0.0, 0.02])))
        assert d_in < 0.0, d_in


class TestTerrainConstraints:
    def test_stance_on_terrain_residual(self):
        t = stepped_terrain()
        g = stance_on_terrain(t)
        x = model.default_state()
        p = {"mode": jnp.asarray(15)}
        r = g(0.0, x, p)
        # Default stance on the low region: feet at z ~ 0 -> residual ~ 0.
        np.testing.assert_allclose(np.asarray(r), np.zeros(4), atol=0.02)

    def test_rotated_cone_penalizes_shear_on_slope(self):
        res, n = 0.05, 40
        xs = (np.arange(n) + 0.5) * res
        h = np.broadcast_to(0.5 * xs[:, None], (n, n)).astype(np.float32)
        t = ElevationMap.create(h, origin_xy=(-1.0, -1.0), resolution=res)
        cone = terrain_friction_cone(t, mu=0.7)
        x = model.default_state()
        p = {"mode": jnp.asarray(15)}
        u_vert = model.weight_compensating_input(jnp.ones(4))
        # Vertical force on a slope has a tangential component -> tighter
        # margin than the flat-ground cone gives it.
        margins = cone(0.0, x, u_vert, p)
        f = model.contact_forces(u_vert)[0]
        flat_margin = 0.7 * f[2] - np.sqrt(f[0] ** 2 + f[1] ** 2 + 5.0)
        assert float(margins[0]) < flat_margin


class TestPerceptiveSolve:
    def test_walk_onto_step(self):
        """Trot toward a 8 cm step: the solve converges, stance feet stay on
        the local terrain level (before AND after the step), swing feet
        clear the surface."""
        import numpy as onp

        from ocs2_tpu.core.reference import TargetTrajectories
        from ocs2_tpu.models.legged_robot import interface
        from ocs2_tpu.models.legged_robot.gait import GaitSchedule, trot_gait
        from ocs2_tpu.models.legged_robot.model import STAND_HEIGHT
        from ocs2_tpu.oc.time_discretization import make_time_grid
        from ocs2_tpu.solvers import sqp

        terrain = stepped_terrain(step_x=0.45, high=0.08)
        problem = make_perceptive_problem(terrain)
        horizon, n = 1.4, 46
        gs = GaitSchedule(trot_gait(0.7))
        ms = gs.mode_schedule(0.0, horizon)
        grid = make_time_grid(
            0.0, horizon, n,
            event_times=onp.asarray(ms.event_times),
            mode_sequence=onp.asarray(ms.mode_sequence),
        )
        x0 = model.default_state()
        x_goal = x0.at[6].set(0.85).at[8].set(STAND_HEIGHT + 0.08)
        target = TargetTrajectories.create(
            times=[0.0, horizon],
            states=jnp.stack([x0.at[0].set(0.6), x_goal.at[0].set(0.6)]),
            inputs=jnp.tile(
                model.weight_compensating_input(jnp.ones(4))[None], (2, 1)
            ),
        )
        params = interface.make_params(grid, target=target)
        u0 = model.weight_compensating_input(jnp.ones(4))
        st = sqp.SqpSettings(max_iterations=15, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(
                problem, grid, x, params,
                us_init=jnp.tile(u0[None], (n, 1)), settings=st,
            )
        )(x0)
        assert bool(jnp.all(jnp.isfinite(sol.xs)))

        from ocs2_tpu.models.legged_robot.gait import contact_flags_static

        feet_all = jax.vmap(model.foot_positions_world)(sol.xs)  # [N+1, 4, 3]
        modes = onp.asarray(grid.modes)
        viol = []
        for k in range(n + 1):
            flags = contact_flags_static(int(modes[k]))
            feet = onp.asarray(feet_all[k])
            h = onp.asarray(
                jax.vmap(terrain.height_at)(jnp.asarray(feet[:, :2]))
            )
            for leg in range(4):
                # At the step discontinuity the bilinear height is the edge
                # blend (up to half the step within one cell) — exclude the
                # one-cell band, the surface there is genuinely ambiguous.
                if flags[leg] > 0.5 and abs(feet[leg, 0] - 0.45) > 0.1:
                    viol.append(abs(feet[leg, 2] - h[leg]))
        assert max(viol) < 0.03, max(viol)
        # The robot makes forward progress toward the step.
        assert float(sol.xs[-1, 6]) > 0.25, float(sol.xs[-1, 6])


class TestGaitAdaptation:
    """Reference GaitAdaptation (early touchdown removes the remaining
    swing, GaitAdaptation.h:19,63)."""

    def _trot_schedule(self):
        from ocs2_tpu.models.legged_robot.gait import GaitSchedule, trot_gait

        gs = GaitSchedule(trot_gait(0.7))
        return gs.mode_schedule(0.0, 1.4)

    def test_time_until_next_touchdown(self):
        from ocs2_tpu.models.legged_robot.gait import (
            contact_flags_static,
            time_until_next_touchdown,
        )

        ms = self._trot_schedule()
        t = 0.05
        mode_now = int(ms.mode_at_time(np.float32(t)))
        flags = contact_flags_static(mode_now)
        swing_legs = [leg for leg in range(4) if flags[leg] < 0.5]
        assert swing_legs
        for leg in swing_legs:
            dt_td = time_until_next_touchdown(ms, t, leg)
            assert 0.0 < dt_td < 0.7, (leg, dt_td)

    def test_early_touchdown_flips_contact(self):
        from ocs2_tpu.models.legged_robot.gait import (
            GaitAdaptation,
            GaitAdaptationSettings,
            contact_flags_static,
            time_until_next_touchdown,
        )

        ms = self._trot_schedule()
        adapt = GaitAdaptation(GaitAdaptationSettings(early_touchdown_window=0.1))
        # Pick a swing leg and a time just inside the window before its
        # planned touchdown.
        mode0 = int(ms.mode_at_time(np.float32(0.05)))
        leg = next(
            lg for lg in range(4)
            if contact_flags_static(mode0)[lg] < 0.5
        )
        td = time_until_next_touchdown(ms, 0.05, leg) + 0.05
        # Leg must first be seen in swing (liftoff tracking).
        measured = [False] * 4
        adapt.advance(ms, measured, td - 0.2)
        t_meas = td - 0.05  # inside the 0.1 s window
        measured[leg] = True
        ms2 = adapt.advance(ms, measured, t_meas)
        # The leg is contact from t_meas on (remaining swing removed).
        m_new = int(ms2.mode_at_time(np.float32(t_meas + 0.01)))
        assert contact_flags_static(m_new)[leg] > 0.5
        # The original schedule had it in swing there.
        m_old = int(ms.mode_at_time(np.float32(t_meas + 0.01)))
        assert contact_flags_static(m_old)[leg] < 0.5

    def test_no_adaptation_outside_window(self):
        from ocs2_tpu.models.legged_robot.gait import (
            GaitAdaptation,
            GaitAdaptationSettings,
            contact_flags_static,
            time_until_next_touchdown,
        )

        ms = self._trot_schedule()
        adapt = GaitAdaptation(GaitAdaptationSettings(early_touchdown_window=0.05))
        mode0 = int(ms.mode_at_time(np.float32(0.05)))
        leg = next(
            lg for lg in range(4)
            if contact_flags_static(mode0)[lg] < 0.5
        )
        measured = [False] * 4
        adapt.advance(ms, measured, 0.02)
        measured[leg] = True
        # Contact measured far before the planned touchdown: spurious, keep.
        ms2 = adapt.advance(ms, measured, 0.05)
        m_new = int(ms2.mode_at_time(np.float32(0.06)))
        assert contact_flags_static(m_new)[leg] < 0.5
