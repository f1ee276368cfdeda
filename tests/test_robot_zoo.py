"""Solve tests for the robot model zoo: ballbot, quadrotor, mobile
manipulator (mirrors the reference's per-example MPC regression tests in
ocs2_robotic_examples/*/test/).  Each model must actually converge and
exhibit the behaviour its task defines — not just construct."""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models import ballbot, mobile_manipulator as mm, quadrotor
from ocs2_tpu.oc.time_discretization import uniform_grid
from ocs2_tpu.solvers import ddp, sqp


class TestBallbot:
    def test_stabilizes_from_lean(self):
        """Leaning ballbot returns to upright at the origin (reference
        ocs2_ballbot/test/BallbotPyBindingTest + MPC regression)."""
        problem = ballbot.make_problem()
        grid = uniform_grid(0.0, 2.5, 50)
        x0 = jnp.zeros(ballbot.NX).at[3].set(0.15).at[4].set(-0.1)
        st = sqp.SqpSettings(max_iterations=30, integrator="rk4")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, ballbot.make_params(), settings=st)
        )(x0)
        assert bool(sol.converged)
        # Upright and centered at the end of the horizon.
        assert float(jnp.abs(sol.xs[-1, 3])) < 0.02  # pitch
        assert float(jnp.abs(sol.xs[-1, 4])) < 0.02  # roll
        assert float(jnp.linalg.norm(sol.xs[-1, 0:2])) < 0.1

    def test_tracks_position_target(self):
        problem = ballbot.make_problem()
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = jnp.zeros(ballbot.NX)
        params = ballbot.make_params(target_position=(0.5, -0.3, 0.0))
        st = sqp.SqpSettings(max_iterations=30, integrator="rk4")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        assert float(jnp.abs(sol.xs[-1, 0] - 0.5)) < 0.05
        assert float(jnp.abs(sol.xs[-1, 1] + 0.3)) < 0.05


class TestQuadrotor:
    def test_hover_hold(self):
        problem = quadrotor.make_problem()
        grid = uniform_grid(0.0, 2.0, 40)
        x0 = jnp.zeros(quadrotor.NX).at[2].set(1.0)
        st = ddp.DdpSettings(algorithm="ilqr", max_iterations=30)
        sol = jax.jit(
            lambda x: ddp.solve(problem, grid, x, quadrotor.make_params(), settings=st)
        )(x0)
        # Stays at hover, thrust compensates gravity.
        assert float(jnp.abs(sol.xs[-1, 2] - 1.0)) < 1e-2
        assert np.allclose(
            np.asarray(sol.us[:, 0]),
            quadrotor.MASS * quadrotor.GRAVITY,
            atol=0.2,
        )

    def test_waypoint_reach(self):
        """Fly from origin-hover to a displaced waypoint (reference quadrotor
        MPC task: position tracking through nonlinear attitude dynamics)."""
        problem = quadrotor.make_problem()
        grid = uniform_grid(0.0, 3.0, 60)
        x0 = jnp.zeros(quadrotor.NX).at[2].set(1.0)
        params = quadrotor.make_params(target_position=(1.0, 0.5, 1.5))
        st = sqp.SqpSettings(max_iterations=40, integrator="rk4")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        err = np.asarray(sol.xs[-1, 0:3]) - np.array([1.0, 0.5, 1.5])
        assert np.linalg.norm(err) < 0.05, err
        # Attitude returns near level at the target.
        assert float(jnp.abs(sol.xs[-1, 4])) < 0.05

    def test_scenario_batch(self):
        """vmap over a scenario batch of initial states (the BASELINE.json
        4096-scenario configuration, small here; full scale in bench.py)."""
        problem = quadrotor.make_problem()
        grid = uniform_grid(0.0, 2.0, 40)
        st = sqp.SqpSettings(max_iterations=20, integrator="rk4")
        batch = 16
        x0s = jnp.zeros((batch, quadrotor.NX)).at[:, 2].set(
            1.0 + 0.1 * jnp.arange(batch) / batch
        )
        sols = jax.jit(
            jax.vmap(
                lambda x: sqp.solve(
                    problem, grid, x, quadrotor.make_params(), settings=st
                )
            )
        )(x0s)
        assert np.all(np.abs(np.asarray(sols.xs[:, -1, 2]) - 1.0) < 0.05)


class TestMobileManipulator:
    def test_ee_reach_with_joint_limits(self):
        """EE reaches the target without violating joint limits (reference
        mobile-manipulator EndEffector task + JointLimits constraints)."""
        problem = mm.make_problem("soft")
        grid = uniform_grid(0.0, 3.0, 40)
        x0 = mm.home_state()
        params = mm.make_params(ee_target=(1.2, 0.4, 0.9))
        st = sqp.SqpSettings(max_iterations=40, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        pos, _ = mm.ee_pose(sol.xs[-1])
        assert float(jnp.linalg.norm(pos - params["ee_target"])) < 0.05
        qs = np.asarray(sol.xs[:, 3:9])
        assert np.all(qs > np.asarray(mm.JOINT_LOWER)[None] - 1e-3)
        assert np.all(qs < np.asarray(mm.JOINT_UPPER)[None] + 1e-3)

    def test_self_collision_respected(self):
        """A target close to the base body forces the self-collision term to
        be active; the solution keeps all monitored sphere pairs separated
        (reference SelfCollisionConstraint)."""
        problem = mm.make_problem("soft")
        grid = uniform_grid(0.0, 3.0, 40)
        x0 = mm.home_state()
        # Target inside the base-body sphere: unreachable without collision.
        params = mm.make_params(ee_target=(0.1, 0.0, 0.4))
        st = sqp.SqpSettings(max_iterations=40, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        dists = jax.vmap(lambda x: mm.self_collision(0.0, x, {}))(sol.xs)
        assert float(jnp.min(dists)) > -0.01, float(jnp.min(dists))

    def test_orientation_tracking(self):
        problem = mm.make_problem("soft")
        grid = uniform_grid(0.0, 3.0, 40)
        # Slight base-yaw offset: the plain home state is EXACTLY antipodal
        # to the target rotation (relative quaternion angle pi), which is a
        # true stationary saddle of the quaternion-distance cost (reference
        # RotationTransforms.h:51 has the identical property) — no
        # Gauss-Newton method moves off it in exact arithmetic.
        x0 = mm.home_state().at[2].set(0.2)
        # Point the tool straight down (z-axis of EE frame -> -z world).
        r_target = jnp.array([[1.0, 0, 0], [0, -1.0, 0], [0, 0, -1.0]])
        params = mm.make_params(ee_target=(0.9, 0.0, 0.6), ee_target_rot=r_target)
        st = sqp.SqpSettings(max_iterations=40, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        pos, rot = mm.ee_pose(sol.xs[-1])
        from ocs2_tpu.models.kinematics import rotation_error

        assert float(jnp.linalg.norm(pos - params["ee_target"])) < 0.08
        assert float(jnp.linalg.norm(rotation_error(rot, r_target))) < 0.2

    def test_workspace_sdf_clearance(self):
        """EE keeps clearance from an occupancy wall via the SDF constraint
        (reference EndEffectorDistanceConstraint.h) — constraint is active
        (target behind the wall) and respected."""
        import numpy as onp

        from ocs2_tpu.models.perceptive import signed_distance_field

        occ = onp.zeros((40, 24, 24), bool)
        occ[24:28, :, :] = True  # wall slab at x in [1.2, 1.4)
        sdf = signed_distance_field(jnp.asarray(occ), [0.0, -0.6, 0.0], 0.05)
        problem = mm.make_problem(
            "soft", workspace_sdf=sdf, sdf_clearance=0.05
        )
        grid = uniform_grid(0.0, 3.0, 40)
        x0 = mm.home_state()
        params = mm.make_params(ee_target=(1.5, 0.0, 0.6))  # behind the wall
        st = sqp.SqpSettings(max_iterations=40, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(problem, grid, x, params, settings=st)
        )(x0)
        ee_final = mm.ee_pose(sol.xs[-1])[0]
        # Never crosses into the wall minus clearance.
        d = jax.vmap(lambda x: sdf.query(mm.ee_pose(x)[0]))(sol.xs)
        assert float(jnp.min(d)) > -0.02, float(jnp.min(d))
        # And it did get pulled toward the wall (constraint active).
        assert float(ee_final[0]) > 0.8
