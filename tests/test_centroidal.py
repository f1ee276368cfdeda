"""Full centroidal model + RBD conversions tests.

Mirrors the reference's centroidal consistency test
(ocs2_centroidal_model/test/testAnymalCentroidalModel.cpp: centroidal
momentum map vs direct momentum, RBD round trips, SRBD-vs-full agreement).
"""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.models.legged_robot import centroidal, model
from ocs2_tpu.models.legged_robot.centroidal import (
    DEFAULT_MASSES,
    SRBD_MASSES,
    base_velocity_from_momentum,
    centroidal_momentum_matrix,
    centroidal_state_from_rbd,
    com_offset_base,
    dynamics_full,
    make_dynamics,
    rbd_state_from_centroidal,
)


def _rand_state(key, scale=0.3):
    kq, kv = jax.random.split(key)
    x = model.default_state()
    x = x + scale * jax.random.normal(kq, (model.NX,))
    return x


class TestMomentumMatrix:
    def test_momentum_is_linear_in_velocities(self):
        """h = A(q) v exactly (momentum is linear in generalized velocity)."""
        key = jax.random.PRNGKey(0)
        q_j = model.DEFAULT_JOINTS + 0.2 * jax.random.normal(key, (12,))
        euler = jnp.array([0.3, -0.1, 0.2])
        a = centroidal_momentum_matrix(q_j, euler)
        for i in range(3):
            v = jax.random.normal(jax.random.PRNGKey(i + 1), (18,))
            h_direct = centroidal._momentum_world(
                q_j, euler, v[0:3], v[3:6], v[6:18], DEFAULT_MASSES
            )
            np.testing.assert_allclose(
                np.asarray(a @ v), np.asarray(h_direct), rtol=1e-4, atol=1e-5
            )

    def test_angular_block_independent_of_base_velocity(self):
        """sum m_i (p_i - r_com) = 0 -> h_ang has no v_base column."""
        a = centroidal_momentum_matrix(
            jnp.asarray(model.DEFAULT_JOINTS), jnp.array([0.1, 0.2, -0.1])
        )
        np.testing.assert_allclose(
            np.asarray(a[3:6, 0:3]), np.zeros((3, 3)), atol=1e-4
        )

    def test_linear_block_is_total_mass(self):
        a = centroidal_momentum_matrix(
            jnp.asarray(model.DEFAULT_JOINTS), jnp.zeros(3)
        )
        np.testing.assert_allclose(
            np.asarray(a[0:3, 0:3]), model.MASS * np.eye(3), rtol=1e-5
        )


class TestRbdConversions:
    def test_round_trip(self):
        """centroidal -> RBD -> centroidal is the identity
        (reference CentroidalModelRbdConversions consistency)."""
        key = jax.random.PRNGKey(3)
        x = _rand_state(key)
        u = model.weight_compensating_input(jnp.ones(4))
        u = u + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (model.NU,))
        q_rbd, v_rbd = rbd_state_from_centroidal(x, u)
        x_back = centroidal_state_from_rbd(q_rbd, v_rbd)
        np.testing.assert_allclose(
            np.asarray(x_back), np.asarray(x), rtol=1e-3, atol=1e-4
        )

    def test_base_velocity_consistency(self):
        """Momentum rebuilt from the recovered base velocity matches the
        state's normalized momentum."""
        x = _rand_state(jax.random.PRNGKey(7))
        dq = 0.5 * jax.random.normal(jax.random.PRNGKey(8), (12,))
        v_base, omega = base_velocity_from_momentum(x, dq)
        h = centroidal._momentum_world(
            model.joint_angles(x), model.base_euler(x), v_base, omega, dq,
            DEFAULT_MASSES,
        )
        np.testing.assert_allclose(
            np.asarray(h / model.MASS), np.asarray(x[0:6]), rtol=1e-3,
            atol=1e-4,
        )


class TestFullVsSrbd:
    def test_full_reduces_to_srbd_with_massless_legs(self):
        """With all leg mass in the base, FullCentroidalDynamics == SRBD
        exactly (CoM at base, no joint-momentum coupling)."""
        dyn_lim = make_dynamics(SRBD_MASSES)
        x = _rand_state(jax.random.PRNGKey(11), scale=0.2)
        u = model.weight_compensating_input(jnp.ones(4))
        u = u + 0.2 * jax.random.normal(jax.random.PRNGKey(12), (model.NU,))
        dx_full = dyn_lim(0.0, x, u, {})
        dx_srbd = model.dynamics(0.0, x, u, {})
        # Angular parts differ only through the inertia convention: SRBD uses
        # body-frame diag inertia, the limit model rotates it to world.  At
        # small attitude they agree; compare velocity/position rows exactly
        # and the rest loosely.
        np.testing.assert_allclose(
            np.asarray(dx_full[0:3]), np.asarray(dx_srbd[0:3]), rtol=1e-4,
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(dx_full[6:9]), np.asarray(dx_srbd[6:9]), rtol=1e-3,
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(dx_full[12:]), np.asarray(dx_srbd[12:]), atol=1e-6
        )

    def test_com_offset_zero_when_massless(self):
        c = com_offset_base(jnp.asarray(model.DEFAULT_JOINTS), SRBD_MASSES)
        np.testing.assert_allclose(np.asarray(c), np.zeros(3), atol=1e-7)

    def test_com_offset_moves_with_legs(self):
        q0 = jnp.asarray(model.DEFAULT_JOINTS)
        c0 = com_offset_base(q0)
        # Swing all legs forward: CoM shifts forward (x grows).
        q1 = q0.reshape(4, 3).at[:, 1].add(-0.6).reshape(-1)
        c1 = com_offset_base(q1)
        assert float(c1[0]) > float(c0[0]) + 1e-3


class TestFullDynamicsSolve:
    def test_standing_solve(self):
        """Legged solve with FullCentroidalDynamics converges to standing
        (same assembly as the SRBD flagship, model_type='full')."""
        import numpy as onp

        from ocs2_tpu.models.legged_robot import interface
        from ocs2_tpu.models.legged_robot.gait import GaitSchedule, stance_gait
        from ocs2_tpu.oc.time_discretization import make_time_grid
        from ocs2_tpu.solvers import sqp

        problem = interface.make_problem(model_type="full")
        gs = GaitSchedule(stance_gait())
        ms = gs.mode_schedule(0.0, 1.0)
        grid = make_time_grid(
            0.0, 1.0, 20,
            event_times=onp.asarray(ms.event_times),
            mode_sequence=onp.asarray(ms.mode_sequence),
        )
        params = interface.make_params(grid)
        x0 = model.default_state()
        u0 = model.weight_compensating_input(jnp.ones(4))
        st = sqp.SqpSettings(max_iterations=12, integrator="rk2")
        sol = jax.jit(
            lambda x: sqp.solve(
                problem, grid, x, params,
                us_init=jnp.tile(u0[None], (20, 1)), settings=st,
            )
        )(x0)
        assert bool(jnp.all(jnp.isfinite(sol.xs)))
        # Base height holds near stand height across the horizon.
        heights = np.asarray(sol.xs[:, 8])
        assert np.all(np.abs(heights - model.STAND_HEIGHT) < 0.08), heights
