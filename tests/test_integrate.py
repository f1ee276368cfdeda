"""Integrator and sensitivity-discretizer tests (mirrors
ocs2_core/test/integration/testSensitivityIntegrator.cpp semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from ocs2_tpu.core.integrate import (
    discretize,
    integrate_trajectory,
    sensitivity_step,
    trapezoidal,
)


def linear_dynamics(t, x, u):
    a = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    b = jnp.array([[0.0], [1.0]])
    return a @ x + b @ u


class TestIntegrators:
    def test_rk4_exponential_decay(self):
        # x' = -x has solution exp(-t); RK4 with dt=0.1 is ~1e-7 accurate.
        f = lambda t, x, u: -x
        step = discretize(f, "rk4")
        x = jnp.array([1.0])
        for _ in range(10):
            x = step(0.0, x, jnp.zeros(1), 0.1)
        assert np.allclose(x, np.exp(-1.0), atol=1e-6)

    def test_substeps_improve_euler(self):
        f = lambda t, x, u: -x
        coarse = discretize(f, "euler", substeps=1)(0.0, jnp.array([1.0]), jnp.zeros(1), 1.0)
        fine = discretize(f, "euler", substeps=100)(0.0, jnp.array([1.0]), jnp.zeros(1), 1.0)
        exact = np.exp(-1.0)
        assert abs(float(fine[0]) - exact) < abs(float(coarse[0]) - exact)

    def test_double_integrator_exact(self):
        # Constant acceleration: RK4 is exact for polynomial dynamics.
        step = discretize(linear_dynamics, "rk4")
        x = step(0.0, jnp.array([0.0, 0.0]), jnp.array([2.0]), 1.0)
        assert np.allclose(x, [1.0, 2.0], atol=1e-6)

    def test_trajectory_scan(self):
        ts = jnp.linspace(0.0, 1.0, 11)
        us = jnp.ones((10, 1))
        xs = integrate_trajectory(linear_dynamics, jnp.zeros(2), ts, us, "rk4")
        assert xs.shape == (11, 2)
        assert np.allclose(xs[-1], [0.5, 1.0], atol=1e-5)

    def test_time_varying(self):
        # x' = t  ->  x(1) = 0.5 ; checks time is threaded into substeps.
        f = lambda t, x, u: jnp.array([t])
        step = discretize(f, "rk4", substeps=4)
        x = step(0.0, jnp.zeros(1), jnp.zeros(1), 1.0)
        assert np.allclose(x, 0.5, atol=1e-6)


class TestSensitivity:
    def test_jacobians_match_finite_difference(self):
        f = lambda t, x, u: jnp.array(
            [x[1], -jnp.sin(x[0]) + u[0], x[0] * x[1] * 0.1]
        )
        step = discretize(f, "rk2")
        sens = sensitivity_step(step)
        x = jnp.array([0.3, -0.2, 0.1])
        u = jnp.array([0.5])
        tr = sens(0.0, x, u, 0.05)
        assert np.allclose(tr.f, step(0.0, x, u, 0.05))
        eps = 1e-4
        for i in range(3):
            dx = jnp.zeros(3).at[i].set(eps)
            fd = (step(0.0, x + dx, u, 0.05) - step(0.0, x - dx, u, 0.05)) / (2 * eps)
            assert np.allclose(tr.dfdx[:, i], fd, atol=1e-3)
        du = jnp.array([eps])
        fd = (step(0.0, x, u + du, 0.05) - step(0.0, x, u - du, 0.05)) / (2 * eps)
        assert np.allclose(tr.dfdu[:, 0], fd, atol=1e-3)

    def test_linear_system_discrete_exact(self):
        # For linear dynamics the RK4 discrete A is the truncated matrix exp.
        step = discretize(linear_dynamics, "rk4")
        sens = sensitivity_step(step)
        tr = sens(0.0, jnp.zeros(2), jnp.zeros(1), 0.1)
        a_cont = np.array([[0.0, 1.0], [0.0, 0.0]])
        a_exact = np.eye(2) + 0.1 * a_cont + 0.005 * a_cont @ a_cont
        assert np.allclose(tr.dfdx, a_exact, atol=1e-9)


def test_trapezoidal():
    ts = jnp.linspace(0.0, 1.0, 101)
    vals = ts**2
    assert np.allclose(trapezoidal(vals, ts), 1.0 / 3.0, atol=1e-3)


class TestOde45:
    """Adaptive Dormand-Prince 5(4) (reference IntegratorType::ODE45,
    RungeKuttaDormandPrince5.h)."""

    def test_exponential_decay_high_accuracy(self):
        from ocs2_tpu.core.integrate import integrate_adaptive

        f = lambda t, x, u: -2.0 * x  # noqa: E731
        x0 = jnp.array([1.0])
        xf = jax.jit(
            lambda x: integrate_adaptive(f, 0.0, x, jnp.zeros(1), 1.0)
        )(x0)
        assert abs(float(xf[0]) - np.exp(-2.0)) < 1e-5

    def test_stiffish_oscillator_beats_rk4_per_interval(self):
        """One adaptive interval matches a fine fixed-step reference where a
        single coarse RK4 step has visible error."""
        from ocs2_tpu.core.integrate import discretize, integrate_adaptive

        omega = 12.0

        def f(t, x, u):
            return jnp.array([x[1], -omega * omega * x[0]]) + u

        x0 = jnp.array([1.0, 0.0])
        u = jnp.zeros(2)
        dt = 0.5
        exact = jnp.array(
            [np.cos(omega * dt), -omega * np.sin(omega * dt)]
        )
        x_ad = integrate_adaptive(f, 0.0, x0, u, dt, rtol=1e-6, atol=1e-9)
        x_rk4 = discretize(f, "rk4", 1)(0.0, x0, u, dt)
        err_ad = float(jnp.max(jnp.abs(x_ad - exact)))
        err_rk4 = float(jnp.max(jnp.abs(x_rk4 - exact)))
        assert err_ad < 2e-2, err_ad
        assert err_ad < err_rk4 / 50.0, (err_ad, err_rk4)

    def test_discretize_dispatch_and_jacfwd(self):
        """method='ode45' plugs into the discretize seam and is
        differentiable (usable in rollouts and sensitivity checks)."""
        from ocs2_tpu.core.integrate import discretize

        f = lambda t, x, u: -x + u  # noqa: E731
        step = discretize(f, "ode45")
        x0, u = jnp.array([1.0]), jnp.array([0.5])
        xf = step(0.0, x0, u, 0.7)
        expect = 0.5 + (1.0 - 0.5) * np.exp(-0.7)
        assert abs(float(xf[0]) - expect) < 1e-5
        jac = jax.jacfwd(lambda x: step(0.0, x, u, 0.7))(x0)
        assert abs(float(jac[0, 0]) - np.exp(-0.7)) < 1e-3
