"""Unit tests for L1 core primitives (mirrors ocs2_core/test/ arithmetic,
interpolation, penalty, and mode-schedule tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.core import penalties as pen
from ocs2_tpu.core.interpolation import interpolate, interpolate_batch
from ocs2_tpu.core.reference import ModeSchedule, TargetTrajectories
from ocs2_tpu.core.types import (
    PerformanceIndex,
    ScalarQuadraticApproximation,
    make_psd,
)


class TestInterpolation:
    def test_midpoint(self):
        times = jnp.array([0.0, 1.0, 2.0])
        vals = jnp.array([[0.0], [2.0], [6.0]])
        assert np.allclose(interpolate(times, vals, 0.5), [1.0])
        assert np.allclose(interpolate(times, vals, 1.5), [4.0])

    def test_clamping(self):
        times = jnp.array([0.0, 1.0])
        vals = jnp.array([1.0, 3.0])
        assert np.allclose(interpolate(times, vals, -5.0), 1.0)
        assert np.allclose(interpolate(times, vals, 9.0), 3.0)

    def test_single_sample(self):
        assert np.allclose(
            interpolate(jnp.array([1.0]), jnp.array([[7.0, 8.0]]), 3.0), [7.0, 8.0]
        )

    def test_batch_matches_scalar(self):
        times = jnp.linspace(0, 1, 5)
        vals = jnp.sin(times)[:, None]
        ts = jnp.array([0.1, 0.33, 0.77])
        batch = interpolate_batch(times, vals, ts)
        single = jnp.stack([interpolate(times, vals, t) for t in ts])
        assert np.allclose(batch, single)

    def test_matrix_values(self):
        times = jnp.array([0.0, 1.0])
        gains = jnp.stack([jnp.eye(2), 3.0 * jnp.eye(2)])
        k = interpolate(times, gains, 0.5)
        assert np.allclose(k, 2.0 * jnp.eye(2))


class TestModeSchedule:
    def test_mode_at_time(self):
        ms = ModeSchedule.create([1.0, 2.0], [0, 1, 2])
        assert int(ms.mode_at_time(0.5)) == 0
        assert int(ms.mode_at_time(1.5)) == 1
        assert int(ms.mode_at_time(2.5)) == 2
        # Exactly at the event: post-event mode (searchsorted right).
        assert int(ms.mode_at_time(1.0)) == 1

    def test_padding(self):
        ms = ModeSchedule.create([1.0], [3, 4], capacity=5)
        assert ms.event_times.shape == (5,)
        assert int(ms.mode_at_time(100.0)) == 4
        assert int(ms.num_events) == 1

    def test_single_mode(self):
        ms = ModeSchedule.single_mode(7, capacity=3)
        assert int(ms.mode_at_time(0.0)) == 7
        assert int(ms.mode_at_time(1e9)) == 7


class TestTargetTrajectories:
    def test_constant(self):
        tt = TargetTrajectories.constant(jnp.array([1.0, 2.0]), jnp.array([0.5]))
        assert np.allclose(tt.state_at(10.0), [1.0, 2.0])
        assert np.allclose(tt.input_at(-1.0), [0.5])

    def test_interpolated(self):
        tt = TargetTrajectories.create(
            [0.0, 1.0], [[0.0, 0.0], [2.0, 4.0]], [[0.0], [1.0]]
        )
        assert np.allclose(tt.state_at(0.5), [1.0, 2.0])
        assert np.allclose(tt.input_at(0.25), [0.25])


class TestPenalties:
    def test_relaxed_barrier_log_region(self):
        p = pen.relaxed_barrier(mu=2.0, delta=1e-3)
        h = jnp.array([1.0])
        out = p(h)
        assert np.allclose(out.value, -2.0 * np.log(1.0))
        assert np.allclose(out.first, -2.0)  # -mu/h
        assert np.allclose(out.second, 2.0)  # mu/h^2

    def test_relaxed_barrier_continuity(self):
        p = pen.relaxed_barrier(mu=1.0, delta=0.1)
        lo = p(jnp.array([0.1 - 1e-6]))
        hi = p(jnp.array([0.1 + 1e-6]))
        assert np.allclose(lo.value, hi.value, atol=1e-4)
        assert np.allclose(lo.first, hi.first, atol=1e-3)

    def test_squared_hinge(self):
        p = pen.squared_hinge(mu=2.0)
        out = p(jnp.array([-1.0, 1.0]))
        assert np.allclose(out.value, [1.0, 0.0])
        assert np.allclose(out.first, [-2.0, 0.0])

    def test_double_sided_box(self):
        inner = pen.squared_hinge(mu=1.0)
        box = pen.double_sided(jnp.array(-1.0), jnp.array(1.0), inner)
        inside = box(jnp.array([0.0]))
        assert np.allclose(inside.value, 0.0)
        below = box(jnp.array([-2.0]))
        assert below.value[0] > 0
        assert below.first[0] < 0  # pushes h up

    def test_al_equality_update(self):
        al = pen.al_quadratic_equality()
        lmbd = jnp.array(0.5)
        rho = jnp.array(10.0)
        h = jnp.array(0.2)
        new = al.multiplier_update(lmbd, rho, h)
        assert np.allclose(new, 0.5 - 2.0)

    def test_al_inequality_inactive(self):
        al = pen.al_hinge_inequality()
        # Strictly feasible with zero multiplier: no penalty gradient pressure.
        v = al.value(jnp.array(0.0), jnp.array(1.0), jnp.array(5.0))
        assert np.allclose(v, 0.0)
        upd = al.multiplier_update(jnp.array(0.0), jnp.array(1.0), jnp.array(5.0))
        assert np.allclose(upd, 0.0)


class TestTypes:
    def test_quadratic_add(self):
        a = ScalarQuadraticApproximation.zeros(2, 1)
        b = a._replace(f=jnp.ones(()), dfdx=jnp.ones(2))
        c = a + b
        assert np.allclose(c.f, 1.0)
        assert np.allclose(c.dfdx, [1.0, 1.0])

    def test_make_psd(self):
        m = jnp.array([[1.0, 0.0], [0.0, -2.0]])
        p = make_psd(m, 0.1)
        w = np.linalg.eigvalsh(np.asarray(p))
        assert w.min() >= 0.1 - 1e-6

    def test_performance_index_pytree(self):
        pi = PerformanceIndex.zeros()
        doubled = jax.tree.map(lambda x: x * 2, pi + pi)
        assert np.allclose(doubled.merit, 0.0)
