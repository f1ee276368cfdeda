"""Frequency-shaped legged MPC (ocs2_anymal_loopshaping_mpc analogue):
loopshaping x switched modes x projected constraints — the hardest
composition in the reference — must converge and its plant-block solution
must respect the contact structure."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocs2_tpu.models.legged_robot import interface, model
from ocs2_tpu.models.legged_robot.gait import (
    GaitSchedule,
    contact_flags_static,
    trot_gait,
)
from ocs2_tpu.models.legged_robot.loopshaping_mpc import (
    anymal_loopshaping_definition,
    augment_state,
    filtered_output,
    loopshaped_warm_start,
    make_loopshaping_problem,
    make_solver_settings,
    plant_trajectory,
)
from ocs2_tpu.oc.time_discretization import make_time_grid
from ocs2_tpu.solvers import sqp


@pytest.fixture(scope="module")
def trot_setup():
    problem, defn = make_loopshaping_problem()
    gs = GaitSchedule(trot_gait(0.7))
    ms = gs.mode_schedule(0.0, 1.0)
    grid = make_time_grid(
        0.0, 1.0, 40,
        event_times=np.asarray(ms.event_times),
        mode_sequence=np.asarray(ms.mode_sequence),
    )
    params = interface.make_params(grid)
    return problem, defn, grid, params


def test_definition_realizes_s_inv_transfer():
    """The r_filter realization's u->y transfer must equal the .info's
    s_inv(s) = g*s/(s+p) per channel (loopshaping.info Filter0/Filter1)."""
    defn = anymal_loopshaping_definition()
    assert defn.A.shape == (24, 24) and defn.D.shape == (24, 24)
    w = 7.0j
    A, B, C, D = (
        np.asarray(m, np.complex128) for m in (defn.A, defn.B, defn.C, defn.D)
    )
    H = D + C @ np.linalg.inv(w * np.eye(24) - A) @ B
    np.testing.assert_allclose(H[0, 0], 4.0 * w / (w + 100.0), rtol=1e-6)
    np.testing.assert_allclose(H[12, 12], 3.0 * w / (w + 50.0), rtol=1e-6)
    # Zero DC: constant inputs are free (the robot can stand).
    H0 = D + C @ np.linalg.inv(-A) @ B
    np.testing.assert_allclose(np.asarray(H0), 0.0, atol=1e-6)


def test_augment_state_steady():
    defn = anymal_loopshaping_definition()
    u = model.weight_compensating_input(jnp.ones(4))
    x = model.default_state()
    xa = augment_state(defn, x, u)
    assert xa.shape == (48,)
    # Equilibrium low-pass state equals the input; filtered output is zero.
    np.testing.assert_allclose(np.asarray(xa[24:]), np.asarray(u), atol=1e-4)
    y = np.asarray(defn.C) @ np.asarray(xa[24:]) + np.asarray(defn.D) @ np.asarray(u)
    np.testing.assert_allclose(y, 0.0, atol=1e-3)


def test_loopshaped_trot_converges(trot_setup):
    problem, defn, grid, params = trot_setup
    x0 = model.default_state()
    u0 = model.weight_compensating_input(jnp.ones(4))
    xa0 = augment_state(defn, x0, u0)
    xs_init, us_init = loopshaped_warm_start(defn, grid, x0)
    st = make_solver_settings()
    sol = jax.jit(
        lambda x: sqp.solve(
            problem, grid, x, params,
            xs_init=xs_init, us_init=us_init, settings=st,
        )
    )(xa0)
    assert bool(jnp.all(jnp.isfinite(sol.xs)))
    assert float(sol.performance.dynamics_violation_sse) < 1e-3

    xs_p, us_p = plant_trajectory(defn, sol.xs, sol.us)
    # Base height near stand height throughout.
    assert float(jnp.max(jnp.abs(xs_p[:, 8] - model.STAND_HEIGHT))) < 0.12
    # Swing legs carry (near) zero force in the plant input.
    modes = np.asarray(grid.modes)
    forces = np.asarray(us_p[:, :12]).reshape(-1, 4, 3)
    max_swing_f = 0.0
    for k in range(forces.shape[0]):
        flags = contact_flags_static(int(modes[k]))
        for leg in range(4):
            if flags[leg] < 0.5:
                max_swing_f = max(
                    max_swing_f, float(np.abs(forces[k, leg]).max())
                )
    assert max_swing_f < 2.0, max_swing_f  # ~1% of the ~300 N stance load


def _y_sse(us, defn, grid, u0):
    """Shaping functional sum |y_k|^2 with y = g(u - lowpass(u)), the
    low-pass integrated by the same RK2/2-substep scheme as the solver."""
    p_diag = -np.diag(np.asarray(defn.A))
    g_diag = np.diag(np.asarray(defn.D))
    dt = float(grid.times[1] - grid.times[0])
    xi = np.asarray(u0).copy()
    acc = 0.0
    for k in range(us.shape[0]):
        u = np.asarray(us[k])
        y = g_diag * (u - xi)
        acc += float(np.sum(y * y))
        for _ in range(2):
            h = dt / 2
            k1 = p_diag * (u - xi)
            k2 = p_diag * (u - (xi + h * k1))
            xi = xi + h * 0.5 * (k1 + k2)
    return acc


def test_loopshaping_reduces_shaping_functional(trot_setup):
    """The point of loopshaping: the shaped solution carries less energy in
    the penalized frequency band — sum |s_inv(jw) u|^2 drops vs the unshaped
    solution of the same task (measured ~18% on this trot)."""
    problem, defn, grid, params = trot_setup
    x0 = model.default_state()
    u0 = model.weight_compensating_input(jnp.ones(4))
    st = make_solver_settings()
    xs_init, us_init = loopshaped_warm_start(defn, grid, x0)
    sol_ls = jax.jit(
        lambda x: sqp.solve(
            problem, grid, x, params,
            xs_init=xs_init, us_init=us_init, settings=st,
        )
    )(augment_state(defn, x0, u0))
    _, us_shaped = plant_trajectory(defn, sol_ls.xs, sol_ls.us)

    plain = interface.make_problem()
    sol_plain = jax.jit(
        lambda x: sqp.solve(
            plain, grid, x, params,
            us_init=jnp.tile(u0[None], (40, 1)),
            settings=sqp.SqpSettings(max_iterations=12, integrator="rk2"),
        )
    )(x0)

    y_shaped = _y_sse(np.asarray(us_shaped), defn, grid, u0)
    y_plain = _y_sse(np.asarray(sol_plain.us), defn, grid, u0)
    assert y_shaped < 0.9 * y_plain, (y_shaped, y_plain)
    y = filtered_output(defn, sol_ls.xs, sol_ls.us)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_loopshaped_dummy_loop_trot():
    """Closed-loop loopshaped trot in the dummy loop — the analogue of
    ocs2_anymal_loopshaping_mpc's dummy MRT node (VERDICT r4 item 4
    done-criterion)."""
    from ocs2_tpu.models.legged_robot.interface import (
        SwitchedModelReferenceManager,
        default_target,
    )
    from ocs2_tpu.mpc.mpc import Mpc, MpcSettings
    from ocs2_tpu.mpc.mrt import MpcMrtInterface, dummy_loop

    problem, defn = make_loopshaping_problem()
    gs = GaitSchedule(trot_gait(0.7))
    rm = SwitchedModelReferenceManager(gs)
    horizon, n = 0.7, 28
    ms0 = gs.mode_schedule(0.0, horizon)
    grid0 = make_time_grid(
        0.0, horizon, n,
        event_times=np.asarray(ms0.event_times),
        mode_sequence=np.asarray(ms0.mode_sequence),
    )
    params = interface.make_params(grid0)
    mpc = Mpc(
        problem, params,
        settings=MpcSettings(
            time_horizon=horizon, num_intervals=n, solver="sqp"
        ),
        solver_settings=make_solver_settings(max_iterations=6),
        reference_manager=rm,
    )
    x0 = model.default_state()
    u0 = model.weight_compensating_input(jnp.ones(4))
    xa0 = augment_state(defn, x0, u0)
    iface = MpcMrtInterface(mpc)
    ts, xs, us = dummy_loop(
        iface, xa0, duration=1.2, mrt_frequency=50.0, mpc_frequency=12.5,
    )
    assert bool(jnp.all(jnp.isfinite(xs)))
    # The loopshaped closed loop keeps trotting in place: height holds and
    # attitude stays level.
    assert float(jnp.max(jnp.abs(xs[:, 8] - model.STAND_HEIGHT))) < 0.15
    assert float(jnp.max(jnp.abs(xs[:, 9:12]))) < 0.35


def test_load_loopshaping_info():
    """The reference's loopshaping.info grammar loads into a definition +
    pattern (LoopshapingPropertyTree.cpp:143-160: s_inv_filter sections are
    INVERTED and select the eliminate pattern)."""
    from ocs2_tpu.oc.loopshaping import load_loopshaping_info

    info = """
s_inv_filter
{
    numFilters 2;

    Filter0
    {
        numRepeats  12;
        numPoles    1;
        numZeros    1;
        scaling     4;
        zeros
        {
           (0)    0.0;
        }
        poles
        {
           (0) -100.0;
        }
    }

    Filter1
    {
        numRepeats  12;
        numPoles    1;
        numZeros    1;
        scaling     3;
        zeros
        {
           (0) 0.0;
        }
        poles
        {
           (0) -50.0;
        }
    }
}
"""
    defn, pattern = load_loopshaping_info(info)
    assert pattern == "eliminate"
    assert defn.A.shape == (24, 24)
    # Inverted transfer: H(jw) = (jw + 100) / (4 jw) on force channels.
    w = 5.0j
    A, B, C, D = (
        np.asarray(m, np.complex128) for m in (defn.A, defn.B, defn.C, defn.D)
    )
    H = D + C @ np.linalg.inv(w * np.eye(24) - A) @ B
    np.testing.assert_allclose(H[0, 0], (w + 100.0) / (4.0 * w), rtol=1e-6)
    np.testing.assert_allclose(H[12, 12], (w + 50.0) / (3.0 * w), rtol=1e-6)


def test_load_r_filter_info():
    from ocs2_tpu.oc.loopshaping import load_loopshaping_info

    info = """
r_filter
{
    numFilters 1;
    Filter0
    {
        numRepeats 2;
        scaling    2.0;
        zeros
        {
            (0) 0.0;
        }
        poles
        {
            (0) -30.0;
        }
    }
}
"""
    defn, pattern = load_loopshaping_info(info)
    assert pattern == "output"
    w = 3.0j
    A, B, C, D = (
        np.asarray(m, np.complex128) for m in (defn.A, defn.B, defn.C, defn.D)
    )
    H = D + C @ np.linalg.inv(w * np.eye(2) - A) @ B
    np.testing.assert_allclose(H[0, 0], 2.0 * w / (w + 30.0), rtol=1e-6)
