"""Fixed-step ODE integration and sensitivity discretization.

TPU-native analogue of the reference's integrator family
(ocs2_core/include/ocs2_core/integration/Integrator.h:43-52) and its
SensitivityIntegrator (integration/SensitivityIntegrator.h:64-88).

Design deltas vs the reference, on purpose:
* Adaptive-step ODE45 is replaced by fixed-step RK4 with substeps — adaptive
  step control is data-dependent control flow that XLA cannot tile; fixed-step
  with enough substeps reproduces the reference fixtures to tolerance (see
  tests/test_integrate.py).
* The "sensitivity discretizer" (discrete A = dx_{k+1}/dx_k, B = dx_{k+1}/du_k
  for Euler/RK2/RK4) is simply ``jax.jacfwd`` of the discrete step — JAX's AD
  replaces the hand-rolled chained Jacobians of SensitivityIntegrator.h.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array
# Continuous dynamics signature: f(t, x, u) -> dx/dt.
ContinuousDynamics = Callable[[Array, Array, Array], Array]
# Discrete step signature: step(t, x, u, dt) -> x_next.
DiscreteStep = Callable[[Array, Array, Array, Array], Array]


def euler_step(f: ContinuousDynamics, t, x, u, dt):
    return x + dt * f(t, x, u)


def rk2_step(f: ContinuousDynamics, t, x, u, dt):
    """Explicit midpoint rule — the reference SQP default (SqpSettings.h)."""
    k1 = f(t, x, u)
    k2 = f(t + 0.5 * dt, x + 0.5 * dt * k1, u)
    return x + dt * k2


def rk4_step(f: ContinuousDynamics, t, x, u, dt):
    k1 = f(t, x, u)
    k2 = f(t + 0.5 * dt, x + 0.5 * dt * k1, u)
    k3 = f(t + 0.5 * dt, x + 0.5 * dt * k2, u)
    k4 = f(t + dt, x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPPERS = {"euler": euler_step, "rk2": rk2_step, "rk4": rk4_step}


def discretize(
    f: ContinuousDynamics, method: str = "rk4", substeps: int = 1
) -> DiscreteStep:
    """Build a discrete step x_{k+1} = F(t_k, x_k, u_k, dt) from continuous f.

    ``substeps`` subdivides dt (zero-order-hold input) — the fixed-step stand-in
    for the reference's adaptive ODE45 (Integrator.h:43).
    """
    stepper = _STEPPERS[method.lower()]

    def step(t, x, u, dt):
        h = dt / substeps
        if substeps == 1:
            return stepper(f, t, x, u, h)

        def body(i, xc):
            return stepper(f, t + i * h, xc, u, h)

        return jax.lax.fori_loop(0, substeps, body, x)

    return step


class DiscreteTransition(NamedTuple):
    """One discretized transition with sensitivities:
    x_next ~= f + dfdx @ dx + dfdu @ du
    (analogue of VectorFunctionLinearApproximation produced by
    SensitivityIntegrator.h:82's DynamicsSensitivityDiscretizer).
    """

    f: Array  # x_{k+1}            [nx]
    dfdx: Array  # d x_{k+1} / d x_k  [nx, nx]
    dfdu: Array  # d x_{k+1} / d u_k  [nx, nu]


def sensitivity_step(step: DiscreteStep) -> Callable[..., DiscreteTransition]:
    """Discrete dynamics + exact Jacobians in one fused evaluation."""

    def run(t, x, u, dt):
        f = step(t, x, u, dt)
        dfdx = jax.jacfwd(lambda xx: step(t, xx, u, dt))(x)
        dfdu = jax.jacfwd(lambda uu: step(t, x, uu, dt))(u)
        return DiscreteTransition(f=f, dfdx=dfdx, dfdu=dfdu)

    return run


def integrate_trajectory(
    f: ContinuousDynamics,
    x0: Array,
    ts: Array,
    us: Array,
    method: str = "rk4",
    substeps: int = 1,
) -> Array:
    """Integrate x' = f(t,x,u) over grid ts [N+1] with ZOH inputs us [N, nu].

    Returns states [N+1, nx].  lax.scan replaces the reference's
    ODE_Base::integrateTimes loop (ocs2_core/integration).
    """
    step = discretize(f, method, substeps)

    def body(x, inp):
        t, u, dt = inp
        xn = step(t, x, u, dt)
        return xn, xn

    dts = ts[1:] - ts[:-1]
    _, xs = jax.lax.scan(body, x0, (ts[:-1], us, dts))
    return jnp.concatenate([x0[None], xs], axis=0)


def trapezoidal(values: Array, ts: Array) -> Array:
    """Trapezoidal quadrature of samples over grid ts
    (reference integration/TrapezoidalIntegration.h)."""
    dts = ts[1:] - ts[:-1]
    return jnp.sum(0.5 * dts * (values[1:] + values[:-1]), axis=0)
