"""Benchmarks on real TPU hardware.

Primary metric (vs_baseline): legged-robot MPC solves/s at N=100 horizon
against the reference's 50 Hz real-time target (BASELINE.md: legged-robot
task.info mpcDesiredFrequency, 20 ms budget/solve).

Additional north-star metrics (BASELINE.json):
* batched DDP/SLQ solves/s at batch 4096 on ballbot (>= 10,000 target),
* quadrotor 4096-scenario batched SQP solves/s,
* legged-robot batched SQP throughput (b=256).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

MEASUREMENT NOTES (axon tunneled-TPU backend semantics, established
empirically):
* `jax.block_until_ready` does NOT wait for device execution until the
  process has performed one device->host readback; after the first readback
  the client switches to a polling sync with ~25 ms granularity.  All
  timings below therefore (1) perform one sacrificial readback up front so
  every subsequent sync is honest, and (2) fence with a tiny device->host
  readback (`_fence`).
* The legged MPC metric times CHAINS of data-dependent solves (each tick's
  initial state and warm start come from the previous solution — exactly the
  receding-horizon dependency structure), with one fence per chain so the
  ~25 ms poll amortizes instead of polluting every tick.  Reported
  p50/p99 are per-solve times of chain segments.
"""
import json
import time

import numpy as np


def _fence(x) -> None:
    """True execution fence: tiny device->host readback."""
    leaf = jax_tree_first(x)
    np.asarray(leaf).ravel()[:1]


def jax_tree_first(x):
    import jax

    leaves = jax.tree.leaves(x)
    return leaves[0]


def _timeit(fn, *args, reps=20, warmup=2):
    lat = []
    for _ in range(warmup):
        _fence(fn(*args))
    for _ in range(reps):
        tic = time.perf_counter()
        _fence(fn(*args))
        lat.append(time.perf_counter() - tic)
    return np.asarray(lat)


def bench_legged_mpc():
    import jax
    import jax.numpy as jnp

    from ocs2_tpu.models.legged_robot import interface, model
    from ocs2_tpu.models.legged_robot.gait import GaitSchedule, trot_gait
    from ocs2_tpu.oc.time_discretization import make_time_grid
    from ocs2_tpu.solvers import sqp

    num_intervals = 100
    horizon = 1.0
    problem = interface.make_problem()
    gs = GaitSchedule(trot_gait(0.7))
    ms = gs.mode_schedule(0.0, horizon)
    grid = make_time_grid(
        0.0, horizon, num_intervals,
        event_times=np.asarray(ms.event_times),
        mode_sequence=np.asarray(ms.mode_sequence),
    )
    params = jax.device_put(interface.make_params(grid))
    u0 = model.weight_compensating_input(jnp.ones(4))
    us_init = jnp.tile(u0[None], (num_intervals, 1))
    settings = sqp.SqpSettings(max_iterations=10, integrator="rk2")

    @jax.jit
    def solve_tick(x0, us_warm, params):
        """One MPC tick: solve, then produce the next tick's initial state
        (advance one node along the optimized trajectory, receding-horizon
        style) and warm start (the solved inputs)."""
        sol = sqp.solve(
            problem, grid, x0, params, us_init=us_warm, settings=settings
        )
        return sol.xs[1], sol.us, sol.xs

    x0 = model.default_state()
    out = solve_tick(x0, us_init, params)  # compile
    _fence(out)  # sacrificial readback: honest syncs from here on

    # Dependent-chain latency: chains of `seg` receding-horizon ticks, one
    # fence per chain; per-solve latency = chain time / seg.
    seg, chains = 8, 12
    per_solve = []
    x, us = x0, us_init
    for _ in range(chains):
        tic = time.perf_counter()
        for _ in range(seg):
            x, us, xs = solve_tick(x, us, params)
        _fence(xs)
        per_solve.append((time.perf_counter() - tic) / seg)
    lat = np.asarray(per_solve)

    # Batched throughput (scenario batching on one chip).
    batch = 256
    x0s = x0[None] + 1e-3 * jnp.sin(
        jnp.arange(batch)[:, None] * jnp.arange(model.NX)[None, :]
    )
    bsolve = jax.jit(
        jax.vmap(
            lambda x, u, p: solve_tick(x, u, p)[2],
            in_axes=(0, None, None),
        )
    )
    blat = _timeit(bsolve, x0s, us_init, params, reps=3)
    return {
        "solves_per_s": 1.0 / lat.mean(),
        "p50_ms": float(np.percentile(lat, 50) * 1e3),
        "p99_ms": float(np.percentile(lat, 99) * 1e3),
        "batched_solves_per_s_b256": batch / blat.mean(),
    }


def bench_batched_ddp_ballbot(batch=4096):
    """Batched DDP (iLQR/SLQ-class) throughput — the >=10k/s north star."""
    import jax
    import jax.numpy as jnp

    from ocs2_tpu.models import ballbot
    from ocs2_tpu.oc.time_discretization import uniform_grid
    from ocs2_tpu.solvers import ddp

    problem = ballbot.make_problem()
    grid = uniform_grid(0.0, 1.0, 32)
    params = jax.device_put(ballbot.make_params())
    st = ddp.DdpSettings(algorithm="ilqr", max_iterations=8)

    solve = jax.jit(
        jax.vmap(
            lambda x, p: ddp.solve(problem, grid, x, p, settings=st).xs,
            in_axes=(0, None),
        )
    )
    key = jax.random.PRNGKey(0)
    x0s = 0.1 * jax.random.normal(key, (batch, ballbot.NX))
    lat = _timeit(solve, x0s, params, reps=5)
    return batch / lat.mean()


def bench_batched_quadrotor(batch=4096):
    """4096-scenario quadrotor batch (BASELINE.json scenario config)."""
    import jax
    import jax.numpy as jnp

    from ocs2_tpu.models import quadrotor
    from ocs2_tpu.oc.time_discretization import uniform_grid
    from ocs2_tpu.solvers import sqp

    problem = quadrotor.make_problem()
    grid = uniform_grid(0.0, 2.0, 40)
    params = jax.device_put(quadrotor.make_params())
    st = sqp.SqpSettings(max_iterations=8, integrator="rk4")
    solve = jax.jit(
        jax.vmap(
            lambda x, p: sqp.solve(problem, grid, x, p, settings=st).xs,
            in_axes=(0, None),
        )
    )
    key = jax.random.PRNGKey(1)
    x0s = jnp.zeros((batch, quadrotor.NX)).at[:, 2].set(1.0)
    x0s = x0s + 0.05 * jax.random.normal(key, (batch, quadrotor.NX))
    lat = _timeit(solve, x0s, params, reps=3)
    return batch / lat.mean()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocs2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    legged = bench_legged_mpc()
    ballbot_ps = bench_batched_ddp_ballbot()
    quad_ps = bench_batched_quadrotor()

    print(
        json.dumps(
            {
                "metric": "legged_robot_mpc_solves_per_s_N100",
                "value": round(float(legged["solves_per_s"]), 2),
                "unit": "solves/s",
                "vs_baseline": round(float(legged["solves_per_s"]) / 50.0, 3),
                "p50_ms": round(legged["p50_ms"], 2),
                "p99_ms": round(legged["p99_ms"], 2),
                "batched_solves_per_s_b256": round(
                    float(legged["batched_solves_per_s_b256"]), 1
                ),
                "ballbot_ddp_batched_solves_per_s_b4096": round(float(ballbot_ps), 1),
                "quadrotor_sqp_batched_solves_per_s_b4096": round(float(quad_ps), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
