"""Benchmark: legged-robot MPC solves/s at N=100 horizon on real TPU.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} as required
by the driver.  Baseline: the reference's real-time target of 50 solves/s on
an onboard CPU with 3 threads (BASELINE.md: legged-robot task.info mpc
frequency).  Extra context fields are included alongside.
"""
import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocs2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
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
    params = interface.make_params(grid)
    u0 = model.weight_compensating_input(jnp.ones(4))
    us_init = jnp.tile(u0[None], (num_intervals, 1))
    settings = sqp.SqpSettings(max_iterations=10, integrator="rk2")

    @jax.jit
    def solve(x0):
        return sqp.solve(
            problem, grid, x0, params, us_init=us_init, settings=settings
        )

    x0 = model.default_state()
    sol = solve(x0)
    jax.block_until_ready(sol.xs)  # compile

    # Warm latency: sequential solves (MPC-loop shape).
    lat = []
    for i in range(30):
        xi = x0 + 1e-3 * jnp.sin(jnp.arange(model.NX) * (i + 1))
        tic = time.perf_counter()
        jax.block_until_ready(solve(xi).xs)
        lat.append(time.perf_counter() - tic)
    lat = np.asarray(lat)
    solves_per_s = 1.0 / lat.mean()

    # Batched throughput (scenario batching on one chip).
    batch = 256
    x0s = x0[None] + 1e-3 * jnp.sin(
        jnp.arange(batch)[:, None] * jnp.arange(model.NX)[None, :]
    )
    bsolve = jax.jit(jax.vmap(solve))
    jax.block_until_ready(bsolve(x0s).xs)
    tic = time.perf_counter()
    reps = 3
    for _ in range(reps):
        jax.block_until_ready(bsolve(x0s).xs)
    batched_per_s = batch * reps / (time.perf_counter() - tic)

    print(
        json.dumps(
            {
                "metric": "legged_robot_mpc_solves_per_s_N100",
                "value": round(float(solves_per_s), 2),
                "unit": "solves/s",
                "vs_baseline": round(float(solves_per_s) / 50.0, 3),
                "p50_ms": round(float(np.percentile(lat, 50) * 1e3), 2),
                "p99_ms": round(float(np.percentile(lat, 99) * 1e3), 2),
                "batched_solves_per_s_b256": round(float(batched_per_s), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
