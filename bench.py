"""Benchmarks on real TPU hardware.

Primary metric (vs_baseline): legged-robot MPC solves/s at N=100 horizon
against the reference's 50 Hz real-time target (BASELINE.md: legged-robot
task.info mpcDesiredFrequency, 20 ms budget/solve).

Additional north-star metrics (BASELINE.json):
* batched DDP/SLQ solves/s at batch 4096 on ballbot (>= 10,000 target),
* quadrotor 4096-scenario batched SQP solves/s,
* legged-robot batched SQP throughput (b=256).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

NOTE every jitted function takes its data (grid/params/warm start) as
ARGUMENTS — closed-over committed device arrays cost a fixed ~25 ms host
sync per call on remote TPU backends (see ocs2_tpu/oc/time_discretization.py).
"""
import json
import time

import numpy as np


def _timeit(fn, *args, reps=20, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    lat = []
    for _ in range(reps):
        tic = time.perf_counter()
        jax.block_until_ready(fn(*args))
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
    params = interface.make_params(grid)
    u0 = model.weight_compensating_input(jnp.ones(4))
    us_init = jnp.tile(u0[None], (num_intervals, 1))
    settings = sqp.SqpSettings(max_iterations=10, integrator="rk2")

    @jax.jit
    def solve(x0, grid, params, us_init):
        return sqp.solve(
            problem, grid, x0, params, us_init=us_init, settings=settings
        ).xs

    x0 = model.default_state()
    jax.block_until_ready(solve(x0, grid, params, us_init))  # compile

    # Warm latency: sequential solves (MPC-loop shape).
    lat = []
    for i in range(30):
        xi = x0 + 1e-3 * jnp.sin(jnp.arange(model.NX) * (i + 1))
        tic = time.perf_counter()
        jax.block_until_ready(solve(xi, grid, params, us_init))
        lat.append(time.perf_counter() - tic)
    lat = np.asarray(lat)

    # Batched throughput (scenario batching on one chip).
    batch = 256
    x0s = x0[None] + 1e-3 * jnp.sin(
        jnp.arange(batch)[:, None] * jnp.arange(model.NX)[None, :]
    )
    bsolve = jax.jit(
        jax.vmap(lambda x, g, p, u: solve(x, g, p, u), in_axes=(0, None, None, None))
    )
    blat = _timeit(bsolve, x0s, grid, params, us_init, reps=3)
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
    params = ballbot.make_params()
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
    params = quadrotor.make_params()
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
