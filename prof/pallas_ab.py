"""A/B measurement: Pallas batch-minor Riccati dispatch on vs off, on chip.

Measures (1) the isolated lqr_backward at bench-relevant shapes, and (2) the
full end-to-end bench lanes (ballbot b4096 DDP, legged b256 SQP), with
OCS2_TPU_PALLAS forced on / off.  Also checks on-chip numerical agreement
between the two paths (the real-hardware correctness gate, VERDICT r4 weak
item 10).

Run:  python prof/pallas_ab.py [backward|ballbot|legged]
"""
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ocs2_tpu_jax_cache")

import jax
import jax.numpy as jnp


def _fence(x):
    # Device-side slice; transferring the full leaf would cost ~100 ms/MB
    # over the tunnel and swamp the kernel being measured (see bench._fence).
    np.asarray(jax.tree.leaves(x)[0].ravel()[:1])


def _timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        _fence(fn(*args))
    lat = []
    for _ in range(reps):
        tic = time.perf_counter()
        _fence(fn(*args))
        lat.append(time.perf_counter() - tic)
    return float(np.mean(lat))


def make_coeffs(key, B, N, nx, nu):
    from ocs2_tpu.ops.riccati import LqrCoeffs

    ks = jax.random.split(key, 10)
    r = lambda k, *s: 0.1 * jax.random.normal(k, (B, N) + s)
    eye = jnp.eye(nx)
    A = eye[None, None] + 0.05 * jax.random.normal(ks[0], (B, N, nx, nx))
    Quu = jnp.eye(nu)[None, None] + 0.0 * r(ks[1], nu, nu)
    Qxx = jnp.eye(nx)[None, None] * 1.0 + 0.0 * r(ks[2], nx, nx)
    return LqrCoeffs(
        A=A,
        B=r(ks[3], nx, nu),
        b=r(ks[4], nx),
        Qxx=jnp.broadcast_to(Qxx, (B, N, nx, nx)),
        qx=r(ks[5], nx),
        Quu=jnp.broadcast_to(Quu, (B, N, nu, nu)),
        qu=r(ks[6], nu),
        Qux=0.01 * jax.random.normal(ks[7], (B, N, nu, nx)),
        Qf=jnp.broadcast_to(jnp.eye(nx)[None], (B, nx, nx)),
        qf=0.1 * jax.random.normal(ks[8], (B, nx)),
    )


SHAPES = {
    "ballbot_b4096": (4096, 32, 10, 3),
    "legged_b256": (256, 100, 24, 24),
    "legged_b1024": (1024, 100, 24, 24),
    "quadrotor_b4096": (4096, 40, 12, 4),
}


_ITERS = int(os.environ.get("OCS2_AB_ITERS", "20"))
# chain the kernel inside one program: resolves sub-25ms times
# (the axon polling sync has ~25 ms granularity; a single kernel launch is
# invisible under it).


def _chained(backward):
    """Apply the backward _ITERS times with a data dependence so XLA cannot
    parallelize or elide the repeats; per-iteration time = total/_ITERS."""

    def run(coeffs, reg):
        def body(_, qf):
            sol = backward(coeffs._replace(qf=qf), reg)
            return qf + 1e-30 * sol.value_s[:, 0, :]

        return jax.lax.fori_loop(0, _ITERS, body, coeffs.qf)

    return jax.jit(run)


def bench_backward(only=None):
    from ocs2_tpu.ops import riccati
    from ocs2_tpu.ops.riccati_pallas import lqr_backward_pallas

    out = {}
    for tag, (B, N, nx, nu) in SHAPES.items():
        if only and tag != only:
            continue
        coeffs = make_coeffs(jax.random.PRNGKey(0), B, N, nx, nu)
        coeffs = jax.device_put(coeffs)
        reg = jnp.zeros((B,))

        f_pallas = jax.jit(lambda c, r: lqr_backward_pallas(c, r))
        f_xla = jax.jit(lambda c, r: riccati._lqr_backward_batched(c, r))

        sp = f_pallas(coeffs, reg)
        sx = f_xla(coeffs, reg)
        # On-chip agreement (correctness gate).
        gd = float(jnp.max(jnp.abs(sp.gains - sx.gains)))
        vd = float(jnp.max(jnp.abs(sp.value_S - sx.value_S)))
        tp = _timeit(_chained(lqr_backward_pallas), coeffs, reg, reps=5) / _ITERS
        tx = _timeit(_chained(riccati._lqr_backward_batched), coeffs, reg, reps=5) / _ITERS
        out[tag] = {
            "pallas_ms": round(tp * 1e3, 3),
            "xla_bm_ms": round(tx * 1e3, 3),
            "gain_maxdiff": gd,
            "valueS_maxdiff": vd,
        }
        print(tag, out[tag], flush=True)
    return out


def bench_ballbot():
    # Full solve lane A/B — uses the env var before importing any jitted fns.
    sys.path.insert(0, "/root/repo")
    import bench

    ps = bench.bench_batched_ddp_ballbot()
    print(
        json.dumps(
            {"mode": os.environ.get("OCS2_TPU_PALLAS", "auto"), "ballbot": ps}
        ),
        flush=True,
    )


def bench_legged():
    sys.path.insert(0, "/root/repo")
    import bench

    res = bench.bench_legged_mpc()
    print(
        json.dumps(
            {
                "mode": os.environ.get("OCS2_TPU_PALLAS", "auto"),
                "legged_b256": res["batched_solves_per_s_b256"],
                "solves_per_s": res["solves_per_s"],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "backward"
    sys.path.insert(0, "/root/repo")
    if which == "backward":
        bench_backward(only=sys.argv[2] if len(sys.argv) > 2 else None)
    elif which == "ballbot":
        bench_ballbot()
    elif which == "legged":
        bench_legged()
