"""Random LQ problem generators for solver tests.

Analogue of the reference's test fixture generators
(ocs2_oc/test/include/ocs2_oc/test/testProblemsGeneration.h:44-84:
getRandomCost / getRandomDynamics / getRandomConstraints).
"""
import jax
import jax.numpy as jnp

from ocs2_tpu.ops.riccati import LqrCoeffs


def random_psd(key, n, scale=1.0, eps=0.1):
    m = jax.random.normal(key, (n, n))
    return scale * (m @ m.T / n + eps * jnp.eye(n))


def random_lq_coeffs(key, horizon, nx, nu, defect_scale=0.1):
    keys = jax.random.split(key, 10)

    def batch_psd(k, dim, count, eps):
        return jax.vmap(lambda kk: random_psd(kk, dim, eps=eps))(
            jax.random.split(k, count)
        )

    a = jax.random.normal(keys[0], (horizon, nx, nx)) * (1.0 / jnp.sqrt(nx))
    a = a + jnp.eye(nx)[None] * 0.5
    b = jax.random.normal(keys[1], (horizon, nx, nu)) * 0.5
    bb = jax.random.normal(keys[2], (horizon, nx)) * defect_scale
    qxx = batch_psd(keys[3], nx, horizon, 0.2)
    quu = batch_psd(keys[4], nu, horizon, 0.5)
    qux = jax.random.normal(keys[5], (horizon, nu, nx)) * 0.05
    qx = jax.random.normal(keys[6], (horizon, nx))
    qu = jax.random.normal(keys[7], (horizon, nu))
    qf = random_psd(keys[8], nx, eps=0.3)
    qff = jax.random.normal(keys[9], (nx,))
    return LqrCoeffs(
        A=a, B=b, b=bb, Qxx=qxx, qx=qx, Quu=quu, qu=qu, Qux=qux, Qf=qf, qf=qff
    )
