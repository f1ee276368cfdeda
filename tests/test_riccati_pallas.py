"""Pallas batch-minor Riccati kernel vs the XLA batch-minor path.

CPU CI runs the kernel in interpreter mode (bit-exact against
riccati._lqr_backward_batched); the real-TPU path is benchmarked by
bench.py/PROFILE.md.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lq_fixtures import random_lq_coeffs

from ocs2_tpu.ops.riccati import _lqr_backward_batched
from ocs2_tpu.ops.riccati_pallas import _chunk_size, lqr_backward_pallas


def _batched_coeffs(batch, horizon, nx, nu, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    base = [random_lq_coeffs(k, horizon, nx=nx, nu=nu) for k in keys]
    cb = jax.tree.map(lambda *xs: jnp.stack(xs), *base)
    reps = batch // 4
    return jax.tree.map(
        lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), cb
    )


class TestPallasRiccati:
    def test_matches_xla_batch_minor(self):
        cb = _batched_coeffs(256, 12, nx=5, nu=3)
        regs = jnp.tile(jnp.asarray([0.0, 1e-6, 0.1, 2.0]), 64)
        ref = _lqr_backward_batched(cb, regs)
        out = lqr_backward_pallas(cb, regs, interpret=True)
        for f in ref._fields:
            # Contraction order differs (k-accumulation vs fused reduce):
            # tolerances are float32 reassociation, not algorithmic error.
            np.testing.assert_allclose(
                np.asarray(getattr(out, f)), np.asarray(getattr(ref, f)),
                rtol=2e-4, atol=1e-5, err_msg=f,
            )

    def test_multi_chunk_grid(self):
        """Batch larger than one VMEM chunk exercises the chunk grid axis."""
        nx, nu = 8, 4
        cb = _batched_coeffs(512, 6, nx=nx, nu=nu, seed=3)
        bc = _chunk_size(nx, nu, 512)
        regs = jnp.full((512,), 1e-6)
        ref = _lqr_backward_batched(cb, regs)
        out = lqr_backward_pallas(cb, regs, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out.gains), np.asarray(ref.gains), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out.value_S), np.asarray(ref.value_S),
            rtol=1e-5, atol=1e-6,
        )

    def test_chunk_size_divides_batch(self):
        for nx, nu, batch in [(10, 3, 4096), (24, 12, 1024), (5, 2, 256)]:
            bc = _chunk_size(nx, nu, batch)
            assert batch % bc == 0, (nx, nu, batch, bc)
            assert bc >= 128 or bc == batch
