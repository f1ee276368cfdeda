"""Pallas TPU kernel: batch-minor Riccati backward pass.

The hottest kernel of batched scenario solving (SURVEY §2.9 north star) as a
single fused Pallas program.  The XLA batch-minor path (ops/riccati.py
`_lqr_backward_batched`) already fixes the layout problem — matrix entries
ride the 128-lane axis — but the `lax.scan` carry (S, s) round-trips HBM
every step and fusion boundaries insert relayout copies (~12% of the solve
is pure copies in the device trace, PROFILE.md).

Here the grid is (batch-chunks, time); the value function (S, s) lives in
VMEM scratch across the whole time sweep (grid iterations on TPU execute
sequentially, last grid dimension innermost), stage operands stream
HBM -> VMEM through the BlockSpec pipeline (double-buffered by Pallas), and
the per-step math is the same entry-form arithmetic as the XLA path — VPU
work over [B_chunk] lane vectors.

Reference analogue: the partitioned parallel Riccati of GaussNewtonDDP.cpp
:516-552 and HPIPM's internal Riccati — re-expressed as a TPU kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .riccati import LqrCoeffs, LqrSolution

Array = jax.Array

# VMEM budget for choosing the batch-chunk width (bytes); the pipeline holds
# ~2x the stage blocks + outputs + the (S, s) scratch.
_VMEM_BUDGET = 4 * 1024 * 1024


def _chunk_size(nx: int, nu: int, batch: int) -> int:
    per_lane = 4 * (3 * nx * nx + 2 * nx * nu + nu * nu + 4 * nx + 3 * nu + 4)
    bc = _VMEM_BUDGET // (2 * per_lane)
    bc = max(128, (bc // 128) * 128)
    bc = min(bc, batch)
    while bc > 128 and batch % bc != 0:
        bc -= 128
    return bc if batch % bc == 0 else batch


# Matmul helpers as explicit contraction loops: a one-shot
# jnp.sum(a[:, :, None, :] * b[None, ...]) materializes an [i, k, j, B]
# intermediate on the Pallas VMEM stack (measured 29 MB > the 16 MB scoped
# limit at nx=10, B=2048); accumulating over k keeps temps at [i, j, B].
#
# Mosaic lowering constraint (measured on v5e): an integer index in a
# NON-LEADING dim of a 3D value lowers to a 3D lax.gather, which Mosaic
# rejects ("Only 2D gather is supported").  Leading-int indexing and
# lax.slice_in_dim lower fine, so every middle-dim index below is a slice.


def _col(a, k):
    """a[:, k, None, :] for [i, k, B] without a gather: [i, 1, B]."""
    return jax.lax.slice_in_dim(a, k, k + 1, axis=1)


def _mm(a, b):
    """[i, k, B] @ [k, j, B] -> [i, j, B]."""
    kdim = a.shape[1]
    acc = _col(a, 0) * b[0][None]
    for k in range(1, kdim):
        acc = acc + _col(a, k) * b[k][None]
    return acc


def _mTm(a, b):
    """[k, i, B]' @ [k, j, B] -> [i, j, B]."""
    kdim = a.shape[0]
    acc = a[0][:, None, :] * b[0][None]
    for k in range(1, kdim):
        acc = acc + a[k][:, None, :] * b[k][None]
    return acc


def _mv(a, v):
    """[i, k, B] @ [k, B] -> [i, B]."""
    kdim = a.shape[1]
    acc = _col(a, 0) * v[0][None, None, :]
    for k in range(1, kdim):
        acc = acc + _col(a, k) * v[k][None, None, :]
    return jnp.squeeze(acc, axis=1)


def _mTv(a, v):
    """[k, i, B]' @ [k, B] -> [i, B]."""
    kdim = a.shape[0]
    acc = a[0] * v[0][None, :]
    for k in range(1, kdim):
        acc = acc + a[k] * v[k][None, :]
    return acc


def _chol_solve(M, rhs, eps=1e-12):
    """Entry-form Cholesky solve: M [n, n, B] SPD, rhs [n, m, B]."""
    n = rhs.shape[0]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, eps))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    ys = []
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * ys[k]
        ys.append(s / L[i][i])
    zs = [None] * n
    for i in reversed(range(n)):
        s = ys[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * zs[k]
        zs[i] = s / L[i][i]
    return jnp.stack(zs, axis=0)


def _kernel(
    reg_ref, a_ref, bmat_ref, b_ref, qxx_ref, qx_ref, quu_ref, qu_ref,
    qux_ref, qf_ref, qfv_ref,
    gains_ref, kff_ref, vsm_ref, vsv_ref, dv1_ref, dv2_ref,
    s_scr, sv_scr,
):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        s_scr[:] = qf_ref[:]
        sv_scr[:] = qfv_ref[:]

    a = a_ref[0]          # [nx, nx, Bc]
    bm = bmat_ref[0]      # [nx, nu, Bc]
    b = b_ref[0]          # [nx, Bc]
    qxx = qxx_ref[0]
    qx = qx_ref[0]
    quu = quu_ref[0]
    qu = qu_ref[0]
    qux = qux_ref[0]
    reg = reg_ref[0]      # [Bc]
    s_mat = s_scr[:]
    s_vec = sv_scr[:]
    nu = quu.shape[0]

    sv = s_vec + _mv(s_mat, b)
    qu_hat = qu + _mTv(bm, sv)
    qx_hat = qx + _mTv(a, sv)
    s_b = _mm(s_mat, bm)
    s_a = _mm(s_mat, a)
    quu_hat = quu + _mTm(bm, s_b)
    # + reg * I on the diagonal (lanes broadcast); mask instead of scatter —
    # scatters don't lower well inside Pallas.
    row = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nu, nu), 1)
    eye = (row == col).astype(quu.dtype)
    quu_hat = quu_hat + eye[:, :, None] * reg[None, None, :]
    qux_hat = qux + _mTm(bm, s_a)
    qxx_hat = qxx + _mTm(a, s_a)
    kk = -_chol_solve(quu_hat, qux_hat)           # [nu, nx, Bc]
    kf = -jnp.squeeze(
        _chol_solve(quu_hat, qu_hat[:, None, :]), axis=1
    )  # [nu, Bc]
    quuk = _mm(quu_hat, kk)
    s_next = qxx_hat + _mTm(kk, quuk) + _mTm(kk, qux_hat) + _mTm(qux_hat, kk)
    s_next = 0.5 * (s_next + s_next.transpose(1, 0, 2))
    quukf = _mv(quu_hat, kf)
    sv_next = qx_hat + _mTv(kk, quukf) + _mTv(kk, qu_hat) + _mTv(qux_hat, kf)

    gains_ref[0] = kk
    kff_ref[0] = kf
    vsm_ref[0] = s_next
    vsv_ref[0] = sv_next
    dv1_ref[0, 0] = jnp.sum(kf * qu_hat, axis=0)
    dv2_ref[0, 0] = 0.5 * jnp.sum(kf * quukf, axis=0)
    s_scr[:] = s_next
    sv_scr[:] = sv_next


def lqr_backward_pallas(
    coeffs: LqrCoeffs, reg: Array, interpret: bool = False
) -> LqrSolution:
    """Batched backward pass; coeffs leaves carry a LEADING batch dim
    [B, N, ...], reg is [B] (same contract as riccati._lqr_backward_batched).
    """
    batch, n = coeffs.A.shape[0], coeffs.A.shape[1]
    nx, nu = coeffs.A.shape[2], coeffs.B.shape[3]
    dt = coeffs.A.dtype
    bc = _chunk_size(nx, nu, batch)
    n_chunks = batch // bc

    # Time-leading, batch-minor operand layout [N, n, m, B].
    a = jnp.transpose(coeffs.A, (1, 2, 3, 0))
    bm = jnp.transpose(coeffs.B, (1, 2, 3, 0))
    bv = jnp.transpose(coeffs.b, (1, 2, 0))
    qxx = jnp.transpose(coeffs.Qxx, (1, 2, 3, 0))
    qx = jnp.transpose(coeffs.qx, (1, 2, 0))
    quu = jnp.transpose(coeffs.Quu, (1, 2, 3, 0))
    qu = jnp.transpose(coeffs.qu, (1, 2, 0))
    qux = jnp.transpose(coeffs.Qux, (1, 2, 3, 0))
    qf = jnp.transpose(coeffs.Qf, (1, 2, 0))
    qfv = jnp.transpose(coeffs.qf, (1, 0))
    reg2 = jnp.broadcast_to(jnp.asarray(reg, dt), (batch,))[None, :]  # [1, B]

    # Reverse-time index maps: grid step i handles time node k = N-1-i.
    def stage4(c, i):
        return (n - 1 - i, 0, 0, c)

    def stage3(c, i):
        return (n - 1 - i, 0, c)

    grid = (n_chunks, n)
    out_shapes = (
        jax.ShapeDtypeStruct((n, nu, nx, batch), dt),  # gains
        jax.ShapeDtypeStruct((n, nu, batch), dt),      # kff
        jax.ShapeDtypeStruct((n, nx, nx, batch), dt),  # value_S (nodes 0..N-1)
        jax.ShapeDtypeStruct((n, nx, batch), dt),      # value_s
        # dv per step as [n, 1, B]: TPU block shapes need the trailing two
        # dims divisible by (8, 128) or equal to the array dims.
        jax.ShapeDtypeStruct((n, 1, batch), dt),       # dv1 per step
        jax.ShapeDtypeStruct((n, 1, batch), dt),       # dv2 per step
    )
    bs4 = lambda d1, d2: pl.BlockSpec(  # noqa: E731
        (1, d1, d2, bc), stage4, memory_space=pltpu.VMEM
    )
    bs3 = lambda d1: pl.BlockSpec(  # noqa: E731
        (1, d1, bc), stage3, memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bc), lambda c, i: (0, c), memory_space=pltpu.VMEM),
            bs4(nx, nx),  # A
            bs4(nx, nu),  # B
            bs3(nx),      # b
            bs4(nx, nx),  # Qxx
            bs3(nx),      # qx
            bs4(nu, nu),  # Quu
            bs3(nu),      # qu
            bs4(nu, nx),  # Qux
            pl.BlockSpec(
                (nx, nx, bc), lambda c, i: (0, 0, c), memory_space=pltpu.VMEM
            ),  # Qf
            pl.BlockSpec(
                (nx, bc), lambda c, i: (0, c), memory_space=pltpu.VMEM
            ),  # qf
        ],
        out_specs=[
            bs4(nu, nx),
            bs3(nu),
            bs4(nx, nx),
            bs3(nx),
            pl.BlockSpec(
                (1, 1, bc), lambda c, i: (n - 1 - i, 0, c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bc), lambda c, i: (n - 1 - i, 0, c),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((nx, nx, bc), dt),
            pltpu.VMEM((nx, bc), dt),
        ],
        interpret=interpret,
    )(reg2, a, bm, bv, qxx, qx, quu, qu, qux, qf, qfv)
    gains_t, kff_t, vsm_t, vsv_t, dv1_t, dv2_t = out

    gains = jnp.transpose(gains_t, (3, 0, 1, 2))  # [B, N, nu, nx]
    kff = jnp.transpose(kff_t, (2, 0, 1))
    value_S = jnp.concatenate(
        [jnp.transpose(vsm_t, (3, 0, 1, 2)), coeffs.Qf[:, None]], axis=1
    )
    value_s = jnp.concatenate(
        [jnp.transpose(vsv_t, (2, 0, 1)), coeffs.qf[:, None]], axis=1
    )
    return LqrSolution(
        gains=gains,
        kff=kff,
        value_S=value_S,
        value_s=value_s,
        dv1=jnp.sum(dv1_t[:, 0, :], axis=0),
        dv2=jnp.sum(dv2_t[:, 0, :], axis=0),
    )
