"""Perceptive constraints: signed-distance fields and terrain grids.

TPU-native re-design of ocs2_perceptive: `DistanceTransformInterface` /
`ComputeDistanceTransform` (distance_transform/*.h), the bilinear/trilinear
grid interpolation (interpolation/*.h), and the end-effector distance
constraints (end_effector/EndEffectorDistanceConstraint*.h); plus the planar
signed-distance field used by perceptive locomotion
(ocs2_robotic_examples/ocs2_perceptive_anymal/.../PlanarSignedDistanceField).

An SDF is a dense grid + origin + resolution; queries are trilinear gathers
— exactly the memory-access pattern TPUs like (small gathers batched over
horizon nodes / end effectors / scenarios).  The distance transform is
computed with the classic two-pass chamfer sweep expressed as `lax.scan`
over grid slabs (jittable, O(N) — replaces the reference's CPU kd-sweep).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class SignedDistanceField(NamedTuple):
    """Dense SDF grid (reference DistanceTransformInterface analogue).

    values: [NX, NY, NZ] signed distances (positive = free space).
    origin: [3] world position of cell (0,0,0) center.
    resolution: [] cell size (cubic cells).
    """

    values: Array
    origin: Array
    resolution: Array

    def query(self, point: Array) -> Array:
        """Trilinearly interpolated distance at a world point (reference
        interpolation/trilinear; clamps to the grid boundary)."""
        return trilinear_interpolate(
            self.values, (point - self.origin) / self.resolution
        )

    def gradient(self, point: Array) -> Array:
        return jax.grad(lambda pt: self.query(pt))(point)


def trilinear_interpolate(grid: Array, idx: Array) -> Array:
    """Trilinear interpolation of a [NX,NY,NZ] grid at fractional index
    [3] (batched by callers with vmap)."""
    shape = jnp.asarray(grid.shape, idx.dtype)
    idx = jnp.clip(idx, 0.0, shape - 1.0 - 1e-6)
    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = idx - i0.astype(idx.dtype)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(grid.shape, jnp.int32) - 1)

    def at(ix, iy, iz):
        return grid[ix, iy, iz]

    c000 = at(i0[0], i0[1], i0[2])
    c100 = at(i1[0], i0[1], i0[2])
    c010 = at(i0[0], i1[1], i0[2])
    c110 = at(i1[0], i1[1], i0[2])
    c001 = at(i0[0], i0[1], i1[2])
    c101 = at(i1[0], i0[1], i1[2])
    c011 = at(i0[0], i1[1], i1[2])
    c111 = at(i1[0], i1[1], i1[2])
    fx, fy, fz = frac[0], frac[1], frac[2]
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def bilinear_interpolate(grid: Array, idx: Array) -> Array:
    """Bilinear interpolation of a [NX,NY] grid at fractional index [2]
    (reference interpolation/bilinear — elevation maps)."""
    shape = jnp.asarray(grid.shape, idx.dtype)
    idx = jnp.clip(idx, 0.0, shape - 1.0 - 1e-6)
    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = idx - i0.astype(idx.dtype)
    i1 = jnp.minimum(i0 + 1, jnp.asarray(grid.shape, jnp.int32) - 1)
    c00 = grid[i0[0], i0[1]]
    c10 = grid[i1[0], i0[1]]
    c01 = grid[i0[0], i1[1]]
    c11 = grid[i1[0], i1[1]]
    fx, fy = frac[0], frac[1]
    return (
        c00 * (1 - fx) * (1 - fy)
        + c10 * fx * (1 - fy)
        + c01 * (1 - fx) * fy
        + c11 * fx * fy
    )


def _edt_1d_sq(f_sq: Array) -> Array:
    """Exact 1-D squared Euclidean distance transform along axis 0:
    out[p] = min_q ((p-q)^2 + f_sq[q])  (Felzenszwalb & Huttenlocher's
    separable formulation).  Expressed as a dense min-plus reduction —
    O(L^2) per line but fully vectorized (VPU-friendly broadcast + min),
    no data-dependent control flow."""
    length = f_sq.shape[0]
    i = jnp.arange(length, dtype=f_sq.dtype)
    d2 = jnp.square(i[:, None] - i[None, :])  # [L, L]
    flat = f_sq.reshape(length, -1)  # [L, M]
    out = jnp.min(d2[:, :, None] + flat[None, :, :], axis=1)
    return out.reshape(f_sq.shape)


def distance_transform(occupancy: Array, resolution: float) -> Array:
    """Exact EUCLIDEAN distance transform of a boolean occupancy grid ->
    unsigned distance to the nearest occupied cell (reference
    ComputeDistanceTransform computes Euclidean distances too).

    Separable per-axis squared-distance transforms (Felzenszwalb), so
    clearance constraints built on the SDF are conservative — a city-block
    (L1) sweep would overestimate free space by up to sqrt(3)x in 3D.
    """
    big = jnp.asarray(1e12, jnp.float32)
    d_sq = jnp.where(occupancy, 0.0, big)
    for axis in range(d_sq.ndim):
        d_sq = jnp.moveaxis(
            _edt_1d_sq(jnp.moveaxis(d_sq, axis, 0)), 0, axis
        )
    return jnp.sqrt(d_sq) * resolution


def signed_distance_field(
    occupancy: Array, origin, resolution: float
) -> SignedDistanceField:
    """Build an SDF from occupancy: positive outside obstacles, negative
    inside (reference PlanarSignedDistanceField construction)."""
    outside = distance_transform(occupancy, resolution)
    inside = distance_transform(~occupancy, resolution)
    values = jnp.where(occupancy, -inside, outside)
    return SignedDistanceField(
        values=values,
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def ee_distance_constraint(
    sdf: SignedDistanceField,
    ee_positions: Callable[[Array], Array],  # x -> [E, 3] world points
    clearance: float = 0.0,
):
    """State inequality h(t,x,p) = sdf(ee_i(x)) - clearance >= 0 per end
    effector (reference EndEffectorDistanceConstraint.h).  The SDF itself is
    read from params["sdf"] when present so perception updates never
    recompile."""

    def constraint(t, x, p):
        field: SignedDistanceField = p.get("sdf", sdf) if isinstance(p, dict) else sdf
        pts = ee_positions(x)
        return jax.vmap(field.query)(pts) - clearance

    return constraint
