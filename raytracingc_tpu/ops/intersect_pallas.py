"""Pallas TPU kernel: tiled closest-hit search over ray × triangle blocks.

This is the production form of the reference's hot loop
(``calculateRayCollision``'s triangle scan, ``raytracing.c:229-237``): a
streaming argmin over Möller–Trumbore distances for every (ray, triangle)
pair, O(R × T) with no acceleration structure, exactly like the C scan — but
tiled for the VPU instead of looping per scalar.

Layout
------
* Rays are passed transposed as six ``[8, R/8]`` component planes (ox…dz);
  each grid program owns a ``(6, 8, 128)`` block = 1024 rays.
* Triangles are packed as one ``[12, T]`` plane: rows are A (3), AB (3),
  AC (3), N (3) — edges precomputed on the host so the kernel skips the two
  vertex subtractions. A row slice yields a ``(1, 128)`` tile broadcasting
  along the 8-ray sublane axis.
* The inner unit of work is an ``(8 rays × 128 triangles)`` pairwise tile of
  pure VPU arithmetic. The kernel loops ray columns × triangle lane-chunks,
  carrying per-(ray, lane-slot) running minima, then reduces across lane slots.

Mosaic TPU cannot address single dynamic lanes (dynamic lane offsets must be
128-aligned), so per-column ray extraction and result scatter use masked
select/reduce against a lane iota instead of dynamic slicing — a ~1% overhead
against the inner MT loop.

Ties resolve to the lowest triangle index, matching the C scan order (strict
``<`` update). The kernel returns (best_dst, best_idx) per ray;
material/normal gathering and the differentiable distance recompute happen
outside (see ``intersect.py``). Padding triangles are all-zero ⇒ zero normal
fails the backface test ⇒ never hit, so no live-count masking is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingc_tpu.scene.types import EPSILON, MISS_DST, Triangles

# Tile geometry: 8 rays (sublanes) × 128 triangles (lanes) per inner step.
RAY_SUBLANES = 8
TRI_LANES = 128
# Ray columns per grid program (8 * 128 = 1024 rays, lane-aligned blocks).
COLS_PER_PROGRAM = 128

_BIG_I32 = 2**30  # plain int: jnp constants would be captured by the kernel


def _search_kernel(
    alive_ref, rays_ref, tris_ref, dst_ref, idx_ref, *, n_tri_chunks: int
):
    """One program: COLS_PER_PROGRAM ray columns vs. all T triangles.

    alive_ref: (G,) i32 in SMEM (whole array, indexed by program id) —
               0 ⇒ every ray in this tile is dead; the whole triangle loop is
               skipped (wavefront-style dead-tile elimination: after the first
               bounces, rays that missed the scene die in spatially-coherent
               clusters).
    rays_ref: (6, 8, COLS) f32 — ox, oy, oz, dx, dy, dz planes.
    tris_ref: (12, T) f32 — ax..az, abx..abz, acx..acz, nx..nz rows.
    dst_ref:  (8, COLS) f32 out.
    idx_ref:  (8, COLS) i32 out.
    """
    cols = dst_ref.shape[1]
    dst_ref[:, :] = jnp.full((RAY_SUBLANES, cols), MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full((RAY_SUBLANES, cols), -1, jnp.int32)

    @pl.when(alive_ref[pl.program_id(0)] != 0)
    def _run():
        _search_tile(rays_ref, tris_ref, dst_ref, idx_ref, n_tri_chunks)


def _search_tile(rays_ref, tris_ref, dst_ref, idx_ref, n_tri_chunks: int):
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (RAY_SUBLANES, TRI_LANES), 1)

    # Full ray component tiles, read once.
    ox_t, oy_t, oz_t = rays_ref[0], rays_ref[1], rays_ref[2]
    dx_t, dy_t, dz_t = rays_ref[3], rays_ref[4], rays_ref[5]

    def tri_row(r: int, j) -> jax.Array:
        off = pl.multiple_of(j * TRI_LANES, TRI_LANES)
        return tris_ref[r : r + 1, pl.ds(off, TRI_LANES)]  # (1, 128)

    def per_column(i, acc):
        acc_d, acc_i = acc
        col_mask = col_iota == i

        def extract(tile):  # (8, COLS) → (8, 1): masked cross-lane reduce
            return jnp.sum(jnp.where(col_mask, tile, 0.0), axis=1, keepdims=True)

        ox, oy, oz = extract(ox_t), extract(oy_t), extract(oz_t)
        dx, dy, dz = extract(dx_t), extract(dy_t), extract(dz_t)

        def per_tri_chunk(j, carry):
            best_d, best_i = carry
            ax, ay, az = tri_row(0, j), tri_row(1, j), tri_row(2, j)
            abx, aby, abz = tri_row(3, j), tri_row(4, j), tri_row(5, j)
            acx, acy, acz = tri_row(6, j), tri_row(7, j), tri_row(8, j)
            nx, ny, nz = tri_row(9, j), tri_row(10, j), tri_row(11, j)

            # Backface cull against the stored normal (``raytracing.c:189``).
            dn = dx * nx + dy * ny + dz * nz

            # h = dir × AC
            hx = dy * acz - dz * acy
            hy = dz * acx - dx * acz
            hz = dx * acy - dy * acx
            det = abx * hx + aby * hy + abz * hz
            degenerate = jnp.abs(det) < EPSILON
            inv_det = 1.0 / jnp.where(degenerate, 1.0, det)

            # s = origin − A
            sx = ox - ax
            sy = oy - ay
            sz = oz - az
            u = (sx * hx + sy * hy + sz * hz) * inv_det

            # q = s × AB
            qx = sy * abz - sz * aby
            qy = sz * abx - sx * abz
            qz = sx * aby - sy * abx
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            dst = (acx * qx + acy * qy + acz * qz) * inv_det

            valid = (
                (dn < 0.0)
                & ~degenerate
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (dst >= EPSILON)
            )
            dst = jnp.where(valid, dst, MISS_DST)
            take = dst < best_d  # strict < keeps earlier (lower-index) winner
            best_d = jnp.where(take, dst, best_d)
            best_i = jnp.where(take, j * TRI_LANES + lane_iota, best_i)
            return best_d, best_i

        init = (
            jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
            jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(0, n_tri_chunks, per_tri_chunk, init)

        # Cross-lane reduction: min distance, then the lowest index among the
        # lanes achieving it (exact-tie semantics of the sequential C scan).
        dmin = jnp.min(best_d, axis=1, keepdims=True)  # (8, 1)
        imin = jnp.min(
            jnp.where(best_d <= dmin, best_i, _BIG_I32), axis=1, keepdims=True
        )
        imin = jnp.where(dmin < MISS_DST, imin, -1)

        # Scatter this column's result into the accumulators (masked select —
        # dynamic single-lane stores are not addressable on TPU).
        acc_d = jnp.where(col_mask, dmin, acc_d)
        acc_i = jnp.where(col_mask, imin, acc_i)
        return acc_d, acc_i

    init = (
        jnp.full(shape, MISS_DST, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
    )
    acc_d, acc_i = jax.lax.fori_loop(0, cols, per_column, init)
    dst_ref[:, :] = acc_d
    idx_ref[:, :] = acc_i


def pack_triangles(tris: Triangles) -> jax.Array:
    """Host-side packing: [12, T] plane of A, AB, AC, N components."""
    a = tris.a
    return jnp.concatenate(
        [a.T, (tris.b - a).T, (tris.c - a).T, tris.normal.T], axis=0
    ).astype(jnp.float32)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _search_padded(alive_flags, rays_planes, tris_packed, interpret=False):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    n_tri_chunks = t // TRI_LANES
    grid = (n_cols // COLS_PER_PROGRAM,)

    kernel = functools.partial(_search_kernel, n_tri_chunks=n_tri_chunks)
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (G,) flags array
            pl.BlockSpec(
                (6, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, t), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, g),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RAY_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((RAY_SUBLANES, n_cols), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * RAY_SUBLANES * n_cols * t,
            bytes_accessed=(6 * RAY_SUBLANES + 2 * RAY_SUBLANES) * n_cols * 4
            + 12 * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, rays_planes, tris_packed)
    return dst, idx


def search_triangles_pallas(
    o: jax.Array,
    d: jax.Array,
    tris: Triangles,
    interpret: bool | None = None,
    alive: jax.Array | None = None,
):
    """Closest-hit triangle search. Returns ``(best_dst [R], best_idx [R])``.

    Handles layout: rays ``[R, 3]``×2 → ``(6, 8, ceil(R/8))`` planes (padded
    rays get zero directions, which hit nothing); triangle SoA → packed
    ``[12, T]`` (T must already be a multiple of 128, guaranteed by the scene
    builder's padding).

    ``alive``: optional bool ``[R]``; tiles of 1024 rays that are entirely
    dead skip the triangle loop and report misses (their results are unused
    by the masked integrator anyway).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = o.shape[0]
    t = tris.a.shape[0]
    assert t % TRI_LANES == 0, "triangle count must be padded to a multiple of 128"

    rays_per_program = RAY_SUBLANES * COLS_PER_PROGRAM
    r_padded = _round_up(max(r, 1), rays_per_program)
    cols_padded = r_padded // RAY_SUBLANES
    n_programs = r_padded // rays_per_program

    def to_planes(x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, r_padded - r), (0, 0)))
        # ray id = col * 8 + sublane ⇒ reshape (cols, 8) then transpose.
        return x.reshape(cols_padded, RAY_SUBLANES, 3).transpose(2, 1, 0)

    rays_planes = jnp.concatenate([to_planes(o), to_planes(d)], axis=0)  # (6, 8, C)
    tris_packed = pack_triangles(tris)

    if alive is None:
        alive_flags = jnp.ones((n_programs,), jnp.int32)
    else:
        padded = jnp.pad(alive.astype(jnp.int32), (0, r_padded - r))
        alive_flags = jnp.max(padded.reshape(n_programs, rays_per_program), axis=1)

    dst, idx = _search_padded(
        alive_flags, rays_planes, tris_packed, interpret=interpret
    )
    # (8, C) → ray-major [r_padded] → slice original count.
    dst = dst.T.reshape(r_padded)[:r]
    idx = idx.T.reshape(r_padded)[:r]
    return dst, idx
