"""Pallas TPU kernel: tiled closest-hit search over ray × triangle blocks.

This is the production form of the reference's hot loop
(``calculateRayCollision``'s triangle scan, ``raytracing.c:229-237``): a
streaming argmin over Möller–Trumbore distances for every (ray, triangle)
pair — but tiled for the VPU instead of looping per scalar, and accelerated
by two lane-aligned culling levels the C scan lacks:

1. **Dead-tile skip** — whole 1024-ray programs whose lanes are all dead
   (wavefront mask) skip everything (SMEM flags + ``pl.when``).
2. **Block-AABB range culling** — triangles arrive Morton-clustered in
   128-wide blocks with per-block AABBs (``ops/accel.py``). Each 8-ray packet
   slab-tests ALL blocks at once (blocks along the lane axis, one vectorized
   pass), then loops only the [first, last] hitting-block range. Sky packets
   hit nothing → empty range → zero MT work; hit packets scan a narrow
   Morton-local range. This keeps scalar↔vector synchronization to two
   reductions per packet (a per-chunk ``lax.cond`` costs a sync per block and
   measures ~4x SLOWER than no culling at all).

Layout
------
* Rays are passed transposed as six ``[8, R/8]`` component planes (ox…dz);
  each grid program owns a ``(6, 8, 128)`` block = 1024 rays.
* Triangles are packed as one ``[12, T]`` plane: rows are A (3), AB (3),
  AC (3), N (3) — edges precomputed on the host. A row slice yields a
  ``(1, 128)`` tile broadcasting along the 8-ray sublane axis.
* ``orig_idx`` ``[1, T]`` i32 carries ORIGINAL triangle ids; ties break
  toward the lowest original id, so results are bit-identical to the
  unsorted C scan order no matter how the accel permuted the blocks.
* Per-packet hitting-block ranges are precomputed VECTORIZED in XLA (any
  block count; memory bounded by a scan over block groups) and handed to the
  kernel as whole-array SMEM scalars.

Mosaic TPU cannot address single dynamic lanes (dynamic lane offsets must be
128-aligned), so per-column ray extraction and result scatter use masked
select/reduce against a lane iota instead of dynamic slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingc_tpu.ops.accel import TriangleAccel, trivial_accel
from raytracingc_tpu.scene.types import EPSILON, MISS_DST, Triangles

# Tile geometry: 8 rays (sublanes) × 128 triangles (lanes) per inner step.
RAY_SUBLANES = 8
TRI_LANES = 128
# Ray columns per grid program (8 * 128 = 1024 rays, lane-aligned blocks).
# Measured sweet spot: the per-column masked extract reduces over the whole
# (8, COLS) tile, so its cost is quadratic in COLS — 1024-column programs
# benched 28% SLOWER than 128 despite 8x fewer triangle-block DMAs. 128 is
# also the FLOOR: the (8, COLS) output tiles need 128-lane alignment
# (64-column programs fail BlockSpec verification).
COLS_PER_PROGRAM = 128

_BIG_I32 = 2**30  # plain int: jnp constants would be captured by the kernel


def _extract_column(tiles, col_mask, i):
    """Extract column ``i`` of each (8, COLS) tile as (8, 1) scalars.

    Mosaic cannot address single dynamic lanes (dynamic lane offsets must
    be 128-aligned); the two supported formulations are a masked
    select + reduction (default) and a dynamic cross-lane ROTATE
    (``pltpu.roll``) + static lane-0 slice (``RTC_EXTRACT=roll``). Both
    are pure data movement — bitwise-identical outputs (tested) — but the
    dynamic rotate measured 37% SLOWER on the whole 990k bench (1.85e7 vs
    2.96e7 rays/s, round 5): Mosaic's variable-shift lane rotate costs
    far more than the select+reduce log-tree. Kept as an A/B knob so the
    dead end stays reproducible; do not flip without re-measuring.
    """
    import os

    mode = os.environ.get("RTC_EXTRACT", "reduce")
    assert mode in ("roll", "reduce"), (
        f"RTC_EXTRACT={mode!r}: expected 'roll' or 'reduce'"
    )
    if mode == "roll":
        return tuple(
            pltpu.roll(t, shift=-i, axis=1)[:, 0:1] for t in tiles
        )
    return tuple(
        jnp.sum(jnp.where(col_mask, t, 0.0), axis=1, keepdims=True)
        for t in tiles
    )


def _mt_block_test(ray, tris_ref, oidx_ref, j, best_d, best_i,
                   enabled=None):
    """Möller–Trumbore over one 128-triangle block for one 8-ray packet.

    ``ray`` = (ox, oy, oz, dx, dy, dz) as (8, 1) tiles; ``j`` is the block
    index (scalar). The SINGLE implementation shared by the range and
    bitmask kernels — their bit-identical contract rests on this: backface
    cull against the stored normal (``raytracing.c:189``), EPSILON
    degenerate/positive-distance tests (``raytracing.c:186-214``), and the
    lexicographic (dst, original index) running argmin that reproduces the
    sequential C scan order under any block permutation.

    ``enabled`` (optional scalar bool): when False the test's result is
    DISCARDED (``take`` masked off) — the grouped lockstep walks use this
    to turn an exhausted stream's filler trip into a true no-op, so
    results never depend on which block the filler happened to address
    (dead lanes included).
    """
    ox, oy, oz, dx, dy, dz = ray

    def tri_row(r: int) -> jax.Array:
        off = pl.multiple_of(j * TRI_LANES, TRI_LANES)
        return tris_ref[r : r + 1, pl.ds(off, TRI_LANES)]  # (1, 128)

    ax, ay, az = tri_row(0), tri_row(1), tri_row(2)
    abx, aby, abz = tri_row(3), tri_row(4), tri_row(5)
    acx, acy, acz = tri_row(6), tri_row(7), tri_row(8)
    nx, ny, nz = tri_row(9), tri_row(10), tri_row(11)
    off = pl.multiple_of(j * TRI_LANES, TRI_LANES)
    oidx = oidx_ref[0:1, pl.ds(off, TRI_LANES)]  # (1, 128) i32

    dn = dx * nx + dy * ny + dz * nz  # backface cull term

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
    oidx_b = jnp.broadcast_to(oidx, (RAY_SUBLANES, TRI_LANES))
    take = (dst < best_d) | ((dst == best_d) & (oidx_b < best_i))
    if enabled is not None:
        take = take & enabled
    best_d = jnp.where(take, dst, best_d)
    best_i = jnp.where(take, oidx_b, best_i)
    return best_d, best_i


def _column_argmin(best_d, best_i):
    """(8, 128) running argmin → (8, 1) min distance + lowest original id."""
    dmin = jnp.min(best_d, axis=1, keepdims=True)
    imin = jnp.min(
        jnp.where(best_d <= dmin, best_i, _BIG_I32), axis=1, keepdims=True
    )
    return dmin, jnp.where(dmin < MISS_DST, imin, -1)


def _search_kernel(
    alive_ref,  # (G,) i32 SMEM — whole array, indexed by program id
    first_ref,  # (C,) i32 SMEM — whole array: per-column first hitting block
    last_ref,  # (C,) i32 SMEM — whole array: per-column last hitting block
    rays_ref,  # (7, 8, COLS) f32 VMEM — ox, oy, oz, dx, dy, dz, alive planes
    tris_ref,  # (12, T) f32 VMEM — A, AB, AC, N rows (accel-permuted order)
    oidx_ref,  # (1, T) i32 VMEM — original triangle index per permuted slot
    dst_ref,  # (8, COLS) f32 out
    idx_ref,  # (8, COLS) i32 out
    *,
    n_tri_chunks: int,
):
    cols = dst_ref.shape[1]
    dst_ref[:, :] = jnp.full((RAY_SUBLANES, cols), MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full((RAY_SUBLANES, cols), -1, jnp.int32)

    pid = pl.program_id(0)
    col_base = pid * cols

    @pl.when(alive_ref[pid] != 0)
    def _run():
        _search_tile(first_ref, last_ref, rays_ref, tris_ref, oidx_ref,
                     dst_ref, idx_ref, n_tri_chunks, col_base=col_base)


def _search_tile(first_ref, last_ref, rays_ref, tris_ref, oidx_ref, dst_ref,
                 idx_ref, n_tri_chunks: int, col_base):  # noqa: D103
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    # Full ray component tiles, read once.
    ray_tiles = tuple(rays_ref[k] for k in range(6))

    def per_column(i, acc):
        acc_d, acc_i = acc
        col_mask = col_iota == i
        ray = _extract_column(ray_tiles, col_mask, i)

        # Per-column hitting-block range, precomputed VECTORIZED in XLA and
        # handed over via SMEM: scalar loop bounds with NO vector->scalar
        # sync (an in-kernel jnp.min/max to scalar per column measured
        # ~50 us/program of pipeline stalls — the kernel's old fixed cost).
        # Whole-array SMEM with absolute indexing: 1-D blocked SMEM specs
        # fail Mosaic layout verification (T(1024) vs T(128)).
        first = first_ref[col_base + i]
        last = last_ref[col_base + i]

        def per_tri_chunk(j, carry):
            return _mt_block_test(ray, tris_ref, oidx_ref, j, *carry)

        init = (
            jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
            jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
        )
        best_d, best_i = jax.lax.fori_loop(
            first, jnp.minimum(last + 1, n_tri_chunks), per_tri_chunk, init
        )
        dmin, imin = _column_argmin(best_d, best_i)

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
def _search_padded(alive_flags, first, last, rays_planes, tris_packed,
                   orig_idx, interpret=False):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    n_tri_chunks = t // TRI_LANES
    grid = (n_cols // COLS_PER_PROGRAM,)

    kernel = functools.partial(_search_kernel, n_tri_chunks=n_tri_chunks)
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (G,) alive flags
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (C,) first blocks
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (C,) last blocks
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, t), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda g: (0, 0), memory_space=pltpu.VMEM),
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
            + 13 * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, first, last, rays_planes, tris_packed, orig_idx)
    return dst, idx


# ----------------------------------------------------------------------------
# Tile-STREAMED range kernel: huge scenes, O(tile) VMEM instead of O(T).
#
# The resident kernels hold the whole (12, T) triangle plane in VMEM — a
# hard ceiling near ~130k triangles on a v5e (SURVEY §7's "block-streaming
# for ultracomplex-scale future scenes"; VERDICT r2 item 3). Here the grid
# gains a minor triangle-tile dimension: program (g, t) DMAs only tile t's
# (12, TILE) plane (Pallas double-buffers tiles across consecutive grid
# steps), clips each column's PRECOMPUTED global [first, last] hitting-block
# range to the tile — no extra SMEM over the resident range kernel — and
# lex-merges (dst, original idx) into the revisited output block. The merge
# is exact: per-block MT results are bitwise identical to the resident
# kernel's (same _mt_block_test on the same inputs), and min over a
# partition of the scan order is min over the whole order, so results stay
# bit-identical to the resident range kernel (tested, incl. C-order ties).
# ----------------------------------------------------------------------------

# Triangles per streamed tile. 16384 → a 768 KiB (12, TILE) f32 plane; with
# Pallas's automatic double-buffering the kernel's triangle VMEM is ~1.5 MiB
# regardless of scene size.
STREAM_TILE = 16384
# Total SMEM i32-word budget per kernel call for the per-(column, tile)
# culling tables. Measured on this v5e (tools/smem_probe.py, round 5): a
# whole-array SMEM input of 245,760 words (960 KiB) compiles and runs;
# 262,144 (1 MiB) fails Mosaic compilation — the ceiling is just under
# 1 MiB. 196,608 (768 KiB) leaves ~200 KiB for the kernels' other scalars
# (alive flags, De Bruijn table, Mosaic internals). The round-2 era bounds
# below (262144-ray / 524288-word heuristics) predate the measurement and
# stay for the legacy kernels' A/B comparability.
SMEM_WORDS_BUDGET = 196608
# Largest padded triangle count served by the VMEM-resident kernels: 65536
# is a 3 MiB plane (fetched once — the constant index map is not
# re-DMA'd per grid step). Above it, stream. Override: RTC_STREAM_MAX_T.
STREAM_MAX_RESIDENT_T = 65536


def _search_kernel_streamed(
    alive_ref,  # (G * n_tiles,) i32 SMEM — per-(program, tile) activity
    first_ref,  # (C,) i32 SMEM — per-column first hitting block (GLOBAL id)
    last_ref,  # (C,) i32 SMEM — per-column last hitting block (GLOBAL id)
    rays_ref,  # (7, 8, COLS) f32 VMEM
    tris_ref,  # (12, TILE) f32 VMEM — THIS TILE's triangle plane
    oidx_ref,  # (1, TILE) i32 VMEM
    dst_ref,  # (8, COLS) f32 out — revisited across the tile grid dim
    idx_ref,  # (8, COLS) i32 out — revisited across the tile grid dim
    *,
    blocks_per_tile: int,
    n_tiles: int,
):
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    pid = pl.program_id(0)
    tid = pl.program_id(1)
    col_base = pid * cols

    # The tile dim is minor: for each program, tid==0 runs first and must
    # initialize the revisited output block (Pallas outputs start undefined).
    @pl.when(tid == 0)
    def _init():
        dst_ref[:, :] = jnp.full(shape, MISS_DST, jnp.float32)
        idx_ref[:, :] = jnp.full(shape, -1, jnp.int32)

    @pl.when(alive_ref[pid * n_tiles + tid] != 0)
    def _run():
        col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ray_tiles = tuple(rays_ref[k] for k in range(6))
        tile_base = tid * blocks_per_tile

        def per_column(i, acc):
            acc_d, acc_i = acc
            col_mask = col_iota == i
            ray = _extract_column(ray_tiles, col_mask, i)

            # Clip the global range to this tile. Empty global ranges have
            # first == _BIG_I32 → lfirst >= lend → the loop body never runs.
            lfirst = jnp.maximum(first_ref[col_base + i] - tile_base, 0)
            lend = jnp.minimum(
                last_ref[col_base + i] - tile_base + 1, blocks_per_tile
            )

            def per_tri_chunk(j, carry):
                return _mt_block_test(ray, tris_ref, oidx_ref, j, *carry)

            init = (
                jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
                jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
            )
            best_d, best_i = jax.lax.fori_loop(
                lfirst, lend, per_tri_chunk, init
            )
            dmin, imin = _column_argmin(best_d, best_i)
            acc_d = jnp.where(col_mask, dmin, acc_d)
            acc_i = jnp.where(col_mask, imin, acc_i)
            return acc_d, acc_i

        init = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        acc_d, acc_i = jax.lax.fori_loop(0, cols, per_column, init)

        # Lex-merge this tile's result into the running best. Equal-distance
        # REAL hits take the lower original index (the C scan order across
        # tiles); misses are (MISS_DST, -1) on both sides, where the
        # acc_i >= 0 guard keeps the merge a no-op.
        cur_d = dst_ref[:, :]
        cur_i = idx_ref[:, :]
        take = (acc_d < cur_d) | (
            (acc_d == cur_d) & (acc_i >= 0) & (acc_i < cur_i)
        )
        dst_ref[:, :] = jnp.where(take, acc_d, cur_d)
        idx_ref[:, :] = jnp.where(take, acc_i, cur_i)


def _search_kernel_streamed_words(
    alive_ref,  # (G * n_tiles,) i32 SMEM — per-(program, tile) activity
    words_ref,  # (C * n_tiles,) i32 SMEM — per-(column, tile) superblock bits
    deb_ref,  # (32,) i32 SMEM — De Bruijn bit-index table
    rays_ref,  # (7, 8, COLS) f32 VMEM
    tris_ref,  # (12, TILE) f32 VMEM — THIS TILE's triangle plane
    oidx_ref,  # (1, TILE) i32 VMEM
    dst_ref,  # (8, COLS) f32 out — revisited across the tile grid dim
    idx_ref,  # (8, COLS) i32 out — revisited across the tile grid dim
    *,
    blocks_per_tile: int,
    n_tiles: int,
    granule: int,
):
    """Hierarchically-culled streamed search (VERDICT r3 item 5).

    The range-streamed kernel scans the contiguous [first, last] block span
    clipped to the tile — measured 63.6% DEAD interior blocks on the
    suzannes bench (BASELINE.md bitmask A/B), a fraction that grows with
    block count. Here each (column, tile) carries ONE i32 word whose bit j
    covers the ``granule`` blocks [j*granule, (j+1)*granule) of the tile
    (granule = ceil(blocks_per_tile/31), e.g. 5 for 16k-triangle tiles);
    the kernel walks exactly the SET bits (the same De Bruijn scalar walk
    as the resident bitmask kernel) — dead superblocks cost nothing.
    Results are bit-identical to the range kernel: the bits come from the
    same slab tests, every slab-passing block is still scanned, and
    ``_mt_block_test`` + the cross-tile lex merge are shared.
    """
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    pid = pl.program_id(0)
    tid = pl.program_id(1)
    col_base = pid * cols

    @pl.when(tid == 0)
    def _init():
        dst_ref[:, :] = jnp.full(shape, MISS_DST, jnp.float32)
        idx_ref[:, :] = jnp.full(shape, -1, jnp.int32)

    @pl.when(alive_ref[pid * n_tiles + tid] != 0)
    def _run():
        col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ray_tiles = tuple(rays_ref[k] for k in range(6))

        def per_column(i, acc):
            m0 = words_ref[(col_base + i) * n_tiles + tid]

            def active(acc):
                acc_d, acc_i = acc
                col_mask = col_iota == i
                ray = _extract_column(ray_tiles, col_mask, i)

                def bit_body(carry):
                    m, bd, bi = carry
                    lsb = m & (-m)
                    j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                    start = j * jnp.int32(granule)
                    end = jnp.minimum(
                        start + jnp.int32(granule),
                        jnp.int32(blocks_per_tile),
                    )

                    def per_tri_chunk(jj, carry2):
                        return _mt_block_test(ray, tris_ref, oidx_ref, jj,
                                              *carry2)

                    bd, bi = jax.lax.fori_loop(start, end, per_tri_chunk,
                                               (bd, bi))
                    return (m & (m - 1), bd, bi)

                init = (
                    m0,
                    jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST,
                             jnp.float32),
                    jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
                )
                _, best_d, best_i = jax.lax.while_loop(
                    lambda c: c[0] != 0, bit_body, init
                )
                dmin, imin = _column_argmin(best_d, best_i)
                return (
                    jnp.where(col_mask, dmin, acc_d),
                    jnp.where(col_mask, imin, acc_i),
                )

            # Empty-word columns skip everything INCLUDING the 6 masked
            # extracts (47% of columns in active pairs at 1M scale): a
            # per-COLUMN cond wraps enough work to pay for its sync, unlike
            # the measured per-BLOCK cond dead end (-75%).
            return jax.lax.cond(m0 != 0, active, lambda a: a, acc)

        init = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        acc_d, acc_i = jax.lax.fori_loop(0, cols, per_column, init)

        # Same cross-tile lex merge as the range-streamed kernel.
        cur_d = dst_ref[:, :]
        cur_i = idx_ref[:, :]
        take = (acc_d < cur_d) | (
            (acc_d == cur_d) & (acc_i >= 0) & (acc_i < cur_i)
        )
        dst_ref[:, :] = jnp.where(take, acc_d, cur_d)
        idx_ref[:, :] = jnp.where(take, acc_i, cur_i)


@functools.partial(
    jax.jit, static_argnames=("tile", "granule", "interpret")
)
def _search_padded_streamed_words(alive_flags, words, rays_planes,
                                  tris_packed, orig_idx, tile, granule,
                                  interpret=False):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    assert t % tile == 0 and tile % TRI_LANES == 0
    n_tiles = t // tile
    grid = (n_cols // COLS_PER_PROGRAM, n_tiles)

    kernel = functools.partial(
        _search_kernel_streamed_words,
        blocks_per_tile=tile // TRI_LANES,
        n_tiles=n_tiles,
        granule=granule,
    )
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_tiles,) activity
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C * n_tiles,) words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,) De Bruijn table
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, tile), lambda g, tt: (0, tt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g, tt: (0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, g),
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
            + 13 * t * 4 * (n_cols // COLS_PER_PROGRAM),
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, words, jnp.asarray(_DEBRUIJN_TABLE, jnp.int32),
      rays_planes, tris_packed, orig_idx)
    return dst, idx


def _search_kernel_streamed_words_tmajor(
    alive_ref,  # (G * n_tiles,) i32 SMEM — per-(program, tile) activity
    words_ref,  # (C * n_tiles,) i32 SMEM — per-(column, tile) superblock bits
    deb_ref,  # (32,) i32 SMEM — De Bruijn bit-index table
    rays_ref,  # (7, 8, COLS) f32 VMEM
    tris_ref,  # (12, TILE) f32 VMEM — THIS TILE's triangle plane
    oidx_ref,  # (1, TILE) i32 VMEM
    dst_ref,  # (1, 8, COLS) f32 out — one block per (tile, program)
    idx_ref,  # (1, 8, COLS) i32 out
    *,
    blocks_per_tile: int,
    n_tiles: int,
    granule: int,
):
    """TILE-MAJOR words-streamed search: DMA each triangle tile ONCE.

    The ray-major layout (`_search_kernel_streamed_words`) re-DMAs every
    tile for every program — triangle traffic = plane_bytes × programs
    (~3 GB per 64k-ray call at 1M triangles). Here the grid is
    ``(n_tiles, n_programs)`` with the tile index MAJOR, so each tile's
    (12, TILE) plane is fetched once per call while the small ray blocks
    (~28 KB) stream underneath — triangle traffic drops to plane_bytes × 1.
    TPU Pallas silently corrupts output blocks revisited across
    non-consecutive steps (measured), so each (tile, program) pair writes
    its OWN output block and the cross-tile lex-min folds in XLA
    afterwards — associative and commutative, hence bit-identical to the
    in-kernel merge order.
    """
    cols = dst_ref.shape[2]
    shape = (RAY_SUBLANES, cols)
    tid = pl.program_id(0)
    pid = pl.program_id(1)
    col_base = pid * cols

    dst_ref[0] = jnp.full(shape, MISS_DST, jnp.float32)
    idx_ref[0] = jnp.full(shape, -1, jnp.int32)

    @pl.when(alive_ref[pid * n_tiles + tid] != 0)
    def _run():
        col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ray_tiles = tuple(rays_ref[k] for k in range(6))

        def per_column(i, acc):
            m0 = words_ref[(col_base + i) * n_tiles + tid]

            def active(acc):
                acc_d, acc_i = acc
                col_mask = col_iota == i
                ray = _extract_column(ray_tiles, col_mask, i)

                def bit_body(carry):
                    m, bd, bi = carry
                    lsb = m & (-m)
                    j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                    start = j * jnp.int32(granule)
                    end = jnp.minimum(
                        start + jnp.int32(granule),
                        jnp.int32(blocks_per_tile),
                    )

                    def per_tri_chunk(jj, carry2):
                        return _mt_block_test(ray, tris_ref, oidx_ref, jj,
                                              *carry2)

                    bd, bi = jax.lax.fori_loop(start, end, per_tri_chunk,
                                               (bd, bi))
                    return (m & (m - 1), bd, bi)

                init = (
                    m0,
                    jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST,
                             jnp.float32),
                    jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
                )
                _, best_d, best_i = jax.lax.while_loop(
                    lambda c: c[0] != 0, bit_body, init
                )
                dmin, imin = _column_argmin(best_d, best_i)
                return (
                    jnp.where(col_mask, dmin, acc_d),
                    jnp.where(col_mask, imin, acc_i),
                )

            # Columns whose word is empty for THIS tile skip everything —
            # including the 6 masked extracts (measured 47% of columns in
            # active (program, tile) pairs at 1M-triangle scale). A
            # per-COLUMN cond wraps enough work to pay for its sync
            # (unlike the measured per-BLOCK cond dead end).
            return jax.lax.cond(m0 != 0, active, lambda a: a, acc)

        init = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        acc_d, acc_i = jax.lax.fori_loop(0, cols, per_column, init)
        dst_ref[0] = acc_d
        idx_ref[0] = acc_i


@functools.partial(
    jax.jit, static_argnames=("tile", "granule", "interpret")
)
def _search_padded_streamed_words_tmajor(alive_flags, words, rays_planes,
                                         tris_packed, orig_idx, tile,
                                         granule, interpret=False):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    assert t % tile == 0 and tile % TRI_LANES == 0
    n_tiles = t // tile
    n_programs = n_cols // COLS_PER_PROGRAM
    grid = (n_tiles, n_programs)

    kernel = functools.partial(
        _search_kernel_streamed_words_tmajor,
        blocks_per_tile=tile // TRI_LANES,
        n_tiles=n_tiles,
        granule=granule,
    )
    dst_t, idx_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_tiles,) activity
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C * n_tiles,) words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,) De Bruijn table
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, tile), lambda tt, g: (0, tt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda tt, g: (0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (tt, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (tt, 0, g),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, RAY_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, RAY_SUBLANES, n_cols), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * RAY_SUBLANES * n_cols * t,
            bytes_accessed=(6 * RAY_SUBLANES + 2 * RAY_SUBLANES) * n_cols * 4
            * n_tiles + 13 * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, words, jnp.asarray(_DEBRUIJN_TABLE, jnp.int32),
      rays_planes, tris_packed, orig_idx)

    # Cross-tile lex-min fold in XLA — two reduces reproduce the exact
    # in-kernel tie rule: lowest distance wins, then the lowest REAL
    # original index among distance ties.
    dst = jnp.min(dst_t, axis=0)  # (8, C)
    cand = jnp.where((dst_t == dst[None]) & (idx_t >= 0), idx_t, _BIG_I32)
    idx = jnp.min(cand, axis=0)
    idx = jnp.where((dst < MISS_DST) & (idx < _BIG_I32), idx, -1)
    return dst, idx


def packet_tile_words(o_p, d_p, a_p, accel: TriangleAccel, n_tiles: int,
                      blocks_per_tile: int, granule: int):
    """Per-(packet, tile) superblock hit words via AABB slab tests.

    Returns ``(C, n_tiles)`` int32 — bit ``j`` of tile ``t``'s word set iff
    any of blocks ``[t*bpt + j*granule, ...+granule)`` passes the slab test
    for any live lane of the packet. Same ``_slab_any_hit`` as the range
    and bitmask preludes (inverted padding AABBs masked). One tile per
    ``lax.map`` step bounds peak memory at ``(C, bpt)`` booleans.
    """
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < 1e-20, 1e-20, d_p)
    n_blocks = accel.aabb_lo.shape[0]
    bits_per_tile = -(-blocks_per_tile // granule)
    total = n_tiles * blocks_per_tile
    big = jnp.float32(3.0e38)
    lo_b = jnp.pad(accel.aabb_lo, ((0, total - n_blocks), (0, 0)),
                   constant_values=big).reshape(n_tiles, blocks_per_tile, 3)
    hi_b = jnp.pad(accel.aabb_hi, ((0, total - n_blocks), (0, 0)),
                   constant_values=-big).reshape(n_tiles, blocks_per_tile, 3)
    # Granule groups are TILE-LOCAL (bit j of tile t covers tile-local
    # blocks [j*granule, (j+1)*granule)); pad each tile's block list up to
    # bits_per_tile*granule before grouping so groups never straddle tiles.
    pad_b = bits_per_tile * granule - blocks_per_tile
    lo_b = jnp.pad(lo_b, ((0, 0), (0, pad_b), (0, 0)), constant_values=big)
    hi_b = jnp.pad(hi_b, ((0, 0), (0, pad_b), (0, 0)), constant_values=-big)
    # Slab-test GRANULE-UNION AABBs, not per-block boxes: the words are
    # granule-resolution anyway (the kernel scans a set bit's whole granule
    # run and lets MT reject), so testing the union box per bit is the same
    # kernel semantics with `granule`× fewer slab tests and NO group-OR
    # reduce — the per-block precompute measured 392 ms/frame (34%) at 1M
    # triangles (round-4 990k profile: reduce_max 258.6 + reduce_or
    # 121.8 ms). Union of an inverted padding box with a real box is the
    # real box; all-padding groups stay inverted (and masked).
    lo_g = lo_b.reshape(n_tiles, bits_per_tile, granule, 3).min(axis=2)
    hi_g = hi_b.reshape(n_tiles, bits_per_tile, granule, 3).max(axis=2)
    bits = jnp.int32(1) << jnp.arange(bits_per_tile, dtype=jnp.int32)

    def tile_word(args):
        lo, hi = args
        any_hit = _slab_any_hit(lo, hi, o_p, inv_p, a_p)  # (C, bits_per_tile)
        return jnp.sum(jnp.where(any_hit, bits[None, :], 0), axis=1,
                       dtype=jnp.int32)  # (C,)

    words = jax.lax.map(tile_word, (lo_g, hi_g))  # (n_tiles, C)
    return words.T  # (C, n_tiles)


def stream_words_per_pair(blocks_per_tile: int, granule: int) -> int:
    """SMEM words per (column, tile) at a given culling granule."""
    bits_per_tile = -(-blocks_per_tile // granule)
    return -(-bits_per_tile // BITS_PER_WORD)


def packet_tile_words_multi(o_p, d_p, a_p, accel: TriangleAccel,
                            n_tiles: int, blocks_per_tile: int,
                            granule: int):
    """Multi-word per-(packet, tile) superblock bits at any granule.

    Generalizes :func:`packet_tile_words` past the one-word (31-bit) cap:
    returns ``(C, n_tiles, W)`` int32 with ``W = ceil(ceil(bpt/granule)/31)``
    words per (column, tile); bit ``j`` of word ``w`` covers the
    tile-local blocks ``[(w*31+j)*granule, ...+granule)``. ``granule=1``
    is EXACT per-block culling — the slab boxes are then the per-block
    AABBs themselves. Same conservative-superset semantics at every
    granule (slab-passing union boxes; MT decides), so kernel results are
    bit-identical across granules.
    """
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < 1e-20, 1e-20, d_p)
    n_blocks = accel.aabb_lo.shape[0]
    bits_per_tile = -(-blocks_per_tile // granule)
    n_words = -(-bits_per_tile // BITS_PER_WORD)
    total = n_tiles * blocks_per_tile
    big = jnp.float32(3.0e38)
    lo_b = jnp.pad(accel.aabb_lo, ((0, total - n_blocks), (0, 0)),
                   constant_values=big).reshape(n_tiles, blocks_per_tile, 3)
    hi_b = jnp.pad(accel.aabb_hi, ((0, total - n_blocks), (0, 0)),
                   constant_values=-big).reshape(n_tiles, blocks_per_tile, 3)
    # Tile-local granule groups (padded so groups never straddle tiles),
    # then word groups padded to W*31 bits.
    pad_b = bits_per_tile * granule - blocks_per_tile
    lo_b = jnp.pad(lo_b, ((0, 0), (0, pad_b), (0, 0)), constant_values=big)
    hi_b = jnp.pad(hi_b, ((0, 0), (0, pad_b), (0, 0)), constant_values=-big)
    lo_g = lo_b.reshape(n_tiles, bits_per_tile, granule, 3).min(axis=2)
    hi_g = hi_b.reshape(n_tiles, bits_per_tile, granule, 3).max(axis=2)
    pad_w = n_words * BITS_PER_WORD - bits_per_tile
    lo_g = jnp.pad(lo_g, ((0, 0), (0, pad_w), (0, 0)), constant_values=big)
    hi_g = jnp.pad(hi_g, ((0, 0), (0, pad_w), (0, 0)), constant_values=-big)
    bits = jnp.int32(1) << jnp.arange(BITS_PER_WORD, dtype=jnp.int32)

    def tile_words(args):
        lo, hi = args
        any_hit = _slab_any_hit(lo, hi, o_p, inv_p, a_p)  # (C, W*31)
        grp = any_hit.reshape(any_hit.shape[0], n_words, BITS_PER_WORD)
        return jnp.sum(jnp.where(grp, bits[None, None, :], 0), axis=2,
                       dtype=jnp.int32)  # (C, W)

    words = jax.lax.map(tile_words, (lo_g, hi_g))  # (n_tiles, C, W)
    return words.transpose(1, 0, 2)  # (C, n_tiles, W)


def _search_kernel_streamed_packed_tmajor(
    count_ref,  # (G * n_tiles,) i32 SMEM — active column count per pair
    colidx_ref,  # (G * n_tiles * COLS,) i32 SMEM — packed active column ids
    words_ref,  # (C * n_tiles * W,) i32 SMEM — per-(column, tile) bit words
    deb_ref,  # (32,) i32 SMEM — De Bruijn bit-index table
    rays_ref,  # (7, 8, COLS) f32 VMEM
    tris_ref,  # (12, TILE) f32 VMEM — THIS TILE's triangle plane
    oidx_ref,  # (1, TILE) i32 VMEM
    dst_ref,  # (1, 8, COLS) f32 out — one block per (tile, program)
    idx_ref,  # (1, 8, COLS) i32 out
    *,
    blocks_per_tile: int,
    n_tiles: int,
    granule: int,
    n_words: int,
    group: int = 1,
):
    """Packed-column, multi-word streamed search (round-5 architecture).

    Two changes over ``_search_kernel_streamed_words_tmajor``, both measured
    on the 990k/247k benches (BASELINE.md round 5):

    1. **Packed active columns.** XLA packs each (program, tile) pair's
       active column ids (any word nonzero) to the front of a 128-entry
       SMEM segment; the kernel iterates EXACTLY those (the resident
       bitmask kernel's strategy, ``_search_tile_bitmask``) — inactive
       columns cost nothing, where the per-column ``lax.cond`` they replace
       paid a scalar/vector sync each (96%+ of columns are inactive per
       pair at 990k: measured active_col_frac 0.037).
    2. **Multi-word granules.** ``W`` static words per (column, tile) allow
       granules below ``ceil(bpt/31)`` — down to ``granule=1``, exact
       per-block bits. The round-5 sweep measured 77% of MT-scanned blocks
       DEAD inside set granule-5 bits (tools/granule_analysis.py); finer
       granules trade XLA slab-precompute cost for that dead MT work.

    Results are bit-identical to the words/range kernels at every granule:
    ascending (word, bit, block) walk order is ascending block order, the
    per-block MT is the shared ``_mt_block_test``, and the cross-tile fold
    is the same XLA lex-min.
    """
    cols = dst_ref.shape[2]
    shape = (RAY_SUBLANES, cols)
    tid = pl.program_id(0)
    pid = pl.program_id(1)
    col_base = pid * cols
    pair = pid * n_tiles + tid

    dst_ref[0] = jnp.full(shape, MISS_DST, jnp.float32)
    idx_ref[0] = jnp.full(shape, -1, jnp.int32)

    n_active = count_ref[pair]

    @pl.when(n_active != 0)
    def _run():
        col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        ray_tiles = tuple(rays_ref[k] for k in range(6))

        def per_active_column(jj, acc):
            acc_d, acc_i = acc
            i = colidx_ref[pair * cols + jj]
            col_mask = col_iota == i
            ray = _extract_column(ray_tiles, col_mask, i)

            best = (
                jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
                jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
            )
            wbase = ((col_base + i) * n_tiles + tid) * n_words
            for w in range(n_words):  # static → unrolled
                m0 = words_ref[wbase + w]
                bit_base = w * BITS_PER_WORD

                def bit_body(carry, bit_base=bit_base):
                    m, bd, bi = carry
                    lsb = m & (-m)
                    j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                    start = (bit_base + j) * jnp.int32(granule)
                    end = jnp.minimum(
                        start + jnp.int32(granule),
                        jnp.int32(blocks_per_tile),
                    )

                    def per_tri_chunk(b, carry2):
                        return _mt_block_test(ray, tris_ref, oidx_ref, b,
                                              *carry2)

                    bd, bi = jax.lax.fori_loop(start, end, per_tri_chunk,
                                               (bd, bi))
                    return (m & (m - 1), bd, bi)

                m, bd, bi = jax.lax.while_loop(
                    lambda c: c[0] != 0, bit_body, (m0, *best)
                )
                best = (bd, bi)

            dmin, imin = _column_argmin(*best)
            return (
                jnp.where(col_mask, dmin, acc_d),
                jnp.where(col_mask, imin, acc_i),
            )

        def per_group(pp, acc):
            # GROUPED lockstep walk (see _search_tile_bitmask.per_group):
            # K columns advance through each word together, one MT block
            # test per stream per trip. The (bit, granule-range) nesting is
            # FLATTENED into a uniform block-test stream per column: a trip
            # first refills an exhausted range from the stream's next set
            # bit, then tests one block. Streams out of work issue a
            # filler test whose result is discarded (enabled=False), so
            # results are bit-identical to the K=1 walk, dead lanes
            # included. Dispatch sorts active columns by descending total
            # bit count to keep lockstep groups homogeneous.
            acc_d, acc_i = acc
            jjs = [jnp.minimum(group * pp + k, n_active - 1)
                   for k in range(group)]
            cols_i = [colidx_ref[pair * cols + jj] for jj in jjs]
            masks_i = [col_iota == i for i in cols_i]
            rays_i = [_extract_column(ray_tiles, mk, i)
                      for mk, i in zip(masks_i, cols_i)]
            init_best = (
                jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
                jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
            )
            bests = [init_best for _ in range(group)]
            wbases = [((col_base + i) * n_tiles + tid) * n_words
                      for i in cols_i]
            for w in range(n_words):  # static → unrolled
                m0s = [words_ref[wb + w] for wb in wbases]
                bit_base = w * BITS_PER_WORD

                def body(carry, bit_base=bit_base):
                    ms = carry[0:group]
                    pss = carry[group:2 * group]
                    pes = carry[2 * group:3 * group]
                    bs = carry[3 * group:]
                    out_m, out_ps, out_pe, out_b = [], [], [], []
                    for k in range(group):
                        m, ps, pe = ms[k], pss[k], pes[k]
                        # Refill: range exhausted and bits remain → pop the
                        # next set bit into [ps, pe).
                        need = (ps >= pe) & (m != 0)
                        lsb = m & (-m)
                        j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27)
                                    & 31]
                        start = (bit_base + j) * jnp.int32(granule)
                        end = jnp.minimum(
                            start + jnp.int32(granule),
                            jnp.int32(blocks_per_tile),
                        )
                        ps = jnp.where(need, start, ps)
                        pe = jnp.where(need, end, pe)
                        m = jnp.where(need, m & (m - 1), m)
                        avail = ps < pe
                        blk = jnp.where(avail, ps, 0)
                        bd, bi = _mt_block_test(
                            rays_i[k], tris_ref, oidx_ref, blk,
                            bs[2 * k], bs[2 * k + 1], enabled=avail)
                        out_m.append(m)
                        out_ps.append(jnp.where(avail, ps + 1, ps))
                        out_pe.append(pe)
                        out_b.extend((bd, bi))
                    return tuple(out_m + out_ps + out_pe + out_b)

                def any_left(c):
                    left = (c[0] != 0) | (c[group] < c[2 * group])
                    for k in range(1, group):
                        left = left | (c[k] != 0) | (
                            c[group + k] < c[2 * group + k])
                    return left

                carry = tuple(
                    m0s + [jnp.int32(0)] * group + [jnp.int32(0)] * group
                    + [x for b in bests for x in b]
                )
                carry = jax.lax.while_loop(any_left, body, carry)
                bests = [(carry[3 * group + 2 * k],
                          carry[3 * group + 2 * k + 1])
                         for k in range(group)]

            for k in range(group):
                dk, ik = _column_argmin(*bests[k])
                acc_d = jnp.where(masks_i[k], dk, acc_d)
                acc_i = jnp.where(masks_i[k], ik, acc_i)
            return acc_d, acc_i

        init = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        if group == 1:
            acc_d, acc_i = jax.lax.fori_loop(0, n_active, per_active_column,
                                             init)
        else:
            acc_d, acc_i = jax.lax.fori_loop(
                0, (n_active + group - 1) // group, per_group, init
            )
        dst_ref[0] = acc_d
        idx_ref[0] = acc_i


@functools.partial(
    jax.jit, static_argnames=("tile", "granule", "interpret", "group")
)
def _search_padded_streamed_packed_tmajor(counts, colidx, words, rays_planes,
                                          tris_packed, orig_idx, tile,
                                          granule, interpret=False, group=1):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    assert t % tile == 0 and tile % TRI_LANES == 0
    n_tiles = t // tile
    n_programs = n_cols // COLS_PER_PROGRAM
    grid = (n_tiles, n_programs)
    bpt = tile // TRI_LANES
    n_words = stream_words_per_pair(bpt, granule)

    kernel = functools.partial(
        _search_kernel_streamed_packed_tmajor,
        blocks_per_tile=bpt,
        n_tiles=n_tiles,
        granule=granule,
        n_words=n_words,
        group=group,
    )
    dst_t, idx_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_tiles,) counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # packed column ids
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C * n_tiles * W,) words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,) De Bruijn table
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, tile), lambda tt, g: (0, tt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda tt, g: (0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (tt, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda tt, g: (tt, 0, g),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, RAY_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, RAY_SUBLANES, n_cols), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * RAY_SUBLANES * n_cols * t,
            bytes_accessed=(6 * RAY_SUBLANES + 2 * RAY_SUBLANES) * n_cols * 4
            * n_tiles + 13 * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(counts, colidx, words, jnp.asarray(_DEBRUIJN_TABLE, jnp.int32),
      rays_planes, tris_packed, orig_idx)

    # Same cross-tile lex-min fold as the words tile-major kernel.
    dst = jnp.min(dst_t, axis=0)  # (8, C)
    cand = jnp.where((dst_t == dst[None]) & (idx_t >= 0), idx_t, _BIG_I32)
    idx = jnp.min(cand, axis=0)
    idx = jnp.where((dst < MISS_DST) & (idx < _BIG_I32), idx, -1)
    return dst, idx


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _search_padded_streamed(alive_flags, first, last, rays_planes,
                            tris_packed, orig_idx, tile, interpret=False):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    assert t % tile == 0 and tile % TRI_LANES == 0
    n_tiles = t // tile
    grid = (n_cols // COLS_PER_PROGRAM, n_tiles)

    kernel = functools.partial(
        _search_kernel_streamed,
        blocks_per_tile=tile // TRI_LANES,
        n_tiles=n_tiles,
    )
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_tiles,) activity
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C,) first blocks
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C,) last blocks
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, tile), lambda g, tt: (0, tt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda g, tt: (0, tt),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g, tt: (0, g),
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
            + 13 * t * 4 * (n_cols // COLS_PER_PROGRAM),
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, first, last, rays_planes, tris_packed, orig_idx)
    return dst, idx


def _stream_granule(blocks_per_tile: int, n_tiles: int) -> int:
    """Culling granule for the packed streamed kernel (RTC_STREAM_GRANULE).

    ``auto`` picks the FINEST granule whose SMEM tables still allow ≥4096
    rays per kernel call under ``SMEM_WORDS_BUDGET`` (words + packed column
    ids) — finer granules cut dead MT work (measured 77% of scanned blocks
    dead at granule 5, 990k bench) but cost more XLA slab precompute and
    smaller call widths; the 4096 floor keeps the call count bounded.
    Falls back to the one-word granule ``ceil(bpt/31)`` when nothing finer
    fits.
    """
    import os

    g0 = -(-blocks_per_tile // BITS_PER_WORD)
    env = os.environ.get("RTC_STREAM_GRANULE", "auto")
    if env != "auto":
        g = int(env)
        assert 1 <= g <= max(blocks_per_tile, 1), (
            f"RTC_STREAM_GRANULE={env}: expected 'auto' or an int in "
            f"[1, {blocks_per_tile}]"
        )
        return g
    per_program = RAY_SUBLANES * COLS_PER_PROGRAM
    for g in range(1, g0):
        w = stream_words_per_pair(blocks_per_tile, g)
        per_col = n_tiles * (w + 1)
        rays = (
            (RAY_SUBLANES * SMEM_WORDS_BUDGET // per_col)
            // per_program * per_program
        )
        if rays >= 4096:
            return g
    return g0


def _stream_tile_pad(tris_packed, orig_idx, tile):
    """Pad the packed plane/index to a tile multiple (zero triangles are
    degenerate → never valid; padded blocks are also outside every global
    range, so they are never even scanned — the pad only squares the DMA)."""
    t = tris_packed.shape[1]
    t_pad = _round_up(t, tile)
    if t_pad != t:
        tris_packed = jnp.pad(tris_packed, ((0, 0), (0, t_pad - t)))
        orig_idx = jnp.pad(orig_idx, ((0, 0), (0, t_pad - t)),
                           constant_values=_BIG_I32)
    return tris_packed, orig_idx


# ----------------------------------------------------------------------------
# Ray-major brute kernel for TINY scenes (<= 2 blocks / 256 triangles).
#
# The packet architecture's per-column cost (~50 vector ops for the masked
# extracts + reductions) dominates utterly when there are few triangle
# blocks: the dense-regime profile (triangles.txt, 14 triangles) showed 72%
# of the whole render inside the search kernel at 738 us per 16k-ray call.
# Here the layout is transposed: each program MT-tests its whole (8, COLS)
# ray tile against one triangle at a time, with the triangle's 12 components
# read as SMEM scalars and broadcast — no column loop, no extracts, no
# cross-lane argmin. Triangles stay in ORIGINAL order and the running argmin
# takes strictly-closer hits only, which IS the C scan order
# (``raytracing.c:229-237``: a later triangle replaces only on dst <).
# ----------------------------------------------------------------------------

# Auto-dispatch threshold for the ray-major brute kernel, from the round-3
# calibration grid (BASELINE.md "dispatch calibration"): brute wins every
# measured dense scene up to 1134 live triangles (1.6-2.3x) at BOTH 16k- and
# 64k-ray call widths, and first loses at 3584 (0.87-0.89x) — call width
# never flipped the outcome, so the threshold is on n_live alone, placed
# just above the largest measured win. RTC_BRUTE_MAX still overrides.
BRUTE_MAX_TRIS = 1536
# Static unroll budget: up to this many MT tests are fully unrolled (each
# with immediate SMEM offsets); beyond it a fori_loop with dynamic SMEM
# scalar reads keeps the Mosaic program size bounded.
BRUTE_UNROLL_TRIS = 256


def _search_kernel_brute(
    alive_ref,  # (G,) i32 SMEM — per-program any-live flags
    tri_ref,  # (12 * n_live,) f32 SMEM — per-triangle A, AB, AC, N scalars
    rays_ref,  # (6, 8, COLS) f32 VMEM
    dst_ref,  # (8, COLS) f32 out
    idx_ref,  # (8, COLS) i32 out
    *,
    n_live: int,
):
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    dst_ref[:, :] = jnp.full(shape, MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full(shape, -1, jnp.int32)

    pid = pl.program_id(0)

    @pl.when(alive_ref[pid] != 0)
    def _run():
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

        def one_triangle(j, best_d, best_i):
            b = 12 * j
            ax, ay, az = tri_ref[b + 0], tri_ref[b + 1], tri_ref[b + 2]
            abx, aby, abz = tri_ref[b + 3], tri_ref[b + 4], tri_ref[b + 5]
            acx, acy, acz = tri_ref[b + 6], tri_ref[b + 7], tri_ref[b + 8]
            nx, ny, nz = tri_ref[b + 9], tri_ref[b + 10], tri_ref[b + 11]

            dn = dx * nx + dy * ny + dz * nz  # backface cull
            hx = dy * acz - dz * acy
            hy = dz * acx - dx * acz
            hz = dx * acy - dy * acx
            det = abx * hx + aby * hy + abz * hz
            degenerate = jnp.abs(det) < EPSILON
            inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
            sx = ox - ax
            sy = oy - ay
            sz = oz - az
            u = (sx * hx + sy * hy + sz * hz) * inv_det
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
            take = dst < best_d  # strict <: original order = C scan order
            best_d = jnp.where(take, dst, best_d)
            best_i = jnp.where(take, jnp.int32(j), best_i)
            return best_d, best_i

        init = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, -1, jnp.int32),
        )
        if n_live <= BRUTE_UNROLL_TRIS:  # immediate SMEM offsets
            best_d, best_i = init
            for j in range(n_live):
                best_d, best_i = one_triangle(j, best_d, best_i)
        else:  # dynamic SMEM scalar reads, bounded program size
            best_d, best_i = jax.lax.fori_loop(
                0, n_live, lambda j, c: one_triangle(j, *c), init
            )
        dst_ref[:, :] = best_d
        idx_ref[:, :] = best_i


@functools.partial(jax.jit, static_argnames=("interpret", "n_live"))
def _search_padded_brute(alive_flags, tris_flat, rays_planes, n_live,
                         interpret=False):
    n_cols = rays_planes.shape[2]
    grid = (n_cols // COLS_PER_PROGRAM,)

    kernel = functools.partial(_search_kernel_brute, n_live=n_live)
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G,) alive flags
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (12 * n_live,) tris
            pl.BlockSpec(
                (6, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
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
            flops=60 * RAY_SUBLANES * n_cols * n_live,
            bytes_accessed=8 * RAY_SUBLANES * n_cols * 4 + 12 * n_live * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, tris_flat, rays_planes)
    return dst, idx


# ----------------------------------------------------------------------------
# Bitmask culling variant: iterate EXACTLY the hitting blocks per packet.
#
# Morton order makes a diagonal packet's contiguous [first, last] range span
# many non-hitting interior blocks — measured on the suzannes 1080p primary
# rays: mean range length 14.3 blocks vs 5.2 actually hitting (63.6% of
# scanned blocks dead). Here XLA packs per-column hit BITS (31 blocks per
# int32 word, bit 31 unused to dodge sign traps) into SMEM, and the kernel
# walks set bits with a scalar-only while loop:
#     lsb = m & -m;  j = popcount(lsb - 1);  m &= m - 1
# — no vector<->scalar sync, no per-block branch, identical scan order
# (ascending block index) so results stay bit-identical to the range scan.
# ----------------------------------------------------------------------------

BITS_PER_WORD = 31

# De Bruijn lowest-set-bit index: for a power of two ``b``,
# ``_DEBRUIJN_TABLE[((b * _DEBRUIJN) >> 27) & 31] == log2(b)``. Mosaic's
# scalar core has neither popcount nor bitcast, so the classic multiply+
# table-lookup is the supported way to extract a bit index (the table rides
# in SMEM; arithmetic-shift sign fill is masked off by ``& 31``).
_DEBRUIJN = 0x077CB531
_DEBRUIJN_TABLE = [0] * 32
for _j in range(32):
    _DEBRUIJN_TABLE[((_DEBRUIJN << _j) & 0xFFFFFFFF) >> 27] = _j


def _popcount31(m: jax.Array) -> jax.Array:
    """SWAR popcount for the 31-bit mask words (bit 31 is never set)."""
    v = m - ((m >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24


def _col_group() -> int:
    """Columns walked in lockstep per kernel trip (``RTC_COL_GROUP``).

    A single column's walk trip is latency-bound (scalar walk → 13 dynamic
    (1, 128) loads → the ~65-op MT chain serialize at ~10% of the VPU issue
    rate); K independent column streams fill the stalls. Measured on the
    suzannes 1080p mid-band (262k rays, xprof device self-time, round 5):
    K=2 1.81×, K=4 2.73×, K=8 3.74×, K=16 3.97× on coherent primaries;
    the compacted secondary front peaks at K=8 (2.50×; K=16 regresses 3%).
    Default 8. K=1 is the pre-group walk, kept for A/B.
    """
    import os

    group = int(os.environ.get("RTC_COL_GROUP", "8"))
    assert group in (1, 2, 4, 8, 16), (
        f"RTC_COL_GROUP={group}: expected 1, 2, 4, 8 or 16"
    )
    return group


def _search_kernel_bitmask(
    alive_ref,  # (G,) i32 SMEM — per-program non-empty column counts
    colidx_ref,  # (C,) i32 SMEM — per-program packed non-empty column list
    mask_ref,  # (C * n_words,) i32 SMEM — per-column hit-bit words
    deb_ref,  # (32,) i32 SMEM — De Bruijn bit-index table
    rays_ref,  # (7, 8, COLS) f32 VMEM
    tris_ref,  # (12, T) f32 VMEM
    oidx_ref,  # (1, T) i32 VMEM
    dst_ref,  # (8, COLS) f32 out
    idx_ref,  # (8, COLS) i32 out
    *,
    n_words: int,
    group: int = 1,
):
    cols = dst_ref.shape[1]
    dst_ref[:, :] = jnp.full((RAY_SUBLANES, cols), MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full((RAY_SUBLANES, cols), -1, jnp.int32)

    pid = pl.program_id(0)
    col_base = pid * cols

    n_active = alive_ref[pid]  # hoisted: program_id reads inside pl.when
    # bodies fail interpret-mode lowering

    @pl.when(n_active != 0)
    def _run():
        _search_tile_bitmask(n_active, colidx_ref, mask_ref, deb_ref,
                             rays_ref, tris_ref, oidx_ref,
                             dst_ref, idx_ref, n_words, col_base=col_base,
                             group=group)


def _search_tile_bitmask(n_active, colidx_ref, mask_ref, deb_ref, rays_ref,
                         tris_ref, oidx_ref, dst_ref, idx_ref,
                         n_words: int, col_base, group: int = 1):  # noqa: D103
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    ray_tiles = tuple(rays_ref[k] for k in range(6))

    def per_column(jj, acc):
        acc_d, acc_i = acc
        # Packed non-empty iteration: the jj-th ACTIVE column's local index
        # comes from SMEM — empty columns (no hitting blocks / dead packets)
        # cost nothing at all, instead of paying the 6 masked extracts.
        # Occupancy on compacted secondary bounces is often ~10-40%.
        i = colidx_ref[col_base + jj]
        col_mask = col_iota == i
        ray = _extract_column(ray_tiles, col_mask, i)

        best = (
            jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
            jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
        )
        for w in range(n_words):  # n_words is static → unrolled
            m0 = mask_ref[(col_base + i) * n_words + w]
            base = w * BITS_PER_WORD

            def bit_body(carry, base=base):
                m, bd, bi = carry
                lsb = m & (-m)
                # De Bruijn lowest-set-bit index (see _DEBRUIJN_TABLE): the
                # i32 multiply wraps mod 2^32 and `& 31` discards the
                # arithmetic-shift sign fill.
                j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                bd, bi = _mt_block_test(ray, tris_ref, oidx_ref,
                                        base + j, bd, bi)
                return (m & (m - 1), bd, bi)

            m, bd, bi = jax.lax.while_loop(
                lambda c: c[0] != 0, bit_body, (m0, *best)
            )
            best = (bd, bi)

        dmin, imin = _column_argmin(*best)
        acc_d = jnp.where(col_mask, dmin, acc_d)
        acc_i = jnp.where(col_mask, imin, acc_i)
        return acc_d, acc_i

    def per_group(pp, acc):
        # GROUPED lockstep walk (round 5): `group` columns advance through
        # their bit words together, one MT block test per stream per trip.
        # A single-column trip is latency-bound, not issue-bound — the
        # scalar walk, 13 dynamic (1, 128) loads, and the ~65-op MT chain
        # serialize at ~10% of the VPU issue rate (measured: the whole MT
        # term runs at 160 ns/block-test). K independent streams fill the
        # stalls: K=8 measured 3.74× (coherent primaries) / 2.50×
        # (compacted secondary front) over K=1 on the suzannes 1080p
        # workloads; K=16 regressed the secondary front (register
        # pressure). Exactness: streams whose word ran out still issue a
        # filler block test (lockstep) but its result is DISCARDED
        # (enabled=False masks the take), and a short tail group
        # re-walks the last active column, whose disjoint col_mask merge
        # writes the same values — so results stay bit-identical to the
        # K=1 walk, dead lanes included (pinned by test_col_group_*).
        # Dispatch sorts each program's active columns by DESCENDING bit
        # count (see search_triangles_pallas), so lockstep groups stay
        # homogeneous and duplicate-trip waste is minimal.
        acc_d, acc_i = acc
        jjs = [jnp.minimum(group * pp + k, n_active - 1)
               for k in range(group)]
        cols_i = [colidx_ref[col_base + jj] for jj in jjs]
        masks_i = [col_iota == i for i in cols_i]
        rays_i = [_extract_column(ray_tiles, mk, i)
                  for mk, i in zip(masks_i, cols_i)]
        init_best = (
            jnp.full((RAY_SUBLANES, TRI_LANES), MISS_DST, jnp.float32),
            jnp.full((RAY_SUBLANES, TRI_LANES), _BIG_I32, jnp.int32),
        )
        bests = [init_best for _ in range(group)]
        for w in range(n_words):  # n_words is static → unrolled
            m0s = [mask_ref[(col_base + i) * n_words + w] for i in cols_i]
            base = w * BITS_PER_WORD

            def bit_body(carry, base=base):
                ms = carry[0:group]
                pjs = carry[group:2 * group]
                bs = carry[2 * group:]
                out_m, out_j, out_b = [], [], []
                for k in range(group):
                    m = ms[k]
                    lsb = m & (-m)
                    jr = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                    live = m != 0
                    j = jnp.where(live, jr, pjs[k])
                    bd, bi = _mt_block_test(rays_i[k], tris_ref, oidx_ref,
                                            base + j, bs[2 * k],
                                            bs[2 * k + 1], enabled=live)
                    out_m.append(jnp.where(live, m & (m - 1), 0))
                    out_j.append(j)
                    out_b.extend((bd, bi))
                return tuple(out_m + out_j + out_b)

            def any_left(c):
                left = c[0]
                for k in range(1, group):
                    left = left | c[k]
                return left != 0

            carry = tuple(
                m0s + [jnp.int32(0)] * group
                + [x for b in bests for x in b]
            )
            carry = jax.lax.while_loop(any_left, bit_body, carry)
            bests = [(carry[2 * group + 2 * k], carry[2 * group + 2 * k + 1])
                     for k in range(group)]

        for k in range(group):
            dk, ik = _column_argmin(*bests[k])
            acc_d = jnp.where(masks_i[k], dk, acc_d)
            acc_i = jnp.where(masks_i[k], ik, acc_i)
        return acc_d, acc_i

    init = (
        jnp.full(shape, MISS_DST, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
    )
    if group == 1:
        acc_d, acc_i = jax.lax.fori_loop(0, n_active, per_column, init)
    else:
        acc_d, acc_i = jax.lax.fori_loop(
            0, (n_active + group - 1) // group, per_group, init
        )
    dst_ref[:, :] = acc_d
    idx_ref[:, :] = acc_i


@functools.partial(jax.jit,
                   static_argnames=("interpret", "n_words", "group"))
def _search_padded_bitmask(col_counts, col_index, masks, rays_planes,
                           tris_packed, orig_idx, n_words, interpret=False,
                           group=1):
    n_cols = rays_planes.shape[2]
    t = tris_packed.shape[1]
    grid = (n_cols // COLS_PER_PROGRAM,)

    kernel = functools.partial(_search_kernel_bitmask, n_words=n_words,
                               group=group)
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G,) active col counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C,) packed col list
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (C * n_words,) masks
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,) De Bruijn table
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((12, t), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda g: (0, 0), memory_space=pltpu.VMEM),
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
            + 13 * t * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(col_counts, col_index, masks, jnp.asarray(_DEBRUIJN_TABLE, jnp.int32),
      rays_planes, tris_packed, orig_idx)
    return dst, idx


def _bitmask_slice_bound(n_blocks: int) -> int:
    """Max rays per direct bitmask-kernel call, scaled by mask words.

    262144 was sized for the range kernel's 2 × (r/8) i32 SMEM footprint;
    the bitmask path carries (n_words + 1) × (r/8) words instead, so the
    bound shrinks by n_words to keep the same SMEM ceiling (ADVICE r2:
    ~9× overshoot at 8 words otherwise). Always a positive multiple of the
    1024-ray program size.
    """
    n_words = -(-n_blocks // BITS_PER_WORD)
    per_program = RAY_SUBLANES * COLS_PER_PROGRAM
    return max(
        (262144 // max(n_words, 1)) // per_program * per_program, per_program
    )


def _slab_any_hit(lo, hi, o_p, inv_p, a_p):
    """AABB slab test: does any live lane of each packet hit each block?

    ``lo/hi``: ``(group, 3)`` block bounds; ``o_p``: ``(C, 8, 3)`` packet
    origins; ``inv_p``: reciprocal directions (conservatively substituted
    for |d| < 1e-20 — an axis with d ~ 0 yields ±huge slab bounds, so
    inside-origin rays still pass and outside-origin rays still miss).
    Returns ``(C, group)`` bool. Inverted (lo > hi) padding/empty boxes are
    masked explicitly — the min/max slab formulation silently normalizes
    them into valid intervals otherwise. The SINGLE implementation behind
    both the range and bitmask culling preludes.
    """
    t0 = (lo[None, None] - o_p[:, :, None]) * inv_p[:, :, None]
    t1 = (hi[None, None] - o_p[:, :, None]) * inv_p[:, :, None]
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)  # (C, 8, group)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit_box = (tmax >= jnp.maximum(tmin, 0.0)) & a_p[:, :, None]
    valid = jnp.all(lo <= hi, axis=-1)  # (group,)
    return jnp.any(hit_box, axis=1) & valid[None, :]  # (C, group)


def packet_block_masks(o_p, d_p, a_p, accel: TriangleAccel):
    """Per-packet hit bitmask words via AABB slab tests.

    ``o_p/d_p``: ``(C, 8, 3)`` packet rays; ``a_p``: ``(C, 8)`` live mask.
    Returns ``(C, n_words)`` int32 — bit ``j`` of word ``w`` set iff block
    ``w * 31 + j`` passes the slab test for any live lane of the packet.
    Scanned one 31-block word per step so peak memory stays bounded (same
    strategy as :func:`packet_block_ranges`).
    """
    cols = o_p.shape[0]
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < 1e-20, 1e-20, d_p)
    n_blocks = accel.aabb_lo.shape[0]
    n_words = -(-n_blocks // BITS_PER_WORD)
    pad_b = n_words * BITS_PER_WORD - n_blocks
    big = jnp.float32(3.0e38)
    lo_g = jnp.pad(accel.aabb_lo, ((0, pad_b), (0, 0)), constant_values=big)
    hi_g = jnp.pad(accel.aabb_hi, ((0, pad_b), (0, 0)), constant_values=-big)
    lo_g = lo_g.reshape(n_words, BITS_PER_WORD, 3)
    hi_g = hi_g.reshape(n_words, BITS_PER_WORD, 3)
    bits = (jnp.int32(1) << jnp.arange(BITS_PER_WORD, dtype=jnp.int32))

    def word(args):
        lo, hi = args
        any_hit = _slab_any_hit(lo, hi, o_p, inv_p, a_p)  # (C, 31)
        return jnp.sum(jnp.where(any_hit, bits[None, :], 0), axis=1,
                       dtype=jnp.int32)  # (C,)

    words = jax.lax.map(word, (lo_g, hi_g))  # (n_words, C)
    return words.T  # (C, n_words)


def packet_block_ranges(o_p, d_p, a_p, accel: TriangleAccel):
    """Per-packet [first, last] hitting-block range via AABB slab tests.

    ``o_p/d_p``: ``(C, 8, 3)`` packet rays; ``a_p``: ``(C, 8)`` live mask.
    Returns ``(first [C], last [C])`` int32 (empty range ⇔ first > last).
    Scanned over groups of 64 blocks so peak memory stays bounded for scenes
    with many blocks (the ``(C, 8, 64, 3)`` intermediate is ~50 MB at C=64k).
    The |d|<1e-20 reciprocal substitution is CONSERVATIVE: an axis with
    d ~ 0 yields ±huge slab bounds — inside-origin rays still pass,
    outside-origin rays still miss, regardless of substituted sign.
    """
    cols = o_p.shape[0]
    inv_p = 1.0 / jnp.where(jnp.abs(d_p) < 1e-20, 1e-20, d_p)
    n_blocks = accel.aabb_lo.shape[0]
    group = min(64, n_blocks)
    bg_padded = _round_up(n_blocks, group)
    pad_b = bg_padded - n_blocks
    big = jnp.float32(3.0e38)
    lo_g = jnp.pad(accel.aabb_lo, ((0, pad_b), (0, 0)), constant_values=big)
    hi_g = jnp.pad(accel.aabb_hi, ((0, pad_b), (0, 0)), constant_values=-big)
    lo_g = lo_g.reshape(bg_padded // group, group, 3)
    hi_g = hi_g.reshape(bg_padded // group, group, 3)

    def block_group(carry, args):
        first, last, base = carry
        lo, hi = args
        any_hit = _slab_any_hit(lo, hi, o_p, inv_p, a_p)  # (C, group)
        blk = base + jnp.arange(group, dtype=jnp.int32)[None, :]
        first = jnp.minimum(
            first, jnp.min(jnp.where(any_hit, blk, jnp.int32(_BIG_I32)), axis=1)
        )
        last = jnp.maximum(last, jnp.max(jnp.where(any_hit, blk, -1), axis=1))
        return (first, last, base + group), None

    init = (
        jnp.full((cols,), _BIG_I32, jnp.int32),
        jnp.full((cols,), -1, jnp.int32),
        jnp.int32(0),
    )
    (first, last, _), _ = jax.lax.scan(block_group, init, (lo_g, hi_g))
    return first, last


def search_triangles_pallas(
    o: jax.Array,
    d: jax.Array,
    tris: Triangles,
    interpret: bool | None = None,
    alive: jax.Array | None = None,
    accel: TriangleAccel | None = None,
    cull: str | None = None,
    n_live: int | None = None,
    variant: str | None = None,
):
    """Closest-hit triangle search. Returns ``(best_dst [R], best_idx [R])``.

    ``variant``: ``"auto"`` (measured dispatch: brute kernel for tiny
    scenes, packet kernel otherwise), ``"packet"``/``"brute"`` to force
    those, or ``"mxu"`` for the matmul Möller–Trumbore kernel
    (``intersect_mxu.py`` — winner indices match the VPU kernels; distances
    agree to ~2e-4 RELATIVE, the tested contract, see its module
    docstring). ``None`` reads ``RTC_KERNEL`` (default ``"auto"``).

    ``n_live``: the live (unpadded) triangle count. Scenes with at most
    ``BRUTE_MAX_TRIS`` live triangles use the ray-major brute kernel
    (triangles as SMEM scalars broadcast over whole ray tiles) — the packet
    architecture's per-column overhead dwarfs the actual MT work there.

    ``best_idx`` is always in ORIGINAL triangle order (the accel's block
    permutation is internal). Handles layout: rays ``[R, 3]``×2 →
    ``(6, 8, ceil(R/8))`` planes (padded rays get +z directions and are
    culled by ``alive``); triangle SoA → packed ``[12, T]`` (T must be a
    multiple of 128, guaranteed by the scene builder's padding).

    ``alive``: optional bool ``[R]``; tiles of 1024 rays that are entirely
    dead skip the triangle loop and report misses.

    ``accel``: Morton/AABB structure from ``ops.accel.build_accel``; when
    absent, a trivial always-hit accel reproduces the brute-force scan.

    ``cull``: ``"range"`` scans the contiguous [first, last] hitting-block
    range per packet; ``"bitmask"`` walks EXACTLY the hitting blocks via
    per-packet bit words (see the bitmask section above). Bit-identical
    results either way; ``None`` reads ``RTC_CULL`` (default ``"bitmask"``,
    the measured winner: 15.68M vs 14.52M rays/s on the suzannes bench).
    """
    import os

    if variant is None:
        variant = os.environ.get("RTC_KERNEL", "auto")
    assert variant in ("auto", "packet", "brute", "mxu"), variant
    auto_cull = cull is None
    if cull is None:
        cull = os.environ.get("RTC_CULL", "bitmask")
    assert cull in ("range", "bitmask"), cull
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    orig_tris = tris
    n_live_t = int(n_live) if n_live is not None else tris.a.shape[0]
    # Ray-major brute dispatch only in auto mode: an EXPLICIT cull= request
    # (A/B tests, RTC_CULL debugging) gets the packet kernel it asked for.
    # The auto threshold (BRUTE_MAX_TRIS, override RTC_BRUTE_MAX) comes from
    # the measured round-3 calibration grid — see the constant's comment and
    # BASELINE.md "dispatch calibration".
    brute_max = int(os.environ.get("RTC_BRUTE_MAX", BRUTE_MAX_TRIS))
    use_brute = variant == "brute" or (
        variant == "auto" and auto_cull and n_live_t <= brute_max
    )
    if accel is None:
        accel = trivial_accel(tris)
    n_blocks_total = accel.aabb_lo.shape[0]
    t_padded = n_blocks_total * TRI_LANES
    stream_max_t = int(
        os.environ.get("RTC_STREAM_MAX_T", STREAM_MAX_RESIDENT_T)
    )
    use_mxu = variant == "mxu"
    if use_mxu:
        from raytracingc_tpu.ops.intersect_mxu import MXU_MAX_TRIS

        if t_padded > MXU_MAX_TRIS or -(-n_blocks_total // BITS_PER_WORD) > 8:
            # The (T*6, 16) coefficient table rides whole in VMEM (384
            # B/triangle) and the kernel unrolls one bit-walk per union
            # word — both cap the scene size. LOUD fallback: an explicit
            # variant request must not silently benchmark another kernel.
            import sys

            print(
                f"raytracingc_tpu: RTC_KERNEL=mxu unsupported at {t_padded} "
                f"padded triangles (cap {MXU_MAX_TRIS}); falling back to the "
                "packet kernel",
                file=sys.stderr,
            )
            use_mxu = False
            # Resolve the variant NOW so the max_rays slicing recursion
            # below does not re-trip this gate once per slice.
            variant = "packet"
    # An EXPLICIT range request (cull="range" param or RTC_CULL=range env)
    # means the caller wants the contiguous-span kernels — the A/B knob.
    # Captured BEFORE the downgrade below, which reuses cull="range" as the
    # bucket for "too big for the exact bitmask" (where the words kernels
    # are the measured default instead).
    range_requested = cull == "range"
    # Single source of truth for the words/range choice and the bitmask
    # word cap — the SMEM slice bound, the streamed branch, and the
    # resident-words gate below all reuse these (review r4: three drifting
    # re-derivations).
    max_words = int(os.environ.get("RTC_BITMASK_MAX_WORDS", 8))
    # Default "packed": with the grouped lockstep walk (RTC_COL_GROUP,
    # round 5) the packed-column kernel beats the cond-words kernel at
    # every measured scale — 61k ×3.19, 247k ×1.51, 990k +18%
    # (BASELINE.md round 5 "grouped lockstep column walk"). The round-5
    # K=1 sweep that crowned cond-words ("exact per-block bits: measured
    # dead end") predates the grouped walk; "words"/"range" stay for A/B.
    stream_cull = os.environ.get(
        "RTC_STREAM_CULL", "range" if range_requested else "packed"
    )
    assert stream_cull in ("packed", "words", "range"), (
        f"RTC_STREAM_CULL={stream_cull!r}: expected 'packed', 'words' or "
        "'range'"
    )
    use_words = stream_cull == "words"
    use_packed = stream_cull == "packed"
    if cull == "bitmask":
        # The bitmask kernel unrolls one bit-walk loop per 31-block word;
        # very large scenes would blow up Mosaic compile time and program
        # size. Past ~8 words (~32k triangles) fall back to the bounded
        # kernels that handle any block count (words superblock culling by
        # default; [first, last] ranges on request). The stream threshold
        # also forces the fallback here so RTC_STREAM_MAX_T works under
        # the default bitmask cull.
        if (
            -(-n_blocks_total // BITS_PER_WORD) > max_words
            or t_padded > stream_max_t
        ):
            cull = "range"
    r = o.shape[0]
    # The per-column SMEM arrays live whole in SMEM; bound them by splitting
    # very large direct calls into slices. The renderer's pixel chunking
    # stays well under this. 262144 was sized for the range kernel's
    # 2 × (r/8) i32 footprint; the bitmask path carries (n_words + 1) × (r/8)
    # words instead, so scale the bound down by n_words to keep the same
    # SMEM ceiling (ADVICE r2: ~9× overshoot at 8 words otherwise).
    if cull == "bitmask" and not use_brute and not use_mxu:
        max_rays = _bitmask_slice_bound(accel.aabb_lo.shape[0])
    else:
        # The brute kernel's SMEM is O(n_live); the MXU kernel's is
        # O(G * n_words) — both far under the per-packet budgets.
        max_rays = 262144
    if not use_brute and not use_mxu and t_padded > stream_max_t and use_words:
        # Words-streamed SMEM is (r/8) * n_tiles i32 per call; bound it by
        # the same ~64k-word ceiling the bitmask bound enforces.
        tile_e = int(os.environ.get("RTC_STREAM_TILE", STREAM_TILE))
        tile_e = min(_round_up(tile_e, TRI_LANES),
                     _round_up(t_padded, TRI_LANES))
        n_tiles_e = -(-t_padded // tile_e)
        per_program = RAY_SUBLANES * COLS_PER_PROGRAM
        max_rays = min(max_rays, max(
            (524288 // max(n_tiles_e, 1)) // per_program * per_program,
            per_program,
        ))
    if not use_brute and not use_mxu and use_packed and (
        t_padded > stream_max_t
        or n_blocks_total > max_words * BITS_PER_WORD
    ):
        # Packed-kernel SMEM is (r/8) * n_tiles * (W + 1) i32 per call
        # (W bit words + 1 packed-column-id word); bound it by the
        # MEASURED budget (SMEM_WORDS_BUDGET).
        if t_padded > stream_max_t:
            tile_e = int(os.environ.get("RTC_STREAM_TILE", STREAM_TILE))
            tile_e = min(_round_up(tile_e, TRI_LANES),
                         _round_up(t_padded, TRI_LANES))
            n_tiles_e = -(-t_padded // tile_e)
        else:  # resident regime: the whole plane is one tile
            tile_e, n_tiles_e = t_padded, 1
        bpt_e = tile_e // TRI_LANES
        granule_e = _stream_granule(bpt_e, n_tiles_e)
        w_e = stream_words_per_pair(bpt_e, granule_e)
        per_program = RAY_SUBLANES * COLS_PER_PROGRAM
        max_rays = min(max_rays, max(
            (RAY_SUBLANES * SMEM_WORDS_BUDGET
             // (n_tiles_e * (w_e + 1))) // per_program * per_program,
            per_program,
        ))
    if r > max_rays:
        outs = [
            search_triangles_pallas(
                o[i : i + max_rays],
                d[i : i + max_rays],
                tris,
                interpret=interpret,
                alive=None if alive is None else alive[i : i + max_rays],
                accel=accel,
                cull=None if auto_cull else cull,
                n_live=n_live,
                variant=variant,
            )
            for i in range(0, r, max_rays)
        ]
        return (
            jnp.concatenate([x[0] for x in outs]),
            jnp.concatenate([x[1] for x in outs]),
        )
    tris = accel.triangles
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

    if alive is None:
        alive_f = jnp.ones((r, 1), jnp.float32)
    else:
        alive_f = alive.astype(jnp.float32).reshape(r, 1)
    alive_plane = to_planes(jnp.broadcast_to(alive_f, (r, 3)))[:1]  # (1, 8, C)
    rays_planes = jnp.concatenate(
        [to_planes(o), to_planes(d), alive_plane], axis=0
    )  # (7, 8, C)

    if use_brute:
        # Ray-major brute kernel: original triangle order, accel ignored.
        tt = orig_tris
        flat = jnp.concatenate(
            [
                tt.a[:n_live_t],
                tt.b[:n_live_t] - tt.a[:n_live_t],
                tt.c[:n_live_t] - tt.a[:n_live_t],
                tt.normal[:n_live_t],
            ],
            axis=1,
        ).reshape(-1)  # (12 * n_live,) — A, AB, AC, N per triangle
        prog_alive = jnp.max(
            (rays_planes[6] > 0.0)
            .reshape(RAY_SUBLANES, n_programs, COLS_PER_PROGRAM)
            .astype(jnp.int32),
            axis=(0, 2),
        )
        dst, idx = _search_padded_brute(
            prog_alive, flat, rays_planes[:6], n_live=n_live_t,
            interpret=interpret,
        )
        dst = dst.T.reshape(r_padded)[:r]
        idx = idx.T.reshape(r_padded)[:r]
        if alive is not None:
            # The brute kernel skips only whole dead PROGRAMS; individual
            # dead lanes still compute. The packet kernels report misses for
            # dead lanes (their ranges are alive-masked) — match that here
            # so the early-exit/sharding bit-exact invariants hold.
            dst = jnp.where(alive, dst, MISS_DST)
            idx = jnp.where(alive, idx, -1)
        return dst, idx

    # Per-column (8-ray packet) hitting-block ranges, computed vectorized
    # here (XLA) and passed to the kernel as SMEM scalars — see
    # ``_search_tile`` for why this must not happen inside the kernel.
    o_p = jnp.pad(o, ((0, r_padded - r), (0, 0))).reshape(cols_padded, 8, 3)
    d_p = jnp.pad(d, ((0, r_padded - r), (0, 0))).reshape(cols_padded, 8, 3)
    a_p = (
        jnp.pad(alive_f[:, 0], (0, r_padded - r))
        .reshape(cols_padded, 8) > 0.0
    )
    if use_mxu:
        from raytracingc_tpu.ops.intersect_mxu import (
            _search_padded_mxu,
            pack_coeffs_mxu,
        )

        # Program-level union culling: OR the per-packet hit words over each
        # program's 128 packets; the kernel walks the union's set bits once
        # for all 1024 rays (coarser than per-packet culling, but each block
        # is then tested on the MXU for the whole program at once).
        masks = packet_block_masks(o_p, d_p, a_p, accel)  # (C, n_words)
        n_words = masks.shape[1]
        words = jax.lax.reduce(
            masks.reshape(n_programs, COLS_PER_PROGRAM, n_words),
            jnp.int32(0), jax.lax.bitwise_or, (1,),
        )  # (G, n_words)
        alive_flags = jnp.max((words != 0).astype(jnp.int32), axis=1)
        # Prefer the accel's eagerly-built coefficient table: its bits are
        # fixed per scene, keeping results independent of the surrounding
        # XLA program (chunking/sharding exactness). In-trace packing (the
        # fallback for trivial/traced accels, e.g. geometry training) is
        # fusion-context dependent at ~1 ulp.
        coeffs = accel.mxu_coeffs
        if coeffs is None:
            coeffs = pack_coeffs_mxu(tris, accel.orig_idx)
        # Precision: "split3" (default) is the manual hi/lo-bf16 3-pass
        # split for the five comparison planes with t′ kept at a
        # HIGHEST-precision f32 dot (the cancellation-sensitive plane —
        # see _mxu_block_test's docstring); "highest" (RTC_MXU_PRECISION)
        # reverts to the round-3 6-pass decomposition on every plane.
        # Mosaic's dot lowering rejects Precision.HIGH (XLA's own 3-pass)
        # and DEFAULT (1-pass bf16) is far too coarse for EPSILON-scale hit
        # tests, hence the manual split.
        mxu_precision = os.environ.get("RTC_MXU_PRECISION", "split3")
        dst, idx = _search_padded_mxu(
            alive_flags, words.reshape(-1), rays_planes, coeffs,
            n_words=n_words, interpret=interpret, precision=mxu_precision,
        )
        dst = dst.T.reshape(r_padded)[:r]
        idx = idx.T.reshape(r_padded)[:r]
        if alive is not None:
            # Dead lanes inside live programs still compute (union culling is
            # per program); report misses for them like the packet kernels'
            # fully-dead packets do, so the early-exit/sharding bit-exact
            # invariants hold.
            dst = jnp.where(alive, dst, MISS_DST)
            idx = jnp.where(alive, idx, -1)
        return dst, idx

    # Prefer the accel's eagerly-packed plane (bits fixed once per scene;
    # saves the per-program 12×T transpose+concat — ~67 MB at 990k).
    # pack_triangles is the identical computation, so bits match either way.
    tris_packed = (
        accel.packed_plane
        if accel.packed_plane is not None
        else pack_triangles(tris)
    )
    orig_idx = accel.orig_idx.reshape(1, t)

    if cull == "bitmask":
        masks = packet_block_masks(o_p, d_p, a_p, accel)  # (C, n_words)
        n_words = masks.shape[1]
        # Pack non-empty column indices to the front of each program's
        # 128-entry SMEM segment, ordered by DESCENDING set-bit count
        # (stable argsort on a single packed key): the kernel iterates
        # exactly its active columns — empty ones cost zero work instead of
        # six masked extracts each — and the grouped lockstep walk
        # (RTC_COL_GROUP) pairs columns with similar walk lengths, so
        # group trips waste minimal duplicate block tests. Processing
        # order does not affect results (disjoint col_mask merges).
        bits = jnp.sum(_popcount31(masks), axis=1)  # (C,)
        ne = (bits > 0).reshape(n_programs, COLS_PER_PROGRAM)
        col_counts = jnp.sum(ne.astype(jnp.int32), axis=1)  # (G,)
        key = jnp.where(ne, -bits.reshape(n_programs, COLS_PER_PROGRAM), 1)
        col_index = jnp.argsort(key, axis=1, stable=True).astype(jnp.int32)
        dst, idx = _search_padded_bitmask(
            col_counts, col_index.reshape(-1), masks.reshape(-1),
            rays_planes, tris_packed, orig_idx,
            n_words=n_words, interpret=interpret, group=_col_group(),
        )
    else:
        # Words superblock culling is the measured default everywhere the
        # exact bitmask does not reach (5.3× on the 247k streamed bench,
        # 2.0× on the 61k resident row; the range span scans a measured
        # 63.6%+ dead interior blocks). An explicit range request
        # (param/RTC_CULL) or RTC_STREAM_CULL keeps the span kernels
        # for A/B. ``use_words``/``max_words`` resolved once above.
        def _pack_cols(words_multi, n_tiles_p):
            """Pack active column ids per (program, tile) for the packed
            kernel, ordered by DESCENDING total bit count (stable argsort
            on a packed key): actives come first, and the grouped lockstep
            walk (RTC_COL_GROUP) pairs columns with similar walk lengths.
            Column visit order does not affect results (disjoint col_mask
            merges)."""
            bits = jnp.sum(_popcount31(words_multi), axis=2)  # (C, n_tiles)
            bt = bits.reshape(
                n_programs, COLS_PER_PROGRAM, n_tiles_p
            ).transpose(0, 2, 1)  # (G, n_tiles, 128)
            act = bt > 0
            counts = jnp.sum(act.astype(jnp.int32), axis=2).reshape(-1)
            key = jnp.where(act, -bt, 1)
            colidx = jnp.argsort(key, axis=2, stable=True).astype(jnp.int32)
            return counts, colidx.reshape(-1)

        if t > stream_max_t:
            # Tile-streamed kernel: O(tile) triangle VMEM (VERDICT r2
            # item 3). Per-(program, tile) activity flags let whole DMA+scan
            # steps skip when no column's culling info touches the tile.
            tile = int(os.environ.get("RTC_STREAM_TILE", STREAM_TILE))
            tile = min(_round_up(tile, TRI_LANES), _round_up(t, TRI_LANES))
            tris_packed, orig_idx = _stream_tile_pad(
                tris_packed, orig_idx, tile
            )
            n_tiles = tris_packed.shape[1] // tile
            bpt = tile // TRI_LANES
            # Streamed culling (VERDICT r3 item 5): walk exactly the
            # slab-hitting superblocks via per-(column, tile) bit words.
            # Bit-identical to the range kernel (same slab tests).
            if use_packed:
                granule = _stream_granule(bpt, n_tiles)
                words = packet_tile_words_multi(
                    o_p, d_p, a_p, accel, n_tiles, bpt, granule
                )  # (C, n_tiles, W)
                counts, colidx = _pack_cols(words, n_tiles)
                dst, idx = _search_padded_streamed_packed_tmajor(
                    counts, colidx, words.reshape(-1), rays_planes,
                    tris_packed, orig_idx, tile=tile, granule=granule,
                    interpret=interpret, group=_col_group(),
                )
            elif use_words:
                granule = -(-bpt // BITS_PER_WORD)
                words = packet_tile_words(
                    o_p, d_p, a_p, accel, n_tiles, bpt, granule
                )  # (C, n_tiles)
                alive_flags = (
                    (words != 0)
                    .reshape(n_programs, COLS_PER_PROGRAM, n_tiles)
                    .any(axis=1)
                    .astype(jnp.int32)
                    .reshape(-1)
                )
                # Grid order: "tile" (tile-major, default) DMAs each
                # triangle tile once per call; "ray" (the round-4 original)
                # re-DMAs the plane per program. Bit-identical (the
                # cross-tile fold is the same lex-min); RTC_STREAM_ORDER
                # selects for A/B.
                order = os.environ.get("RTC_STREAM_ORDER", "tile")
                assert order in ("tile", "ray"), (
                    f"RTC_STREAM_ORDER={order!r}: expected 'tile' or 'ray'"
                )
                search_fn = (
                    _search_padded_streamed_words_tmajor
                    if order == "tile" else _search_padded_streamed_words
                )
                dst, idx = search_fn(
                    alive_flags, words.reshape(-1), rays_planes,
                    tris_packed, orig_idx, tile=tile, granule=granule,
                    interpret=interpret,
                )
            else:
                first, last = packet_block_ranges(o_p, d_p, a_p, accel)
                tids = jnp.arange(n_tiles, dtype=jnp.int32)
                act = (
                    (first[:, None] <= last[:, None])
                    & (first[:, None] <= (tids[None, :] + 1) * bpt - 1)
                    & (last[:, None] >= tids[None, :] * bpt)
                )  # (C, n_tiles)
                alive_flags = (
                    act.reshape(n_programs, COLS_PER_PROGRAM, n_tiles)
                    .any(axis=1)
                    .astype(jnp.int32)
                    .reshape(-1)
                )
                dst, idx = _search_padded_streamed(
                    alive_flags, first, last, rays_planes, tris_packed,
                    orig_idx, tile=tile, interpret=interpret,
                )
        elif use_packed and n_blocks_total > max_words * BITS_PER_WORD:
            # RESIDENT packed kernel: the whole plane as ONE tile (fetched
            # once; the constant index map is not re-DMA'd), packed active
            # columns, granule per RTC_STREAM_GRANULE (auto → exact
            # per-block bits when the SMEM budget allows).
            bpt_r = t // TRI_LANES
            granule = _stream_granule(bpt_r, 1)
            words = packet_tile_words_multi(
                o_p, d_p, a_p, accel, 1, bpt_r, granule
            )  # (C, 1, W)
            counts, colidx = _pack_cols(words, 1)
            dst, idx = _search_padded_streamed_packed_tmajor(
                counts, colidx, words.reshape(-1), rays_planes,
                tris_packed, orig_idx, tile=t, granule=granule,
                interpret=interpret, group=_col_group(),
            )
        elif use_words and n_blocks_total > max_words * BITS_PER_WORD:
            # RESIDENT words kernel: the 32k–65k regime that outgrew the
            # exact 8-word bitmask but still fits VMEM — a single-tile
            # stream (the whole plane is fetched once; the constant index
            # map is not re-DMA'd). Granule-grouped bits instead of the
            # range span's dead interior.
            bpt_r = t // TRI_LANES
            granule = -(-bpt_r // BITS_PER_WORD)
            words = packet_tile_words(o_p, d_p, a_p, accel, 1, bpt_r,
                                      granule)  # (C, 1)
            alive_flags = (
                (words != 0)
                .reshape(n_programs, COLS_PER_PROGRAM)
                .any(axis=1)
                .astype(jnp.int32)
            )
            dst, idx = _search_padded_streamed_words(
                alive_flags, words.reshape(-1), rays_planes,
                tris_packed, orig_idx, tile=t, granule=granule,
                interpret=interpret,
            )
        else:
            first, last = packet_block_ranges(o_p, d_p, a_p, accel)
            # A program can be skipped when EVERY column's range is empty
            # (covers dead lanes and packets that miss the whole scene).
            nonempty = (first <= last).reshape(n_programs, COLS_PER_PROGRAM)
            alive_flags = jnp.max(nonempty.astype(jnp.int32), axis=1)

            dst, idx = _search_padded(
                alive_flags, first, last, rays_planes, tris_packed, orig_idx,
                interpret=interpret,
            )
    # (8, C) → ray-major [r_padded] → slice original count.
    dst = dst.T.reshape(r_padded)[:r]
    idx = idx.T.reshape(r_padded)[:r]
    return dst, idx
