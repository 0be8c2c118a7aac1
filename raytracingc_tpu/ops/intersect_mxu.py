"""MXU Möller–Trumbore search kernel: ray×triangle hit tests as matmuls.

The VPU packet kernel (``intersect_pallas.py``) evaluates ~60 vector ops per
8-ray×128-triangle tile — measured at the VPU floor on the tracked bench
(the two search ``pallas_call``s were 153 of 229 ms device time at the end
of round 2). This kernel moves the Möller–Trumbore algebra onto the MXU:

Every MT quantity is **bilinear** in per-ray features and per-triangle
coefficients (reference hot loop: ``raytracing.c:186-240``). With
``s = o − A``, ``h = d × AC``, ``q = s × AB`` and the triple product
``det3(x,y,z) = x·(y×z)``:

* ``det = AB·h            = d · (AC×AB)``                       (linear in d)
* ``dn  = d · N``             — backface-cull term, stored normal
* ``u′  = s·h             = det3(o,d,AC) + d·(A×AC)``
* ``v′  = d·q             = −det3(o,d,AB) + d·(AB×A)``
* ``t′  = AC·q            = o·Ng − A·Ng``,  ``Ng = AB×AC``
* ``det3(o,d,X)`` expands over the six monomials ``o_i d_j`` (i≠j) with
  coefficients ``±X_k`` — so the full feature vector is
  ``[1, o, d, oxdy, oxdz, oydx, oydz, ozdx, ozdy]`` (13 of 16 columns used).

Per 128-triangle block the kernel computes ONE ``(768,16)@(16,R)`` matmul
(6 quantity planes × 128 triangles against all R rays of the program) and a
short VPU epilogue: the SAME guarded-division hit test as the VPU kernels
(``u = u′/det`` etc., identical EPSILON semantics), a sublane argmin over the
block's 128 triangles, and a lexicographic (dst, original index) merge into
the running best. The 6th matmul plane carries the ORIGINAL triangle index
as an f32 constant row — exact for indices < 2²⁴ and for the 2³⁰ padding
sentinel — so C-scan-order tie-breaking survives without any in-kernel
gather.

Numerics: the matmul associates dot products differently from the VPU
sequence (and ``t′ = o·Ng − A·Ng`` cancels where the VPU form subtracts
``o − A`` first), so distances agree with the packet kernels to ~2e-4
RELATIVE rather than bitwise (the t′ cancellation dominates; tested in
``tests/test_intersect_mxu.py``). Two precision modes
(``RTC_MXU_PRECISION``):

* ``"split3"`` (default) — manual hi/lo-bf16 3-pass matmul for the five
  comparison planes + a HIGHEST f32 dot for t′ (see ``_mxu_block_test``).
  Same ~2e-4 distance contract (t′ precision is unchanged), but the
  VALIDITY tests (u, v, u+v, det, dn) carry ~2⁻¹⁷-of-monomial-scale error,
  so hit/miss decisions within ~1e-4 of a barycentric edge can flip vs
  f32 — razor-edge cases where f32 itself is one rounding away from the
  opposite answer. Winner mismatches are confined to those boundaries
  (tested: ``test_mxu_split3_accuracy`` checks every mismatch against the
  exact-arithmetic boundary margin). Per-lane results remain deterministic
  and chunking/sharding-invariant (the split bits are a pure function of
  the eagerly-packed table).
* ``"highest"`` — the 6-pass decomposition on every plane: exact winner
  parity with the f32 search (``test_mxu_matches_xla_search``), ~1.33×
  the matmul cost. Per-lane results remain DETERMINISTIC and
independent of chunking/compaction (matmul rows are independent), so the
sharded == single-device and chunking-invariance properties still hold
exactly for renders that use this kernel throughout.

Culling runs at PROGRAM granularity: the per-packet AABB bitmask words
(``intersect_pallas.packet_block_masks``) are OR-reduced over each program's
128 packets and the kernel walks the union's set bits (same De Bruijn
scalar walk as the packet bitmask kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingc_tpu.ops.intersect_pallas import (
    _DEBRUIJN,
    _DEBRUIJN_TABLE,
    BITS_PER_WORD,
    COLS_PER_PROGRAM,
    RAY_SUBLANES,
    TRI_LANES,
)
from raytracingc_tpu.scene.types import EPSILON, MISS_DST, Triangles

N_QUANT = 6  # det, dn, u', v', t', orig-index
FEATS = 16  # 13 used + 3 zero padding (MXU-friendly width)
ROWS_PER_BLOCK = N_QUANT * TRI_LANES  # 768 coefficient rows per block
# split3 carries only the five COMPARISON planes through the bf16 passes
# (t' gets its own HIGHEST f32 dot) — 640 rows per block, not 768.
ROWS_PER_BLOCK5 = (N_QUANT - 1) * TRI_LANES
_BIG_F = float(2**30)  # f32-exact padding sentinel (a power of two)
# Largest padded triangle count the MXU kernel accepts: the whole (T*6, 16)
# coefficient table rides as one constant VMEM block (384 B/triangle), so
# 8192 tris = 3 MiB — the same resident-plane budget as the packet kernels'
# streaming threshold. The old gate (8 union words ≈ 31744 tris) admitted
# 12 MiB tables that were never measured; every measured MXU win is ≤3968.
MXU_MAX_TRIS = 8192


def pack_coeffs_mxu(tris: Triangles, orig_idx: jax.Array) -> jax.Array:
    """Per-triangle MT coefficient table → ``(T*6, 16)`` f32, block-major.

    Rows ``[j*768, (j+1)*768)`` belong to triangle block ``j``:
    128 det rows, then 128 dn / u' / v' / t' / index rows. Padding
    triangles (zero vertices) produce all-zero coefficient rows → det = 0 →
    degenerate → never valid.
    """
    a = tris.a
    ab = tris.b - a
    ac = tris.c - a
    n = tris.normal
    ng = jnp.cross(ab, ac)
    t = a.shape[0]
    z1 = jnp.zeros((t, 1), jnp.float32)
    z3 = jnp.zeros((t, 3), jnp.float32)
    z6 = jnp.zeros((t, 6), jnp.float32)

    def rows(c0, o3, d3, m6):
        return jnp.concatenate([c0, o3, d3, m6, z3], axis=1)  # (T, 16)

    def mono(x):
        """det3(o,d,X) coefficients on [oxdy, oxdz, oydx, oydz, ozdx, ozdy]."""
        return jnp.stack(
            [x[:, 2], -x[:, 1], -x[:, 2], x[:, 0], x[:, 1], -x[:, 0]], axis=1
        )

    quant = jnp.stack(
        [
            rows(z1, z3, jnp.cross(ac, ab), z6),  # det
            rows(z1, z3, n, z6),  # dn (stored normal — may differ from Ng)
            rows(z1, z3, jnp.cross(a, ac), mono(ac)),  # u'
            rows(z1, z3, jnp.cross(ab, a), -mono(ab)),  # v'
            rows(-jnp.sum(a * ng, axis=1, keepdims=True), ng, z3, z6),  # t'
            rows(
                jnp.minimum(orig_idx, 2**30).astype(jnp.float32)[:, None],
                z3, z3, z6,
            ),  # original index as f32 (exact < 2^24; sentinel 2^30 exact)
        ],
        axis=0,
    )  # (6, T, 16)
    n_blocks = t // TRI_LANES
    # (6, T, 16) → block-major (n_blocks, 6, 128, 16) → (T*6, 16)
    quant = quant.reshape(N_QUANT, n_blocks, TRI_LANES, FEATS)
    return quant.transpose(1, 0, 2, 3).reshape(t * N_QUANT, FEATS)


def _split_bf16(x):
    """2-way hi/lo bf16 split: ``x ≈ hi + lo`` with ~16 mantissa bits kept.

    ``hi`` is the bf16 rounding of ``x``; ``lo`` the bf16 rounding of the
    residual. Integers < 2¹⁶ (and the 2³⁰ padding sentinel) split EXACTLY:
    the residual of an integer < 2⁸ is itself bf16-representable — so the
    original-index plane survives the 3-pass scheme bit-exactly.
    """
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _build_features(rays_ref):
    """(7, 8, COLS) ray planes → (16, R) feature matrix, lane = s*COLS + col."""
    comps = []
    for c in range(6):
        comps.append(
            jnp.concatenate(
                [rays_ref[c, s : s + 1, :] for s in range(RAY_SUBLANES)],
                axis=1,
            )
        )  # (1, R)
    ox, oy, oz, dx, dy, dz = comps
    one = jnp.ones_like(ox)
    zero = jnp.zeros_like(ox)
    return jnp.concatenate(
        [
            one, ox, oy, oz, dx, dy, dz,
            ox * dy, ox * dz, oy * dx, oy * dz, oz * dx, oz * dy,
            zero, zero, zero,
        ],
        axis=0,
    )  # (16, R)


def _mxu_block_test(feats, coef_ref, j, best_d, best_i, *, precision,
                    split=None):
    """One 128-triangle block against all R rays: matmul + epilogue.

    ``best_d``/``best_i`` are ``(1, R)`` f32 running (distance, orig index)
    carries; index rides in f32 (see module docstring).

    ``split``: when set, the manual hi/lo-bf16 3-pass path —
    ``(feats_hi, feats_lo, coef_hi_ref, coef_lo_ref, coef_tp_ref)``. The
    five comparison planes (det, dn, u′, v′, index) come from THREE bf16
    matmuls (``ch@fh + ch@fl + cl@fh`` — ~2⁻¹⁷-relative error, far inside
    the EPSILON-scale tests; the index plane is exact, see
    :func:`_split_bf16`) while t′ keeps a HIGHEST-precision f32 dot on its
    own 128 rows: t′ = o·Ng − A·Ng cancels catastrophically (|o·Ng| ≫ t′),
    and the measured ~2e-4-relative distance contract comes from f32
    rounding through that cancellation — a 3-pass t′ would be ~64× coarser
    and break the documented tolerance. Total matmul cost: 768·3 bf16-pass
    rows + 128 HIGHEST rows (≈6 bf16-pass-equivalent ≈ 768): 640·3 +
    768 ≈ 2688 vs the 6-pass HIGHEST baseline's 4608 — a 1.7× matmul
    reduction at unchanged accuracy contract (the t' plane is dropped
    from the bf16 tables entirely; review r4 removed its 384 dead
    pass-rows per block).
    """
    if split is not None:
        fh, fl, coef_hi_ref, coef_lo_ref, coef_tp_ref = split
        off = pl.multiple_of(j * ROWS_PER_BLOCK5, ROWS_PER_BLOCK5)
        ch = coef_hi_ref[pl.ds(off, ROWS_PER_BLOCK5), :]  # (640, 16) bf16
        cl = coef_lo_ref[pl.ds(off, ROWS_PER_BLOCK5), :]  # (640, 16) bf16
        dims = (((1,), (0,)), ((), ()))
        dot = lambda a, b: jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32
        )
        m = dot(ch, fh) + dot(ch, fl) + dot(cl, fh)  # (640, R) f32
        offt = pl.multiple_of(j * TRI_LANES, TRI_LANES)
        tp = jax.lax.dot_general(
            coef_tp_ref[pl.ds(offt, TRI_LANES), :], feats, dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (128, R) f32 — exact-f32 t′ (the cancellation-sensitive plane)
    else:
        off = pl.multiple_of(j * ROWS_PER_BLOCK, ROWS_PER_BLOCK)
        coef = coef_ref[pl.ds(off, ROWS_PER_BLOCK), :]  # (768, 16)
        m = jax.lax.dot_general(
            coef, feats, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )  # (768, R)
        tp = m[4 * TRI_LANES : 5 * TRI_LANES]
    det = m[0 * TRI_LANES : 1 * TRI_LANES]
    dn = m[1 * TRI_LANES : 2 * TRI_LANES]
    up = m[2 * TRI_LANES : 3 * TRI_LANES]
    vp = m[3 * TRI_LANES : 4 * TRI_LANES]
    # 5-plane split3 tables put the index plane right after v' (t' was
    # dropped from the bf16 tables); the 6-plane HIGHEST table keeps it
    # in slot 5.
    oif = (
        m[4 * TRI_LANES : 5 * TRI_LANES]
        if split is not None
        else m[5 * TRI_LANES : 6 * TRI_LANES]
    )

    # Identical hit-test semantics to the VPU kernels (raytracing.c:186-214):
    # guarded division, same EPSILON tests, backface cull on the STORED normal.
    degenerate = jnp.abs(det) < EPSILON
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    u = up * inv_det
    v = vp * inv_det
    dst = tp * inv_det
    valid = (
        (dn < 0.0)
        & ~degenerate
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (dst >= EPSILON)
    )
    dstm = jnp.where(valid, dst, MISS_DST)  # (128, R)

    # Block argmin over the 128 triangle sublanes, ties toward the lowest
    # original index (padding rows carry the 2^30 sentinel and lose).
    oif = jnp.where(valid, oif, _BIG_F)
    dmin = jnp.min(dstm, axis=0, keepdims=True)  # (1, R)
    imin = jnp.min(jnp.where(dstm <= dmin, oif, _BIG_F), axis=0, keepdims=True)

    take = (dmin < best_d) | ((dmin == best_d) & (imin < best_i))
    best_d = jnp.where(take, dmin, best_d)
    best_i = jnp.where(take, imin, best_i)
    return best_d, best_i


def _search_kernel_mxu(
    alive_ref,  # (G,) i32 SMEM — per-program live/nonempty flags
    words_ref,  # (G * n_words,) i32 SMEM — per-program union hit-bit words
    deb_ref,  # (32,) i32 SMEM — De Bruijn bit-index table
    rays_ref,  # (7, 8, COLS) f32 VMEM
    *coef_refs,  # highest: ((T*6,16) f32,); split3: (hi bf16, lo bf16, tp f32)
    n_words: int,
    precision,
    split3: bool = False,
):
    *coef_refs, dst_ref, idx_ref = coef_refs
    cols = dst_ref.shape[1]
    r = RAY_SUBLANES * cols
    dst_ref[:, :] = jnp.full((RAY_SUBLANES, cols), MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full((RAY_SUBLANES, cols), -1, jnp.int32)

    pid = pl.program_id(0)

    @pl.when(alive_ref[pid] != 0)
    def _run():
        feats = _build_features(rays_ref)
        if split3:
            coef_hi_ref, coef_lo_ref, coef_tp_ref = coef_refs
            fh, fl = _split_bf16(feats)
            split = (fh, fl, coef_hi_ref, coef_lo_ref, coef_tp_ref)
            coef_ref = None
        else:
            (coef_ref,) = coef_refs
            split = None

        best = (
            jnp.full((1, r), MISS_DST, jnp.float32),
            jnp.full((1, r), _BIG_F, jnp.float32),
        )
        # Walk the union bitmask's set bits (same De Bruijn scalar walk as
        # the packet bitmask kernel; n_words is static → unrolled).
        for w in range(n_words):
            m0 = words_ref[pid * n_words + w]
            base = w * BITS_PER_WORD

            def bit_body(carry, base=base):
                m, bd, bi = carry
                lsb = m & (-m)
                j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]
                bd, bi = _mxu_block_test(
                    feats, coef_ref, base + j, bd, bi, precision=precision,
                    split=split,
                )
                return (m & (m - 1), bd, bi)

            m, bd, bi = jax.lax.while_loop(
                lambda c: c[0] != 0, bit_body, (m0, *best)
            )
            best = (bd, bi)

        best_d, best_if = best
        best_i = jnp.where(
            best_d < MISS_DST, best_if.astype(jnp.int32), -1
        )  # (1, R)
        # (1, R) lanes [s*COLS + col] → (8, COLS)[s, col] via static
        # 128-aligned lane slices (ray id = col*8 + s, as in to_planes).
        dst_ref[:, :] = jnp.concatenate(
            [best_d[:, s * cols : (s + 1) * cols] for s in range(RAY_SUBLANES)],
            axis=0,
        )
        idx_ref[:, :] = jnp.concatenate(
            [best_i[:, s * cols : (s + 1) * cols] for s in range(RAY_SUBLANES)],
            axis=0,
        )


@functools.partial(
    jax.jit, static_argnames=("n_words", "interpret", "precision")
)
def _search_padded_mxu(alive_flags, words, rays_planes, coeffs,
                       n_words, interpret=False, precision="highest"):
    n_cols = rays_planes.shape[2]
    t6 = coeffs.shape[0]
    t = t6 // N_QUANT
    grid = (n_cols // COLS_PER_PROGRAM,)
    split3 = precision == "split3"
    prec = jax.lax.Precision("highest" if split3 else precision)

    if split3:
        # Deterministic element-wise casts of the eagerly-packed table: the
        # split bits are a pure function of the f32 coefficients, so the
        # fixed-bits-per-scene property survives. t′ rows are re-sliced to a
        # (T, 16) f32 plane for the HIGHEST-precision dot (see
        # _mxu_block_test).
        c_blk = coeffs.reshape(t // TRI_LANES, N_QUANT, TRI_LANES, FEATS)
        # Drop the t' plane from the bf16 tables entirely: its rows were
        # computed by the 3-pass matmul and never read (review r4 finding —
        # 384 dead bf16 pass-rows per block and 1/6 dead VMEM).
        c5 = jnp.concatenate([c_blk[:, :4], c_blk[:, 5:]], axis=1)
        coef_hi, coef_lo = _split_bf16(c5.reshape(t * (N_QUANT - 1), FEATS))
        coef_tp = c_blk[:, 4].reshape(t, FEATS)
        coef_args = (coef_hi, coef_lo, coef_tp)
        t5 = t * (N_QUANT - 1)
        coef_specs = [
            pl.BlockSpec((t5, FEATS), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t5, FEATS), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, FEATS), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        coef_args = (coeffs,)
        coef_specs = [
            pl.BlockSpec((t6, FEATS), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _search_kernel_mxu, n_words=n_words, precision=prec, split3=split3
    )
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G,) alive flags
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_words,) words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,) De Bruijn table
            pl.BlockSpec(
                (7, RAY_SUBLANES, COLS_PER_PROGRAM),
                lambda g: (0, 0, g),
                memory_space=pltpu.VMEM,
            ),
            *coef_specs,
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
            flops=2 * ROWS_PER_BLOCK * FEATS * RAY_SUBLANES * n_cols
            * (t6 // ROWS_PER_BLOCK),
            bytes_accessed=(7 + 2) * RAY_SUBLANES * n_cols * 4 + t6 * FEATS * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(alive_flags, words,
      jnp.asarray(_DEBRUIJN_TABLE, jnp.int32), rays_planes, *coef_args)
    return dst, idx
