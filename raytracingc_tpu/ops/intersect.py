"""Ray–primitive intersection: search (argmin) + differentiable resolve.

The reference's hot loop is a brute-force closest-hit scan
(``calculateRayCollision``, ``raytracing.c:216-240``): all spheres, then all
triangles, argmin on distance starting from ``{didHit=0, dst=999999}``, with
Möller–Trumbore triangle tests that backface-cull against the precomputed face
normal (``raytracing.c:186-214``) and a simplified ray–sphere quadratic
(``raytracing.c:162-184``).

TPU-native design — the search/resolve split:

1. **Search** finds, per ray, only *which* primitive wins (an int index and a
   hit flag). It is integer-valued, needs no gradients, and is the tileable
   O(rays × primitives) kernel: either the Pallas kernel in
   ``intersect_pallas.py`` or the chunked-``lax.scan`` XLA fallback here.
2. **Resolve** gathers the winning primitive and recomputes distance, hit
   point, normal, and material *differentiably* — one MT evaluation per ray.
   Gradients of pixel values w.r.t. vertex positions/normals/materials flow
   through this recompute; the discrete argmin choice itself is (correctly)
   treated as locally constant, the standard subgradient for visibility.

Tie semantics match the C scan order: lower index wins among equal distances;
a sphere beats a triangle at equal distance (spheres are scanned first and
triangles only replace on strictly smaller distance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from raytracingc_tpu.scene.types import EPSILON, MISS_DST, Scene, Spheres, Triangles


class HitRef(struct.PyTreeNode):
    """Per-ray search result: which primitive was hit (no geometry payload)."""

    hit: jax.Array  # bool [R]
    is_tri: jax.Array  # bool [R] (valid only where hit)
    idx: jax.Array  # int32 [R] primitive index (valid only where hit)


class Hit(struct.PyTreeNode):
    """Per-ray resolved hit: differentiable geometry + material."""

    hit: jax.Array  # bool [R]
    dst: jax.Array  # f32 [R] (MISS_DST sentinel where miss, like the C code)
    point: jax.Array  # f32 [R, 3]
    normal: jax.Array  # f32 [R, 3]
    albedo: jax.Array  # f32 [R, 3]
    emission: jax.Array  # f32 [R]
    smoothness: jax.Array  # f32 [R]


def _dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b, axis=-1)


def ray_triangle_dst(o, d, a, b, c, n):
    """Möller–Trumbore with backface cull (``raytracing.c:186-214``).

    All arguments broadcast; returns ``(dst, valid)``. ``dst`` is only
    meaningful where ``valid``; the division is guarded so invalid lanes carry
    finite values (no NaN/inf leaks into gradients).
    """
    ab = b - a
    ac = c - a
    backface = _dot(d, n) >= 0.0  # cull via the precomputed normal
    h = jnp.cross(d, ac)
    det = _dot(ab, h)
    degenerate = jnp.abs(det) < EPSILON
    inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
    s = o - a
    u = _dot(s, h) * inv_det
    q = jnp.cross(s, ab)
    v = _dot(d, q) * inv_det
    dst = _dot(ac, q) * inv_det
    valid = (
        ~backface
        & ~degenerate
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (dst >= EPSILON)
    )
    return dst, valid


def ray_sphere_dst(o, d, center, radius):
    """Simplified quadratic, unit direction ⇒ a=1 (``raytracing.c:162-184``).

    Returns ``(dst, valid)``. Near root preferred; far root if the near one is
    behind ``EPSILON``. Non-positive radii (padding) never hit.
    """
    offset = o - center
    b = _dot(offset, d)
    cc = _dot(offset, offset) - radius * radius
    delta = b * b - cc
    miss = delta < 0.0
    sq = jnp.sqrt(jnp.where(miss, 0.0, delta))
    near = -b - sq
    far = -b + sq
    dst = jnp.where(near < EPSILON, far, near)
    valid = ~miss & (dst >= EPSILON) & (radius > 0.0)
    return dst, valid


# ----------------------------------------------------------------------------
# Search (XLA backend): chunked scan over triangles, full pass over spheres.
# ----------------------------------------------------------------------------


def _search_triangles_xla(o, d, tris: Triangles, chunk: int = 512):
    """Running argmin over triangle chunks. Returns (best_dst, best_idx)."""
    t = tris.a.shape[0]
    # Largest divisor of t that fits the requested chunk: padded counts are
    # usually multiples of 128 (the accel block) but need not divide 512 —
    # e.g. suzannes pads to 3968 = 31×128.
    chunk = min(chunk, t)
    while t % chunk:
        chunk -= 1
    n_chunks = t // chunk

    resh = lambda x: x.reshape(n_chunks, chunk, *x.shape[1:])
    stacked = (resh(tris.a), resh(tris.b), resh(tris.c), resh(tris.normal))

    def body(carry, chunk_data):
        best_dst, best_idx, base = carry
        a, b, c, n = chunk_data
        dst, valid = ray_triangle_dst(
            o[:, None, :], d[:, None, :], a[None], b[None], c[None], n[None]
        )  # [R, chunk]
        dst = jnp.where(valid, dst, MISS_DST)
        j = jnp.argmin(dst, axis=1)
        # min == dst[argmin] for NaN-free data; the lane-axis
        # take_along_axis gather it replaces serializes on TPU.
        dmin = jnp.min(dst, axis=1)
        better = dmin < best_dst  # strict < keeps the earlier (lower) index
        best_dst = jnp.where(better, dmin, best_dst)
        best_idx = jnp.where(better, base + j.astype(jnp.int32), best_idx)
        return (best_dst, best_idx, base + chunk), None

    r = o.shape[0]
    init = (
        jnp.full((r,), MISS_DST, jnp.float32),
        jnp.full((r,), -1, jnp.int32),
        jnp.int32(0),
    )
    (best_dst, best_idx, _), _ = jax.lax.scan(body, init, stacked)
    return best_dst, best_idx


def _search_spheres(o, d, spheres: Spheres):
    """Full [R, S] sphere pass (sphere counts are tiny). Lower index wins ties."""
    dst, valid = ray_sphere_dst(
        o[:, None, :], d[:, None, :], spheres.center[None], spheres.radius[None]
    )
    dst = jnp.where(valid, dst, MISS_DST)
    idx = jnp.argmin(dst, axis=1).astype(jnp.int32)
    # min == dst[argmin] for NaN-free data. The take_along_axis it replaces
    # is a LANE-axis gather that serializes on TPU: it measured 135 us per
    # 16k-ray bounce — 48% of the whole dense-regime render (this runs every
    # bounce of every sample in default triangles.txt + sphere mode).
    dmin = jnp.min(dst, axis=1)
    return dmin, jnp.where(dmin < MISS_DST, idx, -1)


def nearest_hit(
    o: jax.Array,
    d: jax.Array,
    scene: Scene,
    backend: str = "auto",
    tri_chunk: int = 512,
    alive: jax.Array | None = None,
) -> HitRef:
    """Closest-hit search over the whole scene → ``HitRef`` (indices only).

    ``backend``: ``"xla"`` (chunked scan, runs anywhere), ``"pallas"`` (tiled
    TPU kernel), or ``"auto"`` (pallas on TPU, xla otherwise).

    ``alive``: optional bool ``[R]`` wavefront mask — lanes marked dead may
    receive arbitrary miss results (the Pallas backend skips whole dead
    tiles; the masked integrator never reads dead lanes' hits).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    scene_ng = jax.lax.stop_gradient(scene)

    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    axis = scene.shard_axis
    local_indices = False  # does tri_idx number the LOCAL shard slice?
    if scene_ng.triangles.count == 0:  # sphere-only scene: no triangle pass
        tri_dst = jnp.full(o.shape[:1], MISS_DST, jnp.float32)
        tri_idx = jnp.full(o.shape[:1], -1, jnp.int32)
    elif backend == "pallas":
        from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

        tri_dst, tri_idx = search_triangles_pallas(
            o, d, scene_ng.triangles, alive=alive, accel=scene_ng.accel,
            # Block-sharded: the live count is a GLOBAL static while the
            # local shard's live range is data-dependent, and the brute/mxu
            # specialists index the LOCAL original-order slice — force the
            # accel-table architecture (packet, auto-streamed past the VMEM
            # ceiling), whose orig_idx carries GLOBAL original indices.
            # Blocks mode targets scenes far past the specialists' regimes.
            n_live=(scene.n_triangles or None) if axis is None else None,
            variant=None if axis is None else "packet",
        )
        # With a real accel, orig_idx already carries GLOBAL indices; the
        # trivial_accel fallback numbers the LOCAL slice (review r4:
        # duplicated local ids silently corrupted the cross-shard merge).
        local_indices = scene_ng.accel is None
    else:
        tri_dst, tri_idx = _search_triangles_xla(
            o, d, scene_ng.triangles, chunk=tri_chunk
        )
        local_indices = True  # the XLA scan indexes the local slice

    if axis is not None and scene_ng.triangles.count > 0 and local_indices:
        # Globalize: shards are contiguous original-order ranges.
        lo = jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            scene_ng.triangles.count
        )
        tri_idx = jnp.where(tri_dst < MISS_DST, tri_idx + lo, tri_idx)

    if axis is not None and scene_ng.triangles.count > 0:
        # SURVEY §5.8 block-sharded merge: each device searched its own
        # triangle shard; fold the per-shard winners with the SAME
        # (dst, original idx) lexicographic rule the kernels use internally
        # — min over a partition of the scan order is min over the whole
        # order, so the merged result is bit-identical to a whole-scene
        # search (C tie semantics included).
        d_all = jax.lax.all_gather(tri_dst, axis)  # (n, R)
        i_all = jax.lax.all_gather(tri_idx, axis)
        tri_dst, tri_idx = d_all[0], i_all[0]
        for k in range(1, d_all.shape[0]):
            dk, ik = d_all[k], i_all[k]
            take = (dk < tri_dst) | (
                (dk == tri_dst) & (ik >= 0) & (ik < tri_idx)
            )
            tri_dst = jnp.where(take, dk, tri_dst)
            tri_idx = jnp.where(take, ik, tri_idx)

    if scene.n_spheres > 0:
        sph_dst, sph_idx = _search_spheres(o, d, scene_ng.spheres)
    else:
        sph_dst = jnp.full(o.shape[:1], MISS_DST, jnp.float32)
        sph_idx = jnp.full(o.shape[:1], -1, jnp.int32)

    # Triangles are scanned after spheres in the C loop, so they win only on
    # strictly smaller distance (``raytracing.c:229-237``).
    is_tri = tri_dst < sph_dst
    best = jnp.where(is_tri, tri_dst, sph_dst)
    idx = jnp.where(is_tri, tri_idx, sph_idx)
    hit = best < MISS_DST
    return HitRef(hit=hit, is_tri=is_tri, idx=jnp.where(hit, idx, -1))


# ----------------------------------------------------------------------------
# Resolve: differentiable recompute of the winning primitive's geometry.
# ----------------------------------------------------------------------------


# Minimum padded triangle count at which ``auto`` switches the resolve to
# the Morton-permuted table. Bracketed by same-day hardware A/B (round 5):
# at 247,552 tris (17 MB table) the permuted path loses 1.5%; at 990,208
# (67 MB) it wins 11%. The crossover sits between; 500k splits the bracket.
PERM_RESOLVE_MIN_T = 500_000


def _tri_table(tris: Triangles) -> jax.Array:
    """(T, 17) packed resolve rows: A, B, C, N, albedo, emission, smooth."""
    return jnp.concatenate(
        [
            tris.a, tris.b, tris.c, tris.normal, tris.albedo,
            tris.emission[:, None], tris.smoothness[:, None],
        ],
        axis=1,
    )


def with_perm_resolve(scene: Scene) -> Scene:
    """Attach the Morton-permuted resolve table (locality-sorted gathers).

    The resolve row-gather from the ORIGINAL-order table was 73 ms/frame at
    990k triangles (round-4 990k profile): winners of nearby rays are
    spatially near, hence Morton-near, hence scattered across the
    original-order table but CONTIGUOUS in the accel's permuted order.
    This builds the (T, 17) table permuted into accel order — IN TRACE,
    via a differentiable permutation gather of ``scene.triangles``, so
    values are bitwise the originals and vertex/material gradients flow
    unchanged (the permutation is a bijection; its transpose scatter has
    unique indices, so even the gradient bits match the original-order
    path). Called once at integrator entry; every bounce's resolve then
    gathers from the permuted table via the winner's permuted slot
    (``accel.perm_of_orig``). ``RTC_RESOLVE=orig`` disables for A/B.

    No-op (returns ``scene`` unchanged) without an accel carrying
    ``perm_of_orig``, for block-sharded scenes (their resolve combines via
    masked psum over original-order shards), and — under the default
    ``auto`` — for scenes below ``PERM_RESOLVE_MIN_T``: the permuted
    gather wins only when the table is big enough that original-order
    rows thrash (same-day hardware A/B, round 5: +11% at 990k tris,
    −1.5% at 247k, −10% on the 3,868-triangle tracked bench where the
    whole table is cache-resident and the slot indirection is pure cost).
    ``RTC_RESOLVE=perm|orig`` forces either side for A/B.
    """
    import os

    mode = os.environ.get("RTC_RESOLVE", "auto")
    assert mode in ("auto", "perm", "orig"), (
        f"RTC_RESOLVE={mode!r}: expected 'auto', 'perm' or 'orig'"
    )
    accel = scene.accel
    if (
        mode == "orig"
        or (mode == "auto" and scene.triangles.count < PERM_RESOLVE_MIN_T)
        or accel is None
        or getattr(accel, "perm_of_orig", None) is None
        or scene.shard_axis is not None
        or scene.triangles.count <= 256
        or scene.resolve_perm is not None
    ):
        return scene
    table = _tri_table(scene.triangles)
    # orig_idx maps permuted slot → original id; padding slots carry a huge
    # sentinel, clipped to the last row (gathered garbage, never selected).
    perm_rows = jnp.take(table, scene.accel.orig_idx, axis=0, mode="clip")
    return scene.replace(resolve_perm=perm_rows)


def resolve_hit(o: jax.Array, d: jax.Array, ref: HitRef, scene: Scene) -> Hit:
    """Recompute (dst, point, normal, material) for the winning primitive.

    The index/flags in ``ref`` are discrete (constant under differentiation);
    geometry and materials are gathered from ``scene`` and the distance is
    recomputed with the same formulas as the search, so ``jax.grad`` of any
    function of the output reaches vertex positions, normals, sphere
    parameters, and materials.
    """
    tri_sel = ref.hit & ref.is_tri
    sph_sel = ref.hit & ~ref.is_tri
    # Branch-local gather indices: a lane that won a TRIANGLE must not use its
    # triangle index into the sphere arrays (it could land on a radius-0
    # padding sphere, whose 1/radius terms poison the backward pass with
    # 0 * inf = NaN), and vice versa. Non-selected lanes gather slot 0.
    tri_idx = jnp.where(tri_sel, ref.idx, 0)
    sph_idx = jnp.where(sph_sel, ref.idx, 0)

    tris, sph = scene.triangles, scene.spheres

    # ONE packed row-gather per primitive type instead of 12 scattered
    # gathers: TPU gathers are row-oriented, and separate small gathers
    # measured ~4.4 ms per bounce at 64k rays (as slow as the whole search).
    # For SMALL tables the row-gather is replaced by a one-hot matmul on
    # the MXU: at HIGHEST precision the f32 bf16x-pass decomposition is
    # exact for 1.0/0.0 selectors (verified bitwise on hardware across
    # 40 orders of magnitude), and the dense resolve gather measured
    # 61.7 us per 16k-ray bounce vs ~15 us for the matmul. Memory traffic
    # scales as R x T, so the threshold tracks the brute-kernel regime.
    def _rows(table, idx):
        t = table.shape[0]
        if t > 256:
            return jnp.take(table, idx, axis=0)
        onehot = (
            idx[:, None] == jnp.arange(t, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            onehot, table, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    if tris.count:
        if scene.resolve_perm is not None and scene.shard_axis is None:
            # Locality-sorted resolve (round 5): gather the winner's row
            # from the Morton-permuted table attached by
            # ``with_perm_resolve`` — same bits, near-sequential rows for
            # coherent rays. The (R,) slot map is a 4-byte/ray gather vs
            # the 68-byte rows it localizes.
            slot = jnp.take(
                scene.accel.perm_of_orig, tri_idx, axis=0, mode="clip"
            )
            tri_rows = jnp.take(scene.resolve_perm, slot, axis=0)
        elif scene.shard_axis is None:
            tri_table = _tri_table(tris)  # (T, 17)
            tri_rows = _rows(tri_table, tri_idx)  # (R, 17)
        else:
            # Block-sharded (SURVEY §5.8): the winning GLOBAL index lives in
            # exactly one device's original-order shard. Gather locally for
            # the lanes this shard owns, zero the rest, and psum over the
            # axis — the sum is winner_rows + zeros, so every device ends
            # with the full payload (values equal to the replicated gather;
            # only inert zero-signs can differ, which no downstream op
            # exposes — divisions are all where-guarded).
            axis = scene.shard_axis
            lo = jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
                tris.count
            )
            mine = tri_sel & (tri_idx >= lo) & (tri_idx < lo + tris.count)
            local_idx = jnp.where(mine, tri_idx - lo, 0)
            tri_rows = jnp.where(
                mine[:, None], _rows(_tri_table(tris), local_idx), 0.0
            )
            tri_rows = jax.lax.psum(tri_rows, axis)
    else:  # sphere-only scene: no lane ever selects a triangle
        tri_rows = jnp.zeros((o.shape[0], 17), jnp.float32)
        # Degenerate all-zero rows would divide by det=0 below; the EPSILON
        # guard already substitutes 1.0, keeping both passes finite.

    # Triangle recompute (unconditional MT distance along the gathered tri).
    a = tri_rows[:, 0:3]
    b = tri_rows[:, 3:6]
    c = tri_rows[:, 6:9]
    ab = b - a
    ac = c - a
    h = jnp.cross(d, ac)
    det = _dot(ab, h)
    # Guard at the same EPSILON the search rejects at: any WINNING triangle has
    # |det| >= EPSILON, so this never alters a selected lane, and it keeps
    # non-selected lanes (slot-0 gathers) finite in both passes (a 1e-20 guard
    # lets near-parallel gathers produce inf, which NaNs the backward via the
    # zero-cotangent where-branches).
    inv_det = 1.0 / jnp.where(jnp.abs(det) < EPSILON, 1.0, det)
    q = jnp.cross(o - a, ab)
    tri_dst = _dot(ac, q) * inv_det
    tri_normal = tri_rows[:, 9:12]

    if sph.count:
        sph_table = jnp.concatenate(
            [
                sph.center, sph.radius[:, None], sph.albedo,
                sph.emission[:, None], sph.smoothness[:, None],
            ],
            axis=1,
        )  # (S, 9)
        sph_rows = _rows(sph_table, sph_idx)  # (R, 9)

    # Sphere recompute. Slot-0 gathers on non-sphere lanes may still see a
    # radius-0 padding sphere (all-padding scene); guard the divisions so the
    # non-selected branch stays finite in both passes.
    center = sph_rows[:, 0:3] if sph.count else jnp.zeros_like(o)
    radius = sph_rows[:, 3] if sph.count else jnp.ones(o.shape[:1])
    safe_radius = jnp.where(radius > 0.0, radius, 1.0)
    offset = o - center
    bq = _dot(offset, d)
    delta = bq * bq - (_dot(offset, offset) - safe_radius * safe_radius)
    sq = jnp.sqrt(jnp.maximum(delta, 1e-20))
    sph_dst = jnp.where(-bq - sq < EPSILON, -bq + sq, -bq - sq)

    dst = jnp.where(tri_sel, tri_dst, jnp.where(sph_sel, sph_dst, MISS_DST))
    point = o + d * dst[:, None]  # computed even on miss, as the C code does
    sph_normal = (point - center) / safe_radius[:, None]
    normal = jnp.where(tri_sel[:, None], tri_normal, sph_normal)
    normal = jnp.where(ref.hit[:, None], normal, 0.0)

    sel3 = tri_sel[:, None]
    albedo = jnp.where(
        sel3,
        tri_rows[:, 12:15],
        sph_rows[:, 4:7] if sph.count else 0.0,
    )
    emission = jnp.where(
        tri_sel,
        tri_rows[:, 15],
        sph_rows[:, 7] if sph.count else 0.0,
    )
    smoothness = jnp.where(
        tri_sel,
        tri_rows[:, 16],
        sph_rows[:, 8] if sph.count else 0.0,
    )
    zero3 = jnp.zeros_like(albedo)
    return Hit(
        hit=ref.hit,
        dst=dst,
        point=point,
        normal=normal,
        albedo=jnp.where(ref.hit[:, None], albedo, zero3),
        emission=jnp.where(ref.hit, emission, 0.0),
        smoothness=jnp.where(ref.hit, smoothness, 0.0),
    )


@partial(jax.jit, static_argnames=("backend",))
def intersect(o, d, scene: Scene, backend: str = "auto") -> Hit:
    """Convenience: search + resolve in one call."""
    return resolve_hit(o, d, nearest_hit(o, d, scene, backend=backend), scene)
