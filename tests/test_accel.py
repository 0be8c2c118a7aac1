"""Block-AABB accel: exact equivalence with the brute-force scan."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.ops.accel import build_accel, trivial_accel
from raytracingc_tpu.ops.intersect import nearest_hit
from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import scene_from_obj


@pytest.fixture(scope="module")
def suzanne(models_dir):
    return scene_from_obj(os.path.join(models_dir, "asuzane.obj"))


@pytest.fixture(scope="module")
def rays(suzanne):
    cam = Camera.look_at()
    o, d = primary_rays(cam, 24, 24)
    return o, d


def test_accel_preserves_geometry(suzanne):
    """The permutation is a bijection over live triangles; AABBs bound them."""
    acc = suzanne.accel
    t_live = suzanne.n_triangles
    orig = np.asarray(acc.orig_idx)[:t_live]
    assert sorted(orig.tolist()) == list(range(t_live))
    # Every permuted vertex lies inside its block's AABB.
    a = np.asarray(acc.triangles.a)
    for blk in range(t_live // 128 + (1 if t_live % 128 else 0)):
        s, e = blk * 128, min((blk + 1) * 128, t_live)
        lo, hi = np.asarray(acc.aabb_lo[blk]), np.asarray(acc.aabb_hi[blk])
        assert (a[s:e] >= lo - 1e-5).all() and (a[s:e] <= hi + 1e-5).all()


def test_accel_search_matches_trivial(suzanne, rays):
    """AABB-culled search == brute-force search, bit for bit (indices in
    original order, lexicographic tie-breaking)."""
    o, d = rays
    d_acc, i_acc = search_triangles_pallas(
        o, d, suzanne.triangles, accel=suzanne.accel
    )
    d_ref, i_ref = search_triangles_pallas(
        o, d, suzanne.triangles, accel=trivial_accel(suzanne.triangles)
    )
    np.testing.assert_array_equal(np.asarray(i_acc), np.asarray(i_ref))
    np.testing.assert_allclose(
        np.asarray(d_acc), np.asarray(d_ref), rtol=0, atol=0
    )


def test_accel_matches_xla_backend(suzanne, rays):
    o, d = rays
    ref_p = nearest_hit(o, d, suzanne, backend="pallas")
    ref_x = nearest_hit(o, d, suzanne, backend="xla")
    np.testing.assert_array_equal(np.asarray(ref_p.hit), np.asarray(ref_x.hit))
    np.testing.assert_array_equal(np.asarray(ref_p.idx), np.asarray(ref_x.idx))


def test_render_with_and_without_accel(suzanne):
    cam = Camera.look_at()
    with_acc, _ = render(suzanne, cam, 12, 12, spp=2, max_bounce=2, seed=1,
                         backend="pallas")
    plain = suzanne.replace(accel=None)
    without, _ = render(plain, cam, 12, 12, spp=2, max_bounce=2, seed=1,
                        backend="pallas")
    np.testing.assert_array_equal(np.asarray(with_acc), np.asarray(without))


def test_build_accel_empty_padding_blocks():
    """Padding-only blocks must never hit (inverted AABB)."""
    from raytracingc_tpu.scene.builder import triangles_from_arrays

    verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    normals = np.array([[0, 0, 1]], np.float32)
    tris, n_live = triangles_from_arrays(
        verts, normals, np.ones((1, 3), np.float32),
        np.zeros(1, np.float32), np.zeros(1, np.float32), pad_to=256,
    )
    acc = build_accel(tris, n_live)
    assert acc.aabb_lo.shape == (2, 3)
    assert (np.asarray(acc.aabb_lo[1]) > np.asarray(acc.aabb_hi[1])).all()


def test_packet_block_ranges_multi_group():
    """Range computation must be exact across block-group boundaries (B > 64)
    and conservative (never exclude a block a live ray can hit)."""
    import jax
    from raytracingc_tpu.ops.accel import TriangleAccel
    from raytracingc_tpu.ops.intersect_pallas import packet_block_ranges
    from raytracingc_tpu.scene.types import Triangles

    rng = np.random.default_rng(0)
    B = 130  # 3 groups of 64
    centers = rng.uniform(-50, 50, (B, 3)).astype(np.float32)
    lo = centers - 1.0
    hi = centers + 1.0
    accel = TriangleAccel(
        triangles=Triangles.empty(),
        orig_idx=jnp.zeros((0,), jnp.int32),
        aabb_lo=jnp.asarray(lo),
        aabb_hi=jnp.asarray(hi),
    )
    C = 16
    o = rng.uniform(-60, 60, (C, 8, 3)).astype(np.float32)
    d = rng.standard_normal((C, 8, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    alive = rng.uniform(size=(C, 8)) > 0.3

    first, last = jax.jit(packet_block_ranges)(
        jnp.asarray(o), jnp.asarray(d), jnp.asarray(alive), accel
    )
    first, last = np.asarray(first), np.asarray(last)

    # Numpy reference slab test.
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)
    t0 = (lo[None, None] - o[:, :, None]) * inv[:, :, None]
    t1 = (hi[None, None] - o[:, :, None]) * inv[:, :, None]
    tmin = np.minimum(t0, t1).max(-1)
    tmax = np.maximum(t0, t1).min(-1)
    hit = (tmax >= np.maximum(tmin, 0.0)) & alive[:, :, None]
    any_hit = hit.any(axis=1)  # (C, B)
    for c in range(C):
        idxs = np.nonzero(any_hit[c])[0]
        if len(idxs) == 0:
            assert first[c] > last[c]
        else:
            assert first[c] == idxs.min() and last[c] == idxs.max()


def test_bitmask_cull_multiword_scene():
    """Scenes with more than 31 blocks need multiple mask words per packet —
    exercise the word loop and cross-word bit indexing against brute force."""
    import numpy as np

    from raytracingc_tpu.ops.intersect import _search_triangles_xla
    from raytracingc_tpu.scene.builder import triangles_from_arrays
    from raytracingc_tpu.scene.types import Scene, Spheres

    rng = np.random.default_rng(7)
    t = 40 * 128  # 40 blocks -> 2 mask words (31 bits each)
    centers = rng.uniform(-30, 30, size=(t, 3)).astype(np.float32)
    centers[:, 2] += 40.0  # in front of the camera
    e1 = rng.normal(size=(t, 3)).astype(np.float32) * 0.4
    e2 = rng.normal(size=(t, 3)).astype(np.float32) * 0.4
    verts = np.stack([centers, centers + e1, centers + e2], axis=1)
    normals = np.cross(e1, e2)
    lens = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.maximum(lens, 1e-9)
    tris, n_live = triangles_from_arrays(
        verts, normals, np.full((t, 3), 0.5, np.float32),
        np.zeros(t, np.float32), np.zeros(t, np.float32))
    scene = Scene.build(triangles=tris, spheres=Spheres.empty()).with_accel()
    assert scene.accel.aabb_lo.shape[0] > 31  # multi-word regime

    from raytracingc_tpu.camera import Camera, primary_rays
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 24, 24)
    d_bm, i_bm = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        cull="bitmask")
    d_rg, i_rg = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        cull="range")
    d_x, i_x = _search_triangles_xla(o, d, scene.triangles, chunk=128)
    np.testing.assert_array_equal(np.asarray(i_bm), np.asarray(i_rg))
    np.testing.assert_array_equal(np.asarray(i_bm), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_bm), np.asarray(d_x), rtol=1e-6)
    assert int((np.asarray(i_bm) >= 0).sum()) > 20  # scene actually hit


def test_brute_kernel_small_scene_matches_packet():
    """Scenes with <= BRUTE_MAX_TRIS live triangles auto-dispatch to the
    ray-major brute kernel (triangles as SMEM scalars broadcast over whole
    ray tiles). Its results — including C scan-order tie semantics and
    dead-lane misses — must match both packet kernels and the XLA search
    exactly."""
    import numpy as np

    from raytracingc_tpu.ops.intersect import _search_triangles_xla
    from raytracingc_tpu.ops.intersect_pallas import (
        BRUTE_MAX_TRIS,
        search_triangles_pallas,
    )
    from raytracingc_tpu.scene.builder import triangles_from_arrays
    from raytracingc_tpu.scene.types import MISS_DST, Scene, Spheres

    rng = np.random.default_rng(3)
    t = 50
    assert t <= BRUTE_MAX_TRIS
    centers = rng.uniform(-6, 6, size=(t, 3)).astype(np.float32)
    centers[:, 2] += 10.0
    e1 = rng.normal(size=(t, 3)).astype(np.float32) * 2.0
    e2 = rng.normal(size=(t, 3)).astype(np.float32) * 2.0
    verts = np.stack([centers, centers + e1, centers + e2], axis=1)
    normals = np.cross(e1, e2)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-9)
    tris, n_live = triangles_from_arrays(
        verts, normals, np.full((t, 3), 0.5, np.float32),
        np.zeros(t, np.float32), np.zeros(t, np.float32))
    scene = Scene.build(triangles=tris, spheres=Spheres.empty()).with_accel()
    assert n_live == t

    from raytracingc_tpu.camera import Camera, primary_rays

    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 24, 24)
    # Auto dispatch (cull=None + small n_live) → brute kernel.
    d_br, i_br = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        n_live=n_live)
    d_bm, i_bm = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        cull="bitmask")
    d_x, i_x = _search_triangles_xla(o, d, scene.triangles, chunk=128)
    np.testing.assert_array_equal(np.asarray(i_br), np.asarray(i_bm))
    np.testing.assert_array_equal(np.asarray(i_br), np.asarray(i_x))
    # dst: same MT formula, but a DIFFERENT compiled program — XLA's FMA
    # contraction is program-context dependent, so exact equality cannot be
    # promised across kernels (see CLAUDE.md invariants); indices above ARE
    # exact because both kernels order ties identically.
    np.testing.assert_allclose(np.asarray(d_br), np.asarray(d_bm), rtol=1e-6)
    assert int((np.asarray(i_br) >= 0).sum()) > 50  # scene actually hit

    # Dead lanes must report misses (the packet kernels' contract): the
    # brute kernel only skips whole dead programs, so the wrapper masks.
    alive = np.asarray(rng.uniform(size=o.shape[0]) > 0.5)
    d_a, i_a = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        n_live=n_live, alive=jnp.asarray(alive))
    np.testing.assert_array_equal(np.asarray(i_a)[~alive], -1)
    np.testing.assert_array_equal(np.asarray(d_a)[~alive], MISS_DST)
    np.testing.assert_array_equal(np.asarray(i_a)[alive],
                                  np.asarray(i_br)[alive])


def test_bitmask_cull_falls_back_for_many_blocks():
    """Past 8 mask words (~32k triangles) the bitmask kernel would unroll
    excessively; search_triangles_pallas must silently use the bounded range
    kernel instead, with identical results."""
    import numpy as np

    from raytracingc_tpu.ops.intersect import _search_triangles_xla
    from raytracingc_tpu.scene.builder import triangles_from_arrays
    from raytracingc_tpu.scene.types import Scene, Spheres

    rng = np.random.default_rng(11)
    t = 280 * 128  # 280 blocks -> 10 words > the 8-word unroll budget
    centers = rng.uniform(-60, 60, size=(t, 3)).astype(np.float32)
    centers[:, 2] += 80.0
    e1 = rng.normal(size=(t, 3)).astype(np.float32) * 0.5
    e2 = rng.normal(size=(t, 3)).astype(np.float32) * 0.5
    verts = np.stack([centers, centers + e1, centers + e2], axis=1)
    normals = np.cross(e1, e2)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-9)
    tris, _ = triangles_from_arrays(
        verts, normals, np.full((t, 3), 0.5, np.float32),
        np.zeros(t, np.float32), np.zeros(t, np.float32))
    scene = Scene.build(triangles=tris, spheres=Spheres.empty()).with_accel()
    assert scene.accel.aabb_lo.shape[0] > 8 * 31

    from raytracingc_tpu.camera import Camera, primary_rays
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 8, 8)
    d_bm, i_bm = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        cull="bitmask")  # internally falls back to "range"
    d_x, i_x = _search_triangles_xla(o, d, scene.triangles, chunk=128)
    np.testing.assert_array_equal(np.asarray(i_bm), np.asarray(i_x))
    np.testing.assert_allclose(np.asarray(d_bm), np.asarray(d_x), rtol=1e-6)
