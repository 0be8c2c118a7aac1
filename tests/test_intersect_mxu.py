"""MXU (matmul Möller–Trumbore) search kernel vs the XLA reference search.

The MXU kernel computes the same hit test with a different dot-product
association (see ``ops/intersect_mxu.py``), so the contract is a documented
tolerance rather than bitwise equality: distances agree to ~1e-4 relative
and winners agree everywhere except where two distances collide within
that noise (none on these fixed seeds).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingc_tpu.ops.accel import build_accel
from raytracingc_tpu.ops.intersect import _search_triangles_xla
from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas
from raytracingc_tpu.scene.builder import triangles_from_arrays


def _random_soup(seed=7, t=300, spread=3.0, edge=1.5):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-spread, spread, (t, 3)).astype(np.float32)
    b = a + rng.uniform(-edge, edge, (t, 3)).astype(np.float32)
    c = a + rng.uniform(-edge, edge, (t, 3)).astype(np.float32)
    verts = np.stack([a, b, c], axis=1)
    n = np.cross(b - a, c - a)
    n /= np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    tris, n_live = triangles_from_arrays(
        verts, n, np.full((t, 3), 0.5, np.float32),
        np.zeros(t, np.float32), np.zeros(t, np.float32))
    return tris, n_live


def _random_rays(seed, r=2048, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_mxu_matches_xla_search(monkeypatch):
    """The HIGHEST (6-pass) mode: exact winner parity — the strict contract."""
    monkeypatch.setenv("RTC_MXU_PRECISION", "highest")
    tris, n_live = _random_soup()
    accel = build_accel(tris, n_live)
    o, d = _random_rays(11)
    dst_x, idx_x = _search_triangles_xla(o, d, tris)
    dst_m, idx_m = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu")
    idx_x, idx_m = np.asarray(idx_x), np.asarray(idx_m)
    np.testing.assert_array_equal(idx_x, idx_m)
    hit = idx_x >= 0
    assert hit.sum() > 100  # the fixture must actually exercise hits
    np.testing.assert_allclose(
        np.asarray(dst_m)[hit], np.asarray(dst_x)[hit], rtol=2e-4)


def _boundary_margin(o, d, tris, t):
    """f64 distance of triangle ``t``'s hit test from its nearest validity
    boundary (u, v, 1-u-v, |det|-EPS, dst-EPS, -dn), normalized to the
    barycentric scale — tiny means a razor-edge case any rounding can flip."""
    a, b, c, n = (np.asarray(x[t], np.float64)
                  for x in (tris.a, tris.b, tris.c, tris.normal))
    o, d = np.asarray(o, np.float64), np.asarray(d, np.float64)
    ab, ac = b - a, c - a
    h = np.cross(d, ac)
    det = ab @ h
    if abs(det) < 1e-12:
        return 0.0
    s = o - a
    u = (s @ h) / det
    v = (d @ np.cross(s, ab)) / det
    return float(min(abs(u), abs(1.0 - u), abs(v), abs(u + v - 1.0)))


def test_mxu_split3_accuracy():
    """The split3 (default) mode's documented contract: distances of agreeing
    winners within ~2e-4 relative (same t′ precision as HIGHEST); winner
    mismatches ONLY at validity boundaries — rays whose losing/winning
    triangle sits within ~1e-3 of a barycentric edge in exact arithmetic —
    and rare (<0.5%)."""
    tris, n_live = _random_soup()
    accel = build_accel(tris, n_live)
    o, d = _random_rays(11)
    dst_x, idx_x = _search_triangles_xla(o, d, tris)
    dst_m, idx_m = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu")
    idx_x, idx_m = np.asarray(idx_x), np.asarray(idx_m)
    mismatch = np.nonzero(idx_x != idx_m)[0]
    assert len(mismatch) <= max(1, int(0.005 * len(idx_x))), (
        f"{len(mismatch)} winner mismatches — split3 band too wide")
    for i in mismatch:
        margins = [
            _boundary_margin(o[i], d[i], tris, t)
            for t in (int(idx_x[i]), int(idx_m[i])) if t >= 0
        ]
        assert margins and min(margins) < 1e-3, (
            f"lane {i}: winner flip NOT at a validity boundary "
            f"(margins {margins})")
    agree = (idx_x == idx_m) & (idx_x >= 0)
    assert agree.sum() > 100
    np.testing.assert_allclose(
        np.asarray(dst_m)[agree], np.asarray(dst_x)[agree], rtol=2e-4)


def test_mxu_tie_breaks_toward_lowest_original_index():
    """Duplicate triangles produce bitwise-equal coefficient rows, hence
    bitwise-equal distances — the lex merge must pick the lowest ORIGINAL
    index (the C scan order, ``raytracing.c:229-237``)."""
    tri = np.array([[[-2, -2, 3], [2, -2, 3], [0, 2, 3]]], np.float32)
    verts = np.concatenate([tri + 0.0, tri, tri], axis=0)  # idx 0,1,2 equal
    # Shift index 0 BEHIND the others so the winner among ties is index 1.
    verts[0, :, 2] = 5.0
    n = np.cross(verts[:, 1] - verts[:, 0], verts[:, 2] - verts[:, 0])
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    n = -n  # face the -z camera side (backface cull is on the stored normal)
    tris, n_live = triangles_from_arrays(
        verts, n, np.full((3, 3), 0.5, np.float32),
        np.zeros(3, np.float32), np.zeros(3, np.float32))
    accel = build_accel(tris, n_live)
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (8, 1))
    dst, idx = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu")
    np.testing.assert_array_equal(np.asarray(idx), np.full(8, 1))
    np.testing.assert_allclose(np.asarray(dst), np.full(8, 3.0), rtol=1e-5)


def test_mxu_dead_lanes_report_miss():
    tris, n_live = _random_soup(seed=3, t=64)
    accel = build_accel(tris, n_live)
    o, d = _random_rays(5, r=512, spread=1.0)
    alive = jnp.asarray(np.arange(512) % 3 == 0)
    dst, idx = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu", alive=alive)
    dead = ~np.asarray(alive)
    assert np.all(np.asarray(idx)[dead] == -1)
    assert np.all(np.asarray(dst)[dead] >= 999999.0)
    # Live lanes match the unmasked call exactly.
    dst_f, idx_f = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu")
    live = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(idx)[live], np.asarray(idx_f)[live])
    np.testing.assert_array_equal(np.asarray(dst)[live], np.asarray(dst_f)[live])


def test_mxu_render_end_to_end_matches_xla(monkeypatch):
    """A full render with RTC_KERNEL=mxu agrees with the XLA backend within
    the kernel's documented tolerance (identical RNG streams; only the
    intersection rounding differs)."""
    from __graft_entry__ import _demo_scene
    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.render.renderer import render

    scene = _demo_scene()
    cam = Camera.look_at()
    img_x, _ = render(scene, cam, 32, 32, spp=2, max_bounce=3, backend="xla")
    monkeypatch.setenv("RTC_KERNEL", "mxu")
    img_m, _ = render(scene, cam, 32, 32, spp=2, max_bounce=3,
                      backend="pallas")
    a, b = np.asarray(img_x), np.asarray(img_m)
    # Radiance is bounded O(10); winners agree on these seeds so the only
    # differences are intersection-distance rounding through shading.
    np.testing.assert_allclose(a, b, atol=5e-4, rtol=1e-3)


def test_mxu_chunking_invariance(monkeypatch):
    """Per-lane MXU results are independent of pixel chunking (matmul rows
    are independent; direct search calls verify EXACT equality under
    slicing in test_mxu_dead_lanes_report_miss). Full renders across
    different chunk layouts are different XLA programs, so the documented
    cross-program FMA-contraction tolerance (~1 ulp of radiance, CLAUDE.md)
    applies — measured identically for the packet kernel at this config."""
    from __graft_entry__ import _demo_scene
    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.render.renderer import render

    monkeypatch.setenv("RTC_KERNEL", "mxu")
    scene = _demo_scene()
    cam = Camera.look_at()
    imgs = [
        np.asarray(render(scene, cam, 48, 48, spp=2, max_bounce=3,
                          backend="pallas", pixel_chunk=c)[0])
        for c in (1024, 2304)
    ]
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=0, atol=2e-6)


def test_mxu_search_slicing_exact():
    """The search itself IS exactly invariant to how rays are batched into
    calls (program membership changes, per-lane results do not)."""
    tris, n_live = _random_soup(seed=9, t=200)
    accel = build_accel(tris, n_live)
    o, d = _random_rays(13, r=2048)
    dst_f, idx_f = search_triangles_pallas(
        o, d, tris, accel=accel, n_live=n_live, variant="mxu")
    parts = [
        search_triangles_pallas(
            o[i : i + 1024], d[i : i + 1024], tris, accel=accel,
            n_live=n_live, variant="mxu")
        for i in (0, 1024)
    ]
    np.testing.assert_array_equal(
        np.asarray(dst_f), np.concatenate([np.asarray(p[0]) for p in parts]))
    np.testing.assert_array_equal(
        np.asarray(idx_f), np.concatenate([np.asarray(p[1]) for p in parts]))


def test_mxu_oversize_falls_back_loudly(capsys):
    """An explicit RTC_KERNEL=mxu request past the VMEM cap must fall back
    to the packet kernel WITH a stderr notice (review r3 finding: silent
    fallback misattributes A/B numbers)."""
    import numpy as np

    from raytracingc_tpu.ops.accel import build_accel
    from raytracingc_tpu.ops.intersect_mxu import MXU_MAX_TRIS
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas
    from raytracingc_tpu.scene.builder import triangles_from_arrays

    rng = np.random.default_rng(11)
    n = MXU_MAX_TRIS + 128
    a = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    b = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    c = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    nm = np.cross(b - a, c - a)
    nm /= np.maximum(np.linalg.norm(nm, axis=1, keepdims=True), 1e-20)
    tris, n_live = triangles_from_arrays(
        np.stack([a, b, c], 1), nm, np.full((n, 3), 0.5, np.float32),
        np.zeros(n, np.float32), np.zeros(n, np.float32))
    accel = build_accel(tris, n_live)
    assert accel.mxu_coeffs is None  # dead-weight table not packed past cap

    import jax.numpy as jnp
    o = jnp.zeros((1024, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (1024, 1))
    search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                            variant="mxu")
    assert "RTC_KERNEL=mxu unsupported" in capsys.readouterr().err
