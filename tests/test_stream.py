"""Tile-streamed search kernel (VERDICT r2 item 3: the VMEM scaling fix).

The resident packet kernels hold the whole (12, T) triangle plane in VMEM;
the streamed variant DMAs (12, TILE) tiles over a minor grid dimension and
lex-merges per-tile results. Its contract: BIT-IDENTICAL to the resident
range kernel at any tile size (the per-block MT math is the shared
``_mt_block_test``, and min over a partition of the scan order is min over
the order). These tests force streaming at tiny scale via RTC_STREAM_MAX_T
so interpret mode (CPU) can cover it; the ≥200k-triangle hardware run is
recorded in BASELINE.md ("Round 3: tile-streamed kernel").
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingc_tpu.ops.accel import build_accel
from raytracingc_tpu.ops.intersect import _search_triangles_xla
from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas
from raytracingc_tpu.scene.builder import tessellate, triangles_from_arrays


def _soup(n, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    b = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    c = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    nrm = np.cross(b - a, c - a)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    return triangles_from_arrays(
        np.stack([a, b, c], 1), nrm, np.full((n, 3), 0.5, np.float32),
        np.zeros(n, np.float32), np.zeros(n, np.float32),
    )


def _rays(r, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-5, 5, (r, 3)).astype(np.float32)
    d = rng.normal(size=(r, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture
def stream_tiny(monkeypatch):
    """Force the streamed path at toy scale (2 blocks per tile)."""
    monkeypatch.setenv("RTC_STREAM_MAX_T", "256")
    monkeypatch.setenv("RTC_STREAM_TILE", "256")


def test_streamed_bit_identical_to_resident(stream_tiny, monkeypatch):
    tris, n_live = _soup(700)  # pads to 768 = 6 blocks -> 3 tiles
    accel = build_accel(tris, n_live)
    o, d = _rays(2048)

    ds, is_ = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                      n_live=n_live)
    monkeypatch.setenv("RTC_STREAM_MAX_T", "10000000")
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                     n_live=n_live)
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ir))
    # and both match the XLA reference scan's winners
    dx, ix = _search_triangles_xla(o, d, tris)
    np.testing.assert_array_equal(np.asarray(ir), np.asarray(ix))
    assert int(jnp.sum(is_ >= 0)) > 100  # the comparison is not vacuous


def test_streamed_respects_alive_mask(stream_tiny, monkeypatch):
    tris, n_live = _soup(700)
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=2)
    alive = jnp.asarray(np.random.default_rng(3).random(2048) < 0.5)

    ds, is_ = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                      n_live=n_live, alive=alive)
    monkeypatch.setenv("RTC_STREAM_MAX_T", "10000000")
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                     n_live=n_live, alive=alive)
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ir))


def test_streamed_non_dividing_tile(stream_tiny, monkeypatch):
    """A tile that does not divide the padded count exercises the pad path
    (zero triangles + _BIG_I32 indices, never scanned)."""
    monkeypatch.setenv("RTC_STREAM_TILE", "384")  # 768 % 384 == 0; use 896
    tris, n_live = _soup(800)  # pads to 896 = 7 blocks; tile 384 -> pad 1152
    accel = build_accel(tris, n_live)
    o, d = _rays(1024, seed=4)
    ds, is_ = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                      n_live=n_live)
    monkeypatch.setenv("RTC_STREAM_MAX_T", "10000000")
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, cull="range",
                                     n_live=n_live)
    np.testing.assert_array_equal(np.asarray(ds), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ir))


def test_tessellate_preserves_surface():
    """4-way midpoint subdivision: counts scale by 4^levels and the closest
    hit DISTANCE field is unchanged (the children tile the parent exactly);
    materials/normals are inherited."""
    tris, n_live = _soup(64, seed=7)
    t2, n2 = tessellate(tris, n_live, levels=2)
    assert n2 == 16 * n_live
    o, d = _rays(512, seed=8)
    d0, _ = _search_triangles_xla(o, d, tris)
    d2, _ = _search_triangles_xla(o, d, t2)
    # Distances agree to float roundoff (midpoints are exact in f32 halving,
    # but the MT arithmetic sees different vertex values).
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d2), rtol=2e-4)


def test_auto_dispatch_table(monkeypatch):
    """VERDICT r2 item 7: the auto brute/packet threshold follows the
    measured calibration grid (BASELINE.md "dispatch calibration") — brute
    for n_live <= 1536, packet above, RTC_BRUTE_MAX still overriding."""
    from raytracingc_tpu.ops import intersect_pallas as ip

    calls = []
    real_brute, real_bitmask = ip._search_padded_brute, ip._search_padded_bitmask

    def spy_brute(*a, **k):
        calls.append("brute")
        return real_brute(*a, **k)

    def spy_bitmask(*a, **k):
        calls.append("packet")
        return real_bitmask(*a, **k)

    monkeypatch.setattr(ip, "_search_padded_brute", spy_brute)
    monkeypatch.setattr(ip, "_search_padded_bitmask", spy_bitmask)

    o, d = _rays(1024)
    for n, expect in ((1500, "brute"), (1600, "packet")):
        tris, n_live = _soup(n, seed=n)
        accel = build_accel(tris, n_live)
        calls.clear()
        ip.search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
        assert calls == [expect], (n, calls)

    # RTC_BRUTE_MAX still forces the threshold in either direction.
    monkeypatch.setenv("RTC_BRUTE_MAX", "100")
    tris, n_live = _soup(1500, seed=3)
    accel = build_accel(tris, n_live)
    calls.clear()
    ip.search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    assert calls == ["packet"], calls


def test_stream_threshold_applies_under_default_bitmask_cull(monkeypatch):
    """RTC_STREAM_MAX_T must force the streamed (range) kernel even when the
    cull is the DEFAULT bitmask — the knob caps resident VMEM regardless of
    cull mode (review r3 finding)."""
    from raytracingc_tpu.ops import intersect_pallas as ip

    monkeypatch.setenv("RTC_STREAM_MAX_T", "256")
    monkeypatch.setenv("RTC_STREAM_TILE", "256")
    monkeypatch.setenv("RTC_BRUTE_MAX", "0")  # keep the packet path

    calls = []
    real = ip._search_padded_streamed
    real_w = ip._search_padded_streamed_words

    def spy(*a, **k):
        calls.append("streamed")
        return real(*a, **k)

    def spy_w(*a, **k):
        calls.append("streamed-words")
        return real_w(*a, **k)

    real_wt = ip._search_padded_streamed_words_tmajor

    def spy_wt(*a, **k):
        calls.append("streamed-words")
        return real_wt(*a, **k)

    real_pk = ip._search_padded_streamed_packed_tmajor

    def spy_pk(*a, **k):
        calls.append("streamed-packed")
        return real_pk(*a, **k)

    monkeypatch.setattr(ip, "_search_padded_streamed", spy)
    monkeypatch.setattr(ip, "_search_padded_streamed_words", spy_w)
    monkeypatch.setattr(ip, "_search_padded_streamed_words_tmajor", spy_wt)
    monkeypatch.setattr(ip, "_search_padded_streamed_packed_tmajor", spy_pk)

    tris, n_live = _soup(700)
    accel = build_accel(tris, n_live)
    o, d = _rays(1024, seed=9)
    # No cull= argument: the default (bitmask) must still stream — via the
    # round-5 grouped packed cull (the auto default for streamed scenes).
    ds, is_ = ip.search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    assert calls == ["streamed-packed"], calls
    dx, ix = _search_triangles_xla(o, d, tris)
    np.testing.assert_array_equal(np.asarray(is_), np.asarray(ix))


def test_streamed_kernel_under_shard_map(monkeypatch):
    """The production pod + huge-scene configuration: the tile-streamed
    kernel must compile and run inside shard_map, and the sharded render
    must equal the single-device one exactly (the repo's headline
    invariant), with streaming forced at toy scale."""
    import jax

    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.parallel.sharded import render_sharded
    from raytracingc_tpu.render.renderer import render
    from raytracingc_tpu.scene.types import Scene
    from raytracingc_tpu.scene.builder import _padded_empty_spheres

    monkeypatch.setenv("RTC_STREAM_MAX_T", "256")
    monkeypatch.setenv("RTC_STREAM_TILE", "256")
    monkeypatch.setenv("RTC_BRUTE_MAX", "0")  # keep the packet/stream path

    tris, n_live = _soup(700, seed=21)
    spheres, _ = _padded_empty_spheres(), 0
    scene = Scene.build(triangles=tris, spheres=spheres)
    scene = scene.replace(n_triangles=n_live, n_spheres=0).with_accel()
    cam = Camera.look_at(origin=[0.0, 0.0, -6.0], target=[0.0, 0.0, 0.0])

    w = h = 16
    ref, c_ref = render(scene, cam, w, h, spp=2, max_bounce=2, seed=5)
    img, c = render_sharded(scene, cam, w, h, spp=2, max_bounce=2, seed=5,
                            strategy="pixels")
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))
    assert float(c) == float(c_ref)


def test_streamed_words_bit_identical_to_range(stream_tiny, monkeypatch):
    """VERDICT r3 item 5: the hierarchically-culled words-streamed kernel
    (per-(column, tile) superblock bit words, De Bruijn walk) must be
    BIT-IDENTICAL to the range-streamed kernel and the resident kernel —
    the bits come from the same slab tests, so every slab-passing block is
    still scanned, in the same order."""
    tris, n_live = _soup(700)  # pads to 768 = 6 blocks -> 3 tiles
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=11)

    monkeypatch.setenv("RTC_STREAM_CULL", "words")
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    monkeypatch.setenv("RTC_STREAM_CULL", "range")
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ir))
    monkeypatch.setenv("RTC_STREAM_MAX_T", "10000000")
    monkeypatch.delenv("RTC_STREAM_CULL")
    dres, ires = search_triangles_pallas(o, d, tris, accel=accel,
                                         n_live=n_live)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dres))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ires))
    assert int(jnp.sum(iw >= 0)) > 100  # not vacuous


def test_streamed_packed_is_auto_default(stream_tiny, monkeypatch):
    """AUTO cull on a streamed-size scene takes the grouped packed kernel;
    an explicit cull='range' request keeps the range kernel (the A/B
    knob)."""
    tris, n_live = _soup(700)
    accel = build_accel(tris, n_live)
    o, d = _rays(1024, seed=12)
    # packed (auto) vs explicitly-forced range must still agree bitwise —
    # and the packed path must engage without any env knob.
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                                     cull="range")
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ir))


def test_streamed_words_respects_alive_mask(stream_tiny, monkeypatch):
    monkeypatch.setenv("RTC_STREAM_CULL", "words")
    tris, n_live = _soup(700)
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=13)
    alive = jnp.asarray(np.random.default_rng(14).random(2048) < 0.5)
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                                     alive=alive)
    monkeypatch.setenv("RTC_STREAM_CULL", "range")
    dr, ir = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                                     alive=alive)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ir))


def test_resident_packed_kernel_routed_by_default(monkeypatch):
    """Scenes past the exact-bitmask word cap but under the stream threshold
    take the RESIDENT packed kernel (single-tile stream, grouped lockstep
    walk) — bit-identical to the range kernel and routed by default.
    RTC_BITMASK_MAX_WORDS=1 shrinks the cap so toy scenes exercise it."""
    from raytracingc_tpu.ops import intersect_pallas as ip

    monkeypatch.setenv("RTC_BITMASK_MAX_WORDS", "1")
    monkeypatch.setenv("RTC_BRUTE_MAX", "0")
    tris, n_live = _soup(5000)  # 40 blocks > 1 word * 31

    calls = []
    real_pk = ip._search_padded_streamed_packed_tmajor

    def spy_pk(*a, **k):
        calls.append("resident-packed")
        return real_pk(*a, **k)

    monkeypatch.setattr(ip, "_search_padded_streamed_packed_tmajor", spy_pk)
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=21)
    dw, iw = ip.search_triangles_pallas(o, d, tris, accel=accel,
                                        n_live=n_live)
    assert calls == ["resident-packed"], calls
    # packed tile == whole plane (single tile): one call, not a stream
    dr, ir = ip.search_triangles_pallas(o, d, tris, accel=accel,
                                        n_live=n_live, cull="range")
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dr))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ir))
    dx, ix = _search_triangles_xla(o, d, tris)
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ix))


@pytest.mark.parametrize("order", ["tile", "ray"])
def test_streamed_words_tile_major_bit_identical(stream_tiny, monkeypatch,
                                                 order):
    """The tile-major words grid (one DMA per triangle tile; per-(tile,
    program) outputs folded by an XLA lex-min) must be bit-identical to the
    ray-major grid and the resident kernel."""
    monkeypatch.setenv("RTC_STREAM_ORDER", order)
    tris, n_live = _soup(700)  # 6 blocks -> 3 tiles
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=31)
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    monkeypatch.setenv("RTC_STREAM_MAX_T", "10000000")
    dres, ires = search_triangles_pallas(o, d, tris, accel=accel,
                                         n_live=n_live)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dres))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ires))
    assert int(jnp.sum(iw >= 0)) > 100


def test_streamed_words_cross_tile_ties(stream_tiny, monkeypatch):
    """Duplicate triangles at distant ORIGINAL indices produce exact distance
    ties that can land in different blocks/tiles; the cross-tile fold
    (in-kernel merge for ray-major, the XLA two-reduce fold for tile-major)
    must pick the lowest ORIGINAL index — the C scan-order semantics."""
    n = 600
    rng = np.random.default_rng(41)
    a = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    b = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    c = a + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    # Duplicate the first 300 triangles at the tail: identical geometry,
    # higher original indices (ties are REAL and exact).
    a = np.concatenate([a, a[:300]]); b = np.concatenate([b, b[:300]])
    c = np.concatenate([c, c[:300]])
    nrm = np.cross(b - a, c - a)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=1, keepdims=True), 1e-20)
    n_live2 = n + 300  # pads to 1024 = 8 blocks -> 4 tiles of 2 blocks
    tris, n_live2 = triangles_from_arrays(
        np.stack([a, b, c], 1), nrm, np.full((n_live2, 3), 0.5, np.float32),
        np.zeros(n_live2, np.float32), np.zeros(n_live2, np.float32),
    )
    accel = build_accel(tris, n_live2)
    o, d = _rays(2048, seed=42)

    dx, ix = _search_triangles_xla(o, d, tris)  # oracle: C scan order
    results = {}
    for order in ("tile", "ray"):
        monkeypatch.setenv("RTC_STREAM_ORDER", order)
        dw, iw = search_triangles_pallas(o, d, tris, accel=accel,
                                         n_live=n_live2)
        # Winner INDICES must match the C scan-order oracle exactly (the
        # duplicated triangles tie EXACTLY — identical vertex bits give
        # identical distances within each implementation, so any tie-break
        # slip shows up here); distances agree with the XLA oracle only to
        # FMA wobble, but must be bitwise EQUAL between the two orders.
        np.testing.assert_array_equal(np.asarray(iw), np.asarray(ix))
        results[order] = (np.asarray(dw), np.asarray(iw))
    np.testing.assert_array_equal(results["tile"][0], results["ray"][0])
    np.testing.assert_array_equal(results["tile"][1], results["ray"][1])
    # The duplicates make ties REAL: every hit on a duplicated triangle
    # must report the LOWER (original) copy's index.
    assert int(jnp.sum(ix >= 0)) > 100
    assert int(jnp.max(ix)) < n_live2


@pytest.mark.parametrize("granule", ["1", "2", "3", "auto"])
def test_streamed_packed_bit_identical(stream_tiny, monkeypatch, granule):
    """Round-5 packed kernel (packed active-column lists + multi-word
    granule bits, down to granule=1 exact per-block culling) must be
    bit-identical to the words/range kernels at every granule: finer
    union boxes are still a conservative superset and the walk order is
    ascending block order. (With the round-5 grouped lockstep walk the
    packed kernel is the measured champion at every scale and the auto
    default — BASELINE.md "grouped lockstep column walk".)"""
    tris, n_live = _soup(700)  # pads to 768 = 6 blocks -> 3 tiles
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=21)
    alive = jnp.asarray(np.random.default_rng(22).random(2048) < 0.6)

    monkeypatch.setenv("RTC_STREAM_CULL", "words")
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                                     alive=alive)
    monkeypatch.setenv("RTC_STREAM_CULL", "packed")
    monkeypatch.setenv("RTC_STREAM_GRANULE", granule)
    dp, ip = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live,
                                     alive=alive)
    am = np.asarray(alive)
    np.testing.assert_array_equal(np.asarray(dw)[am], np.asarray(dp)[am])
    np.testing.assert_array_equal(np.asarray(iw)[am], np.asarray(ip)[am])
    assert int(jnp.sum(jnp.where(alive, ip, -1) >= 0)) > 50


def test_resident_packed_bit_identical(monkeypatch):
    """The packed kernel's RESIDENT regime (whole plane as one tile) must
    match the resident words kernel bitwise."""
    tris, n_live = _soup(900)  # pads to 1024 = 8 blocks
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=23)
    # Force the words/packed regime (past the "exact bitmask" word cap).
    monkeypatch.setenv("RTC_BITMASK_MAX_WORDS", "0")
    monkeypatch.setenv("RTC_STREAM_CULL", "words")
    dw, iw = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    monkeypatch.setenv("RTC_STREAM_CULL", "packed")
    monkeypatch.setenv("RTC_STREAM_GRANULE", "1")
    dp, ip = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    np.testing.assert_array_equal(np.asarray(dw), np.asarray(dp))
    np.testing.assert_array_equal(np.asarray(iw), np.asarray(ip))
    assert int(jnp.sum(ip >= 0)) > 100


def test_extract_mode_bit_identical(stream_tiny, monkeypatch):
    """RTC_EXTRACT=roll (dynamic lane rotate) and the default masked
    reduce are pure data movement: bitwise-equal search results. The roll
    measured 37% slower on the 990k hardware bench (round 5) and is an
    A/B knob only."""
    tris, n_live = _soup(700)
    accel = build_accel(tris, n_live)
    o, d = _rays(2048, seed=24)
    dr_, ir_ = search_triangles_pallas(o, d, tris, accel=accel,
                                       n_live=n_live)
    monkeypatch.setenv("RTC_EXTRACT", "roll")
    dl, il = search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
    np.testing.assert_array_equal(np.asarray(dr_), np.asarray(dl))
    np.testing.assert_array_equal(np.asarray(ir_), np.asarray(il))


@pytest.mark.parametrize(
    "knob,value",
    [
        ("RTC_STREAM_CULL", "wordz"),
        ("RTC_STREAM_ORDER", "tiles"),
        ("RTC_EXTRACT", "rolll"),
        ("RTC_STREAM_GRANULE", "0"),
    ],
)
def test_knob_typos_fail_loudly(stream_tiny, monkeypatch, knob, value):
    """VERDICT r4 item 7: misspelled knob VALUES must raise, not fall
    through to a silent default."""
    tris, n_live = _soup(2000)  # past BRUTE_MAX_TRIS: the packet/streamed
    accel = build_accel(tris, n_live)  # path (where the knobs live) engages
    o, d = _rays(512, seed=25)
    monkeypatch.setenv(knob, value)
    if knob == "RTC_STREAM_GRANULE":
        monkeypatch.setenv("RTC_STREAM_CULL", "packed")
    elif knob == "RTC_STREAM_ORDER":
        # The grid-order knob lives in the words kernels; route there so
        # the typo is actually read (packed is the auto default now).
        monkeypatch.setenv("RTC_STREAM_CULL", "words")
    with pytest.raises((AssertionError, ValueError)):
        search_triangles_pallas(o, d, tris, accel=accel, n_live=n_live)
