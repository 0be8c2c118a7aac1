"""Round-5 regression tests: locality-sorted resolve tables (VERDICT r4
item 3) and the eager packed search plane."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.ops.intersect import (
    PERM_RESOLVE_MIN_T,
    with_perm_resolve,
)
from raytracingc_tpu.render.integrator import trace_accumulate
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import scene_from_obj

SUZANNE = "/root/reference/3Dmodels/suzannes.obj"


@pytest.fixture(scope="module")
def scene():
    return scene_from_obj(SUZANNE)


def test_perm_resolve_render_bitwise(scene, monkeypatch):
    """The Morton-permuted resolve table is a permutation gather of the
    original rows: renders must be BITWISE equal and trace identical ray
    counts whichever table the resolve reads."""
    cam = Camera.look_at()
    outs = {}
    for mode in ("orig", "perm"):
        monkeypatch.setenv("RTC_RESOLVE", mode)
        img, count = render(scene, cam, 32, 32, spp=2, max_bounce=4, seed=3)
        outs[mode] = (np.asarray(img), float(count))
    assert outs["orig"][1] == outs["perm"][1]
    np.testing.assert_array_equal(outs["orig"][0], outs["perm"][0])


def test_perm_resolve_gradients_match(scene, monkeypatch):
    """Material/vertex gradients must flow unchanged through the permuted
    table (it is built in-trace from scene.triangles; the permutation is a
    bijection, so even the transpose scatter has unique indices)."""
    cam = Camera.look_at()
    o, d = primary_rays(cam, 16, 16)
    ids = jnp.arange(16 * 16, dtype=jnp.uint32)

    def loss(tris_param, mode, monkeypatch=monkeypatch):
        monkeypatch.setenv("RTC_RESOLVE", mode)
        s = scene.replace(triangles=tris_param)  # same (stale-free) accel
        radiance, _ = trace_accumulate(
            o, d, s, ids, seed=0, spp=1, max_bounce=3
        )
        return jnp.sum(radiance**2)

    grads = {}
    for mode in ("orig", "perm"):
        g = jax.grad(lambda tp: loss(tp, mode))(scene.triangles)
        grads[mode] = (np.asarray(g.albedo), np.asarray(g.a))
    np.testing.assert_array_equal(grads["orig"][0], grads["perm"][0])
    np.testing.assert_array_equal(grads["orig"][1], grads["perm"][1])
    assert np.abs(grads["orig"][0]).max() > 0  # not vacuously zero


def test_perm_resolve_auto_threshold(scene, monkeypatch):
    """auto = permuted table only at streamed scale (the measured
    crossover); forcing perm attaches it on any accel scene."""
    monkeypatch.delenv("RTC_RESOLVE", raising=False)
    assert scene.triangles.count < PERM_RESOLVE_MIN_T
    assert with_perm_resolve(scene).resolve_perm is None  # auto: small scene
    monkeypatch.setenv("RTC_RESOLVE", "perm")
    sc2 = with_perm_resolve(scene)
    assert sc2.resolve_perm is not None
    assert sc2.resolve_perm.shape == (scene.triangles.count, 17)
    monkeypatch.setenv("RTC_RESOLVE", "nope")
    with pytest.raises(AssertionError):
        with_perm_resolve(scene)


def test_packed_plane_matches_in_trace_packing(scene):
    """The accel's eager (12, T) plane must equal pack_triangles of the
    permuted SoA bit for bit (the kernels' bit-identity contract rides on
    interchangeable inputs)."""
    from raytracingc_tpu.ops.intersect_pallas import pack_triangles

    accel = scene.accel
    assert accel is not None and accel.packed_plane is not None
    plane = pack_triangles(accel.triangles)
    np.testing.assert_array_equal(
        np.asarray(accel.packed_plane), np.asarray(plane)
    )
    # Inverse permutation really inverts: orig_idx[perm_of_orig[i]] == i
    # for live triangles.
    n = scene.n_triangles
    oi = np.asarray(accel.orig_idx)
    po = np.asarray(accel.perm_of_orig)
    np.testing.assert_array_equal(oi[po[:n]], np.arange(n))


def _scattered_tri_scene(t, seed=7):
    from raytracingc_tpu.scene.builder import triangles_from_arrays
    from raytracingc_tpu.scene.types import Scene, Spheres

    rng = np.random.default_rng(seed)
    centers = rng.uniform(-30, 30, size=(t, 3)).astype(np.float32)
    centers[:, 2] += 40.0  # in front of the camera
    e1 = rng.normal(size=(t, 3)).astype(np.float32) * 0.4
    e2 = rng.normal(size=(t, 3)).astype(np.float32) * 0.4
    verts = np.stack([centers, centers + e1, centers + e2], axis=1)
    normals = np.cross(e1, e2)
    normals /= np.maximum(np.linalg.norm(normals, axis=1, keepdims=True),
                          1e-9)
    tris, _ = triangles_from_arrays(
        verts, normals, np.full((t, 3), 0.5, np.float32),
        np.zeros(t, np.float32), np.zeros(t, np.float32))
    return Scene.build(triangles=tris, spheres=Spheres.empty()).with_accel()


def test_col_group_bitwise_identical(monkeypatch):
    """The grouped lockstep walk (RTC_COL_GROUP) is bit-identical to the
    single-column walk at every supported width: exhausted streams re-test
    their previous block and tail groups re-test the last column — both
    idempotent under the lex-(dst, orig idx) running min. Multi-word scene
    (cross-word lockstep) with a partial alive mask (packed-column path)."""
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

    scene = _scattered_tri_scene(40 * 128)
    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 24, 24)
    alive = jnp.asarray(np.arange(o.shape[0]) % 5 != 3)  # ragged occupancy

    outs = {}
    for k in ("1", "2", "4", "8", "16"):
        monkeypatch.setenv("RTC_COL_GROUP", k)
        outs[k] = search_triangles_pallas(
            o, d, scene.triangles, interpret=True, accel=scene.accel,
            alive=alive, cull="bitmask")
    base_d, base_i = (np.asarray(x) for x in outs["1"])
    assert int((base_i >= 0).sum()) > 20  # the scene is actually hit
    for k in ("2", "4", "8", "16"):
        np.testing.assert_array_equal(np.asarray(outs[k][0]), base_d)
        np.testing.assert_array_equal(np.asarray(outs[k][1]), base_i)


def test_col_group_invalid_fails_loudly(monkeypatch):
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

    scene = _scattered_tri_scene(2 * 128, seed=3)
    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 8, 8)
    monkeypatch.setenv("RTC_COL_GROUP", "3")
    with pytest.raises(AssertionError, match="RTC_COL_GROUP"):
        search_triangles_pallas(
            o, d, scene.triangles, interpret=True, accel=scene.accel,
            cull="bitmask")


def test_col_group_packed_stream_bitwise(monkeypatch):
    """The grouped flattened-stream walk in the packed tile-major kernel is
    bit-identical to K=1 and to the cond-words kernel, at a forced tiny
    tile size (multi-tile streaming on CPU interpret) with ragged alive."""
    from raytracingc_tpu.ops.intersect_pallas import search_triangles_pallas

    scene = _scattered_tri_scene(24 * 128, seed=11)
    cam = Camera.look_at(origin=[0.0, 0.0, 0.0], target=[0.0, 0.0, 1.0])
    o, d = primary_rays(cam, 48, 48)
    alive = jnp.asarray(np.arange(o.shape[0]) % 7 != 2)

    monkeypatch.setenv("RTC_STREAM_MAX_T", "512")   # force streaming
    monkeypatch.setenv("RTC_STREAM_TILE", "1024")   # 3 tiles of 8 blocks

    monkeypatch.setenv("RTC_STREAM_CULL", "words")
    ref = search_triangles_pallas(
        o, d, scene.triangles, interpret=True, accel=scene.accel,
        alive=alive)
    base_d, base_i = (np.asarray(x) for x in ref)
    assert int((base_i >= 0).sum()) > 20

    monkeypatch.setenv("RTC_STREAM_CULL", "packed")
    for k in ("1", "8"):
        monkeypatch.setenv("RTC_COL_GROUP", k)
        d_p, i_p = search_triangles_pallas(
            o, d, scene.triangles, interpret=True, accel=scene.accel,
            alive=alive)
        np.testing.assert_array_equal(np.asarray(d_p), base_d)
        np.testing.assert_array_equal(np.asarray(i_p), base_i)
