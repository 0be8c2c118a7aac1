"""Sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY.md §4): a sharded render must equal the
single-device render exactly — pixel sharding changes only WHERE rays are
traced, never their RNG streams or math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.parallel.mesh import make_mesh
from raytracingc_tpu.parallel.sharded import make_train_step, render_sharded
from raytracingc_tpu.render.renderer import render

from conftest import assert_allclose


@pytest.fixture(scope="module")
def demo_scene():
    from __graft_entry__ import _demo_scene

    return _demo_scene()


@pytest.fixture(scope="module")
def cam():
    return Camera.look_at()


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_pixel_sharded_matches_single_device(demo_scene, cam):
    w = h = 16
    ref, count_ref = render(demo_scene, cam, w, h, spp=2, max_bounce=3, seed=3)
    img, count = render_sharded(
        demo_scene, cam, w, h, spp=2, max_bounce=3, seed=3, strategy="pixels"
    )
    # Same RNG streams per (pixel, sample) regardless of placement ⇒ exact.
    assert_allclose(img, ref, rtol=1e-6, atol=1e-6)
    assert float(count) == float(count_ref)


def test_sample_sharded_statistics(demo_scene, cam):
    """Sample sharding uses different sample-id slices per device, so images
    differ per-pixel but must agree in distribution with high-spp renders."""
    w = h = 16
    ref, _ = render(demo_scene, cam, w, h, spp=16, max_bounce=3, seed=3)
    img, _ = render_sharded(
        demo_scene, cam, w, h, spp=16, max_bounce=3, seed=3, strategy="samples"
    )
    # Means over the image agree to Monte-Carlo tolerance.
    np.testing.assert_allclose(
        np.asarray(img).mean(), np.asarray(ref).mean(), rtol=0.05
    )


def test_both_axes_mesh(demo_scene, cam):
    w = h = 8
    mesh = make_mesh(px=4, spp=2)
    img, count = render_sharded(
        demo_scene, cam, w, h, spp=4, max_bounce=2, seed=0, mesh=mesh
    )
    assert img.shape == (h, w, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert float(count) > 0


def test_sharded_train_step_descends(demo_scene, cam):
    """Inverse rendering: perturb albedo, one mesh-parallel Adam step must
    produce a finite loss and move the perturbed parameters."""
    w = h = 8
    mesh = make_mesh(px=4, spp=2)
    spp = 4
    origins, dirs = primary_rays(cam, w, h)
    ray_ids = jnp.arange(w * h, dtype=jnp.uint32)

    target_img, _ = render_sharded(
        demo_scene, cam, w, h, spp=spp, max_bounce=2, seed=7, mesh=mesh
    )
    target = target_img.reshape(-1, 3)

    perturbed = demo_scene.replace(
        triangles=demo_scene.triangles.replace(
            albedo=jnp.clip(demo_scene.triangles.albedo * 0.5, 0.0, 1.0)
        )
    )
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(perturbed)
    step = make_train_step(mesh, optimizer, spp=spp, max_bounce=2, seed=7)

    scene1, opt_state, loss0 = step(
        perturbed, opt_state, origins, dirs, ray_ids, target
    )
    scene2, _, loss1 = step(scene1, opt_state, origins, dirs, ray_ids, target)
    assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))
    moved = np.abs(
        np.asarray(scene1.triangles.albedo) - np.asarray(perturbed.triangles.albedo)
    ).max()
    assert moved > 0, "albedo did not receive gradient updates"


def test_graft_entry_forward():
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_dryrun():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_progressive_sharded_matches_oneshot(demo_scene, cam):
    """Sharded + checkpoint-batched rendering equals the plain one-shot
    render exactly (pixel sharding preserves per-lane streams; batching
    uses disjoint sample-id ranges)."""
    from raytracingc_tpu.render.progressive import render_progressive
    from raytracingc_tpu.render.renderer import render as render_plain

    w = h = 16
    ref, count_ref = render_plain(demo_scene, cam, w, h, spp=4, max_bounce=2,
                                  seed=9)
    img, count = render_progressive(
        demo_scene, cam, w, h, spp=4, max_bounce=2, batch_spp=2, seed=9,
        shard_strategy="pixels",
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-6, atol=2e-7)
    assert float(count) == float(count_ref)


def test_sharded_sample_group_matches(demo_scene, cam):
    """render_sharded with sample_group>1 equals g=1 up to the repo-wide
    ~1-ulp XLA fusion-context wobble (different g = different program
    shapes; the association itself never changes — group slices accumulate
    sequentially in sample order), with traced-ray counts EXACTLY equal."""
    from raytracingc_tpu.parallel.sharded import render_sharded

    w = h = 16
    img1, c1 = render_sharded(demo_scene, cam, w, h, spp=8, max_bounce=3,
                              seed=3, strategy="pixels")
    img2, c2 = render_sharded(demo_scene, cam, w, h, spp=8, max_bounce=3,
                              seed=3, strategy="pixels", sample_group=4)
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2),
                               rtol=0, atol=1e-6)
    assert float(c1) == float(c2)
