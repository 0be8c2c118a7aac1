"""Differentiability tests: FD gradient checks, inverse rendering, checkpoints.

This is the BASELINE.json "pixel-grad check pass rate" metric as a test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.diff.fd_check import pixel_grad_check
from raytracingc_tpu.diff.optimize import fit_scene, leaf_filter
from raytracingc_tpu.render.renderer import render


@pytest.fixture(scope="module")
def demo_scene():
    from __graft_entry__ import _demo_scene

    return _demo_scene()


@pytest.fixture(scope="module")
def untied_scene(demo_scene):
    """Demo scene with albedo channel ties broken.

    The Russian-roulette renorm ``a / max(a)`` is non-differentiable exactly
    at tied channels (e.g. the (1,1,1) materials): FD straddles the kink while
    autodiff takes a one-sided subgradient, so FD checks of albedo need
    untied channels (same situation as the reference C integrator, which has
    the identical kink at ``raytracing.c:283-287``).
    """
    import jax

    jt = jax.random.uniform(
        jax.random.PRNGKey(3), demo_scene.triangles.albedo.shape,
        minval=-0.03, maxval=0.03,
    )
    js = jax.random.uniform(
        jax.random.PRNGKey(4), demo_scene.spheres.albedo.shape,
        minval=-0.03, maxval=0.03,
    )
    return demo_scene.replace(
        triangles=demo_scene.triangles.replace(
            albedo=jnp.clip(demo_scene.triangles.albedo + jt, 0.05, 0.97)
        ),
        spheres=demo_scene.spheres.replace(
            albedo=jnp.clip(demo_scene.spheres.albedo + js, 0.05, 0.97)
        ),
    )


@pytest.fixture(scope="module")
def cam():
    return Camera.look_at()


def test_pixel_grad_fd_pass_rate(untied_scene, cam):
    """Smooth-parameter gradients must match central differences for nearly
    all probes (discrete-event flips may fail a small fraction)."""
    res = pixel_grad_check(
        untied_scene, cam, width=8, height=8, spp=2, max_bounce=2,
        eps=1e-3, rtol=2e-2, atol=5e-6, probes_per_leaf=4,
    )
    assert res["pass_rate"] >= 0.9, {
        k: v for k, v in res.items() if k != "pass_rate"
    }


def test_env_grad_exact(demo_scene, cam):
    """Environment-color gradients are fully smooth: every probe must pass."""
    res = pixel_grad_check(
        demo_scene, cam, width=8, height=8, spp=1, max_bounce=1,
        leaves=["sky_horizon", "sky_zenith", "ground"],
        eps=1e-3, rtol=1e-2, probes_per_leaf=6,
    )
    assert res["pass_rate"] == 1.0, res


def test_fit_albedo_recovers(demo_scene, cam):
    """Perturb albedo, optimize it back toward the target render: the loss
    must drop substantially and the recovered albedo must move toward truth."""
    w = h = 8
    target, _ = render(
        demo_scene, cam, w, h, spp=4, max_bounce=2, seed=5, early_exit=False
    )
    truth = np.asarray(demo_scene.triangles.albedo)

    perturbed = demo_scene.replace(
        triangles=demo_scene.triangles.replace(
            albedo=jnp.clip(demo_scene.triangles.albedo * 0.4, 0.0, 1.0)
        )
    )
    fitted, losses = fit_scene(
        perturbed, target, cam,
        steps=60, learning_rate=1e-1, spp=4, max_bounce=2, seed=5,
        trainable=["albedo"],
    )
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    # Only albedo moved.
    np.testing.assert_array_equal(
        np.asarray(fitted.triangles.a), np.asarray(perturbed.triangles.a)
    )
    before = np.abs(np.asarray(perturbed.triangles.albedo) - truth).sum()
    after = np.abs(np.asarray(fitted.triangles.albedo) - truth).sum()
    assert after < before


def test_leaf_filter(demo_scene):
    grads = jax.tree_util.tree_map(jnp.ones_like, demo_scene)
    filt = leaf_filter(["emission"])(grads)
    assert float(jnp.sum(filt.triangles.emission)) > 0
    assert float(jnp.sum(filt.triangles.albedo)) == 0
    assert float(jnp.sum(filt.env.ground)) == 0


def test_fit_checkpoint_resume(demo_scene, cam, tmp_path):
    w = h = 8
    target, _ = render(
        demo_scene, cam, w, h, spp=2, max_bounce=2, seed=5, early_exit=False
    )
    perturbed = demo_scene.replace(
        env=demo_scene.env.replace(ground=jnp.array([0.1, 0.1, 0.1]))
    )
    ck = str(tmp_path / "fit.npz")
    s1, l1 = fit_scene(
        perturbed, target, cam, steps=4, spp=2, max_bounce=2, seed=5,
        trainable=["ground"], checkpoint_path=ck, checkpoint_every=2,
    )
    assert os.path.exists(ck)
    # Resume continues from the saved step (runs only the remaining steps).
    s2, l2 = fit_scene(
        perturbed, target, cam, steps=6, spp=2, max_bounce=2, seed=5,
        trainable=["ground"], checkpoint_path=ck, checkpoint_every=2,
    )
    assert len(l2) == 2  # steps 4..5 only


def test_vertex_grads_match_fd(demo_scene, cam):
    """Geometry gradients: our analytic vertex gradient is the
    visibility-frozen subgradient (the argmin choice is held constant, the
    winning triangle's distance is differentiated — SURVEY.md §7 "backward
    through a discrete argmin"). Freezing the search result makes the loss
    genuinely smooth in the vertices, so EVERY FD probe must match. (With a
    live search, silhouette-crossing probes legitimately disagree — that
    discontinuity is inherent to visibility, also in the reference.)"""
    import jax as _jax
    from raytracingc_tpu.camera import primary_rays
    from raytracingc_tpu.ops.intersect import nearest_hit, resolve_hit

    w = h = 8
    origins, dirs = primary_rays(cam, w, h)
    ref = nearest_hit(origins, dirs, demo_scene)  # frozen hit assignment

    def loss_fn(s):
        hit = resolve_hit(origins, dirs, ref, s)
        return jnp.sum(jnp.where(hit.hit, hit.dst, 0.0)) / (w * h)

    g = _jax.grad(loss_fn)(demo_scene)
    gv = np.asarray(g.triangles.a)
    assert np.isfinite(gv).all() and np.abs(gv).max() > 0

    rng = np.random.default_rng(1)
    loss_jit = _jax.jit(loss_fn)
    for k in range(6):
        v = rng.standard_normal(demo_scene.triangles.a.shape).astype(np.float32)
        v /= np.linalg.norm(v)
        v = jnp.asarray(v)
        # The frozen-search loss is smooth, so a larger step is safe — and
        # needed: at eps=1e-3 the f32 loss (~10) quantizes the difference.
        eps = 1e-2

        def shift(hh):
            return demo_scene.replace(
                triangles=demo_scene.triangles.replace(
                    a=demo_scene.triangles.a + hh * v
                )
            )

        fd = float((loss_jit(shift(eps)) - loss_jit(shift(-eps))) / (2 * eps))
        an = float(jnp.sum(g.triangles.a * v))
        assert abs(fd - an) <= 1e-4 + 3e-2 * max(abs(fd), abs(an)), (k, fd, an)


def test_fd_pass_rate_on_loaded_scene(models_dir, cam):
    """Gradient checks hold on a real OBJ scene (not just the procedural
    fixture): asuzane with untied albedos, material+env leaves."""
    import os

    import jax as _jax

    from raytracingc_tpu.scene.builder import scene_from_obj

    scene = scene_from_obj(os.path.join(models_dir, "asuzane.obj"))
    jt = _jax.random.uniform(
        _jax.random.PRNGKey(9), scene.triangles.albedo.shape,
        minval=-0.05, maxval=0.05,
    )
    scene = scene.replace(
        triangles=scene.triangles.replace(
            albedo=jnp.clip(scene.triangles.albedo + jt, 0.05, 0.95)
        )
    )
    res = pixel_grad_check(
        scene, cam, width=8, height=8, spp=1, max_bounce=2,
        leaves=["triangles.albedo", "env"],
        eps=1e-3, rtol=3e-2, atol=5e-6, probes_per_leaf=3,
    )
    assert res["pass_rate"] >= 0.85, {
        k: v for k, v in res.items() if k != "pass_rate"
    }


def test_vertex_geometry_recovery_end_to_end():
    """BASELINE config 5's named capability: perturb vertex positions, run
    ``fit_scene(trainable=["triangles.a","triangles.b","triangles.c"])``, and
    recover the geometry — loss down, vertex L1 down, accel rebuilt.

    Uses the mirror-triangle/mirror-sphere/sun scene (see
    ``examples/inverse_vertices.py`` for why flat-diffuse scenes cannot carry
    smooth vertex-translation signal in this light model).
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        from inverse_vertices import main as inverse_vertices_main
    finally:
        sys.path.pop(0)

    losses, l1_0, l1_1 = inverse_vertices_main(steps=60)
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    assert l1_1 < 0.25 * l1_0, (l1_0, l1_1)


def test_camera_pose_recovery_end_to_end():
    """VERDICT r2 item 4: perturb ``Camera.origin`` AND the view direction,
    recover both by gradient descent through ``primary_rays`` + the look-at
    basis (``fit_camera``). The bar is a >=4x pose-L2 drop (the measured
    run recovers ~20x at 120 steps; the (origin, unit-view-direction)
    parameterization matters — see ``examples/inverse_camera.py``).
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        from inverse_camera import main as inverse_camera_main
    finally:
        sys.path.pop(0)

    losses, e0, e1 = inverse_camera_main(steps=120)
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    assert e1 < 0.25 * e0, (e0, e1)  # >=4x pose recovery


def test_sphere_center_recovery_end_to_end():
    """Sphere-geometry inverse rendering: perturb the sphere center, recover
    it >=4x via fit_scene(trainable=["spheres.center"]) — no accel involved
    (sphere search is a plain full pass). Measured ~25x at 250 steps; the
    test runs 150 for time (see examples/inverse_sphere.py for the scene
    design rationale)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        from inverse_sphere import main as inverse_sphere_main
    finally:
        sys.path.pop(0)

    losses, c0, c1 = inverse_sphere_main(steps=150)
    assert losses[-1] < 0.2 * losses[0], (losses[0], losses[-1])
    assert c1 < 0.25 * c0, (c0, c1)
