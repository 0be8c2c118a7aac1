"""Edge cases: sphere-only scenes, env-only renders, odd sizes, CLI help."""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.ops.accel import build_accel
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import (
    default_spheres,
    pad_spheres,
    triangles_from_arrays,
)
from raytracingc_tpu.scene.types import Scene


def _empty_tris():
    tris, n = triangles_from_arrays(
        np.zeros((0, 3, 3), np.float32), np.zeros((0, 3), np.float32),
        np.zeros((0, 3), np.float32), np.zeros(0, np.float32),
        np.zeros(0, np.float32),
    )
    return tris, n


@pytest.fixture(scope="module")
def sphere_only_scene():
    tris, n = _empty_tris()
    spheres, n_sph = pad_spheres(default_spheres(), pad_to=8)
    scene = Scene.build(tris, spheres).replace(n_triangles=n, n_spheres=n_sph)
    return scene.replace(accel=build_accel(scene.triangles, 0))


def test_sphere_only_scene_renders(sphere_only_scene):
    """All-padding triangle buffer (zero normals → all culled; inverted
    accel AABBs → empty ranges) + one live sphere."""
    cam = Camera.look_at()
    img, count = render(sphere_only_scene, cam, 12, 12, spp=2, max_bounce=3,
                        seed=0)
    arr = np.asarray(img)
    assert np.isfinite(arr).all()
    # The sphere at (0,1,0) r=2.5 is in view from the default camera: some
    # pixels must differ from the pure-environment background.
    env_only = sphere_only_scene.replace(
        spheres=sphere_only_scene.spheres.replace(
            radius=jnp.zeros_like(sphere_only_scene.spheres.radius)
        )
    )
    bg, _ = render(env_only, cam, 12, 12, spp=2, max_bounce=3, seed=0)
    assert np.abs(arr - np.asarray(bg)).max() > 0.01


def test_env_only_render_deterministic(sphere_only_scene):
    """Nothing to hit → pure environment light, identical across seeds."""
    scene = sphere_only_scene.replace(
        spheres=sphere_only_scene.spheres.replace(
            radius=jnp.zeros_like(sphere_only_scene.spheres.radius)
        )
    )
    cam = Camera.look_at()
    a, count = render(scene, cam, 8, 8, spp=2, max_bounce=4, seed=0)
    b, _ = render(scene, cam, 8, 8, spp=2, max_bounce=4, seed=123)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Each ray dies after exactly one env lookup.
    assert float(count) == 8 * 8 * 2


def test_non_square_and_odd_sizes(sphere_only_scene):
    cam = Camera.look_at()
    for w, h in [(16, 8), (7, 5), (1, 1), (130, 3)]:
        img, _ = render(sphere_only_scene, cam, w, h, spp=1, max_bounce=2,
                        seed=0)
        assert img.shape == (h, w, 3)
        assert np.isfinite(np.asarray(img)).all()


def test_zero_spp_rejected(sphere_only_scene):
    cam = Camera.look_at()
    with pytest.raises(Exception):
        render(sphere_only_scene, cam, 4, 4, spp=0, max_bounce=1)


def test_cli_help_lists_reference_flags(capsys):
    from raytracingc_tpu.cli import build_parser

    with pytest.raises(SystemExit):
        build_parser().parse_args(["-h"])
    out = capsys.readouterr().out
    for flag in ["-i", "-o", "-p", "-t", "-f", "-s", "-b",
                 "-gc", "-sch", "-scz", "--sun", "--spp", "--seed"]:
        assert flag in out, f"flag {flag} missing from --help"
