"""Golden comparisons against the compiled reference C renderer.

SURVEY.md §4: the reference ships no tests, so the regression record is built
here — compile the C renderer (fixing its broken link line, Makefile:2,48),
render fixed configs, and compare against this framework's output.

Comparisons are distribution-level (SURVEY.md §7 P0): both renderers are
Monte-Carlo estimators of the same integral with DIFFERENT RNG streams (the
C stream is a racy global — unreproducible by design), so images agree in
expectation, not per-sample. Sky/miss pixels are deterministic (environment
light only) and must match almost exactly; lit pixels must match within
Monte-Carlo noise bands.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.render.image import read_bmp
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import scene_from_obj, scene_from_triangles_txt


@pytest.fixture(scope="session")
def c_renderer(reference_dir, tmp_path_factory):
    """Compile the reference renderer (gcc -O3, fixed link order)."""
    build = tmp_path_factory.mktemp("refbuild")
    for f in os.listdir(reference_dir):
        if f.endswith((".c", ".h")) and f != "objtest.c":
            shutil.copy(os.path.join(reference_dir, f), build)
    try:
        subprocess.run(
            "gcc -O3 -c *.c && gcc -O3 *.o -o rayt.out -lm -lpthread",
            shell=True, cwd=build, check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        pytest.skip(f"cannot build reference renderer: {e}")
    shutil.copy(os.path.join(reference_dir, "triangles.txt"), build)
    shutil.copytree(
        os.path.join(reference_dir, "3Dmodels"), build / "3Dmodels"
    )
    return build


def _c_render(build, args, out="c_out.bmp", timeout=240):
    subprocess.run(
        ["./rayt.out", *args, "-o", out],
        cwd=build, check=True, capture_output=True, timeout=timeout,
    )
    return read_bmp(str(build / out)).astype(np.float32) / 255.0


def _our_render(scene, w, h, spp, bounces, seed=0):
    img, _ = render(scene, Camera.look_at(), w, h, spp=spp, max_bounce=bounces,
                    seed=seed)
    return np.clip(np.asarray(img), 0.0, 1.0)


def test_simplest_obj_matches_c(c_renderer, models_dir):
    """One-triangle scene: mostly deterministic sky + one lit triangle."""
    w = h = 16
    c_img = _c_render(c_renderer, ["-i", "3Dmodels/simplest.obj",
                                   "-s", str(w), str(h), "-b", "3"])
    scene = scene_from_obj(os.path.join(models_dir, "simplest.obj"))
    ours = _our_render(scene, w, h, spp=196, bounces=3)

    diff = np.abs(ours - c_img)
    # Image means converge to the same integral.
    assert abs(ours.mean() - c_img.mean()) < 0.01, (ours.mean(), c_img.mean())
    # Deterministic (miss) pixels: the median pixel is pure environment.
    assert np.median(diff) < 0.01
    # Every pixel within Monte-Carlo noise at these sample counts.
    assert diff.max() < 0.12, diff.max()


def test_default_mode_matches_c(c_renderer, reference_dir):
    """triangles.txt Cornell box + sphere, emissive ceiling, indirect light."""
    w = h = 16
    c_img = _c_render(c_renderer, ["-s", str(w), str(h), "-b", "4"])
    scene = scene_from_triangles_txt(os.path.join(reference_dir, "triangles.txt"))
    ours = _our_render(scene, w, h, spp=512, bounces=4)

    assert abs(ours.mean() - c_img.mean()) < 0.02, (ours.mean(), c_img.mean())
    # Per-pixel agreement within MC noise (indirect-heavy scene → wider band).
    assert np.percentile(np.abs(ours - c_img), 95) < 0.13
    # Structural agreement: pixelwise correlation of the two estimates.
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.95, c


def test_camera_flags_match_c(c_renderer, models_dir):
    """Moving the camera via CLI-equivalent args shifts both renders alike."""
    w = h = 16
    pos, track = ["-6.0", "-2.0", "-6.0"], ["0.0", "-1.0", "0.5"]
    c_img = _c_render(
        c_renderer,
        ["-i", "3Dmodels/cube.obj", "-s", str(w), str(h), "-b", "2",
         "-p", *pos, "-t", *track],
    )
    scene = scene_from_obj(os.path.join(models_dir, "cube.obj"))
    cam = Camera.look_at(origin=[float(x) for x in pos],
                         target=[float(x) for x in track])
    img, _ = render(scene, cam, w, h, spp=128, max_bounce=2, seed=0)
    ours = np.clip(np.asarray(img), 0, 1)
    assert abs(ours.mean() - c_img.mean()) < 0.02
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.95, c
