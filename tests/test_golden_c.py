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
    ours = _our_render(scene, w, h, spp=1024, bounces=3)

    diff = np.abs(ours - c_img)
    # Image means converge to the same integral.
    assert abs(ours.mean() - c_img.mean()) < 0.01, (ours.mean(), c_img.mean())
    # Deterministic (miss) pixels: the median pixel is pure environment.
    assert np.median(diff) < 0.01
    # Every pixel within Monte-Carlo noise at these sample counts.
    # At 1024 spp (ours) vs the C side's fixed 4000, the residual band is
    # dominated by the C render's own Monte-Carlo noise.
    assert diff.max() < 0.05, diff.max()


def test_default_mode_matches_c(c_renderer, reference_dir):
    """triangles.txt Cornell box + sphere, emissive ceiling, indirect light.

    The C side renders a fixed 4000 spp per run, but its racy global RNG
    gives every run an independent stream — averaging 8 runs cuts the C-side
    Monte-Carlo noise ~2.8× (measured: single-vs-single p95 0.047,
    4-avg-vs-4-avg 0.020), which with spp=2048 on our side tightens the
    95th-percentile band from the old 0.13 to ≤0.06 (measured 0.038)."""
    w = h = 16
    c_img = np.mean(
        [_c_render(c_renderer, ["-s", str(w), str(h), "-b", "4"],
                   out=f"c_def{i}.bmp") for i in range(8)],
        axis=0,
    )
    scene = scene_from_triangles_txt(os.path.join(reference_dir, "triangles.txt"))
    ours = _our_render(scene, w, h, spp=2048, bounces=4)

    assert abs(ours.mean() - c_img.mean()) < 0.01, (ours.mean(), c_img.mean())
    # Per-pixel agreement within MC noise (indirect-heavy scene).
    assert np.percentile(np.abs(ours - c_img), 95) < 0.06
    # Structural agreement: pixelwise correlation of the two estimates.
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.98, c

    # The sphere's highlight — the one feature only this golden covers
    # (sphere+triangle interplay): the diffuse sphere (center (0,1,0) r=2.5,
    # ``scene.h:17-19``) fills the bottom rows as a ~0.67-luminance plateau,
    # with the emissive ceiling's reflection as a bright patch (>0.85) at
    # rows 12-14. Both renders must show the patch, in the SAME pixels.
    lum_ours = ours.mean(-1)[12:16]
    lum_c = c_img.mean(-1)[12:16]
    for lum in (lum_ours, lum_c):
        assert lum.max() - np.median(lum) > 0.2, (lum.max(), np.median(lum))
    m_ours, m_c = lum_ours > 0.85, lum_c > 0.85
    overlap = (m_ours & m_c).sum()
    assert overlap >= 3, (m_ours.sum(), m_c.sum(), overlap)
    # and the masks agree almost everywhere (≤2 disputed boundary pixels).
    assert (m_ours ^ m_c).sum() <= 2, (m_ours ^ m_c).sum()


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


def test_emissive_materials_match_c(c_renderer, models_dir):
    """rsuzanne.obj: the SuzanneEyes material is emissive (Ke 10 0 0 → red
    emission 10, ``rsuzanne.mtl:19``) — exercises the MTL Ke mapping and the
    emission-before-albedo ordering against the C integrator.

    The eye triangles are tiny (area ≈ 0.03) and invisible from the default
    camera, so the view is zoomed onto the right eye: camera 1.5 units along
    the eye's face normal (renderer-world/post-rotZ(180°) coordinates — the
    same frame the C CLI's ``-p``/``-t`` use)."""
    w = h = 24
    pos = ["2.1778", "-1.2497", "-0.6064"]
    tgt = ["0.8176", "-1.6983", "-0.1608"]
    c_img = _c_render(c_renderer, ["-i", "3Dmodels/rsuzanne.obj",
                                   "-s", str(w), str(h), "-b", "4",
                                   "-p", *pos, "-t", *tgt])
    scene = scene_from_obj(os.path.join(models_dir, "rsuzanne.obj"))
    cam = Camera.look_at(origin=[float(x) for x in pos],
                         target=[float(x) for x in tgt])
    img, _ = render(scene, cam, w, h, spp=768, max_bounce=4, seed=0)
    ours = np.clip(np.asarray(img), 0.0, 1.0)

    assert abs(ours.mean() - c_img.mean()) < 0.03, (ours.mean(), c_img.mean())
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.9, c
    # The emissive eye must register as saturated-red pixels in BOTH renders
    # (emission 10 clips the red channel wherever the eye is seen).
    red_excess_ours = (ours[..., 0] - ours[..., 1:].max(axis=-1)).max()
    red_excess_c = (c_img[..., 0] - c_img[..., 1:].max(axis=-1)).max()
    assert red_excess_ours > 0.2, red_excess_ours
    assert red_excess_c > 0.2, red_excess_c
    # And in the SAME place: the red-dominant pixel masks overlap.
    m_ours = (ours[..., 0] - ours[..., 1:].max(axis=-1)) > 0.1
    m_c = (c_img[..., 0] - c_img[..., 1:].max(axis=-1)) > 0.1
    assert (m_ours & m_c).sum() > 0


def test_mirror_materials_match_c(c_renderer, models_dir):
    """ultracomplex.obj: 120 triangles, 3 materials incl. an Ns=1000 mirror
    (smoothness √(0.001·1000)=1.0, ``objloader.c:272``) — pure specular
    scattering paths against the C integrator."""
    w = h = 16
    c_img = _c_render(c_renderer, ["-i", "3Dmodels/ultracomplex.obj",
                                   "-s", str(w), str(h), "-b", "4"])
    scene = scene_from_obj(os.path.join(models_dir, "ultracomplex.obj"))
    ours = _our_render(scene, w, h, spp=1024, bounces=4)

    assert abs(ours.mean() - c_img.mean()) < 0.02, (ours.mean(), c_img.mean())
    assert np.median(np.abs(ours - c_img)) < 0.01
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.95, c


def test_sky_sun_flags_match_c(c_renderer, models_dir):
    """Non-default -gc/-sch/-scz/--sun overrides (``main.c:119-231``): the
    sky is deterministic (miss pixels carry pure environment light), so a
    recolored sky + hot sun must match the C render near-exactly there."""
    from raytracingc_tpu.scene.types import EnvParams
    import jax.numpy as jnp

    w = h = 16
    gc = ["0.2", "0.1", "0.1"]
    sch = ["0.9", "0.5", "0.2"]
    scz = ["0.1", "0.2", "0.8"]
    sun = ["1.0", "-1.0", "0.5", "50.0", "3.0"]
    c_img = _c_render(
        c_renderer,
        ["-i", "3Dmodels/simplest.obj", "-s", str(w), str(h), "-b", "3",
         "-gc", *gc, "-sch", *sch, "-scz", *scz, "--sun", *sun],
    )
    sun_dir = np.array([float(x) for x in sun[:3]], np.float32)
    sun_dir /= np.linalg.norm(sun_dir)
    env = EnvParams(
        sun_direction=jnp.asarray(sun_dir),
        sky_horizon=jnp.asarray(np.array([float(x) for x in sch], np.float32)),
        sky_zenith=jnp.asarray(np.array([float(x) for x in scz], np.float32)),
        ground=jnp.asarray(np.array([float(x) for x in gc], np.float32)),
        sun_focus=jnp.float32(float(sun[3])),
        sun_intensity=jnp.float32(float(sun[4])),
    )
    scene = scene_from_obj(os.path.join(models_dir, "simplest.obj"), env=env)
    ours = _our_render(scene, w, h, spp=512, bounces=3)

    diff = np.abs(ours - c_img)
    # Deterministic sky pixels: the median pixel must match near-exactly
    # (quantization + float noise only).
    assert np.median(diff) < 0.01, np.median(diff)
    assert abs(ours.mean() - c_img.mean()) < 0.02
    c = np.corrcoef(ours.reshape(-1), c_img.reshape(-1))[0, 1]
    assert c > 0.97, c
