"""Scene ingest tests: OBJ/MTL parsing, triangles.txt, adapter conventions."""

import os

import numpy as np
import pytest

from raytracingc_tpu.scene.obj_loader import load_mtl, load_obj
from raytracingc_tpu.scene.triangles_txt import load_triangles_txt
from raytracingc_tpu.scene.builder import (
    scene_from_obj,
    scene_from_triangles_txt,
)


def test_simplest_obj(models_dir):
    mesh = load_obj(os.path.join(models_dir, "simplest.obj"))
    assert mesh.count == 1
    # simplest.mtl is empty (no newmtl) → default white material
    # (``objloader.c:501-506``).
    np.testing.assert_allclose(mesh.albedo[0], [1.0, 1.0, 1.0])
    assert mesh.emission[0] == 0.0
    assert mesh.smoothness[0] == 0.0
    # Flat normal comes from the first vertex's vn (index 1 → (0, 1, 0)).
    np.testing.assert_allclose(mesh.normals[0], [0.0, 1.0, 0.0], atol=1e-6)
    # f 1/1/1 3/2/1 2/3/1 → A=v1, B=v3, C=v2.
    np.testing.assert_allclose(mesh.verts[0, 0], [2.0, 0.0, 0.0])
    np.testing.assert_allclose(mesh.verts[0, 1], [2.0, 0.0, -2.0])
    np.testing.assert_allclose(mesh.verts[0, 2], [0.0, 0.0, -2.0])


@pytest.mark.parametrize(
    "name,faces",
    [("cube.obj", 12), ("asuzane.obj", 104), ("suzannes.obj", 3868),
     ("ultracomplex.obj", 120)],
)
def test_face_counts(models_dir, name, faces):
    mesh = load_obj(os.path.join(models_dir, name))
    assert mesh.count == faces


def test_mtl_mapping(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text(
        "newmtl mirror\nNs 1000\nKd 0.5 0.25 0.125\nKe 7 3 1\n"
        "newmtl dull\nNs 250\n"
    )
    mats = load_mtl(str(mtl))
    assert [m.name for m in mats] == ["mirror", "dull"]
    # Ns → sqrt(0.001 * Ns) (``objloader.c:272``): Ns 1000 → 1.0, Ns 250 → 0.5.
    assert mats[0].smoothness == pytest.approx(1.0, abs=1e-6)
    assert mats[1].smoothness == pytest.approx(0.5, abs=1e-6)
    # Ke keeps only the first component (``objloader.c:294-305``).
    assert mats[0].emission == 7.0
    assert mats[0].albedo == (0.5, 0.25, 0.125)


def test_missing_mtl_is_warning(tmp_path):
    obj = tmp_path / "a.obj"
    obj.write_text(
        "mtllib missing.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\n"
        "usemtl whatever\nf 1/1/1 2/1/1 3/1/1\n"
    )
    mesh = load_obj(str(obj))  # must not raise (``objloader.c:234-240``)
    assert mesh.count == 1
    np.testing.assert_allclose(mesh.albedo[0], [1.0, 1.0, 1.0])


def test_quad_faces_truncated(tmp_path):
    obj = tmp_path / "q.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nvn 0 0 1\n"
        "f 1/1/1 2/1/1 3/1/1 4/1/1\n"
    )
    mesh = load_obj(str(obj))
    assert mesh.count == 1  # 4th vertex ignored, like the reference's sscanf


def test_vn_only_faces_rejected(tmp_path):
    obj = tmp_path / "v.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nf 1//1 2//1 3//1\n")
    with pytest.raises(ValueError, match="v//vn"):
        load_obj(str(obj))  # reference exit(69) (``objloader.c:518-521``)


def test_triangles_txt(reference_dir):
    verts, normals, albedo, emission, smoothness = load_triangles_txt(
        os.path.join(reference_dir, "triangles.txt")
    )
    assert verts.shape == (14, 3, 3)
    # First triangle: positive-z wall, white, smoothness .98.
    np.testing.assert_allclose(verts[0, 0], [-5, -5, 5])
    np.testing.assert_allclose(albedo[0], [1, 1, 1])
    assert smoothness[0] == pytest.approx(0.98)
    # Ceiling emitter rows (emission 10, ``triangles.txt:28-30``).
    assert emission[-1] == 10.0 and emission[-2] == 10.0
    # CCW normals are unit length.
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, rtol=1e-5)
    # First wall faces -z (toward the camera at negative z).
    np.testing.assert_allclose(normals[0], [0, 0, -1], atol=1e-6)


def test_scene_from_obj_rotz(models_dir):
    """OBJ import applies rotZ(180°): x,y negated on verts AND normals
    (``raytracing.c:118-135``)."""
    mesh = load_obj(os.path.join(models_dir, "simplest.obj"))
    scene = scene_from_obj(os.path.join(models_dir, "simplest.obj"))
    np.testing.assert_allclose(
        np.asarray(scene.triangles.a[0]),
        mesh.verts[0, 0] * np.array([-1, -1, 1]),
    )
    np.testing.assert_allclose(
        np.asarray(scene.triangles.normal[0]),
        mesh.normals[0] * np.array([-1, -1, 1]),
    )
    assert scene.n_spheres == 0  # OBJ mode is triangles-only (``main.c:241``)
    assert scene.triangles.count % 128 == 0  # padded


def test_scene_default_mode(reference_dir):
    scene = scene_from_triangles_txt(os.path.join(reference_dir, "triangles.txt"))
    assert scene.n_triangles == 14
    assert scene.n_spheres == 1  # the hard-coded sphere (``scene.h:17-19``)
    np.testing.assert_allclose(np.asarray(scene.spheres.center[0]), [0, 1, 0])
    assert float(scene.spheres.radius[0]) == 2.5
