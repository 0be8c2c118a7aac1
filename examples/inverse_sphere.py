"""Sphere-geometry inverse rendering: recover a sphere's center from pixels.

Completes the demonstrated inverse-rendering axes (vertices:
``inverse_vertices.py``; albedo: ``inverse_albedo.py``; environment and
camera pose: ``tests/test_diff.py`` / ``inverse_camera.py``): perturb the
hard-coded sphere's CENTER (the analog of the reference's one mutable scene
object, ``scene.h:17-19``) and recover it from L2 image loss with
``fit_scene(trainable=["spheres.center"])``. No accel is involved — the
sphere search is a plain full pass — so unlike triangle-vertex training the
loss keeps the triangle accel.

Scene design note: like the vertex demo, signal quality is everything. A
GLOSSY sphere (smoothness 0.9) under a sharp sun (focus 200) over a diffuse
floor gives strong smooth gradients — the sun highlight and the shading
field both move with the center; measured 24.7× center-L2 recovery in 250
steps. (The mirror-corridor scene of the vertex demo plateaus at ~3.8× for
the sphere: its center is observed only through a double reflection.)

Run: python examples/inverse_sphere.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")  # tiny render; CPU is fine

import jax.numpy as jnp
import numpy as np

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.diff.optimize import fit_scene
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import triangles_from_arrays
from raytracingc_tpu.scene.types import EnvParams, Scene, Spheres


def make_scene(offset=(0.0, 0.0, 0.0)) -> Scene:
    """Glossy sphere over a diffuse floor, lit by a sharp sun."""
    sun = np.array([0.4, -1.0, -0.6], np.float32)
    sun /= np.linalg.norm(sun)
    env = EnvParams.default().replace(
        sun_direction=jnp.asarray(sun),
        sun_focus=jnp.float32(200.0),
        sun_intensity=jnp.float32(5.0),
    )
    # One diffuse floor triangle (y-down world: y=1.5 is below the sphere).
    verts = np.array([[[-8, 1.5, -8], [0, 1.5, 8], [8, 1.5, -8]]], np.float32)
    n = np.array([[0, -1, 0]], np.float32)
    tris, _ = triangles_from_arrays(
        verts, n, np.full((1, 3), 0.6, np.float32),
        np.zeros(1, np.float32), np.zeros(1, np.float32),
    )
    spheres = Spheres(
        center=jnp.asarray(
            [[0.0 + offset[0], -0.2 + offset[1], 3.0 + offset[2]]],
            jnp.float32,
        ),
        radius=jnp.asarray([1.0], jnp.float32),
        albedo=jnp.full((1, 3), 0.9, jnp.float32),
        emission=jnp.zeros((1,), jnp.float32),
        smoothness=jnp.asarray([0.9], jnp.float32),
    )
    return Scene.build(triangles=tris, spheres=spheres, env=env).with_accel()


def main(steps: int = 250, perturb=(0.15, -0.12, 0.2)):
    cam = Camera.look_at(origin=[0.0, -0.5, 0.0], target=[0.0, -0.2, 3.0])
    w = h = 32
    true_scene = make_scene()
    target, _ = render(true_scene, cam, w, h, spp=4, max_bounce=3, seed=0,
                       early_exit=False)

    start = make_scene(perturb)
    c0 = float(jnp.linalg.norm(start.spheres.center
                               - true_scene.spheres.center))
    print(f"perturbed center error: {c0:.4f}")

    fitted, losses = fit_scene(
        start, target, cam, steps=steps, learning_rate=5e-3,
        spp=4, max_bounce=3, seed=0, trainable=["spheres.center"],
        log_every=max(steps // 5, 1),
    )
    c1 = float(jnp.linalg.norm(fitted.spheres.center
                               - true_scene.spheres.center))
    print(f"loss {losses[0]:.3e} -> {losses[-1]:.3e}")
    print(f"center error {c0:.4f} -> {c1:.4f} ({c0 / c1:.1f}x recovery)")
    return losses, c0, c1


if __name__ == "__main__":
    main()
