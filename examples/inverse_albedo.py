"""Inverse rendering demo: recover perturbed materials from a target image.

This is the framework's marquee capability over the reference renderer
(BASELINE.json config 5: "vertex-gradient optimization loop"): render a
ground-truth image, corrupt the scene's albedo, then gradient-descend back.

    python examples/inverse_albedo.py            # single device
    python examples/inverse_albedo.py --sharded  # SPMD over all devices
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sharded", action="store_true",
                    help="use a device mesh + SPMD train step")
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--out", default="/tmp/inverse_albedo")
    args = ap.parse_args()

    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.diff.optimize import fit_scene
    from raytracingc_tpu.render.image import tonemap_to_bytes, write_image
    from raytracingc_tpu.render.renderer import render
    from raytracingc_tpu.scene.builder import scene_from_triangles_txt

    scene_path = os.path.join(os.path.dirname(__file__), "box_scene.txt")
    truth = scene_from_triangles_txt(scene_path)
    cam = Camera.look_at(origin=(0.0, -1.5, -5.5), target=(0.0, 0.0, 6.0))
    w = h = args.size

    target, _ = render(truth, cam, w, h, spp=args.spp, max_bounce=3, seed=11,
                       early_exit=False)

    # Perturb the BACK WALL's albedo (triangles 2-3 of box_scene.txt) and
    # recover it. One wall seen head-on is fully identifiable from a single
    # view; perturbing everything at once is not (many parameters are barely
    # visible from one camera).
    wall = jnp.zeros_like(truth.triangles.albedo).at[2:4].set(1.0)
    key = jax.random.PRNGKey(0)
    noise = jax.random.uniform(key, truth.triangles.albedo.shape, minval=-0.35,
                               maxval=0.35)
    corrupted = truth.replace(
        triangles=truth.triangles.replace(
            albedo=jnp.clip(truth.triangles.albedo + noise * wall, 0.02, 0.98)
        )
    )

    def wall_albedo_only(grads):
        zeroed = jax.tree_util.tree_map(jnp.zeros_like, grads)
        return zeroed.replace(
            triangles=zeroed.triangles.replace(
                albedo=grads.triangles.albedo * wall
            )
        )

    mesh = None
    if args.sharded:
        from raytracingc_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    fitted, losses = fit_scene(
        corrupted, target, cam,
        steps=args.steps, learning_rate=5e-2, spp=args.spp, max_bounce=3,
        seed=11, param_filter=wall_albedo_only, mesh=mesh,
        log_every=10,
    )
    err0 = float(jnp.abs(
        (corrupted.triangles.albedo - truth.triangles.albedo)[2:4]
    ).mean())
    err1 = float(jnp.abs(
        (fitted.triangles.albedo - truth.triangles.albedo)[2:4]
    ).mean())
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}; "
          f"mean |albedo err| {err0:.4f} -> {err1:.4f}")

    os.makedirs(args.out, exist_ok=True)
    for name, sc in [("target", truth), ("corrupted", corrupted),
                     ("recovered", fitted)]:
        img, _ = render(sc, cam, w, h, spp=64, max_bounce=3, seed=3)
        write_image(os.path.join(args.out, f"{name}.png"),
                    tonemap_to_bytes(np.asarray(img)))
    print(f"wrote {args.out}/{{target,corrupted,recovered}}.png")
    return 0 if err1 < err0 else 1


if __name__ == "__main__":
    sys.exit(main())
