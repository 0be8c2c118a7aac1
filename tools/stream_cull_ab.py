"""Streamed-cull A/B on the 247k-triangle bench (VERDICT r3 item 5).

suzannes ×64 (tessellate levels=3), 1080p spp=8 b=8 — the round-3 streamed
record (4.05e6 rays/s, range cull). Run each leg in its own process:

    RTC_STREAM_CULL=range python tools/stream_cull_ab.py range
    RTC_STREAM_CULL=words python tools/stream_cull_ab.py words

STREAM_AB_LEVELS overrides the tessellation level (default 3 → 247k tris;
4 → 990k).
"""

import os
import sys
import time

import jax

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import scene_from_obj, tessellate
from raytracingc_tpu.scene.types import Scene


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "auto"
    w, h, spp, b = 1920, 1080, 8, 8
    if len(sys.argv) > 2:
        w = h = int(sys.argv[2])
    levels = int(os.environ.get("STREAM_AB_LEVELS", 3))

    s0 = scene_from_obj("/root/reference/3Dmodels/suzannes.obj")
    tris, n = tessellate(s0.triangles, s0.n_triangles, levels=levels)
    sc = Scene.build(triangles=tris, spheres=s0.spheres, env=s0.env)
    sc = sc.replace(n_triangles=n, n_spheres=s0.n_spheres).with_accel()
    sc = jax.device_put(sc)
    cam = Camera.look_at()

    def launch():
        return render(sc, cam, w, h, spp=spp, max_bounce=b, seed=0)

    t0 = time.time()
    img, count = launch()
    jax.block_until_ready(img)
    print(f"# compile+first {time.time() - t0:.1f}s", flush=True)
    count = float(count)
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        img, _ = launch()
        jax.block_until_ready(img)
        best = min(best, time.time() - t0)
    t0 = time.time()
    outs = [launch()[0] for _ in range(4)]
    jax.block_until_ready(outs)
    sps = count * 4 / (time.time() - t0)
    print(f"stream247k/{tag} tris={n} {w}x{h} spp={spp} b={b}: "
          f"blocked {count / best:.4g} rays/s  streamed x4 {sps:.4g} rays/s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
