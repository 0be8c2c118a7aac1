"""Round-4 MXU calibration (VERDICT r3 items 2 and 6).

Measures the split3 (manual hi/lo-bf16 3-pass) MXU kernel against
``highest`` (6-pass) and the auto dispatch on the tracked bench, the C
default workload, and the dense-box grid — the data behind the
``MXU_DENSE_MAX_TRIS`` auto-dispatch rule and BASELINE.md
"Round 4: MXU split3 A/B".

Each leg runs in its own process (kernel + precision bind at trace time):

    python tools/mxu_calibration.py tracked  auto
    RTC_KERNEL=mxu RTC_MXU_PRECISION=split3  python tools/mxu_calibration.py tracked mxu-split3
    RTC_KERNEL=mxu RTC_MXU_PRECISION=highest python tools/mxu_calibration.py cwork   mxu-highest
    RTC_KERNEL=brute python tools/mxu_calibration.py grid brute
"""

import os
import sys
import time

import jax

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import (
    scene_from_obj,
    scene_from_triangles_txt,
    tessellate,
)
from raytracingc_tpu.scene.types import Scene

REFERENCE_TXT = "/root/reference/triangles.txt"
REFERENCE_OBJ = "/root/reference/3Dmodels/suzannes.obj"


def bench(tag, scene, cam, w, h, spp, b, reps=2, stream=4):
    def launch():
        return render(scene, cam, w, h, spp=spp, max_bounce=b, seed=0)

    img, count = launch()
    jax.block_until_ready(img)
    count = float(count)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        img, _ = launch()
        jax.block_until_ready(img)
        best = min(best, time.time() - t0)
    line = f"{tag} {w}x{h} spp={spp} b={b}: blocked {count / best:.4g} rays/s"
    if stream > 1:
        t0 = time.time()
        outs = [launch()[0] for _ in range(stream)]
        jax.block_until_ready(outs)
        sps = count * stream / (time.time() - t0)
        line += f"  streamed x{stream} {sps:.4g} rays/s"
    print(line, flush=True)


def dense_scene(levels):
    s0 = scene_from_triangles_txt(REFERENCE_TXT)
    tris, n = tessellate(s0.triangles, s0.n_triangles, levels=levels)
    sc = Scene.build(triangles=tris, spheres=s0.spheres, env=s0.env)
    sc = sc.replace(n_triangles=n, n_spheres=s0.n_spheres).with_accel()
    return jax.device_put(sc), n


def main() -> int:
    what = sys.argv[1]
    tag = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "RTC_KERNEL", "auto")
    cam = Camera.look_at()

    if what == "tracked":
        scene = jax.device_put(scene_from_obj(REFERENCE_OBJ))
        bench(f"tracked/{tag}", scene, cam, 1920, 1080, 8, 8)
    elif what == "cwork":
        scene, _ = dense_scene(0)
        bench(f"cwork/{tag}", scene, cam, 128, 128, 4000, 10, reps=1,
              stream=2)
    elif what == "grid":
        for lv in (0, 2, 3, 4):
            scene, n = dense_scene(lv)
            bench(f"grid/{tag}/tris={n}", scene, cam, 128, 128, 64, 10)
    else:
        raise SystemExit(f"unknown target {what}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
