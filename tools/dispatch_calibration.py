"""Reproduce the brute/packet dispatch calibration grid (BASELINE.md
"Round 3: dispatch calibration").

Renders tessellated triangles.txt Cornell boxes (camera-enclosing dense
geometry — the packet culler's worst case) at two call widths with each
kernel forced, printing rays/s per cell. The BRUTE_MAX_TRIS threshold in
``ops/intersect_pallas.py`` is set from this grid.

Run on TPU (each leg in its own process — kernel choice binds at trace):
    RTC_BRUTE_MAX=0        python tools/dispatch_calibration.py packet
    RTC_BRUTE_MAX=10000000 python tools/dispatch_calibration.py brute
"""

import sys
import time

import jax

from raytracingc_tpu.camera import Camera
from raytracingc_tpu.render.renderer import render
from raytracingc_tpu.scene.builder import scene_from_triangles_txt, tessellate
from raytracingc_tpu.scene.types import Scene

REFERENCE_TXT = "/root/reference/triangles.txt"


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    s0 = scene_from_triangles_txt(REFERENCE_TXT)
    cam = Camera.look_at()

    def make(levels):
        tris, n = tessellate(s0.triangles, s0.n_triangles, levels=levels)
        sc = Scene.build(triangles=tris, spheres=s0.spheres, env=s0.env)
        sc = sc.replace(n_triangles=n, n_spheres=s0.n_spheres).with_accel()
        return jax.device_put(sc), n

    def bench(scene, n, w, h, spp, b=8, reps=2):
        def run():
            img, count = render(scene, cam, w, h, spp=spp, max_bounce=b,
                                seed=0)
            jax.block_until_ready(img)
            return float(count)

        count = run()  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        print(f"{mode} tris={n} {w}x{h} spp={spp}: {count / best:.3e} rays/s",
              flush=True)

    for lv in (3, 4):  # 896 / 3,584 live triangles at 16k-ray calls
        sc, n = make(lv)
        bench(sc, n, 128, 128, 64)
    for lv in (4, 5):  # 3,584 / 14,336 at 64k-ray calls (SLOW for brute)
        sc, n = make(lv)
        bench(sc, n, 1920, 1080, 8)
    return 0


if __name__ == "__main__":
    sys.exit(main())
