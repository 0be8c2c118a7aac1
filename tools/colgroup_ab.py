"""A/B the grouped lockstep column walk (RTC_COL_GROUP) on the production
dispatch path, by xprof device self-time.

Usage: python tools/colgroup_ab.py [obj_path]
Runs the production `search_triangles_pallas` on a 262k-ray mid-band of
1080p primaries and on a compacted secondary front, for each group width.
Verifies bitwise identity against K=1 before timing. See BASELINE.md
"grouped lockstep column walk" for the recorded ladder.
"""

import functools
import glob
import json
import os
import sys
import tempfile

import jax
import jax.numpy as jnp

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.ops import intersect_pallas as ip
from raytracingc_tpu.scene.builder import scene_from_obj
from raytracingc_tpu.scene.types import MISS_DST

CALLS = 16
WIDTHS = ("1", "2", "4", "8", "16")


def device_ms(fn, args):
    out = fn(*args)
    jax.block_until_ready(out)
    from xprof.convert import raw_to_tool_data as rtd
    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    outs = [fn(*args) for _ in range(CALLS)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    paths = glob.glob(td + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:csv;"})
    table = json.loads(data if isinstance(data, str) else data.decode())[0]
    cols = [c["id"] for c in table["cols"]]
    i_dev = cols.index("host_or_device")
    i_op = cols.index("operation")
    i_self = cols.index("total_self_time")
    busy = 0.0
    for row in table.get("rows", []):
        v = [c.get("v") if c else None for c in row["c"]]
        if str(v[i_dev]).lower() == "device" and v[i_op] != "IDLE":
            busy += float(v[i_self] or 0)
    return busy / 1e3 / CALLS


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/3Dmodels/suzannes.obj")
    scene = scene_from_obj(path)
    cam = Camera.look_at()
    o_all, d_all = primary_rays(cam, 1920, 1080)
    n = 262144
    mid = 500 * 1920
    o, d = o_all[mid:mid + n], d_all[mid:mid + n]
    alive = jnp.ones((n,), bool)

    def search(o, d, alive):
        return ip.search_triangles_pallas(
            o, d, scene.triangles, accel=scene.accel, alive=alive,
            n_live=scene.n_triangles)

    dst, idx = search(o, d, alive)
    jax.block_until_ready(dst)
    hit = idx >= 0
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n, 3))
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    pack = jnp.argsort(~hit, stable=True)
    nh = int(jnp.sum(hit))
    workloads = {
        "primary": (o, d, alive),
        "secondary": ((o + dst[:, None] * d)[pack], v[pack],
                      jnp.arange(n) < nh),
    }
    for wname, args in workloads.items():
        base = None
        for k in WIDTHS:
            os.environ["RTC_COL_GROUP"] = k
            out = search(*args)
            jax.block_until_ready(out)
            if base is None:
                base = out
            else:
                same = bool(jnp.all(base[0] == out[0])) and bool(
                    jnp.all(base[1] == out[1]))
                assert same, f"K={k} diverged from K=1 on {wname}"
            ms = device_ms(functools.partial(search), args)
            print(f"{wname:10s} K={k:>2s}: {ms:8.3f} ms/call", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
