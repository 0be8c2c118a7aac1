"""Measure this chip's practical VPU f32 ceiling (round-5 roofline anchor).

A non-collapsible polynomial chain (``c = c * (2 - c)``, fixed point 1.0 —
XLA cannot algebraically fold polynomial composition the way it folds
affine chains) at high arithmetic intensity, timed DEVICE-SIDE via an
xprof trace: wall-clock through the axon tunnel is unreliable below ~1 ms
(measured 0.04 ms "walls" for 45 ms of device work).

Measured 2026-08-19 on the one v5e: 6.05 TFLOP/s f32 (45.45 ms device for
274.9 GFLOP). Recorded in BASELINE.md "Round 5: roofline accounting".
"""

import glob
import json
import tempfile

import jax
import jax.numpy as jnp
from jax import lax

UNROLL, LENGTH, CALLS = 256, 32, 4


@jax.jit
def f(x):
    def body(c, _):
        for _ in range(UNROLL):
            c = c * (2.0 - c)  # 2 flops, not affine-collapsible
        return c, None
    y, _ = lax.scan(body, x, None, length=LENGTH)
    return y


def main() -> int:
    from xprof.convert import raw_to_tool_data as rtd

    x = jnp.ones((8, 128, 4096), jnp.float32)
    f(x).block_until_ready()
    td = tempfile.mkdtemp()
    jax.profiler.start_trace(td)
    outs = [f(x) for _ in range(CALLS)]
    jax.block_until_ready(outs)
    jax.profiler.stop_trace()
    paths = glob.glob(td + "/**/*.xplane.pb", recursive=True)
    data, _ = rtd.xspace_to_tool_data(
        paths, "framework_op_stats", {"tqx": "out:csv;"}
    )
    table = json.loads(
        data if isinstance(data, str) else data.decode()
    )[0]
    cols = [c["id"] for c in table["cols"]]
    i_dev = cols.index("host_or_device")
    i_op = cols.index("operation")
    i_self = cols.index("total_self_time")
    busy = 0.0
    for row in table.get("rows", []):
        v = [c.get("v") if c else None for c in row["c"]]
        if str(v[i_dev]).lower() == "device" and v[i_op] != "IDLE":
            busy += float(v[i_self] or 0)
    n_ops = x.size * UNROLL * LENGTH * 2 * CALLS
    print(
        f"device busy {busy / 1e3:.3f} ms -> "
        f"{n_ops / (busy * 1e-6) / 1e12:.3f} TFLOP/s f32"
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
