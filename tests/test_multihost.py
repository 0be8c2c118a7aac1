"""Multi-host (2-process) distributed rendering test.

The reference's only executor is single-node pthreads (``main.c:284-303``);
our SURVEY §5.8 contract is ``jax.distributed`` + a mesh spanning every
process's devices. This test brings up a REAL 2-process ``jax.distributed``
cluster on CPU (local coordinator, 2 virtual devices per process → a global
4-device mesh), renders a sharded image, and checks it equals each process's
own single-device render exactly (counter-based RNG ⇒ scheduling-invariant).

Exercises ``parallel.mesh.initialize_distributed``'s >1-process path end to
end — the code a typo would otherwise only break on a real pod.
"""

import os
import socket
import subprocess
import sys
import textwrap

_CHILD = textwrap.dedent(
    """
    import sys

    import jax

    # The axon TPU plugin overrides JAX_PLATFORMS; force CPU in-process.
    jax.config.update("jax_platforms", "cpu")

    coordinator, process_id = sys.argv[1], int(sys.argv[2])

    from raytracingc_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(coordinator, num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

    import numpy as np
    from jax.experimental import multihost_utils

    from __graft_entry__ import _demo_scene
    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.parallel.sharded import render_sharded
    from raytracingc_tpu.render.renderer import render

    scene = _demo_scene()
    cam = Camera.look_at()
    kw = dict(width=16, height=16, spp=2, max_bounce=3, seed=0)

    mesh = make_mesh(px=4, spp=1)
    img_sharded, count_sharded = render_sharded(scene, cam, mesh=mesh, **kw)
    full = multihost_utils.process_allgather(img_sharded, tiled=True)
    # count is replicated (P()) — every process can read its local copy.
    count = float(count_sharded.addressable_data(0))

    # Local single-device reference (pure local computation).
    img_local, count_local = render(scene, cam, **kw)

    # Counts are exact; radiance agrees to ~1 ulp. (Bitwise equality holds
    # only between identical XLA programs — the sharded and local renders
    # compile separately and XLA's fusion/FMA-contraction choices are
    # context-dependent, measured at <= 6e-8 here.)
    np.testing.assert_allclose(np.asarray(full), np.asarray(img_local),
                               rtol=0, atol=5e-7)
    assert count == float(count_local), (count, float(count_local))
    print(f"MULTIHOST_PASS p{process_id}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, str(pid)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert f"MULTIHOST_PASS p{pid}" in out, out[-4000:]
