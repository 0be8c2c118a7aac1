"""Benchmark harness: rays/s on the reference's largest scene.

Renders ``suzannes.obj`` (3,868 triangles — the reference's biggest bundled
scene) at 1080p and reports traced rays per second on the current default JAX
device. Prints exactly ONE JSON line:

    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

``vs_baseline`` is measured against the CPU reference anchor recorded in
``BASELINE.md`` (the C renderer at 12 pthreads on this container's single
core: ≈1.0e6 traced rays/s). The reference publishes no numbers of its own
(``/root/reference/README.md:1-15``), so the anchor is our own measurement.

Env overrides: BENCH_W, BENCH_H, BENCH_SPP, BENCH_BOUNCE, BENCH_SCENE,
BENCH_BACKEND, BENCH_REPEATS, BENCH_CHUNK (pixel chunk), BENCH_COMPACT
(0/1, default 1), BENCH_SAMPLE_BATCH (int or "auto"), RTC_CULL
(bitmask|range), RTC_KERNEL (auto|packet|brute|mxu), BENCH_SAMPLE_GROUP
(int or "auto"; unset → autotune over {1, auto} and report the winner —
same arithmetic and association at every point, so this is pure schedule
selection), BENCH_STREAM (frames enqueued back-to-back for the
steady-state throughput measurement; default 4, 1 = blocked-only; the
JSON records both numbers).

Modes (VERDICT r2 items 2 and 5):

* ``BENCH_MODE=train`` — times one inverse-rendering training step
  (render → L2 loss → grads → adam update) in BOTH the geometry-trainable
  (accel-free search) and material-only (accel reused) variants, plus the
  matching forward render, and reports backward/forward ratios. Train
  defaults are smaller (256², spp 2, 4 bounces) because the
  geometry-trainable loss must run the brute accel-free search.
* ``BENCH_SHARD=pixels|samples|both`` — routes the render through
  ``render_sharded`` over all visible devices (measures shard_map overhead
  on one chip; measures scaling on a pod with zero new code); the JSON
  gains a ``mesh`` field.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_SCENE = "/root/reference/3Dmodels/suzannes.obj"
# CPU anchor: the reference C renderer ON THE SAME SCENE (suzannes.obj,
# 3,868-triangle brute-force scan): 2.6e4 traced rays/s measured single-core
# on this container, extrapolated x12 to the 12 cores its pthread count
# implies (BASELINE.md "Measured so far"). rays/s on this scene is
# resolution-independent, so the 8x8 measurement anchors the 1080p bench.
BASELINE_RAYS_PER_SEC = 3.1e5


def _bench_train(scene, cam, scene_path: str, platform: str) -> int:
    """BENCH_MODE=train: one inverse-rendering step, both trainability modes.

    The training step is the same construction as ``fit_scene``'s inner
    step (render with the differentiable fixed-length scan → L2 loss →
    grads → adam update); geometry-trainable runs the loss against the
    per-step in-trace accel REFRESH (``refresh_accel`` — exact culling at
    training time, round 5), material-only reuses the frozen accel.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from raytracingc_tpu.camera import primary_rays
    from raytracingc_tpu.diff.optimize import leaf_filter
    from raytracingc_tpu.ops.accel import refresh_accel
    from raytracingc_tpu.render.integrator import trace_accumulate
    from raytracingc_tpu.render.renderer import render

    # Train defaults are smaller: the geometry-trainable loss runs the
    # accel-free brute search, and the backward sweep roughly doubles cost.
    # CPU fallback shrinks the DEFAULTS only — explicit BENCH_* overrides
    # are honored on every platform (the env-override contract).
    dw = dh = 256 if platform != "cpu" else 64
    dspp, db = (2, 4) if platform != "cpu" else (1, 2)
    width = int(os.environ.get("BENCH_W", dw))
    height = int(os.environ.get("BENCH_H", dh))
    spp = int(os.environ.get("BENCH_SPP", dspp))
    max_bounce = int(os.environ.get("BENCH_BOUNCE", db))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    repeats = int(os.environ.get("BENCH_REPEATS", 2))

    origins, dirs = primary_rays(cam, width, height)
    ray_ids = jnp.arange(width * height, dtype=jnp.uint32)
    target, _ = render(scene, cam, width, height, spp=spp,
                       max_bounce=max_bounce, seed=1, backend=backend)
    target = target.reshape(-1, 3)
    optimizer = optax.adam(1e-2)

    def make_step(loss_accel, pfilter, refresh=False):
        @jax.jit
        def step(scene_p, opt_state):
            def loss_fn(s):
                a = (
                    refresh_accel(loss_accel, s.triangles, s.n_triangles)
                    if refresh else loss_accel
                )
                radiance, count = trace_accumulate(
                    origins, dirs, s.replace(accel=a), ray_ids,
                    seed=0, spp=spp, max_bounce=max_bounce, backend=backend,
                )
                return jnp.mean((radiance - target) ** 2), count

            (loss, count), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(scene_p)
            if pfilter is not None:
                grads = pfilter(grads)
            updates, opt_state = optimizer.update(grads, opt_state, scene_p)
            scene_p = jax.tree_util.tree_map(
                lambda p, u: p + u, scene_p, updates)
            return scene_p, opt_state, loss, count

        return step

    accel = scene.accel
    scene_p = scene.replace(accel=None)
    opt_state = optimizer.init(scene_p)

    def time_step(step):
        s, o, loss, count = step(scene_p, opt_state)  # compile + warm
        jax.block_until_ready(loss)
        best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.time()
            s, o, loss, count = step(scene_p, opt_state)
            jax.block_until_ready(loss)
            best = min(best, time.time() - t0)
        return best, float(count)

    # Geometry-trainable: per-step accel refresh when the scene has a real
    # accel (round 5 — vertex training with full culling); accel-free
    # otherwise, or on BENCH_TRAIN_ACCELFREE=1 for the A/B.
    accel_free = os.environ.get("BENCH_TRAIN_ACCELFREE", "0") == "1"
    use_refresh = (
        scene.accel is not None
        and scene.accel.perm_of_orig is not None
        and not accel_free
    )
    geom_s, geom_rays = time_step(
        make_step(scene.accel, None, refresh=True) if use_refresh
        else make_step(None, None)
    )
    mat_s, mat_rays = time_step(
        make_step(accel, leaf_filter(["albedo", "emission", "smoothness",
                                      "env"])))

    # Forward-only anchor at the SAME config and integrator (the
    # differentiable fixed-length scan, accel on) for honest fwd:bwd ratios.
    fwd_fn = jax.jit(lambda: trace_accumulate(
        origins, dirs, scene, ray_ids, seed=0, spp=spp,
        max_bounce=max_bounce, backend=backend))
    jax.block_until_ready(fwd_fn()[0])
    fwd_s = float("inf")
    for _ in range(max(repeats, 1)):
        t0 = time.time()
        r, fwd_rays = fwd_fn()
        jax.block_until_ready(r)
        fwd_s = min(fwd_s, time.time() - t0)
    fwd_rays = float(fwd_rays)

    result = {
        "metric": f"train-step rays/s (geometry-trainable), "
        f"{os.path.basename(scene_path)} {width}x{height} spp={spp} "
        f"b={max_bounce} [{platform}]",
        "value": round(geom_rays / geom_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(geom_rays / geom_s / BASELINE_RAYS_PER_SEC, 3),
        "geom_step_s": round(geom_s, 4),
        "material_step_s": round(mat_s, 4),
        "material_rays_s": round(mat_rays / mat_s, 1),
        "forward_scan_s": round(fwd_s, 4),
        "forward_scan_rays_s": round(fwd_rays / fwd_s, 1),
        "geom_over_forward": round(geom_s / fwd_s, 2),
        "material_over_forward": round(mat_s / fwd_s, 2),
        "repeats": repeats,
        "geom_loss_accel": "refresh" if use_refresh else "none",
        "ray_accounting": "logical (forward rays per step; backward sweep "
        "included in the time)",
    }
    print(json.dumps(result))
    return 0


def _roofline_profile(launch, frames: int):
    """Trace ``frames`` enqueued frames; return per-frame device-time stats.

    VERDICT r4 item 4: the bench must report device-busy time and a
    utilization figure, not just wall-clock rays/s — a regression in
    device-busy fraction would otherwise hide inside tunnel noise. Parses
    the xprof ``framework_op_stats`` table (the same tool behind the
    BASELINE.md profiles) from a ``jax.profiler`` trace: per-frame device
    busy = sum of device op self-times excluding IDLE. Returns None (and
    says why on stderr) when tracing or parsing is unavailable.
    """
    import glob
    import tempfile

    import jax

    try:
        from xprof.convert import raw_to_tool_data as rtd
    except Exception as e:  # pragma: no cover - environment-dependent
        print(f"# roofline: xprof unavailable ({e})", file=sys.stderr)
        return None
    try:
        with tempfile.TemporaryDirectory() as td:
            jax.profiler.start_trace(td)
            outs = [launch()[0] for _ in range(frames)]
            jax.block_until_ready(outs)
            jax.profiler.stop_trace()
            paths = glob.glob(td + "/**/*.xplane.pb", recursive=True)
            if not paths:
                print("# roofline: no xplane captured", file=sys.stderr)
                return None
            data, _ = rtd.xspace_to_tool_data(
                paths, "framework_op_stats", {"tqx": "out:csv;"}
            )
        s = data if isinstance(data, str) else data.decode("utf-8", "replace")
        table = json.loads(s)[0]
        cols = [c["id"] for c in table["cols"]]
        i_dev = cols.index("host_or_device")
        i_op = cols.index("operation")
        i_self = cols.index("total_self_time")
        busy_us = idle_us = search_us = 0.0
        for row in table.get("rows", []):
            vals = [c.get("v") if c else None for c in row["c"]]
            if str(vals[i_dev]).lower() != "device":
                continue
            t = float(vals[i_self] or 0.0)
            name = str(vals[i_op])
            if name == "IDLE":
                idle_us += t
            else:
                busy_us += t
                if "search" in name.lower():
                    search_us += t
        return {
            "device_busy_ms": round(busy_us / 1e3 / frames, 2),
            "device_idle_ms": round(idle_us / 1e3 / frames, 2),
            "search_self_ms": round(search_us / 1e3 / frames, 2),
        }
    except Exception as e:  # pragma: no cover - parsing is best-effort
        print(f"# roofline: profile failed ({e})", file=sys.stderr)
        return None


def main() -> int:
    # Persistent compilation cache: repeat bench runs skip the 10-60 s
    # first-compile (harmless if already set by the environment).
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    width = int(os.environ.get("BENCH_W", 1920))
    height = int(os.environ.get("BENCH_H", 1080))
    spp = int(os.environ.get("BENCH_SPP", 8))
    max_bounce = int(os.environ.get("BENCH_BOUNCE", 8))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    repeats = int(os.environ.get("BENCH_REPEATS", 2))
    scene_path = os.environ.get("BENCH_SCENE", REFERENCE_SCENE)
    pixel_chunk = os.environ.get("BENCH_CHUNK")
    pixel_chunk = int(pixel_chunk) if pixel_chunk else None
    compact = os.environ.get("BENCH_COMPACT", "1") == "1"
    sample_batch_env = os.environ.get("BENCH_SAMPLE_BATCH", "1")
    sample_batch = (
        "auto" if sample_batch_env == "auto" else int(sample_batch_env)
    )
    sample_group_env = os.environ.get("BENCH_SAMPLE_GROUP", "1")
    sample_group = (
        "auto" if sample_group_env == "auto" else int(sample_group_env)
    )

    import jax

    platform = jax.default_backend()
    if platform == "cpu":
        # CPU fallback (no TPU attached): shrink so the bench stays quick.
        width = int(os.environ.get("BENCH_W", 128))
        height = int(os.environ.get("BENCH_H", 128))
        spp = int(os.environ.get("BENCH_SPP", 2))
        max_bounce = int(os.environ.get("BENCH_BOUNCE", 4))

    from raytracingc_tpu.camera import Camera
    from raytracingc_tpu.render.renderer import render

    if os.path.exists(scene_path):
        from raytracingc_tpu.scene.builder import scene_from_obj

        scene = scene_from_obj(scene_path)
    else:  # standalone checkout without the reference assets
        from __graft_entry__ import _demo_scene

        scene = _demo_scene()
        scene_path = "<procedural demo scene>"

    # BENCH_TESS=k: midpoint-tessellate the scene 4**k-fold before
    # benching — the scale-up tool behind the 61k/247k/990k BASELINE rows
    # (suzannes: k=2 → 61,888, k=3 → 247,552, k=4 → 990,208 live tris).
    tess = int(os.environ.get("BENCH_TESS", "0"))
    if tess:
        from raytracingc_tpu.scene.builder import tessellate
        from raytracingc_tpu.scene.types import Scene

        tris, n_live = tessellate(
            scene.triangles, scene.n_triangles, levels=tess
        )
        scene = Scene.build(
            triangles=tris, spheres=scene.spheres, env=scene.env
        ).replace(
            n_triangles=n_live, n_spheres=scene.n_spheres
        ).with_accel()
        scene_path = f"{scene_path} ×{4 ** tess} ({n_live} tris)"

    cam = Camera.look_at()

    # Pin the scene + camera on the device once: a deployment keeps the scene
    # resident across frames, and with the TPU behind the axon tunnel a
    # re-upload of the numpy leaves (~0.5 MB incl. the accel) on every call
    # would bill network latency to the render. Static fields (n_triangles,
    # n_spheres) are pytree metadata and are untouched.
    scene = jax.device_put(scene)
    cam = jax.device_put(cam)

    mode = os.environ.get("BENCH_MODE", "render")
    if mode == "train":
        return _bench_train(scene, cam, scene_path, platform)

    shard = os.environ.get("BENCH_SHARD")
    mesh = None
    if shard:
        from raytracingc_tpu.parallel.sharded import (
            mesh_for_strategy,
            render_sharded,
        )

        try:
            mesh = mesh_for_strategy(shard, len(jax.devices()))
        except ValueError as e:
            raise SystemExit(f"BENCH_SHARD: {e}")

    def launch(sg, chunk):
        if mesh is not None:
            img, count = render_sharded(
                scene, cam, width, height, spp=spp, max_bounce=max_bounce,
                seed=0, backend=backend, mesh=mesh, sample_group=sg,
            )
        else:
            img, count = render(
                scene, cam, width, height, spp=spp, max_bounce=max_bounce,
                seed=0, backend=backend, pixel_chunk=chunk,
                compact=compact, sample_batch=sample_batch,
                sample_group=sg,
            )
        return img, count

    def run(sg, chunk):
        img, count = launch(sg, chunk)
        jax.block_until_ready(img)
        return float(count)

    # Unless BENCH_SAMPLE_GROUP / BENCH_CHUNK pin values, autotune over a
    # small (sample_group, pixel_chunk) grid: every point computes the same
    # per-lane arithmetic with the same association (results agree within
    # the repo-wide ~1-ulp fusion wobble; counts exactly), so this is pure
    # schedule selection — a deployment would pick the same way. Sample batching cuts per-bounce
    # launches ~g×, which can move the chunk optimum up from the g=1 64k
    # sweet spot, hence the 128k×auto point. Winners are reported in the
    # JSON; every candidate's rays/s goes to stderr as the A/B record.
    pinned_sg = "BENCH_SAMPLE_GROUP" in os.environ
    pinned_chunk = pixel_chunk is not None
    if sample_batch != 1:
        # sample_batch>1 takes trace_accumulate's widened-batch branch
        # before sample_group is ever consulted — autotuning it would just
        # re-measure identical programs.
        candidates = [(1, pixel_chunk)]
    elif pinned_sg and pinned_chunk:
        candidates = [(sample_group, pixel_chunk)]
    elif pinned_sg:
        candidates = [(sample_group, None)]
    elif pinned_chunk:
        candidates = [(1, pixel_chunk), ("auto", pixel_chunk)]
    else:
        # Two-point schedule autotune. The third (auto, 128k) candidate was
        # dropped in round 4: it never won an A/B and only burned compile
        # budget (BASELINE.md "sample_group settled").
        candidates = [(1, None), ("auto", None)]
    # Candidate budget: first-compiles through the TPU tunnel can take
    # minutes each; rather than risk a driver-side timeout killing the run
    # with NO JSON emitted, stop starting new candidates once the elapsed
    # autotune time passes the budget and report the best so far (skips are
    # logged to stderr). The first candidate always runs.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 900))
    t_start = time.time()
    best, compile_s = float("inf"), 0.0
    sample_group, pixel_chunk = candidates[0]
    for ci, (sg, chunk) in enumerate(candidates):
        if ci > 0 and time.time() - t_start > budget_s:
            print(f"# budget {budget_s:.0f}s exceeded: skipping candidates "
                  f"{candidates[ci:]}", file=sys.stderr)
            break
        t0 = time.time()
        count = run(sg, chunk)  # warmup + compile
        warm_s = time.time() - t0
        sg_best = float("inf")
        for _ in range(max(repeats, 1)):
            t0 = time.time()
            count = run(sg, chunk)
            sg_best = min(sg_best, time.time() - t0)
        if len(candidates) > 1:  # the A/B record behind the reported winner
            print(f"# sample_group={sg} chunk={chunk}: "
                  f"{count / sg_best:.4g} rays/s ({sg_best:.3f}s)",
                  file=sys.stderr)
        if sg_best < best:
            # compile_s keeps its historical meaning: the winner's own
            # warmup (compile + first run), not a sum over candidates.
            best, sample_group, pixel_chunk = sg_best, sg, chunk
            compile_s = warm_s

    blocked_rays_per_sec = count / best

    # Steady-state throughput: enqueue BENCH_STREAM frames back-to-back and
    # block once. JAX async dispatch pipelines them, hiding the per-call
    # host dispatch + tunnel round-trip (measured ~23 ms/call through the
    # axon relay — BASELINE.md "Round 4: the wall−device gap decomposed")
    # behind device compute — the number a deployment rendering a frame
    # stream actually sees. BENCH_STREAM=1 reverts to blocked-only.
    stream = int(os.environ.get("BENCH_STREAM", 4))
    stream_rays_per_sec = None
    if stream > 1:
        t0 = time.time()
        outs = [launch(sample_group, pixel_chunk)[0] for _ in range(stream)]
        jax.block_until_ready(outs)
        stream_rays_per_sec = count * stream / (time.time() - t0)
        print(f"# stream x{stream}: {stream_rays_per_sec:.4g} rays/s vs "
              f"blocked {blocked_rays_per_sec:.4g}", file=sys.stderr)

    # Roofline accounting (VERDICT r4 item 4): per-frame device busy/idle
    # from a 2-frame xprof trace window, plus the busy fraction of the
    # steady-state frame wall. BENCH_ROOFLINE=0 skips (the traced frames
    # are extra, so the timed numbers above are never perturbed).
    roofline = None
    if os.environ.get("BENCH_ROOFLINE", "1") != "0" and platform == "tpu":
        roofline = _roofline_profile(
            lambda: launch(sample_group, pixel_chunk), frames=2
        )

    rays_per_sec = max(blocked_rays_per_sec, stream_rays_per_sec or 0.0)
    # The metric label names the methodology of the number actually
    # reported: if the blocked leg won the max() (pipelining didn't help),
    # the label must not claim "steady-state" (review r4 finding).
    stream_won = (
        stream_rays_per_sec is not None
        and stream_rays_per_sec >= blocked_rays_per_sec
    )
    shard_tag = f" shard={shard}" if shard else ""
    result = {
        "metric": f"traced rays/s, {os.path.basename(scene_path)} "
        f"{width}x{height} spp={spp} b={max_bounce}{shard_tag} [{platform}]"
        + (f" steady-state x{stream}" if stream_won else ""),
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "blocked_rays_s": round(blocked_rays_per_sec, 1),
        "stream_frames": stream if stream_won else 1,
        # Provenance: the knobs behind the number, so it is self-describing.
        "repeats": repeats,
        "compile_s": round(compile_s, 2),
        "backend": backend,
        "mesh": dict(mesh.shape) if mesh is not None else None,
        # Direct-path knobs are nulled in shard mode — render_sharded takes
        # none of them, and the A/B record must not attribute a measurement
        # to a configuration that never ran.
        "pixel_chunk": pixel_chunk if mesh is None else None,
        "compact": compact if mesh is None else None,
        "sample_batch": sample_batch if mesh is None else None,
        "sample_group": sample_group,
        # "logical" = one intersection charged per sample per live lane, as
        # the C loop executes them (raytracing.c:270); the primary-hit cache
        # means bounce-0 searches physically run once per pixel, not per
        # sample (see BASELINE.md "Ray accounting").
        "ray_accounting": "logical",
    }
    if roofline is not None:
        frame_wall_ms = 1e3 * count / rays_per_sec
        result.update(roofline)
        # Busy fraction of the reported (steady-state) frame wall: the
        # pipeline-level utilization figure. <1 means tunnel/dispatch gaps;
        # a drop over rounds at equal rays/s means the device got faster
        # but the harness is eating it.
        result["device_busy_frac"] = round(
            roofline["device_busy_ms"] / frame_wall_ms, 3
        )
    print(json.dumps(result))
    print(
        f"# {count:.3g} rays in {best:.3f}s (compile+first run {compile_s:.1f}s), "
        f"{scene.n_triangles} triangles",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
