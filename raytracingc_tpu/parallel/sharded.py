"""Sharded rendering and sharded differentiable training steps.

This is the TPU-native form of the reference's parallel executor
(``rowThread`` + pthread spawn/join, ``main.c:81-105,284-303``):

* The pixel axis is sharded over the mesh's ``px`` dimension (the row-cyclic
  analog — disjoint output tiles, zero communication while tracing).
* The sample axis (the reference's sequential 4000-iteration accumulation,
  ``main.c:98-99``) optionally shards over the ``spp`` mesh dimension; the
  per-device sample means are ``pmean``-combined over ICI.
* Scene buffers are replicated (suzannes' 3,868 triangles ≈ 170 KB f32 SoA —
  trivially replicable; block-sharding + all-gather is a future lever for
  scenes beyond VMEM scale).
* For training, per-shard scene gradients are ``pmean``-reduced over both mesh
  axes inside the step, so the optimizer update is identical on every device —
  pure data parallelism over rays/samples with replicated parameters.

Everything is ``shard_map`` over an explicit ``Mesh``: collectives are
spelled out (``pmean``/``psum``), shardings are named, and the Pallas search
kernel runs per-shard without SPMD partitioning hazards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    from jax import shard_map  # type: ignore[attr-defined]
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.parallel.mesh import make_mesh
from raytracingc_tpu.render.integrator import trace_accumulate
from raytracingc_tpu.scene.types import Scene


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pad_rays(origins, dirs, ray_ids, multiple: int):
    """Pad the ray arrays to a shardable multiple; padding lanes are masked."""
    n = origins.shape[0]
    padded = _round_up(n, multiple)
    active = jnp.arange(padded, dtype=jnp.int32) < n
    if padded == n:
        return origins, dirs, ray_ids, active, n
    pad = padded - n
    origins = jnp.pad(origins, ((0, pad), (0, 0)))
    dirs = jnp.pad(dirs, ((0, pad), (0, 0)))
    dirs = dirs.at[n:, 2].set(1.0)
    ray_ids = jnp.pad(ray_ids, (0, pad))
    return origins, dirs, ray_ids, active, n


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "spp", "max_bounce", "backend", "mesh", "seed",
        "early_exit", "compact", "sample_group"
    ),
)
def _render_sharded_jit(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    seed: int,
    backend: str,
    mesh: Mesh,
    early_exit: bool = True,
    sample_offset: jax.Array | int = 0,
    compact: bool = True,
    sample_group: int | str = 1,
):
    px_size = mesh.shape["px"]
    spp_size = mesh.shape["spp"]
    assert spp % spp_size == 0, f"spp={spp} not divisible by mesh spp={spp_size}"
    spp_per = spp // spp_size
    base_offset = jnp.asarray(sample_offset, jnp.uint32)

    origins, dirs = primary_rays(camera, width, height)
    ray_ids = jnp.arange(width * height, dtype=jnp.uint32)
    origins, dirs, ray_ids, active, n_pix = _pad_rays(
        origins, dirs, ray_ids, px_size
    )

    def shard_fn(scene, o, d, ids, act):
        offset = base_offset + jax.lax.axis_index("spp").astype(
            jnp.uint32
        ) * jnp.uint32(spp_per)
        radiance, count = trace_accumulate(
            o,
            d,
            scene,
            ids,
            seed=seed,
            spp=spp_per,
            max_bounce=max_bounce,
            backend=backend,
            sample_offset=offset,
            active=act,
            early_exit=early_exit,
            compact=compact,
            sample_group=sample_group,
        )
        # Combine the sample-axis partial means; total traced-ray count over
        # the whole mesh (for honest rays/s accounting).
        radiance = jax.lax.pmean(radiance, "spp")
        count = jax.lax.psum(count, ("px", "spp"))
        return radiance, count

    radiance, count = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("px"), P("px"), P("px"), P("px")),
        out_specs=(P("px"), P()),
        check_vma=False,
    )(scene, origins, dirs, ray_ids, active)

    image = radiance[:n_pix].reshape(height, width, 3)
    return image, count


def strategy_spp_dim(strategy: str, n_devices: int) -> int:
    """The spp mesh dimension a strategy resolves to on ``n_devices``.

    The SINGLE source of truth for the strategy → mesh-shape mapping —
    ``render_sharded``, ``render_progressive``'s up-front batch validation,
    and ``bench.py``'s BENCH_SHARD all consult it, so the divisibility
    predictions can never drift from the mesh actually built.
    """
    if strategy == "pixels":
        return 1
    if strategy == "samples":
        return n_devices
    if strategy == "both":
        return 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    raise ValueError(f"unknown strategy {strategy!r}")


def mesh_for_strategy(strategy: str, n_devices: int) -> Mesh:
    """Build the (px, spp) mesh a strategy implies (see strategy_spp_dim)."""
    spp_dim = strategy_spp_dim(strategy, n_devices)
    return make_mesh(px=n_devices // spp_dim, spp=spp_dim)


def render_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    spp: int,
    max_bounce: int,
    seed: int = 0,
    backend: str = "auto",
    strategy: str = "pixels",
    mesh: Mesh | None = None,
    early_exit: bool = True,
    sample_offset: jax.Array | int = 0,
    compact: bool = True,
    sample_group: int | str = 1,
):
    """Render across all devices. Returns ``(image [H, W, 3], rays_traced)``.

    ``strategy``: ``"pixels"`` shards the image plane (best for big images),
    ``"samples"`` shards the spp axis (best for small images at high spp),
    ``"both"`` splits devices across the two axes. An explicit ``mesh``
    overrides the strategy.

    ``sample_offset`` shifts every device's sample-id range — the hook for
    progressive/checkpointed accumulation on top of sharded rendering.
    """
    if mesh is None:
        mesh = mesh_for_strategy(strategy, len(jax.devices()))
    return _render_sharded_jit(
        scene, camera, width, height, spp, max_bounce, seed, backend, mesh,
        early_exit, sample_offset, compact, sample_group,
    )


# -----------------------------------------------------------------------------
# Sharded differentiable training: inverse rendering over a device mesh.
# -----------------------------------------------------------------------------


def make_train_step(
    mesh: Mesh,
    optimizer,
    spp: int,
    max_bounce: int,
    backend: str = "auto",
    seed: int = 0,
    param_filter=None,
    geometry_trainable: bool = True,
):
    """Build a jitted SPMD training step for inverse rendering.

    The step renders the scene from fixed primary rays, takes an L2 loss
    against a target radiance image, differentiates w.r.t. every scene leaf
    (vertex positions, normals, materials, environment), ``pmean``s the
    gradients over the whole mesh, and applies an ``optax`` update — the
    canonical replicated-parameter / sharded-data layout.

    ``param_filter(path_leaf_grads) -> grads`` may zero out leaves that should
    stay frozen (e.g. train albedo only). Returns
    ``step(scene, opt_state, origins, dirs, ray_ids, target) ->
    (scene, opt_state, loss)``; inputs sharded over ``px``, scene/opt_state
    replicated.

    The scene's ``accel`` (int indices + a geometry copy) is detached from
    differentiation internally; initialize ``opt_state`` with
    ``optimizer.init(scene.replace(accel=None))``. With the default
    ``geometry_trainable=True`` the forward pass inside the loss runs
    accel-free (live triangles): the accel's frozen geometry copy would go
    stale after the first vertex update and the Pallas search would intersect
    old geometry while resolve shades the new. Pass
    ``geometry_trainable=False`` for material/env-only training to keep the
    (then-valid) accel inside the loss.
    """
    spp_size = mesh.shape["spp"]
    assert spp % spp_size == 0, f"spp={spp} not divisible by mesh spp={spp_size}"
    spp_per = spp // spp_size

    def shard_step(scene, opt_state, origins, dirs, ray_ids, target):
        offset = jax.lax.axis_index("spp").astype(jnp.uint32) * jnp.uint32(spp_per)
        accel = scene.accel
        loss_accel = None if geometry_trainable else accel
        scene = scene.replace(accel=None)

        def loss_fn(s):
            radiance, _ = trace_accumulate(
                origins,
                dirs,
                s.replace(accel=loss_accel),
                ray_ids,
                seed=seed,
                spp=spp_per,
                max_bounce=max_bounce,
                backend=backend,
                sample_offset=offset,
            )
            radiance = jax.lax.pmean(radiance, "spp")
            return jnp.mean((radiance - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(scene)
        loss = jax.lax.pmean(loss, ("px", "spp"))
        grads = jax.lax.pmean(grads, ("px", "spp"))
        if param_filter is not None:
            grads = param_filter(grads)
        updates, opt_state = optimizer.update(grads, opt_state, scene)
        scene = jax.tree_util.tree_map(lambda p, u: p + u, scene, updates)
        # A stale accel must not ride along with updated geometry; the caller
        # rebuilds once training ends (``Scene.with_accel``).
        return scene.replace(accel=loss_accel), opt_state, loss

    sharded = shard_map(
        shard_step,
        mesh=mesh,
        in_specs=(P(), P(), P("px"), P("px"), P("px"), P("px")),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
