"""Finite-difference verification of analytic scene gradients.

For a scalar loss ``L(params)``, the directional derivative along a probe
``v`` must satisfy ``(L(p + h v) - L(p - h v)) / 2h ≈ <grad L, v>``. The
rendering estimator is deterministic for a fixed seed (counter-based RNG), so
central differences are exact up to O(h²) — EXCEPT when the perturbation
flips a discrete decision (closest-hit argmin, hit/miss, backface cull,
Russian-roulette survival). Those events are correctly treated as locally
constant by the analytic gradient (visibility subgradients), so a finite
fraction of random probes near decision boundaries will disagree; the checker
therefore reports a PASS RATE over many probes, the metric tracked by
``BASELINE.json`` ("pixel-grad check pass rate").
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def fd_check(
    loss_fn: Callable[[Any], jax.Array],
    params: Any,
    *,
    leaves: list[str] | None = None,
    eps: float = 1e-3,
    rtol: float = 1e-2,
    atol: float = 1e-6,
    probes_per_leaf: int = 8,
    seed: int = 0,
) -> Mapping[str, Any]:
    """Check ``jax.grad(loss_fn)`` against central differences.

    ``leaves``: restrict to pytree leaves whose path string contains one of
    these substrings (e.g. ``["albedo", "emission"]``); ``None`` checks every
    floating-point leaf. Returns a dict with per-leaf results and an overall
    ``pass_rate``.
    """
    grad = jax.grad(loss_fn)(params)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    gflat = jax.tree_util.tree_leaves(grad)
    rng = np.random.default_rng(seed)
    loss_jit = jax.jit(loss_fn)

    results: dict[str, Any] = {}
    n_pass = 0
    n_total = 0
    for i, ((path, leaf), g) in enumerate(zip(flat, gflat)):
        name = jax.tree_util.keystr(path)
        if not jnp.issubdtype(leaf.dtype, jnp.floating):
            continue
        if leaves is not None and not any(s in name for s in leaves):
            continue
        leaf_pass, leaf_rows = 0, []
        for _ in range(probes_per_leaf):
            v = rng.standard_normal(leaf.shape).astype(np.float32)
            norm = np.linalg.norm(v)
            if norm > 0:
                v /= norm
            v = jnp.asarray(v)

            def shift(h):
                moved = [
                    leaf + h * v if j == i else other
                    for j, (_, other) in enumerate(flat)
                ]
                return jax.tree_util.tree_unflatten(treedef, moved)

            fd = (loss_jit(shift(+eps)) - loss_jit(shift(-eps))) / (2.0 * eps)
            an = jnp.sum(g * v)
            fd_f, an_f = float(fd), float(an)
            ok = abs(fd_f - an_f) <= atol + rtol * max(abs(fd_f), abs(an_f))
            leaf_pass += ok
            leaf_rows.append((fd_f, an_f, ok))
        results[name] = {
            "pass": leaf_pass,
            "total": probes_per_leaf,
            "probes": leaf_rows,
        }
        n_pass += leaf_pass
        n_total += probes_per_leaf
    results["pass_rate"] = n_pass / max(n_total, 1)
    return results


def pixel_grad_check(
    scene,
    camera,
    width: int = 16,
    height: int = 16,
    spp: int = 2,
    max_bounce: int = 3,
    seed: int = 0,
    leaves: list[str] | None = None,
    **kwargs,
) -> Mapping[str, Any]:
    """FD-check gradients of a rendered-image loss w.r.t. scene parameters.

    The loss is a fixed random projection of the linear radiance image (so
    every pixel contributes with a different weight and gradient cancellation
    can't mask errors). Default leaves: the smooth material/environment
    parameters; geometry (vertices/normals) only enters through visibility
    (discrete) and shading directions, so its probes sit closer to decision
    boundaries — include it explicitly via ``leaves=["triangles"]`` etc.
    """
    from raytracingc_tpu.camera import primary_rays
    from raytracingc_tpu.render.integrator import trace_accumulate

    if leaves is None:
        leaves = ["albedo", "emission", "smoothness", "env"]
    origins, dirs = primary_rays(camera, width, height)
    ray_ids = jnp.arange(width * height, dtype=jnp.uint32)
    w = jax.random.normal(jax.random.PRNGKey(seed), (width * height, 3))

    # The accel (int indices + geometry copy) is not a parameter — detach it
    # from the differentiated pytree and reattach inside the loss (same
    # pattern as diff.optimize).
    accel = getattr(scene, "accel", None)
    if accel is not None:
        scene = scene.replace(accel=None)

    def loss_fn(s):
        radiance, _ = trace_accumulate(
            origins, dirs, s.replace(accel=accel) if accel is not None else s,
            ray_ids, seed=seed, spp=spp, max_bounce=max_bounce,
        )
        return jnp.mean(radiance * w)

    return fd_check(loss_fn, scene, leaves=leaves, **kwargs)
