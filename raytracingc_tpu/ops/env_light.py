"""Procedural sky/sun environment light.

Reference ``getEnvironmentLight`` (``raytracing.c:151-160``), y-DOWN world:

* ``skyGradientT = smoothstep(0, 0.74, -dir.y) ** 0.35``
* ``skyGradient = lerp(sky_horizon, sky_zenith, skyGradientT)``
* ``sun = max(0, dot(dir, sun_direction)) ** sun_focus * sun_intensity``,
  masked to rays pointing up (``dir.y < 0`` because y points down)
* ``groundToSkyT = smoothstep(-0.01, 0, -dir.y)``
* result = ``lerp(ground, skyGradient, groundToSkyT) + sun * mask``

Fully differentiable w.r.t. all ``EnvParams`` leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raytracingc_tpu.scene.types import EnvParams


def smoothstep(lo: float, hi: float, x: jax.Array) -> jax.Array:
    """Hermite smoothstep with clamped input (``moremath.c:49-53``)."""
    t = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _safe_pow(x: jax.Array, p) -> jax.Array:
    """``x ** p`` for ``x >= 0`` with well-defined gradients at ``x == 0``.

    ``powf(0, p)`` is 0 in the forward pass, but autodiff of ``x**p`` at 0
    yields inf/NaN cotangents (w.r.t. x for p<1, w.r.t. p always). The
    double-where trick pins both to zero without changing the forward value.
    """
    pos = x > 0
    safe = jnp.where(pos, x, 1.0)
    return jnp.where(pos, safe**p, 0.0)


def environment_light(dirs: jax.Array, env: EnvParams) -> jax.Array:
    """Environment radiance for ray directions ``dirs [..., 3]`` → ``[..., 3]``."""
    up = -dirs[..., 1]  # "how much the ray points toward the sky" (y-down)
    sky_t = _safe_pow(smoothstep(0.0, 0.74, up), jnp.float32(0.35))
    sky = (1.0 - sky_t[..., None]) * env.sky_horizon + sky_t[..., None] * env.sky_zenith
    cos_sun = jnp.maximum(0.0, jnp.sum(dirs * env.sun_direction, axis=-1))
    sun = _safe_pow(cos_sun, env.sun_focus) * env.sun_intensity
    sun = jnp.where(dirs[..., 1] < 0, sun, 0.0)
    ground_t = smoothstep(-0.01, 0.0, up)[..., None]
    return (1.0 - ground_t) * env.ground + ground_t * sky + sun[..., None]
