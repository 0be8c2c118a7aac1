"""Counter-based RNG for massively parallel path tracing.

The reference uses Sebastian Lague's 32-bit hash RNG (``moremath.c:89-114``)
with ONE effectively-global, racily-shared state word: its per-pixel seeding is
dead code because ``scene.h`` declares ``rngState`` as a per-translation-unit
``static`` (see SURVEY.md §1). Bitwise replication of that stream is neither
possible nor desirable on an SPMD machine.

Instead we keep the reference's *generator* — the same LCG advance and
xorshift-multiply output mix, so marginal distributions match — but give every
(pixel, sample) lane its own independent stream, derived from a
(seed, ray_id, sample_id) counter via a splitmix-style hash. Streams advance
exactly like the C generator advances within one sample: 6 draws for the
random unit vector + 1 draw for Russian roulette per bounce
(``raytracing.c:274-287``). Everything is stateless uint32 vector arithmetic —
no threefry tables, VPU-friendly, deterministic across devices and shardings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Lague LCG/mix constants (``moremath.c:91-93``). NumPy (not jnp) scalars:
# module-level jnp constants would initialize the XLA backend at import time,
# which breaks ``jax.distributed.initialize`` for multi-host users (it must
# run before any backend creation). Dtype semantics are identical.
_LCG_MUL = np.uint32(747796405)
_LCG_INC = np.uint32(2891336453)
_MIX_MUL = np.uint32(277803737)
_INV_U32_MAX = np.float32(1.0 / 4294967295.0)

# splitmix32 constants for stream derivation (public-domain construction).
_SM_GAMMA = np.uint32(0x9E3779B9)
_SM_M1 = np.uint32(0x85EBCA6B)
_SM_M2 = np.uint32(0xC2B2AE35)

TWO_PI = 6.2831853071795864769


def _advance(state: jax.Array) -> jax.Array:
    return state * _LCG_MUL + _LCG_INC


def _output_mix(state: jax.Array) -> jax.Array:
    r = ((state >> ((state >> jnp.uint32(28)) + jnp.uint32(4))) ^ state) * _MIX_MUL
    return (r >> jnp.uint32(22)) ^ r


def next_uniform(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Advance the stream and return (new_state, U[0,1] float32).

    Matches ``RandomValue`` (``moremath.c:89-95``): advance LCG, apply the
    variable-shift xorshift-multiply mix, divide by 2^32-1.
    """
    state = _advance(state)
    r = _output_mix(state)
    return state, r.astype(jnp.float32) * _INV_U32_MAX


def _splitmix(x: jax.Array) -> jax.Array:
    x = (x ^ (x >> jnp.uint32(16))) * _SM_M1
    x = (x ^ (x >> jnp.uint32(13))) * _SM_M2
    return x ^ (x >> jnp.uint32(16))


def stream_init(seed, ray_id: jax.Array, sample_id) -> jax.Array:
    """Derive an independent uint32 stream state per (seed, ray, sample)."""
    seed = jnp.uint32(seed)
    ray_id = ray_id.astype(jnp.uint32)
    sample_id = jnp.asarray(sample_id, jnp.uint32)
    s = _splitmix(seed + _SM_GAMMA)
    s = _splitmix(s ^ (ray_id * jnp.uint32(0x68BC21EB) + _SM_GAMMA))
    s = _splitmix(s ^ (sample_id * jnp.uint32(0x2C1B3C6D) + _SM_GAMMA))
    return s


def next_normal(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """One standard normal via Box–Muller, consuming two uniforms.

    Matches ``RandomValueNormalDistrubtion`` (``moremath.c:97-102``):
    ``theta = 2*pi*u1; rho = sqrt(-2*ln(u2)); return rho*cos(theta)``. We clamp
    ``u2`` away from 0 (the C code can produce ``log(0) = -inf``; with masked
    SPMD lanes that would poison NaN-propagation, so the clamp is deliberate).
    """
    state, u1 = next_uniform(state)
    state, u2 = next_uniform(state)
    u2 = jnp.maximum(u2, jnp.float32(1e-10))
    z = jnp.sqrt(-2.0 * jnp.log(u2)) * jnp.cos(TWO_PI * u1)
    return state, z


def next_unit_vector(state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Uniform random unit vector: normalize 3 i.i.d. normals.

    Matches ``RandomDiretion`` (``moremath.c:104-108``), consuming six
    uniforms in the same order as the C call sequence.
    """
    state, x = next_normal(state)
    state, y = next_normal(state)
    state, z = next_normal(state)
    v = jnp.stack([x, y, z], axis=-1)
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = v / jnp.maximum(norm, jnp.float32(1e-12))
    return state, v


def next_hemisphere_vector(state: jax.Array, normal: jax.Array):
    """Random direction in the hemisphere around ``normal``.

    Matches ``RandomHemisphereDirection`` (``moremath.c:110-114``): sign-flip a
    uniform sphere direction against the normal. (The integrator itself uses
    ``normalize(normal + unit)`` cosine sampling instead, as the C one does.)
    """
    state, v = next_unit_vector(state)
    sign = jnp.where(jnp.sum(v * normal, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    return state, v * sign
