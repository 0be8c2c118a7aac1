"""Empirically probe the Mosaic SMEM array-size ceiling on this TPU.

The streamed-words kernels bound rays/call so (r/8) * n_tiles SMEM words stay
under a 65,536-word budget sized by round-2 folklore, not measurement. An
exact per-block culling level needs ~4-5x the words; this probe finds the
real ceiling so the budget can be set from data.

Usage: python tools/smem_probe.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sm_ref, x_ref, o_ref, *, n):
    # Touch scattered SMEM entries so the array can't be elided.
    pid = pl.program_id(0)
    s = sm_ref[pid] + sm_ref[n - 1 - pid] + sm_ref[n // 2]
    o_ref[:, :] = x_ref[:, :] + s.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n",))
def probe(words, x, n):
    return pl.pallas_call(
        functools.partial(_kernel, n=n),
        grid=(x.shape[0] // 8,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(words, x)


def main() -> int:
    x = jnp.ones((64, 128), jnp.float32)
    for n in (147456, 163840, 180224, 196608, 212992, 229376, 245760):
        words = jnp.arange(n, dtype=jnp.int32)
        try:
            out = probe(words, x, n)
            jax.block_until_ready(out)
            print(f"SMEM {n} i32 words ({n * 4 // 1024} KiB): OK", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:200]
            print(f"SMEM {n} i32 words ({n * 4 // 1024} KiB): FAIL {msg}",
                  flush=True)
            break
    return 0


if __name__ == "__main__":
    sys.exit(main())
