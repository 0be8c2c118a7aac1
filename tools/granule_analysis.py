"""Measure dead MT work inside set granule bits at streamed scale (r5 item 1).

The words-streamed kernel scans, per set granule bit, the whole
``granule``-block run and lets MT reject (``_search_kernel_streamed_words*``).
This script quantifies the headroom of an EXACT per-block second level: for
the 990k/247k bench's primary-ray chunks it reports

* scanned = sum over set granule bits of the run length (what the kernel
  MT-tests today),
* exact   = number of blocks whose OWN AABB passes the slab test (what an
  exact per-block walk would MT-test),
* their ratio (the MT-work reduction upper bound), and the active-column
  fraction per (program, tile) pair.

Primary rays only — secondary bounces are fewer (hit-front compaction) and
more scattered; treat the ratio as the primary-pass bound.

Usage: python tools/granule_analysis.py [levels]   (default 4 → 990k tris)
"""

import sys
import time

import jax
import jax.numpy as jnp

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.ops.intersect_pallas import (
    BITS_PER_WORD,
    STREAM_TILE,
    TRI_LANES,
    packet_block_masks,
    packet_tile_words,
)
from raytracingc_tpu.scene.builder import scene_from_obj, tessellate
from raytracingc_tpu.scene.types import Scene


def main() -> int:
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w, h = 1920, 1080
    chunk = 65536

    s0 = scene_from_obj("/root/reference/3Dmodels/suzannes.obj")
    tris, n = tessellate(s0.triangles, s0.n_triangles, levels=levels)
    sc = Scene.build(triangles=tris, spheres=s0.spheres, env=s0.env)
    sc = sc.replace(n_triangles=n, n_spheres=s0.n_spheres).with_accel()
    accel = jax.device_put(sc.accel)
    t = accel.triangles.a.shape[0]
    n_blocks = accel.aabb_lo.shape[0]
    tile = min(STREAM_TILE, t)
    bpt = tile // TRI_LANES
    n_tiles = -(-t // tile)
    granule = -(-bpt // BITS_PER_WORD)
    bits_per_tile = -(-bpt // granule)
    print(f"# tris={n} padded={t} blocks={n_blocks} tiles={n_tiles} "
          f"bpt={bpt} granule={granule} bits/tile={bits_per_tile}",
          flush=True)

    cam = Camera.look_at()
    o_all, d_all = primary_rays(cam, w, h)
    r = o_all.shape[0]

    from raytracingc_tpu.ops.intersect_pallas import _slab_any_hit

    granules = [g for g in (granule, 4, 3, 2, 1) if g <= granule]
    granules = sorted(set(granules), reverse=True)

    def scanned_for(o_p, d_p, a_p, g):
        """MT-scanned blocks under granule-g union-box words (g=1 == exact)."""
        inv_p = 1.0 / jnp.where(jnp.abs(d_p) < 1e-20, 1e-20, d_p)
        bits = -(-bpt // g)
        total = n_tiles * bits * g
        big = jnp.float32(3.0e38)
        lo = jnp.pad(accel.aabb_lo, ((0, total - n_blocks), (0, 0)),
                     constant_values=big).reshape(n_tiles * bits, g, 3)
        hi = jnp.pad(accel.aabb_hi, ((0, total - n_blocks), (0, 0)),
                     constant_values=-big).reshape(n_tiles * bits, g, 3)
        lo_g = lo.min(axis=1)
        hi_g = hi.max(axis=1)
        starts = (jnp.arange(n_tiles * bits, dtype=jnp.int32) % bits) * g
        run_len = jnp.minimum(starts + g, bpt) - starts  # (n_tiles*bits,)

        # Map over granule groups in slabs of 64 to bound memory (the
        # (C, 8, groups, 3) slab intermediate is ~6 GB unsliced at g=1).
        n_groups = n_tiles * bits
        slab = 64
        pad_g = -(-n_groups // slab) * slab - n_groups
        lo_g = jnp.pad(lo_g, ((0, pad_g), (0, 0)), constant_values=big)
        hi_g = jnp.pad(hi_g, ((0, pad_g), (0, 0)), constant_values=-big)
        rl = jnp.pad(run_len, (0, pad_g))

        def slab_fn(args):
            lo1, hi1, rl1 = args
            hit = _slab_any_hit(lo1, hi1, o_p, inv_p, a_p)  # (C, slab)
            return jnp.sum(hit * rl1[None, :])

        sums = jax.lax.map(
            slab_fn,
            (lo_g.reshape(-1, slab, 3), hi_g.reshape(-1, slab, 3),
             rl.reshape(-1, slab)),
        )
        return jnp.sum(sums)

    @jax.jit
    def stats(o, d):
        c = o.shape[0] // 8
        o_p = o.reshape(c, 8, 3)
        d_p = d.reshape(c, 8, 3)
        a_p = jnp.ones((c, 8), bool)
        words = packet_tile_words(o_p, d_p, a_p, accel, n_tiles, bpt,
                                  granule)  # (C, n_tiles)
        active_cols = jnp.sum(words != 0)
        pairs = words.shape[0] * words.shape[1]
        scans = [scanned_for(o_p, d_p, a_p, g) for g in granules]
        return scans, active_cols, pairs

    tot = [0] * len(granules)
    tot_a = tot_p = 0
    t0 = time.time()
    for i in range(0, r, chunk):
        scans, a, p = stats(o_all[i : i + chunk], d_all[i : i + chunk])
        for k, s in enumerate(scans):
            tot[k] += int(s)
        tot_a += int(a)
        tot_p += int(p)
    dt = time.time() - t0
    print(f"# {dt:.1f}s over {r // chunk} chunks", flush=True)
    exact = tot[granules.index(1)]
    for g, s in zip(granules, tot):
        bits = -(-bpt // g)
        w = -(-bits // 31)
        print(
            f"granule={g} words/(col,tile)={w} scanned={s} "
            f"vs_exact={s / max(exact, 1):.3f} "
            f"dead_frac={(s - exact) / max(s, 1):.3f}",
            flush=True,
        )
    print(f"active_col_frac={tot_a / max(tot_p, 1):.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
