"""Prototype: union-walk brute kernel vs production bitmask kernel.

Per program, walk the UNION of the 128 packet bit-words (10.4 set blocks
on suzannes primaries vs 640 per-column trips) and run the brute kernel's
per-triangle scalar test over each union block's 128 triangles against the
whole (8, 128) ray plane. No extracts, no argmin, no per-column merges;
the scalar walk amortizes 128x.

Checks bit-identity vs the production path on alive lanes, then times both
by xprof device self-time on three workloads: leading frame slice, center
frame slice, compacted secondary front.
"""

import functools
import glob
import json
import sys
import tempfile

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracingc_tpu.camera import Camera, primary_rays
from raytracingc_tpu.ops import intersect_pallas as ip
from raytracingc_tpu.ops.intersect_pallas import (
    BITS_PER_WORD,
    COLS_PER_PROGRAM,
    RAY_SUBLANES,
    TRI_LANES,
    _BIG_I32,
    _DEBRUIJN,
    _DEBRUIJN_TABLE,
    packet_block_masks,
)
from raytracingc_tpu.scene.builder import scene_from_obj
from raytracingc_tpu.scene.types import EPSILON, MISS_DST

CALLS = 16


def _union_kernel(alive_ref, words_ref, deb_ref, tri_ref, oidx_ref,
                  rays_ref, dst_ref, idx_ref, *, n_words):
    cols = dst_ref.shape[1]
    shape = (RAY_SUBLANES, cols)
    dst_ref[:, :] = jnp.full(shape, MISS_DST, jnp.float32)
    idx_ref[:, :] = jnp.full(shape, -1, jnp.int32)
    pid = pl.program_id(0)

    @pl.when(alive_ref[pid] != 0)
    def _run():
        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]

        def one_triangle(g, best_d, best_i):
            b = 12 * g
            ax, ay, az = tri_ref[b + 0], tri_ref[b + 1], tri_ref[b + 2]
            abx, aby, abz = tri_ref[b + 3], tri_ref[b + 4], tri_ref[b + 5]
            acx, acy, acz = tri_ref[b + 6], tri_ref[b + 7], tri_ref[b + 8]
            nx, ny, nz = tri_ref[b + 9], tri_ref[b + 10], tri_ref[b + 11]
            oidx = oidx_ref[g]

            dn = dx * nx + dy * ny + dz * nz
            hx = dy * acz - dz * acy
            hy = dz * acx - dx * acz
            hz = dx * acy - dy * acx
            det = abx * hx + aby * hy + abz * hz
            degenerate = jnp.abs(det) < EPSILON
            inv_det = 1.0 / jnp.where(degenerate, 1.0, det)
            sx = ox - ax
            sy = oy - ay
            sz = oz - az
            u = (sx * hx + sy * hy + sz * hz) * inv_det
            qx = sy * abz - sz * aby
            qy = sz * abx - sx * abz
            qz = sx * aby - sy * abx
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            dst = (acx * qx + acy * qy + acz * qz) * inv_det
            valid = (
                (dn < 0.0)
                & ~degenerate
                & (u >= 0.0)
                & (u <= 1.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (dst >= EPSILON)
            )
            dst = jnp.where(valid, dst, MISS_DST)
            take = (dst < best_d) | ((dst == best_d) & (oidx < best_i))
            best_d = jnp.where(take, dst, best_d)
            best_i = jnp.where(take, oidx, best_i)
            return best_d, best_i

        best = (
            jnp.full(shape, MISS_DST, jnp.float32),
            jnp.full(shape, _BIG_I32, jnp.int32),
        )
        for w in range(n_words):
            m0 = words_ref[pid * n_words + w]
            base = w * BITS_PER_WORD

            def bit_body(carry, base=base):
                m, bd, bi = carry
                lsb = m & (-m)
                j = deb_ref[((lsb * jnp.int32(_DEBRUIJN)) >> 27) & 31]

                def tri_body(l, c):
                    return one_triangle((base + j) * TRI_LANES + l, *c)

                bd, bi = jax.lax.fori_loop(0, TRI_LANES, tri_body, (bd, bi))
                return (m & (m - 1), bd, bi)

            m, bd, bi = jax.lax.while_loop(
                lambda c: c[0] != 0, bit_body, (m0, *best))
            best = (bd, bi)
        best_d, best_i = best
        dst_ref[:, :] = best_d
        idx_ref[:, :] = jnp.where(best_d < MISS_DST, best_i, -1)


@functools.partial(jax.jit, static_argnames=("n_words",))
def _search_padded_union(alive_flags, words, tri_flat, oidx_flat,
                         rays_planes, n_words):
    n_cols = rays_planes.shape[2]
    grid = (n_cols // COLS_PER_PROGRAM,)
    kernel = functools.partial(_union_kernel, n_words=n_words)
    dst, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (G * n_words,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (32,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (12 * T,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # (T,)
            pl.BlockSpec((7, RAY_SUBLANES, COLS_PER_PROGRAM),
                         lambda g: (0, 0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_SUBLANES, COLS_PER_PROGRAM), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_SUBLANES, COLS_PER_PROGRAM), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((RAY_SUBLANES, n_cols), jnp.float32),
            jax.ShapeDtypeStruct((RAY_SUBLANES, n_cols), jnp.int32),
        ],
    )(alive_flags, words, jnp.asarray(_DEBRUIJN_TABLE, jnp.int32),
      tri_flat, oidx_flat, rays_planes)
    return dst, idx


def union_search(o, d, alive, accel, tri_flat, oidx_flat):
    """Full union path: plane prep + union words + kernel, ray-major out."""
    r = o.shape[0]
    rpp = RAY_SUBLANES * COLS_PER_PROGRAM
    r_padded = (r + rpp - 1) // rpp * rpp
    cols_padded = r_padded // RAY_SUBLANES
    n_programs = r_padded // rpp

    def to_planes(x):
        x = jnp.pad(x, ((0, r_padded - r), (0, 0)))
        return x.reshape(cols_padded, RAY_SUBLANES, 3).transpose(2, 1, 0)

    alive_f = alive.astype(jnp.float32).reshape(r, 1)
    alive_plane = to_planes(jnp.broadcast_to(alive_f, (r, 3)))[:1]
    rays_planes = jnp.concatenate(
        [to_planes(o), to_planes(d), alive_plane], axis=0)
    o_p = jnp.pad(o, ((0, r_padded - r), (0, 0))).reshape(cols_padded, 8, 3)
    d_p = jnp.pad(d, ((0, r_padded - r), (0, 0))).reshape(cols_padded, 8, 3)
    a_p = jnp.pad(alive_f[:, 0], (0, r_padded - r)).reshape(
        cols_padded, 8) > 0.0
    masks = packet_block_masks(o_p, d_p, a_p, accel)  # (C, n_words)
    n_words = masks.shape[1]
    words = jax.lax.reduce(
        masks.reshape(n_programs, COLS_PER_PROGRAM, n_words),
        jnp.int32(0), jax.lax.bitwise_or, (1,),
    )  # (G, n_words)
    alive_flags = jnp.max((words != 0).astype(jnp.int32), axis=1)
    dst, idx = _search_padded_union(
        alive_flags, words.reshape(-1), tri_flat, oidx_flat, rays_planes,
        n_words=n_words)
    dst = dst.T.reshape(r_padded)[:r]
    idx = idx.T.reshape(r_padded)[:r]
    dst = jnp.where(alive, dst, MISS_DST)
    idx = jnp.where(alive, idx, -1)
    return dst, idx


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


def main():
    scene = scene_from_obj("/root/reference/3Dmodels/suzannes.obj")
    tris = scene.triangles
    accel = scene.accel
    at = accel.triangles
    t = at.a.shape[0]
    # Permuted-order interleaved SMEM triangle table + orig idx.
    tri_flat = jnp.concatenate(
        [at.a, at.b - at.a, at.c - at.a, at.normal], axis=1).reshape(-1)
    oidx_flat = accel.orig_idx.astype(jnp.int32)
    print(f"T={t} SMEM tris = {12 * t * 4 / 1024:.0f} KiB", flush=True)

    cam = Camera.look_at()
    W, H = 1920, 1080
    o_all, d_all = primary_rays(cam, W, H)

    def prod(o, d, alive):
        dst, idx = ip.search_triangles_pallas(
            o, d, tris, accel=accel, alive=alive, n_live=scene.n_triangles)
        dst = jnp.where(alive, dst, MISS_DST)
        idx = jnp.where(alive, idx, -1)
        return dst, idx

    n = 262144
    workloads = {}
    workloads["front"] = (o_all[:n], d_all[:n], jnp.ones((n,), bool))
    mid = 500 * W
    workloads["center"] = (o_all[mid:mid + n], d_all[mid:mid + n],
                           jnp.ones((n,), bool))

    # Compacted secondary front from the whole frame's primary hits.
    dsts, idxs = [], []
    for i in range(0, o_all.shape[0], n):
        dd, ii = prod(o_all[i:i + n], d_all[i:i + n],
                      jnp.ones((min(n, o_all.shape[0] - i),), bool))
        dsts.append(dd)
        idxs.append(ii)
    dst_f = jnp.concatenate(dsts)
    idx_f = jnp.concatenate(idxs)
    hit = idx_f >= 0
    n_hit = int(jnp.sum(hit))
    print(f"frame hits: {n_hit} / {o_all.shape[0]}", flush=True)
    order = jnp.argsort(~hit, stable=True)  # hits packed to the front
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (o_all.shape[0], 3))
    v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    o2 = (o_all + dst_f[:, None] * d_all)[order][:n]
    d2 = v[order][:n]
    a2 = hit[order][:n]
    workloads["secondary"] = (o2, d2, a2)

    for wname, (wo, wd, wa) in workloads.items():
        d_p, i_p = prod(wo, wd, wa)
        d_u, i_u = union_search(wo, wd, wa, accel, tri_flat, oidx_flat)
        same_d = bool(jnp.all(d_p == d_u))
        same_i = bool(jnp.all(i_p == i_u))
        print(f"== {wname}: bitwise dst={same_d} idx={same_i}", flush=True)
        if not (same_d and same_i):
            bad = jnp.where(d_p != d_u)[0]
            print("  first dst mismatches:", bad[:5],
                  d_p[bad[:5]], d_u[bad[:5]], flush=True)
            badi = jnp.where(i_p != i_u)[0]
            print("  first idx mismatches:", badi[:5],
                  i_p[badi[:5]], i_u[badi[:5]], flush=True)
        ms_p = device_ms(prod, (wo, wd, wa))
        ms_u = device_ms(
            functools.partial(union_search, accel=accel, tri_flat=tri_flat,
                              oidx_flat=oidx_flat), (wo, wd, wa))
        print(f"  production {ms_p:8.3f} ms  union {ms_u:8.3f} ms  "
              f"ratio {ms_p / ms_u:5.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
