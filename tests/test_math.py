"""Math/camera/env/RNG/tonemap unit tests against hand-computed values."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracingc_tpu import rng
from raytracingc_tpu.camera import Camera, look_at_basis, primary_rays
from raytracingc_tpu.ops.env_light import environment_light, smoothstep
from raytracingc_tpu.render.image import (
    read_bmp,
    tonemap_to_bytes,
    write_bmp,
    write_png,
)
from raytracingc_tpu.scene.types import EnvParams


def _np_smoothstep(lo, hi, x):
    t = np.clip((x - lo) / (hi - lo), 0.0, 1.0)
    return t * t * (3 - 2 * t)


def test_smoothstep():
    xs = np.linspace(-1, 2, 23, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(smoothstep(0.0, 0.74, jnp.asarray(xs))),
        _np_smoothstep(0.0, 0.74, xs),
        rtol=1e-6,
    )


def test_camera_basis_defaults():
    """Basis for the default pose, cross-checked with numpy float64."""
    origin = np.array([-4.75, -1.5, -4.75])
    target = np.array([0.9, -1.2, 1.0])
    ez = (target - origin) / np.linalg.norm(target - origin)
    up = np.array([0.0, -1.0, 0.0])
    ex = np.cross(ez, up)
    ex /= np.linalg.norm(ex)
    ey = np.cross(ez, ex)
    ey /= np.linalg.norm(ey)
    gx, gy, gz = look_at_basis(jnp.asarray(origin, jnp.float32),
                               jnp.asarray(target, jnp.float32))
    np.testing.assert_allclose(np.asarray(gx), ex, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), ey, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gz), ez, atol=1e-6)


def test_primary_rays_layout():
    """Pixel (x, y) maps to dx=(x-W//2)/(H//2), dy=(y-H//2)/(H//2), row-major."""
    cam = Camera.look_at(origin=(0, 0, 0), target=(0, 0, 1), fov=1.0)
    w, h = 6, 4
    origins, dirs = primary_rays(cam, w, h)
    assert dirs.shape == (w * h, 3)
    np.testing.assert_allclose(np.asarray(origins[0]), [0, 0, 0])
    # For this pose: ez=+z, up=(0,-1,0) ⇒ ex=cross(ez,up)=(1,0,0)... verify a
    # couple of pixels against the formula directly.
    ex, ey, ez = (np.asarray(cam.ex), np.asarray(cam.ey), np.asarray(cam.ez))
    for (x, y) in [(0, 0), (5, 3), (3, 2)]:
        dx = (x - w // 2) / (h // 2)
        dy = (y - h // 2) / (h // 2)
        d = dx * ex + dy * ey + 1.0 * ez
        d = d / np.linalg.norm(d)
        got = np.asarray(dirs[y * w + x])
        np.testing.assert_allclose(got, d, atol=1e-6)


def test_env_light_values():
    """Closed-form checks of the sky model (``raytracing.c:151-160``)."""
    env = EnvParams.default()

    # Straight down (+y in this y-down world): ground side. up = -dir.y = -1
    # ⇒ skyT=0, groundT=0 ⇒ pure ground color; sun masked (dir.y > 0).
    d = jnp.array([[0.0, 1.0, 0.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(environment_light(d, env)[0]), [0.66, 0.66, 0.66], atol=1e-6
    )

    # Straight up (-y): up=1 ⇒ skyT=1^0.35=1 ⇒ zenith; groundT=1; plus sun term.
    d = jnp.array([[0.0, -1.0, 0.0]], jnp.float32)
    sun_dir = np.asarray(env.sun_direction)
    sun = max(0.0, float(np.dot([0, -1, 0], sun_dir))) ** 22.0 * 0.75
    expected = np.array([0.263, 0.969, 0.871]) + sun
    np.testing.assert_allclose(
        np.asarray(environment_light(d, env)[0]), expected, atol=1e-5
    )

    # Horizontal ray: up=0 ⇒ skyT=0 ⇒ horizon; groundT=smoothstep(-0.01,0,0)=1.
    d = jnp.array([[1.0, 0.0, 0.0]], jnp.float32)
    out = np.asarray(environment_light(d, env)[0])
    np.testing.assert_allclose(out, [1.0, 1.0, 1.0], atol=1e-5)


def test_env_light_grad_finite():
    """No NaN/inf gradients at the pow(0, p) corner cases."""
    env = EnvParams.default()
    dirs = jnp.array(
        [[0.0, 1.0, 0.0], [0.0, -1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32
    )

    def loss(env, dirs):
        return jnp.sum(environment_light(dirs, env))

    g_env, g_dirs = jax.grad(loss, argnums=(0, 1))(env, dirs)
    for leaf in jax.tree.leaves((g_env, g_dirs)):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_rng_matches_c_generator():
    """The per-stream generator reproduces the C stream bit-exactly.

    C reference (``moremath.c:89-95``): from state s, one draw is
    s' = s*747796405+2891336453; r = ((s' >> ((s' >> 28)+4)) ^ s') * 277803737;
    r = (r >> 22) ^ r; value = r / 4294967295.
    """

    def c_stream(state, n):
        out = []
        for _ in range(n):
            state = (state * 747796405 + 2891336453) & 0xFFFFFFFF
            r = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
            r = (r >> 22) ^ r
            out.append(r / 4294967295.0)
        return out

    for seed_state in [0, 1, 12345, 0xDEADBEEF]:
        state = jnp.asarray([seed_state], jnp.uint32)
        got = []
        for _ in range(8):
            state, u = rng.next_uniform(state)
            got.append(float(u[0]))
        np.testing.assert_allclose(got, c_stream(seed_state, 8), rtol=1e-6)


def test_rng_uniformity_and_independence():
    ids = jnp.arange(4096, dtype=jnp.uint32)
    state = rng.stream_init(0, ids, 0)
    state, u = rng.next_uniform(state)
    u = np.asarray(u)
    assert 0.47 < u.mean() < 0.53
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.05
    # Different sample ids give different streams.
    state2 = rng.stream_init(0, ids, 1)
    _, u2 = rng.next_uniform(state2)
    assert not np.allclose(np.asarray(u2), u)


def test_unit_vectors():
    ids = jnp.arange(2048, dtype=jnp.uint32)
    state = rng.stream_init(7, ids, 0)
    _, v = rng.next_unit_vector(state)
    v = np.asarray(v)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    # Uniform on the sphere: component means near 0.
    assert np.abs(v.mean(axis=0)).max() < 0.06


def test_tonemap():
    """floatToUint semantics (``moremath.c:25-30``): clamp, truncate, no gamma."""
    f = np.array([[[-0.5, 0.0, 0.999], [1.0, 2.0, 0.5]]], np.float32)
    out = tonemap_to_bytes(f)
    assert out.tolist() == [[[0, 0, 254], [255, 255, 127]]]


def test_bmp_roundtrip(tmp_path):
    img = (np.arange(5 * 3 * 3).reshape(5, 3, 3) * 7 % 256).astype(np.uint8)
    path = str(tmp_path / "t.bmp")
    write_bmp(path, img)
    back = read_bmp(path)
    np.testing.assert_array_equal(back, img)


def test_png_writes(tmp_path):
    img = np.zeros((4, 4, 3), np.uint8)
    img[1, 2] = [255, 128, 0]
    path = str(tmp_path / "t.png")
    write_png(path, img)
    data = open(path, "rb").read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n" and b"IEND" in data


def test_png_roundtrip(tmp_path):
    """read_png inverts write_png exactly (PARITY C17's image-IO story:
    the reference only writes, via stb; we round-trip both formats)."""
    from raytracingc_tpu.render.image import read_png

    img = (np.arange(7 * 5 * 3).reshape(7, 5, 3) * 11 % 256).astype(np.uint8)
    path = str(tmp_path / "rt.png")
    write_png(path, img)
    np.testing.assert_array_equal(read_png(path), img)


def test_png_reader_all_filters(tmp_path):
    """Decode every scanline filter type (0/1/2/3/4), not just our
    writer's filter-0: hand-encode a 3x3 PNG per filter and compare to a
    filter-0 encoding of the same pixels."""
    import struct as st
    import zlib

    from raytracingc_tpu.render.image import read_png

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (3, 3, 3), dtype=np.uint8).astype(np.int32)
    h, w = 3, 3
    stride = w * 3

    def encode(filter_rows):
        raw = b""
        prev = np.zeros(stride, np.int32)
        for y, f in enumerate(filter_rows):
            cur = img[y].reshape(-1)
            if f == 0:
                enc = cur
            elif f == 1:  # Sub
                left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                enc = (cur - left) & 0xFF
            elif f == 2:  # Up
                enc = (cur - prev) & 0xFF
            elif f == 3:  # Average
                left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            else:  # Paeth
                left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
                ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
                p = left + prev - ul
                pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = (cur - pred) & 0xFF
            raw += bytes([f]) + bytes(enc.astype(np.uint8))
            prev = cur
        def chunk(tag, payload):
            return (st.pack(">I", len(payload)) + tag + payload
                    + st.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))
        ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    for combo in ([0, 1, 2], [3, 4, 1], [4, 4, 4]):
        path = str(tmp_path / f"f{''.join(map(str, combo))}.png")
        open(path, "wb").write(encode(combo))
        np.testing.assert_array_equal(
            read_png(path), img.astype(np.uint8), err_msg=str(combo)
        )
