"""Intersection tests against closed-form expectations."""

import numpy as np
import jax.numpy as jnp

from tinypathtracer_tpu.ops import intersect


def _tri(v0, v1, v2):
    return jnp.asarray(np.stack([v0, v1, v2])[None], dtype=jnp.float32)  # [1,3,3]


def test_ray_triangle_basic():
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    v0, v1, v2 = [np.array(p, np.float32) for p in
                  ([-1, -1, 0], [2, -1, 0], [-1, 2, 0])]
    t, u, v, ok = intersect.ray_triangle(o, d, *(jnp.asarray(x)[None] for x in (v0, v1, v2)))
    assert bool(ok[0, 0])
    assert abs(float(t[0, 0]) - 1.0) < 1e-6
    # barycentrics at origin-projected point (0,0): u = v = 1/3
    assert abs(float(u[0, 0]) - 1 / 3) < 1e-6
    assert abs(float(v[0, 0]) - 1 / 3) < 1e-6


def test_ray_triangle_no_backface_cull():
    # Hitting from behind must still count (reference has no culling)
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tri = _tri([-1, -1, 0], [2, -1, 0], [-1, 2, 0])
    fid, t, uv = intersect.closest_hit_bruteforce(o, d, tri)
    assert int(fid[0]) == 0
    assert abs(float(t[0]) - 1.0) < 1e-6


def test_ray_triangle_miss():
    o = jnp.array([[5.0, 5.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    tri = _tri([-1, -1, 0], [1, -1, 0], [0, 1, 0])
    fid, t, uv = intersect.closest_hit_bruteforce(o, d, tri)
    assert int(fid[0]) == -1


def test_closest_of_two():
    o = jnp.array([[0.0, 0.0, 3.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    near = np.stack([[-1, -1, 1], [2, -1, 1], [-1, 2, 1]]).astype(np.float32)
    far = np.stack([[-1, -1, 0], [2, -1, 0], [-1, 2, 0]]).astype(np.float32)
    tris = jnp.asarray(np.stack([far, near]))  # far first: argmin must pick idx 1
    fid, t, uv = intersect.closest_hit_bruteforce(o, d, tris)
    assert int(fid[0]) == 1
    assert abs(float(t[0]) - 2.0) < 1e-6


def test_delta_epsilon_rejects_self_hit():
    # A hit at t < DELTA (2e-4) must be ignored (path_tracer.cu:83)
    o = jnp.array([[0.0, 0.0, 1e-5]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    tri = _tri([-1, -1, 0], [2, -1, 0], [-1, 2, 0])
    fid, _, _ = intersect.closest_hit_bruteforce(o, d, tri)
    assert int(fid[0]) == -1


def test_chunking_consistency():
    # Many triangles across chunk boundaries give the same result as one chunk
    rng = np.random.default_rng(0)
    tris = rng.normal(size=(1000, 3, 3)).astype(np.float32)
    o = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32)) * 3.0
    d_raw = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d_raw / np.linalg.norm(d_raw, axis=-1, keepdims=True))
    tv = jnp.asarray(tris)
    f1, t1, uv1 = intersect.closest_hit_bruteforce(o, d, tv, chunk=128)
    f2, t2, uv2 = intersect.closest_hit_bruteforce(o, d, tv, chunk=1024)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    hit = np.asarray(f1) >= 0
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-6)


def test_ray_aabb():
    o = jnp.array([[0.0, 0.0, 5.0], [3.0, 0.0, 5.0]])
    inv = 1.0 / jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    bmin = jnp.array([[-1.0, -1.0, -1.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    hit = intersect.ray_aabb(o, inv, bmin, bmax)
    assert bool(hit[0, 0]) is True
    assert bool(hit[1, 0]) is False
