"""Dense (Woop-transform) intersector: parity with the brute-force
oracle, padding/degenerate handling, and the Pallas kernel in
interpreter mode vs its XLA twin."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu.ops import intersect
from tinypathtracer_tpu.ops.dense import (
    closest_hit_dense, precompute_woop, _dense_pallas, _dense_xla)


def _random_scene(f=400, n=900, seed=0):
    rng = np.random.default_rng(seed)
    tris = jnp.asarray((rng.uniform(-3, 3, (f, 1, 3))
                        + rng.normal(scale=0.4, size=(f, 3, 3))).astype(np.float32))
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    return tris, o, d


def test_dense_matches_bruteforce():
    tris, o, d = _random_scene()
    fb, tb, uvb = intersect.closest_hit_bruteforce(o, d, tris)
    woop = precompute_woop(tris)
    fd, td, uvd = closest_hit_dense(o, d, woop, with_uv=True)
    fb, fd = np.asarray(fb), np.asarray(fd)
    assert (fb == fd).mean() > 0.999          # Woop vs MT rounding at edges
    both = (fb == fd) & (fb >= 0)
    assert both.sum() > 100
    np.testing.assert_allclose(np.asarray(td)[both], np.asarray(tb)[both],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(uvd)[both], np.asarray(uvb)[both],
                               rtol=1e-2, atol=1e-3)


def test_pallas_interpret_matches_xla_twin():
    tris, o, d = _random_scene(seed=3)
    woop = precompute_woop(tris)
    rays = jnp.concatenate([o, d, jnp.zeros((o.shape[0], 2), jnp.float32)], 1)
    t_x, f_x, uv_x = _dense_xla(rays, woop.wx, woop.wy, woop.wz)
    t_p, f_p, uv_p = _dense_pallas(rays, woop.wx, woop.wy, woop.wz,
                                   woop.sp_boxes, with_uv=True,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    hit = np.asarray(f_x) >= 0
    np.testing.assert_array_equal(np.asarray(uv_x)[hit], np.asarray(uv_p)[hit])


def test_gated_kernel_matches_xla_twin():
    """Scenes past _GATE_MIN_FACES take the SUPER-gated kernel path;
    gating must be invisible in the results (pure work-skipping)."""
    from tinypathtracer_tpu.ops.dense import _GATE_MIN_FACES

    tris, o, d = _random_scene(f=_GATE_MIN_FACES + 123, n=96, seed=11)
    woop = precompute_woop(tris)
    assert woop.n_padded >= _GATE_MIN_FACES
    rays = jnp.concatenate([o, d, jnp.zeros((o.shape[0], 2), jnp.float32)], 1)
    t_x, f_x, uv_x = _dense_xla(rays, woop.wx, woop.wy, woop.wz)
    t_p, f_p, uv_p = _dense_pallas(rays, woop.wx, woop.wy, woop.wz,
                                   woop.sp_boxes, gated=True, with_uv=True,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(f_x), np.asarray(f_p))
    np.testing.assert_array_equal(np.asarray(t_x), np.asarray(t_p))
    hit = np.asarray(f_x) >= 0
    np.testing.assert_array_equal(np.asarray(uv_x)[hit], np.asarray(uv_p)[hit])


@pytest.mark.parametrize("impl", ["xla", "interpret"])
def test_mask_semantics(impl, monkeypatch):
    """Masked lanes report miss; live lanes match the unmasked call
    bit-for-bit (the mask is a post-filter, never a result change)."""
    monkeypatch.setenv("TPT_DENSE_IMPL", impl)
    tris, o, d = _random_scene(f=300, n=777, seed=5)
    woop = precompute_woop(tris)
    rng = np.random.default_rng(9)
    mask = jnp.asarray(rng.random(777) < 0.37)
    f0, t0, _ = closest_hit_dense(o, d, woop)
    fm, tm, _ = closest_hit_dense(o, d, woop, mask=mask)
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(fm)[m], np.asarray(f0)[m])
    np.testing.assert_array_equal(np.asarray(tm)[m], np.asarray(t0)[m])
    assert (np.asarray(fm)[~m] == -1).all()
    for edge in (jnp.zeros(777, bool), jnp.ones(777, bool)):
        fe, _, _ = closest_hit_dense(o, d, woop, mask=edge)
        ref = np.where(np.asarray(edge), np.asarray(f0), -1)
        np.testing.assert_array_equal(np.asarray(fe), ref)


def test_degenerate_and_padding_never_hit():
    rng = np.random.default_rng(1)
    # one real triangle + degenerate (zero-area) ones; padding to tile
    tris = np.zeros((3, 3, 3), np.float32)
    tris[0] = [[-1, -1, -2], [1, -1, -2], [0, 1, -2]]
    tris[1] = [[0, 0, 0], [1, 1, 1], [2, 2, 2]]      # collinear
    tris[2] = [[1, 1, 1], [1, 1, 1], [1, 1, 1]]      # a point
    woop = precompute_woop(jnp.asarray(tris))
    o = jnp.asarray(np.tile([[0, 0, 1]], (64, 1)).astype(np.float32))
    d = np.zeros((64, 3), np.float32)
    d[:, 2] = -1.0
    d[32:, 2] = 1.0                                   # away from the triangle
    fid, t, _uv = closest_hit_dense(o, jnp.asarray(d), woop)
    fid = np.asarray(fid)
    assert (fid[:32] == 0).all()
    assert (fid[32:] == -1).all()
    np.testing.assert_allclose(np.asarray(t)[:32], 3.0, rtol=1e-5)


def test_dense_tie_breaks_to_lowest_fid():
    # two identical triangles: brute force and dense must both pick fid 0
    tri = np.array([[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32)
    tris = jnp.asarray(np.concatenate([tri, tri], axis=0))
    o = jnp.zeros((8, 3), jnp.float32)
    d = jnp.asarray(np.tile([[0, 0, -1]], (8, 1)).astype(np.float32))
    fb, _, _ = intersect.closest_hit_bruteforce(o, d, tris)
    fd, _, _ = closest_hit_dense(o, d, precompute_woop(tris))
    assert (np.asarray(fb) == 0).all()
    assert (np.asarray(fd) == 0).all()


def test_renderer_dense_matches_bruteforce_image():
    from tinypathtracer_tpu import load_scene, RenderConfig, Renderer
    from tinypathtracer_tpu.models.envlight import gradient_sky

    flat = load_scene("/root/reference/input/box.gltf").flatten(
        env_radiance=gradient_sky(8, 16))
    key = jax.random.PRNGKey(7)
    kw = dict(width=48, height=48, spp=2, max_depth=4, tile_pixels=48 * 48)
    a = np.asarray(Renderer(RenderConfig(intersector="bruteforce", **kw))
                   .render(flat, key))
    b = np.asarray(Renderer(RenderConfig(intersector="dense", **kw))
                   .render(flat, key))
    # identical hit decisions => identical RNG stream => identical image
    # up to Woop-vs-MT edge rounding on a handful of pixels
    close = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=-1)
    assert close.mean() > 0.995, f"pixel agreement {close.mean()}"
