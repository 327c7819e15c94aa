"""Texture pyramid + sampling tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tinypathtracer_tpu.models import texture


def checker(h, w):
    y, x = np.mgrid[0:h, 0:w]
    c = ((x + y) % 2).astype(np.float32)
    return np.stack([c, c, c], axis=-1)


def test_mip_chain_shapes():
    levels = texture.build_mip_pyramid(np.zeros((64, 32, 3), np.float32))
    shapes = [(l.shape[0], l.shape[1]) for l in levels]
    assert shapes[0] == (64, 32)
    assert shapes[1] == (32, 16)
    assert shapes[-1][0] <= 1 or len(shapes) >= 6


def test_point_sample_exact_texels():
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3) / 12.0
    lv = jnp.asarray(img)
    uv = jnp.array([[0.25, 0.25], [0.75, 0.25], [0.25, 0.75], [0.75, 0.75]])
    out = np.asarray(texture.sample_point(lv, uv))
    np.testing.assert_allclose(out[0], img[0, 0])
    np.testing.assert_allclose(out[1], img[0, 1])
    np.testing.assert_allclose(out[2], img[1, 0])
    np.testing.assert_allclose(out[3], img[1, 1])


def test_bilinear_interpolates_midpoint():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 1] = 1.0
    img[1, 0] = 1.0
    lv = jnp.asarray(img)
    # center of the texture = average of the 4 texels
    out = np.asarray(texture.sample_bilinear(lv, jnp.array([[0.5, 0.5]])))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], atol=1e-6)


def test_bilinear_wraps():
    img = np.zeros((1, 2, 3), np.float32)
    img[0, 1] = 1.0
    lv = jnp.asarray(img)
    # u=0 sits halfway between texel 1 (left wrap) and texel 0
    out = np.asarray(texture.sample_bilinear(lv, jnp.array([[0.0, 0.5]])))
    np.testing.assert_allclose(out[0], [0.5, 0.5, 0.5], atol=1e-6)


def test_mip_switch_jit():
    levels = texture.build_mip_pyramid(checker(8, 8))
    uv = jnp.array([[0.3, 0.6], [0.9, 0.1]])

    @jax.jit
    def fetch(level_idx):
        return texture.sample_mip(levels, uv, level_idx, bilinear=False)

    out0 = np.asarray(fetch(0))
    out_last = np.asarray(fetch(len(levels) - 1))
    assert out0.shape == (2, 3)
    # coarsest level of the point-decimated checker is constant 0
    np.testing.assert_allclose(out_last, 0.0)


def test_texture_gradients_flow():
    img = jnp.asarray(checker(4, 4))
    uv = jnp.array([[0.4, 0.4]])

    g = jax.grad(lambda t: jnp.sum(texture.sample_bilinear(t, uv)))(img)
    assert float(jnp.abs(g).sum()) > 0  # texels are differentiable leaves
