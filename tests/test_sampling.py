"""Sampler distribution tests: PDFs against closed forms (SURVEY.md par.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from tinypathtracer_tpu.ops import sampling, bsdf


def test_hemisphere_cosine_distribution():
    key = jax.random.PRNGKey(0)
    n = 200_000
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    d, pdf = sampling.hemisphere_cosine(key, normal)
    d = np.asarray(d)
    cos_t = d[:, 1]
    assert (cos_t >= 0).all()
    # E[cos(theta)] under pdf cos/pi is 2/3
    assert abs(cos_t.mean() - 2 / 3) < 5e-3
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pdf), cos_t / np.pi, atol=1e-5)


def test_hemisphere_cosine_tilted_normal():
    key = jax.random.PRNGKey(1)
    n = 50_000
    nrm = jnp.broadcast_to(jnp.asarray(
        np.array([1.0, 2.0, -0.5]) / np.linalg.norm([1.0, 2.0, -0.5]),
        dtype=jnp.float32), (n, 3))
    d, _ = sampling.hemisphere_cosine(key, nrm)
    cos_t = np.asarray(jnp.sum(d * nrm, axis=-1))
    assert (cos_t > -1e-6).all()
    assert abs(cos_t.mean() - 2 / 3) < 1e-2


def test_hemisphere_uniform_distribution():
    key = jax.random.PRNGKey(2)
    n = 200_000
    normal = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (n, 3))
    d, pdf = sampling.hemisphere_uniform(key, normal)
    cos_t = np.asarray(d)[:, 1]
    assert (cos_t >= 0).all()
    # E[cos] under uniform hemisphere = 1/2
    assert abs(cos_t.mean() - 0.5) < 5e-3
    np.testing.assert_allclose(np.asarray(pdf), 1 / (2 * np.pi), atol=1e-7)


def test_coin_flip_rate():
    key = jax.random.PRNGKey(3)
    p = jnp.full((100_000,), 0.3)
    flips = sampling.coin_flip(key, p)
    assert abs(float(jnp.mean(flips.astype(jnp.float32))) - 0.3) < 5e-3


def test_refract_snell():
    # Entering glass (ior 1.5) at 45 degrees from vacuum
    d = jnp.asarray(np.array([[np.sin(np.pi / 4), -np.cos(np.pi / 4), 0.0]]),
                    dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    refr, cos_i, eta, tir = bsdf.refract_reference(d, n, jnp.array([1.5]))
    assert not bool(tir[0])
    # entering: d.n < 0 -> eta = 1/ior
    assert abs(float(eta[0]) - 1 / 1.5) < 1e-6
    r = np.asarray(refr[0])
    sin_out = abs(r[0]) / np.linalg.norm(r)
    assert abs(sin_out - np.sin(np.pi / 4) / 1.5) < 1e-5


def test_refract_tir():
    # Exiting glass at grazing angle beyond the critical angle
    ang = np.deg2rad(60.0)  # critical angle for ior 1.5 is ~41.8 deg
    d = jnp.asarray(np.array([[np.sin(ang), np.cos(ang), 0.0]]), dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])  # d.n > 0: exiting
    _, _, _, tir = bsdf.refract_reference(d, n, jnp.array([1.5]))
    assert bool(tir[0])


def test_schlick_limits():
    f = bsdf.schlick_fresnel(jnp.array([1.0]), jnp.array([1.5]))
    f0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    assert abs(float(f[0]) - f0) < 1e-6
    g = bsdf.schlick_fresnel(jnp.array([0.0]), jnp.array([1.5]))
    assert abs(float(g[0]) - 1.0) < 1e-6


def test_sample_bsdf_lobes():
    key = jax.random.PRNGKey(4)
    d = jnp.broadcast_to(jnp.asarray(
        np.array([0.0, -1.0, 0.0], np.float32)), (3, 3))
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (3, 3))
    eta = jnp.array([0.0, 0.0, 1.5])
    metallic = jnp.array([0.0, 1.0, 0.0])
    base = jnp.ones((3, 3))
    nd, w, spec = bsdf.sample_bsdf(key, d, n, eta, metallic, base)
    nd = np.asarray(nd)
    # mirror lane reflects straight back up
    np.testing.assert_allclose(nd[1], [0, 1, 0], atol=1e-6)
    # diffuse lane goes into upper hemisphere
    assert nd[0, 1] > 0
    # dielectric at normal incidence: reflect up or refract straight down
    assert abs(nd[2, 1]) > 0.99
    spec = np.asarray(spec)
    assert list(spec) == [False, True, True]
    # weights equal baseColor for all lobes (atten/p cancels)
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-5)
