"""Megakernel (ops/mega.py) vs the modular bounce loop.

The megakernel must be an *indistinguishable* drop-in for the modular
reference-mode pipeline: same RNG streams, same hit arithmetic, same
estimator semantics. On scenes without delta lights the images are
bit-identical; with lights the only differences are FMA-contraction
ulps (different fusion contexts), bounded here at 1e-5.

Runs the Pallas kernel in interpret mode on CPU (tests/conftest.py pins
the CPU backend; cfg.mega_impl="interpret" forces the mega path there
-- a real config field since round 5, so the knob participates in the
jit compile key instead of being a trace-time env read, ADVICE r4).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu import RenderConfig, load_scene
from tinypathtracer_tpu.models.envlight import gradient_sky
from tinypathtracer_tpu.render.renderer import render_frame

SCENES = "/root/reference/input"


def _render_pair(flat, cfg, key):
    """(megakernel image, modular image) for identical config + key."""
    a = np.asarray(render_frame(
        flat, dataclasses.replace(cfg, mega_impl="interpret"), key))
    b = np.asarray(render_frame(
        flat, dataclasses.replace(cfg, megakernel=False), key))
    return a, b


def _flat(name, env=True):
    scene = load_scene(f"{SCENES}/{name}.gltf")
    return scene.flatten(
        env_radiance=gradient_sky(16, 32) if env else None)


def test_mega_bit_identical_box():
    cfg = RenderConfig(width=24, height=24, spp=2, max_depth=4,
                       intersector="dense")
    a, b = _render_pair(_flat("box"), cfg, jax.random.PRNGKey(7))
    assert np.array_equal(a, b), f"maxdiff {np.abs(a - b).max()}"


def test_mega_bit_identical_tir():
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=4,
                       intersector="dense")
    a, b = _render_pair(_flat("tir"), cfg, jax.random.PRNGKey(3))
    assert np.array_equal(a, b), f"maxdiff {np.abs(a - b).max()}"


@pytest.mark.parametrize("name", ["ball", "square"])
def test_mega_delta_lights(name):
    """Scenes with punctual lights: allclose within FMA-contraction ulps."""
    cfg = RenderConfig(width=16, height=16, spp=2, max_depth=4,
                       intersector="dense")
    a, b = _render_pair(_flat(name), cfg, jax.random.PRNGKey(3))
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_mega_ragged_lane_count():
    """Frame sizes that don't divide the 128-lane block width."""
    cfg = RenderConfig(width=9, height=7, spp=3, max_depth=3,
                       intersector="dense")
    a, b = _render_pair(_flat("box"), cfg, jax.random.PRNGKey(11))
    assert np.array_equal(a, b)


def test_mega_gated_bit_identical():
    """Per-(chunk, direction) slab gates are culling-only: forcing them
    on for a small scene must not change a single bit."""
    cfg = RenderConfig(width=24, height=24, spp=2, max_depth=4,
                       intersector="dense")
    flat = _flat("box")
    key = jax.random.PRNGKey(7)
    a = np.asarray(render_frame(
        flat, dataclasses.replace(cfg, mega_impl="interpret",
                                  mega_gate="on"), key))
    b = np.asarray(render_frame(
        flat, dataclasses.replace(cfg, megakernel=False), key))
    assert np.array_equal(a, b), f"maxdiff {np.abs(a - b).max()}"


def test_mega_gradients_replay_modular():
    """custom-vjp backward replays the modular path: grads must match
    the all-modular pipeline exactly."""
    flat = _flat("box")
    cfg = RenderConfig(width=12, height=12, spp=2, max_depth=3,
                       intersector="dense")
    cfg_mod = dataclasses.replace(cfg, megakernel=False)
    key = jax.random.PRNGKey(5)
    tgt = jnp.zeros((12, 12, 3), jnp.float32)

    def loss(albedo, cfg_):
        f = dataclasses.replace(flat, mtl_base_color=albedo)
        img = render_frame(f, cfg_, key)
        return jnp.mean((img - tgt) ** 2)

    l_a, g_a = jax.value_and_grad(loss)(
        flat.mtl_base_color, dataclasses.replace(cfg, mega_impl="interpret"))
    l_b, g_b = jax.value_and_grad(loss)(flat.mtl_base_color, cfg_mod)
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-5, atol=1e-8)


def test_mega_gradients_stored_matches_replay():
    """mega_bwd='stored' (shading-only replay on recorded hit residuals,
    zero intersection dispatches in the backward) must produce the same
    gradients as mega_bwd='replay' (full modular re-trace). Uses a
    delta-light scene so the occlusion bitmask path is exercised."""
    flat = _flat("ball")
    cfg = RenderConfig(width=10, height=10, spp=2, max_depth=3,
                       intersector="dense", mega_impl="interpret")
    key = jax.random.PRNGKey(9)
    tgt = jnp.zeros((10, 10, 3), jnp.float32)

    def loss(albedo, cfg_):
        f = dataclasses.replace(flat, mtl_base_color=albedo)
        img = render_frame(f, cfg_, key)
        return jnp.mean((img - tgt) ** 2)

    l_s, g_s = jax.value_and_grad(loss)(
        flat.mtl_base_color, dataclasses.replace(cfg, mega_bwd="stored"))
    l_r, g_r = jax.value_and_grad(loss)(
        flat.mtl_base_color, dataclasses.replace(cfg, mega_bwd="replay"))
    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_r),
                               rtol=1e-4, atol=1e-8)


def test_mega_stored_emission_env_grads():
    """Stored-hit backward vs the all-modular pipeline on emission and
    env-texel gradients (covers the extra-direct residual fid2 -> face
    emission path and the env epilogue): exact on the light-free box."""
    flat = _flat("box")
    cfg = RenderConfig(width=10, height=10, spp=2, max_depth=3,
                       intersector="dense")
    key = jax.random.PRNGKey(4)
    tgt = jnp.zeros((10, 10, 3), jnp.float32)

    def loss(em, env, cfg_):
        f = dataclasses.replace(flat, mtl_emission=em, env_radiance=env)
        img = render_frame(f, cfg_, key)
        return jnp.mean((img - tgt) ** 2)

    grad = jax.grad(loss, argnums=(0, 1))
    ge_s, gv_s = grad(flat.mtl_emission, flat.env_radiance,
                      dataclasses.replace(cfg, mega_impl="interpret",
                                          mega_bwd="stored"))
    ge_m, gv_m = grad(flat.mtl_emission, flat.env_radiance,
                      dataclasses.replace(cfg, megakernel=False))
    np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_m),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gv_s), np.asarray(gv_m),
                               rtol=1e-5, atol=1e-8)


def test_remat_chunks_grads_exact():
    """cfg.remat_chunks recomputes each ray-dispatch chunk in the
    backward pass (memory bound for full-res frames): gradients and
    loss must be bit-equal to the default saved-residual path."""
    flat = _flat("box")
    # 2 chunks: rays_per_dispatch < total rays
    cfg = RenderConfig(width=8, height=8, spp=4, max_depth=3,
                       intersector="dense", mega_impl="interpret",
                       rays_per_dispatch=128)
    key = jax.random.PRNGKey(2)
    tgt = jnp.zeros((8, 8, 3), jnp.float32)

    def loss(albedo, cfg_):
        f = dataclasses.replace(flat, mtl_base_color=albedo)
        img = render_frame(f, cfg_, key)
        return jnp.mean((img - tgt) ** 2)

    l_a, g_a = jax.value_and_grad(loss)(flat.mtl_base_color, cfg)
    l_b, g_b = jax.value_and_grad(loss)(
        flat.mtl_base_color, dataclasses.replace(cfg, remat_chunks=True))
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b),
                               rtol=1e-6, atol=1e-10)


def test_mega_fallbacks():
    """Static compatibility gates: physical mode must NOT take the
    megakernel path; textured scenes DO since round 5 (hits-only kernel
    + shading replay)."""
    from tinypathtracer_tpu.ops.mega import mega_available
    from tinypathtracer_tpu.render.integrator import TraceData

    data = TraceData.from_scene(_flat("box"))
    ref = RenderConfig(intersector="dense")
    assert mega_available(data, ref)
    assert not mega_available(
        data, dataclasses.replace(ref, mode="physical"))
    textured = dataclasses.replace(
        data, tex_atlas=jnp.zeros((1, 8, 8, 3), jnp.float32))
    assert mega_available(textured, ref)
