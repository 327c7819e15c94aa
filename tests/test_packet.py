"""Packet traversal (ops/packet.py) vs the dense oracle.

The packet kernel must be bit-identical to closest_hit_dense (same Woop
arithmetic, same lowest-morton-slot tie rule) while doing sublinear
work. Interpret mode runs the REAL kernel (while_loop walk included) on
CPU; sizes stay tiny because interpreted while_loops are slow.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu import RenderConfig, load_scene
from tinypathtracer_tpu.models.envlight import gradient_sky
from tinypathtracer_tpu.ops.dense import closest_hit_dense
from tinypathtracer_tpu.ops.packet import (closest_hit_packet,
                                           precompute_packet)
from tinypathtracer_tpu.render.integrator import TraceData

SCENES = "/root/reference/input"


@pytest.fixture(scope="module")
def box_pk():
    flat = load_scene(f"{SCENES}/box.gltf").flatten(
        env_radiance=gradient_sky(16, 32))
    data = jax.jit(TraceData.from_scene)(flat)
    return jax.jit(precompute_packet)(data.tri_verts), flat


def _rays(n, seed=0, lo=-3.0, hi=3.0):
    o = jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                           minval=lo, maxval=hi)
    d = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3))
    return o, d / jnp.linalg.norm(d, axis=1, keepdims=True)


def _interp(fn, *args, **kw):
    os.environ["TPT_PACKET_IMPL"] = "interpret"
    try:
        return fn(*args, **kw)
    finally:
        os.environ.pop("TPT_PACKET_IMPL", None)


def test_packet_kernel_bit_identical(box_pk):
    """Interpret-mode kernel (the real walk) == dense, incl. uv."""
    pk, _ = box_pk
    o, d = _rays(64)
    fid_p, t_p, uv_p = _interp(closest_hit_packet, o, d, pk)
    fid_d, t_d, uv_d = closest_hit_dense(o, d, pk.woop)
    assert np.array_equal(np.asarray(fid_p), np.asarray(fid_d))
    assert np.array_equal(np.asarray(t_p), np.asarray(t_d))
    assert np.array_equal(np.asarray(uv_p), np.asarray(uv_d))


def test_packet_mask_skips_work(box_pk):
    """mask=False lanes miss AND traverse nothing (visits = 0 when the
    whole packet is dead)."""
    pk, _ = box_pk
    o, d = _rays(64, seed=4)
    mask = (jnp.arange(64) % 16) < 8     # packets 0: alive, 1: dead, ...
    fid_m, _t, _uv, visits = _interp(closest_hit_packet, o, d, pk,
                                     mask=mask, with_visits=True)
    fid_d, _, _ = closest_hit_dense(o, d, pk.woop)
    assert np.array_equal(np.asarray(fid_m),
                          np.where(np.asarray(mask), np.asarray(fid_d), -1))
    v = np.asarray(visits)
    assert (v[np.asarray(~mask)] == 0).all()


def test_packet_xla_fallback_matches(box_pk):
    """CPU (non-interpret) path routes through the dense XLA twin."""
    pk, _ = box_pk
    o, d = _rays(64, seed=8)
    fid_p, t_p, _ = closest_hit_packet(o, d, pk)
    fid_d, t_d, _ = closest_hit_dense(o, d, pk.woop)
    assert np.array_equal(np.asarray(fid_p), np.asarray(fid_d))
    assert np.array_equal(np.asarray(t_p), np.asarray(t_d))


def test_packet_kvisit_packetw_variants(box_pk):
    """Batched visits (kvisit) and wider packets change scheduling
    only, never results."""
    pk, _ = box_pk
    o, d = _rays(64, seed=12)
    ref, t_ref, _ = closest_hit_dense(o, d, pk.woop)
    for w, k in ((8, 4), (16, 2)):
        os.environ["TPT_PACKET_W"] = str(w)
        os.environ["TPT_PACKET_K"] = str(k)
        try:
            fid, t, _ = _interp(closest_hit_packet, o, d, pk)
        finally:
            os.environ.pop("TPT_PACKET_W", None)
            os.environ.pop("TPT_PACKET_K", None)
        assert np.array_equal(np.asarray(fid), np.asarray(ref)), (w, k)
        assert np.array_equal(np.asarray(t), np.asarray(t_ref)), (w, k)


def test_packet_render_matches_dense():
    """End-to-end: a tiny frame through intersector='packet' (XLA twin
    on CPU) is bit-identical to intersector='dense'."""
    import dataclasses

    from tinypathtracer_tpu.render.renderer import render_frame

    flat = load_scene(f"{SCENES}/box.gltf").flatten(
        env_radiance=gradient_sky(16, 32))
    cfg = RenderConfig(width=12, height=12, spp=2, max_depth=3,
                       intersector="packet", megakernel=False)
    key = jax.random.PRNGKey(3)
    a = np.asarray(render_frame(flat, cfg, key))
    b = np.asarray(render_frame(
        flat, dataclasses.replace(cfg, intersector="dense"), key))
    assert np.array_equal(a, b)


def test_packet_large_scene_oracle():
    """Procedural scene spanning many chunks: subsampled rays vs dense."""
    from tinypathtracer_tpu.models.procedural import sphere_grid_scene

    flat = sphere_grid_scene(grid=2, n_lat=8, n_lon=12,
                             env_radiance=np.asarray(gradient_sky(8, 16)))
    data = jax.jit(TraceData.from_scene)(flat)
    pk = jax.jit(precompute_packet)(data.tri_verts)
    assert pk.n_chunks >= 8
    o, d = _rays(64, seed=20, lo=-6.0, hi=6.0)
    fid_p, t_p, uv_p = _interp(closest_hit_packet, o, d, pk)
    fid_d, t_d, uv_d = closest_hit_dense(o, d, pk.woop)
    assert np.array_equal(np.asarray(fid_p), np.asarray(fid_d))
    assert np.array_equal(np.asarray(t_p), np.asarray(t_d))
