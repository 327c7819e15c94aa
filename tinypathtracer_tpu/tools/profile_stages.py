"""Per-stage wall-clock breakdown of one bench frame on the live backend.

Round-1/2 verdicts asked for committed profiling evidence; this is its
durable home. Methodology (see also tools/kernel_lab.py): the axon
remote backend's `block_until_ready` can return before execution
finishes, so every timing fetches a scalar to the host; multi-dispatch
stages run inside one jitted `lax.scan` with per-iteration input
perturbation (defeats CSE/hoisting) and subtract the measured RPC
readback overhead.

Stages:
  frame        the full Renderer frame (what bench.py measures)
  intersect    scan of the same number of dense-kernel dispatches the
               frame issues (2 per bounce: main + extra-direct)
  glue         the full bounce loop with the intersection stubbed out
               (raygen + RNG + gathers + shading + carries)

frame ~= intersect + glue + chunking overhead; the residual is
reported. Results are pasted into BASELINE.md per round.

Usage:  python -m tinypathtracer_tpu.tools.profile_stages
Env:    PROF_WIDTH/HEIGHT/SPP/DEPTH  (default 512x512@16, d8)
"""

from __future__ import annotations

import functools
import json
import os
import time


def _timed(fn, *args, k=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from tinypathtracer_tpu import RenderConfig, Renderer, load_scene
    from tinypathtracer_tpu.models.envlight import gradient_sky
    from tinypathtracer_tpu.render import raygen
    from tinypathtracer_tpu.render.integrator import trace_paths
    from tinypathtracer_tpu.render.renderer import _CAM_TAG, _hit_fn, prepare_state
    from tinypathtracer_tpu.ops.sampling import fold_all, fold_lanes, lane_uniform

    w = int(os.environ.get("PROF_WIDTH", 512))
    h = int(os.environ.get("PROF_HEIGHT", 512))
    spp = int(os.environ.get("PROF_SPP", 16))
    depth = int(os.environ.get("PROF_DEPTH", 8))

    scene = load_scene("/root/reference/input/box.gltf")
    flat = scene.flatten(env_radiance=gradient_sky(64, 128))
    cfg = RenderConfig(width=w, height=h, spp=spp, max_depth=depth,
                       intersector="dense")
    n_rays = w * h * spp
    chunk = min(cfg.rays_per_dispatch, n_rays)
    n_chunks = -(-n_rays // chunk)
    res = {"config": f"{w}x{h}@{spp}spp d{depth}", "n_rays": n_rays,
           "chunk": chunk, "backend": jax.default_backend()}

    @jax.jit
    def _null(x):
        return x.sum()

    probe = jnp.zeros((8,), jnp.float32)
    overhead = _timed(_null, probe)
    res["rpc_overhead_ms"] = overhead * 1e3

    # --- full frame --------------------------------------------------
    r = Renderer(cfg)
    frame = jax.jit(lambda s, k2: r._fn(s, key=k2, prebuilt_bvh=None).sum())
    t_frame = _timed(frame, flat, jax.random.PRNGKey(1)) - overhead
    res["frame_s"] = t_frame
    res["rays_per_s"] = n_rays / t_frame

    # --- intersection kernel: the frame's dispatch count ------------
    state = jax.jit(lambda s: prepare_state(s, cfg))(flat)
    closest_hit = _hit_fn(state, cfg)
    o0 = jax.random.uniform(jax.random.PRNGKey(2), (chunk, 3)) * 2.0
    d0 = jax.random.normal(jax.random.PRNGKey(3), (chunk, 3))
    d0 = d0 / jnp.linalg.norm(d0, axis=1, keepdims=True)
    dispatches = 2 * depth  # per chunk: main + extra-direct per bounce

    @jax.jit
    def hits(o, d):
        def body(c, i):
            fid, t, _ = closest_hit(o + i.astype(jnp.float32) * 1e-9, d)
            return c + t.sum() + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(dispatches))
        return c

    t_hits = _timed(hits, o0, d0) - overhead
    res["intersect_frame_s"] = t_hits * n_chunks
    res["intersect_ms_per_dispatch"] = t_hits / dispatches * 1e3

    # --- glue: full bounce loop with a stub intersector --------------
    data = state.data

    def stub_hit(o, d, mask=None):
        m = o.shape[0]
        fid = jnp.arange(m, dtype=jnp.int32) % data.tri_verts.shape[0]
        if mask is not None:
            fid = jnp.where(mask, fid, -1)
        return fid, jnp.ones((m,), jnp.float32), jnp.zeros((m, 2), jnp.float32)

    pix = jnp.arange(chunk, dtype=jnp.int32) // spp % (w * h)
    samp = jnp.arange(chunk, dtype=jnp.int32) % spp

    @jax.jit
    def glue(k2):
        keys = fold_lanes(k2, pix)
        keys = jax.vmap(jax.random.fold_in)(keys, samp)
        u_cam = lane_uniform(fold_all(keys, _CAM_TAG), 2)
        o, d = raygen.camera_rays_u(u_cam, flat.cam_to_world, flat.cam_yfov,
                                    flat.cam_aspect, pix % w, pix // w, w, h)
        return trace_paths(data, cfg, stub_hit, o, d, keys).sum()

    t_glue = _timed(glue, jax.random.PRNGKey(5)) - overhead
    res["glue_frame_s"] = t_glue * n_chunks
    res["glue_ms_per_bounce"] = t_glue / depth * 1e3

    res["residual_s"] = t_frame - res["intersect_frame_s"] - res["glue_frame_s"]

    print(json.dumps(res, indent=2, default=float))
    print()
    print(f"{'stage':22s} {'s/frame':>9s} {'% of frame':>11s}")
    for k in ("intersect_frame_s", "glue_frame_s", "residual_s"):
        print(f"{k:22s} {res[k]:9.3f} {100 * res[k] / t_frame:10.1f}%")
    print(f"{'frame':22s} {t_frame:9.3f}   {n_rays / t_frame:,.0f} rays/s")


if __name__ == "__main__":
    main()
