"""Per-stage wall-clock breakdown of one bench frame on the live backend.

Round-1/2 verdicts asked for committed profiling evidence; this script
is the durable home for it. It times each component of the hot path in
isolation (all jitted, best-of-k, block_until_ready) and prints a JSON
breakdown plus a human table. Results are pasted into BASELINE.md.

Usage:  python -m tinypathtracer_tpu.tools.profile_stages
Env:    PROF_WIDTH/HEIGHT/SPP/DEPTH  (default 512x512@16, d8)
"""

from __future__ import annotations

import functools
import json
import os
import time


def _best_of(fn, *args, k=3, **kw):
    out = fn(*args, **kw)          # compile + warmup
    import jax
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tinypathtracer_tpu import RenderConfig, Renderer, load_scene
    from tinypathtracer_tpu.models.envlight import gradient_sky
    from tinypathtracer_tpu.ops.dense import closest_hit_dense, precompute_woop
    from tinypathtracer_tpu.ops.sampling import fold_all, fold_lanes, lane_uniform
    from tinypathtracer_tpu.render.renderer import prepare_state

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

    # --- full frame -------------------------------------------------------
    r = Renderer(cfg)
    key = jax.random.PRNGKey(0)
    t_frame = _best_of(lambda k2: r._fn(flat, key=k2,
                                        prebuilt_bvh=None), key)
    res["frame_s"] = t_frame
    res["rays_per_s"] = n_rays / t_frame

    # --- intersection kernel alone (per bounce there are 2 dispatches in
    # reference mode: main hit + extra direct ray) --------------------------
    state = jax.jit(lambda s: prepare_state(s, cfg))(flat)
    woop = state.bvh
    o = jnp.zeros((chunk, 3), jnp.float32) + jnp.array([278.0, 278.0, -500.0])
    kdir = jax.random.normal(jax.random.PRNGKey(1), (chunk, 3))
    d = kdir / jnp.linalg.norm(kdir, axis=1, keepdims=True)

    hit = jax.jit(lambda o_, d_: closest_hit_dense(o_, d_, woop))
    t_hit1 = _best_of(hit, o, d)
    res["intersect_1dispatch_s"] = t_hit1
    dispatches = 2 * depth * n_chunks
    res["intersect_frame_est_s"] = t_hit1 * dispatches
    res["intersect_dispatches"] = dispatches

    mask = jnp.ones((chunk,), bool)
    hit_m = jax.jit(lambda o_, d_, m_: closest_hit_dense(o_, d_, woop, mask=m_))
    res["intersect_masked_1dispatch_s"] = _best_of(hit_m, o, d, mask)

    # --- RNG glue: per-lane key folds + uniforms, as the renderer does ----
    pix = jnp.arange(chunk, dtype=jnp.int32) % (w * h)
    samp = jnp.arange(chunk, dtype=jnp.int32) % spp

    @jax.jit
    def rng_frame(k2):
        keys = fold_lanes(k2, pix)
        keys = jax.vmap(jax.random.fold_in)(keys, samp)
        tot = lane_uniform(fold_all(keys, 0x00CA0CA1), 2).sum()
        for dd in range(depth):
            tot += lane_uniform(fold_all(keys, dd), 6).sum()
        return tot

    t_rng = _best_of(rng_frame, key)
    res["rng_glue_frame_est_s"] = t_rng * n_chunks

    # --- shading glue: one bounce minus the intersection dispatches -------
    data = state.data
    from tinypathtracer_tpu.ops import bsdf

    fid = jnp.zeros((chunk,), jnp.int32)

    @jax.jit
    def shade_once(o_, d_, u):
        from tinypathtracer_tpu.ops.traverse import _ray_tri_single
        from tinypathtracer_tpu.utils.math3d import vnormalize
        pack = data.face_pack[jnp.maximum(fid, 0)]
        t, u_, v_, _ok = _ray_tri_single(o_, d_, pack[:, 15:18],
                                         pack[:, 18:21], pack[:, 21:24])
        w_ = 1.0 - u_ - v_
        nrm = (w_[:, None] * pack[:, 0:3] + u_[:, None] * pack[:, 3:6]
               + v_[:, None] * pack[:, 6:9])
        nrm = vnormalize(nrm, eps=1e-20)
        nd, wt, sp = bsdf.sample_bsdf_u(u[:, 0], u[:, 1], u[:, 2], d_, nrm,
                                        pack[:, 13], pack[:, 14], pack[:, 9:12])
        nd2, _, _ = bsdf.sample_bsdf_u(u[:, 3], u[:, 4], u[:, 5], d_, nrm,
                                       pack[:, 13], pack[:, 14], pack[:, 9:12])
        return nd.sum() + wt.sum() + nd2.sum() + t.sum()

    u6 = jax.random.uniform(key, (chunk, 6))
    t_shade = _best_of(shade_once, o, d, u6)
    res["shade_glue_1bounce_s"] = t_shade
    res["shade_glue_frame_est_s"] = t_shade * depth * n_chunks

    # --- raygen ------------------------------------------------------------
    from tinypathtracer_tpu.render import raygen

    @jax.jit
    def gen(u2):
        return raygen.camera_rays_u(u2, flat.cam_to_world, flat.cam_yfov,
                                    flat.cam_aspect, pix % w, pix // w, w, h)

    t_gen = _best_of(gen, u6[:, :2])
    res["raygen_frame_est_s"] = t_gen * n_chunks

    accounted = (res["intersect_frame_est_s"] + res["rng_glue_frame_est_s"]
                 + res["shade_glue_frame_est_s"] + res["raygen_frame_est_s"])
    res["accounted_s"] = accounted
    res["unaccounted_s"] = t_frame - accounted

    print(json.dumps(res, indent=2, default=float))
    print()
    print(f"{'stage':34s} {'frame est (s)':>14s} {'% of frame':>11s}")
    for k in ("intersect_frame_est_s", "rng_glue_frame_est_s",
              "shade_glue_frame_est_s", "raygen_frame_est_s",
              "unaccounted_s"):
        print(f"{k:34s} {res[k]:14.4f} {100 * res[k] / t_frame:10.1f}%")
    print(f"{'TOTAL frame':34s} {t_frame:14.4f} {n_rays / t_frame:,.0f} rays/s")


if __name__ == "__main__":
    main()
