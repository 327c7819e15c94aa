"""Benchmark harness: primary rays/s/chip on the Cornell box.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1e8 primary rays/s/chip (the reference publishes no numbers of its own
-- see BASELINE.md), so 1.0 == target reached.

Env overrides (all optional):
  BENCH_WIDTH/HEIGHT/SPP/DEPTH  workload shape (default 512x512@16, d8)
  BENCH_INTERSECTOR             "dense" (default; auto-routes to the packet
                                kernel above 8k faces) | "packet" | "bvh" |
                                "bruteforce"
  BENCH_REPEATS                 timed repetitions (default 3, best-of)
  BENCH_MODE                    "fwdbwd" (default) | "fwd": fwdbwd times
                                one value_and_grad step of the MSE loss
                                (diff/invrender.mse_loss) -- the north
                                star's fwd+bwd metric and the DEFAULT
                                since round 5 (the driver-captured
                                headline must be the north-star number,
                                VERDICT r4 weak #2)
  BENCH_SCENE                   "box" (default) | "stress" | "textured":
                                stress is the ~63k-face sphere grid
                                (models/procedural), exercising the
                                packet traversal kernel; textured is a
                                ~1.8k-face room with checker-textured
                                diffuse materials on the mega fast path
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    import numpy as np
    import jax

    # The frame program takes minutes to compile on the remote TPU
    # toolchain; persist compiled executables across processes.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tinypathtracer_tpu import load_scene, RenderConfig, Renderer
    from tinypathtracer_tpu.models.envlight import gradient_sky

    width = int(os.environ.get("BENCH_WIDTH", 512))
    height = int(os.environ.get("BENCH_HEIGHT", 512))
    spp = int(os.environ.get("BENCH_SPP", 16))
    depth = int(os.environ.get("BENCH_DEPTH", 8))
    intersector = os.environ.get("BENCH_INTERSECTOR", "dense")
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    mode = os.environ.get("BENCH_MODE", "fwdbwd")
    scene_name = os.environ.get("BENCH_SCENE", "box")

    if scene_name == "stress":
        from tinypathtracer_tpu.models.procedural import sphere_grid_scene

        flat = sphere_grid_scene(grid=4, n_lat=16, n_lon=32,
                                 env_radiance=np.asarray(
                                     gradient_sky(64, 128)))
        scene_label = f"sphere-grid {flat.indices.shape[0]} faces"
    elif scene_name == "textured":
        # textured-workload analogue of BASELINE.json config[3]: a
        # mega-path-sized room whose diffuse materials fetch a checker
        # atlas with real texcoords every bounce (texture.cu:129-170)
        from tinypathtracer_tpu.models.procedural import sphere_grid_scene

        flat = sphere_grid_scene(grid=2, n_lat=8, n_lon=16, textured=True,
                                 env_radiance=np.asarray(
                                     gradient_sky(64, 128)))
        scene_label = f"textured sphere-grid {flat.indices.shape[0]} faces"
    else:
        scene = load_scene("/root/reference/input/box.gltf")
        flat = scene.flatten(env_radiance=gradient_sky(64, 128))
        scene_label = "Cornell box"
    # fwd+bwd keeps per-chunk live state (carries per bounce) alive for
    # the backward pass; smaller chunks bound that footprint.
    default_chunk = 1 << 18 if mode == "fwdbwd" else 1 << 20
    chunk = int(os.environ.get("BENCH_CHUNK", default_chunk))
    cfg = RenderConfig(width=width, height=height, spp=spp, max_depth=depth,
                       intersector=intersector, rays_per_dispatch=chunk,
                       tile_pixels=min(16384, width * height))

    key = jax.random.PRNGKey(0)
    primary_rays = width * height * spp
    target = 1e8

    if mode == "fwdbwd":
        import optax
        from tinypathtracer_tpu.diff.invrender import (
            Params, make_train_step, mse_loss)

        params = Params.from_scene(flat)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        tgt = jax.numpy.zeros((height, width, 3), jax.numpy.float32)
        step = make_train_step(cfg, opt)

        params_w, opt_w, loss = step(params, opt_state, flat, tgt, key)
        loss0 = float(loss)            # compile + warmup, sync by readback
        assert np.isfinite(loss0), "non-finite loss"
        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            _, _, loss = step(params, opt_state, flat, tgt,
                              jax.random.PRNGKey(i + 1))
            float(loss)
            best = min(best, time.perf_counter() - t0)
        metric = (f"primary rays/s/chip fwd+bwd ({scene_label} "
                  f"{width}x{height}@{spp}spp d{depth}, {intersector})")
    else:
        r = Renderer(cfg)
        img = np.asarray(r.render(flat, key))          # compile + warmup
        assert np.isfinite(img).all(), "non-finite radiance"
        assert img.mean() > 0.01, "suspiciously dark image"

        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            out = r.render(flat, jax.random.PRNGKey(i + 1))
            # fetch a scalar: on remote backends block_until_ready can
            # return before execution finishes; a host readback cannot
            float(out.sum())
            best = min(best, time.perf_counter() - t0)
        metric = (f"primary rays/s/chip ({scene_label} "
                  f"{width}x{height}@{spp}spp d{depth}, {intersector})")

    rays_per_s = primary_rays / best
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / target, 6),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # emit a parseable failure record, nonzero exit
        print(json.dumps({
            "metric": ("primary rays/s/chip "
                       f"({os.environ.get('BENCH_SCENE', 'box')} scene)"),
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
        sys.exit(1)
