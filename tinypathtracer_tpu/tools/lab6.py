"""Train-step cost decomposition for the stored-hit backward (round 5).

Times, on one 262k-ray chunk of the box bench workload (512x512@16spp
d8 camera rays):

  mega_fwd       megakernel forward, no hit residuals
  mega_save      megakernel forward + per-bounce hit residual writes
  replay_fwd     shading-only replay (trace_paths with stored_hits),
                 primal only -- the recompute half of the backward
  replay_vjp     value_and_grad of sum(replay): what the whole stored
                 backward costs (fwd + checkpoint recompute + adjoint)
  full_vjp       value_and_grad of sum(trace_paths_mega): the real
                 train-path per-chunk cost
  modular_fwd    the modular dense pipeline forward (context)

Usage: python -m tinypathtracer_tpu.tools.lab6
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 18


ITERS = 4


def timed(fn, *args, k=3):
    """fn must return a SCALAR (remote-tunnel readbacks cost ~10s of ms
    each; a multi-array fetch would dominate the measurement). Each fn
    internally scans its computation ITERS times over perturbed inputs;
    the per-call dispatch overhead (measured via a null jit call, ~tens
    of ms through the tunnel) is subtracted and the remainder divided
    by ITERS."""
    float(fn(*args))
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def make_iter(body, o):
    """Scan body(origins) ITERS times over ulp-perturbed origins."""
    from jax import lax

    def run(*args):
        def step(c, i):
            oo = o + i.astype(jnp.float32) * 1e-6
            return c + body(oo, *args), None
        c, _ = lax.scan(step, jnp.float32(0), jnp.arange(ITERS))
        return c
    return jax.jit(run)


def _scalar(tree):
    leaves = [x.sum() for x in jax.tree_util.tree_leaves(tree)
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(leaves)


def main():
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tinypathtracer_tpu import RenderConfig, load_scene
    from tinypathtracer_tpu.models.envlight import gradient_sky
    from tinypathtracer_tpu.ops.dense import closest_hit_dense, \
        precompute_woop
    from tinypathtracer_tpu.ops.mega import trace_paths_mega
    from tinypathtracer_tpu.ops.sampling import fold_all, fold_lanes, \
        lane_uniform
    from tinypathtracer_tpu.render import raygen
    from tinypathtracer_tpu.render.integrator import TraceData, trace_paths
    from tinypathtracer_tpu.render.renderer import _CAM_TAG

    cfg = RenderConfig(width=512, height=512, spp=16, max_depth=8,
                       intersector="dense")
    flat = load_scene("/root/reference/input/box.gltf").flatten(
        env_radiance=np.asarray(gradient_sky(64, 128)))
    data = jax.jit(TraceData.from_scene)(flat)

    key = jax.random.PRNGKey(0)
    pix = jnp.arange(N, dtype=jnp.int32) % (512 * 512)
    keys = fold_lanes(key, pix)
    u_cam = lane_uniform(fold_all(keys, _CAM_TAG), 2)
    o, d = raygen.camera_rays_u(
        u_cam, flat.cam_to_world, flat.cam_yfov, flat.cam_aspect,
        pix % 512, pix // 512, 512, 512)

    res = {}

    def b_mega_fwd(oo):
        return trace_paths_mega(data, cfg, oo, d, keys).sum()

    def b_mega_save(oo):
        out, vjp = jax.vjp(
            lambda d_: trace_paths_mega(d_, cfg, oo, d, keys), data)
        return out.sum()

    def b_full_vjp(oo):
        def f(d_):
            return jnp.sum(trace_paths_mega(d_, cfg, oo, d, keys))
        v, g = jax.value_and_grad(f, allow_int=True)(data)
        return v + _scalar(g)

    # hits for the replay-only measurements: recreate what fwd stores
    from tinypathtracer_tpu.ops import mega as mega_mod
    from jax import lax

    def get_hits(dd, oo, di, kk):
        n = oo.shape[0]
        d_depth = cfg.max_depth
        bands = []
        for dep in range(d_depth):
            u = lane_uniform(fold_all(kk, dep), 6)
            bands.append(jnp.concatenate(
                [u.T, jnp.zeros((2, n), jnp.float32)], axis=0))
        u8d = jnp.concatenate(bands, axis=0)
        sg = jax.tree_util.tree_map(lax.stop_gradient, dd)
        woop_ = precompute_woop(sg.tri_verts)
        planesT, shadeT, boxes = mega_mod._scene_blocks(sg, woop_, 0)
        lights = mega_mod._lights_block(sg)
        w = cfg.mega_w
        pad = (-n) % w
        oo_ = jnp.pad(oo, ((0, pad), (0, 0)))
        rays8 = jnp.concatenate(
            [oo_.T, jnp.zeros((1, n + pad), jnp.float32),
             di.T, jnp.zeros((1, n + pad), jnp.float32)], axis=0)
        u_p = jnp.pad(u8d, ((0, 0), (0, pad))) if pad else u8d
        out, hraw = mega_mod._mega_pallas(
            rays8, u_p, planesT, shadeT, boxes, lights, depth=d_depth,
            n_lights=int(dd.light_kind.shape[0]), w=w, save_hits=True)
        hr = hraw[:, :n].reshape(d_depth, 8, n)
        slot = hr[:, 0].astype(jnp.int32)
        fid = jnp.where(slot >= 0, woop_.perm[jnp.maximum(slot, 0)], -1)
        t = hr[:, 1]
        uv = jnp.stack([hr[:, 2], hr[:, 3]], axis=-1)
        slot2 = hr[:, 4].astype(jnp.int32)
        fid2 = jnp.where(slot2 >= 0,
                         woop_.perm[jnp.maximum(slot2, 0)], -1)
        occ = hr[:, 5].astype(jnp.int32)
        return fid, t, uv, fid2, occ

    hits = jax.jit(get_hits)(data, o, d, keys)

    def b_replay_fwd(oo):
        return trace_paths(data, cfg, None, oo, d, keys,
                           stored_hits=hits).sum()

    def b_replay_vjp(oo):
        def f(d_):
            return jnp.sum(trace_paths(d_, cfg, None, oo, d, keys,
                                       stored_hits=hits))
        v, g = jax.value_and_grad(f, allow_int=True)(data)
        return v + _scalar(g)

    woop = jax.jit(precompute_woop)(data.tri_verts)

    def b_modular_fwd(oo):
        import functools
        hit = functools.partial(closest_hit_dense, woop=woop)
        return trace_paths(data, cfg, hit, oo, d, keys).sum()

    @jax.jit
    def null():
        return jnp.float32(0.0)

    oh = timed(lambda: null())
    for name, body in (("mega_fwd", b_mega_fwd),
                       ("mega_save", b_mega_save),
                       ("replay_fwd", b_replay_fwd),
                       ("replay_vjp", b_replay_vjp),
                       ("full_vjp", b_full_vjp),
                       ("modular_fwd", b_modular_fwd)):
        t = (timed(make_iter(lambda oo, b=body: b(oo), o)) - oh) / ITERS
        res[name + "_ms"] = t * 1e3
        print(json.dumps({name + "_ms": round(t * 1e3, 2)}), flush=True)

    for k, v in res.items():
        res[k] = round(v, 2)
    res["rays"] = N
    res["full_vjp_rays_per_s"] = round(N / (res["full_vjp_ms"] / 1e3))
    res["overhead_ms"] = round(oh * 1e3, 2)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
