"""Round-5 traversal lab: packet kernel vs every other intersector,
ON THE CHIP, across face counts and ray-coherence classes.

Settles VERDICT r4 asks #1 and #5 with data: times `closest_hit_packet`
(ops/packet.py) against the production dense kernel and the
per-node tree walk (`closest_hit_bvh`; the 8-ary wide variant was
deleted after this lab measured it 300-500x off the pace) at 2k / 8k / 61k / 124k faces, for three ray
classes that bracket the renderer's workload:

  camera   consecutive-pixel primary rays (one origin, a coherent
           direction grid) -- what bounce 0 looks like;
  pixel8   8 rays per packet share an origin on scene geometry with
           independent random directions -- what bounce 1+ looks like
           (the renderer packs the spp samples of one pixel into
           consecutive lanes);
  random   fully independent origins and directions -- worst case, a
           coherence level the real pipeline never produces.

Also reports mean/percentile chunk visits per packet: pairs tested per
query = visits * 128 vs F_padded for the dense sweep -- the >=10x
work-skipped evidence the verdict asks for.

Methodology (see tools/kernel_lab.py): ITERS reps inside one jitted
scan with an origin perturbation (defeats CSE; small enough to keep the
traversal workload unchanged), sync by scalar readback, RPC overhead
subtracted.

Usage: python -m tinypathtracer_tpu.tools.lab5 [--scenes box,g2,g4,g5]
       [--impls packet,dense,bvh] [--n 262144]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

ITERS = 8


def timed(fn, *args, k=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def _null(x):
    return x.sum()


def make_scene(name):
    from tinypathtracer_tpu import load_scene
    from tinypathtracer_tpu.models.envlight import gradient_sky
    from tinypathtracer_tpu.models.procedural import sphere_grid_scene

    if name == "box":
        flat = load_scene("/root/reference/input/box.gltf").flatten(
            env_radiance=gradient_sky(16, 32))
    else:
        g = int(name[1:])
        flat = sphere_grid_scene(grid=g, n_lat=16, n_lon=32,
                                 env_radiance=np.asarray(
                                     gradient_sky(16, 32)))
    return flat


def make_rays(flat, n, mode, seed=0):
    """[N, 3] origins + dirs on the CPU (layout = renderer lanes)."""
    from tinypathtracer_tpu.render.integrator import TraceData

    data = jax.jit(TraceData.from_scene)(flat)
    tv = np.asarray(data.tri_verts)
    lo, hi = tv.reshape(-1, 3).min(0), tv.reshape(-1, 3).max(0)
    rng = np.random.default_rng(seed)
    if mode == "camera":
        c2w = np.asarray(flat.cam_to_world)
        eye = c2w[:3, 3]
        side = int(np.sqrt(n))
        ys, xs = np.meshgrid(np.linspace(-0.4, 0.4, side),
                             np.linspace(-0.7, 0.7, side), indexing="ij")
        d_cam = np.stack([xs.ravel(), ys.ravel(),
                          -np.ones(side * side)], axis=1)
        d = d_cam @ c2w[:3, :3].T
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        reps = -(-n // d.shape[0])
        d = np.tile(d, (reps, 1))[:n]
        o = np.tile(eye, (n, 1))
    elif mode == "pixel8":
        # one surface point per packet, 8 random dirs (bounce-1 shape)
        npk = n // 8
        fsel = rng.integers(0, tv.shape[0], npk)
        b = rng.random((npk, 2)).astype(np.float32)
        u = 1.0 - np.sqrt(b[:, 0:1])
        v = (1 - u) * b[:, 1:2]
        pts = (tv[fsel, 0] * (1 - u - v) + tv[fsel, 1] * u
               + tv[fsel, 2] * v)
        o = np.repeat(pts, 8, axis=0)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    else:  # random
        o = lo + rng.random((n, 3)) * (hi - lo)
        d = rng.standard_normal((n, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
            data)


def time_hit(hit_fn, o, d):
    @jax.jit
    def run(o_, d_):
        def body(c, i):
            oo = o_ + i.astype(jnp.float32) * 1e-6
            fid, t, _ = hit_fn(oo, d_)
            return c + jnp.where(t >= 3e38, 0.0, t).sum() \
                + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = timed(_null, o)
    return (timed(run, o, d) - oh) / ITERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="box,g2,g4")
    ap.add_argument("--impls", default="packet,dense")
    ap.add_argument("--n", type=int, default=1 << 18)
    ap.add_argument("--modes", default="camera,pixel8,random")
    args = ap.parse_args()

    from tinypathtracer_tpu.ops.dense import (closest_hit_dense,
                                              precompute_woop)
    from tinypathtracer_tpu.ops.packet import (closest_hit_packet,
                                               precompute_packet)

    out = {}
    for sname in args.scenes.split(","):
        flat = make_scene(sname)
        f = int(flat.indices.shape[0])
        impls = {}
        for mode in args.modes.split(","):
            o, d, data = make_rays(flat, args.n, mode)
            for impl in args.impls.split(","):
                if impl == "packet":
                    pk = jax.jit(precompute_packet)(data.tri_verts)
                    hit = functools.partial(closest_hit_packet, pk=pk)
                    # visit stats (one un-timed call)
                    _, _, _, vis = jax.jit(functools.partial(
                        closest_hit_packet, pk=pk, with_visits=True))(o, d)
                    vis = np.asarray(vis[::8])
                    impls[f"{mode}.visits_mean"] = float(vis.mean())
                    impls[f"{mode}.visits_p95"] = float(
                        np.percentile(vis, 95))
                    impls[f"{mode}.chunks_total"] = pk.n_chunks
                elif impl == "dense":
                    woop = jax.jit(precompute_woop)(data.tri_verts)
                    hit = functools.partial(closest_hit_dense, woop=woop)
                elif impl == "bvh":
                    from tinypathtracer_tpu.ops.traverse import \
                        closest_hit_bvh
                    from tinypathtracer_tpu.render.renderer import \
                        host_build_bvh
                    bvh = host_build_bvh(flat)
                    hit = functools.partial(closest_hit_bvh, bvh=bvh,
                                            stack_depth=64)
                else:
                    continue
                t = time_hit(hit, o, d)
                impls[f"{mode}.{impl}_ms"] = round(t * 1e3, 3)
                impls[f"{mode}.{impl}_mrays_s"] = round(
                    args.n / t / 1e6, 3)
        out[f"{sname}({f}f)"] = impls
        print(json.dumps({f"{sname}({f}f)": impls}, indent=1,
                         default=float), flush=True)


if __name__ == "__main__":
    main()
