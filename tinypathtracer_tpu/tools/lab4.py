"""Round-4 kernel lab: MXU-offloaded rays-on-lanes hit kernel.

Hypothesis (from the round-3 findings in tools/kernel_lab.py): the
branch-free dense kernel is VPU-issue-bound at ~64 Gpairs/s with ~35
vector ops per (ray, triangle) pair, ~21 of which are the Woop affine
transform FMAs. Those FMAs are a matmul: with the ray tile on the LANE
axis (128 rays) and triangles on the SUBLANE axis, the transform is
    [TC tris, 4] @ [4, 2*128]  per component (o-half and d-half),
three small MXU dots per tri-chunk, leaving the VPU only the ~16-op
epilogue (reciprocal, t/u/v, compares, running best). If the MXU work
overlaps the VPU epilogue, the pair rate should approach
(VPU ops/s) / 16 ~= 2x the round-3 kernel.

Round-3's MXU attempt measured "a wash" (67 Gpairs/s) with rays on
SUBLANES (output [TN, 6*TF], epilogue on strided lane slices); this one
inverts the orientation so every epilogue operand is a natural
[TC, 128] block and the running best lives per (sublane-slot, ray).

Usage: python -m tinypathtracer_tpu.tools.lab4
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinypathtracer_tpu.utils.math3d import DELTA, REAL_MAX

ITERS = 10
_I32_MAX = 2**31 - 1


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


def make_planes4(woop):
    """WoopTris -> [3*Fp, 4] comp-major plane rows [w0 w1 w2 c]."""
    return jnp.concatenate([woop.wx.T, woop.wy.T, woop.wz.T], axis=0)


def _mxu_hit_kernel(fp: int, tc: int, precision):
    n_chunks = fp // tc

    def kernel(rays_ref, planes_ref, t_ref, fid_ref):
        # rays_ref: [8, 128] rows = ox oy oz 1 dx dy dz 0
        v = rays_ref[:]                                  # [8, 128]
        o4, d4 = v[0:4], v[4:8]                          # [4, 128] each

        best_t = jnp.full((1, 128), REAL_MAX, jnp.float32)
        best_i = jnp.zeros((1, 128), jnp.int32)

        for ck in range(n_chunks):
            base = ck * tc
            px = planes_ref[pl.ds(base, tc), :]
            py = planes_ref[pl.ds(fp + base, tc), :]
            pz = planes_ref[pl.ds(2 * fp + base, tc), :]
            opx = jnp.dot(px, o4, precision=precision,
                          preferred_element_type=jnp.float32)
            dpx = jnp.dot(px, d4, precision=precision,
                          preferred_element_type=jnp.float32)
            opy = jnp.dot(py, o4, precision=precision,
                          preferred_element_type=jnp.float32)
            dpy = jnp.dot(py, d4, precision=precision,
                          preferred_element_type=jnp.float32)
            opz = jnp.dot(pz, o4, precision=precision,
                          preferred_element_type=jnp.float32)
            dpz = jnp.dot(pz, d4, precision=precision,
                          preferred_element_type=jnp.float32)
            t = -opz / dpz
            u = opx + t * dpx
            vv = opy + t * dpy
            ok = (jnp.minimum(u, vv) >= 0.0) & (u + vv <= 1.0) & (t > DELTA)
            tcand = jnp.where(ok, t, REAL_MAX)           # [tc, 128]
            cmin = jnp.min(tcand, axis=0, keepdims=True)  # [1, 128]
            rows = lax.broadcasted_iota(jnp.int32, (tc, 128), 0) + base
            cid = jnp.min(jnp.where(tcand == cmin, rows, _I32_MAX),
                          axis=0, keepdims=True)
            better = cmin < best_t
            best_i = jnp.where(better, cid, best_i)
            best_t = jnp.where(better, cmin, best_t)

        t_ref[:] = best_t
        fid_ref[:] = jnp.where(best_t >= REAL_MAX, -1, best_i)

    return kernel


@functools.partial(jax.jit, static_argnames=("tc", "precision"))
def mxu_closest_hit(rays8, planes4, tc=512, precision=lax.Precision.HIGHEST):
    """rays8: [8, N] (rows ox oy oz 1 dx dy dz 0); planes4: [3*Fp, 4]."""
    n = rays8.shape[1]
    fp = planes4.shape[0] // 3
    grid = (n // 128,)
    t, fid = pl.pallas_call(
        _mxu_hit_kernel(fp, tc, precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * fp, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(rays8, planes4)
    return t[0], fid[0]


def make_planesT(woop):
    """WoopTris -> [Fp, 12] tri-major rows [wx0..3 | wy0..3 | wz0..3]."""
    return jnp.concatenate([woop.wx.T, woop.wy.T, woop.wz.T], axis=1)


def _vpu_rol_kernel(fp: int, tc: int):
    """Rays-on-lanes, pure-VPU variant ("option C"): triangle plane
    coefficients live on SUBLANES ([TC, 1] columns), rays on lanes
    ([1, 128] rows); every hot op is a [TC, 128] block fed by two cheap
    broadcasts. Same per-pair op count as the production rays-on-
    sublanes kernel -- this measures whether the broadcast orientation
    (sublane-broadcast of ray rows x lane-broadcast of tri columns)
    lowers as well as the production orientation does."""
    n_chunks = fp // tc

    def kernel(rays_ref, planesT_ref, t_ref, fid_ref):
        v = rays_ref[:]                                  # [8, 128]
        ox, oy, oz = v[0:1], v[1:2], v[2:3]              # [1, 128]
        dx, dy, dz = v[4:5], v[5:6], v[6:7]

        best_t = jnp.full((1, 128), REAL_MAX, jnp.float32)
        best_i = jnp.zeros((1, 128), jnp.int32)

        for ck in range(n_chunks):
            base = ck * tc
            p = planesT_ref[pl.ds(base, tc), :]          # [TC, 12]
            opx = ox * p[:, 0:1] + oy * p[:, 1:2] + oz * p[:, 2:3] + p[:, 3:4]
            opy = ox * p[:, 4:5] + oy * p[:, 5:6] + oz * p[:, 6:7] + p[:, 7:8]
            opz = ox * p[:, 8:9] + oy * p[:, 9:10] + oz * p[:, 10:11] + p[:, 11:12]
            dpx = dx * p[:, 0:1] + dy * p[:, 1:2] + dz * p[:, 2:3]
            dpy = dx * p[:, 4:5] + dy * p[:, 5:6] + dz * p[:, 6:7]
            dpz = dx * p[:, 8:9] + dy * p[:, 9:10] + dz * p[:, 10:11]
            t = -opz / dpz
            u = opx + t * dpx
            vv = opy + t * dpy
            ok = (jnp.minimum(u, vv) >= 0.0) & (u + vv <= 1.0) & (t > DELTA)
            tcand = jnp.where(ok, t, REAL_MAX)            # [tc, 128]
            cmin = jnp.min(tcand, axis=0, keepdims=True)  # [1, 128]
            rows = lax.broadcasted_iota(jnp.int32, (tc, 128), 0) + base
            cid = jnp.min(jnp.where(tcand == cmin, rows, _I32_MAX),
                          axis=0, keepdims=True)
            better = cmin < best_t
            best_i = jnp.where(better, cid, best_i)
            best_t = jnp.where(better, cmin, best_t)

        t_ref[:] = best_t
        fid_ref[:] = jnp.where(best_t >= REAL_MAX, -1, best_i)

    return kernel


@functools.partial(jax.jit, static_argnames=("tc",))
def vpu_rol_closest_hit(rays8, planesT, tc=512):
    """rays8: [8, N]; planesT: [Fp, 12]."""
    n = rays8.shape[1]
    fp = planesT.shape[0]
    grid = (n // 128,)
    t, fid = pl.pallas_call(
        _vpu_rol_kernel(fp, tc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, 12), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(rays8, planesT)
    return t[0], fid[0]


def _test_data(n, f, seed=0):
    from tinypathtracer_tpu.ops.dense import precompute_woop

    key = jax.random.PRNGKey(seed)
    tv = jax.random.uniform(key, (f, 3, 3), jnp.float32) * 100.0
    woop = jax.jit(precompute_woop)(tv)
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 100.0
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    rays8 = jnp.concatenate(
        [o.T, jnp.ones((1, n)), d.T, jnp.zeros((1, n))], axis=0)
    return woop, o, d, rays8


def check_correctness(n=4096, f=1948):
    """Same hits as the production dense kernel (morton-slot ids)."""
    import numpy as np
    from tinypathtracer_tpu.ops.dense import closest_hit_dense

    woop, o, d, rays8 = _test_data(n, f)
    planes4 = make_planes4(woop)
    fid_ref, t_ref, _ = closest_hit_dense(o, d, woop)

    def report(label, t, fid):
        fid_orig = jnp.where(fid >= 0, woop.perm[jnp.maximum(fid, 0)], -1)
        match = np.mean(np.asarray(fid_orig) == np.asarray(fid_ref))
        hit = np.asarray(fid_ref) >= 0
        terr = np.abs(np.asarray(t) - np.asarray(t_ref))[hit]
        print(f"  {label}: fid match {match:.6f}, max |dt| on hits "
              f"{terr.max() if hit.any() else 0.0:.3e}")

    t, fid = mxu_closest_hit(rays8, planes4,
                             precision=lax.Precision.HIGHEST)
    report("mxu HIGHEST", t, fid)
    t, fid = mxu_closest_hit(rays8, planes4,
                             precision=lax.Precision.DEFAULT)
    report("mxu DEFAULT", t, fid)
    t, fid = vpu_rol_closest_hit(rays8, make_planesT(woop))
    report("vpu_rol", t, fid)


def mxu_rate(n=1 << 20, f=1948, tc=512, precision=lax.Precision.HIGHEST):
    woop, o, d, rays8 = _test_data(n, f)
    planes4 = make_planes4(woop)
    fp = woop.n_padded

    @jax.jit
    def run(r8):
        def body(c, i):
            rr = r8 + i.astype(jnp.float32) * 1e-9
            t, fid = mxu_closest_hit(rr, planes4, tc=tc, precision=precision)
            return c + t.sum() + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = timed(_null, rays8)
    t = (timed(run, rays8) - oh) / ITERS
    return t, n * fp / t


def vpu_rol_rate(n=1 << 20, f=1948, tc=512):
    woop, o, d, rays8 = _test_data(n, f)
    planesT = make_planesT(woop)
    fp = woop.n_padded

    @jax.jit
    def run(r8):
        def body(c, i):
            rr = r8 + i.astype(jnp.float32) * 1e-9
            t, fid = vpu_rol_closest_hit(rr, planesT, tc=tc)
            return c + t.sum() + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c
    oh = timed(_null, rays8)
    t = (timed(run, rays8) - oh) / ITERS
    return t, n * fp / t


def baseline_rate(n=1 << 20, f=1948):
    from tinypathtracer_tpu.ops.dense import closest_hit_dense

    woop, o, d, _ = _test_data(n, f)

    @jax.jit
    def run(o_, d_):
        def body(c, i):
            oo = o_ + i.astype(jnp.float32) * 1e-9
            fid, t, _ = closest_hit_dense(oo, d_, woop)
            return c + t.sum() + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = timed(_null, o)
    t = (timed(run, o, d) - oh) / ITERS
    return t, n * woop.n_padded / t


def main():
    res = {}
    print("correctness (vs production dense kernel):")
    check_correctness()
    t, rate = baseline_rate()
    res["baseline_1Mx2048_ms"] = t * 1e3
    res["baseline_gpairs_per_s"] = rate / 1e9
    for tc in (256, 512, 1024):
        t, rate = mxu_rate(tc=tc)
        res[f"mxu_tc{tc}_highest_ms"] = t * 1e3
        res[f"mxu_tc{tc}_highest_gpairs_per_s"] = rate / 1e9
    t, rate = mxu_rate(tc=512, precision=lax.Precision.DEFAULT)
    res["mxu_tc512_default_ms"] = t * 1e3
    res["mxu_tc512_default_gpairs_per_s"] = rate / 1e9
    for tc in (256, 512):
        t, rate = vpu_rol_rate(tc=tc)
        res[f"vpu_rol_tc{tc}_ms"] = t * 1e3
        res[f"vpu_rol_tc{tc}_gpairs_per_s"] = rate / 1e9
    print(json.dumps(res, indent=2, default=float))


if __name__ == "__main__":
    main()
