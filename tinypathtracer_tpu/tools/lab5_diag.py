"""Packet-kernel overhead diagnosis: where do 800 cycles/packet go?

First lab5 run (box, 262k rays): camera packets average 0.35 chunk
visits yet the kernel costs 877 ns/packet fixed -- ~25 chunk-visits
worth of pure pair arithmetic. This harness times stripped variants of
the packet kernel to attribute the fixed cost:

  empty      fori over packets, read rays, write constant outputs
  boxtest    + the [8, Cp] slab test + s_near store
  boxvec     slab test VECTORIZED over the whole [TN, Cp] block
             (32x fewer, 32x larger instructions; answers "is it
             instruction issue?")
  select1    + one packed-int-key select (no walk)
  walk       + the full while_loop walk (the real kernel, int keys)
  epilogue   empty + the cross-lane argmin epilogue only

Usage: python -m tinypathtracer_tpu.tools.lab5_diag
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DELTA = 1e-4
REAL_MAX = 3.4e38
_I32_MAX = 2**31 - 1
ITERS = 8
TN = 256
PACKET = 8
CHUNK = 128
ROWS = 16


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


def make_kernel(cp, variant):
    def kernel(rays_ref, planes_ref, boxes_ref, t_ref, s_key, lane_t):
        col = lax.broadcasted_iota(jnp.int32, (PACKET, cp), 1)

        def packet_body(p, _):
            row0 = pl.multiple_of(p * PACKET, PACKET)
            r = rays_ref[pl.ds(row0, PACKET), :]
            ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
            dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]

            if variant == "empty":
                t_ref[pl.ds(row0, PACKET), :] = ox + dx
                return 0

            if variant == "epilogue":
                lt = lane_t[:]
                mrow = jnp.min(lt, axis=1, keepdims=True)
                lane = lax.broadcasted_iota(jnp.int32, (PACKET, CHUNK), 1)
                cand = jnp.min(jnp.where(lt == mrow, lane, _I32_MAX),
                               axis=1, keepdims=True)
                t_ref[pl.ds(row0, PACKET), :] = (
                    mrow + cand.astype(jnp.float32))
                return 0

            ivx = jnp.where(dx == 0.0, REAL_MAX,
                            1.0 / jnp.where(dx == 0.0, 1.0, dx))
            ivy = jnp.where(dy == 0.0, REAL_MAX,
                            1.0 / jnp.where(dy == 0.0, 1.0, dy))
            ivz = jnp.where(dz == 0.0, REAL_MAX,
                            1.0 / jnp.where(dz == 0.0, 1.0, dz))
            tx0 = (boxes_ref[0:1, :] - ox) * ivx
            ty0 = (boxes_ref[1:2, :] - oy) * ivy
            tz0 = (boxes_ref[2:3, :] - oz) * ivz
            tx1 = (boxes_ref[3:4, :] - ox) * ivx
            ty1 = (boxes_ref[4:5, :] - oy) * ivy
            tz1 = (boxes_ref[5:6, :] - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            hit_box = (far >= jnp.maximum(near, DELTA)) \
                & (boxes_ref[6:7, :] != 0.0)
            # packed sortable key: positive-f32 bits are order-preserving
            # as int; low 10 bits replaced with the chunk id
            ikey = pltpu.bitcast(jnp.maximum(near, DELTA), jnp.int32)
            ikey = jnp.where(hit_box, (ikey | 1023) ^ 1023 | col,
                             _I32_MAX)
            s_key[:] = ikey

            if variant == "boxtest":
                t_ref[pl.ds(row0, PACKET), :] = jnp.min(
                    s_key[:], axis=1, keepdims=True).astype(jnp.float32)
                return 0

            lane_t[:] = jnp.full((PACKET, CHUNK), REAL_MAX, jnp.float32)

            def select():
                pbest = jnp.min(lane_t[:], axis=1, keepdims=True)
                ibt = pltpu.bitcast(pbest, jnp.int32) | 1023
                live = jnp.where(s_key[:] <= ibt, s_key[:], _I32_MAX)
                return jnp.min(live)

            if variant == "select1":
                m = select()
                t_ref[pl.ds(row0, PACKET), :] = jnp.full(
                    (PACKET, 1), m, jnp.int32).astype(jnp.float32)
                return 0

            if variant == "walkfix":
                # fori over 8 FIXED chunk visits: fetch+test+store floor
                # without any select chain
                def vbody(i, acc):
                    ck = (p + i) % 16
                    base = ck * ROWS
                    pp = planes_ref[pl.ds(base, ROWS), :]
                    opx = (ox * pp[0:1] + oy * pp[1:2] + oz * pp[2:3]
                           + pp[3:4])
                    opy = (ox * pp[4:5] + oy * pp[5:6] + oz * pp[6:7]
                           + pp[7:8])
                    opz = (ox * pp[8:9] + oy * pp[9:10] + oz * pp[10:11]
                           + pp[11:12])
                    dpx = dx * pp[0:1] + dy * pp[1:2] + dz * pp[2:3]
                    dpy = dx * pp[4:5] + dy * pp[5:6] + dz * pp[6:7]
                    dpz = dx * pp[8:9] + dy * pp[9:10] + dz * pp[10:11]
                    t = -opz / dpz
                    u = opx + t * dpx
                    v = opy + t * dpy
                    ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) \
                        & (t > DELTA) & (t < lane_t[:])
                    lane_t[:] = jnp.where(ok, t, lane_t[:])
                    return acc
                lax.fori_loop(0, 8, vbody, 0)
                t_ref[pl.ds(row0, PACKET), :] = jnp.min(
                    lane_t[:], axis=1, keepdims=True)
                return 0

            if variant == "walksel":
                # while_loop of selects ONLY (no triangle work): the
                # select+branch chain cost in isolation
                def scond(m):
                    return m < _I32_MAX

                def sbody(m):
                    ck = m & 1023
                    s_key[:] = jnp.where(col == ck, _I32_MAX, s_key[:])
                    return select()

                m = lax.while_loop(scond, sbody, select())
                t_ref[pl.ds(row0, PACKET), :] = jnp.full(
                    (PACKET, 1), m, jnp.int32).astype(jnp.float32)
                return 0

            # full walk
            def cond(m):
                return m < _I32_MAX

            def visit(m):
                ck = m & 1023
                base = ck * ROWS
                pp = planes_ref[pl.ds(base, ROWS), :]
                opx = ox * pp[0:1] + oy * pp[1:2] + oz * pp[2:3] + pp[3:4]
                opy = ox * pp[4:5] + oy * pp[5:6] + oz * pp[6:7] + pp[7:8]
                opz = (ox * pp[8:9] + oy * pp[9:10] + oz * pp[10:11]
                       + pp[11:12])
                dpx = dx * pp[0:1] + dy * pp[1:2] + dz * pp[2:3]
                dpy = dx * pp[4:5] + dy * pp[5:6] + dz * pp[6:7]
                dpz = dx * pp[8:9] + dy * pp[9:10] + dz * pp[10:11]
                t = -opz / dpz
                u = opx + t * dpx
                v = opy + t * dpy
                ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) \
                    & (t > DELTA) & (t < lane_t[:])
                lane_t[:] = jnp.where(ok, t, lane_t[:])
                s_key[:] = jnp.where(col == ck, _I32_MAX, s_key[:])
                return select()

            lax.while_loop(cond, visit, select())
            t_ref[pl.ds(row0, PACKET), :] = jnp.min(
                lane_t[:], axis=1, keepdims=True)
            return 0

        if variant == "boxvec":
            # whole-block box test, no packet loop
            r = rays_ref[:]
            ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
            dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
            ivx = jnp.where(dx == 0.0, REAL_MAX,
                            1.0 / jnp.where(dx == 0.0, 1.0, dx))
            ivy = jnp.where(dy == 0.0, REAL_MAX,
                            1.0 / jnp.where(dy == 0.0, 1.0, dy))
            ivz = jnp.where(dz == 0.0, REAL_MAX,
                            1.0 / jnp.where(dz == 0.0, 1.0, dz))
            tx0 = (boxes_ref[0:1, :] - ox) * ivx
            ty0 = (boxes_ref[1:2, :] - oy) * ivy
            tz0 = (boxes_ref[2:3, :] - oz) * ivz
            tx1 = (boxes_ref[3:4, :] - ox) * ivx
            ty1 = (boxes_ref[4:5, :] - oy) * ivy
            tz1 = (boxes_ref[5:6, :] - oz) * ivz
            near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            hit_box = far >= jnp.maximum(near, DELTA)
            t_ref[:] = jnp.min(
                jnp.where(hit_box, near, REAL_MAX), axis=1,
                keepdims=True)
        else:
            lax.fori_loop(0, TN // PACKET, packet_body, 0)

    return kernel


def run_variant(variant, cp, rays, planes, boxes):
    n = rays.shape[0]

    @functools.partial(jax.jit, static_argnames=())
    def call(rays_, planes_, boxes_):
        out = pl.pallas_call(
            make_kernel(cp, variant),
            grid=(n // TN,),
            in_specs=[
                pl.BlockSpec((TN, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(planes_.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(boxes_.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((PACKET, cp), jnp.int32),
                pltpu.VMEM((PACKET, CHUNK), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(rays_, planes_, boxes_)
        def body(c, i):
            return c + out.sum(), None
        # out computed once; timing loop must recompute: fold iter into rays
        return out.sum()

    @jax.jit
    def run(rays_, planes_, boxes_):
        def body(c, i):
            rr = rays_.at[:, 0].add(i.astype(jnp.float32) * 1e-6)
            c2 = pl.pallas_call(
                make_kernel(cp, variant),
                grid=(n // TN,),
                in_specs=[
                    pl.BlockSpec((TN, 8), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(planes_.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(boxes_.shape, lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((PACKET, cp), jnp.int32),
                    pltpu.VMEM((PACKET, CHUNK), jnp.float32),
                ],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(rr, planes_, boxes_)
            return c + jnp.where(jnp.abs(c2) >= 3e38, 0.0, c2).sum(), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = timed(_null, rays)
    t = (timed(run, rays, planes, boxes) - oh) / ITERS
    return t


def main():
    from tinypathtracer_tpu import load_scene
    from tinypathtracer_tpu.models.envlight import gradient_sky
    from tinypathtracer_tpu.ops.packet import precompute_packet
    from tinypathtracer_tpu.render.integrator import TraceData
    from tinypathtracer_tpu.tools.lab5 import make_rays

    flat = load_scene("/root/reference/input/box.gltf").flatten(
        env_radiance=gradient_sky(16, 32))
    data = jax.jit(TraceData.from_scene)(flat)
    pk = jax.jit(precompute_packet)(data.tri_verts)
    n = 1 << 18
    o, d, _ = make_rays(flat, n, "pixel8")
    rays = jnp.concatenate(
        [o, d, jnp.ones((n, 1)), jnp.zeros((n, 1))], axis=1)
    cp = pk.boxes.shape[1]
    res = {}
    n_packets = n // PACKET
    for v in ("empty", "boxtest", "select1", "walkfix", "walksel",
              "walk"):
        t = run_variant(v, cp, rays, pk.planes, pk.boxes)
        res[v + "_ms"] = round(t * 1e3, 3)
        res[v + "_ns_per_packet"] = round(t / n_packets * 1e9, 1)
        print(json.dumps({v: res[v + "_ms"],
                          "ns/packet": res[v + "_ns_per_packet"]}),
              flush=True)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
