"""Reference-mode path-tracing MEGAKERNEL: the whole bounce loop as one
Pallas program per ray block.

This is the TPU re-design of the reference's `trace` megakernel
(path_tracer.cu:296-435): one CUDA thread there owns a pixel and loops
over bounces; here one grid step owns 128 rays on the LANE axis and
loops over bounces with every operand a natural [sublane x lane] tile.
The round-3/4 profiles (BASELINE.md) showed the modular pipeline spends
43% of the frame on XLA glue + dispatch around the intersection kernel;
this kernel removes both by construction: per-bounce state never leaves
vector registers, and a whole chunk's 8-bounce trace is ONE dispatch.

Key design points (all measured in tools/kernel_lab.py / tools/lab4.py):

  * Rays on LANES (128/block), triangle plane coefficients on SUBLANES
    ([TC, 1] columns broadcast against [1, 128] ray rows): the "vpu_rol"
    lab variant, bit-exact against the production rays-on-sublanes
    kernel, and the layout in which SHADING math runs on full-lane
    [1, 128] rows instead of [N, 1] columns (128x fewer registers).
  * SHARED-ORIGIN MULTI-QUERY: per bounce, the next-bounce ray, the
    reference's extra direct-emitter sample (path_tracer.cu:387-401)
    and all delta-light shadow rays (:265-286) leave from the SAME hit
    point, so one pass over the triangle chunks computes the origin
    transform (12 FMAs/pair) once and only the per-direction work
    (9 FMAs + epilogue) per query -- the round-1..3 pipelines paid the
    full per-pair cost twice per bounce in separate dispatches.
  * Shading fetch as an in-kernel ONE-HOT MATMUL on the MXU: the hit
    slot's 12 plane coefficients + 15 shading scalars arrive as one
    [32, Fp] @ [Fp, 128] dot in HIGHEST precision (exact: the one-hot
    side is exactly representable); (t, u, v) are then recomputed from
    the fetched planes with the same expression order as the chunk
    loop, so primal hit data is bit-identical to the modular path.
  * RNG streams are PRECOMPUTED threefry uniforms ([8*D, N], padded to
    8 rows per bounce for aligned dynamic slices), the exact draws
    `lane_uniform(fold_all(keys, depth), 6)` of the modular bounce loop
    -- images are bit-identical to the modular pipeline by key
    (measured on box/tir on real TPU and CPU interpret; delta-light
    scenes differ by FMA-contraction ulps only, ~1e-7 relative, bounded
    in tests/test_mega.py).
  * ENV lookups stay OUTSIDE the kernel: in reference mode a lane
    misses at most once (miss terminates, path_tracer.cu:358-362), so
    the kernel emits (throughput-at-miss, final direction) and an XLA
    epilogue adds `thr * env[texel(dir)]` once per lane -- no [H*W]-
    sized one-hot inside the kernel.
  * EARLY EXIT: the bounce loop is a `lax.while_loop` that stops when
    every lane in the block is dead (hit an emissive / missed); camera-
    coherent blocks die together, so trailing bounces cost nothing.

Differentiation: the kernel is primal-only. `trace_paths_mega` wraps it
in a custom VJP whose backward replays the MODULAR bounce loop
(render/integrator.trace_paths) under `jax.vjp` -- path-replay by the
same keys reproduces the identical estimator, so gradients are exactly
the modular ones (tests/test_grad.py semantics) at the cost of one
modular recompute in the backward pass.

Scope (static, checked by `mega_available`): reference estimator mode,
padded face count <= 8192 (the whole scene's planes + shading table
stay VMEM-resident; larger scenes use the packet traversal pipeline --
see MEGA_MAX_FACES for the measurements), <= 6 delta lights (unrolled;
the query-state scratch has 8 rows for 2 closest + L any-hit
directions). Textured scenes qualify since round 5: the kernel runs
hits-only (paths are texture-independent) and radiance comes from the
differentiable shading-only stored replay. TPT_MEGA_GATE=on opts into one slab
gate per triangle chunk (direction tests OR-ed, running-best 'hint' far
bounds, culling-only: bit-identical); measured not a win on the bundled
scenes, kept for spread-out geometry experiments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinypathtracer_tpu.utils.math3d import DELTA, REAL_MAX

LANES = 128
_I32_MAX = 2**31 - 1
PI = 3.141592653589793
# Scene-size ceiling for the megakernel. Large scenes were tried and
# MEASURED (round 4, BASELINE.md): with chunk-gated fori traversal +
# chunked one-hot fetches the 61k-face stress scene ran 47.8k rays/s at
# tc=512 and 46.6k at tc=2048 -- BOTH worse than the modular pipeline's
# SUPER-gated dense kernel (58.8k), and Mosaic compile time for the
# gated fori kernel is ~4-8 minutes. So the megakernel stays the
# small-scene fast path (2.7x on the box bench) and large scenes keep
# the modular gated pipeline.
MEGA_MAX_FACES = 8192
# Slab gates are opt-in (TPT_MEGA_GATE=on): measured culling-correct
# (bit-identical, tests/test_mega.py) but not a win on any bundled
# scene, and the gated kernel compiles ~4x slower.
# one-hot shading fetches accumulate over column blocks of this width
# once the [Fp, w] one-hot would no longer comfortably fit in VMEM
_FETCH_CHUNK = 2048

# shadeT row map (rows of the [32, Fp] fused table)
_ROW_PLANES = 0      # 12 rows: wx0..3, wy0..3, wz0..3
_ROW_NRM = 12        # 9 rows: corner normals n0 n1 n2 (xyz each)
_ROW_BASE = 21       # 3 rows: base color rgb
_ROW_EM = 24
_ROW_ETA = 25
_ROW_METAL = 26
_SHADE_ROWS = 32     # padded to a multiple of 8 sublanes


def _pick_tc(fp: int) -> int:
    for tc in (512, 256, 128):
        if fp % tc == 0:
            return tc
    raise ValueError(f"padded face count {fp} is not a multiple of 128")


# --------------------------------------------------------------------------
# In-kernel shading math: ORDER-PRESERVING transcriptions of
# ops/shading_c.py on [1, 128] rows (same expressions, same association,
# so results match the modular path bit-for-bit modulo backend
# transcendental lowering).
# --------------------------------------------------------------------------

def _dot3(ax, ay, az, bx, by, bz):
    return (ax * bx + ay * by) + az * bz


def _normalize3(ax, ay, az, eps):
    inv = lax.rsqrt(jnp.maximum((ax * ax + ay * ay) + az * az, eps))
    return ax * inv, ay * inv, az * inv


def _reflect3(dx, dy, dz, nx, ny, nz):
    k = 2.0 * _dot3(dx, dy, dz, nx, ny, nz)
    return dx - k * nx, dy - k * ny, dz - k * nz


def _onb3(nx, ny, nz):
    z_zero = nz == 0.0
    safe_nz = jnp.where(z_zero, 1.0, nz)
    rx = jnp.where(z_zero, 0.0, 1.0)
    rz = jnp.where(z_zero, 1.0, -nx / safe_nz)
    inv = lax.rsqrt(jnp.maximum(rx * rx + rz * rz, 0.0))
    tx, tz = rx * inv, rz * inv
    ty = jnp.zeros_like(tx)
    bx = ty * nz - tz * ny
    by = tz * nx - tx * nz
    bz = tx * ny - ty * nx
    return tx, ty, tz, bx, by, bz


def _hemi_cos3(u1, u2, nx, ny, nz):
    phi = 2.0 * PI * u1
    cos_t = jnp.sqrt(u2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    tx, ty, tz, bx, by, bz = _onb3(nx, ny, nz)
    a = jnp.cos(phi) * sin_t
    c = jnp.sin(phi) * sin_t
    dx = (a * tx + cos_t * nx) + c * bx
    dy = (a * ty + cos_t * ny) + c * by
    dz = (a * tz + cos_t * nz) + c * bz
    return dx, dy, dz, cos_t / PI


def _refract_ref3(dx, dy, dz, nx, ny, nz, ior):
    cos_i = _dot3(dx, dy, dz, nx, ny, nz)
    exiting = cos_i > 0.0
    ior_safe = jnp.where(ior > 0.0, ior, 1.0)
    eta = jnp.where(exiting, ior_safe, 1.0 / ior_safe)
    sx = jnp.where(exiting, -nx, nx)
    sy = jnp.where(exiting, -ny, ny)
    sz = jnp.where(exiting, -nz, nz)
    cos_i_abs = jnp.abs(cos_i)
    sin2_t = eta * eta * (1.0 - cos_i_abs * cos_i_abs)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - jnp.where(tir, 0.0, sin2_t), 0.0))
    k = cos_i_abs * eta - cos_t
    rx = jnp.where(tir, 0.0, eta * dx + k * sx)
    ry = jnp.where(tir, 0.0, eta * dy + k * sy)
    rz = jnp.where(tir, 0.0, eta * dz + k * sz)
    return rx, ry, rz, cos_i_abs, eta, tir


def _schlick3(cos_i, eta):
    f0 = (1.0 - eta) / (1.0 + eta)
    f0 = f0 * f0
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * m2 * m2 * m


def _sample_bsdf3(u1, u2, u3, dx, dy, dz, nx, ny, nz, eta, metallic):
    rfx, rfy, rfz, cos_i, eta_r, tir = _refract_ref3(
        dx, dy, dz, nx, ny, nz, eta)
    rlx, rly, rlz = _reflect3(dx, dy, dz, nx, ny, nz)
    fr = jnp.where(tir, 1.0, _schlick3(cos_i, eta_r))
    take_refl = u3 < fr
    ddx = jnp.where(take_refl, rlx, rfx)
    ddy = jnp.where(take_refl, rly, rfy)
    ddz = jnp.where(take_refl, rlz, rfz)

    sign = jnp.where(_dot3(dx, dy, dz, nx, ny, nz) > 0.0, -1.0, 1.0)
    nsx, nsy, nsz = nx * sign, ny * sign, nz * sign
    hx, hy, hz, pdf = _hemi_cos3(u1, u2, nsx, nsy, nsz)
    cos_o = _dot3(hx, hy, hz, nsx, nsy, nsz)
    atten = jnp.abs(cos_o) / PI
    diff_ratio = atten / jnp.maximum(pdf, 1e-12)

    is_dielec = eta > 0.0
    is_mirror = jnp.logical_and(~is_dielec, metallic > 0.0)
    is_specular = is_dielec | is_mirror

    ndx = jnp.where(is_dielec, ddx, jnp.where(is_mirror, rlx, hx))
    ndy = jnp.where(is_dielec, ddy, jnp.where(is_mirror, rly, hy))
    ndz = jnp.where(is_dielec, ddz, jnp.where(is_mirror, rlz, hz))
    ratio = jnp.where(is_specular, 1.0, diff_ratio)
    return ndx, ndy, ndz, ratio, is_specular


# --------------------------------------------------------------------------
# Kernel body
# --------------------------------------------------------------------------

def _make_mega_kernel(fp: int, tc: int, depth: int, n_lights: int,
                      w: int = LANES, gated: bool = False,
                      save_hits: bool = False):
    n_chunks = fp // tc

    def make_multi_query(planes_ref, boxes_ref, qt, qi):
        """Bind the query-state scratch (qt f32 [8,w], qi i32 [8,w]) and
        return a shared-origin multi-direction query function.

        One `lax.fori_loop` pass over the triangle chunks for several
        directions that share an origin. dirs: list of (dx, dy, dz)
        [1, w] rows; kinds: 'closest' -> (best_t, best_slot), 'any' ->
        occluded f32. qt row i / qi row i hold closest-dir i's running
        best; qt row n_closest+j holds any-dir j's occluded flag. The
        per-chunk epilogue matches the production dense kernel's tie
        semantics exactly (lowest morton slot among equal-t: chunks run
        in ascending slot order and only strictly-closer hits update).

        gated=True adds a per-(chunk, direction) slab gate: the chunk's
        AABB (boxes_ref, SMEM) is tested against every lane's ray with
        the running best as a far bound (the 'hint' mechanism), and the
        chunk's per-direction work runs only when some lane still needs
        it -- sublinear effective work for spread-out scenes, and the
        branch cost is amortized over a whole [tc, w] block (the round-3
        failure mode was per-CLUSTER gates in the per-bounce pipeline;
        here one gate guards tc*w*~25 ops)."""

        def multi_query_unrolled(ox, oy, oz, dirs, kinds):
            """Static-unroll variant for small ungated scenes: running
            bests live in registers, chunk slices are static. Measured
            (BASELINE.md) at 2.5M rays/s on the box bench where the
            fori_loop variant's dynamic slices cost a large factor."""
            bt = [jnp.full((1, w), REAL_MAX, jnp.float32)
                  for k in kinds if k == "closest"]
            bi = [jnp.zeros((1, w), jnp.int32)
                  for k in kinds if k == "closest"]
            occ = [jnp.zeros((1, w), jnp.float32)
                   for k in kinds if k == "any"]
            for ck in range(n_chunks):
                p = planes_ref[ck * tc:(ck + 1) * tc, :]      # [tc, 12]
                opx = (ox * p[:, 0:1] + oy * p[:, 1:2]
                       + oz * p[:, 2:3] + p[:, 3:4])
                opy = (ox * p[:, 4:5] + oy * p[:, 5:6]
                       + oz * p[:, 6:7] + p[:, 7:8])
                opz = (ox * p[:, 8:9] + oy * p[:, 9:10]
                       + oz * p[:, 10:11] + p[:, 11:12])
                ic = ia = 0
                for (dx, dy, dz), kind in zip(dirs, kinds):
                    dpx = dx * p[:, 0:1] + dy * p[:, 1:2] + dz * p[:, 2:3]
                    dpy = dx * p[:, 4:5] + dy * p[:, 5:6] + dz * p[:, 6:7]
                    dpz = dx * p[:, 8:9] + dy * p[:, 9:10] + dz * p[:, 10:11]
                    t = -opz / dpz
                    u = opx + t * dpx
                    v = opy + t * dpy
                    ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) \
                        & (t > DELTA)
                    if kind == "closest":
                        tcand = jnp.where(ok, t, REAL_MAX)
                        cmin = jnp.min(tcand, axis=0, keepdims=True)
                        rows = lax.broadcasted_iota(
                            jnp.int32, (tc, w), 0) + ck * tc
                        cid = jnp.min(
                            jnp.where(tcand == cmin, rows, _I32_MAX),
                            axis=0, keepdims=True)
                        better = cmin < bt[ic]
                        bi[ic] = jnp.where(better, cid, bi[ic])
                        bt[ic] = jnp.where(better, cmin, bt[ic])
                        ic += 1
                    else:
                        occ[ia] = jnp.maximum(
                            occ[ia],
                            jnp.max(ok.astype(jnp.float32), axis=0,
                                    keepdims=True))
                        ia += 1
            out, ic, ia = [], 0, 0
            for kind in kinds:
                if kind == "closest":
                    slot = jnp.where(bt[ic] >= REAL_MAX, -1, bi[ic])
                    out.append((bt[ic], slot))
                    ic += 1
                else:
                    out.append(occ[ia])
                    ia += 1
            return out

        def multi_query(ox, oy, oz, dirs, kinds):
            if not gated:
                return multi_query_unrolled(ox, oy, oz, dirs, kinds)
            n_cl = sum(1 for k in kinds if k == "closest")
            ic = ia = 0
            rows_of = []
            for k in kinds:
                if k == "closest":
                    qt[ic:ic + 1, :] = jnp.full((1, w), REAL_MAX,
                                                jnp.float32)
                    qi[ic:ic + 1, :] = jnp.zeros((1, w), jnp.int32)
                    rows_of.append(ic)
                    ic += 1
                else:
                    qt[n_cl + ia:n_cl + ia + 1, :] = jnp.zeros(
                        (1, w), jnp.float32)
                    rows_of.append(n_cl + ia)
                    ia += 1

            if gated:
                invs = []
                for (dx, dy, dz) in dirs:
                    invs.append(tuple(
                        jnp.where(dc == 0.0, REAL_MAX,
                                  1.0 / jnp.where(dc == 0.0, 1.0, dc))
                        for dc in (dx, dy, dz)))

            def chunk_body(ck, _):
                base = ck * tc

                def run_chunk():
                    p = planes_ref[pl.ds(base, tc), :]        # [tc, 12]
                    opx = (ox * p[:, 0:1] + oy * p[:, 1:2]
                           + oz * p[:, 2:3] + p[:, 3:4])
                    opy = (ox * p[:, 4:5] + oy * p[:, 5:6]
                           + oz * p[:, 6:7] + p[:, 7:8])
                    opz = (ox * p[:, 8:9] + oy * p[:, 9:10]
                           + oz * p[:, 10:11] + p[:, 11:12])
                    for di, ((dx, dy, dz), kind) in enumerate(
                            zip(dirs, kinds)):
                        row = rows_of[di]

                        def dir_work(dx=dx, dy=dy, dz=dz, kind=kind,
                                     row=row):
                            dpx = (dx * p[:, 0:1] + dy * p[:, 1:2]
                                   + dz * p[:, 2:3])
                            dpy = (dx * p[:, 4:5] + dy * p[:, 5:6]
                                   + dz * p[:, 6:7])
                            dpz = (dx * p[:, 8:9] + dy * p[:, 9:10]
                                   + dz * p[:, 10:11])
                            t = -opz / dpz
                            u = opx + t * dpx
                            v = opy + t * dpy
                            ok = (jnp.minimum(u, v) >= 0.0) \
                                & (u + v <= 1.0) & (t > DELTA)
                            if kind == "closest":
                                tcand = jnp.where(ok, t, REAL_MAX)
                                cmin = jnp.min(tcand, axis=0,
                                               keepdims=True)
                                rws = lax.broadcasted_iota(
                                    jnp.int32, (tc, w), 0) + base
                                cid = jnp.min(
                                    jnp.where(tcand == cmin, rws,
                                              _I32_MAX),
                                    axis=0, keepdims=True)
                                better = cmin < qt[row:row + 1, :]
                                qi[row:row + 1, :] = jnp.where(
                                    better, cid, qi[row:row + 1, :])
                                qt[row:row + 1, :] = jnp.where(
                                    better, cmin, qt[row:row + 1, :])
                            else:
                                qt[row:row + 1, :] = jnp.maximum(
                                    qt[row:row + 1, :],
                                    jnp.max(ok.astype(jnp.float32),
                                            axis=0, keepdims=True))

                        dir_work()

                if not gated:
                    run_chunk()
                else:
                    # ONE slab gate per chunk: OR the per-direction
                    # "some lane still needs this chunk" tests into a
                    # single [1, w] row, then a single scalar reduce +
                    # pl.when guards the whole chunk (per-direction
                    # whens and reduces multiplied Mosaic compile time
                    # ~8x for no measurable runtime win).
                    bx0, by0, bz0 = (boxes_ref[0, ck], boxes_ref[1, ck],
                                     boxes_ref[2, ck])
                    bx1, by1, bz1 = (boxes_ref[3, ck], boxes_ref[4, ck],
                                     boxes_ref[5, ck])
                    valid = boxes_ref[6, ck]
                    need_any = None
                    for di, ((dx, dy, dz), kind) in enumerate(
                            zip(dirs, kinds)):
                        ivx, ivy, ivz = invs[di]
                        tx0 = (bx0 - ox) * ivx
                        ty0 = (by0 - oy) * ivy
                        tz0 = (bz0 - oz) * ivz
                        tx1 = (bx1 - ox) * ivx
                        ty1 = (by1 - oy) * ivy
                        tz1 = (bz1 - oz) * ivz
                        near = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        far = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        hit_box = far >= jnp.maximum(near, DELTA)
                        row = rows_of[di]
                        if kind == "closest":
                            need = hit_box & (near <= qt[row:row + 1, :])
                        else:
                            need = hit_box & (qt[row:row + 1, :] == 0.0)
                        need_any = need if need_any is None \
                            else (need_any | need)
                    need_s = jnp.max(need_any.astype(jnp.float32)) * valid
                    pl.when(need_s > 0.0)(run_chunk)
                return 0

            lax.fori_loop(0, n_chunks, chunk_body, 0)

            out, ic, ia = [], 0, 0
            for kind in kinds:
                if kind == "closest":
                    bt = qt[ic:ic + 1, :]
                    slot = jnp.where(bt >= REAL_MAX, -1, qi[ic:ic + 1, :])
                    out.append((bt, slot))
                    ic += 1
                else:
                    out.append(qt[n_cl + ia:n_cl + ia + 1, :])
                    ia += 1
            return out

        return multi_query

    # VMEM state-scratch row map (loop-carried per-lane state lives in a
    # scratch buffer, NOT in while_loop carries: Mosaic cannot yet carry
    # [1, 128] vectors through a while_loop -- "Not implemented: Sublane
    # broadcast" -- and scratch rows give well-defined layouts anyway)
    _OX, _OY, _OZ, _DX, _DY, _DZ = 0, 1, 2, 3, 4, 5
    _TR, _TG, _TB, _RR, _RG, _RB = 6, 7, 8, 9, 10, 11
    _MR, _MG, _MB, _ALIVE, _T = 12, 13, 14, 15, 16

    def kernel(rays_ref, u_ref, planes_ref, shadeT_ref, boxes_ref,
               lights_ref, out_ref, *rest):
        if save_hits:
            hits_ref, st, sti, qt, qi, fbuf = rest
        else:
            hits_ref = None
            st, sti, qt, qi, fbuf = rest
        r = rays_ref[:]                                     # [8, 128]
        ox, oy, oz = r[0:1], r[1:2], r[2:3]
        dx, dy, dz = r[4:5], r[5:6], r[6:7]
        multi_query = make_multi_query(planes_ref, boxes_ref, qt, qi)

        def fetch_rows(slot, row_lo, row_n):
            """Shading-table rows [row_lo:row_lo+row_n] of the hit slot
            as a [row_n, w] one-hot matmul (exact in HIGHEST precision).
            Large tables run as a fori accumulation over _FETCH_CHUNK
            columns so the [Fp, w] one-hot never materializes whole."""
            if fp <= _FETCH_CHUNK:
                riota = lax.broadcasted_iota(jnp.int32, (fp, w), 0)
                oh = (riota == slot).astype(jnp.float32)     # [Fp, w]
                return jnp.dot(shadeT_ref[row_lo:row_lo + row_n, :], oh,
                               precision=lax.Precision.HIGHEST)
            fbuf[0:row_n, :] = jnp.zeros((row_n, w), jnp.float32)

            def body(gk, _):
                base = gk * _FETCH_CHUNK
                riota = lax.broadcasted_iota(
                    jnp.int32, (_FETCH_CHUNK, w), 0) + base
                oh = (riota == slot).astype(jnp.float32)
                fbuf[0:row_n, :] += jnp.dot(
                    shadeT_ref[row_lo:row_lo + row_n,
                               pl.ds(base, _FETCH_CHUNK)],
                    oh, precision=lax.Precision.HIGHEST)
                return 0

            lax.fori_loop(0, fp // _FETCH_CHUNK, body, 0)
            return fbuf[0:row_n, :]

        def fetch32(slot):
            return fetch_rows(slot, 0, _SHADE_ROWS)

        def fetch_em(slot):
            return fetch_rows(slot, _ROW_EM, 1)

        # camera query (single direction)
        ((t0, slot0),) = multi_query(ox, oy, oz,
                                     [(dx, dy, dz)], ["closest"])

        zeros = jnp.zeros((1, w), jnp.float32)
        ones = jnp.ones((1, w), jnp.float32)
        st[_OX:_OX + 1, :] = ox
        st[_OY:_OY + 1, :] = oy
        st[_OZ:_OZ + 1, :] = oz
        st[_DX:_DX + 1, :] = dx
        st[_DY:_DY + 1, :] = dy
        st[_DZ:_DZ + 1, :] = dz
        for row in (_TR, _TG, _TB, _ALIVE):
            st[row:row + 1, :] = ones
        for row in (_RR, _RG, _RB, _MR, _MG, _MB):
            st[row:row + 1, :] = zeros
        st[_T:_T + 1, :] = t0
        st[_T + 1:24, :] = jnp.zeros((24 - _T - 1, w), jnp.float32)
        sti[0:1, :] = slot0
        sti[1:8, :] = jnp.zeros((7, w), jnp.int32)
        if save_hits:
            # Bounces the early exit never reaches must read back as
            # "dead lane / miss" for the shading-only replay: slot rows
            # (row % 8 == 0) init to -1, t rows (== 1) to REAL_MAX.
            rowi = lax.broadcasted_iota(jnp.int32, (depth * 8, w), 0) % 8
            hits_ref[:] = jnp.where(
                rowi == 0, -1.0, jnp.where(rowi == 1, REAL_MAX, 0.0))

        def cond(c):
            dep, alive_any = c
            return (dep < depth) & (alive_any > 0.0)

        def body(c):
            dep, _ = c
            ox, oy, oz = (st[_OX:_OX + 1, :], st[_OY:_OY + 1, :],
                          st[_OZ:_OZ + 1, :])
            dx, dy, dz = (st[_DX:_DX + 1, :], st[_DY:_DY + 1, :],
                          st[_DZ:_DZ + 1, :])
            tr, tg, tb = (st[_TR:_TR + 1, :], st[_TG:_TG + 1, :],
                          st[_TB:_TB + 1, :])
            rr, rg, rb = (st[_RR:_RR + 1, :], st[_RG:_RG + 1, :],
                          st[_RB:_RB + 1, :])
            mr, mg, mb = (st[_MR:_MR + 1, :], st[_MG:_MG + 1, :],
                          st[_MB:_MB + 1, :])
            aliveF = st[_ALIVE:_ALIVE + 1, :]
            t = st[_T:_T + 1, :]
            slot = sti[0:1, :]
            alive = aliveF > 0.0
            u = u_ref[pl.ds(dep * 8, 8), :]                  # [8, 128]
            u0, u1, u2 = u[0:1], u[1:2], u[2:3]
            u3, u4 = u[3:4], u[4:5]

            miss = slot < 0
            count_env = alive & miss
            mr = jnp.where(count_env, tr, mr)
            mg = jnp.where(count_env, tg, mg)
            mb = jnp.where(count_env, tb, mb)

            blk = fetch32(jnp.maximum(slot, 0))              # [32, 128]
            # (t, u, v) recomputed from the winner's planes with the
            # chunk loop's exact expression order -> bit-identical hit
            # data (integrator consumes the intersector's own t/u/v).
            p = blk
            opx = ox * p[0:1] + oy * p[1:2] + oz * p[2:3] + p[3:4]
            opy = ox * p[4:5] + oy * p[5:6] + oz * p[6:7] + p[7:8]
            opz = ox * p[8:9] + oy * p[9:10] + oz * p[10:11] + p[11:12]
            dpx = dx * p[0:1] + dy * p[1:2] + dz * p[2:3]
            dpy = dx * p[4:5] + dy * p[5:6] + dz * p[6:7]
            dpz = dx * p[8:9] + dy * p[9:10] + dz * p[10:11]
            tw = -opz / dpz
            uw = opx + tw * dpx
            vw = opy + tw * dpy
            tsafe = jnp.where(miss, 1.0, tw)
            ww = 1.0 - uw - vw

            nx = (ww * blk[_ROW_NRM + 0:_ROW_NRM + 1]
                  + uw * blk[_ROW_NRM + 3:_ROW_NRM + 4]) \
                + vw * blk[_ROW_NRM + 6:_ROW_NRM + 7]
            ny = (ww * blk[_ROW_NRM + 1:_ROW_NRM + 2]
                  + uw * blk[_ROW_NRM + 4:_ROW_NRM + 5]) \
                + vw * blk[_ROW_NRM + 7:_ROW_NRM + 8]
            nz = (ww * blk[_ROW_NRM + 2:_ROW_NRM + 3]
                  + uw * blk[_ROW_NRM + 5:_ROW_NRM + 6]) \
                + vw * blk[_ROW_NRM + 8:_ROW_NRM + 9]
            nx, ny, nz = _normalize3(nx, ny, nz, 1e-20)
            hx = ox + tsafe * dx
            hy = oy + tsafe * dy
            hz = oz + tsafe * dz

            br = blk[_ROW_BASE + 0:_ROW_BASE + 1]
            bg = blk[_ROW_BASE + 1:_ROW_BASE + 2]
            bb = blk[_ROW_BASE + 2:_ROW_BASE + 3]
            em = blk[_ROW_EM:_ROW_EM + 1]
            eta = blk[_ROW_ETA:_ROW_ETA + 1]
            metallic = blk[_ROW_METAL:_ROW_METAL + 1]

            emissive = em > 0.0
            hit_em = jnp.where(alive & ~miss & emissive, em, 0.0)
            rr = rr + tr * hit_em
            rg = rg + tg * hit_em
            rb = rb + tb * hit_em

            live = alive & ~miss & ~emissive
            liveF = live.astype(jnp.float32)

            ndx, ndy, ndz, ratio, _is_spec = _sample_bsdf3(
                u0, u1, u2, dx, dy, dz, nx, ny, nz, eta, metallic)
            wr, wg, wb = br * ratio, bg * ratio, bb * ratio

            # extra direct-emitter sample (diffuse lanes), cosine
            # hemisphere around the incident-side normal
            do_extra = ~((eta >= 1.0) | (metallic > 0.0))
            sgn = jnp.where(_dot3(dx, dy, dz, nx, ny, nz) > 0.0, -1.0, 1.0)
            d2x, d2y, d2z, _pdf2 = _hemi_cos3(
                u3, u4, nx * sgn, ny * sgn, nz * sgn)

            dirs = [(ndx, ndy, ndz), (d2x, d2y, d2z)]
            kinds = ["closest", "closest"]
            lw = []
            for li in range(n_lights):
                kind_l = lights_ref[li, 0]
                lpx, lpy, lpz = (lights_ref[li, 5], lights_ref[li, 6],
                                 lights_ref[li, 7])
                ldx, ldy, ldz = (lights_ref[li, 8], lights_ref[li, 9],
                                 lights_ref[li, 10])
                tlx, tly, tlz = lpx - hx, lpy - hy, lpz - hz
                dist_ps = jnp.sqrt(jnp.maximum(
                    _dot3(tlx, tly, tlz, tlx, tly, tlz), 1e-20))
                is_dir = kind_l == 1.0
                wix = jnp.where(is_dir, -ldx, tlx / dist_ps)
                wiy = jnp.where(is_dir, -ldy, tly / dist_ps)
                wiz = jnp.where(is_dir, -ldz, tlz / dist_ps)
                dist = jnp.where(is_dir, 0.0, dist_ps)
                cos_theta = _dot3(-wix, -wiy, -wiz, ldx, ldy, ldz)
                cone = jnp.square(jnp.clip(
                    (cos_theta - lights_ref[li, 11]) * lights_ref[li, 12],
                    0.0, 1.0))
                falloff = jnp.where(kind_l == 2.0, cone, 1.0)
                d2_ = dist * dist
                atten = (1.0 / (d2_ + 1.0)) * jnp.square(
                    jnp.clip(1.0 - jnp.square(d2_ * 0.01), 0.0, 1.0))
                fa = falloff * atten
                lw.append((wix, wiy, wiz,
                           lights_ref[li, 1] * lights_ref[li, 4] * fa,
                           lights_ref[li, 2] * lights_ref[li, 4] * fa,
                           lights_ref[li, 3] * lights_ref[li, 4] * fa))
                dirs.append((wix, wiy, wiz))
                kinds.append("any")

            res = multi_query(hx, hy, hz, dirs, kinds)
            (tn, slot_n), (_t2, slot2) = res[0], res[1]

            em2 = fetch_em(jnp.maximum(slot2, 0))
            em2 = jnp.where((slot2 >= 0) & do_extra, em2, 0.0)
            dr = dg = db = em2
            for li in range(n_lights):
                occl = res[2 + li]
                wix, wiy, wiz, lr, lg, lb = lw[li]
                unocc = occl == 0.0
                dr = dr + jnp.where(unocc, br * lr, 0.0)
                dg = dg + jnp.where(unocc, bg * lg, 0.0)
                db = db + jnp.where(unocc, bb * lb, 0.0)

            rr = rr + jnp.where(live, tr * wr * dr, 0.0)
            rg = rg + jnp.where(live, tg * wg * dg, 0.0)
            rb = rb + jnp.where(live, tb * wb * db, 0.0)

            if save_hits:
                # Per-bounce hit residuals for the shading-only replay
                # backward (trace_paths_mega): masked exactly as the
                # modular pipeline's intersector calls would report
                # (mask=False -> fid -1 / t REAL_MAX / uv 0), so the
                # replay from these rows is bit-identical to the dense
                # replay.
                hitm = alive & ~miss
                slot_row = jnp.where(alive, slot, -1).astype(jnp.float32)
                t_row = jnp.where(hitm, tw, REAL_MAX)
                u_row = jnp.where(hitm, uw, 0.0)
                v_row = jnp.where(hitm, vw, 0.0)
                s2_row = jnp.where(live & do_extra & (slot2 >= 0),
                                   slot2, -1).astype(jnp.float32)
                occm = zeros
                for li in range(n_lights):
                    occm = occm + res[2 + li] * float(1 << li)
                hits_ref[pl.ds(dep * 8, 8), :] = jnp.concatenate(
                    [slot_row, t_row, u_row, v_row, s2_row, occm,
                     jnp.zeros((2, w), jnp.float32)], axis=0)

            st[_TR:_TR + 1, :] = jnp.where(live, tr * wr, tr)
            st[_TG:_TG + 1, :] = jnp.where(live, tg * wg, tg)
            st[_TB:_TB + 1, :] = jnp.where(live, tb * wb, tb)
            st[_OX:_OX + 1, :] = jnp.where(live, hx, ox)
            st[_OY:_OY + 1, :] = jnp.where(live, hy, oy)
            st[_OZ:_OZ + 1, :] = jnp.where(live, hz, oz)
            st[_DX:_DX + 1, :] = jnp.where(live, ndx, dx)
            st[_DY:_DY + 1, :] = jnp.where(live, ndy, dy)
            st[_DZ:_DZ + 1, :] = jnp.where(live, ndz, dz)
            st[_RR:_RR + 1, :] = rr
            st[_RG:_RG + 1, :] = rg
            st[_RB:_RB + 1, :] = rb
            st[_MR:_MR + 1, :] = mr
            st[_MG:_MG + 1, :] = mg
            st[_MB:_MB + 1, :] = mb
            st[_ALIVE:_ALIVE + 1, :] = liveF
            st[_T:_T + 1, :] = tn
            sti[0:1, :] = slot_n
            return dep + 1, jnp.max(liveF)

        lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(1.0)))

        out_ref[0:3, :] = st[_RR:_RR + 3, :]
        out_ref[3:6, :] = st[_MR:_MR + 3, :]
        out_ref[6:9, :] = st[_DX:_DX + 3, :]
        out_ref[9:16, :] = jnp.zeros((7, w), jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("depth", "n_lights",
                                              "interpret", "w", "gated",
                                              "tc_req", "save_hits"))
def _mega_pallas(rays8, u8d, planesT, shadeT, boxes, lights, depth: int,
                 n_lights: int, interpret: bool = False, w: int = LANES,
                 gated: bool = False, tc_req: int = 0,
                 save_hits: bool = False):
    """rays8 [8, N]; u8d [8*depth, N]; planesT [Fp, 12]; shadeT [32, Fp];
    boxes [8, n_chunks]; lights [max(L,1), 16]. Returns [16, N] packed
    rows (see kernel), plus -- when save_hits -- an [8*depth, N] f32
    per-bounce hit-residual block (rows per bounce: slot, t, u, v,
    slot2, occmask, 0, 0). w = rays per grid block (lane width of every
    per-lane tile): wider blocks amortize the per-chunk plane-
    coefficient broadcasts over more rays at the cost of larger
    in-kernel transients."""
    n = rays8.shape[1]
    fp = planesT.shape[0]
    tc = tc_req or _pick_tc(fp)
    if fp % tc:
        tc = _pick_tc(fp)
    grid = (n // w,)
    out_specs = [pl.BlockSpec((16, w), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((16, n), jnp.float32)]
    if save_hits:
        out_specs.append(pl.BlockSpec((8 * depth, w), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((8 * depth, n), jnp.float32))
    out = pl.pallas_call(
        _make_mega_kernel(fp, tc, depth, n_lights, w, gated,
                          save_hits=save_hits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * depth, w), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, 12), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SHADE_ROWS, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(lights.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((24, w), jnp.float32),       # per-lane f32 state
            pltpu.VMEM((8, w), jnp.int32),          # per-lane hit slot
            pltpu.VMEM((8, w), jnp.float32),        # query best-t / occl
            pltpu.VMEM((8, w), jnp.int32),          # query best slot
            pltpu.VMEM((_SHADE_ROWS, w), jnp.float32),  # chunked fetch acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the chunk loop's transients exceed the 16 MB default
            # scoped-vmem budget; v5e has headroom
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rays8, u8d, planesT, shadeT, boxes, lights)
    return out if save_hits else out[0]


def _scene_blocks(data, woop, tc_req: int = 0):
    """Morton-slot-indexed fused table [32, Fp] + planes [Fp, 12] +
    per-chunk gate AABBs [8, Fp/tc] (rows 0-2 bmin, 3-5 bmax, 6 valid)."""
    fp = woop.n_padded
    planesT = jnp.concatenate([woop.wx.T, woop.wy.T, woop.wz.T], axis=1)
    planes_rows = jnp.concatenate([woop.wx, woop.wy, woop.wz], axis=0)
    shade_m = data.shade_packT[:15, woop.perm]               # [15, Fp]
    # padding slots never win a closest-hit (their planes are all-zero
    # -> t = NaN -> rejected), but zero their emission anyway so a
    # garbage slot id can never read a real face's emission.
    valid = (jnp.arange(fp) < woop.n_faces)
    shade_m = shade_m * valid[None, :].astype(shade_m.dtype)
    shadeT = jnp.concatenate([
        planes_rows, shade_m,
        jnp.zeros((_SHADE_ROWS - 12 - 15, fp), jnp.float32)], axis=0)

    # gate boxes at triangle-chunk granularity, morton order; padding
    # faces contribute inverted boxes, all-padding chunks get valid=0
    tc = tc_req or _pick_tc(fp)
    if fp % tc:
        tc = _pick_tc(fp)
    tv = data.tri_verts[woop.perm]                           # [Fp, 3, 3]
    fb_min = jnp.where(valid[:, None], jnp.min(tv, axis=1), REAL_MAX)
    fb_max = jnp.where(valid[:, None], jnp.max(tv, axis=1), -REAL_MAX)
    n_ck = fp // tc
    ck_min = fb_min.reshape(n_ck, tc, 3).min(axis=1)         # [C, 3]
    ck_max = fb_max.reshape(n_ck, tc, 3).max(axis=1)
    ck_valid = (jnp.arange(n_ck) * tc < woop.n_faces)
    boxes = jnp.concatenate(
        [ck_min.T, ck_max.T, ck_valid[None].astype(jnp.float32),
         jnp.zeros((1, n_ck), jnp.float32)], axis=0)         # [8, C]
    return planesT, shadeT, boxes


def _lights_block(data):
    l = data.light_kind.shape[0]
    if l == 0:
        return jnp.zeros((1, 16), jnp.float32)
    rows = jnp.concatenate([
        data.light_kind.astype(jnp.float32)[:, None],
        data.light_color,
        data.light_intensity[:, None],
        data.light_pos,
        data.light_dir,
        data.light_cos_outer[:, None],
        data.light_inv_cone[:, None],
        jnp.zeros((l, 3), jnp.float32)], axis=1)
    return rows


def _is_textured(data) -> bool:
    return (data.tex_atlas.shape[0] > 1 or data.tex_atlas.shape[1] > 1
            or data.tex_atlas.shape[2] > 1)


def mega_available(data, cfg, woop=None) -> bool:
    """Static compatibility: reference mode, VMEM-resident scene, and
    few enough delta lights for the query-state scratch (2 closest + L
    any-hit rows must fit the 8-row qt/qi buffers). Textured scenes
    qualify since round 5: path geometry is texture-independent (texels
    only modulate base color, never directions/termination), so the
    kernel's stored hit residuals are valid and radiance comes from the
    shading-only replay, which handles textures."""
    if cfg.mode != "reference":
        return False
    if data.light_kind.shape[0] > 6:
        return False
    if woop is not None and woop.n_padded > MEGA_MAX_FACES:
        return False
    return True


def mega_enabled(data, cfg, woop=None) -> bool:
    impl = getattr(cfg, "mega_impl", "auto")
    if impl == "off" or not getattr(cfg, "megakernel", True):
        return False
    if not mega_available(data, cfg, woop):
        return False
    if impl == "interpret":
        return True
    return jax.default_backend() == "tpu"


def trace_paths_mega(data, cfg, origins, dirs, lane_keys):
    """Megakernel trace with stored-hit (default) or modular-replay
    gradients.

    Signature mirrors integrator.trace_paths minus the hit fn: both the
    primal's tables and the backward replay's dense intersector are
    rebuilt from `data` INSIDE the custom-vjp functions, so no tracer is
    ever captured by closure (a hit fn passed in would close over the
    caller's traced woop arrays, which breaks under jax.custom_vjp when
    the whole scene is differentiated, e.g. diff/invrender).

    cfg.mega_bwd selects the backward:
      "stored" (default): the forward kernel also records per-bounce
        hit residuals (slot, t, u, v, extra-direct slot, light-occlusion
        bits); the backward replays ONLY the shading math on them
        (integrator.trace_paths with stored_hits) -- zero intersection
        dispatches in the whole train step. The residuals are
        bit-identical to what the dense intersector would report, so
        gradients equal the full replay's exactly.
      "replay": round-4 behavior -- the backward re-traces everything
        through the modular pipeline's dense intersector.
    """
    from tinypathtracer_tpu.ops.sampling import fold_all, lane_uniform
    from tinypathtracer_tpu.ops.shading_c import env_texel_c
    from tinypathtracer_tpu.render.integrator import _gather_1d, trace_paths

    n = origins.shape[0]
    d_depth = cfg.max_depth
    interpret = getattr(cfg, "mega_impl", "auto") == "interpret"
    bwd_mode = getattr(cfg, "mega_bwd", "stored")

    def primal(data_, origins_, dirs_, keys_, save_hits=False):
        # exact modular RNG streams, one padded [8, N] band per bounce
        bands = []
        for dep in range(d_depth):
            u = lane_uniform(fold_all(keys_, dep), 6)        # [N, 6]
            bands.append(jnp.concatenate(
                [u.T, jnp.zeros((2, n), jnp.float32)], axis=0))
        u8d = jnp.concatenate(bands, axis=0)                 # [8D, N]
        # rebuild the woop tables from data_ under stop_gradient rather
        # than closing over the caller's (custom_vjp primals must not
        # capture tracers); XLA CSEs this against prepare_state's copy
        # inside the same jitted frame.
        from tinypathtracer_tpu.ops.dense import precompute_woop

        sg = jax.tree_util.tree_map(lax.stop_gradient, data_)
        woop_ = precompute_woop(sg.tri_verts)
        tc_req = getattr(cfg, "mega_tc", 0)
        planesT, shadeT, boxes = _scene_blocks(sg, woop_, tc_req)
        lights = _lights_block(sg)
        gated = getattr(cfg, "mega_gate", "off") == "on"
        # measured on v5e (BASELINE.md): W=128 -> 2.14M rays/s,
        # W=256 -> 2.54M, W=512 -> 2.57M on the box bench; 256 is the
        # default (512 is ~1% faster but doubles in-kernel transients)
        w = getattr(cfg, "mega_w", 256)
        pad = (-n) % w
        o = jnp.pad(origins_, ((0, pad), (0, 0)))
        dd = jnp.pad(dirs_, ((0, pad), (0, 0)),
                     constant_values=0.0).at[n:, 2].set(1.0) \
            if pad else dirs_
        rays8 = jnp.concatenate(
            [o.T, jnp.zeros((1, n + pad), jnp.float32),
             dd.T, jnp.zeros((1, n + pad), jnp.float32)], axis=0)
        u_p = jnp.pad(u8d, ((0, 0), (0, pad))) if pad else u8d
        res = _mega_pallas(rays8, u_p, planesT, shadeT, boxes, lights,
                           depth=d_depth,
                           n_lights=int(data_.light_kind.shape[0]),
                           interpret=interpret, w=w, gated=gated,
                           tc_req=tc_req, save_hits=save_hits)
        out = res[0] if save_hits else res
        rad = out[0:3, :n]                                   # [3, N]
        mthr = out[3:6, :n]
        mdx, mdy, mdz = out[6, :n], out[7, :n], out[8, :n]
        eh, ew = data_.env_radiance.shape[0], data_.env_radiance.shape[1]
        etex = env_texel_c(eh, ew, mdx, mdy, mdz)
        er = _gather_1d(data_.env_r, etex) * cfg.env_scale
        eg = _gather_1d(data_.env_g, etex) * cfg.env_scale
        eb = _gather_1d(data_.env_b, etex) * cfg.env_scale
        rr = rad[0] + mthr[0] * er
        rg = rad[1] + mthr[1] * eg
        rb = rad[2] + mthr[2] * eb
        rad3 = jnp.stack([rr, rg, rb], axis=1)
        if not save_hits:
            return rad3
        # Unpack the per-bounce hit residuals into the stored_hits
        # layout of integrator.trace_paths (morton slots -> original
        # face ids via the woop permutation, matching
        # closest_hit_dense's return convention).
        hr = lax.stop_gradient(res[1][:, :n]).reshape(d_depth, 8, n)
        slot = hr[:, 0].astype(jnp.int32)
        fid = jnp.where(slot >= 0, woop_.perm[jnp.maximum(slot, 0)], -1)
        t = hr[:, 1]
        uv = jnp.stack([hr[:, 2], hr[:, 3]], axis=-1)        # [D, N, 2]
        slot2 = hr[:, 4].astype(jnp.int32)
        fid2 = jnp.where(slot2 >= 0,
                         woop_.perm[jnp.maximum(slot2, 0)], -1)
        occ = hr[:, 5].astype(jnp.int32)
        return rad3, (fid, t, uv, fid2, occ)

    if _is_textured(data):
        # Textured fast path: the kernel's shading ignores texels, but
        # the PATHS it traces are exactly the textured pipeline's (base
        # color never influences directions, hits, or termination), so
        # run it hits-only under stop_gradient and compute the real
        # textured radiance with the shading-only stored replay -- which
        # is differentiable end-to-end (incl. texel gradients) with no
        # custom VJP needed: the backward replays shading math on the
        # same residuals, zero intersection dispatches.
        sgd = jax.tree_util.tree_map(lax.stop_gradient, data)
        _rad, hits = primal(sgd, lax.stop_gradient(origins),
                            lax.stop_gradient(dirs), lane_keys,
                            save_hits=True)
        return trace_paths(data, cfg, None, origins, dirs, lane_keys,
                           stored_hits=hits)

    @jax.custom_vjp
    def f(data_, origins_, dirs_, keys_):
        return primal(data_, origins_, dirs_, keys_)

    def fwd(data_, origins_, dirs_, keys_):
        if bwd_mode == "stored":
            out, hits = primal(data_, origins_, dirs_, keys_,
                               save_hits=True)
            return out, (data_, origins_, dirs_, keys_, hits)
        return (primal(data_, origins_, dirs_, keys_),
                (data_, origins_, dirs_, keys_, None))

    def bwd(res, ct):
        data_, origins_, dirs_, keys_, hits = res
        from tinypathtracer_tpu.ops.dense import (closest_hit_dense,
                                                  precompute_woop)

        def replay(dd, oo, di):
            if hits is not None:
                return trace_paths(dd, cfg, None, oo, di, keys_,
                                   stored_hits=hits)
            woop_ = precompute_woop(lax.stop_gradient(dd.tri_verts))
            hit = functools.partial(closest_hit_dense, woop=woop_)
            return trace_paths(dd, cfg, hit, oo, di, keys_)

        _, vjp = jax.vjp(replay, data_, origins_, dirs_)
        gd, go, gdi = vjp(ct)
        return (gd, go, gdi, None)

    f.defvjp(fwd, bwd)
    return f(data, origins, dirs, lane_keys)
