"""Dense ray x triangle closest-hit: the TPU speed-of-light intersector.

For the scene sizes the reference ships (box/ball/tir: a few thousand
faces, input/*.gltf), testing EVERY ray against EVERY triangle as
regular 2D [rays x tris] vector work beats tree traversal on a TPU:
traversal (`traverseBVH`, path_tracer.cu:61-107) is a data-dependent
loop of scalar gathers -- exactly what a lockstep 8x128-lane machine is
worst at -- while the dense formulation is branch-free VPU arithmetic
with zero gathers, zero divergence, and a trip count known at compile
time.

Two layers:

  * `precompute_woop` re-expresses each triangle as Woop's unit-triangle
    affine transform [Woop et al. 2013-style]: rows of M^-1 for
    M = [e1 e2 n], so a hit test becomes
        o' = W o + c,  d' = W d,
        t = -o'_z / d'_z,  u = o'_x + t d'_x,  v = o'_y + t d'_y,
        hit iff u >= 0, v >= 0, u + v <= 1, DELTA < t < best.
    That is ~21 fused multiply-adds + ~14 cheap VPU ops per (ray, tri)
    pair -- vs ~60 for inline Moller-Trumbore -- and all per-triangle
    work is hoisted out of the hot loop. Triangle data is stored as
    component planes wx/wy/wz [4, F] so every hot-loop operand is a
    natural [sublane x lane] 2D tile (rays on sublanes, triangles on
    lanes).

  * `closest_hit_dense` runs the test as a branch-free Pallas kernel
    (grid over ray tiles x tri tiles, lane-local running best, one
    cross-lane argmin per ray tile at the last grid step, everything
    VMEM-resident); on CPU an jnp scan with identical hit semantics, so
    images match across backends.

Why branch-free (round-3 kernel lab, tools/kernel_lab.py): the round-2
kernel gated every 128-triangle morton cluster behind a slab test +
cross-lane `any` + `@pl.when` branch and stable-partitioned masked-off
rays into skippable tiles. Measured on the real chip, that machinery
COSTS more than it saves at every coherence level: 24.8 Gpairs/s
(production r2) vs 63.9 Gpairs/s (branch-free) on incoherent rays, and
even fully coherent camera-ray tiles ran 43.3 ms gated vs 33.6 ms bare
per 1M x 2048 dispatch. The XLA-side stable partition cost another
~33 ms per masked call (gathers run at ~150-650 M elem/s on this
backend) -- ~2.1 s/frame at 64 calls, half the round-2 frame. So: no
per-cluster gates, no partitioning; `mask` is semantics only (forced
miss, applied as a post-mask). For LARGE scenes where skipping whole
regions is worth a branch, `SUPER`-granularity gating (1024 triangles
per gate, amortizing the branch cost 8x) is enabled automatically --
see `_GATE_MIN_FACES`.

Hit semantics match `closest_hit_bruteforce` (ops/intersect.py), i.e.
the reference's acceptance rules (geometry_queries.h:66-86 +
path_tracer.cu:81-89): no backface culling, degenerate triangles never
hit, ties on t resolve to the lowest face id.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tinypathtracer_tpu.utils.math3d import DELTA, REAL_MAX, vcross, vdot

# Tile sizes: rays on sublanes, triangles on lanes. TF is a multiple of
# 128 (lane width); TN a multiple of 8 (f32 sublane tile). CLUSTER is
# the lane-block width of the inner loop (one [TN x CLUSTER] VPU block
# per step); SUPER is the gating granularity for large scenes: morton-
# sorted runs of SUPER triangles get an AABB, and the kernel slab-tests
# a ray tile against it before paying for the run's 8 blocks. Gating is
# only a win when the skip saves much more than the branch costs --
# measured break-even is ~8 blocks per gate (tools/kernel_lab.py).
TILE_RAYS = 256
TILE_TRIS = 4096
CLUSTER = 128
SUPER = 1024
# Scenes smaller than this run the pure branch-free kernel: gates can
# only lose when there are this few SUPER runs to skip.
_GATE_MIN_FACES = 4096

_I32_MAX = 2**31 - 1  # plain int: jnp scalars would be captured consts in Pallas


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WoopTris:
    """Triangles as unit-triangle transforms, component-plane layout.

    Faces are stored in morton order of their centroids. wx/wy/wz:
    [4, Fp] f32. Row k in {0,1,2} holds W[c,k] (the matrix that maps
    world to unit-triangle space), row 3 holds the affine offset
    c_c = -(W v0)_c. Padding columns are all-zero, which the hit test
    rejects naturally (t evaluates to NaN).

    perm: [Fp] i32, morton slot -> ORIGINAL face id (intersection
    results must be mapped through this before touching face tables).
    sp_boxes: [8, Fp/SUPER] f32 per-SUPER-run AABBs: rows 0-2 bmin xyz,
    rows 3-5 bmax xyz, row 6 validity (0.0 for all-padding runs), row 7
    zero padding. Consumed only by the gated kernel for large scenes.
    """

    wx: jnp.ndarray
    wy: jnp.ndarray
    wz: jnp.ndarray
    perm: jnp.ndarray
    sp_boxes: jnp.ndarray
    n_faces: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def n_padded(self) -> int:
        return self.wx.shape[1]


def precompute_woop(tri_verts) -> WoopTris:
    """[F, 3, 3] world-space triangles -> WoopTris.

    Small scenes pad to a CLUSTER multiple; large ones (gated kernel)
    to a TILE_TRIS multiple so the 2D grid tiles evenly. Runs inside
    the jitted frame (tri_verts is per-frame world geometry, cf. the
    reference's per-frame `transform` kernel feeding the BVH rebuild,
    path_tracer.cu:536-542); cost is O(F log F) for the morton sort,
    negligible next to tracing.
    """
    from tinypathtracer_tpu.ops.lbvh import morton30

    f = tri_verts.shape[0]
    fb_min = jnp.min(tri_verts, axis=1)            # [F, 3]
    fb_max = jnp.max(tri_verts, axis=1)
    cent = 0.5 * (fb_min + fb_max)
    codes = morton30(cent, jnp.min(fb_min, axis=0), jnp.max(fb_max, axis=0))
    order = jnp.argsort(codes).astype(jnp.int32)   # stable: ties keep file order
    tv = tri_verts[order]

    v0 = tv[:, 0]
    e1 = tv[:, 1] - v0
    e2 = tv[:, 2] - v0
    n = vcross(e1, e2)
    det = vdot(n, n)[:, None]                      # det([e1 e2 n]) = |n|^2
    ok = det > 0.0
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    # rows of M^-1 for M = [e1 e2 n] (columns): cross-product adjugate
    r0 = vcross(e2, n) * inv
    r1 = vcross(n, e1) * inv
    r2 = n * inv
    w = jnp.stack([r0, r1, r2], axis=1)            # [F, 3(row), 3(col)]
    c = -jnp.einsum("frc,fc->fr", w, v0)           # [F, 3]
    planes = jnp.concatenate([w, c[:, :, None]], axis=2)  # [F, 3, 4]
    quantum = CLUSTER if f <= _GATE_MIN_FACES else TILE_TRIS
    pad = (-f) % quantum
    planes = jnp.pad(planes, ((0, pad), (0, 0), (0, 0)))
    planes = planes.transpose(1, 2, 0)             # [3, 4, Fp]
    fp = planes.shape[2]

    # Per-SUPER-run AABBs in morton order (gated kernel only). Padding
    # rows get an inverted box; all-padding runs get validity 0.
    bmin_s = jnp.pad(fb_min[order], ((0, pad), (0, 0)),
                     constant_values=REAL_MAX)
    bmax_s = jnp.pad(fb_max[order], ((0, pad), (0, 0)),
                     constant_values=-REAL_MAX)
    sp = SUPER if fp % SUPER == 0 else CLUSTER
    n_sp = fp // sp
    sp_min = bmin_s.reshape(n_sp, sp, 3).min(axis=1)   # [S, 3]
    sp_max = bmax_s.reshape(n_sp, sp, 3).max(axis=1)
    sp_valid = (jnp.arange(n_sp, dtype=jnp.int32) * sp < f)
    sp_boxes = jnp.concatenate(
        [sp_min.T, sp_max.T, sp_valid[None].astype(sp_min.dtype),
         jnp.zeros((1, n_sp), sp_min.dtype)], axis=0)

    perm = jnp.pad(order, (0, pad))
    return WoopTris(wx=planes[0], wy=planes[1], wz=planes[2],
                    perm=perm, sp_boxes=sp_boxes, n_faces=f)


def _hit_planes(ox, oy, oz, dx, dy, dz, wx, wy, wz, best_t):
    """The per-tile hit test; identical op sequence for both backends.

    Ray components are [N, 1]; wx/wy/wz are [4, TF]; best_t is [N, 1].
    Returns (t_candidate [N, TF] with REAL_MAX where no hit).
    """
    opx = ox * wx[0:1] + oy * wx[1:2] + oz * wx[2:3] + wx[3:4]
    opy = ox * wy[0:1] + oy * wy[1:2] + oz * wy[2:3] + wy[3:4]
    opz = ox * wz[0:1] + oy * wz[1:2] + oz * wz[2:3] + wz[3:4]
    dpx = dx * wx[0:1] + dy * wx[1:2] + dz * wx[2:3]
    dpy = dx * wy[0:1] + dy * wy[1:2] + dz * wy[2:3]
    dpz = dx * wz[0:1] + dy * wz[1:2] + dz * wz[2:3]
    t = -opz / dpz               # inf/NaN on parallel/degenerate: rejected below
    u = opx + t * dpx
    v = opy + t * dpy
    ok = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > DELTA) & (t < best_t)
    return jnp.where(ok, t, REAL_MAX), u, v


def _make_dense_kernel(tf: int, gated: bool, with_uv: bool = False):
    """Build the kernel body for one (ray tile, tri tile) grid step.

    Branch-free inner loop: one [TN x CLUSTER] block of pure VPU
    arithmetic per morton cluster, with the running best kept LANE-
    LOCAL (lane_t/lane_c [TN, CLUSTER] scratch hold, per (ray, lane)
    pair, the best t over all clusters visited so far and which cluster
    produced it) so there is no cross-lane work in the hot loop. One
    cross-lane argmin runs per ray tile at the last grid step. Tie
    semantics: strict '<' updates keep the earliest cluster per lane,
    and the final reduce takes the lowest fid among equal-t lanes, so
    the lowest morton slot wins overall.

    gated=True adds a slab-test gate per SUPER run (8 clusters): the
    [TN] ray tile skips the run's 8 blocks when no ray's slab interval
    intersects it ahead of that ray's running best (hint, refreshed
    once per run). Only enabled for large scenes (_GATE_MIN_FACES);
    measured break-even on v5e is ~8 blocks per gate.
    """
    n_sub = tf // CLUSTER

    def kernel(rays_ref, wx_ref, wy_ref, wz_ref, sp_ref,
               t_ref, fid_ref, uv_ref, lane_t, lane_c, lane_u, lane_v, hint):
        j = pl.program_id(1)
        nj = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            lane_t[:] = jnp.full_like(lane_t, REAL_MAX)
            lane_c[:] = jnp.zeros_like(lane_c)
            hint[:] = jnp.full_like(hint, REAL_MAX)
            if with_uv:
                lane_u[:] = jnp.zeros_like(lane_u)
                lane_v[:] = jnp.zeros_like(lane_v)

        r = rays_ref[:]
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]

        if gated:
            # Safe reciprocals for the slab test: huge-but-finite so
            # 0 * inv stays 0, keeping the test conservative for rays
            # parallel to a slab.
            ivx = jnp.where(dx == 0.0, REAL_MAX,
                            1.0 / jnp.where(dx == 0.0, 1.0, dx))
            ivy = jnp.where(dy == 0.0, REAL_MAX,
                            1.0 / jnp.where(dy == 0.0, 1.0, dy))
            ivz = jnp.where(dz == 0.0, REAL_MAX,
                            1.0 / jnp.where(dz == 0.0, 1.0, dz))

        def cluster_block(lo, ci):
            wx = wx_ref[:, lo:lo + CLUSTER]
            wy = wy_ref[:, lo:lo + CLUSTER]
            wz = wz_ref[:, lo:lo + CLUSTER]
            opx = ox * wx[0:1] + oy * wx[1:2] + oz * wx[2:3] + wx[3:4]
            opy = ox * wy[0:1] + oy * wy[1:2] + oz * wy[2:3] + wy[3:4]
            opz = ox * wz[0:1] + oy * wz[1:2] + oz * wz[2:3] + wz[3:4]
            dpx = dx * wx[0:1] + dy * wx[1:2] + dz * wx[2:3]
            dpy = dx * wy[0:1] + dy * wy[1:2] + dz * wy[2:3]
            dpz = dx * wz[0:1] + dy * wz[1:2] + dz * wz[2:3]
            t = -opz / dpz   # inf/NaN on parallel/degenerate: rejected
            u = opx + t * dpx
            v = opy + t * dpy
            ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) \
                & (t > DELTA) & (t < lane_t[:])
            lane_t[:] = jnp.where(ok, t, lane_t[:])
            lane_c[:] = jnp.where(ok, ci, lane_c[:])
            if with_uv:
                lane_u[:] = jnp.where(ok, u, lane_u[:])
                lane_v[:] = jnp.where(ok, v, lane_v[:])

        if not gated:
            for sc in range(n_sub):
                cluster_block(sc * CLUSTER, j * n_sub + sc)
        else:
            per_gate = SUPER // CLUSTER
            for g in range(n_sub // per_gate):
                si = j * (n_sub // per_gate) + g   # absolute SUPER index
                tx0 = (sp_ref[0, si] - ox) * ivx
                ty0 = (sp_ref[1, si] - oy) * ivy
                tz0 = (sp_ref[2, si] - oz) * ivz
                tx1 = (sp_ref[3, si] - ox) * ivx
                ty1 = (sp_ref[4, si] - oy) * ivy
                tz1 = (sp_ref[5, si] - oz) * ivz
                near = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                               jnp.minimum(ty0, ty1)),
                                   jnp.minimum(tz0, tz1))
                far = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                              jnp.maximum(ty0, ty1)),
                                  jnp.maximum(tz0, tz1))
                need = (far >= jnp.maximum(near, DELTA)) \
                    & (near <= hint[:]) & (sp_ref[6, si] != 0.0)

                @pl.when(jnp.any(need))
                def _(g=g, si=si):
                    for sc in range(per_gate):
                        cluster_block(g * SUPER + sc * CLUSTER,
                                      si * per_gate + sc)

                hint[:] = jnp.min(lane_t[:], axis=1, keepdims=True)

        # Final cross-lane argmin, once per ray tile.
        @pl.when(j == nj - 1)
        def _():
            lt = lane_t[:]
            m = jnp.min(lt, axis=1, keepdims=True)                 # [TN, 1]
            lane = lax.broadcasted_iota(jnp.int32, lt.shape, 1)
            fid_all = lane_c[:] * CLUSTER + lane
            cand = jnp.min(jnp.where(lt == m, fid_all, _I32_MAX),
                           axis=1, keepdims=True)
            t_ref[:] = m
            fid_ref[:] = jnp.where(m >= REAL_MAX, -1, cand)
            if with_uv:
                # winner's (u, v): select the winning lane (same
                # tie-break as fid: lowest fid among equal-t lanes)
                win = (lt == m) & (fid_all == cand)
                hit = m < REAL_MAX
                uv_ref[:, 0:1] = jnp.where(
                    hit, jnp.max(jnp.where(win, lane_u[:], -REAL_MAX),
                                 axis=1, keepdims=True), 0.0)
                uv_ref[:, 1:2] = jnp.where(
                    hit, jnp.max(jnp.where(win, lane_v[:], -REAL_MAX),
                                 axis=1, keepdims=True), 0.0)
            else:
                uv_ref[:] = jnp.zeros_like(uv_ref)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile_rays", "tile_tris", "gated",
                                    "with_uv", "interpret"))
def _dense_pallas(rays, wx, wy, wz, sp_boxes,
                  tile_rays: int = TILE_RAYS,
                  tile_tris: int = TILE_TRIS,
                  gated: bool = False, with_uv: bool = False,
                  interpret: bool = False):
    n = rays.shape[0]
    fp = wx.shape[1]
    tn = min(tile_rays, max(8, -(-n // 8) * 8))   # multiple of 8 (f32 sublane)
    pad = (-n) % tn
    rays_p = jnp.pad(rays, ((0, pad), (0, 0))) if pad else rays
    np_ = rays_p.shape[0]
    tf = min(tile_tris, fp)
    gate_quantum = SUPER if gated else CLUSTER
    if fp % tf or tf % gate_quantum or tn % 8:
        raise ValueError(
            f"dense tiling mismatch: padded faces {fp} must divide into "
            f"tri tiles of {tf} (multiple of {gate_quantum}); ray tile "
            f"{tn} must be a multiple of 8. Pass precompute_woop(tile=...) "
            f"matching tile_tris.")
    grid = (np_ // tn, fp // tf)

    t, fid, uv = pl.pallas_call(
        _make_dense_kernel(tf, gated, with_uv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            # ALL SUPER-run AABBs ride in SMEM (tiny: 8 x Fp/SUPER);
            # the gated kernel reads them as scalars
            pl.BlockSpec(sp_boxes.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((np_, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tn, CLUSTER), jnp.float32),   # lane_t
            pltpu.VMEM((tn, CLUSTER), jnp.int32),     # lane_c
            pltpu.VMEM((tn, CLUSTER), jnp.float32),   # lane_u (with_uv)
            pltpu.VMEM((tn, CLUSTER), jnp.float32),   # lane_v (with_uv)
            pltpu.VMEM((tn, 1), jnp.float32),         # hint (gated only)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(rays_p, wx, wy, wz, sp_boxes)
    return t[:n, 0], fid[:n, 0], uv[:n]


def _dense_xla(rays, wx, wy, wz):
    """jnp twin of the Pallas kernel: same op order, scan over tri tiles."""
    n = rays.shape[0]
    fp = wx.shape[1]
    tf = min(TILE_TRIS, fp)
    n_tiles = fp // tf
    ox, oy, oz = rays[:, 0:1], rays[:, 1:2], rays[:, 2:3]
    dx, dy, dz = rays[:, 3:4], rays[:, 4:5], rays[:, 5:6]
    planes = jnp.stack([wx, wy, wz]).reshape(3, 4, n_tiles, tf)
    rows = jnp.arange(n)

    def body(carry, args):
        best_t, best_fid, best_uv = carry
        pw, j = args                                       # [3, 4, tf]
        tc, u, v = _hit_planes(ox, oy, oz, dx, dy, dz,
                               pw[0], pw[1], pw[2], best_t)
        row_t = jnp.min(tc, axis=1, keepdims=True)
        lane = lax.broadcasted_iota(jnp.int32, tc.shape, 1)
        row_i = jnp.min(jnp.where(tc == row_t, lane, _I32_MAX),
                        axis=1, keepdims=True)
        better = row_t < best_t
        li = jnp.where(row_i[:, 0] == _I32_MAX, 0, row_i[:, 0])
        uv_j = jnp.stack([u[rows, li], v[rows, li]], axis=-1)
        best_uv = jnp.where(better, uv_j, best_uv)
        best_fid = jnp.where(better, j * tf + row_i, best_fid)
        best_t = jnp.where(better, row_t, best_t)
        return (best_t, best_fid, best_uv), None

    init = (jnp.full((n, 1), REAL_MAX, jnp.float32),
            jnp.full((n, 1), -1, jnp.int32),
            jnp.zeros((n, 2), jnp.float32))
    (best_t, best_fid, best_uv), _ = lax.scan(
        body, init, (planes.transpose(2, 0, 1, 3),
                     jnp.arange(n_tiles, dtype=jnp.int32)))
    return best_t[:, 0], best_fid[:, 0], best_uv


def _use_pallas() -> bool:
    impl = os.environ.get("TPT_DENSE_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def closest_hit_dense(origins, dirs, woop: WoopTris, tile_rays: int = TILE_RAYS,
                      with_uv: bool = True, mask=None):
    """Closest hit against all triangles. origins/dirs: [N, 3].

    Returns (fid [N] i32 (-1 = miss), t [N] f32, uv [N, 2] f32). The
    winner's (t, u, v) come straight from the kernel's lane-local
    running best (two extra selects per pair when with_uv) -- the
    integrator consumes them as primal hit data and routes gradients
    through a custom-vjp Moller-Trumbore recompute that only runs in
    the backward pass (render/integrator._hit_surface).

    mask ([N] bool, optional) is SEMANTICS ONLY: lanes with mask=False
    report miss. All lanes run through the kernel regardless -- the
    round-2 stable-partition compaction was measured at ~33 ms per
    masked call on this backend vs the ~34 ms the whole 1M x 2048
    kernel costs, so skipping dead lanes via data movement can never
    pay here (see module docstring).
    """
    n = origins.shape[0]
    rays = jnp.concatenate(
        [origins, dirs, jnp.zeros((n, 2), origins.dtype)], axis=1)
    impl = os.environ.get("TPT_DENSE_IMPL", "auto")
    use_pallas = impl == "interpret" or (impl != "xla" and _use_pallas())
    gated = woop.n_padded >= _GATE_MIN_FACES
    if use_pallas:
        t, fid, uv = _dense_pallas(rays, woop.wx, woop.wy, woop.wz,
                                   woop.sp_boxes,
                                   tile_rays=tile_rays, gated=gated,
                                   with_uv=with_uv,
                                   interpret=impl == "interpret")
    else:
        t, fid, uv = _dense_xla(rays, woop.wx, woop.wy, woop.wz)
    fid = jnp.where(fid >= woop.n_faces, -1, fid)   # padding can't win, but be safe
    if mask is not None:
        fid = jnp.where(mask, fid, -1)
    t = jnp.where(fid < 0, REAL_MAX, t)
    if not with_uv:
        uv = jnp.zeros((n, 2), jnp.float32)
    else:
        uv = jnp.where((fid >= 0)[:, None], uv, 0.0)
    return _to_original_fid(woop, fid), t, uv


def _to_original_fid(woop: WoopTris, fid):
    """Map morton-slot hit ids back to original face ids (miss stays -1)."""
    return jnp.where(fid >= 0, woop.perm[jnp.maximum(fid, 0)], fid)
