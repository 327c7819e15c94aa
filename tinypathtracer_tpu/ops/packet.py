"""Packet BVH-style traversal: sublinear closest-hit ON THE CHIP.

The round-4 verdict's one open capability: the production intersectors
do O(F) work per query. The reference walks a BVH per thread
(`traverseBVH`, path_tracer.cu:61-107, ~log F); a per-LANE walk is the
one thing a lockstep 8x128 vector machine cannot do (a per-lane node
fetch is a gather = an O(nodes) one-hot matmul per STEP). Every prior
attempt here gated work at 256-ray-block granularity (dense SUPER
gates, mega chunk gates) and lost: the union of 256 incoherent bounce
rays' needed chunks is ~the whole scene, so block gates cull nothing
(BASELINE.md round-2/3/4 gate measurements).

This kernel finds the granularity that works on the VPU: an 8-ray
PACKET on the sublane axis against a 128-triangle morton chunk on the
lane axis -- one [8, 128] tile is exactly one native VPU register, so
per-pair arithmetic throughput is identical to the full dense sweep,
but culling decisions happen per 8 rays instead of per 256. The classic
CPU-SIMD "packet traversal" [Wald et al. 2001] re-shaped for TPU tiles:

  * the scene is the morton-ordered Woop plane table (ops/dense.py)
    reshaped to one [16, 128] sub-tile per 128-triangle chunk, plus a
    per-chunk AABB table [8, C] -- a FLAT 2-level hierarchy (chunk grid
    over triangles), no tree: for C <= ~1000 chunks, slab-testing ALL
    chunk boxes against the packet costs a few [8, C] VPU ops, less
    than one chunk visit.
  * per packet: one batched slab test yields per-ray chunk entry
    distances [8, C]; a `while_loop` then visits ONLY chunks some
    ray still needs, NEAREST FIRST, and stops as soon as every ray's
    running best hit is closer than every unvisited chunk's entry
    distance -- per-ray early exit, exact (a chunk's entry distance
    lower-bounds any t inside it).
  * per-ray pruning, not per-block: a ray that found a close hit stops
    paying for far chunks even while its packet-mates continue.
  * dead lanes (mask=False) traverse nothing: their need rows are
    cleared before the walk -- the masked shadow/direct queries of the
    modular pipeline skip real work here, unlike the dense kernel's
    semantics-only mask.

Hit results are bit-identical to ops/dense.py (same Woop expression
order, same tie rule: lowest morton slot among equal-t candidates --
enforced against the near-to-far visit order by an explicit equal-t
slot comparison in the update), verified in tests/test_packet.py
against the bruteforce oracle and the dense kernel.

Scaling: visits per packet grow ~O(F^(1/3)) for a line through a
morton-ordered chunk grid (near-to-far pruning usually much better),
vs O(F/128) chunks for the dense sweep. Measured numbers live in
BASELINE.md (tools/lab5.py).
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

from tinypathtracer_tpu.ops.dense import (WoopTris, _dense_xla,
                                          precompute_woop)
from tinypathtracer_tpu.utils.math3d import DELTA, REAL_MAX

CHUNK = 128          # triangles per chunk = lane width
PACKET = 8           # rays per packet = f32 sublane tile
TILE_RAYS = 256      # rays per grid block (32 packets)
_ROWS_PER_CHUNK = 16  # 12 plane rows padded to a sublane-aligned 16
_I32_MAX = 2**31 - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketTris:
    """Chunked scene tables for the packet kernel.

    planes: [S*16, 128] f32, S = Fp/128 sub-chunks -- sub-chunk s's
      Woop planes at rows [16s : 16s+12] (wx rows 0-3, wy 4-7, wz
      8-11; rows 12-15 zero padding), its 128 morton-consecutive
      triangles on lanes. A traversal CHUNK is `sub` consecutive
      sub-chunks (tc = sub*128 triangles): one near-to-far visit
      fetches one dynamic [sub*16, 128] slice and sweeps its sub-tiles
      statically, amortizing the select->scalar->fetch latency chain
      over tc pair tests.
    boxes: [8, Cp] f32 chunk (tc-granularity) AABBs, Cp padded to a
      lane multiple: rows 0-2 bmin xyz, 3-5 bmax xyz, 6 validity
      (0 = padding chunk), 7 zero.
    woop: the underlying morton-ordered plane table (XLA/CPU fallback
      + slot->original-id perm).
    """

    planes: jnp.ndarray
    boxes: jnp.ndarray
    woop: WoopTris
    sub: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def n_chunks(self) -> int:
        return self.planes.shape[0] // _ROWS_PER_CHUNK // self.sub


def precompute_packet(tri_verts, tc: int = 512) -> PacketTris:
    """[F, 3, 3] world triangles -> PacketTris (morton order shared with
    the dense kernel so hits are bit-identical across intersectors).

    tc: triangles per traversal chunk (multiple of 128). Bigger chunks
    amortize the per-visit latency chain over more pair tests at the
    cost of coarser culling (measured sweet spot: BASELINE.md).
    """
    woop = precompute_woop(tri_verts)
    fp = woop.n_padded
    while fp % tc:
        tc //= 2
    tc = max(tc, CHUNK)
    sub = tc // CHUNK
    s = fp // CHUNK
    # [4, Fp] -> [S, 4, 128] per coefficient row group
    def chunked(wrows):
        return wrows.reshape(4, s, CHUNK).transpose(1, 0, 2)

    planes = jnp.concatenate(
        [chunked(woop.wx), chunked(woop.wy), chunked(woop.wz),
         jnp.zeros((s, _ROWS_PER_CHUNK - 12, CHUNK), jnp.float32)],
        axis=1)                                     # [S, 16, 128]
    planes = planes.reshape(s * _ROWS_PER_CHUNK, CHUNK)

    # per-chunk (tc-granularity) AABBs in morton order: padding faces
    # contribute inverted boxes; all-padding chunks get validity 0;
    # the box table lane dim pads to 128.
    c = fp // tc
    tv = tri_verts[woop.perm]                       # [Fp, 3, 3]
    valid = jnp.arange(fp) < woop.n_faces
    fb_min = jnp.where(valid[:, None], jnp.min(tv, axis=1), REAL_MAX)
    fb_max = jnp.where(valid[:, None], jnp.max(tv, axis=1), -REAL_MAX)
    ck_min = fb_min.reshape(c, tc, 3).min(axis=1)
    ck_max = fb_max.reshape(c, tc, 3).max(axis=1)
    ck_valid = (jnp.arange(c) * tc < woop.n_faces)
    cp = -(-c // CHUNK) * CHUNK
    pad = cp - c
    boxes = jnp.concatenate(
        [ck_min.T, ck_max.T, ck_valid[None].astype(jnp.float32),
         jnp.zeros((1, c), jnp.float32)], axis=0)   # [8, C]
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad)))
    return PacketTris(planes=planes, boxes=boxes, woop=woop, sub=sub)


# Chunk ids pack into the low mantissa bits of the (positive) f32 entry
# distance bitcast to i32: positive-float bits are order-preserving as
# ints, so ONE integer min yields (nearest-trunc, lowest-id) at once.
# Truncating 11 mantissa bits rounds the entry distance DOWN -- strictly
# conservative for "could this chunk still hold a closer hit".
_ID_BITS_MASK = 2047          # supports up to 2048 chunks = 262k faces


def _make_packet_kernel(n_chunks: int, cp: int, tn: int, packet: int,
                        kvisit: int, sub: int = 1, group: int = 1):
    """Kernel v3. v2 (see tools/lab5_diag.py for the v1 autopsy)
    vectorized the box test + epilogue over the whole [TN, Cp] block and
    batched KVISIT chunk visits per while_loop round; it plateaued at
    ~1.6 Mrays/s on the 61k-face scene because each packet's walk is a
    SERIAL reduce->scalar->dynamic-fetch latency chain and the VPU sits
    idle between chain steps. v3 interleaves GROUP packets' walks in ONE
    while_loop: each round selects + visits for `group` independent
    packets, so their chain latencies overlap (software pipelining
    across packets). Spent packets skip their visit work via a scalar
    pl.when (the group runs until its slowest member finishes; the
    skipped visits cost only the branch)."""
    n_packets = tn // packet

    def kernel(rays_ref, planes_ref, boxes_ref, t_ref, fid_ref, uv_ref,
               visits_ref, s_key, s_lt, s_lc, s_lu, s_lv):
        colb = lax.broadcasted_iota(jnp.int32, (tn, cp), 1)
        colp = lax.broadcasted_iota(jnp.int32, (packet, cp), 1)

        # ---- phase 1: block-vectorized chunk keys + state init ----
        r = rays_ref[:]                                    # [tn, 8]
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
        aliveF = r[:, 6:7]
        # conservative slab reciprocals (huge-but-finite so a ray
        # parallel to a slab can never cull a chunk it overlaps)
        ivx = jnp.where(dx == 0.0, REAL_MAX,
                        1.0 / jnp.where(dx == 0.0, 1.0, dx))
        ivy = jnp.where(dy == 0.0, REAL_MAX,
                        1.0 / jnp.where(dy == 0.0, 1.0, dy))
        ivz = jnp.where(dz == 0.0, REAL_MAX,
                        1.0 / jnp.where(dz == 0.0, 1.0, dz))
        tx0 = (boxes_ref[0:1, :] - ox) * ivx               # [tn, cp]
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
            & (boxes_ref[6:7, :] != 0.0) & (aliveF != 0.0)
        ikey = pltpu.bitcast(jnp.maximum(near, DELTA), jnp.int32)
        ikey = ((ikey | _ID_BITS_MASK) ^ _ID_BITS_MASK) | colb
        s_key[:] = jnp.where(hit_box, ikey, _I32_MAX)
        s_lt[:] = jnp.full((tn, CHUNK), REAL_MAX, jnp.float32)
        s_lc[:] = jnp.full((tn, CHUNK), _I32_MAX, jnp.int32)
        s_lu[:] = jnp.zeros((tn, CHUNK), jnp.float32)
        s_lv[:] = jnp.zeros((tn, CHUNK), jnp.float32)

        # ---- phase 2: interleaved near-to-far packet walks ----
        def rows_of(pg, g):
            row0 = pl.multiple_of((pg * group + g) * packet, packet)
            return pl.ds(row0, packet)

        def group_body(pg, _):
            rays_g = []
            for g in range(group):
                rp = rays_ref[rows_of(pg, g), :]
                rays_g.append((rp[:, 0:1], rp[:, 1:2], rp[:, 2:3],
                               rp[:, 3:4], rp[:, 4:5], rp[:, 5:6]))

            def select(g):
                """kvisit nearest still-needed chunks of packet g, one
                int min each.

                <= against the per-ray best (via |MASK on its key) keeps
                chunks whose truncated entry distance equals the best:
                they can hold an equal-t lower-slot winner (tie rule).
                """
                rows = rows_of(pg, g)
                pbest = jnp.min(s_lt[rows, :], axis=1, keepdims=True)
                ibt = pltpu.bitcast(pbest, jnp.int32) | _ID_BITS_MASK
                cand = s_key[rows, :]
                cand = jnp.where(cand <= ibt, cand, _I32_MAX)
                ms = []
                for _k in range(kvisit):
                    m = jnp.min(cand)
                    ms.append(m)
                    if _k + 1 < kvisit:
                        cand = jnp.where(cand == m, _I32_MAX, cand)
                return tuple(ms)

            def do_visit(g, ck):
                """Test one chunk (sub 128-tri tiles after ONE dynamic
                fetch) against packet g. Revisits can't steal ties
                (equal t requires strictly lower sub-chunk id) and
                padding planes are all-zero (t = NaN, rejected)."""
                rows = rows_of(pg, g)
                oxp, oyp, ozp, dxp, dyp, dzp = rays_g[g]
                base = ck * (sub * _ROWS_PER_CHUNK)
                pall = planes_ref[pl.ds(base, sub * _ROWS_PER_CHUNK), :]
                for si in range(sub):
                    pp = pall[si * _ROWS_PER_CHUNK:
                              si * _ROWS_PER_CHUNK + 12, :]
                    sck = ck * sub + si
                    opx = (oxp * pp[0:1] + oyp * pp[1:2] + ozp * pp[2:3]
                           + pp[3:4])
                    opy = (oxp * pp[4:5] + oyp * pp[5:6] + ozp * pp[6:7]
                           + pp[7:8])
                    opz = (oxp * pp[8:9] + oyp * pp[9:10]
                           + ozp * pp[10:11] + pp[11:12])
                    dpx = dxp * pp[0:1] + dyp * pp[1:2] + dzp * pp[2:3]
                    dpy = dxp * pp[4:5] + dyp * pp[5:6] + dzp * pp[6:7]
                    dpz = dxp * pp[8:9] + dyp * pp[9:10] + dzp * pp[10:11]
                    t = -opz / dpz     # inf/NaN on parallel/degenerate
                    u = opx + t * dpx
                    v = opy + t * dpy
                    ok = (jnp.minimum(u, v) >= 0.0) & (u + v <= 1.0) \
                        & (t > DELTA)
                    lt = s_lt[rows, :]
                    # near-to-far visit order breaks the dense kernel's
                    # "first chunk wins ties" convention, so ties
                    # resolve explicitly: equal t takes the LOWER
                    # sub-chunk id.
                    take = ok & ((t < lt)
                                 | ((t == lt) & (sck < s_lc[rows, :])))
                    s_lt[rows, :] = jnp.where(take, t, lt)
                    s_lc[rows, :] = jnp.where(take, sck, s_lc[rows, :])
                    s_lu[rows, :] = jnp.where(take, u, s_lu[rows, :])
                    s_lv[rows, :] = jnp.where(take, v, s_lv[rows, :])
                s_key[rows, :] = jnp.where(colp == ck, _I32_MAX,
                                           s_key[rows, :])

            nm = group * kvisit

            def cond(carry):
                pend = carry[0]
                for m in carry[1:nm]:
                    pend = jnp.minimum(pend, m)
                return pend < _I32_MAX

            def body(carry):
                ms_all, cnts = carry[:nm], carry[nm:]
                new_cnts = list(cnts)
                # all group*kvisit visits are issued before any of the
                # next round's selects: the g walks' serial chains
                # overlap, and a spent packet's visit is skipped by a
                # scalar branch
                for g in range(group):
                    for k in range(kvisit):
                        m = ms_all[g * kvisit + k]
                        ck = jnp.minimum(m & _ID_BITS_MASK, n_chunks - 1)
                        pl.when(m < _I32_MAX)(
                            lambda g=g, ck=ck: do_visit(g, ck))
                        new_cnts[g] = new_cnts[g] \
                            + (m < _I32_MAX).astype(jnp.int32)
                new_ms = ()
                for g in range(group):
                    new_ms = new_ms + select(g)
                return new_ms + tuple(new_cnts)

            init = ()
            for g in range(group):
                init = init + select(g)
            init = init + tuple(jnp.int32(0) for _ in range(group))
            final = lax.while_loop(cond, body, init)
            for g in range(group):
                visits_ref[rows_of(pg, g), :] = jnp.full(
                    (packet, 1), final[nm + g], jnp.int32)
            return 0

        lax.fori_loop(0, n_packets // group, group_body, 0)

        # ---- phase 3: block-vectorized epilogue ----
        lane = lax.broadcasted_iota(jnp.int32, (tn, CHUNK), 1)
        lt = s_lt[:]
        mrow = jnp.min(lt, axis=1, keepdims=True)          # [tn, 1]
        slot_all = s_lc[:] * CHUNK + lane
        cand = jnp.min(jnp.where(lt == mrow, slot_all, _I32_MAX),
                       axis=1, keepdims=True)
        hit = mrow < REAL_MAX
        t_ref[:] = mrow
        fid_ref[:] = jnp.where(hit, cand, -1)
        win = (lt == mrow) & (slot_all == cand)
        uv_ref[:, 0:1] = jnp.where(
            hit, jnp.max(jnp.where(win, s_lu[:], -REAL_MAX),
                         axis=1, keepdims=True), 0.0)
        uv_ref[:, 1:2] = jnp.where(
            hit, jnp.max(jnp.where(win, s_lv[:], -REAL_MAX),
                         axis=1, keepdims=True), 0.0)

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rays", "interpret",
                                              "packet", "kvisit", "sub",
                                              "group"))
def _packet_pallas(rays, planes, boxes, tile_rays: int = TILE_RAYS,
                   interpret: bool = False, packet: int = PACKET,
                   kvisit: int = 2, sub: int = 1, group: int = 1):
    """rays [N, 8] (ox oy oz dx dy dz aliveF pad). Returns
    (t [N], slot [N] i32 morton slot or -1, uv [N, 2], visits [N])."""
    n = rays.shape[0]
    tn = tile_rays
    while tn % (packet * group):
        group //= 2
    group = max(group, 1)
    pad = (-n) % tn
    if pad:
        # padding rays are dead (aliveF 0): they traverse nothing
        rays = jnp.pad(rays, ((0, pad), (0, 0)))
    np_ = rays.shape[0]
    n_chunks = planes.shape[0] // _ROWS_PER_CHUNK // sub
    cp = boxes.shape[1]
    if n_chunks > _ID_BITS_MASK + 1:
        raise ValueError(
            f"packet kernel supports <= {(_ID_BITS_MASK + 1) * CHUNK} "
            f"padded faces (chunk ids pack into {_ID_BITS_MASK + 1} "
            f"mantissa slots); got {n_chunks} chunks")

    t, fid, uv, visits = pl.pallas_call(
        _make_packet_kernel(n_chunks, cp, tn, packet, kvisit, sub, group),
        grid=(np_ // tn,),
        in_specs=[
            pl.BlockSpec((tn, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(planes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(boxes.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tn, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((np_, 1), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((np_, 2), jnp.float32),
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tn, cp), jnp.int32),        # s_key
            pltpu.VMEM((tn, CHUNK), jnp.float32),   # s_lt
            pltpu.VMEM((tn, CHUNK), jnp.int32),     # s_lc
            pltpu.VMEM((tn, CHUNK), jnp.float32),   # s_lu
            pltpu.VMEM((tn, CHUNK), jnp.float32),   # s_lv
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rays, planes, boxes)
    return t[:n, 0], fid[:n, 0], uv[:n], visits[:n, 0]


def _use_pallas() -> bool:
    impl = os.environ.get("TPT_PACKET_IMPL", "auto")
    if impl == "pallas":
        return True
    if impl == "xla":
        return False
    return jax.default_backend() == "tpu"


def closest_hit_packet(origins, dirs, pk: PacketTris, mask=None,
                       with_visits: bool = False, packet: int = None,
                       kvisit: int = None, group: int = None):
    """Closest hit via packet traversal. origins/dirs [N, 3].

    Returns (fid [N] i32 original face id (-1 = miss), t [N], uv [N, 2])
    -- bit-identical to closest_hit_dense. mask=False lanes skip ALL
    traversal work in the kernel (their packet rows never contribute to
    chunk need) and report miss. with_visits=True appends the per-ray
    chunk-visit count (pairs tested = visits * tc; lab evidence).
    packet/kvisit/group default to the TPT_PACKET_{W,K,G} env knobs
    (the renderer passes RenderConfig.packet_* explicitly).
    """
    n = origins.shape[0]
    woop = pk.woop
    aliveF = (jnp.ones((n, 1), jnp.float32) if mask is None
              else mask.astype(jnp.float32)[:, None])
    impl = os.environ.get("TPT_PACKET_IMPL", "auto")
    use_pallas = impl == "interpret" or (impl != "xla" and _use_pallas())
    visits = jnp.zeros((n,), jnp.int32)
    if use_pallas:
        rays = jnp.concatenate(
            [origins, dirs, aliveF, jnp.zeros((n, 1), jnp.float32)],
            axis=1)
        t, fid, uv, visits = _packet_pallas(
            rays, pk.planes, pk.boxes, interpret=impl == "interpret",
            packet=packet if packet is not None
            else int(os.environ.get("TPT_PACKET_W", PACKET)),
            kvisit=kvisit if kvisit is not None
            else int(os.environ.get("TPT_PACKET_K", 1)),
            sub=pk.sub,
            group=group if group is not None
            else int(os.environ.get("TPT_PACKET_G", 16)))
    else:
        rays = jnp.concatenate(
            [origins, dirs, jnp.zeros((n, 2), origins.dtype)], axis=1)
        t, fid, uv = _dense_xla(rays, woop.wx, woop.wy, woop.wz)
        if mask is not None:
            fid = jnp.where(mask, fid, -1)
    fid = jnp.where(fid >= woop.n_faces, -1, fid)
    if mask is not None:
        fid = jnp.where(mask, fid, -1)
    t = jnp.where(fid < 0, REAL_MAX, t)
    uv = jnp.where((fid >= 0)[:, None], uv, 0.0)
    fid_o = jnp.where(fid >= 0, woop.perm[jnp.maximum(fid, 0)], fid)
    if with_visits:
        return fid_o, t, uv, visits
    return fid_o, t, uv
