"""One-shot bisect: run build_lbvh sub-stages sequentially on the TPU,
printing after each; the stage that crashes the worker is the last
unprinted one. Throwaway debug tool."""
import sys
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def ok(msg):
    print("OK:", msg, flush=True)

rng = np.random.default_rng(0)
n = 500
tris = jnp.asarray((rng.uniform(-3, 3, size=(n, 1, 3))
                    + rng.normal(scale=.3, size=(n, 3, 3))).astype(np.float32))

from tinypathtracer_tpu.ops.lbvh import clz32, morton30, _make_delta

# stage 1: software clz
x = jnp.arange(1, 512, dtype=jnp.int32)
jax.block_until_ready(jax.jit(clz32)(x)); ok("clz32")

# stage 2: morton codes
fb_min = jnp.min(tris, axis=1); fb_max = jnp.max(tris, axis=1)
cent = 0.5 * (fb_min + fb_max)
codes = jax.jit(morton30)(cent, jnp.min(fb_min, 0), jnp.max(fb_max, 0))
jax.block_until_ready(codes); ok("morton30")

# stage 3: argsort
order = jax.jit(jnp.argsort)(codes)
jax.block_until_ready(order); ok("argsort")
sorted_codes = codes[order.astype(jnp.int32)]

# stage 4: karras loops
def karras(sorted_codes):
    f = sorted_codes.shape[0]
    delta = _make_delta(sorted_codes)
    i = jnp.arange(f - 1, dtype=jnp.int32)
    d = jnp.where(delta(i, i + 1) >= delta(i, i - 1), 1, -1).astype(jnp.int32)
    delta_min = delta(i, i - d)
    def grow(_, carry):
        lmax, active = carry
        cond = active & (delta(i, i + lmax * d) > delta_min)
        return jnp.where(cond, lmax << 1, lmax), cond
    lmax, _ = lax.fori_loop(0, 32, grow, (jnp.full(f - 1, 2, jnp.int32), jnp.ones(f - 1, bool)))
    def shrink(_, carry):
        l, t = carry
        cond = (t > 0) & (delta(i, (l + t) * d + i) > delta_min)
        return jnp.where(cond, l + t, l), t >> 1
    l, _ = lax.fori_loop(0, 32, shrink, (jnp.zeros(f - 1, jnp.int32), lmax >> 1))
    return l
jax.block_until_ready(jax.jit(karras)(sorted_codes)); ok("karras-loops")

# stage 5: scatter
def scat(left, right):
    parent = jnp.full((2 * n - 1,), -1, jnp.int32)
    parent = parent.at[left].set(jnp.arange(n - 1, dtype=jnp.int32))
    parent = parent.at[right].set(jnp.arange(n - 1, dtype=jnp.int32))
    return parent
left = jnp.arange(1, n, dtype=jnp.int32)
right = jnp.arange(n - 1, 2 * n - 2, dtype=jnp.int32)
jax.block_until_ready(jax.jit(scat)(left, right)); ok("scatter")

# stage 6: while_loop AABB sweep shape
def sweep_test(bmin0, bmax0):
    def cond(state):
        _, _, changed, it = state
        return changed & (it < 2 * n)
    def body(state):
        bmin, bmax, _, it = state
        new_min = jnp.minimum(bmin[left], bmin[right])
        new_max = jnp.maximum(bmax[left], bmax[right])
        changed = jnp.any(new_min != bmin[: n - 1]) | jnp.any(new_max != bmax[: n - 1])
        bmin = bmin.at[: n - 1].set(new_min)
        bmax = bmax.at[: n - 1].set(new_max)
        return bmin, bmax, changed, it + 1
    return lax.while_loop(cond, body, (bmin0, bmax0, jnp.array(True), jnp.array(0)))
bmin0 = jnp.concatenate([jnp.full((n - 1, 3), 1e30), fb_min])
bmax0 = jnp.concatenate([jnp.full((n - 1, 3), -1e30), fb_max])
jax.block_until_ready(jax.jit(sweep_test)(bmin0, bmax0)[0]); ok("while-sweep")

# stage 7: full build
from tinypathtracer_tpu.ops.lbvh import build_lbvh
bvh = jax.jit(build_lbvh)(tris)
jax.block_until_ready(bvh.bmin); ok("full-build")
print("ALL STAGES PASSED", flush=True)
