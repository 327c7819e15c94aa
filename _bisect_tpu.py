"""One-shot bisect on the TPU: stages ordered by product importance, so
whatever the worker dies on, the run yields maximum information. The
last printed OK is the last healthy stage. Throwaway debug tool."""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

def ok(msg):
    print("OK:", msg, flush=True)

print("devices:", jax.devices(), flush=True)
print("health:", jnp.arange(4).sum(), flush=True)

rng = np.random.default_rng(0)
n = 500
tris_np = (rng.uniform(-3, 3, size=(n, 1, 3))
           + rng.normal(scale=.3, size=(n, 3, 3))).astype(np.float32)
tris = jnp.asarray(tris_np)

# ---- stage A: traversal with HOST-built BVH (no device build at all)
from tinypathtracer_tpu.utils import native
from tinypathtracer_tpu.ops.lbvh import BVH
from tinypathtracer_tpu.ops.traverse import closest_hit_bvh
out = native.build_lbvh_host(tris_np)
bvh = BVH(left=jnp.asarray(out["left"]), right=jnp.asarray(out["right"]),
          parent=jnp.asarray(out["parent"]), leaf_fid=jnp.asarray(out["leaf_fid"]),
          bmin=jnp.asarray(out["bmin"]), bmax=jnp.asarray(out["bmax"]),
          tri_verts=tris)
o = jnp.asarray(rng.uniform(-4, 4, size=(1024, 3)).astype(np.float32))
d_np = rng.normal(size=(1024, 3)).astype(np.float32)
d = jnp.asarray(d_np / np.linalg.norm(d_np, axis=-1, keepdims=True))
fid, t, uv = jax.jit(closest_hit_bvh)(o, d, bvh)
jax.block_until_ready(fid)
ok(f"traversal (hit rate {float(jnp.mean((fid >= 0).astype(jnp.float32))):.2f})")

# cross-check vs brute force
from tinypathtracer_tpu.ops import intersect
fb, tb, _ = intersect.closest_hit_bruteforce(o, d, tris)
same = bool(jnp.all((fid >= 0) == (fb >= 0)))
ok(f"traversal matches bruteforce hit mask: {same}")

# ---- stage B: morton (int32 bit ops)
from tinypathtracer_tpu.ops.lbvh import morton30, clz32, _make_delta
fb_min = jnp.min(tris, axis=1); fb_max = jnp.max(tris, axis=1)
cent = 0.5 * (fb_min + fb_max)
codes = jax.jit(morton30)(cent, jnp.min(fb_min, 0), jnp.max(fb_max, 0))
jax.block_until_ready(codes); ok("morton30")

# ---- stage C: int32 software clz
x = jnp.arange(1, 512, dtype=jnp.int32)
jax.block_until_ready(jax.jit(clz32)(x)); ok("clz32-int32")

# ---- stage D: argsort
order = jax.jit(jnp.argsort)(codes)
jax.block_until_ready(order); ok("argsort")
sorted_codes = codes[order.astype(jnp.int32)]

# ---- stage E: full device build
from tinypathtracer_tpu.ops.lbvh import build_lbvh
bvh2 = jax.jit(build_lbvh)(tris)
jax.block_until_ready(bvh2.bmin); ok("full-device-build")

# ---- stage F: device build + traverse together
fid2, _, _ = jax.jit(lambda tr, o, d: closest_hit_bvh(o, d, build_lbvh(tr)))(tris, o, d)
jax.block_until_ready(fid2); ok("build+traverse fused")
print("ALL STAGES PASSED", flush=True)
