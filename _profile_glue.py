"""Micro-benchmarks of the per-bounce glue at 1M rays."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

N = 1 << 20
key = jax.random.PRNGKey(0)

def timeit(label, fn, *args, n=5):
    out = fn(*args); jax.block_until_ready(out)
    best = float('inf')
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:50s} {best*1e3:9.3f} ms")
    return best

# random permutation gather of [N, 8]
rays = jax.random.normal(key, (N, 8), jnp.float32)
perm = jax.random.permutation(key, N).astype(jnp.int32)
g = jax.jit(lambda r, p: r[p])
timeit("gather [1M,8] random perm", g, rays, perm)

# gather [N] f32
v = jax.random.normal(key, (N,), jnp.float32)
g1 = jax.jit(lambda r, p: r[p])
timeit("gather [1M] random perm", g1, v, perm)

# cumsum
mask = jax.random.bernoulli(key, 0.7, (N,))
cs = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
timeit("cumsum [1M] i32", cs, mask)

# scatter .at[pos].set
pos = perm
sc = jax.jit(lambda p: jnp.zeros((N,), jnp.int32).at[p].set(jnp.arange(N, dtype=jnp.int32)))
timeit("scatter [1M] i32", sc, pos)

# full partition from dense.py
from tinypathtracer_tpu.ops.dense import _partition_live
pt = jax.jit(_partition_live)
timeit("_partition_live [1M]", pt, mask)

def part_and_apply(mask, rays):
    pos, perm = _partition_live(mask)
    return rays[perm], pos
paa = jax.jit(part_and_apply)
timeit("partition + apply to [1M,8]", paa, mask, rays)

# face_pack gather: [2048, 24] table, 1M indices
table = jax.random.normal(key, (2048, 24), jnp.float32)
idx = jax.random.randint(key, (N,), 0, 2048, jnp.int32)
fg = jax.jit(lambda t, i: t[i])
timeit("gather face_pack [1M,24] from [2048,24]", fg, table, idx)

# one-hot matmul alternative for small-table gather
def onehot_gather(t, i):
    oh = (i[:, None] == jnp.arange(t.shape[0], dtype=jnp.int32)[None, :])
    return jnp.dot(oh.astype(jnp.bfloat16), t.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
og = jax.jit(onehot_gather)
timeit("one-hot matmul gather [1M,24] from [2048,24]", og, table, idx)

# threefry draws
dr = jax.jit(lambda k: jax.random.uniform(k, (N, 8), jnp.float32))
timeit("uniform draw [1M,8]", dr, key)

# vmapped per-lane fold_in + draw
def perlane(k, ids):
    keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(ids)
    return keys
pl_ = jax.jit(perlane)
ids = jnp.arange(N, dtype=jnp.int32)
timeit("vmapped fold_in [1M]", pl_, key, ids)

def perlane_draw(k, ids):
    keys = jax.vmap(lambda i: jax.random.fold_in(k, i))(ids)
    return jax.vmap(lambda kk: jax.random.uniform(kk, (8,)))(keys)
pld = jax.jit(perlane_draw)
timeit("per-lane fold+draw [1M,8]", pld, key, ids)

# bsdf sample at 1M
from tinypathtracer_tpu.ops import bsdf
d = jax.random.normal(key, (N, 3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
nrm = jax.random.normal(key, (N, 3)); nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
eta = jnp.zeros((N,)); met = jnp.zeros((N,)); bc = jnp.ones((N, 3)) * 0.5
bs = jax.jit(lambda k: bsdf.sample_bsdf(k, d, nrm, eta, met, bc))
timeit("sample_bsdf [1M]", bs, key)

# env lookup
from tinypathtracer_tpu.models.envlight import env_lookup, gradient_sky
env = jnp.asarray(gradient_sky(64, 128))
el = jax.jit(lambda d: env_lookup(env, d))
timeit("env_lookup [1M]", el, d)

# ray-tri single recompute
from tinypathtracer_tpu.ops.traverse import _ray_tri_single
o = jnp.zeros((N, 3))
v0 = jax.random.normal(key, (N, 3)); v1 = v0 + 0.1; v2 = v0 + 0.2
rt = jax.jit(_ray_tri_single)
timeit("_ray_tri_single [1M]", rt, o, d, v0, v1, v2)

# sort: 1M u32 keys + i32 payload
keys_sort = jax.random.randint(key, (N,), 0, 1 << 30, jnp.int32)
st = jax.jit(lambda k: lax.sort((k, jnp.arange(N, dtype=jnp.int32)), num_keys=1))
timeit("lax.sort [1M] key+payload", st, keys_sort)

ag = jax.jit(lambda k: jnp.argsort(k))
timeit("argsort [1M]", ag, keys_sort)
