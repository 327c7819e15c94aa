import time
import jax, jax.numpy as jnp
from tinypathtracer_tpu.ops import bsdf

def timeit(label, fn, *args, n=8):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:46s} best {ts[0]*1e3:9.3f} ms  med {ts[n//2]*1e3:9.3f} ms")

N = 1 << 20
key = jax.random.PRNGKey(0)
d = jax.random.normal(key, (N, 3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
nrm = jax.random.normal(jax.random.PRNGKey(1), (N, 3))
nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
eta = jnp.zeros((N,)); met = jnp.zeros((N,)); bc = jnp.ones((N, 3)) * 0.5

# closure-captured style (as in _profile_glue.py)
bs_closure = jax.jit(lambda k: bsdf.sample_bsdf(k, d, nrm, eta, met, bc))
timeit("sample_bsdf closure-captured", bs_closure, key)

# argument-passing style
bs_args = jax.jit(bsdf.sample_bsdf)
timeit("sample_bsdf args", bs_args, key, d, nrm, eta, met, bc)

from tinypathtracer_tpu.models.envlight import env_lookup, gradient_sky
env = jnp.asarray(gradient_sky(64, 128))
el1 = jax.jit(lambda dd: env_lookup(env, dd))
timeit("env_lookup env-captured", el1, d)
el2 = jax.jit(env_lookup)
timeit("env_lookup args", el2, env, d)
