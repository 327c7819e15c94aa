import time
import jax, jax.numpy as jnp

def timeit(label, fn, *args, n=8):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{label:46s} best {ts[0]*1e3:9.3f} ms  med {ts[n//2]*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)
for n in (1024, 1 << 17, 1 << 20, 1 << 23):
    x = jax.random.normal(key, (n, 3), jnp.float32)
    f = jax.jit(lambda x: x * 2.0 + 1.0)
    timeit(f"x*2+1 [{n},3]", f, x)

from tinypathtracer_tpu.ops.traverse import _ray_tri_single
for n in (1024, 1 << 20):
    o = jnp.zeros((n, 3)); d = jax.random.normal(key, (n, 3))
    v0 = jax.random.normal(key, (n, 3)); v1 = v0 + 0.1; v2 = v0 + 0.2
    rt = jax.jit(_ray_tri_single)
    timeit(f"_ray_tri_single [{n}]", rt, o, d, v0, v1, v2)

# chain of 20 elementwise ops
for n in (1 << 20,):
    x = jax.random.normal(key, (n, 3), jnp.float32)
    def chain(x):
        for _ in range(20):
            x = x * 1.0001 + 0.1
        return x
    f = jax.jit(chain)
    timeit(f"20-op chain [{n},3]", f, x)

# single output vs tuple output
def tup(x):
    return x * 2.0, x + 1.0, x - 1.0
f = jax.jit(tup)
x = jax.random.normal(key, (1 << 20, 3), jnp.float32)
timeit("3-output tuple [1M,3]", f, x)

# sin
f = jax.jit(lambda x: jnp.sin(x))
timeit("sin [1M,3]", f, x)
