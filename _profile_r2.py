"""Round-2 profiling scratch: where does the frame time go?"""
import time, functools
import numpy as np
import jax, jax.numpy as jnp

from tinypathtracer_tpu import load_scene, RenderConfig, Renderer
from tinypathtracer_tpu.models.envlight import gradient_sky
from tinypathtracer_tpu.render.renderer import prepare_state, render_pixel_ids
from tinypathtracer_tpu.ops.dense import closest_hit_dense, precompute_woop

def timeit(label, fn, *args, n=3):
    out = fn(*args); jax.block_until_ready(out)
    best = float('inf')
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:55s} {best*1e3:10.2f} ms")
    return best

scene = load_scene("/root/reference/input/box.gltf")
flat = scene.flatten(env_radiance=gradient_sky(64, 128))
W = H = 512; SPP = 16; D = 8
cfg = RenderConfig(width=W, height=H, spp=SPP, max_depth=D,
                   intersector="dense", tile_pixels=16384)

r = Renderer(cfg)
key = jax.random.PRNGKey(0)
img = np.asarray(r.render(flat, key))
t_frame = timeit("full frame 512x512@16spp d8 dense", lambda: r.render(flat, key))
print(f"  -> rays/s = {W*H*SPP/t_frame:.3e}")

# --- dense kernel alone at various batch sizes ---
state = prepare_state(flat, cfg)
woop = state.bvh
print(f"faces={state.data.tri_verts.shape[0]} padded={woop.n_padded}")

for nrays in (16384, 262144, 1 << 20, 1 << 22):
    k = jax.random.PRNGKey(1)
    o = jnp.zeros((nrays, 3), jnp.float32) + jnp.array([0., 1., 3.])
    d = jax.random.normal(k, (nrays, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    hit = jax.jit(functools.partial(closest_hit_dense, woop=woop))
    t = timeit(f"dense kernel alone, N={nrays}", hit, o, d)
    print(f"  -> ray-tri tests/s = {nrays*woop.n_padded/t:.3e}, rays/s={nrays/t:.3e}")

# masked variant (partition overhead)
nrays = 1 << 20
o = jnp.zeros((nrays, 3), jnp.float32) + jnp.array([0., 1., 3.])
d = jax.random.normal(jax.random.PRNGKey(1), (nrays, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
mask = jnp.ones((nrays,), bool)
hitm = jax.jit(functools.partial(closest_hit_dense, woop=woop))
t = timeit(f"dense kernel masked(all live), N={nrays}", lambda: hitm(o, d, mask=mask))

# one full bounce-loop on a big flat ray batch (bypassing tile loop)
from tinypathtracer_tpu.render.integrator import trace_paths
from tinypathtracer_tpu.render import raygen
data = state.data
def big_batch(nrays, key):
    px = jnp.arange(nrays, dtype=jnp.int32) % W
    py = (jnp.arange(nrays, dtype=jnp.int32) // W) % H
    o, d = raygen.camera_rays(key, flat.cam_to_world, flat.cam_yfov,
                              flat.cam_aspect, px, py, W, H)
    return o, d

hit_fn = functools.partial(closest_hit_dense, woop=woop)
tp = jax.jit(lambda o, d, k: trace_paths(data, cfg, hit_fn, o, d, k))
for nrays in (262144, 1 << 20):
    o, d = big_batch(nrays, key)
    t = timeit(f"trace_paths (8 bounces), N={nrays}", tp, o, d, key)
    print(f"  -> rays/s={nrays/t:.3e}")
