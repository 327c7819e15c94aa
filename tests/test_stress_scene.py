"""Large-scene (stress) coverage: the scalable intersector story.

The bundled scenes are <=2k faces; these tests build a ~63k-face
procedural sphere room (models/procedural.py) and check that the gated
dense path stays an oracle-exact intersector at that scale (a ray
subsample vs chunked brute force), and that a small render completes
and looks sane. bench.py's BENCH_SCENE=stress runs the same scene at
full size on the TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu import RenderConfig, Renderer
from tinypathtracer_tpu.models.procedural import sphere_grid_scene
from tinypathtracer_tpu.ops import intersect
from tinypathtracer_tpu.ops.dense import (_GATE_MIN_FACES,
                                          closest_hit_dense,
                                          precompute_woop)
from tinypathtracer_tpu.render.integrator import TraceData


@pytest.fixture(scope="module")
def stress():
    flat = sphere_grid_scene(grid=3, n_lat=12, n_lon=24)   # ~17k faces
    data = jax.jit(TraceData.from_scene)(flat)
    return flat, data


def test_scene_size(stress):
    flat, data = stress
    f = flat.indices.shape[0]
    assert f > _GATE_MIN_FACES, f
    woop = jax.jit(precompute_woop)(data.tri_verts)
    assert woop.n_padded >= f


def test_gated_dense_matches_bruteforce_subsample(stress):
    flat, data = stress
    woop = jax.jit(precompute_woop)(data.tri_verts)
    rng = np.random.default_rng(3)
    n = 256
    o = jnp.asarray(rng.uniform(-4.5, 4.5, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    fd, td, _ = closest_hit_dense(o, d, woop)
    fb, tb, _ = intersect.closest_hit_bruteforce(o, d, data.tri_verts,
                                                 chunk=512)
    fd, fb = np.asarray(fd), np.asarray(fb)
    agree = (fd == fb).mean()
    assert agree > 0.99, f"hit agreement {agree}"
    both = (fd == fb) & (fd >= 0)
    assert both.sum() > 200      # inside a closed room: almost all hit
    np.testing.assert_allclose(np.asarray(td)[both], np.asarray(tb)[both],
                               rtol=1e-3, atol=1e-4)


def test_stress_render_smoke(stress):
    flat, _ = stress
    cfg = RenderConfig(width=24, height=24, spp=2, max_depth=3,
                       intersector="dense", rays_per_dispatch=24 * 24 * 2)
    img = np.asarray(Renderer(cfg).render(flat, jax.random.PRNGKey(0)))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3     # the emissive panel lights the room
