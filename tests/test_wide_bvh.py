"""Wide (8-ary) BVH: collapse invariants + traversal equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu.ops import intersect
from tinypathtracer_tpu.ops.wide_bvh import build_wide_host, closest_hit_wbvh


def random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-3, 3, size=(n, 1, 3))
            + rng.normal(scale=.3, size=(n, 3, 3))).astype(np.float32)


def random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("n", [1, 3, 4, 5, 33, 500, 2000])
def test_collapse_covers_all_faces(n):
    w = build_wide_host(random_tris(n, seed=n))
    ptr = np.asarray(w.child_ptr)
    cnt = np.asarray(w.child_count)
    # every face appears in exactly one leaf run
    covered = np.zeros(n, dtype=int)
    for row_p, row_c in zip(ptr, cnt):
        for p, c in zip(row_p, row_c):
            if p >= 0 and c > 0:
                covered[p:p + c] += 1
    assert (covered == 1).all()
    # every internal slot points at a valid wide node
    internal = (ptr >= 0) & (cnt == 0)
    assert ptr[internal].max(initial=-1) < ptr.shape[0]
    # run lengths respect leaf_k
    assert cnt.max() <= w.leaf_k


@pytest.mark.parametrize("n,seed", [(1, 0), (4, 1), (17, 2), (200, 3),
                                    (1000, 4), (5000, 5)])
def test_wide_traversal_matches_bruteforce(n, seed):
    tris = random_tris(n, seed=seed)
    o, d = random_rays(256, seed=seed + 20)
    w = build_wide_host(tris)
    f_w, t_w, uv_w = closest_hit_wbvh(o, d, w)
    f_bf, t_bf, _ = intersect.closest_hit_bruteforce(o, d, jnp.asarray(tris))
    hit = np.asarray(f_bf) >= 0
    np.testing.assert_array_equal(np.asarray(f_w) >= 0, hit)
    np.testing.assert_allclose(np.asarray(t_w)[hit], np.asarray(t_bf)[hit],
                               rtol=1e-5)


def test_wbvh_render_matches_bvh(box_scene):
    from tinypathtracer_tpu import RenderConfig, Renderer
    from tinypathtracer_tpu.models.envlight import gradient_sky

    flat = box_scene.flatten(env_radiance=gradient_sky(8, 16))
    kw = dict(width=24, height=24, spp=2, max_depth=3, tile_pixels=24 * 24)
    key = jax.random.PRNGKey(0)
    a = np.asarray(Renderer(RenderConfig(intersector="bvh", **kw)).render(flat, key))
    b = np.asarray(Renderer(RenderConfig(intersector="wbvh", **kw)).render(flat, key))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
