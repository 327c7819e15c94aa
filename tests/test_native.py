"""Native runtime library tests: agreement with the Python/XLA paths."""

import base64

import numpy as np
import jax.numpy as jnp
import pytest

from tinypathtracer_tpu.utils import native


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="native toolchain unavailable")


@requires_native
def test_b64_matches_stdlib():
    rng = np.random.default_rng(0)
    for n in [0, 1, 2, 3, 57, 1000, 65537]:
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        enc = base64.b64encode(raw).decode()
        assert native.b64_decode(enc) == raw


@requires_native
def test_b64_rejects_garbage():
    with pytest.raises(ValueError):
        native.b64_decode("not*base64!")


@requires_native
@pytest.mark.parametrize("n", [1, 2, 33, 500])
def test_host_lbvh_invariants(n):
    rng = np.random.default_rng(n)
    tris = (rng.uniform(-3, 3, size=(n, 1, 3))
            + rng.normal(scale=.3, size=(n, 3, 3))).astype(np.float32)
    out = native.build_lbvh_host(tris)
    assert out is not None
    assert sorted(out["leaf_fid"].tolist()) == list(range(n))
    if n == 1:
        return
    refs = np.zeros(2 * n - 1, int)
    np.add.at(refs, out["left"], 1)
    np.add.at(refs, out["right"], 1)
    assert refs[0] == 0 and (refs[1:] == 1).all()
    # parent agreement + box containment
    for k in range(n - 1):
        assert out["parent"][out["left"][k]] == k
        assert out["parent"][out["right"][k]] == k
        for c in (out["left"][k], out["right"][k]):
            assert (out["bmin"][k] <= out["bmin"][c] + 1e-6).all()
            assert (out["bmax"][k] >= out["bmax"][c] - 1e-6).all()


@requires_native
def test_host_lbvh_traversal_matches_bruteforce():
    from tinypathtracer_tpu.ops import intersect
    from tinypathtracer_tpu.ops.lbvh import BVH
    from tinypathtracer_tpu.ops.traverse import closest_hit_bvh

    rng = np.random.default_rng(7)
    n = 300
    tris = (rng.uniform(-3, 3, size=(n, 1, 3))
            + rng.normal(scale=.3, size=(n, 3, 3))).astype(np.float32)
    out = native.build_lbvh_host(tris)
    bvh = BVH(left=jnp.asarray(out["left"]), right=jnp.asarray(out["right"]),
              parent=jnp.asarray(out["parent"]),
              leaf_fid=jnp.asarray(out["leaf_fid"]),
              bmin=jnp.asarray(out["bmin"]), bmax=jnp.asarray(out["bmax"]),
              tri_verts=jnp.asarray(tris))
    o = jnp.asarray(rng.uniform(-4, 4, size=(128, 3)).astype(np.float32))
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    f_bvh, t_bvh, _ = closest_hit_bvh(o, d, bvh)
    f_bf, t_bf, _ = intersect.closest_hit_bruteforce(o, d, jnp.asarray(tris))
    hit = np.asarray(f_bf) >= 0
    np.testing.assert_array_equal(np.asarray(f_bvh) >= 0, hit)
    np.testing.assert_allclose(np.asarray(t_bvh)[hit], np.asarray(t_bf)[hit],
                               rtol=1e-5)
