"""Unit tests for utils.math3d against closed forms."""

import numpy as np
import pytest

from tinypathtracer_tpu.utils import math3d


def test_quat_identity():
    # Zero quaternion degenerates to identity (reference quat.h behavior)
    assert np.allclose(math3d.quat_to_mat3([0, 0, 0, 0]), np.eye(3))
    assert np.allclose(math3d.quat_to_mat3([0, 0, 0, 1]), np.eye(3))


def test_quat_z_90():
    # 90 deg about +Z: x -> y
    q = [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)]
    r = math3d.quat_to_mat3(q)
    assert np.allclose(r @ [1, 0, 0], [0, 1, 0], atol=1e-7)


def test_trs_order():
    # Translate * Rotate * Scale: scale applies first
    m = math3d.trs_to_mat4([1, 0, 0], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)],
                           [2, 1, 1])
    p = m @ np.array([1, 0, 0, 1.0])
    # scale -> (2,0,0); rotate90z -> (0,2,0); translate -> (1,2,0)
    assert np.allclose(p[:3], [1, 2, 0], atol=1e-6)


def test_normal_matrix_nonuniform_scale():
    m = math3d.trs_to_mat4(scale=[2.0, 1.0, 1.0])
    nm = math3d.normal_matrix(m)
    # plane x+y=c has normal (1,1,0)/sqrt2; after scaling x by 2 the
    # surface tangent (1,-1,0) maps to (2,-1,0); transformed normal must
    # stay orthogonal to transformed tangents.
    n = nm @ np.array([1.0, 1.0, 0.0])
    t = m[:3, :3] @ np.array([1.0, -1.0, 0.0])
    assert abs(n @ t) < 1e-7


def test_euler_zxy_matches_quat():
    ang = [30.0, 40.0, 50.0]
    q = math3d.euler_zxy_to_quat(ang)
    r = math3d.quat_to_mat3(q)
    # Rz * Rx * Ry composition (reference quat.h:15 comment)
    def rot(axis, deg):
        a = np.deg2rad(deg)
        c, s = np.cos(a), np.sin(a)
        if axis == "x":
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == "y":
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expect = rot("z", 50.0) @ rot("x", 30.0) @ rot("y", 40.0)
    assert np.allclose(r, expect, atol=1e-7)


def test_vnormalize_and_onb():
    import jax.numpy as jnp

    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = math3d.vnormalize(v)
    assert np.allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-6)

    t, b = math3d.build_onb(n)
    t, b, n = map(np.asarray, (t, b, n))
    for i in range(2):
        assert abs(t[i] @ n[i]) < 1e-6
        assert abs(b[i] @ n[i]) < 1e-6
        assert abs(t[i] @ b[i]) < 1e-6
        assert np.allclose(np.linalg.norm(t[i]), 1.0, atol=1e-5)


def test_reflect():
    import jax.numpy as jnp

    d = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = math3d.reflect(d, n)
    assert np.allclose(np.asarray(r), [[1.0, 1.0, 0.0]])
