"""AOV / debug render modes.

TPU equivalents of the reference's debug renders:

  * normal  -- the RENDER_NORMAL compile path (path_tracer.cu:13,
    322-342): first-hit interpolated normal, per-component ABSOLUTE
    value (`normal.habs()`), averaged over spp; miss lanes contribute
    black.
  * hitmask -- `checkHitStatus` (debug_utils.h:130-169): mid-gray
    (125/255) where the primary ray hit anything, black elsewhere.
  * depth   -- no direct reference analogue (closest to the t values
    `traverseBVH` reports); normalized 1/(1+t) so infinity maps to 0
    and near geometry is bright.

These exist to verify images cheaply when the estimator or RNG changes:
an AOV render is independent of the shading/estimator code path, so a
golden-image diff against it localizes regressions to either geometry
(AOV changed) or shading (AOV identical).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tinypathtracer_tpu.config import RenderConfig
from tinypathtracer_tpu.models.scene import FlatScene
from tinypathtracer_tpu.ops.sampling import fold_all, fold_lanes, lane_uniform
from tinypathtracer_tpu.render import raygen
from tinypathtracer_tpu.utils.math3d import REAL_MAX, vnormalize

AOV_KINDS = ("normal", "depth", "hitmask")


def render_aov(scene: FlatScene, cfg: RenderConfig, key, kind: str):
    """Render one AOV image [H, W, 3] float32 in [0, 1]."""
    if kind not in AOV_KINDS:
        raise ValueError(f"unknown AOV {kind!r}; one of {AOV_KINDS}")
    from tinypathtracer_tpu.render.renderer import prepare_state, _hit_fn

    state = prepare_state(scene, cfg)
    closest_hit = _hit_fn(state, cfg)
    data = state.data
    w, h, spp = cfg.width, cfg.height, cfg.spp

    pix = jnp.arange(w * h, dtype=jnp.int32)
    lane_pix = jnp.repeat(pix, spp)
    lane_s = jnp.tile(jnp.arange(spp, dtype=jnp.int32), w * h)
    keys = fold_lanes(key, lane_pix)
    keys = jax.vmap(jax.random.fold_in)(keys, lane_s)
    from tinypathtracer_tpu.render.renderer import _CAM_TAG

    u_cam = lane_uniform(fold_all(keys, _CAM_TAG), 2)
    o, d = raygen.camera_rays_u(u_cam, scene.cam_to_world, scene.cam_yfov,
                                scene.cam_aspect, lane_pix % w,
                                lane_pix // w, w, h)
    fid, t, _uv = closest_hit(o, d)
    hit = fid >= 0

    if kind == "hitmask":
        val = jnp.where(hit, 125.0 / 255.0, 0.0)[:, None] * jnp.ones((1, 3))
    elif kind == "depth":
        val = (jnp.where(hit, 1.0 / (1.0 + t), 0.0)[:, None]
               * jnp.ones((1, 3)))
    else:  # normal
        from tinypathtracer_tpu.ops.traverse import _ray_tri_single

        pack = data.face_pack[jnp.maximum(fid, 0)]
        _t, u_, v_, _ok = _ray_tri_single(
            o, d, pack[:, 15:18], pack[:, 18:21], pack[:, 21:24])
        w_ = 1.0 - u_ - v_
        nrm = (w_[:, None] * pack[:, 0:3]
               + u_[:, None] * pack[:, 3:6]
               + v_[:, None] * pack[:, 6:9])
        nrm = vnormalize(nrm, eps=1e-20)
        val = jnp.where(hit[:, None], jnp.abs(nrm), 0.0)

    img = val.reshape(w * h, spp, 3).mean(axis=1)
    return img.reshape(h, w, 3)


def render_aov_jit(scene: FlatScene, cfg: RenderConfig, key, kind: str):
    return jax.jit(functools.partial(render_aov, cfg=cfg, kind=kind))(
        scene, key=key)
