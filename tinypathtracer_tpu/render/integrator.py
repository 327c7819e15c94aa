"""Path-tracing integrator.

The TPU redesign of the CUDA megakernel `trace` (path_tracer.cu:296-435).
The reference runs one thread per pixel looping over spp and bounce
depth with per-depth stacks (pStack/mtlIdxStack/directLightStack/
attenuation, path_tracer.cu:315-318) and a backward accumulation pass
(:417-430). Here the bounce loop is a `lax.scan` over a whole ray batch
carrying (origin, dir, throughput, radiance, alive) -- the backward
stack is algebraically folded into a forward throughput product, which
is exactly equivalent:

    backward:  L_d = (direct_d + L_{d+1}) * a_d        (a_d = atten/p)
    forward:   L   = sum_d direct_d * prod_{k<=d} a_k  + terminal * prod a_k

so the forward pass needs no per-depth storage at all (the analogue of
the survey's "scale the big axis without materializing a stack").

Estimator semantics ("reference" mode) -- each quirk kept deliberately
for image parity and gated behind cfg.mode so a physically-correct mode
can coexist:

  * delta-light NEE adds baseColor * incomingRadiance with NO cosine or
    1/pi BRDF factor (path_tracer.cu:281);
  * one extra BSDF-sampled "direct" ray per diffuse bounce adds the raw
    scalar emissionFactor of whatever emissive it hits
    (path_tracer.cu:387-401), with no distance/cos weighting and no env
    contribution on miss;
  * hitting an emissive surface terminates the path and contributes the
    scalar emissionFactor, NOT scaled by that bounce's BSDF
    (path_tracer.cu:408-412, 421-423);
  * miss terminates with the env lookup (path_tracer.cu:358-362);
  * shadow rays use full closest-hit occlusion with no max-distance
    clip: geometry beyond a point light still shadows it
    (path_tracer.cu:277-283).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from tinypathtracer_tpu.config import RenderConfig
from tinypathtracer_tpu.models.envlight import (
    EnvSamplingTables, build_env_tables, env_lookup, sample_env_u)
from tinypathtracer_tpu.models.scene import FlatScene
from tinypathtracer_tpu.ops import bsdf, lights as lights_ops
from tinypathtracer_tpu.ops.sampling import PI, fold_all, lane_uniform
from tinypathtracer_tpu.ops.traverse import _ray_tri_single
from tinypathtracer_tpu.utils.math3d import vdot, vnormalize

# closest_hit(origins [N,3], dirs [N,3], mask=[N] bool or None)
#   -> (fid [N] i32, t [N], uv [N,2]); mask=False lanes report miss and
#   (backend permitting) cost no intersection work.
HitFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TraceData:
    """Per-frame world-space geometry + shading tables (device arrays)."""

    tri_verts: jnp.ndarray     # [F, 3, 3] world-space triangle vertices
    world_normals: jnp.ndarray # [V, 3]
    indices: jnp.ndarray       # [F, 3]
    face_mtl: jnp.ndarray      # [F]
    mtl_base_color: jnp.ndarray
    mtl_emission: jnp.ndarray
    mtl_eta: jnp.ndarray
    mtl_metallic: jnp.ndarray
    light_kind: jnp.ndarray
    light_color: jnp.ndarray
    light_intensity: jnp.ndarray
    light_pos: jnp.ndarray
    light_dir: jnp.ndarray
    light_cos_outer: jnp.ndarray
    light_inv_cone: jnp.ndarray
    env_radiance: jnp.ndarray
    # env importance-sampling tables (models/envlight.py): used by the
    # physical estimator's NEE -- the machinery the reference built but
    # never called (env_light.cuh:58-70)
    env_marginal_cdf: jnp.ndarray
    env_conditional_cdf: jnp.ndarray
    env_pdf: jnp.ndarray
    # Fused per-face shading table [F, 30]: corner normals (9), base
    # color (3), emission (1), eta (1), metallic (1), triangle
    # vertices (9), corner texcoords (6). One row gather per bounce
    # replaces ~14 separate gathers (two-level for normals) -- on TPU
    # the bounce glue between intersection kernels is gather-bound, so
    # packing is a direct wall-clock win. Gradients flow through the
    # pack gather to vertices/normals/materials exactly as they did
    # through the individual gathers.
    face_pack: jnp.ndarray
    face_emission: jnp.ndarray   # [F] emission only, for cheap lookups
    # base-color texturing (completes the reference's TODO at
    # mesh.cu:155 / mesh.cuh:114): per-face atlas layer (-1 = none) and
    # the atlas itself ([1,1,1,3] sentinel = scene has no textures; the
    # integrator then skips texture work at trace time)
    face_tex: jnp.ndarray        # [F] i32
    tex_atlas: jnp.ndarray       # [T, Ht, Wt, 3] f32

    @staticmethod
    def from_scene(scene: FlatScene) -> "TraceData":
        wv, wn = scene.world_geometry()
        tables = build_env_tables(scene.env_radiance)
        tri_verts = wv[scene.indices]
        corner_n = wn[scene.indices]                       # [F, 3, 3]
        f = scene.indices.shape[0]
        face_emission = scene.mtl_emission[scene.face_mtl]
        face_pack = jnp.concatenate([
            corner_n.reshape(f, 9),
            scene.mtl_base_color[scene.face_mtl],
            face_emission[:, None],
            scene.mtl_eta[scene.face_mtl][:, None],
            scene.mtl_metallic[scene.face_mtl][:, None],
            tri_verts.reshape(f, 9),
            scene.texcoords[scene.indices].reshape(f, 6),
        ], axis=1)
        return TraceData(
            tri_verts=tri_verts,
            world_normals=wn,
            indices=scene.indices,
            face_mtl=scene.face_mtl,
            mtl_base_color=scene.mtl_base_color,
            mtl_emission=scene.mtl_emission,
            mtl_eta=scene.mtl_eta,
            mtl_metallic=scene.mtl_metallic,
            light_kind=scene.light_kind,
            light_color=scene.light_color,
            light_intensity=scene.light_intensity,
            light_pos=scene.light_pos,
            light_dir=scene.light_dir,
            light_cos_outer=scene.light_cos_outer,
            light_inv_cone=scene.light_inv_cone,
            env_radiance=scene.env_radiance,
            env_marginal_cdf=tables.marginal_cdf,
            env_conditional_cdf=tables.conditional_cdf,
            env_pdf=tables.pdf,
            face_pack=face_pack,
            face_emission=face_emission,
            face_tex=scene.mtl_tex_id[scene.face_mtl],
            tex_atlas=scene.tex_atlas,
        )


def _direct_light(data: TraceData, cfg: RenderConfig, hit_pos, base_color,
                  any_hit: HitFn, live):
    """Delta-light NEE (reference sampleDeltaLights, path_tracer.cu:265-286).

    One shadow ray per light per lane; the light count is static so the
    loop unrolls into L independent masked occlusion queries. Only
    `live` lanes trace (dead lanes' contributions are discarded by the
    caller's mask anyway).
    """
    n = hit_pos.shape[0]
    direct = jnp.zeros((n, 3), dtype=jnp.float32)
    n_lights = data.light_kind.shape[0]
    for li in range(n_lights):
        wi, lrad, _dist = lights_ops.sample_delta_light(
            hit_pos, data.light_kind[li], data.light_color[li],
            data.light_intensity[li], data.light_pos[li], data.light_dir[li],
            data.light_cos_outer[li], data.light_inv_cone[li])
        # Occlusion is purely combinatorial: detach it from autodiff so
        # while_loop-based backends never see tangents.
        fid, _t, _uv = any_hit(lax.stop_gradient(hit_pos),
                               lax.stop_gradient(wi), mask=live)
        unoccluded = fid < 0
        contrib = base_color * lrad
        direct = direct + jnp.where(unoccluded[:, None], contrib, 0.0)
    return direct


def trace_paths(data: TraceData, cfg: RenderConfig, closest_hit: HitFn,
                origins, dirs, lane_keys):
    """Trace a batch of rays to completion; returns radiance [N, 3].

    lane_keys: [N] PRNG key array, one per ray lane (the renderer folds
    (pixel, sample) ids into the frame key). All randomness inside a
    bounce is drawn from per-lane keys, so results are independent of
    how lanes are batched/tiled/sharded.

    One scan step == one bounce for ALL rays (dead lanes are masked,
    wavefront compaction comes in at the traversal layer where it pays).
    """
    n = origins.shape[0]

    def hit_query(o, d, mask):
        """Closest hit with the discrete part detached from autodiff.

        The winning face id comes from the (non-differentiable,
        possibly while_loop-based) traversal backend under
        stop_gradient; t and the barycentrics are then recomputed
        differentiably against that one triangle, so gradients flow to
        vertices/camera while the combinatorial visibility decision is
        treated as constant -- the path-replay convention (hit ids are
        non-differentiable, shading is; SURVEY.md par. 7 hard part 2).
        The recomputation is the same Moller-Trumbore arithmetic the
        backends use, so primal values are bit-identical.
        """
        fid, _t, _uv = jax.tree_util.tree_map(
            lax.stop_gradient, closest_hit(lax.stop_gradient(o),
                                           lax.stop_gradient(d),
                                           mask=mask))
        return fid

    def bounce(state, depth):
        o, d, thr, rad, alive, prev_spec = state
        # One [N, 6] uniform block per bounce from per-lane keys:
        # cols 0-1 BSDF hemisphere, 2 BSDF Fresnel coin; in reference
        # mode cols 3-4 are the extra direct-sample hemisphere and 5 its
        # coin; in physical mode cols 3-4 drive env NEE and 5 RR.
        u = lane_uniform(fold_all(lane_keys, depth), 6)

        fid = hit_query(o, d, alive)
        miss = fid < 0

        # Terminal: environment on miss (path_tracer.cu:358-362). In
        # physical mode, diffuse bounces already account for the dome
        # via env NEE below, so only camera/specular paths collect it
        # here (prev_spec starts True).
        env = env_lookup(data.env_radiance, d) * cfg.env_scale
        count_env = (alive & miss) if cfg.mode == "reference" \
            else (alive & miss & prev_spec)
        rad = rad + jnp.where(count_env[:, None], thr * env, 0.0)

        # One fused row gather, then the differentiable t/uv recompute
        # against the winning triangle (see hit_query docstring).
        pack = data.face_pack[jnp.maximum(fid, 0)]          # [N, 24]
        t, u_, v_, _ok = _ray_tri_single(
            o, d, pack[:, 15:18], pack[:, 18:21], pack[:, 21:24])
        w_ = 1.0 - u_ - v_
        nrm = (w_[:, None] * pack[:, 0:3]
               + u_[:, None] * pack[:, 3:6]
               + v_[:, None] * pack[:, 6:9])
        nrm = vnormalize(nrm, eps=1e-20)  # eps: degenerate interpolated normals
        hit_pos = o + t[:, None] * d

        base_color = pack[:, 9:12]
        emission = pack[:, 12]
        eta = pack[:, 13]
        metallic = pack[:, 14]

        # Base-color texture modulation (shape-static skip for
        # untextured scenes). Point-sampled with wrap addressing,
        # matching the reference's cudaFilterModePoint texture objects
        # (texture.cu:129-170); glTF uv origin is top-left so v maps to
        # rows directly. Texel gradients flow through the gather.
        if (data.tex_atlas.shape[0] > 1 or data.tex_atlas.shape[1] > 1
                or data.tex_atlas.shape[2] > 1):
            th, tw = data.tex_atlas.shape[1], data.tex_atlas.shape[2]
            uv_t = (w_[:, None] * pack[:, 24:26]
                    + u_[:, None] * pack[:, 26:28]
                    + v_[:, None] * pack[:, 28:30])
            uv_t = lax.stop_gradient(uv_t)   # texel choice is discrete
            tid = data.face_tex[jnp.maximum(fid, 0)]
            tx = jnp.clip((jnp.mod(uv_t[:, 0], 1.0) * tw).astype(jnp.int32),
                          0, tw - 1)
            ty = jnp.clip((jnp.mod(uv_t[:, 1], 1.0) * th).astype(jnp.int32),
                          0, th - 1)
            texel = data.tex_atlas[jnp.maximum(tid, 0), ty, tx]
            base_color = base_color * jnp.where((tid >= 0)[:, None],
                                                texel, 1.0)

        # Terminal: emissive hit contributes the raw scalar emission
        # (path_tracer.cu:408-412, 421-423)
        emissive = emission > 0.0
        rad = rad + jnp.where((alive & ~miss & emissive)[:, None],
                              thr * emission[:, None], 0.0)

        live = alive & ~miss & ~emissive

        # BSDF bounce: weight = baseColor * atten/p (path_tracer.cu:379-380)
        next_dir, weight, is_spec = bsdf.sample_bsdf_u(
            u[:, 0], u[:, 1], u[:, 2], d, nrm, eta, metallic, base_color)

        if cfg.mode == "reference":
            # Delta-light NEE (quirk: no cos / BRDF weighting)
            direct = _direct_light(data, cfg, hit_pos, base_color,
                                   closest_hit, live)
            # Extra direct-emitter sample for non-specular materials
            # (path_tracer.cu:387-401): a second BSDF draw; if it hits
            # anything, add that material's scalar emissionFactor.
            do_extra = ~((eta >= 1.0) | (metallic > 0.0))
            dir2, _w2, _s2 = bsdf.sample_bsdf_u(
                u[:, 3], u[:, 4], u[:, 5], d, nrm, eta, metallic, base_color)
            fid2, _t2, _uv2 = closest_hit(lax.stop_gradient(hit_pos),
                                          lax.stop_gradient(dir2),
                                          mask=live & do_extra)
            em2 = data.face_emission[jnp.maximum(fid2, 0)]
            em2 = jnp.where(fid2 >= 0, em2, 0.0)
            direct = direct + jnp.where(do_extra, em2, 0.0)[:, None]
            # direct_d enters weighted by prod_{k<=d} a_k = thr * weight
            # (the estimator folds this bounce's BSDF into the direct
            # term -- an exact transcription of path_tracer.cu:427)
            rad = rad + jnp.where(live[:, None], thr * weight * direct, 0.0)
        else:
            # Physical NEE on diffuse lanes: f = albedo/pi, weighted by
            # cos(theta); specular lanes skip NEE (delta BSDF).
            n_side = nrm * jnp.where(vdot(d, nrm) > 0.0, -1.0, 1.0)[:, None]
            f_diff = base_color / PI
            diffuse = live & ~is_spec
            direct = jnp.zeros((n, 3), dtype=jnp.float32)
            for li in range(data.light_kind.shape[0]):
                wi, lrad, _dist = lights_ops.sample_delta_light(
                    hit_pos, data.light_kind[li], data.light_color[li],
                    data.light_intensity[li], data.light_pos[li],
                    data.light_dir[li], data.light_cos_outer[li],
                    data.light_inv_cone[li])
                cos_l = jnp.maximum(vdot(wi, n_side), 0.0)
                ofid, _t_, _u_ = closest_hit(lax.stop_gradient(hit_pos),
                                             lax.stop_gradient(wi),
                                             mask=diffuse)
                direct = direct + jnp.where((ofid < 0)[:, None],
                                            f_diff * (cos_l * 1.0)[:, None] * lrad,
                                            0.0)
            # Env-light importance sampling wired into NEE (the
            # reference built these tables but never called them,
            # env_light.cuh:58-70 / SURVEY.md par. 2)
            wi_e, pdf_e = sample_env_u(
                u[:, 3:5],
                EnvSamplingTables(marginal_cdf=data.env_marginal_cdf,
                                  conditional_cdf=data.env_conditional_cdf,
                                  pdf=data.env_pdf))
            cos_e = jnp.maximum(vdot(wi_e, n_side), 0.0)
            efid, _t2_, _u2_ = closest_hit(lax.stop_gradient(hit_pos),
                                           lax.stop_gradient(wi_e),
                                           mask=diffuse)
            env_e = env_lookup(data.env_radiance, wi_e) * cfg.env_scale
            w_env = jnp.where(pdf_e > 0.0, cos_e / jnp.maximum(pdf_e, 1e-12), 0.0)
            direct = direct + jnp.where((efid < 0)[:, None],
                                        f_diff * w_env[:, None] * env_e, 0.0)
            rad = rad + jnp.where(diffuse[:, None], thr * direct, 0.0)

        thr = jnp.where(live[:, None], thr * weight, thr)
        o = jnp.where(live[:, None], hit_pos, o)
        d = jnp.where(live[:, None], next_dir, d)
        prev_spec = jnp.where(live, is_spec, prev_spec)

        # Russian roulette (physical mode only; not part of the
        # reference estimator)
        if cfg.mode == "physical" and cfg.russian_roulette:
            p_sur = jnp.clip(jnp.max(thr, axis=-1), 0.05, 1.0)
            late = depth >= 3
            u_rr = u[:, 5]
            kill = live & late & (u_rr >= p_sur)
            thr = jnp.where((live & late)[:, None], thr / p_sur[:, None], thr)
            live = live & ~kill

        return (o, d, thr, rad, live, prev_spec), None

    init = (
        origins,
        dirs,
        jnp.ones((n, 3), dtype=jnp.float32),
        jnp.zeros((n, 3), dtype=jnp.float32),
        jnp.ones((n,), dtype=bool),
        jnp.ones((n,), dtype=bool),   # prev_spec: camera rays see the env
    )
    (_, _, _, rad, _, _), _ = lax.scan(
        bounce, init, jnp.arange(cfg.max_depth, dtype=jnp.int32))
    return rad
