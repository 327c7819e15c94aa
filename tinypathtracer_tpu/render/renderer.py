"""Renderer: the jitted end-to-end pipeline.

The TPU analogue of `PathTracer::doTrace` (path_tracer.cu:491-554),
which per frame: re-seeds RNG, zeroes the accumulator, transforms
geometry to world space, rebuilds the LBVH, launches the megakernel,
and packs the framebuffer -- each stage a separate kernel launch with
`cudaDeviceSynchronize` between. Here the whole frame is ONE jitted XLA
program: geometry transform, BVH build, and the bounce loop fuse into a
single dispatch with no host sync until the image is fetched.

Pixel work is processed in tiles (lax.map over pixel tiles, scan over
spp inside) to bound the live [rays x triangles] working set -- the
role the 16x16 CUDA blocks play in the reference, but sized for
VMEM/HBM instead of SM occupancy.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tinypathtracer_tpu.config import RenderConfig
from tinypathtracer_tpu.models.scene import FlatScene, Scene
from tinypathtracer_tpu.ops import intersect
from tinypathtracer_tpu.render import film, raygen
from tinypathtracer_tpu.render.integrator import TraceData, trace_paths


def make_intersector(cfg: RenderConfig, tri_verts):
    """Build the closest-hit backend chosen by cfg.intersector."""
    if cfg.intersector == "bruteforce":
        chunk = min(512, max(8, tri_verts.shape[0]))
        return functools.partial(
            intersect.closest_hit_bruteforce, tri_verts=tri_verts, chunk=chunk)
    from tinypathtracer_tpu.ops import traverse

    bvh = traverse.build_bvh(tri_verts)
    return functools.partial(traverse.closest_hit_bvh, bvh=bvh,
                             stack_depth=cfg.stack_depth)


def render_frame(scene: FlatScene, cfg: RenderConfig, key):
    """Render one frame; returns the radiance SUM image [H, W, 3]
    (divide by cfg.spp for the mean -- kept as a sum so progressive
    accumulation across calls stays exact, cf. reference m_radiance).
    """
    data = TraceData.from_scene(scene)
    closest_hit = make_intersector(cfg, data.tri_verts)

    w, h, spp = cfg.width, cfg.height, cfg.spp
    n_pix = w * h
    tile = min(cfg.tile_pixels, n_pix)
    pad = (-n_pix) % tile
    pix = jnp.arange(n_pix + pad, dtype=jnp.int32)
    n_tiles = pix.shape[0] // tile
    tiles = pix.reshape(n_tiles, tile)

    yfov = scene.cam_yfov
    aspect = scene.cam_aspect

    def render_tile(tile_pix):
        px = tile_pix % w
        py = tile_pix // w

        def sample(carry, s):
            k = jax.random.fold_in(jax.random.fold_in(key, tile_pix[0]), s)
            k_cam, k_path = jax.random.split(k)
            o, d = raygen.camera_rays(
                k_cam, scene.cam_to_world, yfov, aspect, px, py, w, h)
            rad = trace_paths(data, cfg, closest_hit, o, d, k_path)
            return carry + rad, None

        acc0 = jnp.zeros((tile, 3), dtype=jnp.float32)
        acc, _ = lax.scan(sample, acc0, jnp.arange(spp, dtype=jnp.int32))
        return acc

    out = lax.map(render_tile, tiles)                 # [n_tiles, tile, 3]
    out = out.reshape(-1, 3)[:n_pix]
    return out.reshape(h, w, 3)


class Renderer:
    """Reusable jitted pipeline for a fixed config.

    scene arrays are traced arguments, so moving the camera or editing
    materials does NOT recompile -- only cfg changes do.
    """

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        self._fn = jax.jit(functools.partial(render_frame, cfg=cfg))

    def render(self, scene: FlatScene, key):
        """Returns the mean-radiance image [H, W, 3], top-down rows."""
        rad_sum = self._fn(scene, key=key)
        return film.to_image(rad_sum, self.cfg.spp)


def render(scene: Scene, cfg: RenderConfig, key,
           env_radiance: Optional[np.ndarray] = None):
    """One-shot convenience: flatten + jit + render mean image."""
    flat = scene.flatten(env_radiance=env_radiance)
    return Renderer(cfg).render(flat, key)
