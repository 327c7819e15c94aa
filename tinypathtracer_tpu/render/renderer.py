"""Renderer: the jitted end-to-end pipeline.

The TPU analogue of `PathTracer::doTrace` (path_tracer.cu:491-554),
which per frame: re-seeds RNG, zeroes the accumulator, transforms
geometry to world space, rebuilds the LBVH, launches the megakernel,
and packs the framebuffer -- each stage a separate kernel launch with
`cudaDeviceSynchronize` between. Here the whole frame is ONE jitted XLA
program: geometry transform, BVH build, and the bounce loop fuse into a
single dispatch with no host sync until the image is fetched.

The (pixel, sample) axes are FLATTENED into one ray axis processed in
large chunks (cfg.rays_per_dispatch, default 1M rays): on TPU the
per-dispatch overhead and the per-bounce glue amortize over the whole
chunk, and the intersection kernel sees the biggest possible batch --
the round-2 profiling showed small spp-at-a-time dispatches were the
dominant frame cost. Each lane derives its own PRNG key from
(pixel id, absolute sample id), so images are bit-identical across any
chunking/tiling/sharding layout and progressive resume is exact for
any chunk schedule. Rendering is addressed by pixel-id arrays so the
same code path serves the single-chip renderer and the
shard_map-distributed one (parallel/shard.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tinypathtracer_tpu.config import RenderConfig
from tinypathtracer_tpu.models.scene import FlatScene, Scene
from tinypathtracer_tpu.ops import intersect
from tinypathtracer_tpu.ops.lbvh import BVH, build_lbvh
from tinypathtracer_tpu.ops.traverse import closest_hit_bvh
from tinypathtracer_tpu.ops.sampling import fold_all, fold_lanes, lane_uniform
from tinypathtracer_tpu.render import film, raygen
from tinypathtracer_tpu.render.integrator import TraceData, trace_paths

# Key-derivation tag for the camera-jitter draw; bounces use their depth
# (0..max_depth-1) as the tag, so any large constant is collision-free.
_CAM_TAG = 0x00CA_0CA1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PipelineState:
    """Everything the per-pixel render needs, as one replicable pytree:
    the flattened scene, derived world-space trace data, and (for the
    bvh intersector) the acceleration structure. Building this is the
    per-frame 'transform + BVH rebuild' stage of the reference
    (path_tracer.cu:536-545)."""

    scene: FlatScene
    data: TraceData
    bvh: Union[BVH, tuple]   # () when cfg.intersector == "bruteforce"


def resolve_intersector(cfg: RenderConfig, n_faces: int) -> str:
    """Static intersector policy. A 'dense' request resolves by the
    measured crossover (BASELINE.md round-5 traversal table): the
    whole-scene dense sweep (+ megakernel) wins below ~8k padded faces;
    above it the packet near-to-far chunk walk is 3-4x faster and
    sublinear in F, so large scenes auto-route to it."""
    if cfg.intersector == "dense":
        from tinypathtracer_tpu.ops.mega import MEGA_MAX_FACES

        if -(-n_faces // 128) * 128 > MEGA_MAX_FACES:
            return "packet"
    return cfg.intersector


def prepare_state(scene: FlatScene, cfg: RenderConfig,
                  prebuilt_bvh=None) -> PipelineState:
    data = TraceData.from_scene(scene)
    isect = resolve_intersector(cfg, data.tri_verts.shape[0])
    if isect == "bruteforce":
        bvh = ()
    elif isect == "dense":
        from tinypathtracer_tpu.ops.dense import precompute_woop

        bvh = precompute_woop(data.tri_verts)
    elif isect == "packet":
        from tinypathtracer_tpu.ops.packet import precompute_packet

        bvh = precompute_packet(data.tri_verts, tc=cfg.packet_tc)
    elif prebuilt_bvh is not None:
        # host-built nodes (or any precomputed tree); re-point tri_verts
        # at this frame's device geometry so shading stays differentiable
        bvh = dataclasses.replace(prebuilt_bvh, tri_verts=data.tri_verts)
    else:
        bvh = build_lbvh(data.tri_verts)
    return PipelineState(scene=scene, data=data, bvh=bvh)


def _host_world_tris(scene: FlatScene):
    import numpy as np

    verts = np.asarray(scene.vertices)
    idx = np.asarray(scene.indices)
    vm = np.asarray(scene.vert_mats)[np.asarray(scene.vert_obj)]
    wv = np.einsum("vij,vj->vi", vm[:, :3, :3], verts) + vm[:, :3, 3]
    return wv[idx].astype(np.float32)


def host_build_bvh(scene: FlatScene, pad_rel: float = 1e-5) -> BVH:
    """Build the LBVH on the host CPU (native builder, with jnp-on-host
    fallback) from the scene's world-space geometry.

    Boxes are inflated by pad_rel so ulp-level differences between the
    host transform and the device transform can never cull a true hit
    (box tests only need to be conservative).
    """
    import numpy as np

    tri = _host_world_tris(scene)                        # [F, 3, 3]

    from tinypathtracer_tpu.utils import native

    out = native.build_lbvh_host(tri)
    if out is None:  # no toolchain: fall back to the XLA builder on CPU
        with jax.default_device(jax.devices("cpu")[0]):
            return build_lbvh(jnp.asarray(tri))
    pad = pad_rel * np.maximum(
        1.0, np.abs(out["bmax"]) + np.abs(out["bmin"]))
    return BVH(
        left=jnp.asarray(out["left"]), right=jnp.asarray(out["right"]),
        parent=jnp.asarray(out["parent"]),
        leaf_fid=jnp.asarray(out["leaf_fid"]),
        bmin=jnp.asarray(out["bmin"] - pad),
        bmax=jnp.asarray(out["bmax"] + pad),
        tri_verts=jnp.asarray(tri),
    )


def _hit_fn(state: PipelineState, cfg: RenderConfig):
    isect = resolve_intersector(cfg, state.data.tri_verts.shape[0])
    if isect == "dense":
        from tinypathtracer_tpu.ops.dense import closest_hit_dense

        return functools.partial(closest_hit_dense, woop=state.bvh)
    if isect == "packet":
        from tinypathtracer_tpu.ops.packet import closest_hit_packet

        return functools.partial(closest_hit_packet, pk=state.bvh,
                                 packet=cfg.packet_w, kvisit=cfg.packet_k,
                                 group=cfg.packet_g)
    if isect == "bvh":
        return functools.partial(closest_hit_bvh, bvh=state.bvh,
                                 stack_depth=cfg.stack_depth)
    chunk = min(512, max(8, state.data.tri_verts.shape[0]))
    return functools.partial(intersect.closest_hit_bruteforce,
                             tri_verts=state.data.tri_verts, chunk=chunk)


def render_pixel_ids(state: PipelineState, cfg: RenderConfig, pix, key,
                     spp: Optional[int] = None, sample_offset: int = 0):
    """Radiance SUM over `spp` samples for a flat array of pixel ids.

    pix: [P] int32 pixel ids in row-major (y * width + x) order; ids
    >= width*height are padding lanes (rendered but discarded by the
    caller). Returns [P, 3] float32. Dividing by spp gives the mean;
    the sum form keeps progressive/multi-shard accumulation exact
    (cf. the reference's m_radiance accumulator).
    """
    spp = cfg.spp if spp is None else spp
    closest_hit = _hit_fn(state, cfg)
    scene, data = state.scene, state.data
    w, h = cfg.width, cfg.height

    # Megakernel fast path: whole bounce loop in one Pallas program per
    # ray block (ops/mega.py), bit-identical images, modular-replay
    # gradients. Static decision (shapes + cfg only).
    from tinypathtracer_tpu.ops.dense import WoopTris
    from tinypathtracer_tpu.ops.mega import mega_enabled, trace_paths_mega

    use_mega = (cfg.intersector == "dense"
                and isinstance(state.bvh, WoopTris)
                and mega_enabled(data, cfg, state.bvh))

    n = pix.shape[0]
    # pixels per dispatch chunk, from the ray budget (all spp of a pixel
    # stay in one chunk so the sample reduction happens in-chunk)
    px_chunk = max(1, min(n, cfg.rays_per_dispatch // spp))
    pad = (-n) % px_chunk
    pix_p = jnp.concatenate([pix, jnp.zeros((pad,), jnp.int32)]) if pad else pix
    chunks = pix_p.reshape(-1, px_chunk)

    def render_chunk(chunk_pix):
        # one ray lane per (pixel, absolute sample); lane key = frame
        # key + pixel id + sample id, making every draw independent of
        # batch layout (exact progressive resume, exact sharding)
        lane_pix = jnp.repeat(chunk_pix, spp)               # [px_chunk*spp]
        lane_s = sample_offset + jnp.tile(
            jnp.arange(spp, dtype=jnp.int32), px_chunk)
        keys = fold_lanes(key, lane_pix)
        keys = jax.vmap(jax.random.fold_in)(keys, lane_s)
        px = lane_pix % w
        py = lane_pix // w
        u_cam = lane_uniform(fold_all(keys, _CAM_TAG), 2)
        o, d = raygen.camera_rays_u(
            u_cam, scene.cam_to_world, scene.cam_yfov, scene.cam_aspect,
            px, py, w, h)
        if use_mega:
            rad = trace_paths_mega(data, cfg, o, d, keys)
        else:
            rad = trace_paths(data, cfg, closest_hit, o, d, keys)
        return rad.reshape(px_chunk, spp, 3).sum(axis=1)

    body = jax.checkpoint(render_chunk) if cfg.remat_chunks else render_chunk
    out = lax.map(body, chunks)
    return out.reshape(-1, 3)[:n]


def render_frame(scene: FlatScene, cfg: RenderConfig, key, prebuilt_bvh=None):
    """Render one frame; returns the radiance SUM image [H, W, 3]."""
    state = prepare_state(scene, cfg, prebuilt_bvh=prebuilt_bvh)
    pix = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
    rad = render_pixel_ids(state, cfg, pix, key)
    return rad.reshape(cfg.height, cfg.width, 3)


class Renderer:
    """Reusable jitted pipeline for a fixed config.

    Scene arrays are traced arguments, so moving the camera or editing
    materials does NOT recompile -- only cfg changes do.
    """

    def __init__(self, cfg: RenderConfig):
        self.cfg = cfg
        self._fn = jax.jit(functools.partial(render_frame, cfg=cfg))
        self._bvh_cache = {}
        self._stack_checked = set()

    def _validate_stack(self, scene: FlatScene):
        """Loud stack guard for the binary traversal (round-2 verdict
        weak #5): a Karras LBVH can degenerate to depth ~F (collinear
        centroids build a comb), and a too-small fixed stack would
        silently drop subtrees. Measure the real tree's depth once per
        scene and refuse to render if cfg.stack_depth could overflow
        (binary traversal pushes both children per pop: max stack =
        depth + 1). The wide-BVH path self-validates at trace time via
        its host-measured WideBVH.max_stack."""
        cfg = self.cfg
        if cfg.intersector != "bvh" or id(scene) in self._stack_checked:
            return
        from tinypathtracer_tpu.ops.lbvh import tree_depth

        if cfg.bvh_source == "host":
            bvh = self._bvh_for(scene)
        else:
            bvh = jax.jit(lambda s: build_lbvh(
                TraceData.from_scene(s).tri_verts))(scene)
        depth = int(jax.jit(tree_depth)(bvh))
        if depth + 1 > cfg.stack_depth:
            raise ValueError(
                f"bvh stack_depth={cfg.stack_depth} can overflow: this "
                f"scene's LBVH has depth {depth} (needs {depth + 1} "
                f"slots). Raise RenderConfig.stack_depth.")
        self._stack_checked.add(id(scene))

    def _bvh_for(self, scene: FlatScene):
        cfg = self.cfg
        if not (cfg.intersector == "bvh" and cfg.bvh_source == "host"):
            return None
        cache_key = id(scene)
        bvh = self._bvh_cache.get(cache_key)
        if bvh is None:
            bvh = host_build_bvh(scene)
            self._bvh_cache = {cache_key: bvh}   # single-entry cache
        return bvh

    def render(self, scene: FlatScene, key):
        """Returns the mean-radiance image [H, W, 3], top-down rows."""
        self._validate_stack(scene)
        rad_sum = self._fn(scene, key=key, prebuilt_bvh=self._bvh_for(scene))
        return film.to_image(rad_sum, self.cfg.spp)

    def progressive(self, width=None, height=None):
        """A resumable accumulator bound to this pipeline
        (utils/checkpoint.ProgressiveRender)."""
        import functools as _ft

        from tinypathtracer_tpu.utils.checkpoint import ProgressiveRender

        cfg = self.cfg

        @_ft.lru_cache(maxsize=8)
        def chunk_fn(n_samples):
            def run(scene, key, sample_offset):
                state = prepare_state(scene, cfg)
                pix = jnp.arange(cfg.n_pixels, dtype=jnp.int32)
                rad = render_pixel_ids(state, cfg, pix, key, spp=n_samples,
                                       sample_offset=sample_offset)
                return rad.reshape(cfg.height, cfg.width, 3)

            return jax.jit(run, static_argnames=())

        def fn(scene, key, sample_offset, n_samples):
            return chunk_fn(n_samples)(scene, key, jnp.int32(sample_offset))

        return ProgressiveRender(fn, cfg.width, cfg.height)


def render(scene: Scene, cfg: RenderConfig, key,
           env_radiance: Optional[np.ndarray] = None):
    """One-shot convenience: flatten + jit + render mean image."""
    flat = scene.flatten(env_radiance=env_radiance)
    return Renderer(cfg).render(flat, key)
