"""Observability: timers, throughput counters, structured logs, profiler.

The reference's only observability is a per-frame `std::cout` and
wall-clock RNG seeding (SURVEY.md par. 5). Here:

  * `StageTimer` -- wall-clock per pipeline stage with device sync, so
    numbers mean what they say under async dispatch;
  * `RenderStats` -- rays/s, spp/s, per-stage breakdown, JSON/CSV
    emission (feeds BASELINE.md and bench.py);
  * `trace_profile` -- context manager around jax.profiler for
    Perfetto/TensorBoard traces of the compiled pipeline.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax


class StageTimer:
    """Wall-clock stage timing with block_until_ready at stage ends."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            self.stages[name] = self.stages.get(name, 0.0) \
                + (time.perf_counter() - t0)


@dataclass
class RenderStats:
    width: int
    height: int
    spp: int
    max_depth: int
    seconds: float = 0.0
    stages: Dict[str, float] = field(default_factory=dict)

    @property
    def primary_rays(self) -> int:
        return self.width * self.height * self.spp

    @property
    def rays_per_s(self) -> float:
        return self.primary_rays / self.seconds if self.seconds else 0.0

    @property
    def spp_per_s(self) -> float:
        return self.spp / self.seconds if self.seconds else 0.0

    def to_json(self) -> str:
        return json.dumps({
            "width": self.width, "height": self.height, "spp": self.spp,
            "max_depth": self.max_depth, "seconds": round(self.seconds, 4),
            "primary_rays": self.primary_rays,
            "rays_per_s": round(self.rays_per_s, 1),
            "spp_per_s": round(self.spp_per_s, 3),
            "stages": {k: round(v, 4) for k, v in self.stages.items()},
        })


@contextlib.contextmanager
def trace_profile(logdir: Optional[str]):
    """jax.profiler trace if a logdir is given, else a no-op."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_render(renderer, scene, key) -> "tuple":
    """(image, RenderStats) for one steady-state render call."""
    cfg = renderer.cfg
    t0 = time.perf_counter()
    img = renderer.render(scene, key)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0
    return img, RenderStats(width=cfg.width, height=cfg.height, spp=cfg.spp,
                            max_depth=cfg.max_depth, seconds=dt)
