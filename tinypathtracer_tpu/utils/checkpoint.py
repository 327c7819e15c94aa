"""Checkpoint / resume.

The reference has none (radiance is zeroed every frame,
path_tracer.cu:534; SURVEY.md par. 5). Two checkpointable states here:

  * progressive rendering: (radiance_sum, sample_count, next sample
    index) -- resuming continues the SAME deterministic sample sequence
    because samples are indexed, not drawn from mutable RNG state;
  * inverse rendering: (Params, optimizer state, step).

Plain .npz via pytree flatten -- no orbax dependency needed at this
scale, but the format records the treedef so arbitrary Params/opt-state
pytrees round-trip.
"""

from __future__ import annotations

import json
from typing import Any, Tuple

import numpy as np
import jax


def save_pytree(path: str, tree: Any, meta: dict | None = None) -> None:
    """Save any pytree of arrays to an .npz (with structure + metadata)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    payload["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez(path, **payload)


def load_pytree(path: str, like: Any) -> Tuple[Any, dict]:
    """Load a pytree saved by save_pytree, using `like` for structure.

    Returns (tree, meta). The saved treedef string is checked against
    `like`'s to catch layout drift.
    """
    data = np.load(path)
    _, treedef = jax.tree_util.tree_flatten(like)
    saved_def = bytes(data["__treedef__"]).decode()
    if saved_def != str(treedef):
        raise ValueError(
            f"checkpoint treedef mismatch:\n saved: {saved_def}\n"
            f" expected: {treedef}")
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    meta = json.loads(bytes(data["__meta__"]).decode())
    return jax.tree_util.tree_unflatten(treedef, leaves), meta


class ProgressiveRender:
    """Resumable progressive accumulator over sample indices.

    Renders spp in chunks; each chunk re-derives its keys from (base
    key, absolute sample index), so save/kill/resume yields the exact
    image an uninterrupted run would produce.
    """

    def __init__(self, renderer_fn, width: int, height: int):
        # renderer_fn(scene, key, sample_offset, n_samples) -> [H, W, 3] sum
        self._fn = renderer_fn
        self.radiance_sum = np.zeros((height, width, 3), np.float32)
        self.samples_done = 0

    def step(self, scene, key, n_samples: int):
        chunk = self._fn(scene, key, self.samples_done, n_samples)
        self.radiance_sum = self.radiance_sum + np.asarray(chunk)
        self.samples_done += n_samples
        return self.image()

    def image(self):
        return self.radiance_sum / max(self.samples_done, 1)

    def save(self, path: str) -> None:
        np.savez(path, radiance_sum=self.radiance_sum,
                 samples_done=np.int64(self.samples_done))

    def load(self, path: str) -> None:
        data = np.load(path)
        self.radiance_sum = data["radiance_sum"]
        self.samples_done = int(data["samples_done"])
