"""Delta-light (point / directional / spot) evaluation.

Reference: delta_light.h. The CUDA version dispatches on a tagged union
per thread (delta_light.h:105-130); here all three light closed forms
are evaluated branch-free for every (lane, light) pair and selected by
kind mask -- lights are few, so the masked evaluation is cheaper than
any control flow on a vector machine.
"""

from __future__ import annotations

import jax.numpy as jnp

from tinypathtracer_tpu.utils.math3d import vdot

POINT, DIRECTIONAL, SPOT = 0, 1, 2


def sample_delta_light(pos, kind, color, intensity, lpos, ldir, cos_outer, inv_cone):
    """Evaluate one delta light for a batch of shading points.

    pos: [N, 3] shading points. Remaining args are that light's scalars/
    vec3s. Returns (wi [N, 3] unit direction toward the light,
    radiance [N, 3] with distance/cone attenuation applied,
    distance [N]).

    Matches delta_light.h sample() + CalcDistAttenuation (:25-33): the
    UE-style inverse-square with a radius-10 smooth window, applied to
    all kinds (directional has distance 0 => attenuation 1).
    """
    to_light = lpos[None, :] - pos                        # [N, 3] (point/spot)
    dist_ps = jnp.sqrt(jnp.maximum(vdot(to_light, to_light), 1e-20))
    wi_ps = to_light / dist_ps[..., None]

    is_dir = kind == DIRECTIONAL
    wi = jnp.where(is_dir, -ldir[None, :], wi_ps)
    dist = jnp.where(is_dir, 0.0, dist_ps)

    base = color[None, :] * intensity                     # [1->N, 3]

    # spot cone falloff (delta_light.h:80-84)
    cos_theta = vdot(-wi, ldir[None, :])
    cone = jnp.square(jnp.clip((cos_theta - cos_outer) * inv_cone, 0.0, 1.0))
    falloff = jnp.where(kind == SPOT, cone, 1.0)

    # distance window (delta_light.h:25-33): radius 10 baked in as 0.01
    d2 = dist * dist
    atten = (1.0 / (d2 + 1.0)) * jnp.square(jnp.clip(1.0 - jnp.square(d2 * 0.01),
                                                     0.0, 1.0))
    radiance = base * (falloff * atten)[..., None]
    return wi, radiance, dist
