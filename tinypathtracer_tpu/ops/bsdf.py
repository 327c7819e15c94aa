"""BSDF sampling: lambertian / mirror / dielectric lobes.

Reimplements the shading model of reference path_tracer.cu:137-225
(`getNewDirection` + `refract` + `shlickFresnel`) as branch-free batched
array code: on a lockstep vector machine every lane computes all three
lobes and selects with `where`, instead of the warp-divergent if/else
chain of the CUDA megakernel.

Lobe selection (reference semantics, in priority order):
    eta > 0       -> dielectric: Fresnel coin-flip between mirror
                     reflection and refraction, throughput weight 1
                     (the estimator's pdf cancels the lobe probability
                     by construction: p = 1, attenFactor = 1)
    metallic > 0  -> perfect mirror, weight 1
    otherwise     -> cosine-hemisphere diffuse around the side-corrected
                     normal; attenFactor = cos/pi, pdf = cos/pi (the
                     ratio is analytically 1, kept explicit for clarity)

In every case the path throughput gains a baseColor factor
(path_tracer.cu:379: attenuation = baseColor * attenFactor, divided by
pStack in the accumulation loop at :427).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tinypathtracer_tpu.ops import sampling
from tinypathtracer_tpu.utils.math3d import reflect, vdot


def refract_reference(d, n, ior):
    """Reference `refract` (path_tracer.cu:143-163), batched.

    d: incoming ray direction [N, 3]; n: geometric-side normal [N, 3];
    ior: per-lane index of refraction [N].
    Returns (refracted [N, 3], cos_theta_i [N], eta [N], tir [N]).
    """
    cos_i = vdot(d, n)                             # [N]
    exiting = cos_i > 0.0
    # guard ior <= 0 (non-dielectric lanes evaluated under a mask): any
    # inf/NaN in an unselected branch still poisons reverse-mode via
    # 0 * inf, so keep every lane finite.
    ior_safe = jnp.where(ior > 0.0, ior, 1.0)
    eta = jnp.where(exiting, ior_safe, 1.0 / ior_safe)
    n_s = jnp.where(exiting[..., None], -n, n)
    cos_i_abs = jnp.abs(cos_i)
    sin2_t = eta * eta * (1.0 - cos_i_abs * cos_i_abs)
    tir = sin2_t >= 1.0
    # sqrt'(0) = inf: clamp the argument away from 0 on TIR lanes where
    # the result is discarded anyway.
    cos_t = jnp.sqrt(jnp.maximum(1.0 - jnp.where(tir, 0.0, sin2_t), 0.0))
    refracted = eta[..., None] * d + (cos_i_abs * eta - cos_t)[..., None] * n_s
    refracted = jnp.where(tir[..., None], 0.0, refracted)
    return refracted, cos_i_abs, eta, tir


def schlick_fresnel(cos_i, eta):
    """Schlick approximation (path_tracer.cu:165-173)."""
    f0 = (1.0 - eta) / (1.0 + eta)
    f0 = f0 * f0
    m = jnp.clip(1.0 - cos_i, 0.0, 1.0)
    m2 = m * m
    return f0 + (1.0 - f0) * m2 * m2 * m


def sample_bsdf_u(u_hemi1, u_hemi2, u_coin, d, n, eta, metallic, base_color):
    """Sample the next direction for a batch of surface interactions
    from raw per-lane uniforms.

    u_hemi1/u_hemi2/u_coin: [N] U[0,1) columns (diffuse hemisphere +
    Fresnel coin flip). d: incoming ray direction [N, 3] (unit). n:
    interpolated shading normal [N, 3] (unit). eta/metallic: per-lane
    material params [N]. base_color: [N, 3].

    Returns (next_dir [N, 3], weight [N, 3], is_specular [N]) where
    `weight` is baseColor * attenFactor / pdf -- the full throughput
    multiplier for this bounce, and is_specular marks lanes that took a
    delta lobe (eta > 0 or metallic > 0), used by the estimator to gate
    the extra direct-emitter sample (path_tracer.cu:387).
    """
    # --- dielectric lobe ---
    refr, cos_i, eta_ratio, tir = refract_reference(d, n, eta)
    refl = reflect(d, n)
    fr = jnp.where(tir, 1.0, schlick_fresnel(cos_i, eta_ratio))
    take_refl = sampling.coin_flip_u(u_coin, fr)
    d_dielec = jnp.where(take_refl[..., None], refl, refr)

    # --- diffuse lobe (side-corrected normal, path_tracer.cu:218-222) ---
    sign = jnp.where(vdot(d, n) > 0.0, -1.0, 1.0)
    n_d = n * sign[..., None]
    d_diff, pdf = sampling.hemisphere_cosine_u(u_hemi1, u_hemi2, n_d)
    cos_o = vdot(d_diff, n_d)
    atten = jnp.abs(cos_o) / sampling.PI
    # pdf == cos/pi > 0 by construction of the cosine sample
    diff_ratio = atten / jnp.maximum(pdf, 1e-12)

    is_dielec = eta > 0.0
    is_mirror = jnp.logical_and(~is_dielec, metallic > 0.0)
    is_specular = is_dielec | is_mirror

    next_dir = jnp.where(
        is_dielec[..., None], d_dielec,
        jnp.where(is_mirror[..., None], refl, d_diff))
    ratio = jnp.where(is_specular, 1.0, diff_ratio)
    weight = base_color * ratio[..., None]
    return next_dir, weight, is_specular


def sample_bsdf(key, d, n, eta, metallic, base_color):
    """Key-based wrapper over sample_bsdf_u (tests / standalone use)."""
    k_diff, k_flip = jax.random.split(key)
    u1, u2 = sampling.uniform2(k_diff, d.shape[:-1])
    u_coin = jax.random.uniform(k_flip, d.shape[:-1], dtype=jnp.float32)
    return sample_bsdf_u(u1, u2, u_coin, d, n, eta, metallic, base_color)
