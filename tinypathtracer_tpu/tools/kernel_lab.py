"""Micro-benchmarks for the intersection kernel: VPU roofline + variants.

Durable home for the kernel-tuning measurements (round-2's were lost in
root scratch). Prints JSON; numbers land in BASELINE.md.

Usage: python -m tinypathtracer_tpu.tools.kernel_lab
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def best_of(fn, *args, k=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def vpu_roofline(n_iter=512, tn=512, tl=512):
    """Peak sustained f32 FMA rate: chained a = a * b + c on one VMEM tile."""

    def kernel(b_ref, c_ref, o_ref):
        b = b_ref[:]
        c = c_ref[:]
        a = b
        for _ in range(n_iter):
            a = a * b + c
        o_ref[:] = a

    @jax.jit
    def run(b, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((tn, tl), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(b, c)

    b = jnp.full((tn, tl), 1.0000001, jnp.float32)
    c = jnp.full((tn, tl), 1e-7, jnp.float32)
    t = best_of(run, b, c)
    flops = 2 * n_iter * tn * tl
    return flops / t


def woop_pair_rate(n=1 << 20, f=2048, cull=True):
    """Measured (ray, tri) pair rate of the production dense kernel."""
    from tinypathtracer_tpu.ops.dense import closest_hit_dense, precompute_woop

    key = jax.random.PRNGKey(0)
    tv = jax.random.uniform(key, (f - 100, 3, 3), jnp.float32) * 100.0
    woop = jax.jit(precompute_woop)(tv)
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 100.0
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    hit = jax.jit(lambda o_, d_: closest_hit_dense(o_, d_, woop))
    t = best_of(hit, o, d)
    pairs = n * woop.n_padded
    return t, pairs / t


def main():
    res = {}
    res["vpu_f32_fma_per_s"] = vpu_roofline()
    t, rate = woop_pair_rate()
    res["dense_1M_2048_s"] = t
    res["dense_pairs_per_s"] = rate
    # ~21 FMA + ~16 cheap VPU ops per pair -> effective flops
    res["dense_eff_flops"] = rate * 58
    res["dense_pct_of_fma_roof"] = res["dense_eff_flops"] / res["vpu_f32_fma_per_s"]
    print(json.dumps(res, indent=2, default=float))


if __name__ == "__main__":
    main()
