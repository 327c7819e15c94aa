"""Micro-benchmarks for the intersection kernel: the round-3 kernel lab.

Durable home for the kernel-tuning measurements (round 2's were lost in
root scratch). Prints JSON; headline numbers land in BASELINE.md.

Measurement methodology (IMPORTANT on this backend): the axon remote
TPU backend's `jax.block_until_ready` can return before execution
finishes, so naive timings are garbage. Every measurement here (a) runs
the op ITERS times inside one jitted `lax.scan` with a per-iteration
input perturbation (defeats CSE/hoisting), (b) syncs by fetching a
scalar to the host, and (c) subtracts the measured RPC readback
overhead (~25-35 ms).

Round-3 findings this file reproduces (v5e, 1M rays x 2048 tris):
  * branch-free dense kernel:        ~34 ms  (~63 Gpairs/s)
  * round-2 gated/masked kernel:     ~87 ms  (~25 Gpairs/s)
  * per-cluster (128-tri) slab gates cost more than they save at EVERY
    ray coherence level (even sorted camera tiles: 43 ms vs 34 ms)
  * XLA stable-partition of masked rays: ~33 ms/call -- as much as the
    whole kernel; gathers run at ~150-650 M elem/s here
  * MXU offload of the Woop dot products (K=4 matmuls): ~67 Gpairs/s,
    a wash -- the kernel is VPU-issue-bound
  * bf16 arithmetic: Mosaic cannot lower bf16 vector compares (and
    packed 2/lane layout gates any win); not viable

Usage: python -m tinypathtracer_tpu.tools.kernel_lab
"""

from __future__ import annotations

import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 10


def timed(fn, *args, k=3):
    """Best-of-k of a scalar-returning jitted fn, synced by readback."""
    float(fn(*args))
    best = float("inf")
    for _ in range(k):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def _null(x):
    return x.sum()


def rpc_overhead(x):
    return timed(_null, x)


def dense_pair_rate(n=1 << 20, f=2048, coherent=False):
    """Scan-amortized (ray, tri) pair rate of the production kernel."""
    from tinypathtracer_tpu.ops.dense import closest_hit_dense, precompute_woop

    key = jax.random.PRNGKey(0)
    tv = jax.random.uniform(key, (f - 100, 3, 3), jnp.float32) * 100.0
    woop = jax.jit(precompute_woop)(tv)
    o = jax.random.uniform(jax.random.PRNGKey(1), (n, 3)) * 100.0
    d = jax.random.normal(jax.random.PRNGKey(2), (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    if coherent:
        # all rays near-parallel: best case for any spatial coherence
        d = d * 0.02 + jnp.array([0.57735, 0.57735, 0.57735])
        d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    @jax.jit
    def run(o_, d_):
        def body(c, i):
            oo = o_ + i.astype(jnp.float32) * 1e-9
            fid, t, _ = closest_hit_dense(oo, d_, woop)
            return c + t.sum() + fid.sum().astype(jnp.float32), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = rpc_overhead(o)
    t = (timed(run, o, d) - oh) / ITERS
    return t, n * woop.n_padded / t


def gather_rates(n=1 << 20):
    """Row-gather / scatter rates: the cost model for any binning idea."""
    perm = jax.random.permutation(jax.random.PRNGKey(0), n)
    x8 = jax.random.uniform(jax.random.PRNGKey(2), (n, 8))

    @jax.jit
    def g8(x, p):
        def body(c, i):
            return c + x[(p + i) % n].sum(), None
        c, _ = lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return c

    oh = rpc_overhead(x8)
    t = (timed(g8, x8, perm) - oh) / ITERS
    return t, 8 * n / t


def main():
    res = {}
    t, rate = dense_pair_rate()
    res["dense_1Mx2048_ms"] = t * 1e3
    res["dense_gpairs_per_s"] = rate / 1e9
    t, rate = dense_pair_rate(coherent=True)
    res["dense_coherent_1Mx2048_ms"] = t * 1e3
    res["dense_coherent_gpairs_per_s"] = rate / 1e9
    t, rate = gather_rates()
    res["row_gather_1Mx8_ms"] = t * 1e3
    res["row_gather_melem_per_s"] = rate / 1e6
    print(json.dumps(res, indent=2, default=float))


if __name__ == "__main__":
    main()
