"""2-process CPU loopback test: the multi-host path without hardware.

SURVEY.md par. 4/par. 5 ask for exactly this: jax.distributed over
loopback so the DP sharding and gradient-psum paths run in CI without
a TPU pod. Two subprocesses x 4 virtual CPU devices = one 8-device
cluster; the radiance/grad psums compile onto the loopback "DCN".

Runs as subprocesses because jax.distributed can only initialize once
per process (the pytest process itself stays single-host).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(port, nprocs):
    """Spawn an nprocs-process loopback cluster over 8 global devices;
    return {rank: RESULT dict}."""
    env = dict(os.environ)
    # the workers must own their jax platform config; in particular the
    # axon site hook (PYTHONPATH) initializes a backend at import time,
    # which would beat jax.distributed.initialize to it
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(_WORKER))
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(port), str(rank), str(nprocs)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for rank in range(nprocs)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT:"):
                r = json.loads(line[len("RESULT:"):])
                results[r["rank"]] = r
    assert len(results) == nprocs, f"missing results: {outs}"
    return results


def test_two_process_loopback():
    port = _free_port()
    results = _run_cluster(port, 2)
    assert set(results) == {0, 1}

    for r in results.values():
        assert r["processes"] == 2
        assert r["devices"] == 8
        # psum of (0..3) + (10..13): 6 + 46 = 52
        assert r["psum_total"] == pytest.approx(52.0)
        assert np.isfinite(r["loss"]) and r["loss"] > 0
        assert r["gnorm"] > 0          # the optimizer actually moved

    # both hosts computed the SAME replicated loss and update
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["gnorm"] == pytest.approx(results[1]["gnorm"], rel=1e-6)


def test_scaling_efficiency_loopback():
    """Fixed-total-workload gradient step on the SAME 8-device global
    mesh owned by 1 vs 2 processes: the wall-clock ratio isolates the
    cross-process (loopback-DCN) overhead of the sharded fwd+bwd+psum
    path. This is the CPU stand-in for BASELINE.md's two-host >= 85%
    scaling target (no multi-host TPU exists in this environment); the
    measured number is recorded there with that caveat."""
    r1 = _run_cluster(_free_port(), 1)
    r2 = _run_cluster(_free_port(), 2)
    t1 = r1[0]["step_s"]
    t2 = max(r["step_s"] for r in r2.values())
    eff = t1 / t2
    t1b = r1[0]["step_big_s"]
    t2b = max(r["step_big_s"] for r in r2.values())
    eff_big = t1b / t2b
    ping = max(r["ping_s"] for r in r2.values())
    print(f"\nscaling efficiency proxy (1p -> 2p, fixed total): "
          f"small t1={t1*1e3:.1f} ms t2={t2*1e3:.1f} ms eff={eff:.2f}; "
          f"16x-workload t1={t1b*1e3:.1f} ms t2={t2b*1e3:.1f} ms "
          f"eff={eff_big:.2f}; bare-psum roundtrip {ping*1e3:.1f} ms")
    # loose bound: the 2-process step must not cost more than 2x the
    # single-process step (CPU loopback shares physical cores, so
    # tighter bounds would be flaky in CI)
    assert eff > 0.5, f"2-process overhead too high: {eff:.2f}"
    # the compute-bound workload must amortize the fixed cross-process
    # latency (the round-5 diagnosis: the small-step deficit is
    # per-step dispatch/barrier cost, not payload-proportional comm)
    assert eff_big > eff - 0.15, (
        f"16x workload did not amortize overhead: {eff_big:.2f} vs {eff:.2f}")
