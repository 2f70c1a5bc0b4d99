"""Pre-flight smoke for scripts/bench_scale.py (the model-scale sweep):
``--smoke`` must run end-to-end on one CPU device and emit valid JSON rows
with positive throughput, and the analytic FLOPs model must scale sanely
(it backs the published TFLOP/s numbers in docs/performance.md)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "bench_scale.py")


@pytest.mark.slow
def test_bench_scale_smoke_runs():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    # single-device like a real chip run — conftest's inherited 8-device
    # forcing would make the tiny smoke batch indivisible by the data axis
    env["XLA_FLAGS"] = ""
    r = subprocess.run([sys.executable, SCRIPT, "--smoke"], cwd=REPO,
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    rows = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith("{")]
    assert [row["dtype"] for row in rows] == ["float32", "bfloat16"]
    for row in rows:
        assert row["steps_per_sec"] > 0
        assert row["model_tflops_per_sec"] > 0
        assert row["params_m"] > 0


def test_analytic_flops_scaling():
    """The FLOPs model must scale linearly in batch and ~quadratically in
    d_model (matmul dominated; the vocab classifier term is linear in d,
    so the ratio sits below 4x) — catches unit mistakes that would make
    the published TFLOP/s numbers fantasy."""
    sys.path.insert(0, REPO)
    from scripts.bench_scale import analytic_flops_per_step, make_cfg

    f256 = analytic_flops_per_step(make_cfg(
        256, batch=32, scan_k=1, dtype="float32"), 32)
    f512 = analytic_flops_per_step(make_cfg(
        512, batch=32, scan_k=1, dtype="float32"), 32)
    f256_b64 = analytic_flops_per_step(make_cfg(
        256, batch=64, scan_k=1, dtype="float32"), 64)
    assert f256_b64 == 2 * f256                        # linear in batch
    assert 2.0 < f512 / f256 < 4.0
    # sanity magnitude: flagship fwd+bwd is tens of GFLOP/step at batch 32
    assert 1e10 < f256 < 1e12
