"""bench.py pre-flight: every driver metric line must emit, none may error.

The driver runs ``python bench.py`` on the real chip at the end of each
round and records the JSON lines in ``BENCH_r{N}.json``; a crash in any
bench function silently loses that metric for the round.  ``BENCH_SMOKE=1``
shrinks all eight metrics to toy shapes so the exact code the driver runs
(imports, input plumbing, jit signatures, JSON formatting) executes
end-to-end on CPU.
"""

import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bench.py")

EXPECTED_METRICS = [
    "feature_extraction_throughput",
    "feature_extraction_throughput_etl",
    "feature_extraction_throughput_roi",
    "feature_extraction_throughput_roi_fast",
    "xe_train_steps_per_sec",
    "rl_train_steps_per_sec",
    "caption_decode_throughput_greedy",
    "caption_decode_throughput_beam3",
]


@pytest.mark.slow
def test_bench_emits_all_metrics_without_errors():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    # single-device like the driver's real run — conftest's inherited
    # 8-device forcing would make the smoke batches indivisible by the
    # data axis
    env["XLA_FLAGS"] = ""
    env["BENCH_SMOKE"] = "1"
    r = subprocess.run([sys.executable, BENCH], capture_output=True,
                       text=True, timeout=2400, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    rows = [json.loads(ln) for ln in lines]
    metrics = [row["metric"] for row in rows]
    assert metrics == EXPECTED_METRICS, (metrics, r.stderr[-2000:])
    for row in rows:
        assert set(row) >= {"metric", "value", "unit", "vs_baseline"}, row
        assert row["value"] > 0, row
