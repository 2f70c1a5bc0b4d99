"""Pre-flight for scripts/bench_serve.py (the recording-day serving
harness): ``--tiny`` must execute all four (feature_mode, decode) combos
end-to-end on CPU so the script is known-good the moment a real chip is
available for the actual measurement.
"""

import os
import re
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts", "bench_serve.py")


@pytest.mark.slow
def test_bench_serve_tiny_runs_all_combos():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never dial the TPU tunnel
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, SCRIPT, "--tiny", "--n", "6", "--batch", "3",
         "--beam", "2", "--latency"],
        capture_output=True, text=True, timeout=2400, env=env)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    lines = re.findall(r"\[bench_serve\] (\S+)\s+([\d.]+) img/s", r.stdout)
    assert [label for label, _ in lines] == [
        "crop+greedy", "crop+beam2", "roi+greedy", "roi+beam2"], r.stdout
    assert all(float(v) > 0 for _, v in lines)
    lat = re.findall(r"latency p50\s+([\d.]+) ms\s+p90\s+([\d.]+) ms",
                     r.stdout)
    assert len(lat) == 4 and all(float(p50) <= float(p90) + 1e-9
                                 for p50, p90 in lat), r.stdout
