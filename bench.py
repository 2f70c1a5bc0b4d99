"""Benchmark: beam-3 caption decode throughput on the flagship model.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}``.

Baseline: the reference publishes no numbers (BASELINE.md); the north-star
target is >= 500 captions/sec at beam=3 on a v5e-8, i.e. 62.5 captions/sec
per chip.  ``vs_baseline`` is measured throughput / per-chip target, so
1.0 == on-target, higher is better.

The decode is the production path: KV-cached ``lax.scan`` beam search over
the flagship config (d=256, enc2/dec5, 32 heads, 12k vocab, 37 object
slots) — versus the reference's per-step full-prefix re-decode
(/root/reference/core/TRANSFORMER/model.py:135-200).
"""

from __future__ import annotations

import json
import time

import numpy as np

PER_CHIP_TARGET = 500.0 / 8.0   # north-star v5e-8 target, per chip
BATCH = 128
BEAM = 3
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    from image_caption_tpu.config import get_preset
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.models.decoding import beam_search

    cfg = get_preset(
        "RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj"
    ).with_overrides(**{"model.num_vocab": 12000})
    m = cfg.model

    params = init_captioner(jax.random.PRNGKey(0), m)
    rng = np.random.RandomState(0)
    feats = rng.randn(BATCH, m.num_slots, m.dim_features).astype(np.float32)
    pos = rng.rand(BATCH, m.num_slots, m.dim_positions).astype(np.float32)
    feats = jax.device_put(feats)
    pos = jax.device_put(pos)

    def run():
        # np.asarray forces a device->host fetch: block_until_ready alone
        # is unreliable over the axon-tunneled backend
        return np.asarray(beam_search(params, m, feats, pos, beam_size=BEAM,
                                      score_mode="prob", use_pallas=True))

    for _ in range(WARMUP):
        run()

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]   # median: the tunnel adds jitter

    captions_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "caption_decode_throughput_beam3",
        "value": round(captions_per_sec, 2),
        "unit": "captions/sec/chip",
        "vs_baseline": round(captions_per_sec / PER_CHIP_TARGET, 3),
    }))


if __name__ == "__main__":
    main()
