"""Benchmarks: one JSON line per metric, the headline (beam-3 decode) LAST.

Metrics (all single-chip):
  * feature_extraction_throughput — full YOLOv5x + ResNet-101 crop
    pipeline (vision/pipeline.py), batch 128, bf16, cap_half (19 crops/
    image); vs the 5k img/s v5e-8 north star => 625 img/s/chip target.
  * feature_extraction_throughput_etl — same pipeline in the offline-ETL
    configuration (max_obj=5: 6 crops/image, what features.py runs).
  * feature_extraction_throughput_roi / _roi_fast — the opt-in
    shared-trunk fast mode (feature_mode='roi') at its documented
    default (trunk 448 / detect 320 since r5, read from DataConfig)
    and fastest measured (320/320) quality points.
  * xe_train_steps_per_sec — flagship XE train step, batch 32 (the
    reference's solver shape, core/config.py:59-62), measured through
    the train loop's scanned multi-step dispatch (train.scan_steps=32,
    the measured dispatch-overhead asymptote — docs/performance.md);
    regression floor 5 steps/s (≈ measured r1 perf / 2 — a genuine
    slowdown trips it).
  * rl_train_steps_per_sec — flagship SCST step, batch 32 (two-phase on
    axon: device sample -> host CIDEr-D/BLEU rewards -> device update);
    floor 1 step/s.
  * caption_decode_throughput_greedy — KV-cached greedy scan, batch 768
    (the measured single-chip peak); floor = the beam north-star per-chip
    share (greedy must never be slower than the beam target).
  * caption_decode_throughput_beam3 (HEADLINE, printed last) — beam-3
    KV-cached ancestry beam, batch 160 (the measured peak); north star
    >= 500 captions/s on a v5e-8 => 62.5/chip, vs_baseline = measured/62.5.

The reference publishes no numbers (BASELINE.md); vs_baseline > 1 means
above target/floor.  Timings force a tiny host fetch (block_until_ready is
unreliable over the axon tunnel) and take the median of ITERS runs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# BENCH_SMOKE=1 shrinks every metric to toy shapes (tiny batches, small
# canvases, 1 timing iter) so the whole file executes end-to-end on a CPU
# in minutes — a pre-flight check that no bench line will crash when the
# driver runs the real thing on the chip.  Timings in smoke mode are
# meaningless; the driver never sets it.
SMOKE = os.environ.get("BENCH_SMOKE", "0") not in ("", "0")

BEAM_PER_CHIP_TARGET = 500.0 / 8.0   # north-star v5e-8 target, per chip
EXTRACT_PER_CHIP_TARGET = 5000.0 / 8.0
XE_STEPS_FLOOR = 5.0                 # steps/s regression floor (batch 32)
RL_STEPS_FLOOR = 1.0                 # SCST steps/s floor (batch 32; the
                                     # host reward scoring bounds it)
WARMUP = 3
ITERS = 10


def _sync_scalar(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    if isinstance(leaf, (int, float)):      # already host-side
        return leaf
    return np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _median_time(fn, warmup=WARMUP, iters=ITERS):
    if SMOKE:
        warmup, iters = min(warmup, 1), 1
    for _ in range(warmup):
        _sync_scalar(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync_scalar(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def _flagship(num_vocab=12_000):
    from image_caption_tpu.config import get_preset
    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj")
    if SMOKE:
        # same plumbing/graph structure, toy dims — the smoke validates
        # imports/signatures/JSON, not throughput
        return cfg.with_overrides(**{
            "model.num_vocab": 512, "model.max_length": 13,
            "model.encode_input_size": 32, "model.encode_q_k_dim": 32,
            "model.encode_v_dim": 32, "model.encode_hidden_size": 32,
            "model.encode_num_heads": 4,
            "model.decode_input_size": 32, "model.decode_q_k_dim": 32,
            "model.decode_v_dim": 32, "model.decode_hidden_size": 32,
            "model.decode_num_heads": 4,
            "model.dim_word_embedding": 32})
    return cfg.with_overrides(**{"model.num_vocab": num_vocab})


def _fake_caption_batch(m, batch, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(batch, m.num_slots, m.dim_features).astype(np.float32)
    pos = rng.rand(batch, m.num_slots, m.dim_positions).astype(np.float32)
    caps = rng.randint(3, m.num_vocab, size=(batch, m.max_length)
                       ).astype(np.int32)
    caps[:, 0] = 1
    return feats, pos, caps


_EXTRACT_STATE: dict = {}


def _extract_inputs(batch):
    import jax.numpy as jnp
    from image_caption_tpu.vision.pipeline import init_extractor
    size = 128 if SMOKE else 640
    if "params" not in _EXTRACT_STATE:
        _EXTRACT_STATE["params"] = init_extractor()
    if _EXTRACT_STATE.get("batch") != batch:    # cache keyed by batch
        rng = np.random.RandomState(0)
        _EXTRACT_STATE.update(
            batch=batch,
            canvases=jnp.asarray(
                rng.rand(batch, size, size, 3).astype(np.float32) * 255.0),
            metas=jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (batch, 1)),
            sizes=jnp.tile(jnp.asarray([[float(size), float(size)]]),
                           (batch, 1)))
    s = _EXTRACT_STATE
    return s["params"], s["canvases"], s["metas"], s["sizes"]


def _pipelined_time(fn, k=8, warmup=2, iters=5):
    """Steady-state per-call time: dispatch ``k`` calls back-to-back and
    sync ONCE.  This is how production drives both extraction and decode
    — the ETL's streaming loop (vision/etl.py: stream_extracted_batches)
    and the split decoders (train/loop.py:decode_split, serve.py) enqueue
    the next batch while the previous one computes, so at steady state a
    batch costs its device time, not device time + a full dispatch
    round-trip.  Single-dispatch timing instead adds the host<->device
    RTT (~30 ms over the axon tunnel — docs/performance.md Methodology)
    to EVERY batch: at the roi mode's ~178 ms device program that is a
    ~15% artifact of the measurement transport, not of the program.

    Residual bias, by construction: each timed iteration starts with a
    drained queue, so the FIRST of the k dispatches still pays the full
    RTT — a ~RTT/k (~4 ms at k=8) overcharge per call, i.e. reported
    steady-state rates are slightly PESSIMISTIC.  The measurement also
    assumes host dispatch keeps ahead of device compute; on this 1-vCPU
    box a heavy host-side dispatch path would serialize and undercount —
    cross-check against the rep-delta harness
    (scripts/bench_components_delta.py) when a number looks off."""
    if SMOKE:
        k, warmup, iters = 1, 1, 1
    for _ in range(warmup):
        _sync_scalar(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()              # async dispatch; device queue orders
        _sync_scalar(out)           # one sync drains the whole queue
        ts.append((time.perf_counter() - t0) / k)
    return sorted(ts)[len(ts) // 2]


def _bench_extraction_config(metric, batch, extract_fn=None, **kwargs):
    from image_caption_tpu.vision.pipeline import extract_features_batch
    fn = extract_fn or extract_features_batch
    if SMOKE:
        batch = 2
        if extract_fn is None:              # per-crop mode: tiny crops
            kwargs.setdefault("crop_size", 64)
    params, canvases, metas, sizes = _extract_inputs(batch)
    dt = _pipelined_time(
        lambda: fn(params, canvases, metas, sizes, **kwargs))
    v = batch / dt
    return {"metric": metric,
            "value": round(v, 2), "unit": "images/sec/chip",
            "vs_baseline": round(v / EXTRACT_PER_CHIP_TARGET, 3)}


def bench_extraction(batch=128):
    return _bench_extraction_config("feature_extraction_throughput", batch)


def bench_extraction_etl(batch=128):
    """The offline ETL configuration (max_obj=5 — what features.py runs
    over the whole dataset, core/dataset.py:63-64): 6 crops/image instead
    of 19."""
    return _bench_extraction_config("feature_extraction_throughput_etl",
                                    batch, max_obj=5)


def _bench_roi_config(metric, batch, **kwargs):
    from image_caption_tpu.vision.pipeline import extract_features_roi
    if SMOKE:
        kwargs.update(trunk_size=128, detect_size=128)
    return _bench_extraction_config(metric, batch,
                                    extract_fn=extract_features_roi,
                                    **kwargs)


def bench_extraction_roi(batch=128):
    """Opt-in shared-trunk fast mode (feature_mode='roi') at the
    DOCUMENTED DEFAULT quality point (config.py DataConfig): ResNet-101
    trunk at 448 + ROI-aligned slot features, YOLO detection at 320
    (the r5 default — the 448 detector was ~54% of the pipeline for a
    box-set change the trunk never sees; docs/performance.md r5 fidelity
    table + parity.md).  The sizes are read from DataConfig so this
    metric can never drift from what `--set data.feature_mode=roi`
    actually runs."""
    from image_caption_tpu.config import DataConfig
    d = DataConfig()
    return _bench_roi_config("feature_extraction_throughput_roi", batch,
                             max_obj=5, trunk_size=d.roi_trunk_size,
                             detect_size=d.roi_detect_size)


def bench_extraction_roi_fast(batch=384):
    """The roi recipe at its measured fastest quality point
    (trunk 320 / detect 320, docs/performance.md roi table) — the config
    that clears the 625 img/s/chip north-star share on one chip.  Batch
    384 per the r3 sweep (1019/1158/1227/1290 img/s at 128/256/384/512 —
    still rising at 512 but flattening; 384 keeps the bench input under
    2 GB)."""
    return _bench_roi_config("feature_extraction_throughput_roi_fast",
                             batch, max_obj=5, trunk_size=320,
                             detect_size=320)


def bench_xe_step(batch=32, scan_k=32):
    """The train loop's scanned dispatch (train.scan_steps): K updates
    per program — per-step dispatch overhead (a full ~30 ms RTT on this
    tunnel, ~ms on a real host) amortizes over K, so this measures the
    device step, not the transport.  Batches are pre-placed on device
    like the real loop's prefetch; r2's single-dispatch form measured
    ~25 steps/s on the same chip (all RTT — device time is ~10 ms)."""
    import jax
    from image_caption_tpu.train.loop import Trainer
    if SMOKE:
        batch, scan_k = 4, 2
    cfg = _flagship().with_overrides(**{"train.batch_size": batch,
                                        "train.scan_steps": scan_k})
    trainer = Trainer(cfg, rng=jax.random.PRNGKey(0))
    stacked = trainer.shard_stacked(
        [_fake_caption_batch(cfg.model, batch, seed=s)
         for s in range(scan_k)])

    def step():
        return trainer.train_steps_device(stacked)["loss"]

    dt = _median_time(step, warmup=3, iters=8)
    v = scan_k / dt
    return {"metric": "xe_train_steps_per_sec",
            "value": round(v, 2),
            "unit": f"steps/sec (batch {batch}, {scan_k}-step scan)",
            "vs_baseline": round(v / XE_STEPS_FLOOR, 3)}


def bench_rl_step(batch=32):
    """SCST train step (the reference's most expensive mode,
    core/models.py:184-195: forward + sample + per-batch string rewards +
    update), measured in the PRODUCTION configuration:

      * frozen CIDEr df (loss.py:112-116, df='coco-val') — synthesized
        over synthetic reference captions and written next to the bench
        data so the scorer runs the frozen-df mode users train with, not
        the per-batch corpus fallback;
      * the FUSED pipelined two-phase schedule (rl.pipeline_depth=1, the
        preset default; pinned explicitly here so the measured mode can't
        drift with the config): one device dispatch per step applies the
        pending update and samples the next batch from the post-update
        params — trajectory-identical to the reference's serial schedule
        (tests/test_rl_two_phase.py) while host n-gram scoring, device
        programs, and the sample transfer overlap across steps.
        Throughput is steady-state over a run of steps.  The unit string
        names the measured mode."""
    import tempfile

    import jax
    from image_caption_tpu.metrics.cider import (build_doc_frequency,
                                                 save_doc_frequency)
    from image_caption_tpu.train.loop import RLTrainer
    if SMOKE:
        batch = 4
    cfg = _flagship().with_overrides(**{"train.batch_size": batch,
                                        "rl.pipeline_depth": 1})
    m = cfg.model
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    vocab.update({f"w{i}": i for i in range(4, m.num_vocab)})

    # frozen df over synthetic per-image caption groups (same vocab the
    # sampled sequences decode into, so df lookups hit real entries)
    rng_np = np.random.RandomState(1)
    groups = [[" ".join(f"w{t}" for t in row)
               for row in rng_np.randint(4, m.num_vocab, size=(5, 12))]
              for _ in range(64 if SMOKE else 1024)]
    df_dir = tempfile.mkdtemp(prefix="icx_bench_df_")
    save_doc_frequency(build_doc_frequency(groups),
                       os.path.join(df_dir, "coco-val-df.p"))
    cfg = cfg.with_overrides(**{"data.data_path": df_dir})

    trainer = RLTrainer(cfg, vocab, rng=jax.random.PRNGKey(0))
    assert trainer.reward_computer.uses_frozen_df, \
        "bench df was not picked up — the measured reward mode is wrong"
    batch_dev = trainer.shard(_fake_caption_batch(m, batch))

    def run(n):
        mets = None
        for _ in range(n):
            mets = trainer.train_step_device(batch_dev)
        # drain the pipelined tail (no-op + last metrics in callback mode)
        mets = trainer.flush() or mets
        return float(mets["loss"])               # sync

    run(1 if SMOKE else 3)                       # compile sample + update
    n = 2 if SMOKE else 20
    ts = []
    for _ in range(1 if SMOKE else 3):
        t0 = time.perf_counter()
        run(n)
        ts.append((time.perf_counter() - t0) / n)
    dt = sorted(ts)[len(ts) // 2]
    v = 1.0 / dt
    mode = "fused-pipelined" if trainer._pipeline else "serial"
    return {"metric": "rl_train_steps_per_sec",
            "value": round(v, 2),
            "unit": f"steps/sec (batch {batch}, frozen df, {mode})",
            "vs_baseline": round(v / RL_STEPS_FLOOR, 3)}


def bench_greedy(batch=768):
    """Batch 768 = the measured single-chip throughput peak (r3 sweep:
    3.5k captions/s at 128, 6.0k at 512, 6.3k at 768, 5.7k at 1024 —
    docs/performance.md)."""
    import jax
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.models.decoding import greedy_decode
    if SMOKE:
        batch = 4
    cfg = _flagship()
    m = cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    feats, pos, _ = _fake_caption_batch(m, batch)
    feats, pos = jax.device_put(feats), jax.device_put(pos)

    dt = _pipelined_time(lambda: greedy_decode(params, m, feats, pos,
                                               use_pallas=True)[0])
    v = batch / dt
    return {"metric": "caption_decode_throughput_greedy",
            "value": round(v, 2), "unit": "captions/sec/chip",
            "vs_baseline": round(v / BEAM_PER_CHIP_TARGET, 3)}


def bench_beam(batch=160, beam=3):
    """Batch 160 = the measured beam-3 throughput peak (r3 sweep: 820
    captions/s at 128, 960 at 160, 904 at 192, 800 at 224 —
    docs/performance.md)."""
    import jax
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.models.decoding import beam_score_mode, beam_search
    if SMOKE:
        batch = 4
    cfg = _flagship()
    m = cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    feats, pos, _ = _fake_caption_batch(m, batch)
    feats, pos = jax.device_put(feats), jax.device_put(pos)

    # the flagship preset is the RL model, whose reference beam scores in
    # log-probs (model_RL.py:157,182); perf is mode-independent
    dt = _pipelined_time(lambda: beam_search(params, m, feats, pos,
                                             beam_size=beam,
                                             score_mode=beam_score_mode(
                                                 cfg.caption_model),
                                             use_pallas=True))
    v = batch / dt
    return {"metric": "caption_decode_throughput_beam3",
            "value": round(v, 2), "unit": "captions/sec/chip",
            "vs_baseline": round(v / BEAM_PER_CHIP_TARGET, 3)}


def main(markdown: bool = False) -> None:
    """One JSON line per metric (the driver contract).  ``--md``
    additionally prints a ready-to-paste markdown table at the end —
    docs/performance.md and README headline tables are updated by pasting
    it, so the three documents can never drift apart again (VERDICT r4
    weak #5: three generations of numbers were live at once)."""
    rows = []
    for fn in (bench_extraction, bench_extraction_etl,
               bench_extraction_roi, bench_extraction_roi_fast,
               bench_xe_step, bench_rl_step, bench_greedy, bench_beam):
        try:
            result = fn()
        except Exception as exc:   # a broken secondary metric must not
            # hide the headline line from the driver
            result = {"metric": f"error:{fn.__name__}",
                      "value": 0.0, "unit": "error", "vs_baseline": 0.0,
                      "detail": str(exc)[:200]}
        print(json.dumps(result), flush=True)
        rows.append(result)
    if markdown:
        print("\n| metric | value | unit | vs target/floor |")
        print("|---|---|---|---|")
        for r in rows:
            print(f"| {r['metric']} | {r['value']} | {r['unit']} "
                  f"| {r['vs_baseline']} |")


if __name__ == "__main__":
    import sys
    main(markdown="--md" in sys.argv)
