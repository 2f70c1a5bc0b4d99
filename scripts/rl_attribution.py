#!/usr/bin/env python
"""Attribute the pipelined RL (SCST) step: where do the milliseconds go?

VERDICT r4 weak #2: the pipelined RL step's throughput (BENCH_r04: 10.46
steps/s at batch 32) had no attribution — nobody could say whether the
binding term is the device programs (sample / update), the host n-gram
reward scoring, or the tunnel transport (the per-step device->host fetch
of the sampled sequences + the host->device puts of the rewards).  This
script measures each term separately on the real chip and prints the
table docs/performance.md §"RL train step" carries:

  * device sample program  — pipelined k-dispatch of the phase-1 sampler;
  * device update program  — pipelined k-dispatch of the phase-2 update
    (compiled donate=False so the same state can be re-fed);
  * host reward scoring    — decode + CIDEr-D/BLEU (native C++) +
    self-CIDEr on prefetched numpy, pure host wall time;
  * seq fetch              — np.asarray of a READY [B,N,T-1] int32 device
    array (tunnel RTT + payload — the per-step device->host crossing);
  * rewards put            — device_put of the [B,N] reward arrays (the
    host->device crossing), timed to first use;
  * end-to-end             — serial (rl.pipeline_depth=0) vs pipelined
    (=1) steps/s through RLTrainer.train_step_device, the bench path.

Run:  python scripts/rl_attribution.py           (real chip, ~3 min)
      python scripts/rl_attribution.py --smoke   (tiny CPU pre-flight)
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 2
ITERS = 5
K = 8


def _sync(x):
    import jax
    leaf = jax.tree.leaves(x)[0]
    return np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def _pipelined_ms(fn, k=K, warmup=WARMUP, iters=ITERS):
    for _ in range(warmup):
        _sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        _sync(out)
        ts.append((time.perf_counter() - t0) / k * 1e3)
    return sorted(ts)[len(ts) // 2]


def _host_ms(fn, warmup=WARMUP, iters=ITERS):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes on CPU (harness pre-flight)")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    if args.smoke:
        # sitecustomize pins JAX_PLATFORMS=axon; env vars alone cannot
        # override — force through jax.config before first device touch
        jax.config.update("jax_platforms", "cpu")
    else:
        # the script compiles ~10 programs (two RLTrainer instances for
        # the serial-vs-pipelined end-to-end plus the standalone
        # sample/update probes); without the persistent cache that is
        # >10 min of remote compile on the tunneled chip
        from image_caption_tpu.main import _enable_compile_cache
        _enable_compile_cache()
    from image_caption_tpu.config import get_preset
    from image_caption_tpu.metrics.cider import (build_doc_frequency,
                                                 save_doc_frequency)
    from image_caption_tpu.train.loop import RLTrainer

    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj")
    if args.smoke:
        cfg = cfg.with_overrides(**{
            "model.num_vocab": 64, "model.max_length": 9,
            "model.num_objects": 4,
            "model.encode_input_size": 32, "model.encode_q_k_dim": 32,
            "model.encode_v_dim": 32, "model.encode_hidden_size": 32,
            "model.encode_num_heads": 4, "model.decode_input_size": 32,
            "model.decode_q_k_dim": 32, "model.decode_v_dim": 32,
            "model.decode_hidden_size": 32, "model.decode_num_heads": 4,
            "model.dim_word_embedding": 32})
        args.batch = 4
    else:
        cfg = cfg.with_overrides(**{"model.num_vocab": 12_000})
    batch = args.batch
    m = cfg.model

    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    vocab.update({f"w{i}": i for i in range(4, m.num_vocab)})
    rng_np = np.random.RandomState(1)
    groups = [[" ".join(f"w{t}" for t in row)
               for row in rng_np.randint(4, m.num_vocab, size=(5, 12))]
              for _ in range(64 if args.smoke else 1024)]
    df_dir = tempfile.mkdtemp(prefix="icx_attr_df_")
    save_doc_frequency(build_doc_frequency(groups),
                       os.path.join(df_dir, "coco-val-df.p"))
    cfg = cfg.with_overrides(**{"data.data_path": df_dir,
                                "train.batch_size": batch,
                                "rl.pipeline_depth": 1})

    trainer = RLTrainer(cfg, vocab, rng=jax.random.PRNGKey(0))
    assert trainer._two_phase or args.smoke, "expected two-phase on axon"
    if not trainer._two_phase:          # CPU smoke: force the 2p programs
        trainer = RLTrainer(cfg, vocab, rng=jax.random.PRNGKey(0),
                            two_phase=True)

    feats = np.random.RandomState(0).randn(
        batch, m.num_slots, m.dim_features).astype(np.float32)
    pos = np.random.RandomState(1).rand(
        batch, m.num_slots, m.dim_positions).astype(np.float32)
    caps = np.random.RandomState(2).randint(
        3, m.num_vocab, size=(batch, m.max_length)).astype(np.int32)
    caps[:, 0] = 1
    batch_dev = trainer.shard((feats, pos, caps))

    print(f"== RL step attribution (batch {batch}, flagship, "
          f"{jax.devices()[0].platform}) ==")

    # --- device sample program (phase 1) ---
    t_sample = _pipelined_ms(
        lambda: trainer._sample_step(trainer.state.params, batch_dev,
                                     trainer.step_rng, np.int32(0)))
    print(f"device sample program   : {t_sample:7.2f} ms")

    # --- device update program (phase 2; donate=False so state re-feeds) ---
    from image_caption_tpu.rl.step import compile_rl_train_step_two_phase
    upd = compile_rl_train_step_two_phase(cfg, trainer.mesh, trainer.state,
                                          donate=False)
    seq_dev = trainer._sample_step(trainer.state.params, batch_dev,
                                   trainer.step_rng, np.int32(0))
    seq_np = np.asarray(seq_dev)
    b, n, t = seq_np.shape
    rw = np.random.RandomState(3).rand(b, n).astype(np.float32)
    sc = np.zeros((b, n), np.float32)
    rw_dev, sc_dev = trainer.shard(rw), trainer.shard(sc)

    def _upd():
        _, mets = upd(trainer.state, batch_dev, seq_dev, rw_dev, sc_dev,
                      trainer.step_rng)
        return mets["loss"]

    t_update = _pipelined_ms(_upd)
    print(f"device update program   : {t_update:7.2f} ms")

    # --- host reward scoring (pure host, numpy already local) ---
    flat = seq_np.reshape(-1, t)
    target = np.repeat(caps[:, 1:], n, axis=0)
    t_structure = _host_ms(
        lambda: trainer.reward_computer.structure_scores(flat, target))
    t_selfcider = _host_ms(
        lambda: trainer.reward_computer.self_cider_scores(flat, group_size=n))
    native = trainer.reward_computer._native is not None
    print(f"host structure scores   : {t_structure:7.2f} ms "
          f"({'native C++' if native else 'python'})")
    print(f"host self-CIDEr scores  : {t_selfcider:7.2f} ms")

    # --- device->host fetch of a READY seq (the per-step crossing) ---
    _ = np.asarray(seq_dev)          # ensure computed
    t_fetch = _host_ms(lambda: np.asarray(
        trainer._sample_step(trainer.state.params, batch_dev,
                             trainer.step_rng, np.int32(0))))
    # that one includes the sample itself; isolate the fetch of a ready
    # array via copy_to_host_async-then-read vs direct read
    ready = trainer._sample_step(trainer.state.params, batch_dev,
                                 trainer.step_rng, np.int32(0))
    _sync(ready)
    t_fetch_ready = _host_ms(lambda: np.asarray(jax.device_put(ready)))
    print(f"sample+fetch (serial)   : {t_fetch:7.2f} ms")
    print(f"fetch of READY seq      : {t_fetch_ready:7.2f} ms "
          f"[{b}x{n}x{t} int32 = {seq_np.nbytes/1e3:.1f} kB]")

    # --- host->device puts of the reward arrays, timed to first use ---
    def _put():
        r = trainer.shard(rw)
        s = trainer.shard(sc)
        return _sync((r, s))
    t_put = _host_ms(_put)
    print(f"rewards device_put x2   : {t_put:7.2f} ms (synced)")

    # --- end-to-end: serial vs pipelined trainer paths ---
    def _steps_per_sec(depth):
        tr = RLTrainer(cfg.with_overrides(**{"rl.pipeline_depth": depth}),
                       vocab, rng=jax.random.PRNGKey(0),
                       two_phase=True)
        bd = tr.shard((feats, pos, caps))

        def run(k):
            mets = None
            for _ in range(k):
                mets = tr.train_step_device(bd)
            mets = tr.flush() or mets
            return float(mets["loss"])

        run(3)
        ts = []
        n_steps = 2 if args.smoke else 20
        for _ in range(3):
            t0 = time.perf_counter()
            run(n_steps)
            ts.append((time.perf_counter() - t0) / n_steps)
        return 1.0 / sorted(ts)[len(ts) // 2]

    sps_serial = _steps_per_sec(0)
    sps_pipe = _steps_per_sec(1)
    print(f"end-to-end serial       : {sps_serial:7.2f} steps/s "
          f"({1e3/sps_serial:.1f} ms)")
    print(f"end-to-end pipelined    : {sps_pipe:7.2f} steps/s "
          f"({1e3/sps_pipe:.1f} ms)")

    dev = t_sample + t_update
    host = t_structure + t_selfcider
    print(f"\ndevice bound (sample+update)      : {dev:6.2f} ms "
          f"-> {1e3/dev:.1f} steps/s")
    print(f"host scoring bound                : {host:6.2f} ms")
    print(f"pipelined overlap efficiency      : "
          f"{max(dev, host) / (1e3 / sps_pipe) * 100:5.1f}% "
          f"(per-step wall vs max(device, host) bound)")


if __name__ == "__main__":
    main()
