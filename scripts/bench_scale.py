"""Model-scale sweep: XE train-step throughput + achieved FLOP/s as the
captioner grows past the reference's toy size.

The flagship model (d=256, enc2/dec5, 37 object slots / 51 caption tokens
— ``/root/reference/core/config.py:87-102``) is so small that its train
step is dispatch/latency-bound (~11 ms device time, docs/performance.md
"Train step") and says nothing about how the framework behaves when the
MXU is the constraint.  This sweep widens d_model/FFN (the production
lever for quality experiments) and reports, per size and compute dtype:

    steps/s  (scan-K dispatch, batch 32 — the same measurement bench.py's
              ``xe_train_steps_per_sec`` uses)
    model TFLOP/s achieved  (analytic matmul FLOPs fwd+bwd / step time)

Run on the TPU:   python scripts/bench_scale.py [--quick]
CPU smoke (CI):   JAX_PLATFORMS=cpu python scripts/bench_scale.py --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cfg(d: int, *, batch: int, scan_k: int, dtype: str,
             num_vocab: int = 12_000, max_length: int | None = None):
    """Flagship preset widened to d_model=d (FFN=d, q/k/v dims=d), heads
    scaled to keep head_dim=64 at large d (32 heads of dim 8 is a
    reference quirk that would waste the MXU at d>=1024)."""
    from image_caption_tpu.config import get_preset
    heads = max(4, d // 64)
    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj")
    extra = {}
    if max_length is not None:
        extra["model.max_length"] = max_length
    return cfg.with_overrides(**extra, **{
        "model.num_vocab": num_vocab,
        "model.encode_input_size": d, "model.encode_q_k_dim": d,
        "model.encode_v_dim": d, "model.encode_hidden_size": d,
        "model.encode_num_heads": heads,
        "model.decode_input_size": d, "model.decode_q_k_dim": d,
        "model.decode_v_dim": d, "model.decode_hidden_size": d,
        "model.decode_num_heads": heads,
        "model.dim_word_embedding": d,
        "model.compute_dtype": dtype,
        "train.batch_size": batch, "train.scan_steps": scan_k,
    })


def analytic_flops_per_step(cfg, batch: int) -> float:
    """Matmul FLOPs for one fwd+bwd step (factor 3x fwd): per-token 2*in*out
    for every projection, plus the two T^2 attention contractions.
    Elementwise/layernorm work is ignored (vanishing share at d>=512)."""
    m = cfg.model
    S, T = m.num_slots, m.max_length - 1   # decoder runs max_length-1
    d_e, d_d = m.encode_input_size, m.decode_input_size

    def mha(tokens_q, tokens_kv, d, qk, v, heads):
        proj = 2 * (tokens_q * d * qk + tokens_kv * d * qk
                    + tokens_kv * d * v + tokens_q * v * d)
        attn = 2 * heads * tokens_q * tokens_kv * (
            qk // heads + v // heads)
        return proj + attn

    def ffn(tokens, d, hidden):
        return 2 * tokens * d * hidden * 2

    enc = m.encode_num_blocks * (
        mha(S, S, d_e, m.encode_q_k_dim, m.encode_v_dim,
            m.encode_num_heads) + ffn(S, d_e, m.encode_hidden_size))
    if m.split_image_objects:              # extra pairing block, 2-token seq
        enc += mha(2 * S, 2 * S, d_e, m.encode_q_k_dim, m.encode_v_dim,
                   m.encode_num_heads) + ffn(2 * S, d_e,
                                             m.encode_hidden_size)
    dec = m.decode_num_blocks * (
        mha(T, T, d_d, m.decode_q_k_dim, m.decode_v_dim,
            m.decode_num_heads)            # self
        + mha(T, S, d_d, m.decode_q_k_dim, m.decode_v_dim,
              m.decode_num_heads)          # cross
        + ffn(T, d_d, m.decode_hidden_size))
    embeds = 2 * (S * m.dim_features * d_e + S * m.dim_positions * d_e
                  + T * m.dim_word_embedding * d_d)
    classifier = 2 * T * d_d * m.num_vocab
    fwd = batch * (enc + dec + embeds + classifier)
    return 3.0 * fwd                       # bwd ~= 2x fwd matmul FLOPs


def bench_one(d: int, dtype: str, *, batch=32, scan_k=8, iters=5,
              num_vocab=12_000, max_length=None):
    import jax
    from image_caption_tpu.train.loop import Trainer

    cfg = make_cfg(d, batch=batch, scan_k=scan_k, dtype=dtype,
                   num_vocab=num_vocab, max_length=max_length)
    m = cfg.model
    rng = np.random.RandomState(0)
    trainer = Trainer(cfg, rng=jax.random.PRNGKey(0))
    batches = []
    for s in range(scan_k):
        feats = rng.randn(batch, m.num_slots, m.dim_features).astype(
            np.float32)
        pos = rng.rand(batch, m.num_slots, m.dim_positions).astype(
            np.float32)
        caps = rng.randint(3, m.num_vocab, size=(batch, m.max_length)
                           ).astype(np.int32)
        caps[:, 0] = 1
        batches.append((feats, pos, caps))
    stacked = trainer.shard_stacked(batches)

    def step():
        loss = trainer.train_steps_device(stacked)["loss"]
        return float(np.asarray(loss)[-1])

    step()                                  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        step()
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2] / scan_k
    flops = analytic_flops_per_step(cfg, batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        trainer.state.params))
    return {"d_model": d, "dtype": dtype, "params_m": round(n_params / 1e6, 1),
            "steps_per_sec": round(1.0 / dt, 2),
            "ms_per_step": round(dt * 1e3, 2),
            # 6 decimals: a CPU smoke at toy shapes lands in the 1e-6 TF/s
            # range and must not round to a (test-failing) hard 0
            "model_tflops_per_sec": round(flops / dt / 1e12, 6)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the largest size")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU-runnable pre-flight")
    args = ap.parse_args()

    if args.smoke:
        # toy vocab/length too: the smoke validates plumbing + JSON, and a
        # 12k-vocab f32 CPU step takes tens of seconds on a contended box
        rows = [bench_one(64, dt, batch=4, scan_k=2, iters=1,
                          num_vocab=256, max_length=13)
                for dt in ("float32", "bfloat16")]
    else:
        sizes = [256, 512, 1024] + ([] if args.quick else [2048])
        rows = [bench_one(d, dt)
                for d in sizes for dt in ("float32", "bfloat16")]
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
