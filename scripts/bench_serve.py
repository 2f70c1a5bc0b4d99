"""End-to-end serving throughput: JPEGs on disk -> captions out.

Measures serve.caption_images (host decode pool -> jitted extraction ->
KV-cached decode) over synthetic JPEGs, the full production path the
`caption` CLI verb runs.  Prints img/s for each (feature_mode, decode)
combination.

    python scripts/bench_serve.py [--n 512] [--batch 128] [--tiny]

--tiny swaps the full-size backbones for tiny random ones (CPU smoke of
the harness itself, not a measurement).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_jpegs(out_dir: str, n: int, seed: int = 0):
    from PIL import Image
    rng = np.random.RandomState(seed)
    paths = []
    for i in range(n):
        h = int(rng.choice([360, 480, 640, 768]))
        w = int(rng.choice([480, 640, 800, 1024]))
        p = os.path.join(out_dir, f"im{i:05d}.jpg")
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            p, quality=90)
        paths.append(p)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--beam", type=int, default=3)
    ap.add_argument("--latency", action="store_true",
                    help="also measure single-image (batch-1) latency: "
                         "p50/p90 wall time per caption_images call")
    args = ap.parse_args()

    import jax
    from image_caption_tpu.config import get_preset
    from image_caption_tpu.data.vocab import invert_vocab
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.serve import caption_images
    from image_caption_tpu.vision.pipeline import ExtractorParams

    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj"
                     ).with_overrides(
        **{"model.num_vocab": 512 if args.tiny else 12_000})
    if args.tiny:
        from image_caption_tpu.vision.resnet import init_resnet
        from image_caption_tpu.vision.yolov5 import init_yolov5
        extractor = ExtractorParams(
            yolo=init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                             width_multiple=0.25),
            resnet=init_resnet(jax.random.PRNGKey(1), stages=(1, 1, 1, 1)))
    else:
        from image_caption_tpu.vision.pipeline import load_extractor
        extractor = load_extractor("./weights")
    captioner = init_captioner(jax.random.PRNGKey(2), cfg.model)
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    vocab.update({f"w{i}": i for i in range(4, cfg.model.num_vocab)})
    idx_to_word = invert_vocab(vocab)

    with tempfile.TemporaryDirectory() as td:
        print(f"[bench_serve] writing {args.n} jpegs ...", flush=True)
        paths = make_jpegs(td, args.n)
        for mode, beam, label in (
                ("crop", None, "crop+greedy"),
                ("crop", args.beam, f"crop+beam{args.beam}"),
                ("roi", None, "roi+greedy"),
                ("roi", args.beam, f"roi+beam{args.beam}")):
            kw = dict(extractor_params=extractor, feature_mode=mode,
                      max_obj=5, beam_size=beam, batch_size=args.batch)
            # warmup on one batch (remote compile is 30-60 s/program)
            caption_images(cfg, paths[:args.batch], captioner, idx_to_word,
                           **kw)
            t0 = time.perf_counter()
            caps = caption_images(cfg, paths, captioner, idx_to_word, **kw)
            dt = time.perf_counter() - t0
            assert len(caps) == args.n
            print(f"[bench_serve] {label:14s} {args.n / dt:8.1f} img/s "
                  f"({dt:.1f}s / {args.n})", flush=True)
            if args.latency:
                # batch-1 request latency through the same entry point
                # (one compiled program at batch 1; warmup above was
                # batch args.batch, so pay the batch-1 compile once)
                kw1 = dict(kw, batch_size=1)
                caption_images(cfg, paths[:1], captioner, idx_to_word,
                               **kw1)
                lats = []
                for p in paths[:min(args.n, 20)]:
                    t1 = time.perf_counter()
                    caption_images(cfg, [p], captioner, idx_to_word, **kw1)
                    lats.append((time.perf_counter() - t1) * 1e3)
                lats.sort()
                print(f"[bench_serve] {label:14s} latency p50 "
                      f"{lats[len(lats) // 2]:7.1f} ms  p90 "
                      f"{lats[int(len(lats) * 0.9)]:7.1f} ms (batch 1)",
                      flush=True)


if __name__ == "__main__":
    main()
