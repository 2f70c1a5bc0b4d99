#!/usr/bin/env python
"""Component-level timing of the feature-extraction pipeline on the TPU.

Breaks the one-program pipeline (vision/pipeline.py:extract_features_batch)
into its stages — YOLOv5x detect, crop+resize, ResNet-101 over crops — and
times each at several batch sizes, so optimization work is attributed
(VERDICT r1: profile where the ~400 img/s FLOPs-bound budget goes).

Usage: python scripts/bench_extraction.py [B ...]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(out):
    # device-side scalar slice, then a 4-byte fetch: synchronizes without
    # measuring the ~30 MB/s tunnel transfer of the full output
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *args, warmup=2, iters=5):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from image_caption_tpu.vision.pipeline import (extract_features_batch,
                                                   init_extractor)
    from image_caption_tpu.vision.resnet import resnet_features_jit
    from image_caption_tpu.vision.yolov5 import (init_yolov5, stem_is_focus,
                                                 yolov5_detect)
    from image_caption_tpu.vision.ops import batched_crop_and_resize

    components = "--components" in sys.argv
    batches = [int(a) for a in sys.argv[1:] if not a.startswith("-")] \
        or [8, 16, 32]
    params = init_extractor()
    rng = np.random.RandomState(0)

    print(f"backend={jax.default_backend()}")
    for B in batches:
        canvases = jnp.asarray(
            rng.rand(B, 640, 640, 3).astype(np.float32) * 255.0)
        metas = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (B, 1))
        sizes = jnp.tile(jnp.asarray([[640.0, 640.0]]), (B, 1))
        boxes = jnp.asarray(
            np.sort(rng.rand(B, 37, 2, 2) * 640, axis=2).reshape(B, 37, 4)
            .astype(np.float32))
        crops224 = jnp.asarray(
            rng.rand(B * 37, 224, 224, 3).astype(np.float32))

        line = f"B={B:3d}"
        if components:
            detect = jax.jit(partial(
                yolov5_detect, max_det=36, num_classes=80,
                focus_stem=stem_is_focus(params.yolo),
                compute_dtype=jnp.bfloat16))
            t_yolo = timeit(lambda: detect(params.yolo, canvases / 255.0))
            t_crop = timeit(lambda: batched_crop_and_resize(canvases,
                                                            boxes))
            t_res = timeit(lambda: resnet_features_jit(
                params.resnet, crops224, compute_dtype=jnp.bfloat16))
            line += (f"  yolo={t_yolo*1e3:7.1f}ms"
                     f"  crop37={t_crop*1e3:7.1f}ms"
                     f"  resnet37={t_res*1e3:7.1f}ms")
        t_full = timeit(lambda: extract_features_batch(
            params, canvases, metas, sizes))
        t_full5 = timeit(lambda: extract_features_batch(
            params, canvases, metas, sizes, max_obj=5))
        line += (f"  full={t_full*1e3:7.1f}ms ({B/t_full:6.1f} img/s)"
                 f"  full(max_obj=5)={t_full5*1e3:7.1f}ms "
                 f"({B/t_full5:6.1f} img/s)")
        print(line, flush=True)
