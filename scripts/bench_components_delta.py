#!/usr/bin/env python
"""True device-time attribution for the extraction pipeline components.

Single-dispatch timings through the axon tunnel carry a ~30 ms round-trip
floor that swamps sub-50 ms programs (docs/performance.md "Methodology").
This harness times each component by the REP-DELTA method instead: jit one
program that runs the component once and one that runs it n times (on
``jnp.roll``-shifted inputs so XLA cannot dedupe — TPU executes fusions
sequentially), and report (t_n - t_1) / (n - 1).  The RTT cancels in the
difference.

Usage: python scripts/bench_components_delta.py [N_IMAGES] [--reps K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _measure(fn, *args, k=4, iters=3):
    _sync(fn(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(k):
            _sync(fn(*args))
        dt = (time.perf_counter() - t0) / k
        best = dt if best is None else min(best, dt)
    return best


def delta(build, x, n2, params=None):
    """Params are threaded through as jit ARGUMENTS — closing over a big
    param pytree bakes it into the program as constants and blows the
    remote-compile request limit (HTTP 413 at ~300 MB)."""
    j1 = jax.jit(lambda p, a: build(p, a, 1))
    j2 = jax.jit(lambda p, a: build(p, a, n2))
    return (_measure(j2, params, x) - _measure(j1, params, x)) / (n2 - 1)


def reps(fn, axis=1):
    """Repeat harness over rolled inputs.  Every output leaf is fully
    reduced into the accumulator — consuming a single scalar instead lets
    XLA dead-code-eliminate whole branches (e.g. unused detect heads, or
    all but one window of an isolated conv) and report fantasy timings."""
    def build(params, x, n):
        acc = jnp.float32(0)
        for i in range(n):
            out = fn(params, jnp.roll(x, i, axis=axis))
            for leaf in jax.tree.leaves(out):
                acc = acc + leaf.astype(jnp.float32).sum()
        return acc
    return build


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from image_caption_tpu.vision.ops import batched_crop_and_resize
    from image_caption_tpu.vision.pipeline import init_extractor
    from image_caption_tpu.vision.resnet import resnet_features
    from image_caption_tpu.vision.yolov5 import yolov5_detect, yolov5_raw

    B = int(next((a for a in sys.argv[1:] if a.isdigit()), "32"))
    n2 = 3
    if "--reps" in sys.argv:
        n2 = int(sys.argv[sys.argv.index("--reps") + 1])
    n_crops = 19                      # cap_half: 18 detections + full image
    params = init_extractor()
    rng = np.random.RandomState(0)

    canv = jnp.asarray(rng.rand(B, 640, 640, 3).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([rng.uniform(0, 320, (B, n_crops)),
                  rng.uniform(0, 320, (B, n_crops)),
                  rng.uniform(320, 640, (B, n_crops)),
                  rng.uniform(320, 640, (B, n_crops))], axis=-1)
        .astype(np.float32))
    crops = jnp.asarray(rng.rand(B * n_crops, 224, 224, 3)
                        .astype(np.float32))

    print(f"backend={jax.default_backend()} B={B} crops/img={n_crops} "
          f"reps={n2}", flush=True)

    if "--yolo-only" not in sys.argv:
        t = delta(reps(lambda p, c: batched_crop_and_resize(c, boxes, 224)),
                  canv, n2)
        print(f"crop f32      : {t*1e3:7.2f} ms", flush=True)
        t = delta(reps(lambda p, c: batched_crop_and_resize(
            c.astype(jnp.bfloat16), boxes, 224)), canv, n2)
        print(f"crop bf16     : {t*1e3:7.2f} ms", flush=True)
        t = delta(reps(lambda p, c: resnet_features(
            p, c, compute_dtype=jnp.bfloat16)), crops, n2,
            params=params.resnet)
        print(f"resnet bf16 x{B * n_crops}: {t*1e3:7.2f} ms", flush=True)
    t = delta(reps(lambda p, c: yolov5_raw(
        p, c, jnp.bfloat16, s2d_stem=True)), canv, n2, params=params.yolo)
    print(f"yolo s2d stem : {t*1e3:7.2f} ms", flush=True)
    t = delta(reps(lambda p, c: yolov5_raw(
        p, c, jnp.bfloat16, s2d_stem=False)), canv, n2, params=params.yolo)
    print(f"yolo 6x6 stem : {t*1e3:7.2f} ms", flush=True)
    t = delta(reps(lambda p, c: yolov5_detect(
        p, c, compute_dtype=jnp.bfloat16)), canv, n2, params=params.yolo)
    print(f"yolo detect   : {t*1e3:7.2f} ms  (raw + decode + NMS)",
          flush=True)
