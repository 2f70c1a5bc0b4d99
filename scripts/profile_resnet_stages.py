#!/usr/bin/env python
"""Per-stage TPU timing of resnet_features to attribute the extraction gap.

Times cumulative prefixes of the network (stem, stem+pool, +stage1..4, +pool)
on a [N, 224, 224, 3] crop batch so each stage's marginal cost is the delta.

Usage: python scripts/profile_resnet_stages.py [N] [--f32]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, warmup=2, iters=5):
    for _ in range(warmup):
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from functools import partial

    from image_caption_tpu.vision import resnet as R

    n = int(next((a for a in sys.argv[1:] if a.isdigit()), "608"))
    dtype = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    params = R.init_resnet(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(n, 224, 224, 3).astype(np.float32))

    def prefix(images, upto, compute_dtype):
        x = images.astype(compute_dtype)
        x = R._conv(x, params["stem"]["conv"], 2, [(3, 3), (3, 3)])
        x = jax.nn.relu(R._bn(x, params["stem"]["bn"]))
        if upto == 0:
            return x.sum()
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
        if upto == 1:
            return x.sum()
        for i, blocks in enumerate(params["layers"][:upto - 1]):
            for b, block in enumerate(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = R._bottleneck(block, x, stride)
        return x.sum()

    print(f"backend={jax.default_backend()} N={n} dtype={dtype.__name__}")
    prev = 0.0
    names = ["stem", "+maxpool", "+stage1", "+stage2", "+stage3", "+stage4"]
    for upto, name in enumerate(names):
        f = jax.jit(partial(prefix, upto=upto, compute_dtype=dtype),
                    static_argnames=())
        t = timeit(lambda: f(imgs))
        print(f"{name:10s} cum={t*1e3:7.1f}ms  marginal={(t-prev)*1e3:7.1f}ms",
              flush=True)
        prev = t
    t_full = timeit(lambda: R.resnet_features_jit(params, imgs,
                                                  compute_dtype=dtype))
    print(f"{'full':10s} cum={t_full*1e3:7.1f}ms")
