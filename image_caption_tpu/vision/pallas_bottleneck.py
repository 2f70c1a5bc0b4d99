"""Fused ResNet bottleneck block as a Pallas TPU kernel.

A stride-1 identity bottleneck (``vision/resnet.py:_bottleneck``) is three
convs with folded-BN epilogues and a residual add:

    h1 = relu(x @ w1 * s1 + b1)          # 1x1, C -> W
    h2 = relu(conv3x3(h1, w2) * s2 + b2) # 3x3, W -> W, pad 1
    y  = relu((h2 @ w3) * s3 + b3 + x)   # 1x1, W -> C

XLA runs each conv as its own HBM round trip: per stage-3 block at
608 crops that is ~1 GB of activation traffic for ~0.7 ms of MXU work —
2x memory-bound (docs/performance.md).  This kernel keeps h1/h2 in VMEM
and streams x once in, y once out; the 3x3 conv is nine shifted
``jnp.dot``s over the padded VMEM tile so everything rides the MXU.

Grid = batch tiles (spatial dims stay whole per tile, so the 3x3 halo
never crosses a block boundary).  Applicable to the identity blocks of
every stage at 224-crop sizes (56/28/14/7 spatial); strided or
downsample blocks fall back to the XLA path.

MEASURED (B=32, 608 crops, v5e): per-block fusion is 125.6 ms vs XLA's
78.1 ms — XLA's per-conv schedule already sits near the HBM roofline, so
saving only the intra-block h1/h2 round trips cannot pay for ~2.7k
pallas_call launches (22 stage-3 blocks x 122 batch tiles each).  Kept
(default OFF, ``resnet_features(use_pallas=...)``) as the verified
numerical base for the per-STAGE fused kernel, which holds a batch tile
in VMEM across ALL of a stage's identity blocks.

Weights are passed pre-folded: w1 [C, W], w2 [3, 3, W, W], w3 [W, C],
scale/bias rows [1, W] / [1, C] (2-D for SMEM/VMEM tiling rules).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bottleneck_kernel(x_ref, w1_ref, s1_ref, w2_ref, s2_ref,
                       w3_ref, s3_ref, out_ref):
    bk, h, w, c = x_ref.shape
    wd = w1_ref.shape[1]                     # bottleneck width
    x = x_ref[:]                             # [bk, H, W, C]
    x2 = x.reshape(bk * h * w, c)

    # 1x1 reduce: C -> W, BN + relu epilogue
    h1 = jnp.dot(x2, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 * s1_ref[0, :] + s1_ref[1, :], 0.0)
    h1 = h1.astype(x.dtype).reshape(bk, h, w, wd)

    # 3x3 same conv as nine shifted matmuls over the padded tile
    hp = jnp.pad(h1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((bk * h * w, wd), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = hp[:, dy:dy + h, dx:dx + w, :].reshape(bk * h * w, wd)
            acc += jnp.dot(win, w2_ref[dy, dx],
                           preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc * s2_ref[0, :] + s2_ref[1, :], 0.0)
    h2 = h2.astype(x.dtype)

    # 1x1 expand: W -> C, BN + residual + relu
    y = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    y = y * s3_ref[0, :] + s3_ref[1, :] + x2.astype(jnp.float32)
    out_ref[:] = jnp.maximum(y, 0.0).astype(x.dtype).reshape(x.shape)


_VMEM_LIMIT = 48 * 1024 * 1024


def _block_batch(h: int, w: int, c: int, itemsize: int) -> int:
    """Batch-tile size: in+out tiles (double-buffered) plus intermediates
    within a ~12 MB working set (the pallas_call raises Mosaic's scoped
    VMEM limit to 48 MB, leaving headroom for the per-stage weight
    blocks — stage 4's 3x3 kernel alone is 4.7 MB bf16)."""
    per_item = h * w * c * itemsize          # one item of x or y
    budget = 12 * 1024 * 1024
    bk = max(budget // (6 * per_item), 1)
    return min(bk, 32)


@partial(jax.jit, static_argnames=("interpret",))
def fused_bottleneck(x: jnp.ndarray, w1, s1, b1, w2, s2, b2, w3, s3, b3,
                     *, interpret: bool = False) -> jnp.ndarray:
    """x [N, H, W, C] -> [N, H, W, C] through one fused identity
    bottleneck.  N is padded up to the batch-tile multiple internally."""
    n, h, w, c = x.shape
    wd = w1.shape[1]
    bk = _block_batch(h, w, c, x.dtype.itemsize)
    n_pad = -n % bk
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    nt = x.shape[0] // bk

    dt = x.dtype
    # fold scale/bias pairs into [2, W] rows (f32 epilogue math)
    sb1 = jnp.stack([s1, b1]).astype(jnp.float32)
    sb2 = jnp.stack([s2, b2]).astype(jnp.float32)
    sb3 = jnp.stack([s3, b3]).astype(jnp.float32)

    full = lambda *_: (0, 0)                 # whole-array block
    out = pl.pallas_call(
        _bottleneck_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bk, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, wd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, wd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, wd, wd), lambda *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, wd), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((wd, c), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1.astype(dt), sb1, w2.astype(dt), sb2, w3.astype(dt), sb3)
    return out[:n]


_PALLAS_OK = None


def bottleneck_pallas_available() -> bool:
    """One-time eager probe (same contract as
    ``ops.attention.pallas_available``): cpu/gpu backends never lower TPU
    Pallas, and after a successful probe kernel failures propagate
    instead of silently degrading."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import logging
        logger = logging.getLogger("image_caption_tpu.vision")
        if jax.default_backend() in ("cpu", "gpu"):
            _PALLAS_OK = False
            logger.info("bottleneck dispatch: XLA (backend=%s)",
                        jax.default_backend())
        else:
            import threading

            import numpy as np
            result: dict = {}

            def _probe():
                try:
                    x = jnp.zeros((1, 7, 7, 256), jnp.bfloat16)
                    w1 = jnp.zeros((256, 128), jnp.float32)
                    w2 = jnp.zeros((3, 3, 128, 128), jnp.float32)
                    w3 = jnp.zeros((128, 256), jnp.float32)
                    s = jnp.ones((128,), jnp.float32)
                    sc = jnp.ones((256,), jnp.float32)
                    np.asarray(fused_bottleneck(
                        x, w1, s, s, w2, s, s, w3, sc, sc))
                    result["ok"] = True
                except Exception as exc:
                    result["ok"] = False
                    result["exc"] = exc

            t = threading.Thread(target=_probe, name="bottleneck-probe")
            t.start()
            t.join()
            _PALLAS_OK = bool(result.get("ok"))
            if _PALLAS_OK:
                logger.info("bottleneck dispatch: fused Pallas kernel")
            else:
                exc = result.get("exc")
                logger.warning(
                    "fused Pallas bottleneck failed its startup probe "
                    "(%s: %s); using the XLA path",
                    type(exc).__name__, exc)
    return _PALLAS_OK


def params_from_block(block) -> tuple:
    """vision/resnet.py bottleneck param dict -> fused-kernel args
    (identity blocks only: no 'downsample', stride 1)."""
    w1 = block["conv1"].reshape(block["conv1"].shape[2],
                                block["conv1"].shape[3])
    w3 = block["conv3"].reshape(block["conv3"].shape[2],
                                block["conv3"].shape[3])
    return (w1, block["bn1"]["scale"], block["bn1"]["bias"],
            block["conv2"], block["bn2"]["scale"], block["bn2"]["bias"],
            w3, block["bn3"]["scale"], block["bn3"]["bias"])
