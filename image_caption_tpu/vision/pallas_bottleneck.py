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


# ---------------------------------------------------------------------------
# Per-STAGE fusion: one kernel runs a batch tile through ALL of a stage's
# identity blocks with the tile resident in VMEM.
# ---------------------------------------------------------------------------

_VMEM_BUDGET = 100 * 1024 * 1024
_STAGE_VMEM_LIMIT = 110 * 1024 * 1024     # v5e probes OK to >=120 MB


def _stage_kernel(x_ref, w1_ref, sb1_ref, w2_ref, sb2_ref,
                  w3_ref, sb3_ref, out_ref):
    bk, h, w, c = x_ref.shape
    n = w1_ref.shape[0]
    wd = w1_ref.shape[2]
    dt = x_ref.dtype

    # all dots contract the channel (lane) dim of 4-D operands directly —
    # reshaping strided window slices to 2-D forces VMEM copies whose
    # traffic dwarfs the dot data (first version measured 1.5x XLA)
    dn = (((3,), (0,)), ((), ()))

    def body(b, x):
        h1 = jax.lax.dot_general(x, w1_ref[b], dn,
                                 preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 * sb1_ref[b, 0] + sb1_ref[b, 1], 0.0)
        hp = jnp.pad(h1.astype(dt), ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((bk, h, w, wd), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + jax.lax.dot_general(
                    hp[:, dy:dy + h, dx:dx + w, :], w2_ref[b, dy, dx],
                    dn, preferred_element_type=jnp.float32)
        h2 = (jnp.maximum(acc * sb2_ref[b, 0] + sb2_ref[b, 1], 0.0)
              .astype(dt))
        y = jax.lax.dot_general(h2, w3_ref[b], dn,
                                preferred_element_type=jnp.float32)
        y = y * sb3_ref[b, 0] + sb3_ref[b, 1] + x.astype(jnp.float32)
        return jnp.maximum(y, 0.0).astype(dt)

    out_ref[:] = jax.lax.fori_loop(0, n, body, x_ref[:])


def _stage_block_batch(h, w, c, itemsize, weight_bytes) -> int:
    """Batch tile under the VMEM roof.  The 16x per-item multiplier
    covers double-buffered in+out (4x) plus the fori-loop intermediates —
    dominated by the f32 expand buffer y [bk*H*W, C] (4x in bf16 terms)
    and the padded/mid bf16 tensors (measured: stage 1 at bk=12 allocates
    104 MB total, i.e. ~16.5x per-item bytes beyond the weights)."""
    per_item = h * w * c * itemsize
    bk = max((_VMEM_BUDGET - weight_bytes) // (16 * per_item), 1)
    return int(min(bk, 32))


@partial(jax.jit, static_argnames=("interpret",))
def fused_stage(x: jnp.ndarray, w1, sb1, w2, sb2, w3, sb3, *,
                interpret: bool = False) -> jnp.ndarray:
    """x [N, H, W, C] through a STACK of identity bottlenecks in one
    pallas_call.  Stacked weights: w1 [n, C, Wd], w2 [n, 3, 3, Wd, Wd],
    w3 [n, Wd, C]; sb* [n, 2, dim] scale/bias rows.  All weights stay
    VMEM-resident across the batch-tile grid (stage 3 of ResNet-101 is
    48 MB — the v5e's VMEM takes it; cf. the 16 MB Mosaic default)."""
    n_items, h, w, c = x.shape
    dt = x.dtype
    nblk, _, wd = w1.shape
    wbytes = (w1.size + w2.size + w3.size) * dt.itemsize \
        + (sb1.size + sb2.size + sb3.size) * 4
    bk = _stage_block_batch(h, w, c, dt.itemsize, wbytes)
    n_pad = -n_items % bk
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    nt = x.shape[0] // bk

    out = pl.pallas_call(
        _stage_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, dt),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bk, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, c, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 2, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 3, 3, wd, wd), lambda i: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 2, wd), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, wd, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nblk, 2, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bk, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_STAGE_VMEM_LIMIT),
        interpret=interpret,
    )(x, w1.astype(dt), sb1.astype(jnp.float32), w2.astype(dt),
      sb2.astype(jnp.float32), w3.astype(dt), sb3.astype(jnp.float32))
    return out[:n_items]


def stack_identity_blocks(blocks) -> tuple:
    """List of identity-bottleneck param dicts (shared shapes) ->
    stacked fused_stage args."""
    def stk(f):
        return jnp.stack([f(b) for b in blocks])
    w1 = stk(lambda b: b["conv1"].reshape(b["conv1"].shape[2:]))
    w2 = stk(lambda b: b["conv2"])
    w3 = stk(lambda b: b["conv3"].reshape(b["conv3"].shape[2:]))
    sb1 = stk(lambda b: jnp.stack([b["bn1"]["scale"], b["bn1"]["bias"]]))
    sb2 = stk(lambda b: jnp.stack([b["bn2"]["scale"], b["bn2"]["bias"]]))
    sb3 = stk(lambda b: jnp.stack([b["bn3"]["scale"], b["bn3"]["bias"]]))
    return w1, sb1, w2, sb2, w3, sb3


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
