"""ResNet-101 region encoder as a single batched XLA graph.

The reference wraps torchvision ``resnet101(pretrained=True)`` truncated
after avgpool and runs it one image at a time, reloading the weights on
every call (``/root/reference/core/preprocess.py:26-62``; reload-per-image
``core/preprocess.py:95``).  Here the network is a pure function over an
explicit param pytree:

  * NHWC layout, HWIO conv kernels — XLA's native TPU layout;
  * inference BatchNorm folded into a single scale/bias per channel at
    import time (one fused multiply-add, no running-stat reads per call);
  * every crop in the batch runs through one jitted forward — weights load
    once per process, batches of [N, 224, 224, 3] feed the MXU;
  * optional bfloat16 compute with float32 accumulation.

Weight import: ``import_torch_state_dict`` maps a torchvision
``resnet101().state_dict()`` (torch file or npz) onto this layout.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# torchvision resnet101: blocks per stage
RESNET101_STAGES = (3, 4, 23, 3)
RESNET50_STAGES = (3, 4, 6, 3)
BN_EPS = 1e-5

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout):
    """torch kaiming_normal(fan_out, relu) for convs."""
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)


def _bn_init(c):
    """Folded inference BN: identity at init (scale=1, bias=0)."""
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _bottleneck_init(key, cin, width, cout, stride) -> Params:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_init(ks[0], 1, 1, cin, width),
        "bn1": _bn_init(width),
        "conv2": _conv_init(ks[1], 3, 3, width, width),
        "bn2": _bn_init(width),
        "conv3": _conv_init(ks[2], 1, 1, width, cout),
        "bn3": _bn_init(cout),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = {"conv": _conv_init(ks[3], 1, 1, cin, cout),
                           "bn": _bn_init(cout)}
    return p


def init_resnet(key, stages: Sequence[int] = RESNET101_STAGES) -> Params:
    keys = jax.random.split(key, 1 + len(stages))
    p: Params = {
        "stem": {"conv": _conv_init(keys[0], 7, 7, 3, 64),
                 "bn": _bn_init(64)},
        "layers": [],
    }
    cin = 64
    for i, num_blocks in enumerate(stages):
        width = 64 * (2 ** i)
        cout = width * 4
        bkeys = jax.random.split(keys[1 + i], num_blocks)
        blocks = []
        for b in range(num_blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            blocks.append(_bottleneck_init(
                bkeys[b], cin if b == 0 else cout, width, cout, stride))
        p["layers"].append(blocks)
        cin = cout
    return p


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _bn(x, p):
    return x * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _bottleneck(p: Params, x, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1"], 1, "VALID"), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], stride,
                                [(1, 1), (1, 1)]), p["bn2"]))
    out = _bn(_conv(out, p["conv3"], 1, "VALID"), p["bn3"])
    if "downsample" in p:
        x = _bn(_conv(x, p["downsample"]["conv"], stride, "VALID"),
                p["downsample"]["bn"])
    return jax.nn.relu(out + x)


def _use_fused_block(block, stride: int, use_pallas: bool) -> bool:
    """Fused-kernel eligibility: identity blocks (stride 1, no
    downsample).  Eligible RUNS of consecutive blocks go through ONE
    per-stage pallas_call with the batch tile resident in VMEM
    (vision/pallas_bottleneck.py:fused_stage)."""
    if not (use_pallas and stride == 1 and "downsample" not in block):
        return False
    from .pallas_bottleneck import bottleneck_pallas_available
    return bottleneck_pallas_available()


def resnet_features(params: Params, images: jnp.ndarray, *,
                    compute_dtype=jnp.float32,
                    use_pallas: bool = False) -> jnp.ndarray:
    """[N, H, W, 3] (ImageNet-normalized) -> [N, 2048] global features.

    Equivalent to torchvision children()[:9] + flatten
    (core/preprocess.py:37-45): stem, 4 stages, global average pool.
    ``use_pallas`` routes eligible identity bottlenecks through the fused
    VMEM-resident kernel (vision/pallas_bottleneck.py) — the XLA path
    round-trips every conv through HBM, which leaves stages 1-3 2-8x
    memory-bound (docs/performance.md).
    """
    from .pallas_bottleneck import fused_stage, stack_identity_blocks
    x = images.astype(compute_dtype)
    x = _conv(x, params["stem"]["conv"], 2, [(3, 3), (3, 3)])
    x = jax.nn.relu(_bn(x, params["stem"]["bn"]))
    # torch MaxPool2d(3, stride=2, padding=1)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    for i, blocks in enumerate(params["layers"]):
        run = []                  # consecutive fused-eligible blocks
        for b, block in enumerate(blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            if _use_fused_block(block, stride, use_pallas):
                run.append(block)
                continue
            if run:
                x = fused_stage(x, *stack_identity_blocks(run))
                run = []
            x = _bottleneck(block, x, stride)
        if run:
            x = fused_stage(x, *stack_identity_blocks(run))
    x = jnp.mean(x, axis=(1, 2))            # adaptive avgpool to 1x1
    return x.astype(jnp.float32)


@partial(jax.jit, static_argnames=("compute_dtype", "use_pallas"))
def resnet_features_jit(params, images, compute_dtype=jnp.float32,
                        use_pallas=False):
    return resnet_features(params, images, compute_dtype=compute_dtype,
                           use_pallas=use_pallas)


def resnet_feature_maps(params: Params, images: jnp.ndarray, *,
                        compute_dtype=jnp.float32) -> List[jnp.ndarray]:
    """[N,H,W,3] -> [C2, C3, C4, C5] stage outputs (strides 4/8/16/32) —
    the backbone interface Faster R-CNN's FPN consumes."""
    x = images.astype(compute_dtype)
    x = _conv(x, params["stem"]["conv"], 2, [(3, 3), (3, 3)])
    x = jax.nn.relu(_bn(x, params["stem"]["bn"]))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    maps = []
    for i, blocks in enumerate(params["layers"]):
        for b, block in enumerate(blocks):
            stride = 2 if (b == 0 and i > 0) else 1
            x = _bottleneck(block, x, stride)
        maps.append(x)
    return maps



# ---------------------------------------------------------------------------
# Torch weight import
# ---------------------------------------------------------------------------

def _fold_bn(sd, prefix):
    gamma = np.asarray(sd[f"{prefix}.weight"], np.float32)
    beta = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale)}


def _conv_w(sd, name):
    # torch OIHW -> HWIO
    return jnp.asarray(np.asarray(sd[name], np.float32).transpose(2, 3, 1, 0))


def import_torch_state_dict(sd: Dict[str, np.ndarray],
                            stages: Sequence[int] = RESNET101_STAGES
                            ) -> Params:
    """torchvision resnet state_dict (tensor or ndarray values) -> params.

    Accepts either a torch ``state_dict()`` (values with ``.numpy()``) or a
    plain dict of numpy arrays (e.g. from an npz export).
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}
    p: Params = {
        "stem": {"conv": _conv_w(sd, "conv1.weight"),
                 "bn": _fold_bn(sd, "bn1")},
        "layers": [],
    }
    for i, num_blocks in enumerate(stages):
        blocks = []
        for b in range(num_blocks):
            pre = f"layer{i + 1}.{b}"
            blk = {
                "conv1": _conv_w(sd, f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": _conv_w(sd, f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": _conv_w(sd, f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": _conv_w(sd, f"{pre}.downsample.0.weight"),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        p["layers"].append(blocks)
    return p


def load_torch_checkpoint(path: str,
                          stages: Sequence[int] = RESNET101_STAGES) -> Params:
    """Load a torchvision resnet ``.pth``/``.pt`` state_dict or an ``.npz``."""
    if path.endswith(".npz"):
        return import_torch_state_dict(dict(np.load(path)), stages)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return import_torch_state_dict(
        {k: v.detach().cpu().numpy() for k, v in sd.items()}, stages)
