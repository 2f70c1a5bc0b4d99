"""Fused Pallas bottleneck == the XLA bottleneck (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_caption_tpu.vision import resnet as R
from image_caption_tpu.vision.pallas_bottleneck import (fused_bottleneck,
                                                        params_from_block)


def _random_block(key, c, width):
    ks = jax.random.split(key, 3)
    blk = {
        "conv1": R._conv_init(ks[0], 1, 1, c, width),
        "bn1": {"scale": jnp.asarray(np.random.RandomState(0).rand(width)
                                     .astype(np.float32) + 0.5),
                "bias": jnp.asarray(np.random.RandomState(1).randn(width)
                                    .astype(np.float32) * 0.1)},
        "conv2": R._conv_init(ks[1], 3, 3, width, width),
        "bn2": {"scale": jnp.ones((width,), jnp.float32) * 0.8,
                "bias": jnp.zeros((width,), jnp.float32)},
        "conv3": R._conv_init(ks[2], 1, 1, width, c),
        "bn3": {"scale": jnp.ones((c,), jnp.float32) * 1.1,
                "bias": jnp.full((c,), 0.05, jnp.float32)},
    }
    return blk


def test_fused_bottleneck_matches_xla_f32():
    c, width = 32, 16
    blk = _random_block(jax.random.PRNGKey(0), c, width)
    x = jnp.asarray(np.random.RandomState(2).randn(5, 8, 8, c)
                    .astype(np.float32))
    want = R._bottleneck(blk, x, 1)
    got = fused_bottleneck(x, *params_from_block(blk), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_bottleneck_matches_xla_bf16():
    c, width = 64, 32
    blk = _random_block(jax.random.PRNGKey(3), c, width)
    x = jnp.asarray(np.random.RandomState(4).randn(3, 7, 7, c)
                    .astype(np.float32)).astype(jnp.bfloat16)
    want = R._bottleneck(blk, x, 1).astype(jnp.float32)
    got = fused_bottleneck(x, *params_from_block(blk),
                           interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)


def test_fused_stage_matches_sequential_blocks():
    """fused_stage (one kernel over a stack of identity blocks) == the
    XLA blocks applied in sequence."""
    from image_caption_tpu.vision.pallas_bottleneck import (
        fused_stage, stack_identity_blocks)
    c, width = 32, 16
    blocks = [_random_block(jax.random.PRNGKey(i), c, width)
              for i in range(3)]
    x = jnp.asarray(np.random.RandomState(7).randn(4, 6, 6, c)
                    .astype(np.float32))
    want = x
    for blk in blocks:
        want = R._bottleneck(blk, want, 1)
    got = fused_stage(x, *stack_identity_blocks(blocks), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_resnet_use_pallas_flag_cpu_noop():
    """On CPU the probe gates fused dispatch off: use_pallas=True must
    equal the XLA path bit-for-bit."""
    params = R.init_resnet(jax.random.PRNGKey(0), stages=(2, 2))
    x = jnp.asarray(np.random.RandomState(8).rand(2, 64, 64, 3)
                    .astype(np.float32))
    a = R.resnet_features(params, x)
    b = R.resnet_features(params, x, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_bottleneck_pads_ragged_batch():
    """N not divisible by the batch tile: output still matches item-wise."""
    c, width = 32, 16
    blk = _random_block(jax.random.PRNGKey(5), c, width)
    x = jnp.asarray(np.random.RandomState(6).randn(1, 8, 8, c)
                    .astype(np.float32))
    want = R._bottleneck(blk, x, 1)
    got = fused_bottleneck(x, *params_from_block(blk), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
