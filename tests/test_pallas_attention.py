"""Fused Pallas attention vs the XLA path: forward values and custom-VJP
gradients (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_caption_tpu.ops import attention as A


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    """Run pallas kernels in interpreter mode on the CPU test backend."""
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def wrapper(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", wrapper)
    monkeypatch.setattr(A.pl, "pallas_call", wrapper)


def _setup(b=2, h=3, lq=5, lk=7, dh=4, masked=True):
    q = _rand((b, h, lq, dh), 0)
    k = _rand((b, h, lk, dh), 1)
    v = _rand((b, h, lk, dh), 2)
    if masked:
        mask = jnp.asarray(
            np.random.RandomState(3).rand(b, lq, lk) > 0.7)
        # no fully-masked rows in this parity check
        mask = mask.at[:, :, 0].set(False)
    else:
        mask = jnp.zeros((b, lq, lk), bool)
    return q, k, v, mask


def test_fused_forward_matches_xla():
    q, k, v, mask = _setup()
    temp = 2.0
    want, _ = A._attention_xla(q, k, v, mask, temp)
    got = A.fused_attention(q, k, v, mask.astype(jnp.int8), temp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_xla():
    q, k, v, mask = _setup()
    temp = 1.7

    def loss_xla(q, k, v):
        out, _ = A._attention_xla(q, k, v, mask, temp)
        return jnp.sum(out * jnp.cos(out))

    def loss_pallas(q, k, v):
        out = A.fused_attention(q, k, v, mask.astype(jnp.int8), temp)
        return jnp.sum(out * jnp.cos(out))

    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_xla, g_pal):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_fused_fully_masked_row_is_zero_and_grad_finite():
    q, k, v, mask = _setup(masked=False)
    mask = mask.at[0, 1, :].set(True)          # one fully-masked row
    out = A.fused_attention(q, k, v, mask.astype(jnp.int8), 1.0)
    np.testing.assert_allclose(np.asarray(out[0, :, 1]), 0.0, atol=1e-6)

    g = jax.grad(lambda q: jnp.sum(
        A.fused_attention(q, k, v, mask.astype(jnp.int8), 1.0)))(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bf16_compute_close_to_f32(tiny_cfg, fake_batch):
    from image_caption_tpu.models.captioner import (captioner_xe_loss,
                                                    init_captioner)
    cfg32 = tiny_cfg
    cfg16 = tiny_cfg.with_overrides(**{"model.compute_dtype": "bfloat16"})
    params = init_captioner(jax.random.PRNGKey(0), cfg32.model)
    f, p, c = fake_batch
    l32 = float(captioner_xe_loss(params, cfg32.model, f, p, c,
                                  deterministic=True)["loss"])
    l16 = float(captioner_xe_loss(params, cfg16.model, f, p, c,
                                  deterministic=True)["loss"])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / abs(l32) < 0.05, (l16, l32)
