"""Functional transformer layers (pure init/apply, explicit param pytrees).

Design: parameters are nested dicts of ``jnp.ndarray`` — transparent for
pjit sharding, orbax checkpointing, and torch-weight import.  Kernels are
stored ``[in, out]`` (JAX convention; the torch importer transposes).

Semantics cited against the reference:
  * MultiHeadAttention — modules.py:30-92 (bias-free projections, post-norm
    residual ``LayerNorm(out + q)``, attention dropout fixed at 0.1)
  * FeedForward        — modules.py:95-122 (Linear-ReLU-Linear with bias,
    post-norm residual)
  * EncoderBlock       — modules.py:125-157
  * DecoderBlock       — modules.py:160-206
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import dropout as _dropout
from ..ops.attention import sdp_attention

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers matching the reference's torch inits
# ---------------------------------------------------------------------------

def normal_fan_sum(key, in_dim, out_dim, dtype=jnp.float32):
    """N(0, sqrt(2/(in+out))) — reference q/k/v init (modules.py:45-53) and
    torch xavier_normal_ with gain 1 (same distribution)."""
    std = math.sqrt(2.0 / (in_dim + out_dim))
    return std * jax.random.normal(key, (in_dim, out_dim), dtype)


def torch_default_kernel(key, in_dim, out_dim, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (in_dim, out_dim), dtype, -bound, bound)


def torch_default_bias(key, in_dim, out_dim, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(key, (out_dim,), dtype, -bound, bound)


def init_linear(key, in_dim, out_dim, *, bias: bool,
                kernel_init=torch_default_kernel) -> Params:
    kkey, bkey = jax.random.split(key)
    p = {"kernel": kernel_init(kkey, in_dim, out_dim)}
    if bias:
        p["bias"] = torch_default_bias(bkey, in_dim, out_dim)
    return p


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Params are cast to the activation dtype: under bf16 compute the
    matmul runs on the MXU in bf16 with f32 accumulation (master params
    stay f32)."""
    y = jnp.dot(x, params["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Params, x: jnp.ndarray,
               eps: float = 1e-6) -> jnp.ndarray:
    """torch LayerNorm semantics (biased variance), eps=1e-6
    (modules.py:57,105).  Statistics in f32 regardless of compute dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(dtype)


def init_embedding(key, num_embeddings, dim, pad_idx: Optional[int] = 0):
    """torch.nn.Embedding default N(0,1); padding row zeroed
    (model.py:389-391).  The train step re-zeroes the pad row after each
    update to mirror torch's frozen padding_idx gradient."""
    table = jax.random.normal(key, (num_embeddings, dim), jnp.float32)
    if pad_idx is not None:
        table = table.at[pad_idx].set(0.0)
    return {"table": table}


def embedding(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["table"], ids, axis=0)


# ---------------------------------------------------------------------------
# Multi-head attention
# ---------------------------------------------------------------------------

def init_mha(key, input_size, q_k_dim, v_dim, num_heads) -> Params:
    kq, kk, kv, kj = jax.random.split(key, 4)
    return {
        "q": {"kernel": normal_fan_sum(kq, input_size, q_k_dim)},
        "k": {"kernel": normal_fan_sum(kk, input_size, q_k_dim)},
        "v": {"kernel": normal_fan_sum(kv, input_size, v_dim)},
        # joint: xavier_normal (modules.py:62); in = num_heads*v_head = v_dim
        "joint": {"kernel": normal_fan_sum(kj, v_dim, input_size)},
        "norm": init_layer_norm(input_size),
    }


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


def mha(params: Params, q_in, k_in, v_in, mask, *, num_heads: int,
        dropout_rate: float, attention_dropout: float = 0.1,
        rng: Optional[jax.Array] = None, deterministic: bool = True,
        use_pallas: bool = False, need_weights: bool = True
        ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Post-norm residual MHA: ``LayerNorm(dropout(joint(attn)) + q_in)``
    (modules.py:67-92)."""
    residual = q_in
    q = _split_heads(linear(params["q"], q_in), num_heads)
    k = _split_heads(linear(params["k"], k_in), num_heads)
    v = _split_heads(linear(params["v"], v_in), num_heads)
    temperature = math.sqrt(q.shape[-1])

    attn_rng = out_rng = None
    if rng is not None:
        attn_rng, out_rng = jax.random.split(rng)

    out, attn = sdp_attention(q, k, v, mask, temperature,
                              dropout_rate=attention_dropout, rng=attn_rng,
                              deterministic=deterministic,
                              use_pallas=use_pallas,
                              need_weights=need_weights)
    out = linear(params["joint"], _merge_heads(out))
    out = _dropout(out, dropout_rate, out_rng, deterministic)
    out = layer_norm(params["norm"], out + residual)
    return out, attn


# ---------------------------------------------------------------------------
# Position-wise feed-forward
# ---------------------------------------------------------------------------

def init_ffn(key, input_size, hidden_size) -> Params:
    k1, k2, kb1, kb2 = jax.random.split(key, 4)
    return {
        "w1": {"kernel": normal_fan_sum(k1, input_size, hidden_size),
               "bias": torch_default_bias(kb1, input_size, hidden_size)},
        "w2": {"kernel": normal_fan_sum(k2, hidden_size, input_size),
               "bias": torch_default_bias(kb2, hidden_size, input_size)},
        "norm": init_layer_norm(input_size),
    }


def ffn(params: Params, x, *, dropout_rate: float,
        rng: Optional[jax.Array] = None,
        deterministic: bool = True) -> jnp.ndarray:
    """Linear-ReLU-Linear, dropout, post-norm residual (modules.py:110-122)."""
    residual = x
    h = jax.nn.relu(linear(params["w1"], x))
    h = linear(params["w2"], h)
    h = _dropout(h, dropout_rate, rng, deterministic)
    return layer_norm(params["norm"], h + residual)


# ---------------------------------------------------------------------------
# Encoder / decoder blocks
# ---------------------------------------------------------------------------

def init_encoder_block(key, input_size, hidden_size, num_heads,
                       q_k_dim, v_dim) -> Params:
    k_attn, k_ffn = jax.random.split(key)
    return {"mha": init_mha(k_attn, input_size, q_k_dim, v_dim, num_heads),
            "ffn": init_ffn(k_ffn, input_size, hidden_size)}


def encoder_block(params: Params, x, *, num_heads: int, dropout_rate: float,
                  attention_dropout: float = 0.1,
                  non_pad_mask=None, attention_mask=None,
                  rng=None, deterministic=True, use_pallas=False,
                  need_weights=True):
    """modules.py:146-157 (FFN output optionally zeroed at pad rows)."""
    r1 = r2 = None
    if rng is not None:
        r1, r2 = jax.random.split(rng)
    out, attn = mha(params["mha"], x, x, x, attention_mask,
                    num_heads=num_heads, dropout_rate=dropout_rate,
                    attention_dropout=attention_dropout,
                    rng=r1, deterministic=deterministic,
                    use_pallas=use_pallas, need_weights=need_weights)
    out = ffn(params["ffn"], out, dropout_rate=dropout_rate, rng=r2,
              deterministic=deterministic)
    if non_pad_mask is not None:
        out = out * non_pad_mask.astype(out.dtype)
    return out, attn


def init_decoder_block(key, input_size, hidden_size, num_heads,
                       q_k_dim, v_dim) -> Params:
    k_self, k_cross, k_ffn = jax.random.split(key, 3)
    return {
        "self_attn": init_mha(k_self, input_size, q_k_dim, v_dim, num_heads),
        "cross_attn": init_mha(k_cross, input_size, q_k_dim, v_dim, num_heads),
        "ffn": init_ffn(k_ffn, input_size, hidden_size),
    }


def decoder_block(params: Params, x, encode_output, *, num_heads: int,
                  dropout_rate: float, attention_dropout: float = 0.1,
                  non_pad_mask=None,
                  self_attention_mask=None, context_attention_mask=None,
                  rng=None, deterministic=True, use_pallas=False,
                  need_weights=True):
    """modules.py:185-206: masked self-MHA -> cross-MHA -> FFN -> pad-zero."""
    r1 = r2 = r3 = None
    if rng is not None:
        r1, r2, r3 = jax.random.split(rng, 3)
    out, self_attn = mha(params["self_attn"], x, x, x, self_attention_mask,
                         num_heads=num_heads, dropout_rate=dropout_rate,
                         attention_dropout=attention_dropout,
                         rng=r1, deterministic=deterministic,
                         use_pallas=use_pallas, need_weights=need_weights)
    out, cross_attn = mha(params["cross_attn"], out, encode_output,
                          encode_output, context_attention_mask,
                          num_heads=num_heads, dropout_rate=dropout_rate,
                          attention_dropout=attention_dropout,
                          rng=r2, deterministic=deterministic,
                          use_pallas=use_pallas, need_weights=need_weights)
    out = ffn(params["ffn"], out, dropout_rate=dropout_rate, rng=r3,
              deterministic=deterministic)
    if non_pad_mask is not None:
        out = out * non_pad_mask.astype(out.dtype)
    return out, self_attn, cross_attn


# ---------------------------------------------------------------------------
# Sinusoidal positional encoding (model.py:489-517)
# ---------------------------------------------------------------------------

def sinusoid_table(num_positions: int, dim: int) -> jnp.ndarray:
    """Exact reference formula: angle(pos, j) = pos / 10000^(2*(j//2)/dim);
    sin on even dims, cos on odd dims.  Returns [num_positions, dim]."""
    import numpy as np
    positions = np.arange(num_positions)[:, None]
    j = np.arange(dim)[None, :]
    angles = positions / np.power(10000.0, 2 * (j // 2) / dim)
    table = np.zeros((num_positions, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(angles[:, 0::2])
    table[:, 1::2] = np.cos(angles[:, 1::2])
    return jnp.asarray(table, dtype=jnp.float32)
