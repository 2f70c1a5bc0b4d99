"""The caption Transformer: encoder over object slots, decoder over tokens.

Pure-functional re-design of the reference model
(``/root/reference/core/TRANSFORMer/model.py`` — Encoder model.py:212-359,
Decoder model.py:362-486, Transformer model.py:8-209, PolicyNetwork
model_RL.py:10-97).  Parameters are nested-dict pytrees; every apply function
is jit/pjit-compatible with static shapes.

Reference quirks deliberately preserved (each behind its config flag):
  * encoder self-attention adds a *causal* mask over the 37 object slots when
    ``encode_mask`` (model.py:311-319);
  * ``split_image_objects`` pairs each object with the global image feature
    through an extra encoder block (model.py:258-292), with the shared
    LayerNorm applied both before the pairing block and after re-assembly
    (model.py:286,309);
  * ``move_first_image_feature`` tail FFN adds encoder slot 0 to every
    decoder position (model.py:451-457);
  * the decoder positional table spans ``max_length - 1`` positions
    (model.py:383).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops import masks as M
from ..ops.attention import dropout as _dropout
from . import layers as L

Params = Dict


def compute_dtype(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def init_encoder(key, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 4 + cfg.encode_num_blocks)
    d = cfg.encode_input_size
    p: Params = {}
    if cfg.split_position:
        # 4 xyxy dims and the class-score tail embedded separately and summed
        # (model.py:231-233,297-303)
        p["position_embedding"] = L.init_linear(
            keys[0], 4, d, bias=False)
        p["object_embedding"] = L.init_linear(
            keys[1], cfg.dim_positions - 4, d, bias=False)
    else:
        p["position_embedding"] = L.init_linear(
            keys[0], cfg.dim_positions, d, bias=False)
    p["feature_embedding"] = L.init_linear(
        keys[2], cfg.dim_features, d, bias=False)
    if cfg.split_image_objects:
        p["image_encoder"] = L.init_encoder_block(
            keys[3], d, cfg.encode_hidden_size, cfg.encode_num_heads,
            cfg.encode_q_k_dim, cfg.encode_v_dim)
    p["norm"] = L.init_layer_norm(d)
    p["blocks"] = [
        L.init_encoder_block(keys[4 + i], d, cfg.encode_hidden_size,
                             cfg.encode_num_heads, cfg.encode_q_k_dim,
                             cfg.encode_v_dim)
        for i in range(cfg.encode_num_blocks)
    ]
    return p


def encoder_apply(params: Params, cfg: ModelConfig,
                  object_features: jnp.ndarray,
                  position_features: jnp.ndarray, *,
                  rng: Optional[jax.Array] = None,
                  deterministic: bool = True,
                  use_pallas: bool = False,
                  need_weights: bool = False
                  ) -> Tuple[jnp.ndarray, list]:
    """[B, S, 2048] x [B, S, 84] -> [B, S, D] (model.py:257-332)."""
    n_rngs = cfg.encode_num_blocks + 1
    rngs = (jax.random.split(rng, n_rngs) if rng is not None
            else [None] * n_rngs)

    if cfg.split_image_objects:
        b, s, df = object_features.shape
        dp = position_features.shape[-1]
        img_f = jnp.broadcast_to(object_features[:, :1], (b, s, df))
        img_p = jnp.broadcast_to(position_features[:, :1], (b, s, dp))
        # [B*S, 2, .]: token 0 = whole image, token 1 = the object
        # (model.py:262-271)
        feature = jnp.stack([img_f, object_features], axis=2).reshape(
            b * s, 2, df)
        position = jnp.stack([img_p, position_features], axis=2).reshape(
            b * s, 2, dp)

        non_pad = M.non_pad_mask_from_features(position)
        pair_mask = M.combine_masks(
            M.key_pad_mask_from_features(position, 2),
            M.subsequent_mask(b * s, 2))

        emb_f = L.linear(params["feature_embedding"], feature)
        emb_p = L.linear(params["position_embedding"], position)
        out = L.layer_norm(params["norm"], emb_f + emb_p)
        out, _ = L.encoder_block(
            params["image_encoder"], out, num_heads=cfg.encode_num_heads,
            dropout_rate=cfg.dropout,
            attention_dropout=cfg.attention_dropout, non_pad_mask=non_pad,
            attention_mask=pair_mask, rng=rngs[0],
            deterministic=deterministic, use_pallas=use_pallas,
            need_weights=False)
        d = out.shape[-1]
        emb_feature = out[:, 1, :].reshape(b, s, d)
        emb_position = emb_p[:, 1, :].reshape(b, s, d)
        output = emb_feature + emb_position
    else:
        emb_f = L.linear(params["feature_embedding"], object_features)
        if cfg.split_position:
            emb_p = L.linear(params["position_embedding"],
                             position_features[:, :, :4])
            emb_o = L.linear(params["object_embedding"],
                             position_features[:, :, 4:])
            output = emb_f + emb_p + emb_o
        else:
            emb_p = L.linear(params["position_embedding"], position_features)
            output = emb_f + emb_p

    # the shared norm applies in every path (model.py:309)
    output = L.layer_norm(params["norm"], output)

    b, s = position_features.shape[0], position_features.shape[1]
    non_pad = M.non_pad_mask_from_features(position_features)
    # encoder-mask quirk: key-pad OR *causal* over object slots
    # (model.py:311-319)
    self_mask = M.combine_masks(
        M.key_pad_mask_from_features(position_features, s),
        M.subsequent_mask(b, s))

    attentions = []
    for i, block in enumerate(params["blocks"]):
        if cfg.encode_mask:
            output, attn = L.encoder_block(
                block, output, num_heads=cfg.encode_num_heads,
                dropout_rate=cfg.dropout,
                attention_dropout=cfg.attention_dropout, non_pad_mask=non_pad,
                attention_mask=self_mask, rng=rngs[1 + i],
                deterministic=deterministic, use_pallas=use_pallas,
                need_weights=need_weights)
        else:
            output, attn = L.encoder_block(
                block, output, num_heads=cfg.encode_num_heads,
                dropout_rate=cfg.dropout,
                attention_dropout=cfg.attention_dropout, rng=rngs[1 + i],
                deterministic=deterministic, use_pallas=use_pallas,
                need_weights=need_weights)
        attentions.append(attn)
    return output, attentions


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def init_decoder(key, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 4 + cfg.decode_num_blocks)
    d = cfg.decode_input_size
    p: Params = {
        "word_embedding": L.init_embedding(keys[0], cfg.num_vocab,
                                           cfg.dim_word_embedding,
                                           pad_idx=cfg.pad_idx),
        "word_embedding_linear": L.init_linear(
            keys[1], cfg.dim_word_embedding, d, bias=False),
        "norm": L.init_layer_norm(d),
        "blocks": [
            L.init_decoder_block(keys[4 + i], d, cfg.decode_hidden_size,
                                 cfg.decode_num_heads, cfg.decode_q_k_dim,
                                 cfg.decode_v_dim)
            for i in range(cfg.decode_num_blocks)
        ],
    }
    if cfg.move_first_image_feature:
        k1, k2 = jax.random.split(keys[2])
        p["move_ffn"] = {
            "w1": {"kernel": L.normal_fan_sum(k1, d, cfg.decode_hidden_size),
                   "bias": L.torch_default_bias(
                       jax.random.fold_in(k1, 1), d, cfg.decode_hidden_size)},
            "w2": {"kernel": L.normal_fan_sum(k2, cfg.decode_hidden_size, d),
                   "bias": L.torch_default_bias(
                       jax.random.fold_in(k2, 1), cfg.decode_hidden_size, d)},
            "norm": L.init_layer_norm(d),
        }
    return p


def _decoder_pos_table(cfg: ModelConfig) -> jnp.ndarray:
    # Decoder-internal max_length = caption slots - 1 (model.py:383)
    return L.sinusoid_table(cfg.max_length - 1, cfg.decode_input_size)


def _embed_tokens(params: Params, cfg: ModelConfig,
                  caption: jnp.ndarray, position_offset: int = 0):
    """word embed -> bias-free linear -> +sinusoid -> LayerNorm
    (model.py:432-436)."""
    x = L.embedding(params["word_embedding"], caption)
    x = L.linear(params["word_embedding_linear"],
                 x.astype(compute_dtype(cfg)))
    table = _decoder_pos_table(cfg).astype(x.dtype)
    t = caption.shape[-1]
    x = x + jax.lax.dynamic_slice_in_dim(table, position_offset, t, axis=0)
    return L.layer_norm(params["norm"], x)


def _move_first_image_feature(params: Params, cfg: ModelConfig,
                              decode_output, encode_output, *,
                              rng=None, deterministic=True):
    """Tail FFN adding encoder slot 0 to every position (model.py:451-457)."""
    p = params["move_ffn"]
    first = encode_output[:, :1]
    h = jax.nn.relu(L.linear(p["w1"], decode_output + first))
    h = L.linear(p["w2"], h)
    h = _dropout(h, cfg.dropout, rng, deterministic)
    return L.layer_norm(p["norm"], h + decode_output)


def decoder_apply(params: Params, cfg: ModelConfig,
                  caption_vector: jnp.ndarray,
                  encode_output: jnp.ndarray, *,
                  context_attention_mask: Optional[jnp.ndarray] = None,
                  rng: Optional[jax.Array] = None,
                  deterministic: bool = True,
                  use_pallas: bool = False,
                  need_weights: bool = False):
    """Full-sequence decoder (training path), model.py:419-459.

    caption_vector [B, T] int32 -> ([B, T, D], self_attn, cross_attn).
    """
    n_rngs = cfg.decode_num_blocks + 1
    rngs = (jax.random.split(rng, n_rngs) if rng is not None
            else [None] * n_rngs)

    b, t = caption_vector.shape
    non_pad = M.non_pad_mask_from_tokens(caption_vector, cfg.pad_idx)
    self_mask = M.combine_masks(
        M.key_pad_mask_from_tokens(caption_vector, t, cfg.pad_idx),
        M.subsequent_mask(b, t))

    x = _embed_tokens(params, cfg, caption_vector)

    self_attn = cross_attn = None
    for i, block in enumerate(params["blocks"]):
        x, self_attn, cross_attn = L.decoder_block(
            block, x, encode_output, num_heads=cfg.decode_num_heads,
            dropout_rate=cfg.dropout,
            attention_dropout=cfg.attention_dropout, non_pad_mask=non_pad,
            self_attention_mask=self_mask,
            context_attention_mask=context_attention_mask,
            rng=rngs[i], deterministic=deterministic,
            use_pallas=use_pallas, need_weights=need_weights)

    if cfg.move_first_image_feature:
        x = _move_first_image_feature(params, cfg, x, encode_output,
                                      rng=rngs[-1],
                                      deterministic=deterministic)
    return x, self_attn, cross_attn


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def init_captioner(key, cfg: ModelConfig) -> Params:
    k_enc, k_dec, k_cls = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(k_enc, cfg),
        "decoder": init_decoder(k_dec, cfg),
        # classifier: xavier_normal weight + torch-default bias
        # (model.py:68-69)
        "classifier": {
            "kernel": L.normal_fan_sum(k_cls, cfg.decode_input_size,
                                       cfg.num_vocab),
            "bias": L.torch_default_bias(jax.random.fold_in(k_cls, 1),
                                         cfg.decode_input_size,
                                         cfg.num_vocab),
        },
    }


def captioner_logits(params: Params, cfg: ModelConfig,
                     object_features, position_features, target_caption, *,
                     rng: Optional[jax.Array] = None,
                     deterministic: bool = True,
                     use_pallas: bool = False) -> jnp.ndarray:
    """Teacher-forced forward: logits over ``target[:, :-1]``
    (model.py:79-93, model_RL.py:75-90).  Returns [B, T-1, V]."""
    enc_rng = dec_rng = None
    if rng is not None:
        enc_rng, dec_rng = jax.random.split(rng)

    input_caption = target_caption[:, :-1].astype(jnp.int32)
    context_mask = M.key_pad_mask_from_features(position_features,
                                                input_caption.shape[1])
    dtype = compute_dtype(cfg)
    encode_output, _ = encoder_apply(
        params["encoder"], cfg, object_features.astype(dtype),
        position_features.astype(dtype),
        rng=enc_rng, deterministic=deterministic, use_pallas=use_pallas)
    decode_output, _, _ = decoder_apply(
        params["decoder"], cfg, input_caption, encode_output,
        context_attention_mask=context_mask, rng=dec_rng,
        deterministic=deterministic, use_pallas=use_pallas)
    # logits in f32 for a stable softmax/loss
    return L.linear(params["classifier"],
                    decode_output.astype(jnp.float32))


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray,
                             pad_idx: int = 0) -> jnp.ndarray:
    """torch CrossEntropyLoss(ignore_index=pad, reduction='mean'):
    sum of per-token NLL over non-pad targets / count of non-pad targets."""
    v = logits.shape[-1]
    logits2 = logits.reshape(-1, v)
    tgt = targets.reshape(-1)
    logp = jax.nn.log_softmax(logits2, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    keep = (tgt != pad_idx).astype(logits2.dtype)
    return jnp.sum(nll * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def focal_loss_from_ce(ce_mean: jnp.ndarray,
                       gamma: float = 2.0) -> jnp.ndarray:
    """The reference computes focal loss on the *scalar mean* CE
    (loss.py:20-28): pt = exp(-CE); (1-pt)^gamma * CE."""
    pt = jnp.exp(-ce_mean)
    return (1.0 - pt) ** gamma * ce_mean


def captioner_xe_loss(params: Params, cfg: ModelConfig,
                      object_features, position_features, target_caption, *,
                      rng: Optional[jax.Array] = None,
                      deterministic: bool = True,
                      use_pallas: bool = False) -> Dict[str, jnp.ndarray]:
    """XE / focal training loss (model.py:79-98)."""
    logits = captioner_logits(params, cfg, object_features,
                              position_features, target_caption,
                              rng=rng, deterministic=deterministic,
                              use_pallas=use_pallas)
    targets = target_caption[:, 1:].astype(jnp.int32)
    ce = cross_entropy_ignore_pad(logits, targets, cfg.pad_idx)
    if cfg.xe_loss == "focal":
        return {"loss": focal_loss_from_ce(ce, cfg.focal_gamma)}
    return {"loss": ce}
