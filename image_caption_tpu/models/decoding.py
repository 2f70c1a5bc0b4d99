"""KV-cached caption decoding: greedy (lax.scan) and vectorized beam search.

The reference re-runs the FULL decoder over the whole growing prefix at every
step (greedy: model.py:101-132; beam: model.py:135-200 with a Python loop per
beam).  Here decoding is a single compiled ``lax.scan`` over a KV cache with
static shapes — O(T) instead of O(T^2) decoder work, no per-step dispatch,
and the beam dimension is vectorized instead of looped.

Output parity: token-for-token identical to the reference's decode rules —
  * greedy: argmax over softmax(classifier(h_t)) (model.py:125-128);
  * beam: scores accumulate raw softmax probabilities for the XE model
    (model.py:183) and log-probabilities for the RL policy (model_RL.py:72,182),
    no EOS early exit, return beam 0 (model.py:200);
  * pad-token quirks: key-pad masking over generated pads and non-pad
    zeroing of block outputs (model.py:421,461-486).
Cross-attention k/v are projected once per sequence (the reference recomputes
them every step for every layer).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig, START_IDX
from ..ops.attention import masked_softmax
from . import layers as L
from .captioner import (_decoder_pos_table, _move_first_image_feature,
                        encoder_apply)

Params = Dict


class DecodeCache(NamedTuple):
    """Per-layer self-attention KV cache + key-validity mask."""
    k: Tuple[jnp.ndarray, ...]        # each [B, H, T, dh_k]
    v: Tuple[jnp.ndarray, ...]        # each [B, H, T, dh_v]
    valid: jnp.ndarray                # [B, T] bool — key was a non-pad token


def init_cache(cfg: ModelConfig, batch: int,
               dtype=jnp.float32) -> DecodeCache:
    t = cfg.max_length - 1            # decoder-internal positions
    h = cfg.decode_num_heads
    dh_k = cfg.decode_q_k_dim // h
    dh_v = cfg.decode_v_dim // h
    n = cfg.decode_num_blocks
    return DecodeCache(
        k=tuple(jnp.zeros((batch, h, t, dh_k), dtype) for _ in range(n)),
        v=tuple(jnp.zeros((batch, h, t, dh_v), dtype) for _ in range(n)),
        valid=jnp.zeros((batch, t), dtype=bool),
    )


def precompute_cross_kv(params: Params, cfg: ModelConfig,
                        encode_output: jnp.ndarray):
    """Project encoder output to per-layer cross k/v once per sequence."""
    h = cfg.decode_num_heads
    ks, vs = [], []
    for block in params["blocks"]:
        p = block["cross_attn"]
        k = L.linear(p["k"], encode_output)
        v = L.linear(p["v"], encode_output)
        b, lk, _ = k.shape
        ks.append(k.reshape(b, lk, h, -1).transpose(0, 2, 1, 3))
        vs.append(v.reshape(b, lk, h, -1).transpose(0, 2, 1, 3))
    return tuple(ks), tuple(vs)


def _attend(q, k, v, neg_mask, temperature):
    """q [B,H,1,dh] x k/v [B,H,T,dh]; neg_mask bool [B,1,T] True=masked.
    Returns (out [B,H,1,dh], weights [B,H,1,T])."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q / temperature, k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(neg_mask[:, None, :, :], -jnp.inf, scores)
    attn = masked_softmax(scores)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out, attn


def _mha_step_self(p: Params, x, cache_k, cache_v, pos, valid, *,
                   num_heads: int):
    """Single-query self-attention against the cache (post-norm residual)."""
    b = x.shape[0]
    q = L.linear(p["q"], x).reshape(b, 1, num_heads, -1).transpose(0, 2, 1, 3)
    k_new = L.linear(p["k"], x).reshape(b, 1, num_heads, -1)
    v_new = L.linear(p["v"], x).reshape(b, 1, num_heads, -1)
    cache_k = jax.lax.dynamic_update_slice_in_dim(
        cache_k, k_new.transpose(0, 2, 1, 3), pos, axis=2)
    cache_v = jax.lax.dynamic_update_slice_in_dim(
        cache_v, v_new.transpose(0, 2, 1, 3), pos, axis=2)

    t = cache_k.shape[2]
    # key is masked if it's a pad token OR beyond the current position
    pos_ids = jnp.arange(t)[None, :]
    neg_mask = jnp.logical_or(~valid, pos_ids > pos)[:, None, :]

    temperature = math.sqrt(q.shape[-1])
    out, _ = _attend(q, cache_k, cache_v, neg_mask, temperature)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, -1)
    out = L.linear(p["joint"], out)
    out = L.layer_norm(p["norm"], out + x)
    return out, cache_k, cache_v


def _mha_step_cross(p: Params, x, k, v, cross_neg_mask, *, num_heads: int):
    b = x.shape[0]
    q = L.linear(p["q"], x).reshape(b, 1, num_heads, -1).transpose(0, 2, 1, 3)
    temperature = math.sqrt(q.shape[-1])
    out, attn = _attend(q, k, v, cross_neg_mask, temperature)
    out = out.transpose(0, 2, 1, 3).reshape(b, 1, -1)
    out = L.linear(p["joint"], out)
    out = L.layer_norm(p["norm"], out + x)
    return out, attn


def decoder_step(params: Params, cfg: ModelConfig, token: jnp.ndarray,
                 pos, cache: DecodeCache, cross_kv, cross_neg_mask,
                 encode_output: jnp.ndarray):
    """One decode step.  token [B] int32, pos scalar int32.

    Returns (logits [B, V], new_cache, cross_attn [B, H, Lk] of last block).
    """
    dec = params["decoder"]
    b = token.shape[0]
    is_word = token != cfg.pad_idx
    valid = jax.lax.dynamic_update_slice_in_dim(
        cache.valid, is_word[:, None], pos, axis=1)

    dtype = encode_output.dtype
    x = L.embedding(dec["word_embedding"], token[:, None]).astype(dtype)
    x = L.linear(dec["word_embedding_linear"], x)
    table = _decoder_pos_table(cfg).astype(dtype)
    x = x + jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)
    x = L.layer_norm(dec["norm"], x)

    nonpad = is_word[:, None, None].astype(x.dtype)
    cross_k, cross_v = cross_kv
    new_k, new_v = [], []
    cross_attn = None
    for i, block in enumerate(dec["blocks"]):
        x, ck, cv = _mha_step_self(block["self_attn"], x, cache.k[i],
                                   cache.v[i], pos, valid,
                                   num_heads=cfg.decode_num_heads)
        new_k.append(ck)
        new_v.append(cv)
        x, cross_attn = _mha_step_cross(block["cross_attn"], x, cross_k[i],
                                        cross_v[i], cross_neg_mask,
                                        num_heads=cfg.decode_num_heads)
        x = L.ffn(block["ffn"], x, dropout_rate=0.0, deterministic=True)
        # non-pad zeroing of the current row (model.py:444,203-204)
        x = x * nonpad

    if cfg.move_first_image_feature:
        # the tail FFN is NOT non-pad zeroed (model.py:451-457 runs after
        # the blocks' zeroing)
        x = _move_first_image_feature(params["decoder"], cfg, x,
                                      encode_output, deterministic=True)

    logits = L.linear(params["classifier"], x[:, 0].astype(jnp.float32))
    new_cache = DecodeCache(k=tuple(new_k), v=tuple(new_v), valid=valid)
    return logits, new_cache, cross_attn[:, :, 0, :]


# ---------------------------------------------------------------------------
# Greedy decode
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "use_pallas", "return_attention"))
def greedy_decode(params: Params, cfg: ModelConfig,
                  object_features: jnp.ndarray,
                  position_features: jnp.ndarray, *,
                  use_pallas: bool = False,
                  return_attention: bool = False):
    """Replaces model.py:101-132.  Returns (tokens [B, max_length+1],
    attention [steps, B, S] or None).

    attention[t] = mean over heads of the last block's cross-attention at
    step t (model.py:123) — used by the demo overlay.
    """
    encode_output, _ = encoder_apply(params["encoder"], cfg, object_features,
                                     position_features, deterministic=True,
                                     use_pallas=use_pallas)
    b = encode_output.shape[0]
    cross_kv = precompute_cross_kv(params["decoder"], cfg, encode_output)
    cross_neg_mask = jnp.all(position_features == 0, axis=-1)[:, None, :]

    tokens0 = jnp.zeros((b, cfg.max_length + 1), jnp.int32)
    tokens0 = tokens0.at[:, 0].set(START_IDX)
    cache0 = init_cache(cfg, b, object_features.dtype)

    def body(carry, t):
        tokens, cache = carry
        token_t = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=1)[:, 0]
        logits, cache, cross_attn = decoder_step(
            params, cfg, token_t, t, cache, cross_kv, cross_neg_mask,
            encode_output)
        # softmax -> argmax == argmax(logits) (model.py:126-128)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice_in_dim(
            tokens, nxt[:, None], t + 1, axis=1)
        attn_mean = jnp.mean(cross_attn, axis=1)      # [B, S]
        return (tokens, cache), attn_mean

    (tokens, _), attn = jax.lax.scan(
        body, (tokens0, cache0), jnp.arange(cfg.max_length - 1))
    return tokens, (attn if return_attention else None)


# ---------------------------------------------------------------------------
# Beam search
# ---------------------------------------------------------------------------

class BeamCache(NamedTuple):
    """Gather-free beam state: K/V stay where they were written; beam
    reordering touches only the small ancestry/validity/token arrays.

    A naive beam step reorders every layer's [B*K, H, T, dh] cache each
    iteration — ~400 MB of HBM traffic per step that dominates the whole
    decode on TPU.  Here each beam slot keeps appending to its own cache
    lane and ``ancestry[b, n, τ]`` records which lane wrote position τ of
    beam n's current hypothesis; self-attention scores against ALL lanes'
    keys and masks to the ancestor lane (K× extra MACs on tiny tensors —
    free next to the saved bandwidth)."""
    k: Tuple[jnp.ndarray, ...]        # each [B, H, K, T, dh_k]
    v: Tuple[jnp.ndarray, ...]        # each [B, H, K, T, dh_v]
    ancestry: jnp.ndarray             # [B, K, T] int32 — writing lane per pos
    valid: jnp.ndarray                # [B, K, T] bool — non-pad token at pos


def _mha_step_self_beam(p: Params, x, cache_k, cache_v, pos, allowed, *,
                        num_heads: int, batch: int, k: int):
    """Beam self-attention against all lanes.

    x [B*K, 1, D]; cache_k/v [B, H, Kl, T, dh] (head-major so the lane
    scan is a clean [B*H]-batched matmul over the flattened (lane, pos)
    key axis — no per-step cache relayout); allowed [B, K, Kl, T] bool.
    Returns (out [B*K, 1, D], new cache_k, new cache_v)."""
    h = num_heads
    t_total = cache_k.shape[3]
    q = L.linear(p["q"], x).reshape(batch, k, h, -1).transpose(0, 2, 1, 3)
    # new k/v: [B, H, K, 1, dh] — every lane writes its own entry at `pos`
    k_new = L.linear(p["k"], x).reshape(batch, k, h, 1, -1).transpose(
        0, 2, 1, 3, 4)
    v_new = L.linear(p["v"], x).reshape(batch, k, h, 1, -1).transpose(
        0, 2, 1, 3, 4)
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, k_new.astype(cache_k.dtype), (0, 0, 0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, v_new.astype(cache_v.dtype), (0, 0, 0, pos, 0))

    temperature = math.sqrt(q.shape[-1])
    keys = cache_k.reshape(batch, h, k * t_total, -1)         # [B,H,MT,dh]
    vals = cache_v.reshape(batch, h, k * t_total, -1)
    scores = jnp.einsum("bhnd,bhkd->bhnk", q / temperature,
                        keys.astype(q.dtype),
                        preferred_element_type=jnp.float32)   # [B,H,K,MT]
    mask = allowed.reshape(batch, 1, k, k * t_total)
    scores = jnp.where(mask, scores, -jnp.inf)
    attn = masked_softmax(scores)
    out = jnp.einsum("bhnk,bhkd->bhnd", attn, vals.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(batch * k, 1, -1)
    out = L.linear(p["joint"], out)
    out = L.layer_norm(p["norm"], out + x)
    return out, cache_k, cache_v


def decoder_step_beam(params: Params, cfg: ModelConfig,
                      token: jnp.ndarray, pos, cache: BeamCache,
                      cross_kv, cross_neg_mask, encode_output):
    """One decode step over [B, K] beams without cache reordering."""
    dec = params["decoder"]
    b, k = token.shape
    flat_token = token.reshape(b * k)
    is_word = flat_token != cfg.pad_idx

    # this step writes lane n at position `pos`
    lane = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :, None],
                            (b, k, 1))
    ancestry = jax.lax.dynamic_update_slice(cache.ancestry, lane,
                                            (0, 0, pos))
    valid = jax.lax.dynamic_update_slice(
        cache.valid, is_word.reshape(b, k, 1), (0, 0, pos))

    t_total = cache.valid.shape[-1]
    pos_ids = jnp.arange(t_total)
    # beam n may attend lane m at τ iff m wrote τ for n, τ <= pos, non-pad
    allowed = (ancestry[:, :, None, :] ==
               jnp.arange(k, dtype=jnp.int32)[None, None, :, None])
    allowed &= (pos_ids <= pos)[None, None, None, :]
    allowed &= valid[:, :, None, :]

    dtype = encode_output.dtype
    x = L.embedding(dec["word_embedding"],
                    flat_token[:, None]).astype(dtype)
    x = L.linear(dec["word_embedding_linear"], x)
    table = _decoder_pos_table(cfg).astype(dtype)
    x = x + jax.lax.dynamic_slice_in_dim(table, pos, 1, axis=0)
    x = L.layer_norm(dec["norm"], x)

    nonpad = is_word[:, None, None].astype(x.dtype)
    cross_k, cross_v = cross_kv
    new_k, new_v = [], []
    for i, block in enumerate(dec["blocks"]):
        x, ck, cv = _mha_step_self_beam(
            block["self_attn"], x, cache.k[i], cache.v[i], pos, allowed,
            num_heads=cfg.decode_num_heads, batch=b, k=k)
        new_k.append(ck)
        new_v.append(cv)
        x, _ = _mha_step_cross(block["cross_attn"], x, cross_k[i],
                               cross_v[i], cross_neg_mask,
                               num_heads=cfg.decode_num_heads)
        x = L.ffn(block["ffn"], x, dropout_rate=0.0, deterministic=True)
        x = x * nonpad

    if cfg.move_first_image_feature:
        x = _move_first_image_feature(params["decoder"], cfg, x,
                                      encode_output, deterministic=True)

    logits = L.linear(params["classifier"], x[:, 0].astype(jnp.float32))
    new_cache = BeamCache(k=tuple(new_k), v=tuple(new_v),
                          ancestry=ancestry, valid=valid)
    return logits.reshape(b, k, -1), new_cache


def topk_exact_2level(x: jnp.ndarray, k: int, chunk: int = 128):
    """Exact top-k over the last axis via chunked maxima.

    ``jax.lax.top_k`` on TPU sorts the whole axis — on a [B*K, 12k-vocab]
    tensor that sort is ~90% of the entire beam-decode runtime.  Exactness
    argument: with c = the k-th largest value, every chunk containing one of
    the top-k values has max >= c, and there are at most k values >= c, so
    those chunks are among the top-k chunks ranked by max.  Reducing to
    per-chunk maxima (one streaming pass) plus two tiny top_ks replaces the
    big sort.  Returns (values, indices) sorted descending.

    Tie behavior matches ``lax.top_k`` exactly (lowest index wins among
    equal values) — load-bearing for beam parity on tie-heavy rows
    (zero-padded batch items, duplicated images).  Two ingredients:
    (1) chunk selection via ``lax.top_k`` over the chunk maxima inherits
    its ascending-index tie rule, so when tied chunks compete at the k-th
    slot the LOWER-index chunk (holding the lower global index of the
    tied value) is kept — a counting argument shows the k selected chunks
    always contain the k lax-chosen entries; (2) the selected chunks are
    re-sorted into ASCENDING chunk order before the candidate top_k, so
    candidate position order equals global index order and the final tie
    break lands on the lowest global index, exactly like the full sort.
    (Without (2), candidates concatenate in chunk-max rank order and a
    value tied across chunks resolves to the higher-max chunk's instance
    — e.g. x[5]=5, x[300]=9, x[301]=5, k=2 returned 301 where lax.top_k
    returns 5.)  Caveat: -inf INPUT values can tie with the -inf padding
    of the last partial chunk and return out-of-range (>= v) indices —
    callers must keep inputs finite (the beam does: it ranks raw
    classifier logits, never masked ones)."""
    v = x.shape[-1]
    n_chunks = -(-v // chunk)
    if n_chunks < k or v <= 2 * chunk:
        return jax.lax.top_k(x, k)        # small axis: sort directly
    pad = n_chunks * chunk - v
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
    xr = x.reshape(*x.shape[:-1], n_chunks, chunk)
    cmax = jnp.max(xr, axis=-1)                        # [.., n_chunks]
    _, cidx = jax.lax.top_k(cmax, k)                   # [.., k]
    cidx = jnp.sort(cidx, axis=-1)                     # tie rule (2) above
    cand = jnp.take_along_axis(xr, cidx[..., None], axis=-2)
    cand = cand.reshape(*x.shape[:-1], k * chunk)
    vals, flat = jax.lax.top_k(cand, k)
    ch = jnp.take_along_axis(cidx, flat // chunk, axis=-1)
    idx = ch * chunk + flat % chunk
    return vals, idx.astype(jnp.int32)


def _reindex_small(x: jnp.ndarray, beam_idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis over the beam dim for the small per-beam state
    (ancestry / valid / tokens / scores) — KBs, not MBs."""
    idx = beam_idx.reshape(*beam_idx.shape, *([1] * (x.ndim - 2)))
    return jnp.take_along_axis(x, idx, axis=1)


def beam_score_mode(caption_model: str) -> str:
    """The reference's two models score beams DIFFERENTLY: the XE
    ``Transformer`` accumulates softmax probabilities (model.py:183)
    while ``PolicyNetwork`` accumulates log-probs (model_RL.py:157,182 —
    ``self.softmax = nn.LogSoftmax``).  All decode wiring keys the mode
    on CAPTION_MODEL for parity.  Unknown model names fail loudly here
    rather than silently decoding in the wrong mode (the bug this mapping
    exists to prevent)."""
    if caption_model not in ("Transformer", "RL_Transformer"):
        # a raise, not an assert: asserts vanish under `python -O`, which
        # would silently decode unknown models in prob mode
        raise ValueError(
            f"unknown CAPTION_MODEL {caption_model!r} (core/config.py:13-14)")
    return "logprob" if caption_model == "RL_Transformer" else "prob"


@partial(jax.jit, static_argnames=("cfg", "beam_size", "score_mode",
                                   "use_pallas", "stop_at_end"))
def beam_search(params: Params, cfg: ModelConfig,
                object_features: jnp.ndarray,
                position_features: jnp.ndarray, *,
                beam_size: int,
                score_mode: str = "prob",
                use_pallas: bool = False,
                stop_at_end: bool = False) -> jnp.ndarray:
    """Replaces model.py:135-200 / model_RL.py:134-199.

    score_mode 'prob'     — running sum of softmax probabilities
                            (XE model parity, model.py:183);
    score_mode 'logprob'  — running sum of log-probs (RL-policy parity,
                            model_RL.py:72,182 — also the "correct" beam).
    stop_at_end           — clean-mode fix for the reference's missing EOS
                            handling (model.py:169-198): a finished beam
                            (emitted <END>) is frozen — it proposes only
                            <NULL> with probability 1, so its score stops
                            accumulating.  Meaningful with 'logprob'
                            scoring; off by default for reference parity.
    Returns tokens [B, max_length] — the best beam.
    """
    assert score_mode in ("prob", "logprob")
    encode_output, _ = encoder_apply(params["encoder"], cfg, object_features,
                                     position_features, deterministic=True,
                                     use_pallas=use_pallas)
    b, s, d = encode_output.shape
    k = beam_size
    t_total = cfg.max_length - 1

    def scorefn(logits):
        return (jax.nn.softmax(logits, axis=-1) if score_mode == "prob"
                else jax.nn.log_softmax(logits, axis=-1))

    # ---- step 0 on the un-expanded batch (model.py:148-166)
    cross_kv_b = precompute_cross_kv(params["decoder"], cfg, encode_output)
    cross_neg_b = jnp.all(position_features == 0, axis=-1)[:, None, :]
    cache_b = init_cache(cfg, b, object_features.dtype)
    start = jnp.full((b,), START_IDX, jnp.int32)
    logits0, cache_b, _ = decoder_step(params, cfg, start, 0, cache_b,
                                       cross_kv_b, cross_neg_b,
                                       encode_output)
    p0 = scorefn(logits0)
    scores, tok1 = jax.lax.top_k(p0, k)               # [B, K] each

    # ---- beam state: lanes share the step-0 entry (broadcast once)
    def expand(x):
        return jnp.repeat(x, k, axis=0)

    enc_bk = expand(encode_output)
    cross_kv = jax.tree.map(expand, cross_kv_b)
    cross_neg = expand(cross_neg_b)

    cache = BeamCache(
        # greedy cache [B,H,T,dh] -> lane-replicated [B,H,K,T,dh]
        k=tuple(jnp.repeat(x[:, :, None], k, axis=2) for x in cache_b.k),
        v=tuple(jnp.repeat(x[:, :, None], k, axis=2) for x in cache_b.v),
        # position 0 was written identically to every lane; credit lane n
        ancestry=jnp.zeros((b, k, t_total), jnp.int32) + jnp.arange(
            k, dtype=jnp.int32)[None, :, None],
        valid=jnp.broadcast_to(cache_b.valid[:, None], (b, k, t_total)),
    )

    tokens = jnp.zeros((b, k, cfg.max_length), jnp.int32)
    tokens = tokens.at[:, :, 0].set(START_IDX)
    tokens = tokens.at[:, :, 1].set(tok1)

    def body(carry, t):
        tokens, scores, cache = carry
        token_t = jax.lax.dynamic_slice_in_dim(tokens, t, 1, axis=2)[..., 0]
        logits, cache = decoder_step_beam(params, cfg, token_t, t, cache,
                                          cross_kv, cross_neg, enc_bk)
        # top-k directly on logits: softmax/log_softmax are monotonic and
        # the running score is a per-row constant, so the ranking is
        # unchanged — this avoids materializing the [B,K,V] probability
        # tensor (the dominant HBM traffic at large batch).  The top-k
        # VALUES are then normalized with one logsumexp reduction.
        local_l, local_i = topk_exact_2level(logits, k)  # [B, K, K]
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        if score_mode == "prob":
            local_s = jnp.exp(local_l - lse)           # softmax(top-k)
        else:
            local_s = local_l - lse                    # log_softmax(top-k)
        if stop_at_end:
            # frozen beams propose only <NULL> with certainty
            from ..config import END_IDX, NULL_IDX
            finished = (token_t == END_IDX) | \
                       ((token_t == NULL_IDX) & (t > 1))     # [B, K]
            # slot 0 adds nothing (freeze); the duplicate proposals in
            # slots 1.. must never be selected
            certain = jnp.zeros_like(local_s).at[..., 1:].set(-jnp.inf)
            local_s = jnp.where(finished[..., None], certain, local_s)
            local_i = jnp.where(finished[..., None], NULL_IDX, local_i)
        combined = local_s + scores[..., None]
        # two-stage top-k (exact): the global top-K over K*V can only use
        # each beam's own top-K tokens
        new_scores, idx = jax.lax.top_k(combined.reshape(b, k * k), k)
        beam_idx = idx // k
        new_tok = jnp.take_along_axis(
            local_i.reshape(b, k * k), idx, axis=1).astype(jnp.int32)

        # reorder only the small state; K/V lanes stay put
        tokens = _reindex_small(tokens, beam_idx)
        cache = cache._replace(
            ancestry=_reindex_small(cache.ancestry, beam_idx),
            valid=_reindex_small(cache.valid, beam_idx))
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, :, None], (0, 0, t + 1))
        return (tokens, new_scores, cache), None

    (tokens, scores, _), _ = jax.lax.scan(
        body, (tokens, scores, cache), jnp.arange(1, cfg.max_length - 1))
    # beam 0 = highest accumulated score (sorted top_k) — model.py:200
    return tokens[:, 0]
