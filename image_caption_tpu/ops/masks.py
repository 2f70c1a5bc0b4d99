"""Attention mask builders.

Boolean convention matches the reference: ``True`` = *masked out* (the
reference fills ``-inf`` at True positions, modules.py:20-21).

Reference builders:
  * encoder key-pad / non-pad from all-zero feature rows (model.py:334-359)
  * decoder key-pad / non-pad from pad tokens           (model.py:461-486)
  * subsequent (causal, upper-triangular)               (model.py:343-354,470-481)
  * cross-attention key-pad                             (model.py:202-209)
"""

from __future__ import annotations

import jax.numpy as jnp


def key_pad_mask_from_features(k_features: jnp.ndarray,
                               q_len: int) -> jnp.ndarray:
    """[B, Lk, D] -> bool [B, q_len, Lk]; True where the key row is all-zero
    (count_nonzero == 0, model.py:206,338)."""
    pad = jnp.all(k_features == 0, axis=-1)            # [B, Lk]
    return jnp.broadcast_to(pad[:, None, :],
                            (pad.shape[0], q_len, pad.shape[1]))


def key_pad_mask_from_tokens(tokens: jnp.ndarray, q_len: int,
                             pad_idx: int = 0) -> jnp.ndarray:
    """[B, Lk] int -> bool [B, q_len, Lk]; True at pad tokens (model.py:465)."""
    pad = tokens == pad_idx
    return jnp.broadcast_to(pad[:, None, :],
                            (pad.shape[0], q_len, pad.shape[1]))


def subsequent_mask(batch: int, length: int) -> jnp.ndarray:
    """Upper-triangular (strictly above diagonal) bool [B, L, L]
    (model.py:346-352)."""
    tri = jnp.triu(jnp.ones((length, length), dtype=bool), k=1)
    return jnp.broadcast_to(tri[None], (batch, length, length))


def non_pad_mask_from_features(features: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D] -> float [B, L, 1]; 1.0 where the row has any nonzero
    (model.py:356-359)."""
    return jnp.any(features != 0, axis=-1, keepdims=True).astype(jnp.float32)


def non_pad_mask_from_tokens(tokens: jnp.ndarray,
                             pad_idx: int = 0) -> jnp.ndarray:
    """[B, L] -> float [B, L, 1] (model.py:483-486)."""
    return (tokens != pad_idx)[..., None].astype(jnp.float32)


def combine_masks(*masks: jnp.ndarray) -> jnp.ndarray:
    """(key_pad + subsequent).gt(0) — boolean OR (model.py:317-319,428-430)."""
    out = masks[0]
    for m in masks[1:]:
        out = jnp.logical_or(out, m)
    return out
