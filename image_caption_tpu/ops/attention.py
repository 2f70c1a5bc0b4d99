"""Scaled dot-product attention: XLA path + fused Pallas TPU kernel.

Semantics match the reference (modules.py:6-27):
``softmax(q/temperature @ k^T  masked_fill -inf)``, optional dropout on the
attention weights, then ``@ v``.  Returns ``(output, attention_weights)``.

Two execution paths:
  * ``_attention_xla``   — plain jnp ops; used whenever attention weights
    are consumed (demo overlays) or attention dropout is active.
  * ``fused_attention``  — single-pass fused Pallas kernel (scores, mask,
    softmax, weighted sum in VMEM; one HBM round-trip) with a custom VJP
    whose backward is also one kernel.

Scope (measured, r3): the kernel's win is the DECODE path (it carries the
beam-3 headline, docs/performance.md).  On the training path it is
differentiable but (a) the parity configs train with
``attention_dropout=0.1`` (config.py DROPOUT block; reference
modules.py:8), which the kernel does not implement — dropout inside the
fused kernel needs the pltpu PRNG, which this environment cannot iterate
on (no interpret-mode support, ~6 min blind TPU compiles) — and
(b) with attention dropout OFF the measured train-step delta at the
flagship shape (rep-delta, B=32, fwd+bwd) is XLA ~10.1 ms vs Pallas
~9.1 ms — inside tunnel noise.  The custom VJP therefore stays available
for dropout-free training and as long-sequence headroom, not as a
train-step optimization.

Shapes: q [B, H, Lq, Dh], k/v [B, H, Lk, Dh], mask bool [B, Lq, Lk]
(True = masked).
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")

logger = logging.getLogger(__name__)


def dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array],
            deterministic: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-p) in training)."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def masked_softmax(scores: jnp.ndarray) -> jnp.ndarray:
    """Stable softmax tolerant of fully-masked (-inf) rows.

    ``jax.nn.softmax`` produces NaN (and NaN gradients) when an entire row
    is -inf; fully-masked rows arise from zero-padded batch items and
    pad-token queries.  Such rows come out as all-zero attention."""
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    unnorm = jnp.exp(scores - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-30)


def _attention_xla(q, k, v, mask, temperature, *,
                   dropout_rate=0.0, rng=None, deterministic=True):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q / temperature, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], _NEG_INF, scores)
        attn = masked_softmax(scores)
    else:
        attn = jax.nn.softmax(scores, axis=-1)
    attn_dropped = dropout(attn, dropout_rate, rng, deterministic)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn_dropped, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype), attn


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------

def _fused_attention_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref,
                            *, temperature: float):
    """One batch-item tile with ALL heads: [H, Lq, Dh] x [H, Lk, Dh] fits
    in VMEM for caption-scale shapes (H*L*Dh is a few hundred KB).

    Earlier revision tiled the grid as (batch, heads) — at B=128, H=32
    that is 4096 sequential grid steps of trivially small work, and the
    per-step overhead made the kernel ~2.7x slower than XLA's fused
    attention.  Batching heads into the tile (grid = batch only) does the
    per-head matmuls as one 3-D dot_general on the MXU."""
    q = q_ref[0]                                     # [H, Lq, Dh]
    k = k_ref[0]                                     # [H, Lk, Dh]
    v = v_ref[0]                                     # [H, Lk, Dh]
    scores = jax.lax.dot_general(
        q.astype(jnp.float32) * (1.0 / temperature), k.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [H, Lq, Lk]
    masked = (mask_ref[0] != 0)[None]                # [1, Lq, Lk]
    scores = jnp.where(masked, _NEG_INF, scores)
    # Numerically-stable softmax on the VPU.
    m = jnp.max(scores, axis=-1, keepdims=True)
    # Guard fully-masked rows (max = -inf) so exp doesn't produce NaN*0.
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(scores - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    p = p / denom
    out_ref[0] = jax.lax.dot_general(
        p, v.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# Custom-VJP fused attention (training path)
# ---------------------------------------------------------------------------

def _attention_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, *, temperature: float):
    """Flash-style backward for one batch-item tile (all heads): recompute
    P in VMEM (cheaper than saving it), then per head
      dV = P^T dO;  dP = dO V^T;  dS = P * (dP - rowsum(dP*P));
      dQ = dS K / temp;  dK = dS^T Q / temp.
    """
    f32 = jnp.float32
    q = q_ref[0].astype(f32)                             # [H, Lq, Dh]
    k = k_ref[0].astype(f32)
    v = v_ref[0].astype(f32)
    do = do_ref[0].astype(f32)
    inv_t = 1.0 / temperature

    scores = jax.lax.dot_general(
        q * inv_t, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                      # [H, Lq, Lk]
    masked = (mask_ref[0] != 0)[None]
    scores = jnp.where(masked, _NEG_INF, scores)
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom                                        # [H, Lq, Lk]

    dv_ref[0] = jax.lax.dot_general(
        p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32)                      # [H, Lq, Lk]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32) * inv_t).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32) * inv_t).astype(dk_ref.dtype)


def _pallas_specs(h, lq, lk, dh):
    qspec = pl.BlockSpec((1, h, lq, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, h, lk, dh), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, lq, lk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, kspec, mspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention(q, k, v, mask_i8, temperature):
    """Differentiable fused attention (no dropout, no weight output).

    q [B,H,Lq,Dh], k/v [B,H,Lk,Dh], mask_i8 int8 [B,Lq,Lk] (nonzero =
    masked).  Forward and backward are both single-pass Pallas kernels."""
    return _fused_fwd_call(q, k, v, mask_i8, temperature)


def _fused_fwd_call(q, k, v, mask_i8, temperature):
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    qspec, kspec, mspec = _pallas_specs(h, lq, lk, dh)
    return pl.pallas_call(
        functools.partial(_fused_attention_kernel, temperature=temperature),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, dh), q.dtype),
        grid=(b,),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=qspec,
    )(q, k, v, mask_i8)


def _fused_fwd(q, k, v, mask_i8, temperature):
    return _fused_fwd_call(q, k, v, mask_i8, temperature), (q, k, v, mask_i8)


def _fused_bwd(temperature, residuals, g):
    q, k, v, mask_i8 = residuals
    b, h, lq, dh = q.shape
    lk = k.shape[2]
    qspec, kspec, mspec = _pallas_specs(h, lq, lk, dh)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attention_bwd_kernel, temperature=temperature),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        grid=(b,),
        in_specs=[qspec, kspec, kspec, mspec, qspec],
        out_specs=(qspec, kspec, kspec),
    )(q, k, v, mask_i8, g)
    return dq, dk, dv, None


fused_attention.defvjp(_fused_fwd, _fused_bwd)


_PALLAS_OK: Optional[bool] = None


def pallas_available() -> bool:
    """One-time startup probe of the fused attention kernel.

    Compiles and executes a tiny fused call on the default backend once per
    process; the verdict is cached and logged.  After a successful probe
    the dispatch never wraps the real kernel call again, so a genuine
    kernel bug on TPU surfaces as an error instead of silently degrading
    to the XLA path."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        if jax.default_backend() in ("cpu", "gpu"):
            # pallas TPU kernels don't lower on cpu/gpu, and the failure
            # surfaces at jit-lowering time where a try/except can't
            # reliably catch it
            _PALLAS_OK = False
            logger.info("attention dispatch: XLA (backend=%s)",
                        jax.default_backend())
        else:
            # the first call usually happens while TRACING a jitted caller;
            # the probe must execute eagerly, outside that trace.  JAX's
            # trace stack is thread-local, so a fresh thread always has a
            # clean (eager) context.
            import threading
            result: dict = {}

            def _probe():
                try:
                    z = jnp.zeros((1, 1, 8, 128), jnp.float32)
                    m = jnp.zeros((1, 8, 8), jnp.int8)
                    # np.asarray: force the device fetch
                    # (block_until_ready is unreliable over tunneled
                    # backends)
                    np.asarray(fused_attention(z, z, z, m, 1.0))
                    result["ok"] = True
                except Exception as exc:   # probe failure only
                    result["ok"] = False
                    result["exc"] = exc

            t = threading.Thread(target=_probe, name="pallas-probe")
            t.start()
            t.join()
            _PALLAS_OK = bool(result.get("ok"))
            if _PALLAS_OK:
                logger.info("attention dispatch: fused Pallas kernel")
            else:
                exc = result.get("exc")
                logger.warning(
                    "fused Pallas attention failed its startup probe "
                    "(%s: %s); using the XLA attention path",
                    type(exc).__name__, exc)
    return _PALLAS_OK


def sdp_attention(q, k, v, mask, temperature, *,
                  dropout_rate: float = 0.0,
                  rng: Optional[jax.Array] = None,
                  deterministic: bool = True,
                  use_pallas: bool = False,
                  need_weights: bool = True
                  ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Dispatch between the fused Pallas kernel and the XLA path.

    The fused Pallas path runs whenever attention weights and dropout are
    not required — it is differentiable (custom VJP, backward is also a
    single-pass kernel), so it serves training too.  The path decision is
    made ONCE per process by ``pallas_available`` (probe + log); kernel
    failures after a successful probe propagate.
    """
    dropout_active = (not deterministic and dropout_rate > 0.0
                      and rng is not None)
    if (use_pallas and not need_weights and not dropout_active
            and pallas_available()):
        b, lq = q.shape[0], q.shape[2]
        lk = k.shape[2]
        mask_i8 = (jnp.zeros((b, lq, lk), jnp.int8) if mask is None
                   else mask.astype(jnp.int8))
        return fused_attention(q, k, v, mask_i8, temperature), None
    out, attn = _attention_xla(q, k, v, mask, temperature,
                               dropout_rate=dropout_rate, rng=rng,
                               deterministic=deterministic)
    return out, (attn if need_weights else None)
