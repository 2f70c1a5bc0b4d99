"""Self-critical (SCST-style) composite loss, jit-compatible.

Reproduces ``ReinforcementLearningLoss`` + ``StructureCriterion``
(``/root/reference/core/TRANSFORMER/loss.py:31-155``) as a pure function of
logits, with the string n-gram rewards crossing to the host through
``jax.pure_callback`` — the TPU step stays one compiled program; only the
reward lookup runs on CPU (the reference instead moves *all* loss tensors to
CPU every step, core/models.py:188-191).

Exact reference semantics preserved:
  * sample = argmax of log_softmax over teacher-forced logits
    (model_RL.py:93-97) — behind ``sample_mode='argmax'``;
    ``'categorical'`` gives true SCST sampling;
  * mask = (sequence > 0) shifted right one step with a leading 1 column
    (loss.py:124-125);
  * entropy bonus computed from softmax/log_softmax OF THE LOG-PROBS (a
    reference quirk — loss.py:132 applies them to the already-log-softmaxed
    output) and detached (`.data`);
  * baseline ``(scores.sum(1,keepdim)-scores)/shape[1]`` is identically 0
    for the actual [B, 1] scores (loss.py:140-141) — kept as written;
  * self-CIDEr diversity added per sentence (loss.py:144-148);
  * structure loss = -sum(logprob[sampled] * mask * scores) / sum(mask)
    (loss.py:150-151);
  * total = (1-w) * XE + w * structure, plus the WRITE_LOG keys
    (loss.py:70-74).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.captioner import captioner_logits, cross_entropy_ignore_pad


def make_reward_callback(reward_computer) -> Callable:
    """Wrap a host RewardComputer for use inside jit.

    Returns ``fn(sample_seq [B,T] i32, target_seq [B,T] i32) ->
    (structure [B] f32, self_cider [B] f32)``.
    """
    def host_fn(sample_seq, target_seq):
        # sample_seq [B, N, T]; target [B, T] scored against every sample
        sample_seq = np.asarray(sample_seq)
        target_seq = np.asarray(target_seq)
        b, n, t = sample_seq.shape
        flat = sample_seq.reshape(b * n, t)
        tgt = np.repeat(target_seq, n, axis=0)
        structure = reward_computer.structure_scores(flat, tgt)
        # n>1 (true multi-sample SCST) groups each image's N samples into
        # one diversity gram; n=1 is the reference's per-caption no-op
        self_cider = reward_computer.self_cider_scores(flat, group_size=n)
        return (np.asarray(structure, np.float32).reshape(b, n),
                np.asarray(self_cider, np.float32).reshape(b, n))

    def callback(sample_seq, target_seq):
        b, n = sample_seq.shape[0], sample_seq.shape[1]
        out_shape = (jax.ShapeDtypeStruct((b, n), jnp.float32),
                     jax.ShapeDtypeStruct((b, n), jnp.float32))
        return jax.pure_callback(host_fn, out_shape, sample_seq, target_seq,
                                 vmap_method="sequential")
    return callback


def sample_from_logits(logits: jnp.ndarray, rng: Optional[jax.Array],
                       mode: str, num_samples: int = 1
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sequences [B, N, T], logprobs [B, T, V]) from teacher-forced logits.

    'argmax' reproduces model_RL.py:93-97 (N forced to 1 — repeated argmax
    samples are identical); 'categorical' is true sampling and supports
    N > 1 independent draws per item (the seq_per_img machinery the
    reference stubs at loss.py:158-159,140).
    """
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    if mode == "argmax":
        seq = jnp.argmax(logprobs, axis=-1)[:, None]             # [B,1,T]
    elif mode == "categorical":
        if rng is None:
            # eval paths sample deterministically (fixed key)
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, num_samples)
        seq = jax.vmap(lambda k: jax.random.categorical(k, logits, axis=-1)
                       )(keys)                                    # [N,B,T]
        seq = seq.transpose(1, 0, 2)
    else:
        raise ValueError(mode)
    return seq.astype(jnp.int32), logprobs


def structure_loss(logprobs: jnp.ndarray, sample_seq: jnp.ndarray,
                   rewards: jnp.ndarray, self_cider: jnp.ndarray, *,
                   entropy_weight: float,
                   self_cider_weight: float) -> Dict[str, jnp.ndarray]:
    """loss.py:121-155 on-device, generalized over N samples per item.

    logprobs [B,T,V]; sample_seq [B,N,T]; rewards/self_cider [B,N].
    With N == 1 this is exactly the reference computation (baseline 0);
    with N > 1 the reference's own baseline formula (loss.py:140-141)
    becomes a real leave-in mean baseline over the samples."""
    if sample_seq.ndim == 2:                         # [B,T] -> [B,1,T]
        sample_seq = sample_seq[:, None]
        rewards = rewards[:, None] if rewards.ndim == 1 else rewards
        self_cider = (self_cider[:, None] if self_cider.ndim == 1
                      else self_cider)

    mask = (sample_seq > 0).astype(logprobs.dtype)               # [B,N,T]
    ones = jnp.ones_like(mask[:, :, :1])
    mask = jnp.concatenate([ones, mask[:, :, :-1]], axis=2)      # shifted

    scores = rewards                                             # [B, N]
    reward_out = scores

    if entropy_weight > 0:
        # reference quirk: softmax/log_softmax applied to LOG-PROBS
        # (loss.py:132); detached (.data)
        p = jax.nn.softmax(logprobs, axis=2)
        logp = jax.nn.log_softmax(logprobs, axis=2)
        entropy = -jnp.sum(p * logp, axis=2)                     # [B, T]
        entropy = jax.lax.stop_gradient(entropy)
        entropy = jnp.sum(entropy[:, None] * mask, axis=2) \
            / jnp.sum(mask, axis=2)                              # [B, N]
        scores = scores + entropy_weight * entropy

    gathered = jnp.take_along_axis(
        logprobs[:, None], sample_seq[..., None], axis=3)[..., 0]  # [B,N,T]

    # baseline (loss.py:140-141): zero for N=1; leave-in mean for N>1
    baseline = (jnp.sum(scores, axis=1, keepdims=True) - scores) \
        / scores.shape[1]
    scores = scores - baseline

    if self_cider_weight > 0:
        scores = scores + self_cider_weight * self_cider

    loss = -gathered * mask * scores[..., None]
    loss = jnp.sum(loss) / jnp.sum(mask)
    return {"loss": loss, "reward": jnp.mean(reward_out)}


def rl_sample_sequence(params, cfg: Config, batch, *,
                       rng: Optional[jax.Array] = None,
                       deterministic: bool = True) -> jnp.ndarray:
    """Phase 1 of the callback-free RL step: the sampled sequence only.

    Must be driven with the SAME rng as the update phase so dropout and
    categorical sampling reproduce bit-identically there."""
    features, positions, captions = batch
    drop_rng = sample_rng = None
    if rng is not None:
        drop_rng, sample_rng = jax.random.split(rng)
    logits = captioner_logits(params, cfg.model, features, positions,
                              captions, rng=drop_rng,
                              deterministic=deterministic)
    seq, _ = sample_from_logits(logits, sample_rng, cfg.rl.sample_mode,
                                cfg.rl.num_samples)
    return seq


def rl_composite_loss(params, cfg: Config, batch, reward_callback=None, *,
                      rewards: Optional[jnp.ndarray] = None,
                      self_cider: Optional[jnp.ndarray] = None,
                      sample_seq: Optional[jnp.ndarray] = None,
                      rng: Optional[jax.Array] = None,
                      deterministic: bool = True
                      ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full RL loss (loss.py:52-76).  Returns (loss, WRITE_LOG metrics).

    Rewards come either from ``reward_callback`` (jax.pure_callback inside
    the step — preferred where the runtime supports host callbacks) or as
    precomputed ``rewards``/``self_cider`` arrays (two-phase mode for
    runtimes without host callbacks, e.g. axon_pjrt).

    ``sample_seq`` (two-phase mode): the already-sampled [B, N, T]
    sequences the rewards were scored on.  When given, the structure term
    gathers the CURRENT logprobs of exactly those sequences instead of
    re-deriving the sample from (params, rng) — required by the pipelined
    schedule (rl.pipeline_depth > 0) where the update runs one step after
    the sample and the params have since moved.  With unmoved params and
    the same rng the explicit and re-derived sequences are bit-identical,
    so the serial two-phase path passes it too (one less argmax)."""
    features, positions, captions = batch
    drop_rng = sample_rng = None
    if rng is not None:
        drop_rng, sample_rng = jax.random.split(rng)

    logits = captioner_logits(params, cfg.model, features, positions,
                              captions, rng=drop_rng,
                              deterministic=deterministic)
    target = captions[:, 1:].astype(jnp.int32)

    w = cfg.rl.structure_loss_weight
    if w < 1:
        lm_loss = cross_entropy_ignore_pad(logits, target, cfg.model.pad_idx)
    else:
        lm_loss = jnp.zeros((), logits.dtype)

    if w > 0:
        if sample_seq is not None:
            assert rewards is not None, \
                "explicit sample_seq implies precomputed rewards"
            logprobs = jax.nn.log_softmax(logits, axis=-1)
        else:
            sample_seq, logprobs = sample_from_logits(logits, sample_rng,
                                                      cfg.rl.sample_mode,
                                                      cfg.rl.num_samples)
        if rewards is None:
            assert reward_callback is not None
            rewards, self_cider = reward_callback(sample_seq, target)
        rewards = jax.lax.stop_gradient(rewards)
        self_cider = jax.lax.stop_gradient(self_cider)
        st = structure_loss(
            logprobs, sample_seq, rewards, self_cider,
            entropy_weight=cfg.rl.entropy_reward_weight,
            self_cider_weight=cfg.rl.self_cider_reward_weight)
        st_loss, reward = st["loss"], st["reward"]
    else:
        st_loss = jnp.zeros((), logits.dtype)
        reward = jnp.zeros((), logits.dtype)

    loss = (1.0 - w) * lm_loss + w * st_loss
    return loss, {"loss": loss, "language_model_loss": lm_loss,
                  "structure_loss": st_loss, "reward": reward}
