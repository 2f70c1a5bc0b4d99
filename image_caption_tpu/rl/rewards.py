"""Host-side self-critical reward computation (CPU, string n-gram metrics).

Mirrors ``StructureCriterion`` (loss.py:96-216): per-sentence reward =
``cider_w * CIDEr-D(sample, target) + bleu_w * BLEU-4(sample, target)``,
plus the self-CIDEr diversity term (loss.py:144-148,189-216 — identically 0
for single-sample batches, see ``get_div``).  Sequences are decoded to
strings with the standard detokenizer and scored one-vs-one, exactly like
the reference feeds ``{i: [res_i]}`` / ``{i: [gts_i]}`` (loss.py:166-167).

This runs on host inside the jitted RL train step through
``jax.pure_callback`` — the TPU step stays compiled while the n-gram
scoring overlaps on CPU.  A C++ fast path (csrc/ngram_rewards.cpp) is used
when the shared library has been built; the Python path is the reference
implementation and the test oracle.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..data.vocab import decode_captions
from ..metrics.bleu import Bleu
from ..metrics.cider import Cider, CiderD


def get_div(eigvals: np.ndarray) -> float:
    """loss.py:200-210: diversity from the gram-matrix eigenvalues.

    Numerator additionally clamped: a fully-degenerate gram (all-zero
    tf-idf, possible only in df-fallback corpus mode where idf == 0)
    would make the reference produce inf; we return 0 instead so the
    training loss stays finite."""
    eigvals = np.clip(eigvals, 0, None)
    sqrt_top = np.sqrt(eigvals[-1])
    sqrt_sum = np.sqrt(eigvals).sum()
    if sqrt_top == 0:
        return 0.0
    log_n = np.log(len(eigvals))
    if sqrt_sum == 0:
        sqrt_sum = 1e-8
    if log_n == 0:
        log_n = 1e-8
    return float(-np.log(sqrt_top / sqrt_sum) / log_n)


class RewardComputer:
    """Batch reward function: int sequences -> per-sentence float rewards."""

    def __init__(self, word_to_idx: Dict[str, int], *,
                 cider_reward_weight: float = 1.0,
                 bleu_reward_weight: float = 1.0,
                 self_cider_reward_weight: float = 1.0,
                 cider_df: str = "coco-val",
                 use_native: bool = True):
        self.idx_to_word = {i: w for w, i in word_to_idx.items()}
        self.cider_w = float(cider_reward_weight)
        self.bleu_w = float(bleu_reward_weight)
        self.self_cider_w = float(self_cider_reward_weight)
        # scorers built once at startup, like loss.py:112-116
        self.ciderD = CiderD(df=cider_df)
        self.cider = Cider(df=cider_df)
        self.bleu = Bleu(4, print_=False)
        self._native = None
        if use_native:
            try:
                from ..utils.native import NgramRewarder
                self._native = NgramRewarder(
                    doc_frequency=self.ciderD.doc_frequency,
                    log_ref_len=(self.ciderD.log_ref_len
                                 if self.ciderD.doc_frequency else 0.0))
            except Exception:
                self._native = None

    @property
    def uses_frozen_df(self) -> bool:
        """True when CIDEr-D scores against a pre-loaded document-frequency
        table — rewards are then independent of which other rows are in
        the scored batch (multi-host RL scores per-host subsets only in
        this mode; see train/loop.py:_host_rewards)."""
        return self.ciderD.doc_frequency is not None

    def decode(self, seqs: np.ndarray) -> list:
        return decode_captions(np.asarray(seqs), self.idx_to_word)

    def structure_scores(self, sample_seq: np.ndarray,
                         target_seq: np.ndarray) -> np.ndarray:
        """loss.py:157-187: CIDEr-D + BLEU-4 per sentence, one-vs-one."""
        res_strs = self.decode(sample_seq)
        gts_strs = self.decode(target_seq)

        if self._native is not None:
            return self._native.structure_scores(res_strs, gts_strs,
                                                 self.cider_w, self.bleu_w)

        n = len(res_strs)
        res = {i: [res_strs[i]] for i in range(n)}
        gts = {i: [gts_strs[i]] for i in range(n)}

        if self.cider_w > 0:
            _, cider_scores = self.ciderD.compute_score(gts, res)
        else:
            cider_scores = 0.0
        if self.bleu_w > 0:
            # the reference swallows BLEU failures bare (loss.py:176-181)
            # — a hazard SURVEY §5 says not to replicate.  Our vendored
            # scorer handles empty strings, so any exception here is a
            # real bug: let it propagate.
            _, bleu_all = self.bleu.compute_score(gts, res)
            bleu_scores = np.array(bleu_all[3])
        else:
            bleu_scores = 0.0
        return (self.cider_w * np.asarray(cider_scores)
                + self.bleu_w * np.asarray(bleu_scores)).astype(np.float32)

    def self_cider_scores(self, sample_seq: np.ndarray,
                          group_size: int = 1) -> np.ndarray:
        """loss.py:189-216 — per-sentence diversity.

        ``group_size=1`` reproduces the reference exactly: its own
        ``get_self_cider_scores`` calls ``my_self_cider([res[i:i+1]])``
        per caption, a 1-element group whose 1x1 gram makes ``get_div``
        identically 0 (hence the reference's own "not working that much
        in this way" comment, loss.py:144).  ``group_size=N`` — set from
        ``rl.num_samples`` when true multi-sample SCST is on — computes
        the upstream self-critical semantics the reference transcribed
        from: one NxN tf-idf gram over each image's N consecutive
        samples, the shared diversity score repeated across the group.

        The 1-element case short-circuits to exact zeros WITHOUT scoring:
        a 1x1 gram has a single eigenvalue e, so ``sqrt_top == sqrt_sum``
        and ``get_div = -log(sqrt(e)/sqrt(e))/log_n = -log(1)/eps = 0``
        exactly for EVERY input (e == 0 hits the degenerate clamp, also
        0) — both the Python oracle and the native kernel unconditionally
        produce 0 here, at ~38 ms/step of tf-idf work for a constant
        (docs/performance.md RL attribution).  tests/test_native.py pins
        oracle == native == 0."""
        if group_size <= 1:
            return np.zeros((np.asarray(sample_seq).shape[0],), np.float32)
        res_strs = self.decode(sample_seq)
        if len(res_strs) % group_size:
            raise ValueError(
                f"{len(res_strs)} rows not divisible by "
                f"group_size={group_size}")
        # N is small (rl.num_samples), so the Python gram path is cheap
        groups = [res_strs[i:i + group_size]
                  for i in range(0, len(res_strs), group_size)]
        scores = []
        for g in groups:
            gram = self.cider.my_self_cider([g])[0]
            scores.append(get_div(np.linalg.eigvalsh(gram / 10.0)))
        return np.repeat(np.asarray(scores, dtype=np.float32),
                         max(group_size, 1))

    def __call__(self, sample_seq: np.ndarray,
                 target_seq: np.ndarray) -> np.ndarray:
        """The reward used by the jitted step: structure scores [B]."""
        return self.structure_scores(sample_seq, target_seq)
