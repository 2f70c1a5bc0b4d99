"""Native n-gram scorer vs the Python oracle (bit-level agreement)."""

import os

import numpy as np
import pytest

from image_caption_tpu.metrics.bleu import Bleu
from image_caption_tpu.metrics.cider import CiderD, precook
from image_caption_tpu.rl.rewards import RewardComputer, get_div

LIB = os.path.join(os.path.dirname(__file__), "..", "csrc",
                   "libngram_rewards.so")
pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="native lib not built")

RES = [
    "a man riding a bicycle down the street",
    "a cat sitting on a wooden bench",
    "two birds",
    "",
]
GTS = [
    "a man rides his bicycle down a busy street",
    "a cat sits on top of a bench",
    "two birds watching a plate of food near the beach",
    "a dog",
]


def _python_structure(res, gts, cider_w=1.0, bleu_w=1.0):
    n = len(res)
    res_d = {i: [res[i]] for i in range(n)}
    gts_d = {i: [gts[i]] for i in range(n)}
    _, cider = CiderD(df="corpus").compute_score(gts_d, res_d)
    _, bleu_all = Bleu(4).compute_score(gts_d, res_d)
    return cider_w * np.asarray(cider) + bleu_w * np.asarray(bleu_all[3])


def test_structure_scores_corpus_mode_matches_python():
    from image_caption_tpu.utils.native import NgramRewarder
    native = NgramRewarder()
    got = native.structure_scores(RES, GTS, 1.0, 1.0)
    want = _python_structure(RES, GTS)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_structure_scores_frozen_df_matches_python():
    from image_caption_tpu.utils.native import NgramRewarder
    # synthetic frozen df over the corpus vocabulary
    df = {}
    for s in GTS + RES:
        for g in precook(s, 4):
            df[g] = df.get(g, 0.0) + 1.0
    log_ref_len = float(np.log(40504.0))

    scorer = CiderD(df="corpus")
    scorer.doc_frequency = df
    scorer.log_ref_len = log_ref_len
    n = len(RES)
    _, cider = scorer.compute_score({i: [GTS[i]] for i in range(n)},
                                    {i: [RES[i]] for i in range(n)})
    _, bleu_all = Bleu(4).compute_score({i: [GTS[i]] for i in range(n)},
                                        {i: [RES[i]] for i in range(n)})
    want = np.asarray(cider) + np.asarray(bleu_all[3])

    native = NgramRewarder(doc_frequency=df, log_ref_len=log_ref_len)
    got = native.structure_scores(RES, GTS, 1.0, 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_self_cider_matches_python():
    from image_caption_tpu.metrics.cider import Cider
    from image_caption_tpu.utils.native import NgramRewarder
    df = {}
    for s in RES:
        for g in precook(s, 4):
            df[g] = df.get(g, 0.0) + 2.0
    log_ref_len = float(np.log(100.0))

    cider = Cider(df="corpus")
    cider.doc_frequency = df
    cider.log_ref_len = log_ref_len
    want = []
    for s in RES:
        gram = cider.my_self_cider([[s]])[0]
        want.append(get_div(np.linalg.eigvalsh(gram / 10.0)))

    native = NgramRewarder(doc_frequency=df, log_ref_len=log_ref_len)
    got = native.self_cider_scores(RES)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-5)


def test_reward_computer_prefers_native():
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    words = sorted({w for s in RES + GTS for w in s.split()})
    for w in words:
        vocab[w] = len(vocab)
    rc_native = RewardComputer(vocab, use_native=True, cider_df="corpus")
    rc_python = RewardComputer(vocab, use_native=False, cider_df="corpus")
    assert rc_native._native is not None

    def encode(strs):
        out = np.zeros((len(strs), 12), np.int32)
        for i, s in enumerate(strs):
            toks = [1] + [vocab[w] for w in s.split()][:9] + [2]
            out[i, :len(toks)] = toks
        return out

    seq = encode(RES)
    tgt = encode(GTS)
    np.testing.assert_allclose(
        rc_native.structure_scores(seq, tgt),
        rc_python.structure_scores(seq, tgt), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        rc_native.self_cider_scores(seq),
        rc_python.self_cider_scores(seq), rtol=1e-4, atol=1e-5)


def test_self_cider_single_sample_is_identically_zero():
    """The RewardComputer short-circuits group_size=1 self-CIDEr to exact
    zeros (rl/rewards.py): a 1x1 gram's get_div is -log(1)/eps = 0 for
    every input.  Pin oracle == native == shortcut == 0 so the shortcut
    can never drift from the scored paths."""
    from image_caption_tpu.metrics.cider import Cider
    from image_caption_tpu.utils.native import NgramRewarder

    df = {}
    for s in RES:
        for g in precook(s, 4):
            df[g] = df.get(g, 0.0) + 2.0
    log_ref_len = float(np.log(100.0))

    cider = Cider(df="corpus")
    cider.doc_frequency = df
    cider.log_ref_len = log_ref_len
    oracle = [get_div(np.linalg.eigvalsh(cider.my_self_cider([[s]])[0] / 10.0))
              for s in RES]
    native = NgramRewarder(doc_frequency=df,
                           log_ref_len=log_ref_len).self_cider_scores(RES)

    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for w in sorted({w for s in RES for w in s.split()}):
        vocab[w] = len(vocab)
    seq = np.zeros((len(RES), 12), np.int32)
    for i, s in enumerate(RES):
        toks = [1] + [vocab[w] for w in s.split()][:9] + [2]
        seq[i, :len(toks)] = toks
    shortcut = RewardComputer(vocab, cider_df="corpus").self_cider_scores(
        seq, group_size=1)

    np.testing.assert_array_equal(np.asarray(oracle), 0.0)
    np.testing.assert_array_equal(native, 0.0)
    np.testing.assert_array_equal(shortcut, 0.0)
    assert shortcut.shape == (len(RES),) and shortcut.dtype == np.float32
