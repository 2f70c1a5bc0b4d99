"""Decoding equivalence: the KV-cached scan decode must produce exactly the
tokens of the reference algorithm (full-prefix re-decode per step,
model.py:101-200), here re-run with our full-sequence decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_caption_tpu.config import START_IDX
from image_caption_tpu.models import captioner as C
from image_caption_tpu.models import decoding as D
from image_caption_tpu.ops import masks as M

from conftest import make_fake_batch


def naive_greedy(params, cfg, feats, pos):
    """The reference's O(T^2) greedy loop (model.py:101-132), using the
    full-sequence decoder each step."""
    enc, _ = C.encoder_apply(params["encoder"], cfg, feats, pos,
                             deterministic=True)
    b = enc.shape[0]
    caption = np.zeros((b, cfg.max_length + 1), np.int32)
    caption[:, 0] = START_IDX
    attn_per_step = []
    for t in range(cfg.max_length - 1):
        prefix = jnp.asarray(caption[:, :t + 1])
        ctx_mask = M.key_pad_mask_from_features(pos, t + 1)
        out, _, cross_attn = C.decoder_apply(
            params["decoder"], cfg, prefix, enc,
            context_attention_mask=ctx_mask, deterministic=True,
            need_weights=True)
        logits = out[:, t] @ params["classifier"]["kernel"] + \
            params["classifier"]["bias"]
        nxt = np.asarray(jnp.argmax(jax.nn.softmax(logits), axis=-1))
        caption[:, t + 1] = nxt
        attn_per_step.append(
            np.asarray(jnp.mean(cross_attn[:, :, t], axis=1)))
    return caption, np.stack(attn_per_step)


def naive_beam(params, cfg, feats, pos, beam_size, score_mode):
    """The reference beam loop (model.py:135-200) with sorted top-k."""
    enc, _ = C.encoder_apply(params["encoder"], cfg, feats, pos,
                             deterministic=True)
    b = enc.shape[0]
    k = beam_size
    caption = np.zeros((k, b, cfg.max_length), np.int64)
    caption[:, :, 0] = START_IDX

    def decode_prefix(prefix):
        ctx_mask = M.key_pad_mask_from_features(pos, prefix.shape[1])
        out, _, _ = C.decoder_apply(params["decoder"], cfg,
                                    jnp.asarray(prefix), enc,
                                    context_attention_mask=ctx_mask,
                                    deterministic=True)
        t = prefix.shape[1] - 1
        logits = out[:, t] @ params["classifier"]["kernel"] + \
            params["classifier"]["bias"]
        if score_mode == "prob":
            return np.asarray(jax.nn.softmax(logits, axis=-1))
        return np.asarray(jax.nn.log_softmax(logits, axis=-1))

    # stable argsort = lax.top_k's tie rule (lowest index first among
    # equal values) — makes the oracle deterministic on tie-heavy rows
    p0 = decode_prefix(caption[0, :, :1])
    order = np.argsort(-p0, axis=1, kind="stable")[:, :k]  # sorted top-k
    scores = np.take_along_axis(p0, order, axis=1).T   # [K, B]
    caption[:, :, 1] = order.T

    v = cfg.num_vocab
    for t in range(1, cfg.max_length - 1):
        all_scores = []
        for bm in range(k):
            p = decode_prefix(caption[bm, :, :t + 1])
            all_scores.append(p + scores[bm][:, None])
        flat = np.concatenate(all_scores, axis=1)      # [B, K*V]
        order = np.argsort(-flat, axis=1, kind="stable")[:, :k]  # [B, K]
        scores = np.take_along_axis(flat, order, axis=1).T
        beam_idx = (order // v).T                      # [K, B]
        caption = caption[beam_idx, np.arange(b)[None, :]].copy()
        caption[:, :, t + 1] = (order % v).T
    return caption[0]


@pytest.mark.parametrize("cfg_name", ["tiny", "flagship"])
def test_cached_greedy_matches_naive(cfg_name, tiny_cfg, flagship_tiny_cfg):
    cfg = tiny_cfg if cfg_name == "tiny" else flagship_tiny_cfg
    feats, pos, _ = make_fake_batch(cfg, batch=3, seed=11)
    params = C.init_captioner(jax.random.PRNGKey(0), cfg.model)
    want, want_attn = naive_greedy(params, cfg.model,
                                   jnp.asarray(feats), jnp.asarray(pos))
    got, got_attn = D.greedy_decode(params, cfg.model, jnp.asarray(feats),
                                    jnp.asarray(pos),
                                    return_attention=True)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn, atol=1e-5)


@pytest.mark.parametrize("score_mode", ["prob", "logprob"])
def test_cached_beam_matches_naive(tiny_cfg, score_mode):
    cfg = tiny_cfg
    feats, pos, _ = make_fake_batch(cfg, batch=2, seed=7)
    params = C.init_captioner(jax.random.PRNGKey(1), cfg.model)
    want = naive_beam(params, cfg.model, jnp.asarray(feats),
                      jnp.asarray(pos), beam_size=3, score_mode=score_mode)
    got = D.beam_search(params, cfg.model, jnp.asarray(feats),
                        jnp.asarray(pos), beam_size=3,
                        score_mode=score_mode)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_beam_one_matches_greedy(tiny_cfg):
    cfg = tiny_cfg
    feats, pos, _ = make_fake_batch(cfg, batch=2, seed=3)
    params = C.init_captioner(jax.random.PRNGKey(2), cfg.model)
    greedy, _ = D.greedy_decode(params, cfg.model, jnp.asarray(feats),
                                jnp.asarray(pos))
    beam = D.beam_search(params, cfg.model, jnp.asarray(feats),
                         jnp.asarray(pos), beam_size=1, score_mode="prob")
    # beam tokens cover positions 0..max_length-1; greedy 0..max_length
    np.testing.assert_array_equal(np.asarray(greedy)[:, :cfg.model.max_length],
                                  np.asarray(beam))


def test_xe_loss_runs_and_is_finite(tiny_cfg):
    cfg = tiny_cfg
    feats, pos, caps = make_fake_batch(cfg, batch=4, seed=5)
    params = C.init_captioner(jax.random.PRNGKey(4), cfg.model)
    loss = C.captioner_xe_loss(params, cfg.model, jnp.asarray(feats),
                               jnp.asarray(pos), jnp.asarray(caps))
    val = float(loss["loss"])
    assert np.isfinite(val)
    # CE of a ~uniform model is near log(V)
    assert abs(val - np.log(cfg.model.num_vocab)) < 2.0


def test_focal_loss_matches_torch_semantics(tiny_cfg):
    """loss.py:20-28: focal applied to the scalar mean CE."""
    import torch
    import torch.nn.functional as tF
    cfg = tiny_cfg.with_overrides(**{"model.xe_loss": "focal"})
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 10).astype(np.float32)
    target = np.array([1, 2, 0, 3, 0, 9])
    ce = tF.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(target), ignore_index=0,
                          reduction="mean")
    pt = torch.exp(-ce)
    want = ((1 - pt) ** 2 * ce).item()

    ours_ce = C.cross_entropy_ignore_pad(jnp.asarray(logits)[None],
                                         jnp.asarray(target)[None])
    got = float(C.focal_loss_from_ce(ours_ce, 2.0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_beam_stop_at_end_freezes_finished(tiny_cfg, fake_batch):
    """Clean-mode EOS handling: once a beam emits <END>, the remainder is
    <NULL> and its score stops accumulating."""
    import jax
    import jax.numpy as jnp
    from image_caption_tpu.config import END_IDX, NULL_IDX
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.models.decoding import beam_search

    cfg = tiny_cfg
    params = init_captioner(jax.random.PRNGKey(3), cfg.model)
    feats, poss, _ = fake_batch
    tokens = np.asarray(beam_search(params, cfg.model, feats, poss,
                                    beam_size=3, score_mode="logprob",
                                    stop_at_end=True))
    for row in tokens:
        seen_end = False
        for t, tok in enumerate(row[1:], start=1):
            if seen_end:
                assert tok == NULL_IDX, (row,)
            if tok == END_IDX:
                seen_end = True


def test_topk_exact_2level_matches_lax():
    import jax
    import jax.numpy as jnp
    from image_caption_tpu.models.decoding import topk_exact_2level

    rng = np.random.RandomState(0)
    for shape, k in (((7, 12000), 3), ((2, 3, 5000), 5), ((4, 100), 3),
                     ((3, 257), 2)):
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = topk_exact_2level(x, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # adversarial: all top-k values inside ONE chunk
    x = np.zeros((1, 12000), np.float32)
    x[0, 400:403] = [9.0, 8.0, 7.0]
    v, i = topk_exact_2level(jnp.asarray(x), 3)
    np.testing.assert_array_equal(np.asarray(i)[0], [400, 401, 402])


def test_topk_exact_2level_tie_rule_matches_lax():
    """Index-order agreement with lax.top_k on TIES (lowest index wins)
    — the case random-float testing never exercises.  Zero-padded batch
    rows and duplicated images produce exactly these tie-heavy rows in
    the parity beam (models/decoding.py tie-rule docstring)."""
    import jax
    import jax.numpy as jnp
    from image_caption_tpu.models.decoding import topk_exact_2level

    def check(x, k):
        x = jnp.asarray(np.asarray(x, np.float32))
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = topk_exact_2level(x, k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    # constant rows: every value tied -> indices 0..k-1
    check(np.zeros((3, 12000)), 4)
    check(np.full((2, 5000), 7.25), 3)

    # two-valued and few-distinct-value rows (ties everywhere)
    rng = np.random.RandomState(42)
    check(rng.randint(0, 2, size=(5, 12000)), 5)
    check(rng.randint(0, 4, size=(4, 3000)), 6)

    # cross-chunk tie where chunk-max rank order disagrees with global
    # index order: x[5]=5 (chunk 0), x[300]=9 / x[301]=5 (chunk 2) —
    # the pre-fix code returned 301 for the tied 5; lax picks 5
    x = np.zeros((1, 2000), np.float32)
    x[0, 5], x[0, 300], x[0, 301] = 5.0, 9.0, 5.0
    check(x, 2)

    # duplicated rows (the duplicated-image beam case): identical rows
    # must produce identical index rows
    row = rng.randn(1, 12000).astype(np.float32)
    x = np.concatenate([row, row, row])
    check(x, 5)
    # ... and with in-row ties on top
    rowq = np.round(row * 2) / 2        # quantized -> many in-row ties
    check(np.concatenate([rowq, rowq]), 8)


def test_beam_tie_exactness_degenerate_vocab(flagship_tiny_cfg):
    """Token-for-token beam equality vs the naive oracle on a TIE-HEAVY
    model (VERDICT r3 weak #4): all vocab ids >= 8 share bit-identical
    logits every step (zeroed classifier columns + equal bias), the batch
    carries duplicated images, and the vocab is large enough (600 > 2
    chunks, n_chunks >= k) to engage the 2-level top-k path."""
    cfg = flagship_tiny_cfg.with_overrides(**{"model.num_vocab": 600})
    feats, pos, _ = make_fake_batch(cfg, batch=2, seed=3)
    feats = np.concatenate([feats, feats])      # duplicated items
    pos = np.concatenate([pos, pos])
    params = C.init_captioner(jax.random.PRNGKey(2), cfg.model)
    kern = np.asarray(params["classifier"]["kernel"]).copy()
    bias = np.asarray(params["classifier"]["bias"]).copy()
    kern[:, 8:] = 0.0
    bias[8:] = bias[8]
    params = dict(params)
    params["classifier"] = {"kernel": jnp.asarray(kern),
                            "bias": jnp.asarray(bias)}
    for score_mode in ("prob", "logprob"):
        want = naive_beam(params, cfg.model, jnp.asarray(feats),
                          jnp.asarray(pos), beam_size=3,
                          score_mode=score_mode)
        got = np.asarray(D.beam_search(params, cfg.model,
                                       jnp.asarray(feats),
                                       jnp.asarray(pos), beam_size=3,
                                       score_mode=score_mode))
        np.testing.assert_array_equal(got, want, err_msg=score_mode)
        # duplicated batch items decode identically
        np.testing.assert_array_equal(got[:2], got[2:],
                                      err_msg=score_mode)


def test_cached_greedy_matches_naive_move_first():
    """Decode parity for the move-first-image-feature tail FFN
    (model.py:451-457) — the remaining decoder quirk not covered by the
    tiny/flagship configs."""
    from image_caption_tpu.config import get_preset
    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_move"
                     ).with_overrides(**{
        "model.num_vocab": 50, "model.max_length": 11,
        "model.num_objects": 5,
        "model.encode_input_size": 32, "model.encode_q_k_dim": 32,
        "model.encode_v_dim": 32, "model.encode_hidden_size": 32,
        "model.encode_num_heads": 4, "model.encode_num_blocks": 1,
        "model.dim_word_embedding": 32, "model.decode_input_size": 32,
        "model.decode_q_k_dim": 32, "model.decode_v_dim": 32,
        "model.decode_hidden_size": 32, "model.decode_num_heads": 4,
        "model.decode_num_blocks": 2})
    assert cfg.model.move_first_image_feature
    params = C.init_captioner(jax.random.PRNGKey(5), cfg.model)
    feats, pos, _ = make_fake_batch(cfg, batch=3, seed=5)

    want, _ = naive_greedy(params, cfg.model, feats, pos)
    got, _ = D.greedy_decode(params, cfg.model, feats, pos)
    np.testing.assert_array_equal(np.asarray(got), want)

    want_b = naive_beam(params, cfg.model, feats, pos, 2, "prob")
    got_b = D.beam_search(params, cfg.model, feats, pos, beam_size=2,
                          score_mode="prob")
    np.testing.assert_array_equal(np.asarray(got_b), want_b)


def test_beam_score_mode_follows_caption_model(tiny_cfg, monkeypatch):
    """Parity wiring: the XE Transformer's beam accumulates softmax
    PROBABILITIES (model.py:183) but PolicyNetwork accumulates LOG-probs
    (model_RL.py:157,182 — self.softmax = nn.LogSoftmax); decode paths
    must pick the mode from CAPTION_MODEL."""
    from dataclasses import replace

    import jax.numpy as jnp

    from image_caption_tpu.models import decoding
    from image_caption_tpu.train.loop import Trainer

    assert decoding.beam_score_mode("Transformer") == "prob"
    assert decoding.beam_score_mode("RL_Transformer") == "logprob"

    captured = {}

    def fake_beam(params, m, feats, poss, *, beam_size, score_mode,
                  **kw):
        captured["mode"] = score_mode
        return jnp.zeros((feats.shape[0], m.max_length), jnp.int32)

    monkeypatch.setattr(decoding, "beam_search", fake_beam)

    tr = Trainer(tiny_cfg)
    from conftest import make_fake_batch
    feats, poss, _ = make_fake_batch(tiny_cfg, batch=2)
    idx_to_word = {i: f"w{i}" for i in range(tiny_cfg.model.num_vocab)}
    idx_to_word.update({0: "<NULL>", 1: "<START>", 2: "<END>"})

    tr.generate_caption(feats, poss, idx_to_word, beam_size=2)
    assert captured["mode"] == "prob"

    tr.cfg = replace(tiny_cfg, caption_model="RL_Transformer")
    tr.generate_caption(feats, poss, idx_to_word, beam_size=2)
    assert captured["mode"] == "logprob"
