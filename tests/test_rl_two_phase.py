"""Two-phase RL (callback-free) equals the callback path numerically."""

import numpy as np
import pytest

import jax

from image_caption_tpu.train.loop import RLTrainer

from conftest import make_fake_batch


def _make_vocab(n):
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for i in range(4, n):
        vocab[f"w{i}"] = i
    return vocab


def test_two_phase_matches_callback_path(flagship_tiny_cfg, monkeypatch):
    cfg = flagship_tiny_cfg
    vocab = _make_vocab(cfg.model.num_vocab)
    batch = make_fake_batch(cfg, batch=8)

    # callback path (CPU supports host callbacks)
    t_cb = RLTrainer(cfg, vocab)
    assert not t_cb._two_phase
    m_cb = t_cb.compute_loss(*batch)

    # forced two-phase path
    import image_caption_tpu.rl.step as rstep
    monkeypatch.setattr(rstep, "backend_supports_callbacks", lambda: False)
    t_2p = RLTrainer(cfg, vocab)
    assert t_2p._two_phase
    m_2p = t_2p.compute_loss(*batch)

    for key in ("loss", "language_model_loss", "structure_loss", "reward"):
        np.testing.assert_allclose(m_2p[key], m_cb[key], rtol=1e-5,
                                   atol=1e-6, err_msg=key)

    # one train step on each: same rng seeds -> same resulting loss
    t_cb.train_step(*batch)
    t_2p.train_step(*batch)
    a = t_cb.compute_loss(*batch)
    b = t_2p.compute_loss(*batch)
    np.testing.assert_allclose(b["loss"], a["loss"], rtol=1e-4, atol=1e-5)
