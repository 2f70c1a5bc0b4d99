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


def _force_two_phase(monkeypatch):
    import image_caption_tpu.rl.step as rstep
    monkeypatch.setattr(rstep, "backend_supports_callbacks", lambda: False)


def _override(cfg, **kw):
    return cfg.with_overrides(**kw)


def test_pipelined_plumbing_matches_serial_lr0(flagship_tiny_cfg,
                                               monkeypatch):
    """With learning_rate=0 the params never move, so the pipelined
    schedule's one-step sampling staleness is vacuous: every per-step
    metric must bit-match the serial two-phase schedule (proves the
    sample/reward/update plumbing lines up batch-for-batch)."""
    _force_two_phase(monkeypatch)
    cfg = _override(flagship_tiny_cfg, **{"train.learning_rate": 0.0})
    vocab = _make_vocab(cfg.model.num_vocab)
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(4)]

    t_serial = RLTrainer(_override(cfg, **{"rl.pipeline_depth": 0}), vocab,
                         rng=jax.random.PRNGKey(3))
    assert t_serial._two_phase and not t_serial._pipeline
    serial = [t_serial.train_step_device(t_serial.shard(b))
              for b in batches]

    t_pipe = RLTrainer(_override(cfg, **{"rl.pipeline_depth": 1}), vocab,
                       rng=jax.random.PRNGKey(3))
    assert t_pipe._two_phase and t_pipe._pipeline
    piped = [t_pipe.train_step_device(t_pipe.shard(b)) for b in batches]
    piped.append(t_pipe.flush())
    assert piped[0] is None          # one-step metric latency
    assert t_pipe._pending is None
    for i, (a, b) in enumerate(zip(serial, piped[1:])):
        for key in ("loss", "structure_loss", "reward"):
            np.testing.assert_allclose(
                np.asarray(b[key]), np.asarray(a[key]), rtol=1e-6,
                atol=1e-7, err_msg=f"step {i} {key}")
    assert int(jax.device_get(t_pipe.state.step)) == len(batches)


def test_pipelined_first_update_and_blocking_api(flagship_tiny_cfg,
                                                 monkeypatch):
    """With lr > 0: (a) the FIRST pipelined update is bit-identical to the
    serial schedule (same init params sample); (b) the blocking
    ``train_step`` API drains per call, so it reproduces the serial
    trajectory exactly even with pipelining enabled."""
    _force_two_phase(monkeypatch)
    # pin both schedules explicitly — the comparison is the contract
    cfg = _override(flagship_tiny_cfg, **{"rl.pipeline_depth": 0})
    cfg_pipe = _override(cfg, **{"rl.pipeline_depth": 1})
    vocab = _make_vocab(cfg.model.num_vocab)
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(3)]

    t_serial = RLTrainer(cfg, vocab, rng=jax.random.PRNGKey(5))
    assert not t_serial._pipeline
    serial = [t_serial.train_step(*b) for b in batches]

    # (a) first async update matches
    t_pipe = RLTrainer(cfg_pipe, vocab, rng=jax.random.PRNGKey(5))
    assert t_pipe.train_step_device(t_pipe.shard(batches[0])) is None
    first = t_pipe.flush()
    np.testing.assert_allclose(np.asarray(first["loss"]),
                               serial[0]["loss"], rtol=1e-6, atol=1e-7)

    # (b) blocking API == serial trajectory
    t_block = RLTrainer(cfg_pipe, vocab, rng=jax.random.PRNGKey(5))
    assert t_block._pipeline
    blocked = [t_block.train_step(*b) for b in batches]
    for i, (a, b) in enumerate(zip(serial, blocked)):
        np.testing.assert_allclose(b["loss"], a["loss"], rtol=1e-5,
                                   atol=1e-6, err_msg=f"step {i}")


def test_pipelined_async_converges_and_counts(flagship_tiny_cfg,
                                              monkeypatch):
    """Async fused-pipelined training with lr > 0: updates apply once per
    batch (step counter exact), losses stay finite, and compute_loss
    flushes the pending tail before reading params."""
    _force_two_phase(monkeypatch)
    cfg = _override(flagship_tiny_cfg, **{"rl.pipeline_depth": 1})
    vocab = _make_vocab(cfg.model.num_vocab)
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(5)]

    t = RLTrainer(cfg, vocab, rng=jax.random.PRNGKey(9))
    for b in batches[:3]:
        t.train_step_device(t.shard(b))
    assert t._pending is not None
    # compute_loss must see all 3 updates applied
    m = t.compute_loss(*batches[0])
    assert t._pending is None
    assert int(jax.device_get(t.state.step)) == 3
    assert np.isfinite(m["loss"])
    for b in batches[3:]:
        t.train_step_device(t.shard(b))
    t.flush()
    assert int(jax.device_get(t.state.step)) == len(batches)


def test_fused_pipeline_trajectory_matches_serial(flagship_tiny_cfg,
                                                  monkeypatch):
    """The fused pipelined schedule (depth 1) is TRAJECTORY-IDENTICAL to
    the reference's serial sample->score->update (core/models.py:184-195):
    the fused dispatch applies update k-1 BEFORE sampling batch k, so
    every sample sees exactly the params the serial schedule would have —
    pipelining overlaps host scoring/transfers without a staleness trade.
    Pin per-step metrics AND the final params across a 4-step async run."""
    _force_two_phase(monkeypatch)
    cfg = flagship_tiny_cfg
    vocab = _make_vocab(cfg.model.num_vocab)
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(4)]

    t_serial = RLTrainer(_override(cfg, **{"rl.pipeline_depth": 0}), vocab,
                         rng=jax.random.PRNGKey(7))
    serial = [t_serial.train_step_device(t_serial.shard(b))
              for b in batches]

    t_pipe = RLTrainer(_override(cfg, **{"rl.pipeline_depth": 1}), vocab,
                       rng=jax.random.PRNGKey(7))
    assert t_pipe._pipeline and t_pipe._fused_step is not None
    piped = [t_pipe.train_step_device(t_pipe.shard(b)) for b in batches]
    piped.append(t_pipe.flush())
    assert piped[0] is None            # one-step metric latency

    for i, (a, b) in enumerate(zip(serial, piped[1:])):
        for key in ("loss", "language_model_loss", "structure_loss",
                    "reward"):
            np.testing.assert_allclose(
                np.asarray(b[key]), np.asarray(a[key]), rtol=1e-5,
                atol=1e-6, err_msg=f"step {i} {key}")

    assert int(jax.device_get(t_pipe.state.step)) == len(batches)
    flat_s = jax.tree_util.tree_leaves(t_serial.state.params)
    flat_p = jax.tree_util.tree_leaves(t_pipe.state.params)
    for ls, lp in zip(flat_s, flat_p):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                                   rtol=1e-5, atol=1e-6)
