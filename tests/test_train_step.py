"""Train-step tests: XE loss decreases, RL step runs with host rewards,
sharded state compiles on the 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from image_caption_tpu.parallel import mesh as pmesh
from image_caption_tpu.train.state import create_train_state
from image_caption_tpu.train.step import (compile_eval_step,
                                          compile_train_step)

from conftest import make_fake_batch


@pytest.fixture(scope="module")
def mesh8():
    return pmesh.make_mesh(data=-1, model=1)


def test_xe_train_step_decreases_loss(tiny_cfg, mesh8):
    cfg = tiny_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = compile_train_step(cfg, mesh8, state, donate=False)
    evals = compile_eval_step(cfg, mesh8, state)
    batch = make_fake_batch(cfg, batch=8)
    batch = pmesh.shard_batch(mesh8, batch)
    rng = jax.random.PRNGKey(1)

    loss0 = float(evals(state.params, batch)["loss"])
    for _ in range(10):
        state, metrics = step(state, batch, rng)
    loss1 = float(evals(state.params, batch)["loss"])
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)
    assert int(state.step) == 10


def test_xe_step_preserves_pad_embedding_row(tiny_cfg, mesh8):
    cfg = tiny_cfg
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = compile_train_step(cfg, mesh8, state, donate=False)
    batch = pmesh.shard_batch(mesh8, make_fake_batch(cfg, batch=8))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    pad_row = np.asarray(
        state.params["decoder"]["word_embedding"]["table"])[cfg.model.pad_idx]
    np.testing.assert_array_equal(pad_row, 0.0)


def test_tp_sharding_compiles(tiny_cfg):
    """model axis = 2: TP layout must compile and match the replicated
    result."""
    cfg = tiny_cfg
    mesh_tp = pmesh.make_mesh(data=-1, model=2)
    mesh_dp = pmesh.make_mesh(data=-1, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_fake_batch(cfg, batch=8)

    ev_tp = compile_eval_step(cfg, mesh_tp, state)
    ev_dp = compile_eval_step(cfg, mesh_dp, state)
    l_tp = float(ev_tp(pmesh.shard_params(mesh_tp, state.params),
                       pmesh.shard_batch(mesh_tp, batch))["loss"])
    l_dp = float(ev_dp(state.params,
                       pmesh.shard_batch(mesh_dp, batch))["loss"])
    assert abs(l_tp - l_dp) < 1e-4, (l_tp, l_dp)


def test_sequence_parallel_matches_dp(tiny_cfg):
    """sequence axis = 2: slot-dim activation sharding (SP) must compile,
    insert the attention all-gathers, and match the replicated loss.
    num_objects is bumped so num_slots divides the sequence axis."""
    cfg = tiny_cfg.with_overrides(**{"model.num_objects": 7})  # slots = 8
    mesh_sp = pmesh.make_mesh(data=-1, model=1, sequence=2)
    mesh_dp = pmesh.make_mesh(data=-1, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_fake_batch(cfg, batch=8)

    ev_sp = compile_eval_step(cfg, mesh_sp, state)
    ev_dp = compile_eval_step(cfg, mesh_dp, state)
    feats_sp = pmesh.shard_batch(mesh_sp, batch,
                                 num_slots=cfg.model.num_slots)
    # the slot dim really is sequence-sharded (not silently data-only)
    assert "sequence" in str(feats_sp[0].sharding.spec)
    l_sp = float(ev_sp(pmesh.shard_params(mesh_sp, state.params),
                       feats_sp)["loss"])
    l_dp = float(ev_dp(state.params,
                       pmesh.shard_batch(mesh_dp, batch))["loss"])
    assert abs(l_sp - l_dp) < 1e-4, (l_sp, l_dp)


def test_sequence_axis_falls_back_when_indivisible(tiny_cfg):
    """slots=7 does not divide sequence=2: shard_batch must fall back to
    data-only sharding and still evaluate correctly."""
    cfg = tiny_cfg  # num_objects=6 -> slots 7 (odd)
    mesh_sp = pmesh.make_mesh(data=-1, model=1, sequence=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = pmesh.shard_batch(mesh_sp, make_fake_batch(cfg, batch=8),
                              num_slots=cfg.model.num_slots)
    assert "sequence" not in str(batch[0].sharding.spec)
    ev = compile_eval_step(cfg, mesh_sp, state)
    loss = float(ev(pmesh.shard_params(mesh_sp, state.params),
                    batch)["loss"])
    assert np.isfinite(loss)


def test_scanned_steps_match_sequential(tiny_cfg, mesh8):
    """train.scan_steps: one scanned K-step dispatch must produce the
    same updates and per-step losses as K single-step dispatches (the
    per-step rng is fold_in(rng, state.step) in both paths)."""
    from image_caption_tpu.train.step import compile_train_step_scan

    cfg = tiny_cfg
    k = 4
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(k)]
    rng = jax.random.PRNGKey(1)

    state_a = create_train_state(cfg, jax.random.PRNGKey(0))
    step = compile_train_step(cfg, mesh8, state_a, donate=False)
    seq_losses = []
    for b in batches:
        state_a, m = step(state_a, pmesh.shard_batch(mesh8, b), rng)
        seq_losses.append(float(m["loss"]))

    state_b = create_train_state(cfg, jax.random.PRNGKey(0))
    scan = compile_train_step_scan(cfg, mesh8, state_b, donate=False)
    stacked = pmesh.shard_batch_stacked(mesh8, batches)
    state_b, ms = scan(state_b, stacked, rng)

    assert int(state_b.step) == k
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        state_a.params, state_b.params)


def test_scanned_loop_matches_single_loop(tiny_cfg):
    """train() with scan_steps=2 over an odd batch count (remainder runs
    singly) reaches the same final params as scan_steps=1."""
    from image_caption_tpu.train.loop import Trainer

    cfg = tiny_cfg
    batches = [make_fake_batch(cfg, batch=8, seed=s) for s in range(5)]

    def run(scan_steps):
        tr = Trainer(cfg.with_overrides(**{"train.scan_steps": scan_steps}),
                     rng=jax.random.PRNGKey(7))
        i = 0
        while i < len(batches):
            k = min(scan_steps, len(batches) - i)
            if k > 1:
                tr.train_steps_device(tr.shard_stacked(batches[i:i + k]))
            else:
                tr.train_step_device(tr.shard(batches[i]))
            i += k
        return tr.state

    s1, s2 = run(1), run(2)
    assert int(s1.step) == int(s2.step) == 5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s1.params, s2.params)


def test_rl_train_step_runs(flagship_tiny_cfg, mesh8):
    from image_caption_tpu.rl.loss import make_reward_callback
    from image_caption_tpu.rl.step import (compile_rl_eval_step,
                                           compile_rl_train_step)

    cfg = flagship_tiny_cfg
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for i in range(4, cfg.model.num_vocab):
        vocab[f"w{i}"] = i

    from image_caption_tpu.rl.rewards import RewardComputer
    rc = RewardComputer(vocab, use_native=False)
    callback = make_reward_callback(rc)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = compile_rl_train_step(cfg, mesh8, state, callback, donate=False)
    evals = compile_rl_eval_step(cfg, mesh8, state, callback)
    batch = pmesh.shard_batch(mesh8, make_fake_batch(cfg, batch=8))

    m0 = evals(state.params, batch)
    assert set(m0) == {"loss", "language_model_loss", "structure_loss",
                       "reward"}
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["reward"]))
    assert int(state.step) == 1


def test_rl_structure_loss_matches_manual(flagship_tiny_cfg):
    """structure_loss numerics vs a hand numpy computation
    (loss.py:121-155)."""
    import jax.numpy as jnp
    from image_caption_tpu.rl.loss import structure_loss

    rng = np.random.RandomState(0)
    b, t, v = 3, 5, 7
    logprobs = np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(
        np.float32)
    seq = rng.randint(0, v, size=(b, t)).astype(np.int32)
    rewards = rng.rand(b).astype(np.float32)
    self_cider = rng.rand(b).astype(np.float32)

    got = structure_loss(jnp.asarray(logprobs), jnp.asarray(seq),
                         jnp.asarray(rewards), jnp.asarray(self_cider),
                         entropy_weight=1.0, self_cider_weight=1.0)

    # manual
    mask = (seq > 0).astype(np.float32)
    mask = np.concatenate([np.ones((b, 1), np.float32), mask[:, :-1]], 1)
    scores = rewards[:, None].copy()
    # entropy of softmax(logprobs) (the reference's double-softmax quirk)
    p2 = np.exp(logprobs - logprobs.max(-1, keepdims=True))
    p2 = p2 / p2.sum(-1, keepdims=True)
    ent = -(p2 * np.log(p2)).sum(-1)
    ent = (ent * mask).sum(1) / mask.sum(1)
    scores = scores + ent[:, None]
    gathered = np.take_along_axis(logprobs, seq[..., None], axis=2)[..., 0]
    scores = scores + self_cider[:, None]
    manual = -(gathered * mask * scores).sum() / mask.sum()

    np.testing.assert_allclose(float(got["loss"]), manual, rtol=1e-5)
    np.testing.assert_allclose(float(got["reward"]), rewards.mean(),
                               rtol=1e-6)


def test_padded_batch_items_contribute_zero_loss(tiny_cfg, mesh8):
    """The fixed-shape batch padding (repeated rows + blanked captions)
    must not change the loss vs the unpadded batch."""
    import jax.numpy as jnp
    from image_caption_tpu.data.dataset import (_blank_padded_captions,
                                                _pad_rows)
    from image_caption_tpu.models.captioner import captioner_xe_loss
    from image_caption_tpu.models.captioner import init_captioner

    cfg = tiny_cfg
    params = init_captioner(jax.random.PRNGKey(0), cfg.model)
    feats, poss, caps = make_fake_batch(cfg, batch=5)

    loss_real = float(captioner_xe_loss(params, cfg.model, feats, poss,
                                        caps, deterministic=True)["loss"])

    pf, pp, pc = _pad_rows([feats, poss, caps], 8)
    pc = _blank_padded_captions(pc, 5)
    loss_padded = float(captioner_xe_loss(params, cfg.model, pf, pp, pc,
                                          deterministic=True)["loss"])
    np.testing.assert_allclose(loss_padded, loss_real, rtol=1e-6)


def test_rl_multi_sample_structure_loss_manual():
    """Multi-sample (N=4) structure loss vs manual numpy, incl. the
    leave-in mean baseline (loss.py:140-141 with N > 1)."""
    import jax.numpy as jnp
    from image_caption_tpu.rl.loss import structure_loss

    rng = np.random.RandomState(1)
    b, n, t, v = 2, 4, 5, 7
    logprobs = np.log(rng.dirichlet(np.ones(v), size=(b, t))).astype(
        np.float32)
    seq = rng.randint(0, v, size=(b, n, t)).astype(np.int32)
    rewards = rng.rand(b, n).astype(np.float32)
    self_cider = rng.rand(b, n).astype(np.float32)

    got = structure_loss(jnp.asarray(logprobs), jnp.asarray(seq),
                         jnp.asarray(rewards), jnp.asarray(self_cider),
                         entropy_weight=1.0, self_cider_weight=1.0)

    mask = (seq > 0).astype(np.float32)
    mask = np.concatenate([np.ones((b, n, 1), np.float32),
                           mask[:, :, :-1]], 2)
    p2 = np.exp(logprobs - logprobs.max(-1, keepdims=True))
    p2 = p2 / p2.sum(-1, keepdims=True)
    ent = -(p2 * np.log(p2)).sum(-1)                   # [B, T]
    ent_n = (ent[:, None] * mask).sum(2) / mask.sum(2)
    scores = rewards + ent_n
    baseline = (scores.sum(1, keepdims=True) - scores) / n
    scores = scores - baseline + self_cider
    gathered = np.take_along_axis(
        np.broadcast_to(logprobs[:, None], (b, n, t, v)),
        seq[..., None], axis=3)[..., 0]
    manual = -(gathered * mask * scores[..., None]).sum() / mask.sum()

    np.testing.assert_allclose(float(got["loss"]), manual, rtol=1e-5)
    np.testing.assert_allclose(float(got["reward"]), rewards.mean(),
                               rtol=1e-6)


def test_rl_multi_sample_two_phase_trains(flagship_tiny_cfg, monkeypatch):
    """Categorical N=4 SCST runs end-to-end in two-phase mode."""
    import image_caption_tpu.rl.step as rstep
    from image_caption_tpu.train.loop import RLTrainer

    cfg = flagship_tiny_cfg.with_overrides(**{
        "rl.sample_mode": "categorical", "rl.num_samples": 4})
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    for i in range(4, cfg.model.num_vocab):
        vocab[f"w{i}"] = i

    monkeypatch.setattr(rstep, "backend_supports_callbacks", lambda: False)
    trainer = RLTrainer(cfg, vocab)
    assert trainer._two_phase
    batch = make_fake_batch(cfg, batch=8)
    m = trainer.train_step(*batch)
    assert np.isfinite(m["loss"]) and np.isfinite(m["reward"])
    assert int(trainer.state.step) == 1
