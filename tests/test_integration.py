"""End-to-end integration on the virtual CPU mesh (SURVEY.md §4 item 3):
synthetic dataset -> train steps (loss decreases) -> greedy decode ->
coco metrics -> checkpoint roundtrip."""

import os

import numpy as np
import pytest

from image_caption_tpu.config import get_preset


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from image_caption_tpu.data.synthetic import generate_synthetic_dataset
    d = str(tmp_path_factory.mktemp("synth"))
    generate_synthetic_dataset(d, num_images={"train": 12, "valid": 4},
                               captions_per_image=3)
    return d


@pytest.fixture(scope="module")
def cfg(synth_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    return get_preset("maxlen49_64").with_overrides(**{
        "model.num_vocab": 64, "train.batch_size": 8,
        "data.data_path": synth_dir, "data.output_path": out,
    })


@pytest.mark.slow
def test_end_to_end_train_decode_score(cfg):
    from image_caption_tpu.data.dataset import CaptionBatches, load_split
    from image_caption_tpu.data.vocab import invert_vocab
    from image_caption_tpu.metrics.evaluate import score_captions
    from image_caption_tpu.train.loop import Trainer, decode_split

    train_split = load_split(cfg.data.data_path, "train", verbose=False)
    valid_split = load_split(cfg.data.data_path, "valid", verbose=False,
                             load_references=True)
    # vocab must cover the synthetic grammar
    assert len(train_split.word_to_idx) <= cfg.model.num_vocab

    trainer = Trainer(cfg)
    batches = CaptionBatches(train_split, cfg.train.batch_size, seed=0)

    first = next(batches.epoch(0))
    loss0 = trainer.compute_loss(*first[:3])["loss"]
    for epoch in range(4):
        for feats, poss, caps, _ in batches.epoch(epoch):
            trainer.train_step(feats, poss, caps)
    loss1 = trainer.compute_loss(*first[:3])["loss"]
    assert np.isfinite(loss1) and loss1 < loss0

    idx_to_word = invert_vocab(train_split.word_to_idx)
    candidates = decode_split(trainer.state.params, cfg, valid_split,
                              cfg.train.batch_size, idx_to_word,
                              use_pallas=False)
    assert len(candidates) == valid_split.num_images

    hypo = {i: [c] for i, c in enumerate(candidates)}
    scores = score_captions(valid_split.references, hypo, verbose=False)
    for key in ("BLEU_1", "BLEU_4", "ROUGE_L", "CIDEr", "CIDEr-D"):
        assert key in scores
        assert np.isfinite(scores[key])


@pytest.mark.slow
@pytest.mark.parametrize("beam_size", [None, 3])
def test_decode_split_sharded_matches_single(cfg, beam_size):
    """decode_split with an 8-device mesh (batch over `data`, params
    replicated) must produce the same captions as the unsharded path —
    decode is batch-parallel, so GSPMD sharding must be a pure layout
    change."""
    import jax
    from image_caption_tpu.data.dataset import load_split
    from image_caption_tpu.data.vocab import invert_vocab
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.parallel import mesh as pmesh
    from image_caption_tpu.train.loop import decode_split

    valid_split = load_split(cfg.data.data_path, "valid", verbose=False)
    params = init_captioner(jax.random.PRNGKey(7), cfg.model)
    # random-init params emit ids across the whole vocab range — cover it
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    vocab.update({f"w{i}": i for i in range(4, cfg.model.num_vocab)})
    idx_to_word = invert_vocab(vocab)

    kw = dict(beam_size=beam_size, use_pallas=False)
    single = decode_split(params, cfg, valid_split,
                          cfg.train.batch_size, idx_to_word, **kw)
    mesh = pmesh.make_mesh()                    # 8 virtual devices on data
    assert mesh.devices.size == 8
    sharded = decode_split(params, cfg, valid_split,
                           cfg.train.batch_size, idx_to_word,
                           mesh=mesh, **kw)
    assert sharded == single


@pytest.mark.slow
def test_checkpoint_roundtrip(cfg):
    import jax
    from image_caption_tpu.train.checkpoint import CheckpointManager
    from image_caption_tpu.train.state import create_train_state

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    d = os.path.join(cfg.data.output_path, "ckpt_test")
    mgr = CheckpointManager(d, keep=2)
    mgr.save(1, jax.device_get(state))
    mgr.save(2, jax.device_get(state._replace(step=state.step + 5)))
    assert mgr.latest_epoch() == 2
    restored = mgr.restore(2, state)
    assert int(restored.step) == 5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mgr.close()


@pytest.mark.slow
def test_train_loop_scan_steps_matches_single(cfg):
    """The REAL train() with train.scan_steps=3 (chunked prefetch, scanned
    dispatch, remainder as single steps, floor-crossing log cadence) must
    produce the same final params as scan_steps=1 — this drives the loop's
    _chunks/_prep wiring, not just the step-level scan equivalence
    (tests/test_train_step.py)."""
    import jax
    from image_caption_tpu.train.loop import train

    def run(k, tag):
        c = cfg.with_overrides(**{
            "data.output_path": cfg.data.output_path + f"_scan{tag}",
            "train.scan_steps": k,
            "train.log_every": 3, "train.sample_every": 7})
        return train(c, num_epochs=2, verbose=False)

    s1, s3 = run(1, "1"), run(3, "3")
    assert int(s1.step) == int(s3.step) > 0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s1.params, s3.params)


@pytest.mark.slow
def test_train_resume_from_latest(cfg):
    """train() twice: the second run resumes from the saved epoch
    (SURVEY.md §5 checkpoint/resume — the reference restarts Adam and
    always begins at epoch 1)."""
    import io
    from contextlib import redirect_stdout
    from image_caption_tpu.train.loop import train
    from image_caption_tpu.train.checkpoint import CheckpointManager

    cfg2 = cfg.with_overrides(**{
        "data.output_path": cfg.data.output_path + "_resume",
        "train.log_every": 1000, "train.sample_every": 1000})
    state = train(cfg2, num_epochs=1, verbose=False)
    assert int(state.step) > 0

    buf = io.StringIO()
    with redirect_stdout(buf):
        state2 = train(cfg2, num_epochs=2, resume=True, verbose=True)
    assert "[train] resumed from epoch 1" in buf.getvalue()
    assert int(state2.step) > int(state.step)

    mgr = CheckpointManager(
        os.path.join(cfg2.data.output_path, "model"))
    assert mgr.latest_epoch() == 2
    mgr.close()
