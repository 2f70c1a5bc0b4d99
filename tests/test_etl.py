"""Caption-ETL unit tests: COCO JSON processing, index builders, references
(behavior per core/preprocess.py:224-373 and features.py:49-83)."""

import json
import os

import numpy as np
import pytest

from image_caption_tpu.vision.etl import (build_file_names,
                                          build_image_indices,
                                          build_references,
                                          process_caption_data)


@pytest.fixture()
def coco_json(tmp_path):
    coco = {
        "images": [
            {"id": 7, "file_name": "img7.jpg"},
            {"id": 3, "file_name": "img3.jpg"},
        ],
        "annotations": [
            {"image_id": 7, "caption": "A man, riding his bike."},
            {"image_id": 3, "caption": "Two dogs & a cat (playing)."},
            {"image_id": 7, "caption": "a very " + "long " * 60 + "caption"},
            {"image_id": 3, "caption": "A well-lit room."},
        ],
    }
    path = tmp_path / "captions.json"
    path.write_text(json.dumps(coco))
    return str(path)


def test_process_caption_data(coco_json, tmp_path):
    records = process_caption_data(coco_json, str(tmp_path), max_length=49)
    # the >49-token caption is dropped
    assert len(records) == 3
    # sorted by image_id
    assert [r["image_id"] for r in records] == [3, 3, 7]
    # cleaning: punctuation stripped, & -> and, - -> space, lowercased
    caps = {r["caption"] for r in records}
    assert "two dogs and a cat playing" in caps
    assert "a well lit room" in caps
    assert "a man riding his bike" in caps
    assert records[0]["file_name"].endswith("img3.jpg")


def test_index_builders(coco_json, tmp_path):
    records = process_caption_data(coco_json, str(tmp_path), max_length=49)
    file_names, id_index = build_file_names(records)
    assert len(file_names) == 2
    assert id_index == {3: 0, 7: 1}
    idxs = build_image_indices(records, id_index)
    np.testing.assert_array_equal(idxs, [0, 0, 1])

    refs = build_references(records)
    assert set(refs) == {0, 1}
    assert refs[0] == ["two dogs and a cat playing .",
                       "a well lit room ."]
    assert refs[1] == ["a man riding his bike ."]


def test_extract_split_features_smoke(tmp_path):
    """Tiny random-weight extraction over 3 images exercises the threaded
    loader + device pipeline end to end."""
    import jax
    from PIL import Image
    from image_caption_tpu.vision.pipeline import ExtractorParams
    from image_caption_tpu.vision.etl import extract_split_features
    from image_caption_tpu.vision.resnet import init_resnet
    from image_caption_tpu.vision.yolov5 import init_yolov5

    rng = np.random.RandomState(0)
    paths = []
    for i in range(3):
        img = (rng.rand(48 + 8 * i, 64, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(img).save(p)
        paths.append(p)

    params = ExtractorParams(
        yolo=init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                         width_multiple=0.25),
        resnet=init_resnet(jax.random.PRNGKey(1), stages=(1, 1, 1, 1)))
    feats, poss = extract_split_features(
        paths, extractor_params=params, num_objects=4, batch_size=2,
        num_workers=2, verbose=False)
    assert feats.shape == (3, 5, 2048)
    assert poss.shape == (3, 5, 84)
    assert np.all(np.isfinite(feats))
    # whole-image position row
    np.testing.assert_allclose(poss[:, 0, :4], [[0, 0, 1, 1]] * 3)


def test_extract_split_features_pipelined_ordering(tmp_path):
    """The three-stage pipelined loop (load k+1 / compute k / drain k-1)
    must land every image's features at its own index — compare against
    per-image extraction, including a ragged final batch and
    num_workers=1 (which deadlocked when load_batch shared the decode
    pool)."""
    import jax
    from PIL import Image
    from image_caption_tpu.vision.pipeline import ExtractorParams
    from image_caption_tpu.vision.etl import extract_split_features
    from image_caption_tpu.vision.resnet import init_resnet
    from image_caption_tpu.vision.yolov5 import init_yolov5

    rng = np.random.RandomState(1)
    paths = []
    for i in range(5):
        img = (rng.rand(40 + 8 * i, 56 + 4 * i, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"om{i}.jpg")
        Image.fromarray(img).save(p)
        paths.append(p)

    params = ExtractorParams(
        yolo=init_yolov5(jax.random.PRNGKey(2), depth_multiple=0.33,
                         width_multiple=0.25),
        resnet=init_resnet(jax.random.PRNGKey(3), stages=(1, 1, 1, 1)))
    feats, poss = extract_split_features(
        paths, extractor_params=params, num_objects=4, batch_size=2,
        num_workers=1, verbose=False)          # 3 batches, last ragged
    for i, p in enumerate(paths):
        f1, p1 = extract_split_features(
            [p], extractor_params=params, num_objects=4, batch_size=2,
            num_workers=2, verbose=False)
        np.testing.assert_allclose(feats[i], f1[0], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(poss[i], p1[0], rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Shard-checkpointed (resumable) extraction — VERDICT r2 #6
# ---------------------------------------------------------------------------

def _fake_extractor(dim=8, slots=3, fail_after=None):
    """extract_fn stub: features encode the global image index so shard
    assembly order is checkable; optionally raises after N calls."""
    calls = {"n": 0, "paths": []}

    def extract(paths, verbose=False, **kw):
        calls["n"] += 1
        calls["paths"].append(list(paths))
        if fail_after is not None and calls["n"] > fail_after:
            raise RuntimeError("simulated crash")
        idx = np.asarray([int(p.split("_")[-1]) for p in paths], np.float32)
        feats = np.tile(idx[:, None, None], (1, slots, dim))
        poss = np.tile(idx[:, None, None] * 10, (1, slots, 4))
        return feats, poss

    extract.calls = calls
    return extract


def test_resumable_extraction_kill_resume(tmp_path):
    from image_caption_tpu.vision.etl import extract_split_features_resumable

    paths = [f"img_{i}" for i in range(10)]
    out = str(tmp_path)

    crashy = _fake_extractor(fail_after=2)
    with pytest.raises(RuntimeError):
        extract_split_features_resumable(
            paths, out_dir=out, split="train", shard_images=3,
            extract_fn=crashy, verbose=False)
    assert crashy.calls["n"] == 3          # shards 0,1 done; 2 crashed

    clean = _fake_extractor()
    feats, poss = extract_split_features_resumable(
        paths, out_dir=out, split="train", shard_images=3,
        extract_fn=clean, verbose=False)
    # resume: only shards 2 and 3 recomputed
    assert clean.calls["n"] == 2
    assert clean.calls["paths"][0][0] == "img_6"
    assert feats.shape == (10, 3, 8)
    np.testing.assert_array_equal(feats[:, 0, 0], np.arange(10))
    np.testing.assert_array_equal(poss[:, 0, 0], np.arange(10) * 10)


def test_resumable_manifest_invalidated_on_shape_change(tmp_path):
    from image_caption_tpu.vision.etl import extract_split_features_resumable

    out = str(tmp_path)
    first = _fake_extractor()
    extract_split_features_resumable(
        [f"img_{i}" for i in range(6)], out_dir=out, split="valid",
        shard_images=3, extract_fn=first, verbose=False)
    assert first.calls["n"] == 2

    # image count changed -> stale manifest -> full re-extract
    second = _fake_extractor()
    feats, _ = extract_split_features_resumable(
        [f"img_{i}" for i in range(9)], out_dir=out, split="valid",
        shard_images=3, extract_fn=second, verbose=False)
    assert second.calls["n"] == 3
    np.testing.assert_array_equal(feats[:, 0, 0], np.arange(9))


def test_resumable_manifest_invalidated_on_config_change(tmp_path):
    """Same images + shard size but a different extraction config must
    re-extract: crop- and roi-mode features have identical [B, S, 2048]
    shapes but are not interchangeable (docs/parity.md) — a resume after
    a config switch must not silently mix semantics across shards."""
    from image_caption_tpu.vision.etl import extract_split_features_resumable

    out = str(tmp_path)
    paths = [f"img_{i}" for i in range(6)]
    first = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=first, verbose=False, feature_mode="crop", max_obj=5)
    assert first.calls["n"] == 2

    second = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=second, verbose=False, feature_mode="roi", max_obj=5)
    assert second.calls["n"] == 2          # full re-extract

    third = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=third, verbose=False, feature_mode="roi", max_obj=5)
    assert third.calls["n"] == 0           # unchanged config resumes


def test_feature_mode_validated():
    from image_caption_tpu.vision.pipeline import validate_feature_mode

    validate_feature_mode("crop")
    validate_feature_mode("roi")
    validate_feature_mode("crop", "FasterRCNN")
    with pytest.raises(ValueError, match="unknown feature_mode"):
        validate_feature_mode("ROI")       # silent-crop-fallback typo
    with pytest.raises(ValueError, match="only implemented for the YOLO"):
        validate_feature_mode("roi", "FasterRCNN")
    # roi sizes must be positive multiples of the 32-px YOLO max stride
    # (a non-multiple silently skews every decoded box)
    validate_feature_mode("roi", roi_trunk_size=448, roi_detect_size=320)
    with pytest.raises(ValueError, match="multiple of 32"):
        validate_feature_mode("roi", roi_detect_size=500)
    with pytest.raises(ValueError, match="multiple of 32"):
        validate_feature_mode("roi", roi_trunk_size=0)


def test_run_etl_valid_only_against_existing_train_artifacts(
        tmp_path, monkeypatch):
    """run_etl(splits=["valid"]) must reuse the train pass's vocab and
    annotation caches instead of asserting (VERDICT r2 weak #5)."""
    import image_caption_tpu.vision.etl as etl_mod
    from image_caption_tpu.config import get_preset
    from image_caption_tpu.utils.io import load_pickle, save_pickle
    from image_caption_tpu.data.vocab import build_vocab

    data_path = str(tmp_path / "data")
    cfg = get_preset("maxlen49_64").with_overrides(**{
        "data.data_path": data_path})

    # pre-existing train artifacts (as a completed train ETL would leave)
    records = {
        "train": [{"caption": "a dog runs", "image_id": 1,
                   "file_name": "img_0"}],
        "valid": [{"caption": "a cat sits", "image_id": 2,
                   "file_name": "img_1"}],
        "test": [{"caption": "a bird flies", "image_id": 3,
                  "file_name": "img_2"}],
    }
    ann = os.path.join(data_path, "annotations")
    os.makedirs(ann, exist_ok=True)
    for split, recs in records.items():
        save_pickle(recs, os.path.join(ann, f"{split}.annotations.pkl"))
    os.makedirs(os.path.join(data_path, "train"), exist_ok=True)
    vocab = build_vocab(["a dog runs", "a cat sits", "a bird flies"],
                        threshold=1)
    save_pickle(vocab, os.path.join(data_path, "train", "word_index.pkl"))

    monkeypatch.setattr(etl_mod, "extract_split_features_resumable",
                        _fake_extractor())
    import image_caption_tpu.vision.pipeline as pipe_mod
    monkeypatch.setattr(pipe_mod, "load_extractor", lambda w: None)

    etl_mod.run_etl(cfg, coco_root=str(tmp_path / "nonexistent-coco"),
                    splits=["valid"])

    vdir = os.path.join(data_path, "valid")
    caps = load_pickle(os.path.join(vdir, "valid.captions.pkl"))
    assert caps.shape[0] == 1
    # vectorized with the TRAIN vocab loaded from disk
    assert caps[0][1] == vocab["a"]
    assert os.path.exists(os.path.join(data_path, "coco-val-df.p"))


def test_resumable_manifest_invalidated_on_weights_or_paths_change(
        tmp_path):
    """The manifest fingerprints the extractor WEIGHTS and the image-path
    list: a crash in random-init smoke mode resumed after installing real
    checkpoints must re-extract (not splice garbage shards onto real
    ones), and a changed path list with the same count must not reuse
    misaligned rows."""
    from image_caption_tpu.vision.etl import extract_split_features_resumable

    out = str(tmp_path)
    paths = [f"img_{i}" for i in range(6)]
    smoke = {"w": np.zeros((4, 4), np.float32)}
    real = {"w": np.ones((4, 4), np.float32)}

    first = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=first, verbose=False, extractor_params=smoke)
    assert first.calls["n"] == 2

    second = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=second, verbose=False, extractor_params=real)
    assert second.calls["n"] == 2          # weights changed: re-extract

    third = _fake_extractor()
    extract_split_features_resumable(
        paths, out_dir=out, split="valid", shard_images=3,
        extract_fn=third, verbose=False, extractor_params=real)
    assert third.calls["n"] == 0           # same weights: resume

    fourth = _fake_extractor()
    extract_split_features_resumable(
        [f"other_{i}" for i in range(6)], out_dir=out, split="valid",
        shard_images=3, extract_fn=fourth, verbose=False,
        extractor_params=real)
    assert fourth.calls["n"] == 2          # same count, new paths


def test_run_etl_refuses_multiprocess(monkeypatch):
    """Pod launches must fail fast on EVERY process: a process-0-only ETL
    leaves the other processes exiting through the jax.distributed
    shutdown barrier that process 0 (days of extraction ahead) never
    reaches, which tears the coordination service down under it."""
    import jax

    import image_caption_tpu.vision.etl as etl_mod
    from image_caption_tpu.config import get_preset

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(RuntimeError, match="single-process"):
        etl_mod.run_etl(get_preset("maxlen49_64"), coco_root="/nowhere")


def test_run_etl_skips_completed_split(tmp_path, monkeypatch):
    """A split whose final .hkl artifacts already exist (row count
    matching its caption artifacts) must not re-extract — its shard
    manifest was cleaned on completion, so this is the only thing saving
    a finished days-scale train split when the job later crashes during
    valid.  Mismatched row counts DO re-extract."""
    import image_caption_tpu.vision.etl as etl_mod
    from image_caption_tpu.config import get_preset
    from image_caption_tpu.utils.io import save_hkl, save_pickle
    from image_caption_tpu.data.vocab import build_vocab

    data_path = str(tmp_path / "data")
    cfg = get_preset("maxlen49_64").with_overrides(**{
        "data.data_path": data_path})
    ann = os.path.join(data_path, "annotations")
    os.makedirs(ann, exist_ok=True)
    save_pickle([{"caption": "a dog runs", "image_id": 1,
                  "file_name": "img_0"}],
                os.path.join(ann, "train.annotations.pkl"))
    save_pickle([{"caption": "a cat sits", "image_id": 2,
                  "file_name": "img_1"}],
                os.path.join(ann, "valid.annotations.pkl"))
    save_pickle([{"caption": "a bird flies", "image_id": 3,
                  "file_name": "img_2"}],
                os.path.join(ann, "test.annotations.pkl"))
    os.makedirs(os.path.join(data_path, "train"), exist_ok=True)
    save_pickle(build_vocab(["a cat sits"], threshold=1),
                os.path.join(data_path, "train", "word_index.pkl"))

    fake = _fake_extractor()
    monkeypatch.setattr(etl_mod, "extract_split_features_resumable", fake)
    import image_caption_tpu.vision.pipeline as pipe_mod
    monkeypatch.setattr(pipe_mod, "load_extractor", lambda w: None)

    etl_mod.run_etl(cfg, coco_root="/nowhere", splits=["valid"])
    assert fake.calls["n"] == 1
    assert os.path.exists(
        os.path.join(data_path, "valid", "valid.features.hkl"))

    etl_mod.run_etl(cfg, coco_root="/nowhere", splits=["valid"])
    assert fake.calls["n"] == 1            # second run: skipped

    # stale artifacts (wrong row count) are re-extracted
    save_hkl(np.zeros((3, 2, 8), np.float32),
             os.path.join(data_path, "valid", "valid.features.hkl"))
    etl_mod.run_etl(cfg, coco_root="/nowhere", splits=["valid"])
    assert fake.calls["n"] == 2

    # a config switch (crop -> roi) must re-extract even though the row
    # count still matches: the stored semantic fingerprint mismatches
    # (crop/roi features are NOT interchangeable, docs/parity.md)
    cfg_roi = cfg.with_overrides(**{"data.feature_mode": "roi"})
    etl_mod.run_etl(cfg_roi, coco_root="/nowhere", splits=["valid"])
    assert fake.calls["n"] == 3

    # pre-fingerprint datasets (no meta file) keep the legacy
    # row-count-only skip (loudly), instead of nuking days-scale work
    os.remove(os.path.join(data_path, "valid", "valid.features.meta.json"))
    etl_mod.run_etl(cfg_roi, coco_root="/nowhere", splits=["valid"])
    assert fake.calls["n"] == 3
