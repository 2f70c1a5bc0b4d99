"""Whole-stack drive with NO mocked pipeline stages: JPEGs on disk ->
``features`` (caption ETL + real detect->crop->encode extraction) ->
``train`` -> ``evaluation``, all through the CLI entry point.

This pins the seam the unit tests cover only piecewise: the artifacts
``run_etl`` writes are exactly what ``load_split`` + the train loop +
the metric harness consume (the reference's features.py -> main.py
handoff).  The only injection is tiny random backbone weights
(full-size YOLOv5x + ResNet-101 random-init would waste minutes of CPU
for identical coverage).
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def coco_tree(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(7)
    words = ["red", "blue", "box", "dog", "cat", "sits", "runs", "small",
             "big", "on", "a", "the"]

    def make_images(sub, n, start):
        d = tmp_path / "coco" / "image" / sub
        d.mkdir(parents=True)
        images, annotations = [], []
        for i in range(n):
            iid = start + i
            name = f"{iid:012d}.jpg"
            img = (rng.rand(48 + 8 * (i % 3), 64 + 4 * (i % 2), 3) * 255
                   ).astype(np.uint8)
            Image.fromarray(img).save(str(d / name))
            images.append({"id": iid, "file_name": name})
            for k in range(2):       # two captions per image
                cap = " ".join(rng.choice(words, size=4 + (i + k) % 3))
                annotations.append({"image_id": iid, "caption": cap})
        return {"images": images, "annotations": annotations}

    ann = tmp_path / "coco" / "annotations"
    ann.mkdir(parents=True)
    (ann / "captions_train2017.json").write_text(
        json.dumps(make_images("train2017", 6, 100)))
    (ann / "captions_val2017.json").write_text(
        json.dumps(make_images("val2017", 4, 500)))
    return str(tmp_path / "coco")


@pytest.mark.slow
def test_features_train_evaluation_cli(coco_tree, tmp_path, monkeypatch,
                                       capsys):
    import jax
    from image_caption_tpu import main as cli
    from image_caption_tpu.utils.io import load_pickle
    from image_caption_tpu.vision import pipeline as pl
    from image_caption_tpu.vision.resnet import init_resnet
    from image_caption_tpu.vision.yolov5 import init_yolov5

    tiny = pl.ExtractorParams(
        yolo=init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                         width_multiple=0.25),
        resnet=init_resnet(jax.random.PRNGKey(1), stages=(1, 1, 1, 1)))
    monkeypatch.setattr(pl, "load_extractor", lambda weights_dir: tiny)

    data, out = str(tmp_path / "data"), str(tmp_path / "out")
    base = ["--preset", "maxlen49_64", "--data-path", data,
            "--output-path", out]

    cli.main(base + ["features", "--coco-root", coco_tree,
                     "--batch-size", "4"])

    word_index = load_pickle(os.path.join(data, "train", "word_index.pkl"))
    assert word_index["<NULL>"] == 0 and len(word_index) <= 16
    feats = ["--set", f"model.num_vocab={len(word_index)}"]
    for split, n_img in (("train", 6), ("valid", 2), ("test", 2)):
        from image_caption_tpu.utils.io import load_hkl
        f = load_hkl(os.path.join(data, split, f"{split}.features.hkl"))
        assert f.shape == (n_img, 37, 2048) and np.isfinite(f).all()

    cli.main(base + feats + ["--set", "train.batch_size=8",
                             "train", "--epochs", "1"])
    assert os.path.exists(os.path.join(out, "model", "1"))

    cli.main(base + feats + ["evaluation", "--split", "test",
                             "--beam-size", "2"])
    assert os.path.exists(os.path.join(
        out, "candidates", "test.candidate.captions.pkl"))
    cands = load_pickle(os.path.join(
        out, "candidates", "test.candidate.captions.pkl"))
    assert len(cands) == 2 and all(isinstance(c, str) for c in cands)
    assert "CIDEr" in capsys.readouterr().out

    # serving verb: same trained checkpoint captions raw JPEGs from disk
    # (the val dir ETL'd above) straight through load->extract->decode
    jsonl = str(tmp_path / "caps.jsonl")
    cli.main(base + feats + [
        "caption", "--image-dir", os.path.join(coco_tree, "image",
                                               "val2017"),
        "--out", jsonl, "--batch-size", "3", "--beam-size", "2"])
    rows = [json.loads(ln) for ln in open(jsonl)]
    assert len(rows) == 4
    assert all(r["caption"] and r["image"].endswith(".jpg") for r in rows)

    # demo verb: one raw image -> caption + detection/attention overlays
    # (main.py:193-247 parity surface; writes under ./demo relative to cwd)
    val_dir = os.path.join(coco_tree, "image", "val2017")
    img0 = os.path.join(val_dir, sorted(os.listdir(val_dir))[0])
    monkeypatch.chdir(tmp_path)
    cli.main(base + feats + ["demo", "--image-path", img0, "--save-img"])
    stem = os.path.splitext(os.path.basename(img0))[0]
    demo_dir = tmp_path / "demo" / stem / "YOLOv5"
    assert demo_dir.is_dir() and any(demo_dir.iterdir())
