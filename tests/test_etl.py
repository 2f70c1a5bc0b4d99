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
