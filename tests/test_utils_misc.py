"""Small utility coverage: prefetcher, overlays, step timer, synthetic data."""

import os
import time

import numpy as np
import pytest


def test_prefetcher_preserves_order_and_transform():
    from image_caption_tpu.data.prefetch import Prefetcher
    items = list(range(20))
    out = list(Prefetcher(items, depth=3, transform=lambda x: x * 2))
    assert out == [x * 2 for x in items]


def test_prefetcher_propagates_errors():
    from image_caption_tpu.data.prefetch import Prefetcher

    def gen():
        yield 1
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(Prefetcher(gen()))


def test_step_timer_excludes_compile_step():
    from image_caption_tpu.utils.debug import StepTimer
    t = StepTimer()
    time.sleep(0.05)          # "compile"
    t.step()
    for _ in range(3):
        time.sleep(0.01)
        t.step()
    assert t.compile_seconds >= 0.05
    assert t.steps_per_sec is not None
    assert 10 < t.steps_per_sec < 1000


def test_attention_overlays_written(tmp_path):
    from PIL import Image
    from image_caption_tpu.vision.overlay import save_attention_overlays

    img = (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(src)

    attention = np.random.RandomState(1).rand(4, 4).astype(np.float32)
    boxes = np.asarray([[5, 5, 25, 25], [30, 10, 55, 35], [0, 0, 0, 0]],
                       np.float32)
    paths = save_attention_overlays(src, attention, boxes,
                                    "a red box here .", str(tmp_path / "o"))
    assert len(paths) == 4
    assert all(os.path.exists(p) for p in paths)
    assert os.path.basename(paths[0]) == "0_a.jpg"
    assert os.path.basename(paths[-1]).endswith("_here.jpg")


def test_detection_overlay_written(tmp_path):
    from PIL import Image
    from image_caption_tpu.vision.overlay import save_detection_overlay

    img = (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)
    src = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(src)

    p = save_detection_overlay(src, np.asarray([[5, 5, 30, 30]], np.float32),
                               np.asarray([0.9]), np.asarray([0]),
                               str(tmp_path / "d"))
    assert os.path.exists(p)
    labels = (tmp_path / "d" / "labels_img.txt").read_text()
    assert labels.startswith("person ")


def test_synthetic_dataset_loads_back(tmp_path):
    from image_caption_tpu.data.dataset import load_split
    from image_caption_tpu.data.synthetic import generate_synthetic_dataset

    vocab = generate_synthetic_dataset(
        str(tmp_path), num_images={"train": 4, "valid": 2},
        captions_per_image=2)
    split = load_split(str(tmp_path), "train", verbose=False,
                       load_references=True)
    assert split.num_images == 4
    assert split.num_captions == 8
    assert split.word_to_idx == vocab
    assert split.references is not None
    assert split.features.shape[1:] == (37, 2048)


def test_streamed_split_matches_eager(tmp_path):
    """VERDICT r1 #6: streamed (HDF5-sliced) feature reads produce the
    same batches as eager in-RAM arrays, including unsorted/repeated
    per-caption image gathers."""
    import numpy as np
    from image_caption_tpu.data.dataset import (CaptionBatches, ImageBatches,
                                                load_split)
    from image_caption_tpu.utils.io import save_hkl, save_pickle

    rng = np.random.RandomState(0)
    n_img, n_cap, s, f, p, L = 7, 19, 5, 16, 8, 10
    d = tmp_path / "train"
    save_hkl(rng.randn(n_img, s, f).astype(np.float32),
             str(d / "train.features.hkl"))
    save_hkl(rng.rand(n_img, s, p).astype(np.float32),
             str(d / "train.positions.hkl"))
    save_pickle(rng.randint(0, 30, size=(n_cap, L)).astype(np.int32),
                str(d / "train.captions.pkl"))
    save_pickle(rng.randint(0, n_img, size=n_cap),
                str(d / "train.image.indices.pkl"))
    save_pickle(np.array([f"img{i}.jpg" for i in range(n_img)]),
                str(d / "train.file.names.pkl"))
    save_pickle({"<NULL>": 0, "<START>": 1}, str(d / "word_index.pkl"))

    eager = load_split(str(tmp_path), "train", verbose=False,
                       streaming="never")
    lazy = load_split(str(tmp_path), "train", verbose=False,
                      streaming="always")
    assert lazy.num_images == n_img and lazy.num_captions == n_cap
    assert not isinstance(lazy.features, np.ndarray)

    for mk in (lambda sp: CaptionBatches(sp, batch_size=4, shuffle=True,
                                         seed=3),
               lambda sp: ImageBatches(sp, batch_size=4)):
        for be, bl in zip(mk(eager), mk(lazy)):
            for a, b in zip(be, bl):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
