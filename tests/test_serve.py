"""Batch-captioning serving path (serve.py): images -> captions through
the pipelined load->extract->decode program, on tiny random backbones.

The reference's only image->caption path is the per-image demo
(main.py:193-247); serve.caption_images is the batched equivalent, so
the contract to pin is alignment (caption i belongs to image i) and
batch-size invariance (the static-shape padding of the ragged final
batch and the software pipelining must not change any output).
"""

import os

import numpy as np
import pytest

import jax

from image_caption_tpu.config import get_preset
from image_caption_tpu.data.vocab import invert_vocab
from image_caption_tpu.models.captioner import init_captioner
from image_caption_tpu.serve import caption_images, list_images
from image_caption_tpu.vision.pipeline import ExtractorParams


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_preset("maxlen49_64").with_overrides(**{
        "model.num_vocab": 40,
        "model.num_objects": 4,
        "model.max_length": 13,
    })


@pytest.fixture(scope="module")
def tiny_setup(tiny_cfg, tmp_path_factory):
    from PIL import Image
    from image_caption_tpu.vision.resnet import init_resnet
    from image_caption_tpu.vision.yolov5 import init_yolov5

    tmp = tmp_path_factory.mktemp("serve_imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        img = (rng.rand(40 + 8 * i, 56 + 4 * i, 3) * 255).astype(np.uint8)
        p = str(tmp / f"im{i}.jpg")
        Image.fromarray(img).save(p)
        paths.append(p)

    extractor = ExtractorParams(
        yolo=init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                         width_multiple=0.25),
        resnet=init_resnet(jax.random.PRNGKey(1), stages=(1, 1, 1, 1)))
    captioner = init_captioner(jax.random.PRNGKey(2), tiny_cfg.model)
    # random-init params emit ids across the whole vocab range — cover it
    vocab = {"<NULL>": 0, "<START>": 1, "<END>": 2, "<UNK>": 3}
    vocab.update({f"w{i}": i for i in range(4, tiny_cfg.model.num_vocab)})
    return paths, extractor, captioner, invert_vocab(vocab)


def test_caption_images_greedy_batch_invariant(tiny_cfg, tiny_setup):
    paths, extractor, captioner, idx_to_word = tiny_setup
    kw = dict(extractor_params=extractor, use_pallas=False, num_workers=2)
    # batch 2 -> batches (2, 2, 1-padded); batch 5 -> one full batch
    ragged = caption_images(tiny_cfg, paths, captioner, idx_to_word,
                            batch_size=2, **kw)
    full = caption_images(tiny_cfg, paths, captioner, idx_to_word,
                          batch_size=5, **kw)
    assert len(ragged) == len(paths)
    assert all(isinstance(c, str) for c in ragged)
    assert ragged == full


def test_caption_images_beam_and_progress(tiny_cfg, tiny_setup):
    paths, extractor, captioner, idx_to_word = tiny_setup
    seen = []
    caps = caption_images(tiny_cfg, paths, captioner, idx_to_word,
                          extractor_params=extractor, beam_size=2,
                          batch_size=3, use_pallas=False, num_workers=2,
                          progress=lambda done, n: seen.append((done, n)))
    assert len(caps) == len(paths)
    assert all(isinstance(c, str) for c in caps)
    assert seen == [(3, 5), (5, 5)]


def test_caption_images_sharded_matches_single(tiny_cfg, tiny_setup):
    """8-device mesh serving (extraction + decode sharded over `data`,
    params replicated) must produce exactly the single-device captions —
    GSPMD sharding is a pure layout change."""
    from image_caption_tpu.parallel import mesh as pmesh
    paths, extractor, captioner, idx_to_word = tiny_setup
    kw = dict(extractor_params=extractor, use_pallas=False, num_workers=2,
              batch_size=8, beam_size=2)   # 5 images pad to one batch of 8
    single = caption_images(tiny_cfg, paths, captioner, idx_to_word, **kw)
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    sharded = caption_images(tiny_cfg, paths, captioner, idx_to_word,
                             mesh=mesh, **kw)
    assert sharded == single


def test_decode_placement_rules_and_cache(tiny_cfg):
    """The shared decode eligibility rule (train/loop.decode_split +
    serve.caption_images): ineligible meshes return the params untouched
    with place=None; eligible meshes replicate via the identity cache, so
    a second call (the per-request serving pattern) returns the SAME
    replicated pytree without re-broadcasting."""
    import jax
    from image_caption_tpu.models.captioner import init_captioner
    from image_caption_tpu.parallel import mesh as pmesh

    params = init_captioner(jax.random.PRNGKey(0), tiny_cfg.model)
    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8

    p2, place = pmesh.decode_placement(None, params, 8)
    assert p2 is params and place is None              # no mesh
    p2, place = pmesh.decode_placement(mesh, params, 12)
    assert p2 is params and place is None              # 12 % 8 != 0

    r1, place = pmesh.decode_placement(mesh, params, 8)
    assert place is not None
    leaf = jax.tree_util.tree_leaves(r1)[0]
    assert leaf.sharding == pmesh.replicated(mesh)
    placed = place(np.zeros((8, 3), np.float32))
    assert placed.sharding == pmesh.data_sharding(mesh)
    r2, _ = pmesh.decode_placement(mesh, params, 8)
    assert jax.tree_util.tree_leaves(r2)[0] is leaf    # cache hit


def test_caption_images_skip_errors(tiny_cfg, tiny_setup, tmp_path):
    """skip_errors: a corrupt file yields None (an error JSONL record)
    without failing the run or disturbing its neighbors' captions; the
    default mode fails loud."""
    from image_caption_tpu.serve import caption_images_to_jsonl
    paths, extractor, captioner, idx_to_word = tiny_setup
    bad = str(tmp_path / "corrupt.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg at all")
    mixed = [paths[0], bad, paths[1]]
    kw = dict(extractor_params=extractor, use_pallas=False, num_workers=2,
              batch_size=3)
    with pytest.raises(Exception):
        caption_images(tiny_cfg, mixed, captioner, idx_to_word, **kw)
    streamed = []
    caps = caption_images(tiny_cfg, mixed, captioner, idx_to_word,
                          skip_errors=True,
                          on_batch=lambda s, c: streamed.append((s, c)),
                          **kw)
    assert streamed == [(0, caps)]     # per-batch streaming callback
    clean = caption_images(tiny_cfg, [paths[0], paths[1]], captioner,
                           idx_to_word, batch_size=2, **{
                               k: v for k, v in kw.items()
                               if k != "batch_size"})
    assert caps[1] is None
    assert [caps[0], caps[2]] == clean
    lines = list(caption_images_to_jsonl(mixed, caps))
    assert "error" in lines[1] and "caption" in lines[0]


def test_list_images_sorted_and_filtered(tmp_path):
    for name in ("b.jpg", "a.PNG", "c.txt", "d.jpeg"):
        (tmp_path / name).write_bytes(b"x")
    # a DIRECTORY named like an image must be excluded — feeding it to
    # the loader would kill a fail-loud run on a non-image
    (tmp_path / "thumbnails.jpg").mkdir()
    got = [os.path.basename(p) for p in list_images(str(tmp_path))]
    assert got == ["a.PNG", "b.jpg", "d.jpeg"]


def test_caption_subcommand_parses():
    from image_caption_tpu.main import build_parser
    args = build_parser().parse_args(
        ["caption", "--image-dir", "/tmp/x", "--beam-size", "3",
         "--batch-size", "8", "--out", "/tmp/c.jsonl"])
    assert callable(args.fn)
    assert args.beam_size == 3 and args.out == "/tmp/c.jsonl"
