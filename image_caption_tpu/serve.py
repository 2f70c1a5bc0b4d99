"""Batch captioning: image files -> caption strings in one streaming
pipeline (host decode pool -> one-program extraction -> KV-cached decode).

The reference's only image->caption path is the single-image ``demo``,
which reloads BOTH backbone checkpoints per call
(``/root/reference/main.py:193-247``, ``core/preprocess.py:95``,
``detect_for_preprocess.py:47``).  This module is the production-serving
equivalent: weights load once, images stream through the same software
pipeline the offline ETL uses (host threads decode batch k+1 while the
device runs batch k — ``vision/etl.py``), features go straight into the
KV-cached greedy/beam decoder without touching disk, and the final
partial batch pads to the static shape so every dispatch hits the same
compiled program.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(image_dir: str) -> List[str]:
    """Deterministic (sorted) image listing, non-recursive — the order IS
    the output order.  Regular files only: a directory named
    'thumbnails.jpg' would otherwise kill a fail-loud run."""
    return sorted(
        p for f in os.listdir(image_dir)
        if f.lower().endswith(IMAGE_EXTS)
        and os.path.isfile(p := os.path.join(image_dir, f)))


def caption_images(cfg, image_paths: Sequence[str],
                   captioner_params, idx_to_word: Dict[int, str], *,
                   extractor_params=None,
                   weights_dir: Optional[str] = None,
                   beam_size: Optional[int] = None,
                   batch_size: int = 32,
                   max_obj: Optional[int] = None,
                   feature_mode: str = "crop",
                   num_workers: int = 8,
                   use_pallas: bool = True,
                   mesh=None,
                   skip_errors: bool = False,
                   on_batch: Optional[Callable[[int, List[Optional[str]]],
                                               None]] = None,
                   progress: Optional[Callable[[int, int], None]] = None
                   ) -> List[Optional[str]]:
    """Caption every image, streaming in ``batch_size`` chunks.

    Returns captions aligned with ``image_paths``.  ``beam_size`` None/1 =
    greedy (``generate_caption`` dispatch parity, core/models.py:37-56);
    the beam score mode follows ``cfg.caption_model`` exactly like the
    evaluation path.  ``feature_mode='roi'`` selects the shared-trunk fast
    extraction (docs/parity.md fidelity caveat: the captioner must have
    been TRAINED on roi features).

    With a ``mesh`` of >1 devices (single-process, YOLO path,
    ``batch_size`` divisible by the ``data`` axis), both the extraction
    program and the decoder shard each batch over ``data`` with params
    replicated — serving scales across the slice with zero collectives,
    and the sharded features flow into the decoder without a host
    round-trip.  The Pallas attention kernel is bypassed on that path
    (mosaic custom calls carry no SPMD partitioning rule; XLA is at
    decode parity — docs/performance.md).

    ``skip_errors=True``: an unreadable/corrupt image doesn't fail the
    run — its slot decodes against a gray canvas and returns ``None``
    (the caller sees exactly which inputs failed).  Default is
    fail-loud, NOT the reference's silent ``except: continue``
    (detect_for_preprocess.py:116-124).
    """
    import jax.numpy as jnp
    from .data.vocab import decode_captions
    from .models.decoding import beam_score_mode, beam_search, greedy_decode
    from .parallel import mesh as pmesh
    from .vision.etl import stream_extracted_batches

    d = cfg.data
    frcnn = d.image_model == "FasterRCNN"
    m = cfg.model
    n = len(image_paths)
    captions: List[Optional[str]] = [None] * n

    # shared eligibility rule + cached params broadcast (a per-request
    # caller must not pay a full pytree broadcast every call); the decode
    # consumes the extraction program's already-data-sharded outputs, so
    # the per-batch `place` is unused here
    sharded = False
    if not frcnn:
        captioner_params, place = pmesh.decode_placement(
            mesh, captioner_params, batch_size)
        sharded = place is not None
        if sharded:
            use_pallas = False           # see decode_placement docstring

    def decode(feats, poss) -> np.ndarray:
        # the captioner consumes the model's position width (84 YOLO /
        # 95 FRCNN); extraction emits exactly that for the matching model
        feats = feats.astype(jnp.float32)
        poss = poss[:, :, :m.dim_positions].astype(jnp.float32)
        if beam_size is None or beam_size <= 1:
            tokens, _ = greedy_decode(captioner_params, m, feats, poss,
                                      use_pallas=use_pallas)
        else:
            tokens = beam_search(captioner_params, m, feats, poss,
                                 beam_size=beam_size,
                                 score_mode=beam_score_mode(
                                     cfg.caption_model),
                                 use_pallas=use_pallas)
        return np.asarray(tokens)

    # the sharded features flow straight from the extraction program into
    # the decoder — no host round-trip between the two device programs
    stream = stream_extracted_batches(
        image_paths, extractor_params=extractor_params,
        weights_dir=weights_dir, num_objects=m.num_objects,
        max_obj=max_obj, batch_size=batch_size, num_workers=num_workers,
        image_model=d.image_model, rect_letterbox=d.rect_letterbox,
        feature_mode=feature_mode, roi_trunk_size=d.roi_trunk_size,
        roi_detect_size=d.roi_detect_size,
        mesh=mesh if sharded else None, skip_errors=skip_errors)
    for start, real, failed, feats, poss in stream:
        batch_caps = decode_captions(decode(feats, poss)[:real],
                                     idx_to_word)
        for j in failed:
            batch_caps[j] = None
        for j, cap in enumerate(batch_caps):
            captions[start + j] = cap
        if on_batch is not None:       # stream results out per batch
            on_batch(start, batch_caps)
        if progress is not None:
            progress(start + real, n)
    assert skip_errors or all(c is not None for c in captions)
    return captions


def caption_images_to_jsonl(paths: Sequence[str],
                            captions: Sequence[Optional[str]]
                            ) -> Iterator[str]:
    """One JSON object per image, aligned with the input order.  A
    ``None`` caption (a skipped unreadable image) becomes an ``error``
    record."""
    import json
    for p, c in zip(paths, captions):
        if c is None:
            yield json.dumps({"image": p, "error": "unreadable image"})
        else:
            yield json.dumps({"image": p, "caption": c})
