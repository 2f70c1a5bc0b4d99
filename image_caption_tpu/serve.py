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
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(image_dir: str) -> List[str]:
    """Deterministic (sorted) image listing, non-recursive — the order IS
    the output order."""
    return sorted(
        os.path.join(image_dir, f) for f in os.listdir(image_dir)
        if f.lower().endswith(IMAGE_EXTS))


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
    import functools

    import jax
    import jax.numpy as jnp
    from .data.vocab import decode_captions
    from .models.decoding import beam_score_mode, beam_search, greedy_decode
    from .vision.loader import load_letterboxed_batch
    from .parallel import mesh as pmesh
    from .vision.pipeline import (extract_features_batch,
                                  extract_features_frcnn,
                                  extract_features_roi,
                                  extract_features_sharded, load_extractor,
                                  load_frcnn_extractor,
                                  validate_feature_mode)

    d = cfg.data
    image_model = d.image_model
    validate_feature_mode(feature_mode, image_model,
                          roi_trunk_size=d.roi_trunk_size,
                          roi_detect_size=d.roi_detect_size)
    frcnn = image_model == "FasterRCNN"
    canvas_size = 800 if frcnn else 640
    if extractor_params is None:
        extractor_params = (load_frcnn_extractor(weights_dir) if frcnn
                            else load_extractor(weights_dir))

    m = cfg.model
    n = len(image_paths)
    captions: List[Optional[str]] = [None] * n

    sharded = (mesh is not None and mesh.devices.size > 1 and not frcnn
               and jax.process_count() == 1
               and batch_size % mesh.shape[pmesh.DATA_AXIS] == 0)
    if sharded:
        captioner_params = jax.device_put(captioner_params,
                                          pmesh.replicated(mesh))
        use_pallas = False

    # same two-pool layout as the ETL: per-image decodes fan out on
    # io_pool; batch_pool's single thread runs load_batch itself (one
    # shared pool deadlocks at num_workers=1)
    io_pool = ThreadPoolExecutor(max(1, num_workers))
    batch_pool = ThreadPoolExecutor(1)

    def load_batch(start: int) -> Tuple[np.ndarray, np.ndarray,
                                        np.ndarray, int, List[int]]:
        paths = image_paths[start:start + batch_size]
        failed: List[int] = []
        if skip_errors:
            canvases, metas, sizes, ok = load_letterboxed_batch(
                paths, canvas_size, rect=d.rect_letterbox and not frcnn,
                nthreads=num_workers, io_pool=io_pool, return_ok=True)
            failed = np.nonzero(~ok)[0].tolist()
        else:
            canvases, metas, sizes = load_letterboxed_batch(
                paths, canvas_size, rect=d.rect_letterbox and not frcnn,
                nthreads=num_workers, io_pool=io_pool)
        real = len(paths)
        if real < batch_size:          # static-shape pad
            reps = batch_size - real
            canvases = np.concatenate(
                [canvases, np.repeat(canvases[:1], reps, 0)])
            metas = np.concatenate([metas, np.repeat(metas[:1], reps, 0)])
            sizes = np.concatenate([sizes, np.repeat(sizes[:1], reps, 0)])
        return canvases, metas, sizes, real, failed

    def extract(canvases, metas, sizes):
        kw = dict(num_objects=m.num_objects)
        if frcnn:
            fn = extract_features_frcnn
            kw["canvas"] = canvas_size
        else:
            kw["max_obj"] = max_obj
            if feature_mode == "roi":
                fn = extract_features_roi
                kw.update(trunk_size=d.roi_trunk_size,
                          detect_size=d.roi_detect_size)
            else:
                fn = extract_features_batch
            if sharded:
                fn = functools.partial(extract_features_sharded, mesh,
                                       feature_mode=feature_mode)
        feats, poss, _ = fn(extractor_params, jnp.asarray(canvases),
                            jnp.asarray(metas), jnp.asarray(sizes), **kw)
        # the captioner consumes the model's position width (84 YOLO /
        # 95 FRCNN); extraction emits exactly that for the matching model
        return (feats.astype(jnp.float32),
                poss[:, :, :m.dim_positions].astype(jnp.float32))

    def decode(feats, poss) -> np.ndarray:
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

    starts = list(range(0, n, batch_size))
    try:
        next_fut = batch_pool.submit(load_batch, starts[0]) if starts \
            else None
        for i, start in enumerate(starts):
            canvases, metas, sizes, real, failed = next_fut.result()
            if i + 1 < len(starts):     # host loads k+1 while device runs k
                next_fut = batch_pool.submit(load_batch, starts[i + 1])
            tokens = decode(*extract(canvases, metas, sizes))
            batch_caps = decode_captions(tokens[:real], idx_to_word)
            for j in failed:
                batch_caps[j] = None
            for j, cap in enumerate(batch_caps):
                captions[start + j] = cap
            if progress is not None:
                progress(start + real, n)
    finally:
        batch_pool.shutdown()
        io_pool.shutdown()
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
