"""Offline dataset build — the ``features.py`` driver, TPU-batched.

Reproduces the reference ETL outputs exactly (caption pickles, vocab,
references, ``.hkl`` feature shards — ``/root/reference/features.py:16-119``)
while replacing the compute path: the reference reloads YOLOv5x and
ResNet-101 *per image* and runs crops one at a time
(``core/preprocess.py:95``, ``detect_for_preprocess.py:47``); here weights
load once, a host thread pool decodes + letterboxes images, and the whole
detect -> crop -> encode pipeline runs as one jitted program per batch.

Caption processing (``process_caption_data``, core/preprocess.py:224-281):
COCO captions JSON -> (caption, image_id, file_name) records sorted by
image_id, cleaned, tokenized, and dropped if longer than ``max_length``.
val2017 is split 50/50 into valid/test (features.py:40-47).
"""

from __future__ import annotations

import hashlib
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from ..data.tokenizer import clean_caption, tokenize_caption
from ..data.vocab import build_caption_vector, build_vocab
from ..utils.io import save_hkl, save_pickle
from .loader import load_letterboxed_batch


# ---------------------------------------------------------------------------
# Caption ETL (host-only)
# ---------------------------------------------------------------------------

def process_caption_data(caption_file: str, image_dir: str,
                         max_length: int = 49) -> List[Dict]:
    """COCO captions JSON -> records [{caption, image_id, file_name}],
    sorted by image_id, length-filtered (core/preprocess.py:224-281)."""
    with open(caption_file) as f:
        coco = json.load(f)
    id_to_file = {img["id"]: os.path.join(image_dir, img["file_name"])
                  for img in coco["images"]}
    records = []
    for ann in coco["annotations"]:
        caption = clean_caption(ann["caption"].replace("\n", " ")).lower()
        tokens = tokenize_caption(ann["caption"])
        if len(tokens) > max_length:
            continue
        records.append({"caption": caption,
                        "image_id": ann["image_id"],
                        "file_name": id_to_file[ann["image_id"]]})
    records.sort(key=lambda r: r["image_id"])
    return records


def build_file_names(records: Sequence[Dict]
                     ) -> Tuple[np.ndarray, Dict[int, int]]:
    """Unique file names per image_id in first-seen order + id->dense index
    (core/preprocess.py:348-360)."""
    file_names, id_index = [], {}
    for r in records:
        if r["image_id"] not in id_index:
            id_index[r["image_id"]] = len(file_names)
            file_names.append(r["file_name"])
    return np.asarray(file_names), id_index


def build_image_indices(records: Sequence[Dict],
                        id_index: Dict[int, int]) -> np.ndarray:
    """Per-caption dense image index (core/preprocess.py:363-373)."""
    return np.asarray([id_index[r["image_id"]] for r in records],
                      dtype=np.int64)


def build_references(records: Sequence[Dict]) -> Dict[int, List[str]]:
    """Per-image reference captions ``caption.lower() + ' .'`` keyed by
    dense index (features.py:69-83)."""
    refs: Dict[int, List[str]] = {}
    seen: Dict[int, int] = {}
    for r in records:
        if r["image_id"] not in seen:
            seen[r["image_id"]] = len(refs)
            refs[seen[r["image_id"]]] = []
        refs[seen[r["image_id"]]].append(r["caption"].lower() + " .")
    return refs


# ---------------------------------------------------------------------------
# Image feature extraction (host IO pool + device batches)
# ---------------------------------------------------------------------------



def stream_extracted_batches(image_paths: Sequence[str], *,
                             extractor_params=None,
                             weights_dir: Optional[str] = None,
                             num_objects: int = 36,
                             max_obj: Optional[int] = None,
                             batch_size: int = 128,
                             num_workers: int = 8,
                             image_model: str = "YOLOv5",
                             rect_letterbox: bool = False,
                             feature_mode: str = "crop",
                             roi_trunk_size: int = 448,
                             roi_detect_size: Optional[int] = 320,
                             mesh=None,
                             skip_errors: bool = False):
    """The shared host->device extraction pipeline: yields
    ``(start, real, failed, feats, poss)`` per ``batch_size`` chunk.

    Host threads decode + letterbox batch k+1 while the device extracts
    batch k (the reference serializes everything per IMAGE —
    features.py:87-119 with per-item preprocess); the final ragged batch
    pads to the static shape with benign repeated rows (``real`` rows are
    valid).  ``feats``/``poss`` are device arrays not yet fetched — the
    consumer chooses when to sync (the offline ETL drains one batch
    behind the device; serving feeds them straight into the decoder).

    ``mesh``: data-parallelize the device program (batch_size must divide
    the ``data`` axis).  ``skip_errors``: unreadable images yield a gray
    canvas and their batch-relative indices in ``failed`` instead of
    raising (the serving contract; the ETL keeps the fail-loud default).
    """
    import functools
    import jax.numpy as jnp
    from .pipeline import (extract_features_batch, extract_features_frcnn,
                           extract_features_roi, extract_features_sharded,
                           load_extractor, load_frcnn_extractor,
                           validate_feature_mode)

    # fail fast here too, not just in run_etl — a direct caller passing
    # feature_mode='roi' with the FRCNN model would otherwise silently
    # get FRCNN features (the frcnn branch below wins)
    validate_feature_mode(feature_mode, image_model,
                          roi_trunk_size=roi_trunk_size,
                          roi_detect_size=roi_detect_size)
    frcnn = image_model == "FasterRCNN"
    canvas_size = 800 if frcnn else 640
    if extractor_params is None:
        extractor_params = (load_frcnn_extractor(weights_dir) if frcnn
                            else load_extractor(weights_dir))

    # two pools: per-image decodes fan out on io_pool, while batch_pool's
    # single thread runs load_batch itself — submitting load_batch to the
    # SAME pool it maps over deadlocks at num_workers=1 (the lone worker
    # would wait on map tasks that can never be scheduled)
    io_pool = ThreadPoolExecutor(max(1, num_workers))
    batch_pool = ThreadPoolExecutor(1)

    def load_batch(start):
        paths = image_paths[start:start + batch_size]
        # native C++ decode+letterbox when built (bit-identical to the
        # PIL path — tests/test_native_loader.py), PIL thread pool
        # otherwise
        failed: List[int] = []
        if skip_errors:
            canvases, metas, sizes, ok = load_letterboxed_batch(
                paths, canvas_size, rect=rect_letterbox and not frcnn,
                nthreads=num_workers, io_pool=io_pool, return_ok=True)
            failed = np.nonzero(~ok)[0].tolist()
        else:
            canvases, metas, sizes = load_letterboxed_batch(
                paths, canvas_size, rect=rect_letterbox and not frcnn,
                nthreads=num_workers, io_pool=io_pool)
        real = len(paths)
        if real < batch_size:          # static-shape pad
            reps = batch_size - real
            canvases = np.concatenate(
                [canvases, np.repeat(canvases[:1], reps, 0)])
            metas = np.concatenate([metas,
                                    np.repeat(metas[:1], reps, 0)])
            sizes = np.concatenate([sizes,
                                    np.repeat(sizes[:1], reps, 0)])
        return canvases, metas, sizes, real, failed

    def extract(canvases, metas, sizes):
        kw = dict(num_objects=num_objects)
        if frcnn:
            fn = extract_features_frcnn
            kw["canvas"] = canvas_size
        else:
            kw["max_obj"] = max_obj
            if feature_mode == "roi":
                fn = extract_features_roi
                kw.update(trunk_size=roi_trunk_size,
                          detect_size=roi_detect_size)
            else:
                fn = extract_features_batch
            if mesh is not None:
                fn = functools.partial(extract_features_sharded, mesh,
                                       feature_mode=feature_mode)
        feats, poss, _ = fn(extractor_params, jnp.asarray(canvases),
                            jnp.asarray(metas), jnp.asarray(sizes), **kw)
        return feats, poss

    n = len(image_paths)
    starts = list(range(0, n, batch_size))
    try:
        next_fut = batch_pool.submit(load_batch, starts[0]) \
            if starts else None
        for i, start in enumerate(starts):
            canvases, metas, sizes, real, failed = next_fut.result()
            if i + 1 < len(starts):
                next_fut = batch_pool.submit(load_batch, starts[i + 1])
            feats, poss = extract(canvases, metas, sizes)
            yield start, real, failed, feats, poss
    finally:
        batch_pool.shutdown()
        io_pool.shutdown()


def extract_split_features(image_paths: Sequence[str], *,
                           num_position_dims: int = 84,
                           verbose: bool = True,
                           **kwargs) -> Tuple[np.ndarray, np.ndarray]:
    """All images of a split -> ([N, S, 2048], [N, S, P]) arrays.

    A draining consumer of :func:`stream_extracted_batches` (same
    keyword options) that keeps THREE stages in flight: host threads
    decode batch k+1 while the device runs batch k and batch k-1's
    device-async results are fetched."""
    n = len(image_paths)
    s = kwargs.get("num_objects", 36) + 1
    all_feats = np.zeros((n, s, 2048), np.float32)
    all_pos = np.zeros((n, s, num_position_dims), np.float32)

    def drain(pending):
        start, real, feats, poss = pending
        all_feats[start:start + real] = np.asarray(feats)[:real]
        all_pos[start:start + real] = \
            np.asarray(poss)[:real, :, :num_position_dims]

    pending = None
    for i, (start, real, _, feats, poss) in enumerate(
            stream_extracted_batches(image_paths, **kwargs)):
        if pending is not None:
            drain(pending)             # previous batch: device is ahead
        pending = (start, real, feats, poss)
        if verbose and i % 10 == 0:
            print(f"[etl] {start + real}/{n} images")
    if pending is not None:
        drain(pending)
    return all_feats, all_pos


def _params_digest(params) -> Optional[str]:
    """Cheap content fingerprint of an extractor param pytree: leaf count
    + shapes + the first values of ~16 sampled leaves.  Distinguishes
    random-init smoke weights from real checkpoints (and one checkpoint
    from another) without hashing hundreds of MB; device arrays fetch
    only 64 elements per sampled leaf."""
    if params is None:
        return None
    import jax
    leaves = jax.tree_util.tree_leaves(params)
    h = hashlib.sha1()
    h.update(str(len(leaves)).encode())
    stride = max(1, len(leaves) // 16)
    for leaf in leaves[::stride][:16]:
        shape, dtype = getattr(leaf, "shape", ()), getattr(leaf, "dtype", "")
        # slice BEFORE fetching: a multi-MB conv kernel must ship 256
        # bytes over the (slow, tunneled) device link, not the whole array
        head = leaf.reshape(-1)[:64] if hasattr(leaf, "reshape") else leaf
        arr = np.asarray(jax.device_get(head))
        h.update(str((tuple(shape), str(dtype))).encode())
        h.update(np.ascontiguousarray(
            arr.ravel()[:64].astype(np.float32)).tobytes())
    return h.hexdigest()


def extraction_fingerprint(image_paths: Sequence[str], kwargs: Dict) -> Dict:
    """Semantic fingerprint of one extraction run: every plain-value
    kwarg changes the features (feature_mode, max_obj, rect_letterbox,
    roi sizes, image_model, ...), plus the extractor WEIGHTS (a crash in
    random-init smoke mode resumed after installing real checkpoints
    must re-extract, not mix garbage shards with real ones) and the
    image-path LIST (same count, different images would silently
    misalign rows).  mesh/batch_size don't contribute (batch size is
    result-invariant — tests pin batch-vs-single equality).  Shared by
    the shard manifest AND the final-artifact skip check in
    :func:`run_etl`, so a config/weights switch re-extracts even when a
    completed ``{split}.features.hkl`` exists."""
    fp = {}
    for k, v in sorted(kwargs.items()):
        if k in ("extractor_params", "mesh", "batch_size"):
            continue
        if isinstance(v, (int, float, str, bool, type(None))):
            fp[k] = v
        elif (isinstance(v, (tuple, list)) and all(
                isinstance(e, (int, float, str, bool, type(None)))
                for e in v)):
            fp[k] = repr(list(v))
        else:
            # fail LOUD: silently dropping a feature-affecting kwarg
            # (e.g. a dtype object) would let a resume mix shards
            # extracted under different configs — the exact staleness
            # this fingerprint exists to prevent
            raise TypeError(
                f"extraction kwarg {k}={v!r} ({type(v).__name__}) cannot "
                "be fingerprinted; pass a plain int/float/str/bool/None "
                "(or a flat tuple of those), or exempt it here if it is "
                "provably result-invariant")
    fp["image_paths_sha1"] = hashlib.sha1(
        "\x00".join(map(str, image_paths)).encode()).hexdigest()
    params_fp = _params_digest(kwargs.get("extractor_params"))
    if params_fp is not None:
        fp["extractor_params_sha1"] = params_fp
    return fp


def extract_split_features_resumable(image_paths: Sequence[str], *,
                                     out_dir: str, split: str,
                                     shard_images: int = 4096,
                                     resume: bool = True,
                                     extract_fn=None,
                                     verbose: bool = True,
                                     **kwargs
                                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Shard-checkpointed extraction (crash-resumable).

    The reference's feature loop is days-scale over ~110k images
    (``features.py:87-119``); a crash at image 90k must not restart the
    split.  Every ``shard_images`` images are extracted and written
    atomically to ``{out_dir}/shards/{split}.{k:05d}.npz``, and a manifest
    records completed shards; a re-run with ``resume=True`` skips them.
    The manifest is invalidated when the image count, shard size, or any
    extraction-config kwarg changes — crop- and roi-mode features have
    identical shapes but are NOT interchangeable (docs/parity.md), so a
    resume after a config switch must re-extract rather than silently mix
    semantics.  Returns the assembled (features, positions) arrays; shard
    files are left for the caller to clean after the final artifacts are
    safely written (:func:`run_etl` does)."""
    extract = extract_fn or extract_split_features
    shard_dir = os.path.join(out_dir, "shards")
    os.makedirs(shard_dir, exist_ok=True)
    manifest_path = os.path.join(shard_dir, f"{split}.manifest.json")

    config_fp = extraction_fingerprint(image_paths, kwargs)

    n = len(image_paths)
    done: set = set()
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            old = json.load(f)
        if old.get("num_images") == n and \
                old.get("shard_images") == shard_images and \
                old.get("config") == config_fp:
            done = set(old.get("done", []))
        elif verbose:
            print(f"[etl] {split}: shard manifest stale "
                  f"(images {old.get('num_images')}->{n}, shard size, or "
                  f"extraction config {old.get('config')}->{config_fp} "
                  f"changed) — re-extracting")

    def shard_path(k):
        return os.path.join(shard_dir, f"{split}.{k:05d}.npz")

    starts = list(range(0, n, shard_images))
    for k, start in enumerate(starts):
        if k in done and os.path.exists(shard_path(k)):
            continue
        feats, poss = extract(image_paths[start:start + shard_images],
                              verbose=verbose, **kwargs)
        tmp = shard_path(k) + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, features=feats, positions=poss)
        os.replace(tmp, shard_path(k))
        done.add(k)
        mtmp = manifest_path + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"num_images": n, "shard_images": shard_images,
                       "config": config_fp, "done": sorted(done)}, f)
        os.replace(mtmp, manifest_path)
        if verbose:
            print(f"[etl] {split}: shard {k + 1}/{len(starts)} "
                  f"checkpointed ({min(start + shard_images, n)}/{n})")

    all_feats = all_poss = None
    for k, start in enumerate(starts):
        with np.load(shard_path(k)) as z:
            f, p = z["features"], z["positions"]
        if all_feats is None:
            all_feats = np.zeros((n,) + f.shape[1:], f.dtype)
            all_poss = np.zeros((n,) + p.shape[1:], p.dtype)
        all_feats[start:start + len(f)] = f
        all_poss[start:start + len(p)] = p
    return all_feats, all_poss


def _clean_shards(out_dir: str, split: str) -> None:
    shard_dir = os.path.join(out_dir, "shards")
    if not os.path.isdir(shard_dir):
        return
    for name in os.listdir(shard_dir):
        if name.startswith(f"{split}."):
            os.remove(os.path.join(shard_dir, name))
    if not os.listdir(shard_dir):
        os.rmdir(shard_dir)


# ---------------------------------------------------------------------------
# Full driver
# ---------------------------------------------------------------------------

def run_etl(cfg: Config, *, coco_root: str,
            splits: Sequence[str] = ("train", "valid", "test"),
            batch_size: int = 128,
            weights_dir: Optional[str] = None) -> None:
    """features.py:16-119 equivalent against a standard COCO tree:
    ``{coco_root}/annotations/captions_{train,val}2017.json`` and
    ``{coco_root}/image/{train,val}2017/``."""
    d = cfg.data
    from .pipeline import validate_feature_mode
    validate_feature_mode(d.feature_mode, d.image_model,
                          roi_trunk_size=d.roi_trunk_size,
                          roi_detect_size=d.roi_detect_size)

    import jax
    if jax.process_count() > 1:
        # the ETL is single-host work (per-host disk IO + pickle/hkl
        # writes to shared artifact paths): on a pod every process would
        # extract the full split AND race the same .tmp shard files on a
        # shared filesystem.  Having only process 0 work is no better —
        # the idle processes' exit (or their jax.distributed shutdown
        # barrier) tears the coordination service down under process 0
        # mid-way through a days-scale job.  Refuse loudly on EVERY
        # process instead: run `features` as a single-process job (it
        # still shards over all locally-visible chips), then launch the
        # distributed training run against the artifacts.
        raise RuntimeError(
            "the features ETL is single-host work — run it as a "
            "single-process job (no --distributed / multi-process "
            "launcher), then start the pod training run against the "
            "written artifacts")
    max_len = d.max_caption_words

    ann_cache = os.path.join(d.data_path, "annotations")
    os.makedirs(ann_cache, exist_ok=True)

    def cached(split, builder):
        path = os.path.join(ann_cache, f"{split}.annotations.pkl")
        if os.path.exists(path):
            from ..utils.io import load_pickle
            return load_pickle(path)
        records = builder()
        save_pickle(records, path)
        return records

    train_records = cached("train", lambda: process_caption_data(
        os.path.join(coco_root, "annotations/captions_train2017.json"),
        os.path.join(coco_root, "image/train2017/"), max_len))

    def _val_split():
        val = process_caption_data(
            os.path.join(coco_root, "annotations/captions_val2017.json"),
            os.path.join(coco_root, "image/val2017/"), max_len)
        cut = int(0.5 * len(val))      # features.py:41-47
        return val[:cut], val[cut:]

    if "valid" in splits or "test" in splits:
        vpath = os.path.join(ann_cache, "valid.annotations.pkl")
        tpath = os.path.join(ann_cache, "test.annotations.pkl")
        if not (os.path.exists(vpath) and os.path.exists(tpath)):
            valid_records, test_records = _val_split()
            save_pickle(valid_records, vpath)
            save_pickle(test_records, tpath)
        else:
            from ..utils.io import load_pickle
            valid_records = load_pickle(vpath)
            test_records = load_pickle(tpath)

    records_by_split = {"train": train_records}
    if "valid" in splits:
        records_by_split["valid"] = valid_records
    if "test" in splits:
        records_by_split["test"] = test_records

    word_index = None
    from .pipeline import load_extractor, load_frcnn_extractor
    extractor = (load_frcnn_extractor(weights_dir)
                 if d.image_model == "FasterRCNN"
                 else load_extractor(weights_dir))

    for split in splits:
        records = records_by_split[split]
        out_dir = os.path.join(d.data_path, split)
        os.makedirs(out_dir, exist_ok=True)

        if split == "train":
            word_index = build_vocab(
                [r["caption"] for r in records],
                threshold=d.word_count_threshold)
            save_pickle(word_index, d.word_to_idx_path)
        elif word_index is None:
            # valid/test re-runs against an existing train pass: load the
            # vocab it wrote instead of demanding train in `splits` (a
            # crash after the days-scale train extraction must not force
            # re-running it to rebuild valid/test)
            assert os.path.exists(d.word_to_idx_path), (
                f"no vocab at {d.word_to_idx_path}; run the train split "
                "first")
            from ..utils.io import load_pickle
            word_index = load_pickle(d.word_to_idx_path)

        captions = build_caption_vector(
            [r["caption"] for r in records], word_index,
            max_length=max_len)
        save_pickle(captions, os.path.join(out_dir,
                                           f"{split}.captions.pkl"))

        file_names, id_index = build_file_names(records)
        save_pickle(file_names, os.path.join(out_dir,
                                             f"{split}.file.names.pkl"))
        save_pickle(build_image_indices(records, id_index),
                    os.path.join(out_dir, f"{split}.image.indices.pkl"))
        references = build_references(records)
        save_pickle(references,
                    os.path.join(out_dir, f"{split}.references.pkl"))
        if split == "valid":
            # frozen CIDEr doc-frequency over the validation corpus — the
            # table the reference's RL scorers are built with
            # (df='coco-val', loss.py:112-116); RLTrainer loads it from
            # {data_path}/coco-val-df.p
            from ..metrics.cider import build_doc_frequency, \
                save_doc_frequency
            save_doc_frequency(build_doc_frequency(references.values()),
                               os.path.join(d.data_path, "coco-val-df.p"))
            print("[etl] valid: coco-val-df.p written")
        print(f"[etl] {split}: caption artifacts written")

        mesh = None
        # multi-process (pod) runs fall back to the single-device path:
        # the sharded path device_puts host arrays and gathers globally
        # sharded outputs, both of which need every device addressable
        if d.image_model == "YOLOv5" and jax.device_count() > 1 \
                and jax.process_count() == 1 \
                and batch_size % jax.device_count() == 0:
            from ..parallel import mesh as pmesh
            mesh = pmesh.make_mesh()        # all devices on `data`
            print(f"[etl] sharding extraction over "
                  f"{jax.device_count()} devices")
        ex_kwargs = dict(
            extractor_params=extractor,
            num_objects=cfg.model.num_objects, max_obj=d.max_obj,
            batch_size=batch_size, image_model=d.image_model,
            rect_letterbox=d.rect_letterbox,
            feature_mode=d.feature_mode,
            roi_trunk_size=d.roi_trunk_size,
            roi_detect_size=d.roi_detect_size,
            num_position_dims=cfg.model.dim_positions, mesh=mesh)
        fp = extraction_fingerprint(list(file_names), ex_kwargs)

        feats_path = os.path.join(out_dir, f"{split}.features.hkl")
        pos_path = os.path.join(out_dir, f"{split}.positions.hkl")
        meta_path = os.path.join(out_dir, f"{split}.features.meta.json")
        if os.path.exists(feats_path) and os.path.exists(pos_path):
            # a completed split's final artifacts survive a later crash
            # (e.g. train finished, the job died during valid): skip its
            # extraction instead of redoing the days-scale work — its
            # shard manifest is already cleaned, so the resumable layer
            # alone can't save us here.  Skip requires (a) the row count
            # to match the (re)built caption artifacts AND (b) the stored
            # semantic fingerprint (config + weights + image list) to
            # match — a feature_mode/checkpoint switch re-extracts
            # instead of silently keeping stale features (crop- and
            # roi-mode features are NOT interchangeable, docs/parity.md).
            # Delete the .hkl files to force re-extraction.
            from ..utils.io import open_hkl
            ds = open_hkl(feats_path)
            rows, shape = ds.shape[0], ds.shape
            ds.close()
            stored_fp = None
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    stored_fp = json.load(f).get("fingerprint")
            if rows == len(file_names) and stored_fp == fp:
                print(f"[etl] {split}: features {shape} already on disk, "
                      "fingerprint matches — skipping extraction (delete "
                      "the .hkl files to force)")
                continue
            if rows == len(file_names) and stored_fp is None:
                # pre-fingerprint dataset: keep the legacy skip, loudly
                print(f"[etl] {split}: features {shape} already on disk "
                      "(no fingerprint recorded — pre-r3 artifacts; "
                      "config/weights changes are NOT detected; delete "
                      "the .hkl files to force) — skipping extraction")
                continue
            print(f"[etl] {split}: stale features on disk "
                  + (f"({rows} rows vs {len(file_names)} images)"
                     if rows != len(file_names)
                     else "(extraction config/weights changed)")
                  + " — re-extracting")

        feats, poss = extract_split_features_resumable(
            list(file_names), out_dir=out_dir, split=split, **ex_kwargs)
        save_hkl(feats, feats_path)
        save_hkl(poss, pos_path)
        with open(meta_path + ".tmp", "w") as f:
            json.dump({"fingerprint": fp}, f)
        os.replace(meta_path + ".tmp", meta_path)
        _clean_shards(out_dir, split)
        print(f"[etl] {split}: features {feats.shape} saved")
