"""COCO caption dataset: reference-compatible on-disk layout, TPU-shaped
host input pipeline.

On-disk layout matches the reference exactly
(``/root/reference/core/utils.py:32-64``):
``{data_path}/{split}/{split}.features.hkl``  [N_img, S, 2048]
``{data_path}/{split}/{split}.positions.hkl`` [N_img, S, P]
``{split}.file.names.pkl``, ``{split}.captions.pkl`` (int32 [N_cap, L]),
``{split}.image.indices.pkl``, ``{split}.references.pkl``; train additionally
has ``word_index.pkl``.

Instead of a torch DataLoader with worker processes feeding one item per
caption (``core/dataset.py:8-52``), batches are assembled host-side as
contiguous numpy gathers (features indexed per caption through
``image_idxs``) and handed to jax as fixed-shape arrays — the final partial
batch is zero-padded so every step compiles once.  Iteration order for
training is a seeded permutation per epoch.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..utils.io import load_hkl, load_pickle, open_hkl

# 'auto' streaming threshold: split feature files above this stay on disk
# and batches are gathered through sliced HDF5 reads (the real COCO train
# split is ~33 GB of f32 features — the reference materializes all of it,
# core/utils.py:45-46)
STREAM_THRESHOLD_BYTES = 2 << 30


@dataclass
class CocoSplit:
    """Split mirror of ``load_coco_data``.

    ``features``/``positions`` are numpy arrays (eager mode) or lazily
    sliced ``HklDataset`` views (streaming mode) — both support the
    indexing the batch iterators use."""

    features: np.ndarray        # [N_img, S, F] float32 (or HklDataset)
    positions: np.ndarray       # [N_img, S, P] float32 (or HklDataset)
    captions: np.ndarray        # [N_cap, L] int32
    image_idxs: np.ndarray      # [N_cap] int — caption -> image row
    file_names: np.ndarray
    word_to_idx: Optional[Dict[str, int]] = None
    references: Optional[Dict] = None

    @property
    def num_captions(self) -> int:
        return len(self.captions)

    @property
    def num_images(self) -> int:
        return len(self.features)


def load_split(data_path: str, split: str, *, verbose: bool = True,
               load_references: bool = False,
               streaming: str = "auto") -> CocoSplit:
    """load_coco_data equivalent (core/utils.py:32-64).

    streaming: 'never' materializes features in RAM (reference behavior),
    'always' streams batches from disk, 'auto' streams when the feature
    file exceeds STREAM_THRESHOLD_BYTES."""
    assert streaming in ("auto", "never", "always"), streaming
    d = os.path.join(data_path, split)
    fpath = os.path.join(d, f"{split}.features.hkl")
    ppath = os.path.join(d, f"{split}.positions.hkl")
    stream = streaming == "always" or (
        streaming == "auto"
        and os.path.getsize(fpath) > STREAM_THRESHOLD_BYTES)
    if stream:
        features = open_hkl(fpath, dtype=np.float32)
        positions = open_hkl(ppath, dtype=np.float32)
        if verbose:
            print(f"[data:{split}] streaming features from disk")
    else:
        features = np.asarray(load_hkl(fpath), dtype=np.float32)
        positions = np.asarray(load_hkl(ppath), dtype=np.float32)
    captions = np.asarray(load_pickle(os.path.join(
        d, f"{split}.captions.pkl")), dtype=np.int32)
    image_idxs = np.asarray(load_pickle(os.path.join(
        d, f"{split}.image.indices.pkl")))
    file_names = np.asarray(load_pickle(os.path.join(
        d, f"{split}.file.names.pkl")))

    word_to_idx = None
    wpath = os.path.join(d, "word_index.pkl")
    if split == "train" or os.path.exists(wpath):
        if os.path.exists(wpath):
            word_to_idx = load_pickle(wpath)

    references = None
    rpath = os.path.join(d, f"{split}.references.pkl")
    if load_references and os.path.exists(rpath):
        references = load_pickle(rpath)

    if verbose:
        for name, arr in (("features", features), ("positions", positions),
                          ("captions", captions)):
            print(f"[data:{split}] {name} {arr.shape} {arr.dtype}")
    return CocoSplit(features=features, positions=positions,
                     captions=captions, image_idxs=image_idxs,
                     file_names=file_names, word_to_idx=word_to_idx,
                     references=references)


Batch = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _pad_rows(arrs: List[np.ndarray], target: int) -> List[np.ndarray]:
    """Pad the batch dim by repeating row 0.

    All-zero padding would create fully-masked attention rows (every object
    slot / every token is pad), which poison gradients; repeating a real
    item keeps every mask well-formed.  Padded *captions* are additionally
    blanked to ``[<START>, 0, ...]`` by the caller so they contribute zero
    loss (CE ignores pad targets)."""
    out = []
    for a in arrs:
        n = a.shape[0]
        if n == target:
            out.append(a)
        else:
            reps = np.repeat(a[:1], target - n, axis=0)
            out.append(np.concatenate([a, reps], axis=0))
    return out


def _blank_padded_captions(caps: np.ndarray, real: int) -> np.ndarray:
    """Padded caption rows: <START> then all-pad -> zero loss contribution."""
    if real < caps.shape[0]:
        caps = caps.copy()
        caps[real:, :] = 0
        caps[real:, 0] = 1  # START_IDX
    return caps


class CaptionBatches:
    """Fixed-shape train batches: one item per caption, features gathered
    per image (``core/dataset.py:13-18`` semantics).

    Yields ``(features [B,S,F], positions [B,S,P], captions [B,L],
    real_count)``; the last batch is zero-padded to B (padded items have
    all-zero positions -> fully masked, zero-pad captions -> ignored by the
    loss).
    """

    def __init__(self, split: CocoSplit, batch_size: int, *,
                 shuffle: bool = True, seed: int = 0,
                 drop_remainder: bool = False):
        self.split = split
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        n = self.split.num_captions
        return n // self.batch_size if self.drop_remainder else \
            -(-n // self.batch_size)

    def epoch(self, epoch_idx: int = 0
              ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
        n = self.split.num_captions
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch_idx)
            rng.shuffle(order)
        bs = self.batch_size
        end = (n // bs) * bs if self.drop_remainder else n
        for start in range(0, end, bs):
            idx = order[start:start + bs]
            img = self.split.image_idxs[idx]
            feats = self.split.features[img]
            poss = self.split.positions[img]
            caps = self.split.captions[idx]
            real = len(idx)
            if real < bs:
                feats, poss, caps = _pad_rows([feats, poss, caps], bs)
                caps = _blank_padded_captions(caps, real)
            yield feats, poss, caps, real

    def __iter__(self):
        return self.epoch(0)


class ImageBatches:
    """Eval/decode batches: one item per unique image.

    The reference's TestDataset decodes every image once per reference
    caption, redundantly overwriting the same slot (core/dataset.py:43-44) —
    here each image is decoded exactly once, preserving the output contract
    (one candidate caption per image index).
    """

    def __init__(self, split: CocoSplit, batch_size: int):
        self.split = split
        self.batch_size = batch_size

    def __len__(self) -> int:
        return -(-self.split.num_images // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                         np.ndarray, int]]:
        n = self.split.num_images
        bs = self.batch_size
        for start in range(0, n, bs):
            sl = slice(start, min(start + bs, n))
            feats = self.split.features[sl]
            poss = self.split.positions[sl]
            idxs = np.arange(sl.start, sl.stop)
            real = len(idxs)
            if real < bs:
                feats, poss = _pad_rows([feats, poss], bs)
                idxs = np.pad(idxs, (0, bs - real))
            yield feats, poss, idxs, real
