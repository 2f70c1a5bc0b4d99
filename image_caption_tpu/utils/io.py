"""Pickle and hickle-compatible array IO.

The reference caches features as hickle (HDF5) arrays and metadata as pickles
(``/root/reference/core/utils.py:17-64``).  ``hickle`` is not available here,
so ``load_hkl``/``save_hkl`` speak the same on-disk format through ``h5py``:
hickle v3/v4 store a single numpy array as an HDF5 dataset (named ``data`` /
``data_0`` at the root or under a ``data`` group); our writer produces a plain
root-level ``data`` dataset that hickle can also read.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np


def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(data: Any, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(data, f, pickle.HIGHEST_PROTOCOL)


def _first_dataset(h5node):
    """Depth-first search for the first HDF5 dataset (hickle layout probe)."""
    import h5py
    if isinstance(h5node, h5py.Dataset):
        return h5node
    # Prefer well-known hickle keys before arbitrary traversal order.
    for key in ("data", "data_0"):
        if key in h5node:
            found = _first_dataset(h5node[key])
            if found is not None:
                return found
    for key in h5node:
        found = _first_dataset(h5node[key])
        if found is not None:
            return found
    return None


def load_hkl(path: str) -> np.ndarray:
    import h5py
    with h5py.File(path, "r") as f:
        ds = _first_dataset(f)
        if ds is None:
            raise ValueError(f"no dataset found in {path}")
        return np.asarray(ds[...])


class HklDataset:
    """Lazily-sliced view over a hickle/HDF5 array.

    Streams batches straight from disk instead of materializing the whole
    split (the reference — and our eager path — loads [110k, 37, 2048] f32
    ≈ 33 GB into RAM for the real COCO train split, core/utils.py:45-46).
    Supports the indexing the batch iterators use: slices, ints, and
    arbitrary (unsorted, repeated) integer arrays — h5py fancy indexing
    requires increasing unique indices, so gathers go through a
    unique/inverse mapping.  NOT thread-safe; each reader thread must open
    its own handle."""

    def __init__(self, path: str, dtype=None):
        import h5py
        self._file = h5py.File(path, "r")
        ds = _first_dataset(self._file)
        if ds is None:
            self._file.close()
            raise ValueError(f"no dataset found in {path}")
        self._ds = ds
        self._dtype = np.dtype(dtype) if dtype is not None else ds.dtype

    @property
    def shape(self):
        return self._ds.shape

    @property
    def dtype(self):
        return self._dtype

    def __len__(self) -> int:
        return self._ds.shape[0]

    def __getitem__(self, idx) -> np.ndarray:
        if isinstance(idx, (int, np.integer, slice)):
            out = self._ds[idx]
        else:
            idx = np.asarray(idx)
            uniq, inverse = np.unique(idx, return_inverse=True)
            out = self._ds[uniq.tolist()][inverse]
        return np.asarray(out, dtype=self._dtype)

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self._ds[...], dtype=dtype or self._dtype)

    def close(self) -> None:
        self._file.close()


def open_hkl(path: str, dtype=None) -> HklDataset:
    """Open a feature shard for streamed (sliced) reads."""
    return HklDataset(path, dtype=dtype)


def save_hkl(array: np.ndarray, path: str,
             compression: str | None = "gzip") -> None:
    import h5py
    array = np.asarray(array)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # per-row chunks: random-access row gathers (streamed training) touch
    # exactly one chunk per image instead of h5py's auto multi-row chunks
    chunks = (1,) + array.shape[1:] if array.ndim >= 2 and len(array) \
        else None
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=array, compression=compression,
                         chunks=chunks)
