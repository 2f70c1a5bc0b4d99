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


def save_hkl(array: np.ndarray, path: str,
             compression: str | None = "gzip") -> None:
    import h5py
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.asarray(array),
                         compression=compression)
