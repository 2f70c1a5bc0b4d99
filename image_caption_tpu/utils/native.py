"""ctypes binding for the native n-gram reward scorer (csrc/).

Build once with ``make -C csrc``; ``NgramRewarder`` then accelerates the
per-step RL reward computation (CIDEr-D + BLEU-4 over decoded strings).
The Python scorers in ``metrics/`` are the oracle — ``tests/test_native.py``
asserts bit-level agreement — and the automatic fallback when the shared
library hasn't been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                 "libngram_rewards.so"),
    os.path.join(os.path.dirname(__file__), "libngram_rewards.so"),
)


def ensure_fresh_binary(so_path: str, src_path: str,
                        make_target: str) -> None:
    """Best-effort staleness guard for the committed csrc/ binaries.

    The ``.so`` files are checked in (the production/judge environment
    must not depend on a C toolchain), so an edit to the ``.cpp`` without
    ``make -C csrc`` would leave a stale binary silently serving tests
    and the ETL.  When the source is newer than the binary, try to
    rebuild it in place; if the toolchain is unavailable, WARN rather
    than fail — the stale binary still loads, but never silently.
    (Fresh checkouts can order mtimes arbitrarily; the spurious rebuild
    that triggers is a no-op costing ~1 s.)"""
    import subprocess
    import warnings
    try:
        if (not os.path.exists(so_path) or not os.path.exists(src_path)
                or os.path.getmtime(src_path) <= os.path.getmtime(so_path)):
            return
        r = subprocess.run(
            ["make", "-C", os.path.dirname(so_path), make_target],
            capture_output=True, timeout=120)
        if r.returncode != 0:
            raise RuntimeError(r.stderr.decode(errors="replace")[-300:])
    except Exception as exc:
        warnings.warn(
            f"{os.path.basename(so_path)} is older than "
            f"{os.path.basename(src_path)} and rebuilding failed ({exc}); "
            "the loaded binary may be STALE — run `make -C csrc`",
            RuntimeWarning, stacklevel=2)


def _fnv1a(data: bytes) -> int:
    h = 1469598103934665603
    for b in data:
        h ^= b
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_ngram(ngram: Tuple[str, ...]) -> int:
    """Must match the C++ key: words joined with 0x1f, FNV-1a 64."""
    return _fnv1a("\x1f".join(ngram).encode("utf-8"))


def _load_lib() -> ctypes.CDLL:
    last_err = None
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            ensure_fresh_binary(
                path, os.path.join(os.path.dirname(path),
                                   "ngram_rewards.cpp"),
                "libngram_rewards.so")
            try:
                return ctypes.CDLL(path)
            except OSError as e:         # wrong arch etc.
                last_err = e
    raise OSError(
        f"libngram_rewards.so not built (run `make -C csrc`): {last_err}")


class NgramRewarder:
    """Native one-vs-one structure + self-CIDEr scorer."""

    def __init__(self, doc_frequency: Optional[Dict] = None,
                 log_ref_len: float = 0.0):
        self._lib = _load_lib()
        self._lib.icx_structure_scores.restype = None
        self._lib.icx_self_cider_scores.restype = None
        self._lib.icx_df_create.restype = ctypes.c_void_p
        self._lib.icx_df_destroy.restype = None
        self._lib.icx_structure_scores_df.restype = None
        self._df_handle = None

        if doc_frequency:
            hashes = np.fromiter(
                (hash_ngram(g) for g in doc_frequency),
                dtype=np.uint64, count=len(doc_frequency))
            values = np.fromiter(doc_frequency.values(), dtype=np.float64,
                                 count=len(doc_frequency))
            self._df_hashes = np.ascontiguousarray(hashes)
            self._df_values = np.ascontiguousarray(values)
        else:
            self._df_hashes = np.zeros((0,), np.uint64)
            self._df_values = np.zeros((0,), np.float64)
        self._log_ref_len = float(log_ref_len)
        if len(self._df_hashes):
            # frozen df: build the C++ hash table ONCE.  Rebuilding it per
            # call dominated the RL step's host time (~35 ms at a small
            # bench df; the real COCO table is far larger).
            self._df_handle = ctypes.c_void_p(self._lib.icx_df_create(
                *self._df_args()))

    def __del__(self):
        handle = getattr(self, "_df_handle", None)
        if handle:
            self._lib.icx_df_destroy(handle)
            self._df_handle = None

    @staticmethod
    def _c_strings(strings: Sequence[str]):
        arr = (ctypes.c_char_p * len(strings))()
        arr[:] = [s.encode("utf-8") for s in strings]
        return arr

    def _df_args(self):
        return (
            self._df_hashes.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint64)),
            self._df_values.ctypes.data_as(
                ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(len(self._df_hashes)),
            ctypes.c_double(self._log_ref_len),
        )

    def structure_scores(self, res: Sequence[str], gts: Sequence[str],
                         cider_w: float, bleu_w: float) -> np.ndarray:
        n = len(res)
        out = np.zeros((n,), np.float32)
        if self._df_handle is not None:      # frozen df: prebuilt table
            self._lib.icx_structure_scores_df(
                self._df_handle,
                self._c_strings(res), self._c_strings(gts), ctypes.c_int(n),
                ctypes.c_double(cider_w), ctypes.c_double(bleu_w),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            return out
        self._lib.icx_structure_scores(
            self._c_strings(res), self._c_strings(gts), ctypes.c_int(n),
            ctypes.c_double(cider_w), ctypes.c_double(bleu_w),
            *self._df_args(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def self_cider_scores(self, res: Sequence[str]) -> np.ndarray:
        n = len(res)
        out = np.zeros((n,), np.float32)
        self._lib.icx_self_cider_scores(
            self._c_strings(res), ctypes.c_int(n),
            *self._df_args(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
