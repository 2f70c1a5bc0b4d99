"""Host-side image loading: JPEG decode + letterbox to uint8 canvases.

Two interchangeable backends behind one batch API:

* **native** (``csrc/libimage_loader.so``): C++ decode (system libjpeg) +
  a Pillow-bit-exact bilinear resample + letterbox, multi-threaded off
  the GIL.  The TPU-native stand-in for the reference's host image layer
  (cv2 in ``data/detect_for_preprocess.py:55,66``, PIL in
  ``core/preprocess.py:48-51``): at roi-mode device rates
  (~600-1000 img/s/chip, docs/performance.md) a Python decode pool is
  the production-host bottleneck.  Verified BIT-IDENTICAL to the PIL
  path in ``tests/test_native_loader.py``, so artifacts are stable
  across backends mid-dataset.
* **PIL** fallback: per-image, used when the library isn't built, when
  ``ICX_NATIVE_LOADER=0``, and for any image the native decoder rejects
  (non-JPEG, truncated, CMYK — it reports per-image ``ok`` flags).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .ops import letterbox_params, letterbox_params_rect

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                         "libimage_loader.so")
_lib = None
_lib_checked = False


def _native_lib():
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if os.environ.get("ICX_NATIVE_LOADER", "1") == "0":
        return None
    try:
        from ..utils.native import ensure_fresh_binary
        so = os.path.abspath(_LIB_PATH)
        ensure_fresh_binary(so, os.path.join(os.path.dirname(so),
                                             "image_loader.cpp"),
                            "libimage_loader.so")
        lib = ctypes.CDLL(so)
        lib.icx_load_letterboxed_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.icx_load_letterboxed_batch.restype = None
        _lib = lib
    except (OSError, AttributeError):
        # OSError: unloadable .so; AttributeError: a stale binary missing
        # the expected symbol (ensure_fresh_binary warns-and-continues
        # when it can't rebuild) — both degrade to the PIL path, per this
        # module's contract that a broken native backend never aborts a run
        _lib = None
    return _lib


def native_available() -> bool:
    return _native_lib() is not None


def load_letterboxed(path: str, size: int = 640, rect: bool = False,
                     stride: int = 32
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + letterbox one image on host (PIL backend).  Returns
    (canvas [S,S,3] uint8, meta, (h,w)); meta is [scale,top,left] for the
    square letterbox or [scale,top,left,rect_h,rect_w] for the
    ultralytics rectangular mode (reference LoadImages geometry,
    detect_for_preprocess.py:55,66) — the rect content sits at the
    canvas top-left and the pipeline masks detector cells beyond it."""
    from PIL import Image
    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        if rect:
            r, nh, nw, top, left, rect_h, rect_w = letterbox_params_rect(
                h, w, size, stride)
        else:
            r, nh, nw, top, left = letterbox_params(h, w, size)
        resized = im.resize((nw, nh), Image.BILINEAR)
    # uint8 canvas: PIL's resize output is already uint8, so this loses
    # nothing — and the host->device transfer is 4x smaller (the device
    # program promotes to its compute dtype)
    canvas = np.full((size, size, 3), 114, np.uint8)
    canvas[top:top + nh, left:left + nw] = np.asarray(resized, np.uint8)
    meta = (np.asarray([r, top, left, rect_h, rect_w], np.float32) if rect
            else np.asarray([r, top, left], np.float32))
    return canvas, meta, \
        np.asarray([h, w], np.float32)


def load_letterboxed_batch(paths: Sequence[str], size: int = 640, *,
                           rect: bool = False, stride: int = 32,
                           nthreads: Optional[int] = None,
                           io_pool=None, return_ok: bool = False):
    """Batch decode + letterbox -> (canvases [N,S,S,3] u8,
    metas [N, 3|5] f32, sizes [N,2] f32[, ok [N] bool]).

    Native backend when built (``nthreads`` C++ threads, defaults to
    ``os.cpu_count()``); per-image PIL fallback for anything it rejects.
    Without the native library the whole batch maps over ``io_pool``
    (or serially) through :func:`load_letterboxed`.

    ``return_ok=True`` isolates per-image failures instead of raising:
    an unreadable image yields a gray fill canvas, identity meta, and
    ``ok=False`` — the serving path's ``skip_errors`` contract.  With
    ``return_ok=False`` (default) any unreadable image raises."""
    n = len(paths)
    meta_dim = 5 if rect else 3
    lib = _native_lib()

    def blank():
        meta = np.zeros((meta_dim,), np.float32)
        meta[0] = 1.0
        if rect:
            meta[3:] = size
        return (np.full((size, size, 3), 114, np.uint8), meta,
                np.asarray([size, size], np.float32))

    def load_pil(p):
        try:
            return load_letterboxed(p, size, rect=rect, stride=stride), True
        except Exception:
            if not return_ok:
                raise
            return blank(), False

    if n == 0:
        out = (np.zeros((0, size, size, 3), np.uint8),
               np.zeros((0, meta_dim), np.float32),
               np.zeros((0, 2), np.float32))
        return out + (np.zeros((0,), bool),) if return_ok else out
    if lib is None:
        mapper = io_pool.map if io_pool is not None else map
        loaded = list(mapper(load_pil, paths))
        out = (np.stack([c for (c, _, _), _ in loaded]),
               np.stack([m for (_, m, _), _ in loaded]),
               np.stack([z for (_, _, z), _ in loaded]))
        return out + (np.asarray([k for _, k in loaded]),) if return_ok \
            else out

    canvases = np.zeros((n, size, size, 3), np.uint8)
    metas = np.zeros((n, 5), np.float32)
    sizes = np.zeros((n, 2), np.float32)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.icx_load_letterboxed_batch(
        arr, n, size, int(rect), stride,
        nthreads or os.cpu_count() or 8,
        canvases.ctypes.data_as(ctypes.c_void_p),
        metas.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p),
        ok.ctypes.data_as(ctypes.c_void_p))
    failed = np.nonzero(ok == 0)[0]
    good = np.ones((n,), bool)
    if failed.size:
        # PIL fallback for images the native decoder rejects (non-JPEG,
        # truncated, CMYK) — pooled when a pool is available, so a
        # PNG-heavy segment doesn't degrade to single-threaded decode
        mapper = io_pool.map if io_pool is not None else map
        for i, ((c, m, z), k) in zip(failed, mapper(
                load_pil, [paths[i] for i in failed])):
            canvases[i], sizes[i] = c, z
            metas[i, :m.shape[0]] = m
            good[i] = k
    if return_ok:
        return canvases, metas[:, :meta_dim], sizes, good
    return canvases, metas[:, :meta_dim], sizes
