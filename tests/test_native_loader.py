"""Native C++ image loader vs the PIL backend (bit-level agreement).

The native loader (csrc/image_loader.cpp) must be interchangeable with
the PIL path mid-dataset: Pillow-bit-exact bilinear resample, identical
letterbox geometry (vision/ops.py transcription incl. Python round()'s
half-to-even), same-libjpeg decode.  See vision/loader.py."""

import ctypes
import os

import numpy as np
import pytest

from image_caption_tpu.vision import loader

LIB = os.path.join(os.path.dirname(__file__), "..", "csrc",
                   "libimage_loader.so")
pytestmark = pytest.mark.skipif(not os.path.exists(LIB),
                                reason="native lib not built")


@pytest.fixture
def jpeg_dir(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(7)
    paths = []
    for i, (h, w) in enumerate([(480, 640), (375, 500), (640, 480),
                                (333, 500), (52, 37), (1024, 683)]):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rng.randint(0, 256, (h, w, 3), np.uint8)).save(
            p, quality=95)
        paths.append(p)
    return paths


@pytest.mark.parametrize("shape", [(480, 640, 376, 501),
                                   (100, 100, 640, 640),
                                   (7, 9, 3, 5),
                                   (1024, 768, 223, 167),
                                   (33, 47, 201, 99)])
def test_resize_bilinear_bit_exact_vs_pillow(shape):
    """The C++ resample must reproduce Pillow's 8-bit bilinear (triangle
    filter scaled on downscale, PRECISION_BITS fixed point, per-pass
    rounding) bit-for-bit on up/down/asymmetric scales."""
    from PIL import Image
    h, w, nh, nw = shape
    lib = ctypes.CDLL(LIB)
    im = np.random.RandomState(h + nw).randint(0, 256, (h, w, 3), np.uint8)
    out = np.zeros((nh, nw, 3), np.uint8)
    lib.icx_resize_bilinear(im.ctypes.data_as(ctypes.c_void_p), h, w,
                            out.ctypes.data_as(ctypes.c_void_p), nh, nw)
    ref = np.asarray(Image.fromarray(im).resize((nw, nh), Image.BILINEAR))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("rect", [False, True])
def test_batch_matches_pil_backend_bit_for_bit(jpeg_dir, rect):
    """Full native decode+letterbox == the PIL path on real JPEGs: same
    canvases (bit-identical), same metas/sizes — so a dataset extracted
    half with one backend and half with the other is consistent."""
    if not loader.native_available():
        pytest.skip("native loader disabled")
    canv, metas, sizes = loader.load_letterboxed_batch(
        jpeg_dir, 640, rect=rect, nthreads=4)
    assert metas.shape[1] == (5 if rect else 3)
    for i, p in enumerate(jpeg_dir):
        c, m, z = loader.load_letterboxed(p, 640, rect=rect)
        np.testing.assert_array_equal(canv[i], c)
        np.testing.assert_allclose(metas[i], m)
        np.testing.assert_array_equal(sizes[i], z)


def test_batch_falls_back_to_pil_for_non_jpeg(tmp_path):
    """Non-JPEG inputs (ok=0 from the native decoder) transparently go
    through PIL; results match a pure-PIL load."""
    from PIL import Image
    if not loader.native_available():
        pytest.skip("native loader disabled")
    rng = np.random.RandomState(3)
    png = str(tmp_path / "a.png")
    Image.fromarray(rng.randint(0, 256, (96, 128, 3), np.uint8)).save(png)
    jpg = str(tmp_path / "b.jpg")
    Image.fromarray(rng.randint(0, 256, (64, 80, 3), np.uint8)).save(jpg)
    canv, metas, sizes = loader.load_letterboxed_batch([png, jpg], 128)
    for i, p in enumerate([png, jpg]):
        c, m, z = loader.load_letterboxed(p, 128)
        np.testing.assert_array_equal(canv[i], c)
        np.testing.assert_allclose(metas[i], m)
        np.testing.assert_array_equal(sizes[i], z)


def test_grayscale_jpeg(tmp_path):
    """Grayscale JPEGs: libjpeg's JCS_RGB conversion must agree with
    PIL's convert('RGB') channel duplication."""
    from PIL import Image
    if not loader.native_available():
        pytest.skip("native loader disabled")
    p = str(tmp_path / "gray.jpg")
    Image.fromarray(
        np.random.RandomState(5).randint(0, 256, (120, 160), np.uint8),
        mode="L").save(p, quality=95)
    canv, metas, sizes = loader.load_letterboxed_batch([p], 160)
    c, m, z = loader.load_letterboxed(p, 160)
    np.testing.assert_array_equal(canv[0], c)
    np.testing.assert_allclose(metas[0], m)


def test_env_kill_switch(jpeg_dir, monkeypatch):
    """ICX_NATIVE_LOADER=0 routes the whole batch through PIL."""
    monkeypatch.setenv("ICX_NATIVE_LOADER", "0")
    monkeypatch.setattr(loader, "_lib_checked", False)
    monkeypatch.setattr(loader, "_lib", None)
    assert not loader.native_available()
    canv, metas, sizes = loader.load_letterboxed_batch(jpeg_dir[:2], 320)
    c, m, z = loader.load_letterboxed(jpeg_dir[0], 320)
    np.testing.assert_array_equal(canv[0], c)
    monkeypatch.setattr(loader, "_lib_checked", False)
    monkeypatch.setattr(loader, "_lib", None)


@pytest.mark.parametrize("native", [True, False])
def test_return_ok_isolates_unreadable_images(jpeg_dir, tmp_path,
                                              monkeypatch, native):
    """return_ok=True: corrupt files yield ok=False + a gray canvas on
    BOTH backends; good rows are untouched.  Default mode raises."""
    if not native:
        monkeypatch.setenv("ICX_NATIVE_LOADER", "0")
        monkeypatch.setattr(loader, "_lib_checked", False)
        monkeypatch.setattr(loader, "_lib", None)
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"definitely not an image")
    paths = [jpeg_dir[0], bad, jpeg_dir[1]]
    canv, metas, sizes, ok = loader.load_letterboxed_batch(
        paths, 320, return_ok=True)
    np.testing.assert_array_equal(ok, [True, False, True])
    assert (canv[1] == 114).all() and metas[1, 0] == 1.0
    ref, mref, zref = loader.load_letterboxed(jpeg_dir[0], 320)
    np.testing.assert_array_equal(canv[0], ref)
    with pytest.raises(Exception):
        loader.load_letterboxed_batch(paths, 320)
    if not native:
        monkeypatch.setattr(loader, "_lib_checked", False)
        monkeypatch.setattr(loader, "_lib", None)


def test_stale_binary_missing_symbol_falls_back(jpeg_dir, monkeypatch):
    """A loadable .so that lacks icx_load_letterboxed_batch (stale build
    that ensure_fresh_binary warned about but could not rebuild) must
    degrade to the PIL path, not raise AttributeError out of
    _native_lib."""
    import ctypes

    class _EmptyLib:                      # loads fine, has no symbols
        def __getattr__(self, name):
            raise AttributeError(name)

    monkeypatch.setattr(loader, "_lib_checked", False)
    monkeypatch.setattr(loader, "_lib", None)
    monkeypatch.setattr(ctypes, "CDLL", lambda *_a, **_k: _EmptyLib())
    assert not loader.native_available()
    canv, _, _ = loader.load_letterboxed_batch(jpeg_dir[:1], 320)
    ref, _, _ = loader.load_letterboxed(jpeg_dir[0], 320)
    np.testing.assert_array_equal(canv[0], ref)
    monkeypatch.setattr(loader, "_lib_checked", False)
    monkeypatch.setattr(loader, "_lib", None)


def test_native_abi_n_zero_returns(jpeg_dir):
    """The exported C symbol itself must tolerate n=0 (the Python wrapper
    happens to guard it, but the symbol is the public contract; the
    pre-fix code underflowed reserve(nthreads-1) and threw across the
    extern \"C\" boundary)."""
    import ctypes

    lib = loader._native_lib()
    if lib is None:
        pytest.skip("native loader not built")
    arr = (ctypes.c_char_p * 1)(b"unused")
    lib.icx_load_letterboxed_batch(arr, 0, 64, 0, 32, 4, None, None,
                                   None, None)   # must simply return


def test_empty_batch_returns_empty_arrays():
    canv, metas, sizes = loader.load_letterboxed_batch([], 320)
    assert canv.shape == (0, 320, 320, 3) and metas.shape == (0, 3)
    *_, ok = loader.load_letterboxed_batch([], 320, rect=True,
                                           return_ok=True)
    assert ok.shape == (0,)


def test_etl_uses_batch_loader(tmp_path, monkeypatch):
    """extract_split_features consumes the batch loader output; a tiny
    fake-extract run over real JPEGs must see correctly letterboxed
    canvases whichever backend is active."""
    from PIL import Image
    import image_caption_tpu.vision.pipeline as pipe_mod
    from image_caption_tpu.vision.etl import extract_split_features

    rng = np.random.RandomState(11)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"e{i}.jpg")
        Image.fromarray(rng.randint(0, 256, (60 + 10 * i, 90, 3),
                                    np.uint8)).save(p, quality=95)
        paths.append(p)

    seen = {}

    def fake_extract(params, canvases, metas, sizes, **kw):
        canvases = np.asarray(canvases)
        b = canvases.shape[0]
        seen.setdefault("canvases", []).append(canvases)
        seen.setdefault("metas", []).append(np.asarray(metas))
        return (np.zeros((b, 4, 2048), np.float32),
                np.zeros((b, 4, 84), np.float32),
                np.zeros((b, 4, 4), np.float32))

    monkeypatch.setattr(pipe_mod, "extract_features_batch", fake_extract)
    feats, poss = extract_split_features(
        paths, extractor_params={}, num_objects=3, batch_size=3,
        num_workers=2, verbose=False)
    assert feats.shape[0] == 3
    canv = seen["canvases"][0]
    c0, m0, _ = loader.load_letterboxed(paths[0], 640)
    np.testing.assert_array_equal(canv[0], c0)
    np.testing.assert_allclose(seen["metas"][0][0], m0)
