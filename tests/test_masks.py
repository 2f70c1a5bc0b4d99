"""Mask builders vs hand-written truth tables (model.py:202-209,334-359,
461-486)."""

import jax.numpy as jnp
import numpy as np

from image_caption_tpu.ops import masks as M


def test_key_pad_mask_from_features():
    k = jnp.array([[[1.0, 0.0], [0.0, 0.0], [0.0, 2.0]],
                   [[0.0, 0.0], [0.0, 0.0], [1.0, 1.0]]])
    out = M.key_pad_mask_from_features(k, q_len=2)
    expected = np.array([
        [[False, True, False], [False, True, False]],
        [[True, True, False], [True, True, False]],
    ])
    np.testing.assert_array_equal(np.asarray(out), expected)


def test_key_pad_mask_from_tokens():
    toks = jnp.array([[1, 5, 0, 0], [1, 0, 3, 2]])
    out = M.key_pad_mask_from_tokens(toks, q_len=3, pad_idx=0)
    assert out.shape == (2, 3, 4)
    np.testing.assert_array_equal(
        np.asarray(out[0, 0]), [False, False, True, True])
    np.testing.assert_array_equal(
        np.asarray(out[1, 2]), [False, True, False, False])


def test_subsequent_mask():
    out = np.asarray(M.subsequent_mask(2, 3))
    expected = np.array([[False, True, True],
                         [False, False, True],
                         [False, False, False]])
    np.testing.assert_array_equal(out[0], expected)
    np.testing.assert_array_equal(out[1], expected)


def test_non_pad_masks():
    feats = jnp.array([[[1.0, 0.0], [0.0, 0.0]]])
    np.testing.assert_array_equal(
        np.asarray(M.non_pad_mask_from_features(feats))[0, :, 0], [1.0, 0.0])
    toks = jnp.array([[1, 0, 7]])
    np.testing.assert_array_equal(
        np.asarray(M.non_pad_mask_from_tokens(toks))[0, :, 0],
        [1.0, 0.0, 1.0])


def test_combine_masks_is_or():
    a = jnp.array([[True, False], [False, False]])
    b = jnp.array([[False, False], [True, False]])
    out = np.asarray(M.combine_masks(a, b))
    np.testing.assert_array_equal(out, [[True, False], [True, False]])
