"""Reference-checkpoint import/export roundtrip and logits parity."""

import jax
import numpy as np
import pytest

from image_caption_tpu.models.captioner import (captioner_logits,
                                                init_captioner)
from image_caption_tpu.utils.torch_import import (
    export_reference_state_dict, import_reference_state_dict)

from conftest import make_fake_batch


@pytest.mark.parametrize("cfg_fixture", ["tiny_cfg", "flagship_tiny_cfg"])
def test_roundtrip_preserves_logits(cfg_fixture, request):
    cfg = request.getfixturevalue(cfg_fixture)
    m = cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    feats, poss, caps = make_fake_batch(cfg, batch=2)

    want = np.asarray(captioner_logits(params, m, feats, poss, caps,
                                       deterministic=True))

    sd = export_reference_state_dict(params, m)
    back = import_reference_state_dict(sd, m)
    got = np.asarray(captioner_logits(back, m, feats, poss, caps,
                                      deterministic=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_roundtrip_tree_equality(tiny_cfg):
    m = tiny_cfg.model
    params = init_captioner(jax.random.PRNGKey(1), m)
    back = import_reference_state_dict(
        export_reference_state_dict(params, m), m)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): l
              for p, l in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[key]), err_msg=key)


def test_export_names_match_reference_layout(flagship_tiny_cfg):
    """Spot-check the exact reference state_dict names (model.py:44-68,
    modules.py:42-59), including the 'classifer' spelling."""
    m = flagship_tiny_cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    sd = export_reference_state_dict(params, m)
    for name in (
            "classifer.weight", "classifer.bias",
            "encoder.feature_embedding.weight",
            "encoder.position_embedding.weight",
            "encoder.norm.weight",
            "encoder.image_encoder.multihead_attention.q_linear.weight",
            "encoder.encoder.0.multihead_attention.joint_linear.weight",
            "encoder.encoder.1.feed_forward.position_wise_2.bias",
            "decoder.word_embedding.weight",
            "decoder.word_embedding_linear.weight",
            "decoder.decoder.0.self_attention.k_linear.weight",
            "decoder.decoder.1.encode_attention.layer_norm.bias",
    ):
        assert name in sd, name
    # bias-free projections must not export biases
    assert "encoder.feature_embedding.bias" not in sd
    assert "decoder.decoder.0.self_attention.q_linear.bias" not in sd
    # torch orientation: classifier weight is [vocab, d]
    assert sd["classifer.weight"].shape == (m.num_vocab,
                                            m.decode_input_size)


def test_import_from_real_torch_state_dict(tiny_cfg):
    """Weights saved through an actual torch module load correctly."""
    torch = pytest.importorskip("torch")
    m = tiny_cfg.model
    params = init_captioner(jax.random.PRNGKey(0), m)
    sd_np = export_reference_state_dict(params, m)
    sd_t = {k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in sd_np.items()}

    back = import_reference_state_dict(sd_t, m)
    feats, poss, caps = make_fake_batch(tiny_cfg, batch=2)
    a = np.asarray(captioner_logits(params, m, feats, poss, caps,
                                    deterministic=True))
    b = np.asarray(captioner_logits(back, m, feats, poss, caps,
                                    deterministic=True))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-5)
