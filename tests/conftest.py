"""Test env: force an 8-device virtual CPU mesh before jax initializes.

Mirrors SURVEY.md §4 item 5 — pjit/sharding tests run on
``xla_force_host_platform_device_count=8`` and the same bodies run unchanged
on real TPU slices.
"""

import os

# Hard-override: the driver environment pins JAX_PLATFORMS to the TPU tunnel
# ('axon') and its sitecustomize pre-imports jax, so env vars alone are
# ignored.  XLA_FLAGS must land before the first backend init; the platform
# must be forced through jax.config (env is read only once).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from image_caption_tpu.config import get_preset  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    """Small model config for fast tests (mirrors the reference's
    'maxlen49_64' block, core/config.py:553-575) with a tiny vocab."""
    cfg = get_preset("maxlen49_64")
    return cfg.with_overrides(**{"model.num_vocab": 50,
                                 "model.max_length": 13,
                                 "model.num_objects": 6})


@pytest.fixture(scope="session")
def flagship_tiny_cfg():
    """Flagship preset (split_image_objects + encode_mask + RL) shrunk."""
    cfg = get_preset("RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj")
    return cfg.with_overrides(**{
        "model.num_vocab": 50, "model.max_length": 13,
        "model.num_objects": 6,
        "model.encode_input_size": 32, "model.encode_q_k_dim": 32,
        "model.encode_v_dim": 32, "model.encode_hidden_size": 32,
        "model.encode_num_heads": 4, "model.encode_num_blocks": 2,
        "model.dim_word_embedding": 32, "model.decode_input_size": 32,
        "model.decode_q_k_dim": 32, "model.decode_v_dim": 32,
        "model.decode_hidden_size": 32, "model.decode_num_heads": 4,
        "model.decode_num_blocks": 2,
    })


def make_fake_batch(cfg, batch=3, seed=0):
    """Random features/positions/captions with realistic pad structure."""
    rng = np.random.RandomState(seed)
    m = cfg.model
    s = m.num_slots
    feats = rng.randn(batch, s, m.dim_features).astype(np.float32)
    pos = rng.rand(batch, s, m.dim_positions).astype(np.float32)
    # zero-pad tail rows like the ETL does (core/preprocess.py:125-134)
    n_obj = rng.randint(1, s - 1, size=batch)
    for i in range(batch):
        feats[i, n_obj[i] + 1:] = 0.0
        pos[i, n_obj[i] + 1:] = 0.0
        pos[i, 0, :4] = [0, 0, 1, 1]
        pos[i, 0, 4:] = 0.0
    caps = rng.randint(4, m.num_vocab, size=(batch, m.max_length))
    caps = caps.astype(np.int32)
    lengths = rng.randint(3, m.max_length - 2, size=batch)
    for i in range(batch):
        caps[i, 0] = 1
        caps[i, lengths[i]] = 2
        caps[i, lengths[i] + 1:] = 0
    return feats, pos, caps


@pytest.fixture()
def fake_batch(tiny_cfg):
    return make_fake_batch(tiny_cfg)
