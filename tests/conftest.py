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


# ---------------------------------------------------------------------------
# Expected-skip guard (VERDICT r4 weak #6).
#
# Exactly these tests are ALLOWED to skip in a full-tier run: the
# env-blocked fixture replays (no Java/jar, no pycocoevalcap, no CoreNLP
# server in this environment — each skips loudly until its recorder script
# commits a fixture) plus the meteor snapshot's stage-set guard.  Every
# OTHER skip is a regression hiding as environment gating (e.g. the
# committed native .so failing to load would silently skip two whole
# modules), so a full run fails when one appears.  Partial runs
# (single files, -m slow, -k filters) stay unguarded — the threshold
# below only engages when the whole fast tier was collected.
# ---------------------------------------------------------------------------

_EXPECTED_SKIPS = (
    "test_meteor.py::test_native_matches_recorded_jar",
    "test_meteor.py::test_native_regression_pin",
    "test_metrics.py::test_vendored_scorers_match_recorded_pycocoevalcap",
    "test_vocab.py::test_tokenizer_matches_recorded_corenlp",
)
_FULL_RUN_MIN_ITEMS = 200
_skipped_nodeids: list = []


def pytest_runtest_logreport(report):
    if report.skipped and report.when in ("setup", "call"):
        _skipped_nodeids.append(report.nodeid)


def pytest_sessionfinish(session, exitstatus):
    if session.testscollected < _FULL_RUN_MIN_ITEMS or exitstatus != 0:
        return
    unexpected = [n for n in _skipped_nodeids
                  if not n.endswith(_EXPECTED_SKIPS)]
    if unexpected:
        print("\n[conftest] UNEXPECTED SKIPS in a full-tier run "
              "(only the env-blocked fixture replays may skip here; "
              "see _EXPECTED_SKIPS in tests/conftest.py):")
        for n in unexpected:
            print(f"  {n}")
        session.exitstatus = 1
