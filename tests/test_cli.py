"""CLI surface tests: parser construction, overrides, preset wiring."""

import pytest

from image_caption_tpu.main import _parse_overrides, build_parser, _load_config


def test_parse_overrides_types():
    out = _parse_overrides(["train.batch_size=64", "model.dropout=0.1",
                            "model.encode_mask=true",
                            "data.image_model=FasterRCNN"])
    assert out == {"train.batch_size": 64, "model.dropout": 0.1,
                   "model.encode_mask": True,
                   "data.image_model": "FasterRCNN"}


def test_parse_overrides_rejects_bad_pair():
    with pytest.raises(SystemExit):
        _parse_overrides(["no_equals_sign"])


def test_load_config_applies_overrides():
    p = build_parser()
    args = p.parse_args([
        "--preset", "maxlen49_64", "--set", "model.num_vocab=99",
        "--set", "train.learning_rate=0.001",
        "--data-path", "/tmp/x", "--output-path", "/tmp/y",
        "train", "--epochs", "2"])
    cfg = _load_config(args)
    assert cfg.model.num_vocab == 99
    assert cfg.train.learning_rate == 0.001
    assert cfg.data.data_path == "/tmp/x"
    assert cfg.data.output_path == "/tmp/y"
    assert args.epochs == 2


def test_all_subcommands_parse():
    p = build_parser()
    for argv in (
            ["train"],
            ["evaluation", "--split", "test", "--epoch", "3",
             "--beam-size", "5"],
            ["demo", "--image-path", "x.jpg", "--save-img"],
            ["features", "--coco-root", "/data"],
    ):
        args = p.parse_args(argv)
        assert callable(args.fn)


def test_unknown_preset_lists_options():
    p = build_parser()
    args = p.parse_args(["--preset", "nope", "train"])
    with pytest.raises(KeyError) as e:
        _load_config(args)
    assert "maxlen49_64" in str(e.value)


def test_compile_cache_configured(tmp_path, monkeypatch):
    """_enable_compile_cache points jax at the persistent compilation
    cache (ICX_COMPILE_CACHE wins over the default location) and creates
    the directory; an empty value disables without touching jax."""
    import jax

    from image_caption_tpu.main import _enable_compile_cache

    cache = tmp_path / "xla-cache"
    monkeypatch.setenv("ICX_COMPILE_CACHE", str(cache))
    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        _enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert cache.is_dir()
        # empty -> disabled, config untouched
        monkeypatch.setenv("ICX_COMPILE_CACHE", "")
        jax.config.update("jax_compilation_cache_dir", None)
        _enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          before_min)
