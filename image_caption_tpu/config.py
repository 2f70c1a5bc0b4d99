"""Typed configuration for the TPU-native image-captioning framework.

The reference (shao-chi/Image-Caption) configures experiments through a single
constants module with ~20 ``if OUTPUT_NAME == ...`` blocks selected by editing
the file (``/root/reference/core/config.py:21-22,71-695``).  Here every
experiment is a frozen dataclass preset, selectable by name from the CLI and
overridable field-by-field.

Reference parity notes are cited as ``file:line`` into ``/root/reference``.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


# ---------------------------------------------------------------------------
# Special vocabulary tokens (core/preprocess.py:303)
# ---------------------------------------------------------------------------
NULL_TOKEN = "<NULL>"
START_TOKEN = "<START>"
END_TOKEN = "<END>"
UNK_TOKEN = "<UNK>"

NULL_IDX = 0
START_IDX = 1
END_IDX = 2
UNK_IDX = 3


@dataclass(frozen=True)
class ModelConfig:
    """Captioner architecture (reference: core/TRANSFORMER/model.py:10-36).

    ``max_length`` is the *caption vector length* = MAX_LENGTH + 2 slots for
    <START>/<END> (core/models.py:88); the decoder's positional table spans
    ``max_length - 1`` positions (model.py:383).
    """

    num_vocab: int = 12_000
    max_length: int = 51                 # MAX_LENGTH(49) + 2 (core/models.py:88)
    num_objects: int = 36                # core/config.py:7
    dim_features: int = 2048             # core/config.py:51
    dim_positions: int = 84              # YOLOv5: 4 xyxy + 80 class*conf (core/config.py:53-54)
    pad_idx: int = 0                     # core/config.py:8
    dropout: float = 0.3                 # core/config.py:61
    attention_dropout: float = 0.1       # modules.py:8 (fixed 0.1 in the
                                         # reference; configurable here —
                                         # plumbed through every block)

    # encoder (core/config.py:87-93 for the shipped preset)
    encode_input_size: int = 256
    encode_q_k_dim: int = 256
    encode_v_dim: int = 256
    encode_hidden_size: int = 256
    encode_num_blocks: int = 2
    encode_num_heads: int = 32

    # decoder (core/config.py:95-102)
    dim_word_embedding: int = 256
    decode_input_size: int = 256
    decode_q_k_dim: int = 256
    decode_v_dim: int = 256
    decode_hidden_size: int = 256
    decode_num_blocks: int = 5
    decode_num_heads: int = 32

    # behaviour flags (core/config.py:16-19)
    move_first_image_feature: bool = False
    split_position: bool = False
    encode_mask: bool = True
    split_image_objects: bool = True

    # loss selection: 'cross_entropy' | 'focal' (model.py:73-76)
    xe_loss: str = "cross_entropy"
    focal_gamma: float = 2.0             # loss.py:14

    # numerics: compute dtype for matmuls; params stay f32
    compute_dtype: str = "float32"

    def __post_init__(self):
        assert self.encode_q_k_dim % self.encode_num_heads == 0
        assert self.encode_v_dim % self.encode_num_heads == 0
        assert self.decode_q_k_dim % self.decode_num_heads == 0
        assert self.decode_v_dim % self.decode_num_heads == 0
        assert self.xe_loss in ("cross_entropy", "focal")

    @property
    def num_slots(self) -> int:
        """Object slots incl. the whole-image slot (NUM_OBJECT + 1)."""
        return self.num_objects + 1


@dataclass(frozen=True)
class RLConfig:
    """Self-critical (SCST-style) loss weights (core/config.py:80-86)."""

    structure_loss_weight: float = 0.5
    cider_reward_weight: float = 1.0
    bleu_reward_weight: float = 1.0
    entropy_reward_weight: float = 1.0
    self_cider_reward_weight: float = 1.0
    # reference 'sample' is argmax of log-softmax (model_RL.py:93-97);
    # 'categorical' is the statistically correct SCST sampler.
    sample_mode: str = "argmax"          # 'argmax' | 'categorical'
    # samples per item (categorical only): N > 1 activates the reference's
    # dormant multi-sample machinery (loss.py:140-141,158-159) as a real
    # leave-in mean baseline over the samples
    num_samples: int = 1
    # two-phase (callback-free) schedule only: depth 1 (default) runs the
    # FUSED pipelined schedule — one device dispatch per step applies the
    # pending update and samples the next batch from the post-update
    # params (rl/step.py:compile_rl_fused_update_sample).  Because the
    # sample reads the params the update just produced, the trajectory is
    # IDENTICAL to the reference's serial sample->score->update
    # (core/models.py:184-195) up to XLA program-boundary float
    # reassociation (tests/test_rl_two_phase.py pins per-step metrics AND
    # final params against the serial schedule); what pipelining buys is
    # host-scoring/device/transfer overlap and one dispatch instead of
    # two — ~4x steps/s on the tunneled chip (docs/performance.md RL
    # attribution).  0 = literally one program per phase, the serial
    # schedule with the device idle during host scoring (the debugging /
    # bit-parity-vs-callback-mode setting).
    pipeline_depth: int = 1


@dataclass(frozen=True)
class TrainConfig:
    """Solver settings (core/config.py:59-68)."""

    num_epochs: int = 1000
    batch_size: int = 32
    learning_rate: float = 5e-4
    seed: int = 0
    log_every: int = 100                 # main.py:69
    sample_every: int = 2500             # main.py:84
    # XE steps fused into one scanned dispatch (update-for-update
    # equivalent to single stepping; train/step.py
    # compile_train_step_scan).  1 = reference cadence (log/sample fire
    # exactly on their iterations); K>1 amortizes dispatch overhead —
    # log/sample then fire at the first chunk boundary past each
    # multiple.  XE only (the RL step needs host reward scoring
    # mid-step).
    scan_steps: int = 1
    # mesh axes sizes; -1 on data means "all remaining devices"
    data_axis: int = -1
    model_axis: int = 1
    donate_state: bool = True
    checkpoint_every_epochs: int = 1     # main.py:151
    keep_checkpoints: int = 5


@dataclass(frozen=True)
class DataConfig:
    """Dataset layout (core/utils.py:32-64, core/config.py:21-27)."""

    data_path: str = "./data/maxlen49_36obj_1wordCount"
    output_path: str = "./output/default"
    max_caption_words: int = 49          # MAX_LENGTH (core/config.py:5)
    word_count_threshold: int = 1        # core/config.py:6
    max_obj: int = 5                     # core/config.py:9 (feature ETL truncation)
    image_model: str = "YOLOv5"          # 'YOLOv5' | 'FasterRCNN' (core/config.py:11)
    # feature-store access: 'auto' streams splits larger than the loader
    # threshold from disk, 'never' = reference behavior (whole split in
    # RAM, core/utils.py:45-46), 'always' = force streamed reads
    stream_features: str = "auto"
    # YOLO letterbox mode: False = square 640 canvas (static-shape
    # default), True = ultralytics auto-rect geometry with cells beyond
    # the content rect masked (reference LoadImages parity,
    # detect_for_preprocess.py:55,66; see docs/parity.md)
    rect_letterbox: bool = False
    # feature encoder: 'crop' = ResNet-101 per detection crop (reference
    # recipe, core/preprocess.py:91-138 — the parity default); 'roi' =
    # one shared ResNet-101 trunk over the canvas with ROI-aligned slot
    # features (fast mode; see docs/parity.md caveat — features are NOT
    # interchangeable with crop-mode features)
    feature_mode: str = "crop"
    roi_trunk_size: int = 448            # trunk input for 'roi' mode
    # YOLO input for 'roi' mode.  The detector dominates the roi pipeline
    # (~110 ms of its ~205 ms at 448, B=128 — docs/performance.md), so
    # the r5 default detects at 320 (~950 img/s/chip vs 713 at 448);
    # slot FEATURES are untouched (same 448 trunk) — only which boxes
    # get pooled changes.  Box-set sensitivity to detect resolution is a
    # real-weight property (scripts/feature_fidelity.py --weights-dir
    # records it; random-weight box sets are noise — measured, see
    # docs/performance.md r5 fidelity table).  Set 448 (or 640) to trade
    # throughput back for detector resolution; roi mode itself is
    # already the documented non-parity fast path (docs/parity.md).
    roi_detect_size: int = 320

    @property
    def word_to_idx_path(self) -> str:
        return f"{self.data_path}/train/word_index.pkl"


@dataclass(frozen=True)
class Config:
    name: str = "default"
    caption_model: str = "Transformer"   # 'Transformer' | 'RL_Transformer'
    model: ModelConfig = field(default_factory=ModelConfig)
    rl: RLConfig = field(default_factory=RLConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)

    def with_overrides(self, **kwargs) -> "Config":
        """Apply dotted overrides, e.g. ``model.dropout=0.1``."""
        cfg = self
        for key, value in kwargs.items():
            if "." in key:
                section, leaf = key.split(".", 1)
                sub = getattr(cfg, section)
                cfg = replace(cfg, **{section: replace(sub, **{leaf: value})})
            else:
                cfg = replace(cfg, **{key: value})
        return cfg


# ---------------------------------------------------------------------------
# Preset registry mirroring the reference's OUTPUT_NAME blocks
# (core/config.py:71-695).  Identical hyperparameters are shared through
# helper constructors.
# ---------------------------------------------------------------------------

def _d256_25b_32h(**kw) -> ModelConfig:
    """The 256-wide enc2/dec5 32-head family (core/config.py:87-102)."""
    base = dict(
        encode_input_size=256, encode_q_k_dim=256, encode_v_dim=256,
        encode_hidden_size=256, encode_num_blocks=2, encode_num_heads=32,
        dim_word_embedding=256, decode_input_size=256, decode_q_k_dim=256,
        decode_v_dim=256, decode_hidden_size=256, decode_num_blocks=5,
        decode_num_heads=32,
    )
    base.update(kw)
    return ModelConfig(**base)


_PRESETS: dict[str, Config] = {}


def register_preset(cfg: Config) -> Config:
    assert cfg.name not in _PRESETS, cfg.name
    _PRESETS[cfg.name] = cfg
    return cfg


def get_preset(name: str) -> Config:
    if name not in _PRESETS:
        raise KeyError(
            f"Unknown preset {name!r}. Available: {sorted(_PRESETS)}")
    return _PRESETS[name]


def list_presets() -> list[str]:
    return sorted(_PRESETS)


# The shipped default (core/config.py:71-102): RL, encoder causal mask on,
# split-image-objects pairing on.
FLAGSHIP = register_preset(Config(
    name="RL_maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj",
    caption_model="RL_Transformer",
    model=_d256_25b_32h(encode_mask=True, split_image_objects=True),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_split_img_obj",
    caption_model="Transformer",
    model=_d256_25b_32h(encode_mask=True, split_image_objects=True),
))

register_preset(Config(
    name="RL_maxlen49_36obj_1wordCount_256_25b_32h_move",
    caption_model="RL_Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=True, split_image_objects=False),
))

# core/config.py:165-196 — structure-loss weight 0.7
register_preset(Config(
    name="RL_maxlen49_36obj_1wordCount_256_25b_32h_move_2",
    caption_model="RL_Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=True, split_image_objects=False),
    rl=RLConfig(structure_loss_weight=0.7),
))

# core/config.py:198-222
register_preset(Config(
    name="maxlen49_36obj_1wordCount_20conf_256_25b_32h_move",
    caption_model="Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=True, split_image_objects=False),
))

# core/config.py:249-272
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_RL",
    caption_model="RL_Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=False, split_image_objects=False),
))

# core/config.py:299-324 — the block asserts MOVE_FIRST (model.py quirk)
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_EncoderMask",
    caption_model="Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=True, split_image_objects=False),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_FocalLoss",
    caption_model="Transformer",
    model=_d256_25b_32h(xe_loss="focal", move_first_image_feature=True,
                        encode_mask=False, split_image_objects=False),
))

# core/config.py:273-297 — both SplitPosition variants assert MOVE_FIRST
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_FocalLoss_SplitPosition",
    caption_model="Transformer",
    model=_d256_25b_32h(xe_loss="focal", split_position=True,
                        move_first_image_feature=True,
                        encode_mask=False, split_image_objects=False),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_SplitPosition",
    caption_model="Transformer",
    model=_d256_25b_32h(split_position=True, move_first_image_feature=True,
                        encode_mask=False, split_image_objects=False),
))

# core/config.py:350-375
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_move",
    caption_model="Transformer",
    model=_d256_25b_32h(move_first_image_feature=True,
                        encode_mask=False, split_image_objects=False),
))

# core/config.py:425-449 — 6 encoder + 6 decoder blocks
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_66b_32h",
    caption_model="Transformer",
    model=_d256_25b_32h(encode_num_blocks=6, decode_num_blocks=6,
                        encode_mask=False, split_image_objects=False),
))

# core/config.py:450-475
register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_mask",
    caption_model="Transformer",
    model=_d256_25b_32h(encode_mask=True, split_image_objects=False),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_256_25b_32h_NoBias",
    caption_model="Transformer",
    model=_d256_25b_32h(encode_mask=False, split_image_objects=False),
))


def _d128_14b_16h(**kw) -> ModelConfig:
    """128-wide enc1/dec4 family, FFN 256 (core/config.py:476-500,526-552)."""
    base = dict(
        encode_input_size=128, encode_q_k_dim=128, encode_v_dim=128,
        encode_hidden_size=256, encode_num_blocks=1, encode_num_heads=16,
        dim_word_embedding=256, decode_input_size=128, decode_q_k_dim=128,
        decode_v_dim=128, decode_hidden_size=256, decode_num_blocks=4,
        decode_num_heads=16, split_image_objects=False)
    base.update(kw)
    return ModelConfig(**base)


register_preset(Config(
    name="maxlen49_36obj_1wordCount_128_14b_16h_mask",
    caption_model="Transformer",
    model=_d128_14b_16h(encode_mask=True),
))

# core/config.py:501-525 — NUM_OBJECT = 20
register_preset(Config(
    name="maxlen49_20obj_128_25b_32h",
    caption_model="Transformer",
    model=ModelConfig(
        num_objects=20, encode_mask=False, split_image_objects=False,
        encode_input_size=64, encode_q_k_dim=128, encode_v_dim=128,
        encode_hidden_size=128, encode_num_blocks=2, encode_num_heads=32,
        dim_word_embedding=256, decode_input_size=64, decode_q_k_dim=128,
        decode_v_dim=128, decode_hidden_size=128, decode_num_blocks=5,
        decode_num_heads=32),
))

for _name, _mask in (("maxlen49_20obj_128_14b_16h", False),
                     ("maxlen49_20obj_128_14b_16h_mask", True),
                     ("maxlen49_20obj_128_14b_16h_mask_slower", True)):
    register_preset(Config(
        name=_name, caption_model="Transformer",
        model=_d128_14b_16h(num_objects=20, encode_mask=_mask),
    ))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_128_24b_8h_SplitPosition",
    caption_model="Transformer",
    model=ModelConfig(
        split_position=True, move_first_image_feature=True,
        encode_mask=False, split_image_objects=False,
        encode_input_size=64, encode_q_k_dim=128, encode_v_dim=128,
        encode_hidden_size=128, encode_num_blocks=2, encode_num_heads=8,
        dim_word_embedding=256, decode_input_size=64, decode_q_k_dim=128,
        decode_v_dim=128, decode_hidden_size=128, decode_num_blocks=4,
        decode_num_heads=8),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_move_3",
    caption_model="Transformer",
    model=ModelConfig(
        move_first_image_feature=True, encode_mask=False,
        split_image_objects=False,
        encode_input_size=256, encode_q_k_dim=512, encode_v_dim=512,
        encode_hidden_size=1024, encode_num_blocks=3, encode_num_heads=16,
        dim_word_embedding=256, decode_input_size=256, decode_q_k_dim=512,
        decode_v_dim=512, decode_hidden_size=1024, decode_num_blocks=5,
        decode_num_heads=16),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_1024_25b_32h_mask",
    caption_model="Transformer",
    model=ModelConfig(
        encode_mask=True, split_image_objects=False,
        encode_input_size=1024, encode_q_k_dim=1024, encode_v_dim=1024,
        encode_hidden_size=2048, encode_num_blocks=2, encode_num_heads=32,
        dim_word_embedding=1024, decode_input_size=1024,
        decode_q_k_dim=1024, decode_v_dim=1024, decode_hidden_size=2048,
        decode_num_blocks=5, decode_num_heads=32),
))

register_preset(Config(
    name="maxlen49_36obj_1wordCount_frcnn_256_25b_32h",
    caption_model="Transformer",
    model=_d256_25b_32h(dim_positions=95, encode_mask=False,
                        split_image_objects=False),
    data=DataConfig(image_model="FasterRCNN"),
))

# Tiny configs used for fast tests / golden-parity (core/config.py:553-599)
register_preset(Config(
    name="maxlen49_64",
    caption_model="Transformer",
    model=ModelConfig(
        encode_mask=False, split_image_objects=False,
        encode_input_size=64, encode_q_k_dim=64, encode_v_dim=64,
        encode_hidden_size=64, encode_num_blocks=1, encode_num_heads=2,
        dim_word_embedding=64, decode_input_size=64, decode_q_k_dim=64,
        decode_v_dim=64, decode_hidden_size=64, decode_num_blocks=3,
        decode_num_heads=2),
))

register_preset(Config(
    name="maxlen49_128",
    caption_model="Transformer",
    model=ModelConfig(
        encode_mask=False, split_image_objects=False,
        encode_input_size=64, encode_q_k_dim=128, encode_v_dim=128,
        encode_hidden_size=128, encode_num_blocks=2, encode_num_heads=4,
        dim_word_embedding=128, decode_input_size=64, decode_q_k_dim=128,
        decode_v_dim=128, decode_hidden_size=128, decode_num_blocks=4,
        decode_num_heads=4),
))

# core/config.py:601-695 — remaining tiny experiment blocks
register_preset(Config(
    name="maxlen49_128_14b",
    caption_model="Transformer",
    model=ModelConfig(
        encode_mask=False, split_image_objects=False,
        encode_input_size=128, encode_q_k_dim=128, encode_v_dim=128,
        encode_hidden_size=128, encode_num_blocks=1, encode_num_heads=4,
        dim_word_embedding=128, decode_input_size=128, decode_q_k_dim=128,
        decode_v_dim=128, decode_hidden_size=128, decode_num_blocks=4,
        decode_num_heads=4),
))

register_preset(Config(
    name="maxlen49_256_13b",
    caption_model="Transformer",
    model=ModelConfig(
        encode_mask=False, split_image_objects=False,
        encode_input_size=128, encode_q_k_dim=256, encode_v_dim=256,
        encode_hidden_size=128, encode_num_blocks=1, encode_num_heads=4,
        dim_word_embedding=128, decode_input_size=128, decode_q_k_dim=256,
        decode_v_dim=256, decode_hidden_size=128, decode_num_blocks=3,
        decode_num_heads=4),
))

register_preset(Config(
    name="maxlen49_128_14b_8h",
    caption_model="Transformer",
    model=_d128_14b_16h(encode_mask=False, encode_num_heads=8,
                        decode_num_heads=8),
))

register_preset(Config(
    name="maxlen49_128_14b_16h",
    caption_model="Transformer",
    model=_d128_14b_16h(encode_mask=False),
))
