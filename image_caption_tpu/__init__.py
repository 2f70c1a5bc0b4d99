"""image_caption_tpu — a TPU-native image-captioning framework.

A ground-up JAX/XLA/Pallas/pjit re-design with the capabilities of
shao-chi/Image-Caption: region-feature extraction (YOLOv5/ResNet-101 ->
fixed object slots), an encoder-decoder caption Transformer, XE / focal /
self-critical (SCST) training, KV-cached greedy + beam decoding, and
coco-caption-compatible evaluation metrics.
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import Config, DataConfig, ModelConfig, RLConfig, TrainConfig  # noqa: F401
from .config import FLAGSHIP, get_preset, list_presets  # noqa: F401
