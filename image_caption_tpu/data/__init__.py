"""Data: tokenizer, vocab, dataset loaders, prefetch, synthetic."""

from .dataset import CaptionBatches, CocoSplit, ImageBatches, load_split  # noqa: F401
from .vocab import build_caption_vector, build_vocab, decode_captions, invert_vocab  # noqa: F401
