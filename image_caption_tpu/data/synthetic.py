"""Synthetic COCO-format dataset generator (reference on-disk layout).

Produces the exact file set ``load_split`` consumes
(``/root/reference/core/utils.py:32-64`` layout) from random data — used by
integration tests and smoke verification without real MS-COCO: captions are
drawn from a toy grammar so metrics are non-degenerate, features are random
with realistic zero-padding.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from ..utils.io import save_hkl, save_pickle
from .vocab import build_caption_vector, build_vocab

_SUBJECTS = ["a man", "a woman", "a dog", "a cat", "a group of people",
             "two birds", "a child"]
_VERBS = ["riding", "holding", "watching", "standing near", "playing with",
          "sitting on"]
_OBJECTS = ["a bicycle", "a red ball", "an umbrella", "the beach",
            "a wooden bench", "a plate of food", "a laptop"]


def _random_caption(rng: np.random.RandomState) -> str:
    return " ".join([_SUBJECTS[rng.randint(len(_SUBJECTS))],
                     _VERBS[rng.randint(len(_VERBS))],
                     _OBJECTS[rng.randint(len(_OBJECTS))]])


def generate_synthetic_dataset(
        data_path: str, *, num_images: Dict[str, int] = None,
        captions_per_image: int = 5, num_slots: int = 37,
        dim_features: int = 2048, dim_positions: int = 84,
        max_length: int = 49, seed: int = 0) -> Dict[str, int]:
    """Write train/valid/test splits under ``data_path``; returns the vocab."""
    num_images = num_images or {"train": 24, "valid": 8, "test": 8}
    rng = np.random.RandomState(seed)

    # shared vocab from the train captions (features.py:52-55 flow)
    all_caps: Dict[str, List[str]] = {}
    for split, n in num_images.items():
        all_caps[split] = [_random_caption(rng)
                           for _ in range(n * captions_per_image)]
    word_to_idx = build_vocab(all_caps["train"], threshold=1)

    for split, n in num_images.items():
        d = os.path.join(data_path, split)
        os.makedirs(d, exist_ok=True)
        caps = all_caps[split]

        feats = rng.randn(n, num_slots, dim_features).astype(np.float32)
        poss = rng.rand(n, num_slots, dim_positions).astype(np.float32)
        for i in range(n):
            k = rng.randint(2, num_slots)
            feats[i, k:] = 0.0
            poss[i, k:] = 0.0

        vectors = build_caption_vector(caps, word_to_idx,
                                       max_length=max_length)
        image_idxs = np.repeat(np.arange(n), captions_per_image)
        file_names = np.asarray([f"{split}_{i:06d}.jpg" for i in range(n)])
        references = {i: [caps[i * captions_per_image + j].lower() + " ."
                          for j in range(captions_per_image)]
                      for i in range(n)}

        save_hkl(feats, os.path.join(d, f"{split}.features.hkl"))
        save_hkl(poss, os.path.join(d, f"{split}.positions.hkl"))
        save_pickle(vectors, os.path.join(d, f"{split}.captions.pkl"))
        save_pickle(image_idxs, os.path.join(
            d, f"{split}.image.indices.pkl"))
        save_pickle(file_names, os.path.join(d, f"{split}.file.names.pkl"))
        save_pickle(references, os.path.join(d, f"{split}.references.pkl"))
        if split == "train":
            save_pickle(word_to_idx, os.path.join(d, "word_index.pkl"))
        if split == "valid":
            # frozen CIDEr df over the valid references, like the real ETL
            # (loss.py:112-116 df='coco-val'; RLTrainer loads this file)
            from ..metrics.cider import build_doc_frequency, \
                save_doc_frequency
            save_doc_frequency(build_doc_frequency(references.values()),
                               os.path.join(data_path, "coco-val-df.p"))
    return word_to_idx


if __name__ == "__main__":
    import sys
    path = sys.argv[1] if len(sys.argv) > 1 else "./data/synthetic"
    vocab = generate_synthetic_dataset(path)
    print(f"wrote synthetic dataset to {path} (vocab={len(vocab)})")
