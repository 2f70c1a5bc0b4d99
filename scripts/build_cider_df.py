#!/usr/bin/env python
"""Build the frozen CIDEr document-frequency pickle for RL rewards.

The reference builds its scorers with ``df='coco-val'`` — a precomputed
n-gram document-frequency table over the COCO validation corpus
(``/root/reference/core/TRANSFORMER/loss.py:112-116``).  This script
produces an equivalent pickle from any references file or captions JSON:

    python scripts/build_cider_df.py data/train/train.references.pkl \\
        data/coco-val-df.p

The output format is ``{"document_frequency": {ngram_tuple: df},
"ref_len": N_docs}`` (raw document count, logged at load) — the published
ruotianluo coco-val-df.p layout, what ``metrics.cider`` loads via
``$ICX_CIDER_DF`` or ``./data/coco-val-df.p``.
"""

import json
import pickle
import sys
from collections import defaultdict


def iter_caption_groups(path):
    """Yield lists of captions per image from a references pickle
    ({idx: [captions]}) or a COCO captions JSON."""
    if path.endswith(".json"):
        with open(path) as f:
            coco = json.load(f)
        groups = defaultdict(list)
        for ann in coco["annotations"]:
            groups[ann["image_id"]].append(ann["caption"].lower())
        yield from groups.values()
    else:
        with open(path, "rb") as f:
            refs = pickle.load(f)
        yield from refs.values()


def main(src: str, dst: str) -> None:
    from image_caption_tpu.metrics.cider import (build_doc_frequency,
                                                 save_doc_frequency)

    blob = build_doc_frequency(iter_caption_groups(src))
    save_doc_frequency(blob, dst)
    print(f"wrote df with {len(blob['document_frequency'])} n-grams "
          f"(ref_len {blob['ref_len']:.0f} docs) to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
