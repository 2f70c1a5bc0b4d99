"""Demo attention-overlay rendering (PIL).

Reproduces the reference demo's per-timestep visualization
(``/root/reference/main.py:212-244``): for each decode step, each detected
object box is re-tinted by its cross-attention weight over a dimmed
background, one image written per generated token to
``{out_dir}/{t}_{word}.jpg``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def save_attention_overlays(image_path: str, attention: np.ndarray,
                            boxes_xyxy: np.ndarray, caption: str,
                            out_dir: str, *, dim: float = 0.2,
                            max_steps: Optional[int] = None) -> list:
    """attention [T, S] (slot 0 = whole image, 1.. = boxes), boxes [K, 4]
    original-image pixels.  Returns written paths."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    with Image.open(image_path) as im:
        base = np.asarray(im.convert("RGB"), np.float32)

    words = caption.split()
    steps = len(words) if max_steps is None else min(len(words), max_steps)
    steps = min(steps, attention.shape[0])

    valid = (boxes_xyxy[:, 2] - boxes_xyxy[:, 0]) * \
            (boxes_xyxy[:, 3] - boxes_xyxy[:, 1]) > 0
    paths = []
    for t in range(steps):
        att = attention[t]
        # background dimmed; each box brightened by its (normalized) weight
        canvas = base * dim
        obj_att = att[1:1 + len(boxes_xyxy)]
        denom = obj_att.max() if obj_att.size and obj_att.max() > 0 else 1.0
        for k, box in enumerate(boxes_xyxy):
            if not valid[k]:
                continue
            x1, y1, x2, y2 = [int(round(v)) for v in box]
            w = float(obj_att[k]) / denom
            alpha = dim + (1.0 - dim) * w
            canvas[y1:y2, x1:x2] = np.maximum(
                canvas[y1:y2, x1:x2], base[y1:y2, x1:x2] * alpha)
        word = words[t].strip(".") or "end"
        path = os.path.join(out_dir, f"{t}_{word}.jpg")
        Image.fromarray(np.clip(canvas, 0, 255).astype(np.uint8)).save(path)
        paths.append(path)
    return paths
