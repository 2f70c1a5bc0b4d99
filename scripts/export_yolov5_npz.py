#!/usr/bin/env python
"""One-time converter: ultralytics yolov5 .pt / torchvision resnet .pth ->
plain .npz state_dicts loadable without the source repos.

Raw ultralytics checkpoints pickle the full model object and need the
yolov5 repo on sys.path to unpickle; run this once wherever that repo is
available, then ship the npz:

    python scripts/export_yolov5_npz.py yolov5x.pt weights/yolov5x.npz
    python scripts/export_yolov5_npz.py resnet101.pth weights/resnet101.npz
"""

import sys

import numpy as np


def main(src: str, dst: str) -> None:
    import torch
    obj = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:     # ultralytics ckpt
        obj = obj["model"]
    sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    arrays = {k: v.detach().cpu().float().numpy() for k, v in sd.items()}
    np.savez(dst, **arrays)
    print(f"wrote {len(arrays)} arrays to {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
