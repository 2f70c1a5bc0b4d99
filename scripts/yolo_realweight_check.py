"""Real-weight YOLOv5 box-set comparison: ultralytics vs our JAX stack.

The last unproven detector-fidelity link (VERDICT r1 #3 / r2 missing
#1): the JAX YOLOv5 (`vision/yolov5.py` + `vision/nms.py` +
`vision/ops.py` letterbox) has algorithm-level oracles
(tests/test_nms_oracle.py, tests/test_rect_letterbox.py) but has never
been run against an actual ``yolov5x.pt`` box set — this offline
environment has no weights, no ultralytics repo, no network
(docs/parity.md "Detector fidelity").  This script is the comparison,
one command per side the moment those exist:

  # side 1 — wherever ultralytics yolov5 (2020 lineage) + weights live:
  python scripts/yolo_realweight_check.py record \\
      --weights yolov5x.pt --yolov5-repo ./yolov5 \\
      --images ./sample_coco/*.jpg --out ref_boxes.npz
  python scripts/export_yolov5_npz.py yolov5x.pt weights/yolov5x.npz

  # side 2 — here (or anywhere with jax + the two npz):
  python scripts/yolo_realweight_check.py check \\
      --recorded ref_boxes.npz --weights-npz weights/yolov5x.npz

``record`` drives the REFERENCE path exactly as
``data/detect_for_preprocess.py:25-167`` does — ultralytics
``attempt_load`` + ``LoadImages`` rect letterbox (``:55,66``) +
``non_max_suppression(conf=0.01, iou=0.45)`` (``:28-29,78``) +
``scale_coords`` back to original pixels — using the upstream library's
own functions, and records per-image (paths, xyxy, conf, cls).
``check`` runs our stack on the same image files
(``load_letterboxed(rect=True)`` -> ``yolov5_detect`` ->
``unletterbox_boxes``) and greedily IoU-matches the top-K boxes per
image.  PASS when every reference box in the reference's *used* prefix
(top ``num_obj//2 = 18``, detect_for_preprocess.py:141-142) has an
IoU >= --iou-match partner of the same class with |conf delta| <=
--conf-tol.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def record(args) -> int:
    import torch
    sys.path.insert(0, args.yolov5_repo)
    from models.experimental import attempt_load          # yolov5 repo
    from utils.datasets import LoadImages
    from utils.general import non_max_suppression, scale_coords

    model = attempt_load(args.weights, map_location="cpu")
    model.eval()
    # abspath + per-file LoadImages: ultralytics' LoadImages absolutizes
    # its paths and globs directories non-recursively, so feeding it a
    # common directory and filtering by the raw --images strings drops
    # files (relative globs, multi-directory sets).  One LoadImages per
    # file has neither problem.
    matches = {p: sorted(glob.glob(p)) for p in args.images}
    empty = [p for p, m in matches.items() if not m]
    assert not empty, (
        f"--images patterns matched no files: {empty} (a shell-expanded "
        "literal that got here unexpanded is a typo — refusing to record "
        "a silently incomplete reference set)")
    paths = sorted({os.path.abspath(q)
                    for m in matches.values() for q in m})

    out = {"paths": np.asarray(paths),
           # the check side must run the SAME geometry/thresholds; embed
           # them so a record/check flag mismatch can't masquerade as a
           # fidelity failure
           "record_args": np.asarray([args.img_size, args.conf_thres,
                                      args.iou_thres], np.float64)}
    for i, p in enumerate(paths):
        det_np = np.zeros((0, 6), np.float32)
        for _, img, im0, _ in LoadImages(p, img_size=args.img_size):
            x = torch.from_numpy(img).float().unsqueeze(0) / 255.0
            with torch.no_grad():
                pred = model(x)[0]
            det = non_max_suppression(pred, args.conf_thres,
                                      args.iou_thres)[0]
            if det is not None and len(det):
                det[:, :4] = scale_coords(x.shape[2:], det[:, :4],
                                          im0.shape).round()
                det_np = det.cpu().numpy()
        out[f"det_{i}"] = det_np
    np.savez(args.out, **out)
    print(f"recorded {len(paths)} images -> {args.out}")
    return 0


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def match_ref_boxes(ref: np.ndarray, ours: np.ndarray, iou_match: float,
                    conf_tol: float):
    """Greedy per-reference-box matching.  Returns ``[(ref_row,
    best_iou)]`` for unmatched boxes.  Eligible partners only: same class
    (ultralytics NMS is per-class, so co-located boxes of different
    classes are normal), not yet claimed, IoU and conf within tolerance —
    THEN best IoU.  A bare global argmax false-fails exact matches
    whenever a tie or an already-used box wins it."""
    unmatched = []
    used = np.zeros(len(ours), bool)
    iou = _iou_matrix(ref[:, :4], ours[:, :4]) if len(ref) and \
        len(ours) else np.zeros((len(ref), len(ours)))
    for r in range(len(ref)):
        elig = (~used & (iou[r] >= iou_match)
                & (ours[:, 5].astype(int) == int(ref[r, 5]))
                & (np.abs(ours[:, 4] - ref[r, 4]) <= conf_tol)
                ) if iou.shape[1] else np.zeros(0, bool)
        if elig.any():
            j = int(np.where(elig, iou[r], -1.0).argmax())
            used[j] = True
        else:
            best = float(iou[r].max()) if iou.shape[1] else 0.0
            unmatched.append((ref[r], best))
    return unmatched


def check(args) -> int:
    import jax.numpy as jnp

    from image_caption_tpu.vision.loader import load_letterboxed
    from image_caption_tpu.vision.ops import unletterbox_boxes
    from image_caption_tpu.vision.yolov5 import (load_checkpoint,
                                                 stem_is_focus,
                                                 yolov5_detect)

    rec = np.load(args.recorded, allow_pickle=False)
    paths = [str(p) for p in rec["paths"]]
    if args.images_root:             # recorded on another machine: rebase
        bases = [os.path.basename(p) for p in paths]
        dupes = sorted({b for b in bases if bases.count(b) > 1})
        assert not dupes, (
            f"--images-root rebases by basename, but the recording spans "
            f"multiple directories with duplicate basenames {dupes} — "
            "det_<i> box sets would pair with the wrong files.  Mirror "
            "the recording's directory layout instead.")
        paths = [os.path.join(args.images_root, b) for b in bases]
    if "record_args" in rec:         # run the recorded geometry/thresholds
        img_size = int(rec["record_args"][0])
        conf_thres, iou_thres = (float(rec["record_args"][1]),
                                 float(rec["record_args"][2]))
        print(f"[recorded args] img_size={img_size} conf={conf_thres} "
              f"iou={iou_thres}")
    else:
        img_size, conf_thres, iou_thres = (args.img_size, args.conf_thres,
                                           args.iou_thres)
    params = load_checkpoint(args.weights_npz)

    n_fail = 0
    for i, path in enumerate(paths):
        canvas, meta, hw = load_letterboxed(path, img_size, rect=True)
        det = yolov5_detect(
            params, jnp.asarray(canvas[None], jnp.float32) / 255.0,
            conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=args.max_det, focus_stem=stem_is_focus(params),
            rect_hw=jnp.asarray(meta[None, 3:5]))
        valid = np.asarray(det.valid[0])
        boxes = np.asarray(unletterbox_boxes(
            det.boxes[0], jnp.asarray(meta), float(hw[0]), float(hw[1])))
        ours = np.concatenate(
            [boxes, np.asarray(det.scores[0])[:, None],
             np.asarray(det.classes[0])[:, None].astype(np.float32)],
            axis=1)[valid]
        ref = rec[f"det_{i}"][:args.used_prefix]

        unmatched = match_ref_boxes(ref, ours, args.iou_match,
                                    args.conf_tol)
        status = "ok" if not unmatched else f"{len(unmatched)} UNMATCHED"
        print(f"[{os.path.basename(path)}] ref {len(ref)} vs ours "
              f"{len(ours)} boxes: {status}")
        for rbox, best in unmatched:
            print(f"    ref box {rbox[:4].round(1)} conf {rbox[4]:.3f} "
                  f"cls {int(rbox[5])} best-iou {best:.3f}")
        n_fail += bool(unmatched)

    print(f"{'PASS' if n_fail == 0 else 'FAIL'}: "
          f"{len(paths) - n_fail}/{len(paths)} images fully matched "
          f"(iou>={args.iou_match}, conf tol {args.conf_tol}, "
          f"top-{args.used_prefix} reference prefix)")
    return 0 if n_fail == 0 else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="mode", required=True)
    r = sub.add_parser("record")
    r.add_argument("--weights", required=True)
    r.add_argument("--yolov5-repo", required=True)
    r.add_argument("--images", nargs="+", required=True)
    r.add_argument("--out", default="ref_boxes.npz")
    c = sub.add_parser("check")
    c.add_argument("--recorded", required=True)
    c.add_argument("--weights-npz", required=True)
    c.add_argument("--images-root", default=None,
                   help="rebase recorded image paths (by basename) onto "
                        "this directory when checking on a different "
                        "machine than the recording")
    c.add_argument("--iou-match", type=float, default=0.9)
    c.add_argument("--conf-tol", type=float, default=0.01)
    c.add_argument("--max-det", type=int, default=36)
    c.add_argument("--used-prefix", type=int, default=18,
                   help="reference uses only the top num_obj//2 = 18 "
                        "detections (detect_for_preprocess.py:141-142)")
    for p in (r, c):
        p.add_argument("--img-size", type=int, default=640)
        p.add_argument("--conf-thres", type=float, default=0.01)
        p.add_argument("--iou-thres", type=float, default=0.45)
    args = ap.parse_args()
    return record(args) if args.mode == "record" else check(args)


if __name__ == "__main__":
    sys.exit(main())
