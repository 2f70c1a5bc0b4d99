"""Plumbing smoke for scripts/yolo_realweight_check.py's ``check`` side
(VERDICT r2 missing #1 — the record side needs ultralytics + real
weights, absent here).

Self-consistency: run OUR detector on a synthetic JPEG, write its boxes
as the "recorded reference", then run the script's check — every box
must match itself (IoU 1, conf delta 0), exit 0.  This proves the
script's letterbox/detect/unletterbox/matching plumbing so that
recording day is a pure fidelity question."""

import importlib.util
import os
import sys

import numpy as np
import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "yolo_realweight_check.py")


def _load_script():
    spec = importlib.util.spec_from_file_location("yolo_realweight_check",
                                                  SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_check_side_self_consistency(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    import jax
    import jax.numpy as jnp
    from PIL import Image

    import image_caption_tpu.vision.yolov5 as Y
    from image_caption_tpu.vision.loader import load_letterboxed
    from image_caption_tpu.vision.ops import unletterbox_boxes

    # small depth/width so the CPU detect stays fast
    params = Y.init_yolov5(jax.random.PRNGKey(0), depth_multiple=0.33,
                           width_multiple=0.25)

    rng = np.random.RandomState(0)
    path = str(tmp_path / "img_0.jpg")
    Image.fromarray(rng.randint(0, 255, (240, 320, 3), np.uint8)).save(
        path, quality=95)

    # "record" with our own stack (what record() does with ultralytics)
    canvas, meta, hw = load_letterboxed(path, 320, rect=True)
    det = Y.yolov5_detect(params,
                          jnp.asarray(canvas[None], jnp.float32) / 255.0,
                          conf_thres=0.01, iou_thres=0.45, max_det=36,
                          rect_hw=jnp.asarray(meta[None, 3:5]))
    valid = np.asarray(det.valid[0])
    boxes = np.asarray(unletterbox_boxes(det.boxes[0], jnp.asarray(meta),
                                         float(hw[0]), float(hw[1])))
    ref = np.concatenate(
        [boxes, np.asarray(det.scores[0])[:, None],
         np.asarray(det.classes[0])[:, None].astype(np.float32)],
        axis=1)[valid]
    assert len(ref) > 0, "random-init detector at conf 0.01 must fire"
    rec_path = str(tmp_path / "rec.npz")
    np.savez(rec_path, paths=np.asarray([path]), det_0=ref)

    mod = _load_script()
    monkeypatch.setattr(Y, "load_checkpoint", lambda p: params)
    monkeypatch.setattr(sys, "argv", [
        "yolo_realweight_check.py", "check", "--recorded", rec_path,
        "--weights-npz", "unused.npz", "--img-size", "320"])
    assert mod.main() == 0

    # record_args embedded + foreign paths rebased via --images-root:
    # geometry comes from the npz (no --img-size needed) and the recorded
    # absolute path from "another machine" is resolved by basename
    rec2 = str(tmp_path / "rec2.npz")
    np.savez(rec2, paths=np.asarray(["/foreign/host/img_0.jpg"]),
             det_0=ref, record_args=np.asarray([320, 0.01, 0.45]))
    monkeypatch.setattr(sys, "argv", [
        "yolo_realweight_check.py", "check", "--recorded", rec2,
        "--weights-npz", "unused.npz", "--images-root", str(tmp_path)])
    assert mod.main() == 0


def test_match_ref_boxes_class_aware():
    """The adversarial cases a global IoU-argmax gets wrong: co-located
    boxes of different classes (per-class ultralytics NMS keeps both) and
    an argmax partner already claimed by an earlier reference box."""
    mod = _load_script()
    b = [10.0, 10.0, 50.0, 50.0]

    # identical boxes, classes swapped between ref and ours: exact match
    ref = np.asarray([b + [0.9, 3], b + [0.8, 5]], np.float32)
    ours = np.asarray([b + [0.8, 5], b + [0.9, 3]], np.float32)
    assert mod.match_ref_boxes(ref, ours, 0.9, 0.01) == []

    # two same-class refs, our argmax for both is index 0; the second ref
    # must fall through to the unclaimed equally-good index 1
    ref = np.asarray([b + [0.9, 3], b + [0.9, 3]], np.float32)
    ours = np.asarray([b + [0.9, 3], b + [0.9, 3]], np.float32)
    assert mod.match_ref_boxes(ref, ours, 0.9, 0.01) == []

    # a genuine miss still reports: class present nowhere in ours
    ref = np.asarray([b + [0.9, 7]], np.float32)
    ours = np.asarray([b + [0.9, 3]], np.float32)
    un = mod.match_ref_boxes(ref, ours, 0.9, 0.01)
    assert len(un) == 1 and un[0][1] > 0.99  # best-iou reported anyway
