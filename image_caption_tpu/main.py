"""CLI: ``python -m image_caption_tpu.main
{train,evaluation,demo,caption,features}``.

The reference dispatches the same three verbs through google-fire with a
module-level model built at import (``/root/reference/main.py:19-22,250-251``)
and experiments selected by editing ``core/config.py``.  Here the preset and
every config field are CLI flags; nothing is constructed at import time.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import List, Optional

from .config import Config, get_preset, list_presets


def _parse_overrides(pairs: List[str]) -> dict:
    out = {}
    for pair in pairs:
        key, _, value = pair.partition("=")
        if not _:
            raise SystemExit(f"bad override {pair!r}; expected key=value")
        for cast in (int, float):
            try:
                value = cast(value)
                break
            except ValueError:
                continue
        else:
            if value in ("true", "True"):
                value = True
            elif value in ("false", "False"):
                value = False
        out[key] = value
    return out


def _load_config(args) -> Config:
    cfg = get_preset(args.preset)
    over = _parse_overrides(args.set or [])
    if args.data_path:
        over["data.data_path"] = args.data_path
    if args.output_path:
        over["data.output_path"] = args.output_path
    return cfg.with_overrides(**over)


def cmd_train(args) -> None:
    from .train.loop import train
    cfg = _load_config(args)
    if args.debug_nans:
        from .utils.debug import enable_nan_debugging
        enable_nan_debugging(True)
    if args.profile:
        import jax
        from .utils.debug import trace
        with trace(os.path.join(cfg.data.output_path, "profile")):
            train(cfg, num_epochs=args.epochs, resume=not args.no_resume)
        return
    train(cfg, num_epochs=args.epochs, resume=not args.no_resume)


def cmd_evaluation(args) -> None:
    """main.py:156-190 equivalent: load ckpt, decode split, score."""
    import jax
    from .data.dataset import load_split
    from .data.vocab import invert_vocab
    from .metrics.evaluate import score_captions
    from .parallel import mesh as pmesh
    from .train.checkpoint import CheckpointManager
    from .train.logging import write_scores
    from .train.loop import decode_split
    from .train.state import create_train_state
    from .utils.io import load_pickle, save_pickle

    cfg = _load_config(args)
    d = cfg.data
    split = load_split(d.data_path, args.split, load_references=True,
                       streaming=d.stream_features)
    wpath = d.word_to_idx_path
    word_to_idx = split.word_to_idx or load_pickle(wpath)
    idx_to_word = invert_vocab(word_to_idx)

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(d.output_path, "model"))
    epoch = args.epoch if args.epoch is not None else ckpt.latest_epoch()
    if epoch is None:                  # raise, not assert: must survive -O
        raise SystemExit(f"no checkpoint found under {d.output_path}/model")
    state = ckpt.restore(epoch, template)

    mesh = pmesh.make_mesh(data=cfg.train.data_axis,
                           model=cfg.train.model_axis)
    if jax.process_count() > 1:
        # orbax returns default-placed (host-local) arrays; the pod-
        # sharded decode needs params on the global mesh
        from .train.step import place_state
        state = place_state(mesh, state)
    candidates = decode_split(state.params, cfg, split,
                              cfg.train.batch_size, idx_to_word,
                              beam_size=args.beam_size, mesh=mesh)
    if jax.process_index() == 0:
        save_pickle(candidates, os.path.join(
            d.output_path, "candidates",
            f"{args.split}.candidate.captions.pkl"))

    if split.references is not None and jax.process_index() == 0:
        hypo = {i: [c] for i, c in enumerate(candidates)}
        scores = score_captions(split.references, hypo)
        write_scores(d.output_path, args.split, epoch, scores)
        for name, value in scores.items():
            print(f"{name}:\t{value}")


def cmd_demo(args) -> None:
    """main.py:193-247 equivalent: single image -> caption (+ attention
    overlays with --save-img)."""
    import jax
    import numpy as np
    from .data.vocab import decode_captions, invert_vocab
    from .models.decoding import beam_score_mode, beam_search, greedy_decode
    from .train.checkpoint import CheckpointManager
    from .train.state import create_train_state
    from .utils.io import load_pickle
    from .vision.pipeline import extract_single_image

    cfg = _load_config(args)
    d = cfg.data
    t0 = time.time()

    feats, poss, boxes = extract_single_image(
        args.image_path, image_model=d.image_model,
        num_objects=cfg.model.num_objects, max_obj=args.max_obj,
        weights_dir=args.weights_dir)

    word_to_idx = load_pickle(d.word_to_idx_path)
    idx_to_word = invert_vocab(word_to_idx)

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(d.output_path, "model"))
    epoch = args.epoch if args.epoch is not None else ckpt.latest_epoch()
    if epoch is None:                  # raise, not assert: must survive -O
        raise SystemExit(f"no checkpoint found under {d.output_path}/model")
    state = ckpt.restore(epoch, template)

    feats_b = feats[None].astype(np.float32)
    poss_b = poss[None].astype(np.float32)
    if args.beam_size and args.beam_size > 1:
        tokens = beam_search(state.params, cfg.model, feats_b, poss_b,
                             beam_size=args.beam_size,
                             score_mode=beam_score_mode(cfg.caption_model))
        attention = None
    else:
        tokens, attention = greedy_decode(state.params, cfg.model,
                                          feats_b, poss_b,
                                          return_attention=True)
    caption = decode_captions(np.asarray(tokens), idx_to_word)[0]

    if args.save_img:
        from .vision.overlay import (save_attention_overlays,
                                     save_detection_overlay)
        out_dir = os.path.join(
            "./demo", os.path.splitext(os.path.basename(args.image_path))[0],
            d.image_model)
        # detection boxes + labels txt (detect_for_preprocess.py:80-161 /
        # preprocess.py:172-206 save paths)
        # positions rows 1.. carry the class-score one-hot per detection
        cls = np.argmax(poss[1:, 4:], axis=-1)
        scr = np.max(poss[1:, 4:], axis=-1)
        valid = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]) > 0
        save_detection_overlay(args.image_path, boxes[valid], scr[valid],
                               cls[valid], out_dir)
        if attention is not None:
            save_attention_overlays(args.image_path,
                                    np.asarray(attention)[:, 0],
                                    boxes, caption, out_dir)

    print(caption)
    print(f"time: {time.time() - t0:.2f}s")


def cmd_caption(args) -> None:
    """Batch captioning (serving path): a directory (or explicit list) of
    images -> one caption per image, streamed through the pipelined
    load->extract->decode program (serve.py).  The reference's closest
    equivalent is running ``demo`` per image, which reloads both backbone
    checkpoints every call (main.py:193-247, core/preprocess.py:95)."""
    import sys

    import jax
    from .data.vocab import invert_vocab
    from .parallel import mesh as pmesh
    from .serve import caption_images, caption_images_to_jsonl, list_images
    from .train.checkpoint import CheckpointManager
    from .train.state import create_train_state
    from .utils.io import load_pickle

    cfg = _load_config(args)
    d = cfg.data
    paths = list(args.images or [])
    if args.image_dir:
        paths.extend(list_images(args.image_dir))
    if not paths:
        raise SystemExit("no images: pass --image-dir and/or --images")

    word_to_idx = load_pickle(d.word_to_idx_path)
    idx_to_word = invert_vocab(word_to_idx)

    template = create_train_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(os.path.join(d.output_path, "model"))
    epoch = args.epoch if args.epoch is not None else ckpt.latest_epoch()
    if epoch is None:                  # raise, not assert: must survive -O
        raise SystemExit(f"no checkpoint found under {d.output_path}/model")
    state = ckpt.restore(epoch, template)

    # open the sink BEFORE hours of captioning, and stream per batch —
    # an unwritable --out must fail fast, not discard the whole run
    out = open(args.out, "w") if args.out else sys.stdout

    def write_batch(start: int, batch_caps) -> None:
        batch_paths = paths[start:start + len(batch_caps)]
        for line in caption_images_to_jsonl(batch_paths, batch_caps):
            print(line, file=out, flush=bool(args.out))

    t0 = time.time()
    try:
        caption_images(
            cfg, paths, state.params, idx_to_word,
            weights_dir=args.weights_dir, beam_size=args.beam_size,
            batch_size=args.batch_size,
            max_obj=args.max_obj if args.max_obj is not None else d.max_obj,
            feature_mode=d.feature_mode, skip_errors=args.skip_errors,
            mesh=pmesh.make_mesh(data=cfg.train.data_axis,
                                 model=cfg.train.model_axis),
            on_batch=write_batch,
            progress=(lambda done, n: print(f"[caption] {done}/{n}",
                                            file=sys.stderr))
            if args.verbose else None)
    finally:
        if out is not sys.stdout:
            out.close()
    print(f"[caption] {len(paths)} images in {time.time() - t0:.2f}s",
          file=sys.stderr)


def cmd_features(args) -> None:
    """features.py equivalent: offline COCO ETL -> reference-format shards."""
    from .vision.etl import run_etl
    cfg = _load_config(args)
    run_etl(cfg, coco_root=args.coco_root, splits=args.splits,
            batch_size=args.batch_size, weights_dir=args.weights_dir)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="image_caption_tpu")
    p.add_argument("--preset",
                   default="RL_maxlen49_36obj_1wordCount_256_25b_32h_"
                           "split_img_obj",
                   help=f"one of: {', '.join(list_presets())}")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="config override, e.g. --set train.batch_size=64")
    p.add_argument("--data-path", default=None)
    p.add_argument("--output-path", default=None)
    # multi-host (pod) wiring — must be handled before any jax backend use
    p.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize before anything "
                        "touches the backend (TPU pods auto-detect the "
                        "coordinator; set the flags below elsewhere)")
    p.add_argument("--coordinator", default=None,
                   metavar="HOST:PORT", help="coordinator address")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train")
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--no-resume", action="store_true")
    t.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of the run")
    t.add_argument("--debug-nans", action="store_true",
                   help="raise on NaN inside jitted code (slow)")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("evaluation")
    e.add_argument("--split", default="test")
    e.add_argument("--epoch", type=int, default=None)
    e.add_argument("--beam-size", type=int, default=None)
    e.set_defaults(fn=cmd_evaluation)

    dm = sub.add_parser("demo")
    dm.add_argument("--image-path", required=True)
    dm.add_argument("--epoch", type=int, default=None)
    dm.add_argument("--beam-size", type=int, default=None)
    dm.add_argument("--save-img", action="store_true")
    dm.add_argument("--max-obj", type=int, default=None)
    dm.add_argument("--weights-dir", default="./weights")
    dm.set_defaults(fn=cmd_demo)

    c = sub.add_parser("caption")
    c.add_argument("--image-dir", default=None,
                   help="caption every image in this directory (sorted)")
    c.add_argument("--images", nargs="+", default=None,
                   help="explicit image paths (before --image-dir's)")
    c.add_argument("--epoch", type=int, default=None)
    c.add_argument("--beam-size", type=int, default=None)
    c.add_argument("--batch-size", type=int, default=32)
    c.add_argument("--max-obj", type=int, default=None,
                   help="defaults to data.max_obj so serving extracts the "
                        "same feature layout the training ETL wrote")
    c.add_argument("--weights-dir", default="./weights")
    c.add_argument("--out", default=None,
                   help="write JSONL here instead of stdout")
    c.add_argument("--skip-errors", action="store_true",
                   help="unreadable images emit an error record instead "
                        "of failing the run")
    c.add_argument("--verbose", action="store_true")
    c.set_defaults(fn=cmd_caption)

    f = sub.add_parser("features")
    f.add_argument("--coco-root", required=True)
    f.add_argument("--splits", nargs="+",
                   default=["train", "valid", "test"])
    f.add_argument("--batch-size", type=int, default=64)
    f.add_argument("--weights-dir", default="./weights")
    f.set_defaults(fn=cmd_features)
    return p


def _enable_compile_cache() -> None:
    """Persist compiled XLA programs across CLI invocations.

    Every ``demo``/``caption`` process re-jits the vision graphs
    (YOLOv5x + ResNet-101 — minutes of remote compile on the tunneled
    TPU; the reference instead re-loads torch checkpoints per call,
    core/preprocess.py:95).  The JAX persistent compilation cache makes
    repeat invocations skip the compile entirely (measured 87 s -> 31 s
    for a first toy program cross-process; the vision graphs save
    minutes).  ``ICX_COMPILE_CACHE`` overrides the location; set it
    empty to disable."""
    path = os.environ.get(
        "ICX_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "image_caption_tpu", "xla"))
    if not path:
        return
    import jax
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv: Optional[List[str]] = None) -> None:
    args = build_parser().parse_args(argv)
    if args.distributed:
        # BEFORE any jax.devices()/process_count() — a bare backend query
        # locks in single-process and the coordinator can never connect
        from .parallel.distributed import initialize
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)
    _enable_compile_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
