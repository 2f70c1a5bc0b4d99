"""Reference-checkpoint import/export for the captioner.

Users of the reference save ``torch.save(model.state_dict())`` per epoch
(``/root/reference/core/models.py:62-63``).  This module maps that layout
(names per ``core/TRANSFORMER/model.py:44-68,228-412`` and
``modules.py:42-59,100-106`` — note the reference's ``classifer`` spelling)
onto our param pytree and back, so reference-trained weights run on TPU and
golden-parity tests can compare logits.

Conventions: torch Linear stores ``[out, in]`` — transposed into our
``[in, out]`` kernels; LayerNorm weight/bias -> scale/bias; the decoder's
sinusoid buffer is recomputed, not imported.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import ModelConfig

Params = Dict[str, Any]


def _np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _lin(sd, name, transpose=True):
    w = _np(sd[f"{name}.weight"]).astype(np.float32)
    # ascontiguousarray: a strided transpose view changes the BLAS
    # accumulation order (ULP-level drift vs natively-laid-out kernels)
    p = {"kernel": np.ascontiguousarray(w.T) if transpose else w}
    if f"{name}.bias" in sd:
        p["bias"] = _np(sd[f"{name}.bias"]).astype(np.float32)
    return p


def _norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]).astype(np.float32),
            "bias": _np(sd[f"{name}.bias"]).astype(np.float32)}


def _mha(sd, pre):
    return {
        "q": _lin(sd, f"{pre}.q_linear"),
        "k": _lin(sd, f"{pre}.k_linear"),
        "v": _lin(sd, f"{pre}.v_linear"),
        "joint": _lin(sd, f"{pre}.joint_linear"),
        "norm": _norm(sd, f"{pre}.layer_norm"),
    }


def _ffn(sd, pre):
    return {
        "w1": _lin(sd, f"{pre}.position_wise_1"),
        "w2": _lin(sd, f"{pre}.position_wise_2"),
        "norm": _norm(sd, f"{pre}.layer_norm"),
    }


def _encoder_block(sd, pre):
    return {"mha": _mha(sd, f"{pre}.multihead_attention"),
            "ffn": _ffn(sd, f"{pre}.feed_forward")}


def _decoder_block(sd, pre):
    return {"self_attn": _mha(sd, f"{pre}.self_attention"),
            "cross_attn": _mha(sd, f"{pre}.encode_attention"),
            "ffn": _ffn(sd, f"{pre}.feed_forward")}


def import_reference_state_dict(sd: Dict[str, Any],
                                cfg: ModelConfig) -> Params:
    """Reference ``Transformer``/``PolicyNetwork`` state_dict -> params."""
    sd = {k: _np(v) for k, v in sd.items()}

    enc: Params = {
        "feature_embedding": _lin(sd, "encoder.feature_embedding"),
        "position_embedding": _lin(sd, "encoder.position_embedding"),
        "norm": _norm(sd, "encoder.norm"),
        "blocks": [],
    }
    if cfg.split_position:
        enc["object_embedding"] = _lin(sd, "encoder.object_embedding")
    if cfg.split_image_objects:
        enc["image_encoder"] = _encoder_block(sd, "encoder.image_encoder")
    i = 0
    while f"encoder.encoder.{i}.multihead_attention.q_linear.weight" in sd:
        enc["blocks"].append(_encoder_block(sd, f"encoder.encoder.{i}"))
        i += 1

    dec: Params = {
        "word_embedding": {
            "table": _np(sd["decoder.word_embedding.weight"]).astype(
                np.float32)},
        "word_embedding_linear": _lin(sd, "decoder.word_embedding_linear"),
        "norm": _norm(sd, "decoder.norm"),
        "blocks": [],
    }
    i = 0
    while f"decoder.decoder.{i}.self_attention.q_linear.weight" in sd:
        dec["blocks"].append(_decoder_block(sd, f"decoder.decoder.{i}"))
        i += 1
    if cfg.move_first_image_feature:
        dec["move_ffn"] = {
            "w1": _lin(sd, "decoder.position_wise_1"),
            "w2": _lin(sd, "decoder.position_wise_2"),
            "norm": _norm(sd, "decoder.layer_norm"),
        }

    return {
        "encoder": enc,
        "decoder": dec,
        # the reference's (sic) 'classifer' Linear(d, vocab)
        "classifier": {
            "kernel": np.ascontiguousarray(
                _np(sd["classifer.weight"]).astype(np.float32).T),
            "bias": _np(sd["classifer.bias"]).astype(np.float32),
        },
    }


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> Params:
    """Load a reference ``model_{epoch}.pt`` torch checkpoint."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_reference_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# Export (roundtrip tests; migration path back to torch)
# ---------------------------------------------------------------------------

def _exp_lin(out, name, p, transpose=True):
    k = np.asarray(p["kernel"])
    out[f"{name}.weight"] = k.T if transpose else k
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _exp_norm(out, name, p):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def _exp_mha(out, pre, p):
    _exp_lin(out, f"{pre}.q_linear", p["q"])
    _exp_lin(out, f"{pre}.k_linear", p["k"])
    _exp_lin(out, f"{pre}.v_linear", p["v"])
    _exp_lin(out, f"{pre}.joint_linear", p["joint"])
    _exp_norm(out, f"{pre}.layer_norm", p["norm"])


def _exp_ffn(out, pre, p):
    _exp_lin(out, f"{pre}.position_wise_1", p["w1"])
    _exp_lin(out, f"{pre}.position_wise_2", p["w2"])
    _exp_norm(out, f"{pre}.layer_norm", p["norm"])


def export_reference_state_dict(params: Params,
                                cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Our params -> a reference-layout state_dict of numpy arrays."""
    out: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    _exp_lin(out, "encoder.feature_embedding", enc["feature_embedding"])
    _exp_lin(out, "encoder.position_embedding", enc["position_embedding"])
    if cfg.split_position:
        _exp_lin(out, "encoder.object_embedding", enc["object_embedding"])
    _exp_norm(out, "encoder.norm", enc["norm"])
    if cfg.split_image_objects:
        blk = enc["image_encoder"]
        _exp_mha(out, "encoder.image_encoder.multihead_attention",
                 blk["mha"])
        _exp_ffn(out, "encoder.image_encoder.feed_forward", blk["ffn"])
    for i, blk in enumerate(enc["blocks"]):
        _exp_mha(out, f"encoder.encoder.{i}.multihead_attention",
                 blk["mha"])
        _exp_ffn(out, f"encoder.encoder.{i}.feed_forward", blk["ffn"])

    dec = params["decoder"]
    out["decoder.word_embedding.weight"] = np.asarray(
        dec["word_embedding"]["table"])
    _exp_lin(out, "decoder.word_embedding_linear",
             dec["word_embedding_linear"])
    _exp_norm(out, "decoder.norm", dec["norm"])
    for i, blk in enumerate(dec["blocks"]):
        _exp_mha(out, f"decoder.decoder.{i}.self_attention",
                 blk["self_attn"])
        _exp_mha(out, f"decoder.decoder.{i}.encode_attention",
                 blk["cross_attn"])
        _exp_ffn(out, f"decoder.decoder.{i}.feed_forward", blk["ffn"])
    if cfg.move_first_image_feature:
        m = dec["move_ffn"]
        _exp_lin(out, "decoder.position_wise_1", m["w1"])
        _exp_lin(out, "decoder.position_wise_2", m["w2"])
        _exp_norm(out, "decoder.layer_norm", m["norm"])

    out["classifer.weight"] = np.asarray(params["classifier"]["kernel"]).T
    out["classifer.bias"] = np.asarray(params["classifier"]["bias"])
    return out
