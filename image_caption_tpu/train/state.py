"""Training state: params + optax Adam, as a donated pytree.

The reference holds torch modules with an Adam(lr=5e-4) over
``requires_grad`` params (``/root/reference/core/models.py:111-113``) and
never checkpoints optimizer state (core/models.py:62-63).  Here state is a
single pytree (params, opt_state, step) that the jitted train step consumes
and donates, and orbax checkpoints in full (params + optimizer + step).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.captioner import init_captioner


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    opt_state: Any


def make_optimizer(learning_rate: float = 5e-4) -> optax.GradientTransformation:
    """torch.optim.Adam defaults: betas=(0.9, 0.999), eps=1e-8
    (core/models.py:111-113)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(cfg: Config, rng: jax.Array) -> TrainState:
    params = init_captioner(rng, cfg.model)
    tx = make_optimizer(cfg.train.learning_rate)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state)


def zero_pad_embedding_grad(grads: Any, pad_idx: int) -> Any:
    """torch freezes the padding_idx embedding row (no gradient,
    model.py:389-391); replicate by zeroing that row of the grad."""
    table = grads["decoder"]["word_embedding"]["table"]
    table = table.at[pad_idx].set(0.0)
    grads = dict(grads)
    decoder = dict(grads["decoder"])
    we = dict(decoder["word_embedding"])
    we["table"] = table
    decoder["word_embedding"] = we
    grads["decoder"] = decoder
    return grads
