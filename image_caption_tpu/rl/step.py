"""Jitted self-critical train/eval steps (SelfCriticNetwork equivalent).

The reference's RL ``train_step`` moves logits to CPU for the whole loss
(``/root/reference/core/models.py:184-195``); here the step is one compiled
XLA program — only the [B] reward vector crosses the host boundary through
``jax.pure_callback``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..parallel import mesh as pmesh
from ..train.state import TrainState, make_optimizer, zero_pad_embedding_grad
from .loss import rl_composite_loss


def rl_train_step(state: TrainState, batch, rng, *, cfg: Config, tx,
                  reward_callback
                  ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(p):
        return rl_composite_loss(p, cfg, batch, reward_callback,
                                 rng=step_rng, deterministic=False)

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    grads = zero_pad_embedding_grad(grads, cfg.model.pad_idx)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    return TrainState(step=state.step + 1, params=params,
                      opt_state=opt_state), metrics


def rl_eval_step(params, batch, *, cfg: Config,
                 reward_callback) -> Dict[str, jnp.ndarray]:
    _, metrics = rl_composite_loss(params, cfg, batch, reward_callback,
                                   rng=None, deterministic=True)
    return metrics


def compile_rl_train_step(cfg: Config, mesh: Mesh, state: TrainState,
                          reward_callback, donate: bool = True):
    from ..train.step import _state_shardings
    tx = make_optimizer(cfg.train.learning_rate)
    state_sh = _state_shardings(mesh, state)
    batch_sh = (pmesh.data_sharding(mesh),) * 3
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}
    fn = functools.partial(rl_train_step, cfg=cfg, tx=tx,
                           reward_callback=reward_callback)
    return jax.jit(fn, in_shardings=(state_sh, batch_sh, repl),
                   out_shardings=(state_sh, metric_sh),
                   donate_argnums=(0,) if donate else ())


def compile_rl_eval_step(cfg: Config, mesh: Mesh, state: TrainState,
                         reward_callback):
    from ..train.step import _state_shardings
    state_sh = _state_shardings(mesh, state)
    batch_sh = (pmesh.data_sharding(mesh),) * 3
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}
    fn = functools.partial(rl_eval_step, cfg=cfg,
                           reward_callback=reward_callback)
    return jax.jit(fn, in_shardings=(state_sh.params, batch_sh),
                   out_shardings=metric_sh)
