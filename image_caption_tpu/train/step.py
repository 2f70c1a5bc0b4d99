"""Jitted XE / focal train and eval steps, sharded over the device mesh.

Replaces the reference's eager ``train_step``/``compute_loss``
(``/root/reference/core/models.py:115-135``): one compiled XLA program per
step with donated state, batch sharded over the ``data`` mesh axis, params
laid out by the tensor-parallel rules in ``parallel.mesh`` — XLA inserts the
gradient all-reduce over ICI.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.captioner import captioner_xe_loss
from ..parallel import mesh as pmesh
from .state import TrainState, make_optimizer, zero_pad_embedding_grad


def xe_loss_fn(params, cfg: Config, batch, rng, *, deterministic: bool):
    features, positions, captions = batch
    out = captioner_xe_loss(params, cfg.model, features, positions, captions,
                            rng=rng, deterministic=deterministic)
    return out["loss"], out


def train_step(state: TrainState, batch, rng, *, cfg: Config,
               tx) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One XE/focal update (core/models.py:115-126 semantics)."""
    step_rng = jax.random.fold_in(rng, state.step)
    grad_fn = jax.value_and_grad(
        lambda p: xe_loss_fn(p, cfg, batch, step_rng,
                             deterministic=False)[0])
    loss, grads = grad_fn(state.params)
    grads = zero_pad_embedding_grad(grads, cfg.model.pad_idx)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state)
    return new_state, {"loss": loss}


def eval_step(params, batch, *, cfg: Config) -> Dict[str, jnp.ndarray]:
    """Deterministic loss (core/models.py:128-135)."""
    loss, out = xe_loss_fn(params, cfg, batch, None, deterministic=True)
    return out


# ---------------------------------------------------------------------------
# Mesh-compiled wrappers
# ---------------------------------------------------------------------------

def _state_shardings(mesh: Mesh, state: TrainState):
    param_sh = pmesh.param_shardings(mesh, state.params)
    opt_sh = jax.tree_util.tree_map(
        lambda x: (pmesh.param_shardings(mesh, x)
                   if isinstance(x, dict)
                   else NamedSharding(mesh, P())),
        state.opt_state,
        is_leaf=lambda x: isinstance(x, dict))
    return TrainState(step=NamedSharding(mesh, P()), params=param_sh,
                      opt_state=opt_sh)


def place_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Place a host-created (or checkpoint-restored) state onto the mesh
    with the SAME NamedShardings the compiled steps use.

    Without this, the first step call sees default-placed inputs while
    every later call sees the previous output's NamedShardings — two
    distinct executable cache keys, so jax compiles the whole train step
    TWICE (measured: a duplicate ~50 s compile on the second step at CPU
    smoke shapes, ~30-60 s of remote compile on the tunneled TPU)."""
    return jax.device_put(state, _state_shardings(mesh, state))


def compile_train_step(cfg: Config, mesh: Mesh, state: TrainState,
                       donate: bool = True):
    """Build the pjit-compiled train step for this mesh.

    Returns ``fn(state, (features, positions, captions), rng) ->
    (state, metrics)``.  State is donated (no HBM copy per step).
    """
    tx = make_optimizer(cfg.train.learning_rate)
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    repl = NamedSharding(mesh, P())

    fn = functools.partial(train_step, cfg=cfg, tx=tx)
    return jax.jit(
        fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, {"loss": repl}),
        donate_argnums=(0,) if donate else (),
    )


def compile_train_step_scan(cfg: Config, mesh: Mesh, state: TrainState,
                            donate: bool = True):
    """K sequential updates in ONE compiled dispatch: ``lax.scan`` of
    :func:`train_step` over a stacked batch ``[K, B, ...]``
    (``parallel.mesh.shard_batch_stacked``).

    Update-for-update equivalent to K single-step dispatches — the
    per-step dropout rng is ``fold_in(rng, state.step)`` and
    ``state.step`` increments inside the scan, so each update draws the
    same rng it would standalone (tests/test_train_step.py pins the
    equivalence).  The win is dispatch amortization: the per-step device
    time of this tiny model (~10 ms) is smaller than a dispatch round
    trip, so one program running K steps back-to-back keeps the MXU busy
    where K dispatches idle it (docs/performance.md "Train step").  K is
    static (baked into the stacked shape); metrics return stacked [K]
    per key, preserving per-iteration logging.

    Returns ``fn(state, stacked_batch, rng) -> (state, {k: [K]})``.
    """
    tx = make_optimizer(cfg.train.learning_rate)
    state_sh = _state_shardings(mesh, state)
    batch_sh = tuple(pmesh.stacked(s)
                     for s in pmesh.batch_shardings(mesh,
                                                    cfg.model.num_slots))
    repl = NamedSharding(mesh, P())

    def fn(state, stacked_batch, rng):
        def body(st, b):
            return train_step(st, b, rng, cfg=cfg, tx=tx)
        return jax.lax.scan(body, state, stacked_batch)

    return jax.jit(
        fn,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, {"loss": repl}),
        donate_argnums=(0,) if donate else (),
    )


def compile_eval_step(cfg: Config, mesh: Mesh, state: TrainState):
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    repl = NamedSharding(mesh, P())
    fn = functools.partial(eval_step, cfg=cfg)
    return jax.jit(fn, in_shardings=(state_sh.params, batch_sh),
                   out_shardings={"loss": repl})
