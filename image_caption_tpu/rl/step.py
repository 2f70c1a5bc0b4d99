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


def backend_supports_callbacks() -> bool:
    """Probe whether the active backend implements host callbacks —
    axon_pjrt (the tunneled TPU runtime) does not."""
    try:
        out = jax.jit(lambda x: jax.pure_callback(
            lambda y: y, jax.ShapeDtypeStruct((), jnp.float32), x))(
                jnp.float32(1.0))
        return float(out) == 1.0
    except Exception:
        return False


def rl_train_step(state: TrainState, batch, rng, *, cfg: Config, tx,
                  reward_callback=None, rewards=None, self_cider=None,
                  sample_seq=None
                  ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    step_rng = jax.random.fold_in(rng, state.step)

    def loss_fn(p):
        return rl_composite_loss(p, cfg, batch, reward_callback,
                                 rewards=rewards, self_cider=self_cider,
                                 sample_seq=sample_seq,
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
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
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
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}
    fn = functools.partial(rl_eval_step, cfg=cfg,
                           reward_callback=reward_callback)
    return jax.jit(fn, in_shardings=(state_sh.params, batch_sh),
                   out_shardings=metric_sh)


# ---------------------------------------------------------------------------
# Two-phase mode (runtimes without host callbacks, e.g. axon_pjrt)
# ---------------------------------------------------------------------------

def compile_rl_sample_step(cfg: Config, mesh: Mesh, state: TrainState):
    """Phase 1: jitted sampled-sequence computation.  ``fn(params, batch,
    rng, step) -> sample_seq [B, N, T-1] int32``.  ``step`` selects the
    per-step rng fold — the device step counter; the pipelined schedule
    calls this only to prime its pipe (its steady state samples inside
    the fused dispatch, :func:`compile_rl_fused_update_sample`)."""
    from ..rl.loss import rl_sample_sequence
    from ..train.step import _state_shardings
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    repl = NamedSharding(mesh, P())

    def fn(params, batch, rng, step):
        step_rng = jax.random.fold_in(rng, step)
        return rl_sample_sequence(params, cfg, batch, rng=step_rng,
                                  deterministic=False)

    return jax.jit(fn, in_shardings=(state_sh.params, batch_sh, repl, repl),
                   out_shardings=pmesh.data_sharding(mesh))


def compile_rl_train_step_two_phase(cfg: Config, mesh: Mesh,
                                    state: TrainState, donate: bool = True):
    """Phase 2: jitted update taking the sampled sequences and their
    host-computed rewards as inputs.
    ``fn(state, batch, sample_seq, rewards, self_cider, rng) ->
    (state, metrics)``.

    ``sample_seq`` is the phase-1 output passed back in: the update
    differentiates the CURRENT params' logprobs gathered at exactly the
    sequences the rewards were scored on.  This makes the update correct
    under the pipelined schedule (rl.pipeline_depth > 0, where the sample
    ran one update earlier) and bit-identical to the re-derivation under
    the serial schedule (same params + rng => same sample)."""
    from ..train.step import _state_shardings
    tx = make_optimizer(cfg.train.learning_rate)
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    data_sh = pmesh.data_sharding(mesh)
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}

    def fn(state, batch, sample_seq, rewards, self_cider, rng):
        return rl_train_step(state, batch, rng, cfg=cfg, tx=tx,
                             rewards=rewards, self_cider=self_cider,
                             sample_seq=sample_seq)

    return jax.jit(fn,
                   in_shardings=(state_sh, batch_sh, data_sh, data_sh,
                                 data_sh, repl),
                   out_shardings=(state_sh, metric_sh),
                   donate_argnums=(0,) if donate else ())


def compile_rl_fused_update_sample(cfg: Config, mesh: Mesh,
                                   state: TrainState):
    """Pipelined schedule's single-dispatch step: apply the PENDING update
    (sequences + host-scored rewards from the previous batch) and sample
    the NEXT batch from the post-update params, in ONE compiled program.

    ``fn(state, upd_batch, upd_seq, rewards, self_cider, next_batch, rng)
    -> (state, metrics, next_seq)``.

    Because the sample reads the params the update just produced, the
    schedule is TRAJECTORY-IDENTICAL to the reference's serial
    sample->score->update (core/models.py:184-195): sample k sees exactly
    the post-update-(k-1) params and folds the rng at the same step
    counter the serial path folds at (tests/test_rl_two_phase.py pins the
    equality).  What pipelining buys is host/device overlap WITHOUT a
    staleness trade: while this program runs, the host is free to fetch
    and score the sequences it returns; one dispatch per step instead of
    two also halves the per-step dispatch cost on high-RTT runtimes
    (docs/performance.md RL attribution)."""
    from ..rl.loss import rl_sample_sequence
    from ..train.step import _state_shardings
    tx = make_optimizer(cfg.train.learning_rate)
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    data_sh = pmesh.data_sharding(mesh)
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}

    def fn(state, upd_batch, upd_seq, rewards, self_cider, next_batch, rng):
        state, metrics = rl_train_step(state, upd_batch, rng, cfg=cfg,
                                       tx=tx, rewards=rewards,
                                       self_cider=self_cider,
                                       sample_seq=upd_seq)
        # identical rng derivation to compile_rl_sample_step at the
        # post-update step counter — the serial schedule's fold
        step_rng = jax.random.fold_in(rng, state.step)
        next_seq = rl_sample_sequence(state.params, cfg, next_batch,
                                      rng=step_rng, deterministic=False)
        return state, metrics, next_seq

    return jax.jit(fn,
                   in_shardings=(state_sh, batch_sh, data_sh, data_sh,
                                 data_sh, batch_sh, repl),
                   out_shardings=(state_sh, metric_sh,
                                  pmesh.data_sharding(mesh)),
                   donate_argnums=(0,))


def compile_rl_eval_step_two_phase(cfg: Config, mesh: Mesh,
                                   state: TrainState):
    from ..train.step import _state_shardings
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)
    data_sh = pmesh.data_sharding(mesh)
    repl = NamedSharding(mesh, P())
    metric_sh = {k: repl for k in ("loss", "language_model_loss",
                                   "structure_loss", "reward")}

    def fn(params, batch, sample_seq, rewards, self_cider):
        _, metrics = rl_composite_loss(params, cfg, batch, rewards=rewards,
                                       self_cider=self_cider,
                                       sample_seq=sample_seq, rng=None,
                                       deterministic=True)
        return metrics

    return jax.jit(fn,
                   in_shardings=(state_sh.params, batch_sh, data_sh,
                                 data_sh, data_sh),
                   out_shardings=metric_sh)


def compile_rl_sample_step_eval(cfg: Config, mesh: Mesh, state: TrainState):
    """Deterministic phase-1 sampler for eval (no dropout)."""
    from ..rl.loss import rl_sample_sequence
    from ..train.step import _state_shardings
    state_sh = _state_shardings(mesh, state)
    batch_sh = pmesh.batch_shardings(mesh, cfg.model.num_slots)

    def fn(params, batch):
        return rl_sample_sequence(params, cfg, batch, rng=None,
                                  deterministic=True)

    return jax.jit(fn, in_shardings=(state_sh.params, batch_sh),
                   out_shardings=pmesh.data_sharding(mesh))
