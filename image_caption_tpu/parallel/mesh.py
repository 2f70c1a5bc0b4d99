"""Device mesh construction and sharding rules.

The reference's only multi-device story is manual model placement on two
CUDA devices (``/root/reference/core/config.py:32-48``) with no collective
communication of any kind (SURVEY.md §2.11).  Here parallelism is first-class
and TPU-native: a named ``jax.sharding.Mesh`` with axes

  * ``data``     — batch sharding (DP); gradients all-reduce over ICI,
  * ``model``    — tensor-parallel axis, plumbed through every matmul-heavy
                   param so larger presets (d_model 1024+) can shard; size 1
                   for the flagship preset (the model is ~10 MB),
  * ``sequence`` — reserved-but-plumbed axis for long-context variants
                   (SURVEY.md §5 "long-context"); size 1 everywhere today.

All sharding is expressed as ``PartitionSpec`` trees consumed by ``jax.jit``
(in_shardings/out_shardings) — XLA inserts the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQUENCE_AXIS = "sequence"
MESH_AXES = (DATA_AXIS, MODEL_AXIS, SEQUENCE_AXIS)


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: int = -1, model: int = 1, sequence: int = 1) -> Mesh:
    """Build a (data, model, sequence) mesh over ``devices``.

    ``data=-1`` means "all remaining devices".  Axis sizes must multiply to
    the device count.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * sequence) == 0, (n, model, sequence)
        data = n // (model * sequence)
    assert data * model * sequence == n, (
        f"mesh {data}x{model}x{sequence} != {n} devices")
    arr = np.asarray(devices).reshape(data, model, sequence)
    return Mesh(arr, MESH_AXES)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input arrays: [B, ...] split over `data`."""
    return NamedSharding(mesh, P(DATA_AXIS))


def activation_sharding(mesh: Mesh,
                        seq_dim_size: Optional[int] = None) -> NamedSharding:
    """Sharding for [B, S, ...] activations: batch over ``data`` and the
    slot/token dim over ``sequence`` — sequence parallelism engages only
    when the mesh has a sequence axis > 1 AND the dim divides evenly
    (GSPMD rejects uneven explicit input shardings); otherwise identical
    to :func:`data_sharding`.  XLA inserts the all-gathers where attention
    needs the full sequence."""
    nseq = mesh.shape[SEQUENCE_AXIS]
    if nseq > 1 and seq_dim_size is not None and seq_dim_size % nseq == 0:
        return NamedSharding(mesh, P(DATA_AXIS, SEQUENCE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, num_slots: Optional[int] = None):
    """Input shardings for a (features, positions, captions) batch.

    Features/positions shard their slot dim over ``sequence`` (when it
    divides); captions stay batch-sharded — the decoder immediately splits
    them into shifted input/target views, so a token-dim sharding would
    just force a reshard."""
    act = activation_sharding(mesh, num_slots)
    return (act, act, data_sharding(mesh))


def stacked(sh: NamedSharding) -> NamedSharding:
    """The sharding of ``sh`` with a new leading (unsharded) dim — for
    [K, B, ...] stacks of K per-step batches consumed by a scanned
    multi-step program (train/step.py:compile_train_step_scan)."""
    return NamedSharding(sh.mesh, P(None, *sh.spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# one (source params, mesh) -> replicated-copy entry per pytree; strong
# refs to BOTH key objects keep their id()s from being recycled while
# cached (a GC'd mesh whose address is reused must not produce a stale
# hit placed on the dead mesh's devices).  Capacity 2, FIFO: serving
# holds exactly two pytrees live at once (extractor + captioner) and a
# one-entry cache would re-broadcast both every batch as they alternate;
# anything larger needlessly pins old replicated copies (device HBM!) —
# e.g. per-epoch decode params would otherwise accumulate.
_REPLICATED_CACHE: dict = {}
_REPLICATED_CAPACITY = 2


def replicate_cached(mesh: Mesh, params):
    """Broadcast a param pytree over the mesh ONCE and reuse the copy.

    Hot loops (per-batch sharded extraction, per-request decode) would
    otherwise re-broadcast the full pytree — hundreds of MB for the
    extractor — on every call and discard it (ADVICE r2)."""
    key = (id(params), id(mesh))
    hit = _REPLICATED_CACHE.get(key)
    if hit is not None:
        # LRU refresh (ADVICE r3): move the hit to the end so a third
        # occasional pytree interleaving with two hot ones evicts the
        # stale entry, not a hot one (re-broadcast is hundreds of MB)
        _REPLICATED_CACHE[key] = _REPLICATED_CACHE.pop(key)
        return hit[2]
    repl = replicated(mesh)
    out = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
    while len(_REPLICATED_CACHE) >= _REPLICATED_CAPACITY:
        _REPLICATED_CACHE.pop(next(iter(_REPLICATED_CACHE)))
    _REPLICATED_CACHE[key] = (params, mesh, out)
    return out


def decode_placement(mesh: Optional[Mesh], params, batch_size: int):
    """Placement for mesh-sharded batch-parallel decode: ``(params,
    place)`` with ``place`` putting each batch onto the ``data`` axis —
    or ``(params, None)`` when the mesh can't shard it (no mesh / single
    device / batch not divisible by the data axis).  Shared by the
    epoch-valid/evaluation decode (train/loop.decode_split) and serving
    (serve.caption_images) so the eligibility rule can't drift between
    them.  Callers must also bypass the Pallas attention kernel on this
    path: a mosaic custom call carries no SPMD partitioning rule, and
    XLA is at decode parity (docs/performance.md).

    Single-process: params are replicated onto the mesh (cached
    broadcast).  Multi-process (pod): each host materializes only ITS
    devices' rows of the batch (the ``shard_batch`` callback path) and
    params keep their existing mesh placement — they arrive from the
    trainer/checkpoint already placed on this same global mesh, and a
    cross-process re-placement here would be a redundant full-pytree
    transfer per call.  Decode then runs as one SPMD program whose
    wall-time scales with hosts; callers reassemble the row-sharded
    token output with ``train.loop._gather_global_rows`` (VERDICT r3
    weak #7 — previously every host redundantly decoded the full
    split)."""
    if (mesh is None or mesh.devices.size <= 1
            or batch_size % mesh.shape[DATA_AXIS] != 0):
        return params, None
    dshard = data_sharding(mesh)
    if jax.process_count() > 1:
        def place(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, dshard,
                                                lambda idx: x[idx])
        return params, place
    return replicate_cached(mesh, params), \
        lambda x: jax.device_put(x, dshard)


# ---------------------------------------------------------------------------
# Parameter partition rules
# ---------------------------------------------------------------------------

def param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one parameter leaf, keyed by its pytree path.

    Tensor-parallel layout (megatron-style, applied when the `model` axis
    has size > 1; with size 1 every spec degenerates to replication):
      * attention q/k/v kernels  [d, qk/v_dim]   -> shard dim 1 (column)
      * attention joint kernel   [v_dim, d]      -> shard dim 0 (row)
      * FFN w1 kernel            [d, hidden]     -> shard dim 1
      * FFN w2 kernel            [hidden, d]     -> shard dim 0
      * classifier kernel        [d, vocab]      -> shard dim 1 (vocab)
      * embedding table          [vocab, e]      -> shard dim 0 (vocab)
      * everything else (norms, biases, small embeds) replicated
    """
    names = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    names = [str(n) for n in names if n is not None]
    joined = "/".join(names)
    if getattr(leaf, "ndim", 0) < 2:
        return P()
    if joined.endswith("q/kernel") or joined.endswith("k/kernel") \
            or joined.endswith("v/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("joint/kernel"):
        return P(MODEL_AXIS, None)
    if joined.endswith("w1/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("w2/kernel"):
        return P(MODEL_AXIS, None)
    if joined.endswith("classifier/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("word_embedding/table"):
        return P(MODEL_AXIS, None)
    return P()


def param_partition_specs(params):
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(param_spec, params)


def param_shardings(mesh: Mesh, params):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_partition_specs(params),
        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params):
    """Place a param pytree onto the mesh with the TP layout."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params,
        param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch, num_slots: Optional[int] = None):
    """Place host batch arrays onto the mesh: batch dim over `data`, and
    slot dims over `sequence` for the activation arrays the caller names.

    ``num_slots`` identifies which arrays are [B, S, ...] activations:
    only rank>=3 leaves whose dim 1 equals it are sequence-sharded (when
    the axis divides — see :func:`activation_sharding`).  ``None``
    batch-shards everything — sequence sharding is opt-in per call site,
    never inferred from rank alone (a raw-image leaf [B, H, W, 3] whose
    dim 1 happened to divide the sequence axis would otherwise be
    silently sharded over it and reshard at the jit boundary).

    Multi-process (pod) runs: every host assembles the same global batch
    (all hosts read the same dataset), and each host materializes ONLY the
    shards its own devices address — per-host input sharding without any
    assumption about device-to-process contiguity
    (``make_array_from_callback`` hands each host exactly its slice
    indices).  Single-process runs keep the plain ``device_put``."""
    def spec_for(x):
        if (getattr(x, "ndim", 0) >= 3 and num_slots is not None
                and x.shape[1] == num_slots):
            return activation_sharding(mesh, num_slots)
        return data_sharding(mesh)

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, spec_for(x)), batch)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, spec_for(x),
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, batch)


def shard_batch_stacked(mesh: Mesh, batches,
                        num_slots: Optional[int] = None):
    """Stack K same-shape host batches into [K, B, ...] leaves and place
    them with the per-step sharding shifted one dim right (dim 0 is the
    scan axis, unsharded) — the input of a K-step scanned train dispatch
    (train/step.py:compile_train_step_scan).  One host->device transfer
    for K steps instead of K."""
    stack = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)

    def spec_for(x):
        if (x.ndim >= 4 and num_slots is not None
                and x.shape[2] == num_slots):
            return stacked(activation_sharding(mesh, num_slots))
        return stacked(data_sharding(mesh))

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), spec_for(x)), stack)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, spec_for(x),
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, stack)
