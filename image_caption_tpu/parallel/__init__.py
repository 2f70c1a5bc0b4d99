"""Parallelism: device mesh, sharding rules, distributed init."""

from .mesh import (DATA_AXIS, MODEL_AXIS, SEQUENCE_AXIS,  # noqa: F401
                   data_sharding, make_mesh, param_partition_specs,
                   param_shardings, shard_batch, shard_params)
