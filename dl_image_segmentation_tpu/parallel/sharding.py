"""Mesh + sharding rules for the U-Net trainer.

The reference has no distributed code (SURVEY.md section 2.4); scaling
here is pure JAX: a 2-D device mesh with axes

    ("data", "model")

Batches are sharded over "data" (data parallelism; gradients
all-reduce over ICI automatically under jit). Convolution kernels of
stages at least ``tp_min_features`` wide are sharded over "model" on
their output-channel axis -- GSPMD propagates the channel sharding
through the network and inserts the collectives. With model axis size
1 this degrades to plain DP.

No NCCL/MPI equivalents anywhere: XLA collectives over ICI/DCN are the
only communication layer (jax.distributed.initialize() for multi-host).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh over the given (default: all)
    devices. n_data defaults to n_devices // n_model."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = devices[: n_data * n_model]
    arr = np.array(use).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   spatial: bool = False) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; with ``spatial``,
    additionally shard axis 1 (image height) over "model" -- GSPMD
    spatially partitions the convolutions (halo exchange over ICI),
    the sequence-parallelism analogue for dense 2-D vision models."""
    if spatial and ndim >= 2:
        return NamedSharding(mesh, P("data", "model",
                                     *([None] * (ndim - 2))))
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(mesh: Mesh, params, tp_min_features: int = 256,
                    fsdp: bool = False, fsdp_min_size: int = 16384):
    """Sharding pytree for U-Net params: conv kernels with >=
    tp_min_features output channels are sharded over "model" on the
    last (cout) axis; everything else replicated. GSPMD derives all
    activation shardings and collectives from these seeds.

    ``fsdp=True`` additionally shards the storage of every large
    (>= fsdp_min_size elements, ndim >= 2) kernel over the "data" axis
    -- the ZeRO-3 recipe, TPU-style: params and (after the first
    donated step) optimizer moments live sharded in HBM; XLA
    all-gathers a kernel right before use and reduce-scatters its
    gradient, riding ICI. Per-device param+optimizer memory drops
    ~n_data-fold while the batch stays sharded over the same axis.
    Composes with channel TP: a kernel wide enough for both is sharded
    over ("model", "data") on cout. Small leaves (biases, norm scales)
    stay replicated -- gathering them would cost more latency than the
    bytes are worth."""
    model_size = mesh.shape["model"]
    data_size = mesh.shape["data"]

    def rule(path, x):
        if not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        tp = (model_size > 1 and x.ndim == 4
              and x.shape[-1] >= tp_min_features
              and x.shape[-1] % model_size == 0)
        need = data_size * (model_size if tp else 1)
        zero = (fsdp and data_size > 1 and x.ndim >= 2
                and x.size >= fsdp_min_size
                and x.shape[-1] % need == 0)
        axes = (["model"] if tp else []) + (["data"] if zero else [])
        if not axes:
            return NamedSharding(mesh, P())
        last = axes[0] if len(axes) == 1 else tuple(axes)
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), last))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch_local(mesh: Mesh, batch, spatial: bool = False):
    """Place a host-local numpy batch onto the mesh, sharded over
    "data" (and, with ``spatial``, height over "model"). Single-process:
    device_put with the batch sharding; multi-host:
    make_array_from_process_local_data (each host feeds its own shard
    range -- per-host shard ownership, SURVEY.md section 2.4)."""
    def put(x):
        sh = batch_sharding(mesh, x.ndim, spatial=spatial)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x)
    return jax.tree_util.tree_map(put, batch)
