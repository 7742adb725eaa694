"""Device mesh + sharding runtime.

The reference has no distributed backend at all (SURVEY.md §2.3: its
concurrency is four pthreads + mutexes on one box). This module is the
framework's NCCL-equivalent: one place that builds `jax.sharding.Mesh`es and
named shardings; all cross-device movement happens through XLA collectives
inserted by pjit/shard_map over these meshes (ICI intra-slice, DCN across
hosts when `jax.distributed` is initialized).

Axes:
  data  — batch / keyframe parallelism (stage-2 DP, training DP)
  model — tensor parallelism over wide NN layers (tp)
Spatial TSDF sharding reuses `data` as the volume-slab axis.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: `jax.distributed.initialize` so `jax.devices()`
    spans all hosts and meshes lay ICI inside a slice / DCN across hosts.
    No-ops (returning the local device count) when already initialized or
    when running single-process."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(f"asked for {n} devices, have {len(devs)}")
    if n % model_parallel != 0:
        raise ValueError("n_devices must divide by model_parallel")
    grid = np.array(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_tp(params, mesh: Mesh):
    """Model-parallel placement for the Mask R-CNN parameter tree.

    Wide Dense kernels (the 1024-unit box-head MLP and class/box/mask
    projections) shard their output (last) dim over the `model` axis; biases
    shard to match; everything else replicates. Returns a pytree of
    NamedShardings aligned with `params`.
    """
    tp = mesh.shape["model"]

    def rule(path, x):
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        if tp > 1 and hasattr(x, "ndim"):
            if ("box_head" in pstr or "mask_head" in pstr):
                if x.ndim >= 1 and x.shape[-1] % tp == 0 and x.shape[-1] >= tp * 8:
                    spec = [None] * (x.ndim - 1) + ["model"]
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
