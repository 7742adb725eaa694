"""Sharded Mask R-CNN training step (dp over batch × tp over wide layers).

This is the multi-chip training path: the batch shards over the `data` mesh
axis, wide head kernels shard over `model` (see mesh.shard_params_for_tp),
and XLA inserts the gradient all-reduce (psum over `data`) and the
activation collectives for the tp'd layers. No hand-written collectives —
the shardings ARE the parallelism specification.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semantic_slam_tpu.models.maskrcnn import MaskRCNN
from semantic_slam_tpu.parallel.mesh import (
    data_sharding, replicated, shard_params_for_tp)


def make_synthetic_batch(batch: int, height: int, width: int, n_gt: int = 4,
                         seed: int = 0) -> Dict[str, jnp.ndarray]:
    import numpy as np

    rs = np.random.RandomState(seed)
    imgs = rs.uniform(0, 255, (batch, height, width, 3)).astype(np.float32)
    boxes = np.zeros((batch, n_gt, 4), np.float32)
    labels = np.zeros((batch, n_gt), np.int32)
    masks = np.zeros((batch, n_gt, height, width), np.float32)
    valid = np.zeros((batch, n_gt), bool)
    for b in range(batch):
        for g in range(rs.randint(1, n_gt + 1)):
            x0 = rs.randint(0, width // 2)
            y0 = rs.randint(0, height // 2)
            w = rs.randint(8, width // 2)
            h = rs.randint(8, height // 2)
            boxes[b, g] = (x0, y0, min(x0 + w, width - 1), min(y0 + h, height - 1))
            labels[b, g] = rs.randint(1, 81)
            masks[b, g, y0:y0 + h, x0:x0 + w] = 1.0
            valid[b, g] = True
    return dict(image=jnp.asarray(imgs), gt_boxes=jnp.asarray(boxes),
                gt_labels=jnp.asarray(labels), gt_masks=jnp.asarray(masks),
                gt_valid=jnp.asarray(valid))


def make_sharded_train_step(model: MaskRCNN, mesh: Mesh, tx):
    """Build (init_fn, step_fn) with explicit in/out shardings over mesh."""

    def loss_fn(params, batch):
        losses = jax.vmap(
            lambda im, gb, gl, gm, gv: model.apply(
                params, im, gb, gl, gm, gv, method=MaskRCNN.loss)["total"]
        )(batch["image"], batch["gt_boxes"], batch["gt_labels"],
          batch["gt_masks"], batch["gt_valid"])
        return jnp.mean(losses)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def shard_batch(batch):
        return {k: jax.device_put(v, data_sharding(mesh, v.ndim))
                for k, v in batch.items()}

    def place(params, opt_state):
        pshard = shard_params_for_tp(params, mesh)
        params = jax.tree_util.tree_map(jax.device_put, params, pshard)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicated(mesh))
            if hasattr(x, "ndim") else x, opt_state)
        return params, opt_state

    jit_step = jax.jit(step, donate_argnums=(0, 1))
    return place, shard_batch, jit_step
