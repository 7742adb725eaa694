"""Sharded-training evidence at CONTRACT shapes (VERDICT r4 item 8).

The shipped checkpoints were trained single-device at 240x320; the dp x tp
sharded step had only been exercised at 64x64 / batch 4 (dryrun section 1).
This tool runs the real thing at the contract shape — 240x320, batch 8,
the full-architecture Mask R-CNN (``models/maskrcnn.py`` defaults, the
reference ``src/MaskRCNN.py.in`` R-50-FPN contract) — in two modes:

  cpu: dp=4 x tp=2 over the 8-virtual-device CPU mesh (fresh interpreter,
       same environment the test suite shards in). 3 steps: proves the
       sharded compile + execution at contract shape, records per-step wall
       (step 2+ must not recompile).
  tpu: single real chip, 24 steps: proves the loss DECREASES over >= 20
       steps at contract shape with no per-step recompiles.

Writes/updates artifacts/train_contract.json (one key per mode).

Run:  python tools/train_contract_bench.py cpu|tpu [n_steps]
"""

import json
import os
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"

if MODE == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from semantic_slam_tpu.models.maskrcnn import MaskRCNN  # noqa: E402
from semantic_slam_tpu.parallel.mesh import make_mesh  # noqa: E402
from semantic_slam_tpu.parallel.train import (  # noqa: E402
    make_sharded_train_step, make_synthetic_batch)

HW = (240, 320)
BATCH = 8


def _sync(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def main() -> None:
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else (
        3 if MODE == "cpu" else 24)
    model = MaskRCNN()                      # full contract architecture
    batch = make_synthetic_batch(BATCH, *HW)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(HW + (3,), jnp.float32))
    print(f"init {time.time() - t0:.1f}s", flush=True)
    tx = optax.sgd(3e-3, momentum=0.9)
    opt_state = tx.init(params)

    if MODE == "cpu":
        assert len(jax.devices()) == 8, jax.devices()
        mesh = make_mesh(8, model_parallel=2)     # dp=4 x tp=2
        place, shard_batch, step = make_sharded_train_step(model, mesh, tx)
        ctx = mesh
    else:
        mesh = make_mesh(1, model_parallel=1)
        place, shard_batch, step = make_sharded_train_step(model, mesh, tx)
        ctx = mesh
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(__file__), "..", ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    losses, step_s = [], []
    with ctx:
        params, opt_state = place(params, opt_state)
        sbatch = shard_batch(batch)
        for i in range(n_steps):
            t0 = time.time()
            params, opt_state, loss = step(params, opt_state, sbatch)
            losses.append(float(loss))          # sync point
            step_s.append(round(time.time() - t0, 3))
            print(f"step {i}: loss {losses[-1]:.4f} ({step_s[-1]}s)",
                  flush=True)

    rec = {
        "mode": MODE,
        "devices": len(jax.devices()),
        "mesh": ("dp4 x tp2" if MODE == "cpu" else "1 device"),
        "image_hw": list(HW), "batch": BATCH,
        "model": "MaskRCNN() full contract (R-50-FPN sizes)",
        "n_steps": n_steps,
        "loss_first": losses[0], "loss_last": losses[-1],
        "losses": [round(l, 4) for l in losses],
        "step_s": step_s,
        "steady_step_s": round(float(np.median(step_s[1:])), 3)
        if len(step_s) > 1 else step_s[0],
    }
    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "train_contract.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out[MODE] = rec
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", os.path.abspath(path), flush=True)
    if MODE == "tpu":
        assert losses[-1] < losses[0], (losses[0], losses[-1])


if __name__ == "__main__":
    main()
