"""Child process for test_sharded_train_step_dp_tp.

The dp x tp sharded Mask R-CNN train step is the single heaviest XLA-CPU
compile in the suite. Run in-process after ~95 other tests' compiles it
reproducibly died inside LLVM (SIGSEGV/SIGABRT in backend_compile_and_load
— position-deterministic, passes standalone, so cumulative compiler state,
not the program). Running it in a fresh interpreter removes the cumulative
state entirely; the parent test asserts on this script's printed losses.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from semantic_slam_tpu.models.maskrcnn import MaskRCNN  # noqa: E402
from semantic_slam_tpu.parallel.mesh import make_mesh  # noqa: E402
from semantic_slam_tpu.parallel.train import (  # noqa: E402
    make_sharded_train_step, make_synthetic_batch)


def main() -> None:
    assert len(jax.devices()) == 8
    mesh = make_mesh(8, model_parallel=2)
    model = MaskRCNN(pre_nms=32, post_nms=8, roi_samples=8)
    img_hw = (64, 64)
    batch = make_synthetic_batch(4, *img_hw)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros(img_hw + (3,), jnp.float32))
    tx = optax.sgd(1e-3)
    opt_state = tx.init(params)
    place, shard_batch, step = make_sharded_train_step(model, mesh, tx)
    with mesh:
        params, opt_state = place(params, opt_state)
        batch = shard_batch(batch)
        params, opt_state, loss = step(params, opt_state, batch)
        params, opt_state, loss2 = step(params, opt_state, batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    assert float(loss2) <= float(loss) * 1.5
    print(f"LOSSES {float(loss):.6f} {float(loss2):.6f}", flush=True)


if __name__ == "__main__":
    main()
    sys.exit(0)
