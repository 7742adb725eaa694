"""TPU-native semantic SLAM framework.

A from-scratch re-design of the capabilities of Tariq-Abuhashim/semantic-slam
(ORB-SLAM2-based geometric SLAM + Mask-RCNN/DoN semantic object mapping) for
TPU hardware: JAX/XLA/Pallas compute kernels, fixed-capacity SoA array state,
pjit/shard_map multi-chip scaling, and a C++ native runtime for host I/O.

Layer map (mirrors reference SURVEY.md layer map):
  L6 drivers       -> examples/*.py
  L5 visualization -> semantic_slam_tpu.viz
  L4 engine        -> semantic_slam_tpu.semantic.engine
  L3 semantic map  -> semantic_slam_tpu.semantic.objects / inventory
  L2 perception    -> semantic_slam_tpu.ops + models (Mask R-CNN, DoN, TSDF)
  L1 SLAM core     -> semantic_slam_tpu.slam (tracking/mapping/BA/loop)
  L0 persistence   -> semantic_slam_tpu.io (bundle.txt-compatible + array ckpt)
  L-1 config       -> semantic_slam_tpu.config
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code (SE3 algebra, GN solves, projections) needs true f32 matmuls;
# on TPU the default lowering is bf16. Neural-net layers opt back into bf16 by
# passing explicit dtypes/precision in the model code.
_jax.config.update("jax_default_matmul_precision", "float32")

from semantic_slam_tpu.config import SlamConfig, load_opencv_yaml  # noqa: F401
