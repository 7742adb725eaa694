from semantic_slam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, data_sharding, replicated, shard_params_for_tp,
)
