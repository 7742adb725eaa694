import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.parallel.mesh import make_mesh
from semantic_slam_tpu.parallel.ba_shard import bundle_adjust_sharded
from semantic_slam_tpu.slam.ba import bundle_adjust
from tests.test_ba import make_ba_problem, INTR


def test_sharded_ba_matches_single_device(rng):
    # P=304 not divisible by 8 -> build with a padded point count
    prob, traj_gt, pts_gt = make_ba_problem(rng, n_pts=304)
    mesh = make_mesh(8, model_parallel=1)
    res_s = bundle_adjust_sharded(mesh, INTR, prob, iters=8, trim_rounds=2)
    res_1 = bundle_adjust(INTR, prob, iters=8, trim_rounds=2)
    # identical decisions; results equal to f32 reduction-order noise
    np.testing.assert_allclose(np.asarray(res_s.kf_pose),
                               np.asarray(res_1.kf_pose), atol=5e-4)
    pose_err = np.linalg.norm(
        np.asarray(res_s.kf_pose)[:, :3, 3] - traj_gt[:, :3, 3], axis=1)
    assert pose_err.max() < 0.01
    assert float(res_s.cost) < float(res_s.initial_cost) * 0.05
