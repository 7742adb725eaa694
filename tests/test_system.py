import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig, OrbConfig
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.io.evaluate import ate_rmse
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput


def make_system():
    cfg = SlamConfig()
    cfg = dataclasses.replace(
        cfg, map=MapConfig(max_keyframes=64, max_points=8192,
                           max_kp_per_frame=512, max_obs_per_point=8),
        orb=OrbConfig(n_features=512))
    return SlamSystem(cfg)


def frame_from_obs(obs, t):
    return FrameInput(uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
                      desc_pm1=obs["desc_pm1"], valid=obs["valid"],
                      depth=obs["depth"], timestamp=t)


def test_slam_end_to_end_synthetic():
    """Full SLAM (mapping from scratch + local BA) on a synthetic RGB-D
    sequence: ATE must be small and the map populated."""
    sys_ = make_system()
    scene = synth.make_scene(3000, extent=3.0, depth_center=2.0, seed=11)
    traj = synth.orbit_trajectory(40, radius=0.5, look_at=(0, 0, 2.0))
    cam = sys_.cfg.camera
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, cam, max_kp=512, px_noise=0.3,
                            depth_noise=0.003, bit_flips=8, seed=500 + i)
        sys_.track_features(frame_from_obs(obs, float(i)))

    assert sys_.state == "OK"
    assert sys_.n_kf >= 2
    assert sys_.n_pt > 500
    est = np.stack([T for _, T in sys_.trajectory])
    est_twc = np.asarray(se3_inverse(jnp.asarray(est)))
    gt_twc = np.asarray(se3_inverse(jnp.asarray(traj)))
    err = ate_rmse(est_twc[:, :3, 3], gt_twc[:, :3, 3], align=True)
    assert err < 0.02, f"ATE {err}"


def test_slam_exports_reference_formats(tmp_path):
    sys_ = make_system()
    scene = synth.make_scene(2000, extent=3.0, depth_center=2.0, seed=12)
    traj = synth.orbit_trajectory(25, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw_gt in enumerate(traj):
        obs = synth.observe(scene, Tcw_gt, sys_.cfg.camera, max_kp=512,
                            seed=900 + i)
        sys_.track_features(frame_from_obs(obs, float(i)))
    sys_.save_map(str(tmp_path / "bundle.txt"))
    sys_.save_camera_graph(str(tmp_path / "camera_graph.txt"))
    sys_.save_frame_ids(str(tmp_path / "frame_id.txt"))
    sys_.save_trajectory_tum(str(tmp_path / "traj.txt"))

    from semantic_slam_tpu.io import mapio
    m = mapio.read_bundle(str(tmp_path / "bundle.txt"))
    assert m.num_keyframes() == int(sys_.kf_valid.sum())
    assert m.num_points() == int(sys_.pt_valid.sum())
    fid = mapio.read_frame_ids(str(tmp_path / "frame_id.txt"))
    assert len(fid) == m.num_keyframes()
    from semantic_slam_tpu.io.evaluate import read_trajectory_tum
    t, p = read_trajectory_tum(str(tmp_path / "traj.txt"))
    assert len(t) == 25
