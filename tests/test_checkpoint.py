import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import checkpoint, mapio, synth
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
from semantic_slam_tpu.slam.vocab import train_vocabulary


def run_short_slam(n=15):
    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=32, max_points=4096,
                                    max_kp_per_frame=256, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    scene = synth.make_scene(1500, extent=3.0, depth_center=2.0, seed=41)
    traj = synth.orbit_trajectory(n, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw in enumerate(traj):
        obs = synth.observe(scene, Tcw, cfg.camera, max_kp=256, seed=800 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
            timestamp=float(i)))
    return cfg, sys_, scene, traj


def test_system_checkpoint_roundtrip(tmp_path):
    cfg, sys_, scene, traj = run_short_slam()
    path = str(tmp_path / "slam.npz")
    checkpoint.save_system(path, sys_)
    sys2 = SlamSystem(cfg)
    checkpoint.load_system(path, sys2)
    np.testing.assert_array_equal(sys2.kf_pose, sys_.kf_pose)
    np.testing.assert_array_equal(sys2.pt_xyz, sys_.pt_xyz)
    assert sys2.n_kf == sys_.n_kf and sys2.n_pt == sys_.n_pt
    assert sys2.pt_free == sys_.pt_free
    assert sys2.state == sys_.state
    assert len(sys2.trajectory) == len(sys_.trajectory)

    # resumed system keeps tracking
    obs = synth.observe(scene, traj[-1], cfg.camera, max_kp=256, seed=999)
    sys2.track_features(FrameInput(
        uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
        desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
        timestamp=99.0))
    assert sys2.state == "OK"


def test_relocalization_after_lost(tmp_path):
    cfg, sys_, scene, traj = run_short_slam(20)
    from semantic_slam_tpu.ops.orb import unpack_to_pm1
    desc = np.asarray(unpack_to_pm1(jnp.asarray(
        sys_.pt_desc[sys_.pt_valid][:1024])))
    vocab = train_vocabulary(desc, np.ones(len(desc), bool), n_words=64,
                             iters=4)
    sys_.attach_place_recognition(vocab)

    # corrupt the pose estimate to force a LOST state, then feed a frame
    # from a previously-visited viewpoint
    sys_.Tcw = np.eye(4, dtype=np.float32)
    sys_.Tcw[:3, 3] = (50.0, 0.0, 0.0)       # nowhere near the map
    sys_.velocity = np.eye(4, dtype=np.float32)
    obs = synth.observe(scene, traj[2], cfg.camera, max_kp=256, seed=1234)
    sys_.track_features(FrameInput(
        uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
        desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
        timestamp=50.0))
    assert sys_.state == "OK", "relocalization failed"
    err = np.linalg.norm(sys_.Tcw[:3, 3] - traj[2][:3, 3])
    assert err < 0.05, err


def test_object_bank_checkpoint(tmp_path):
    from semantic_slam_tpu.semantic import objects as O
    bank = O.ObjectBank.empty(4, 64)
    bank = O.init_object(bank, jnp.int32(1), jnp.int32(57), jnp.float32(0.9),
                         jnp.ones(3) * 0.5)
    path = str(tmp_path / "bank.npz")
    checkpoint.save_object_bank(path, bank)
    b2 = checkpoint.load_object_bank(path)
    np.testing.assert_array_equal(np.asarray(b2.obj_valid),
                                  np.asarray(bank.obj_valid))
    np.testing.assert_array_equal(np.asarray(b2.obj_label),
                                  np.asarray(bank.obj_label))


def test_aux_exporters(tmp_path):
    cfg, sys_, _, _ = run_short_slam()
    m = sys_.to_map_arrays()
    from semantic_slam_tpu.geometry import Intrinsics
    K = np.asarray(Intrinsics.from_config(cfg.camera).K)
    mapio.write_map_points(str(tmp_path / "mappoints.txt"), m)
    pts = np.loadtxt(tmp_path / "mappoints.txt")
    assert len(pts) == int(np.asarray(m.pt_valid).sum())
    mapio.write_covisibility_graph(str(tmp_path / "covis.txt"), m)
    assert (tmp_path / "covis.txt").exists()
    mapio.write_pmvs(str(tmp_path / "pmvs"), m, K)
    assert (tmp_path / "pmvs" / "vis.dat").exists()
    assert (tmp_path / "pmvs" / "txt" / "00000000.txt").exists()
    mapio.write_rgbd_dump(str(tmp_path / "rgbd"), m, K)
    assert (tmp_path / "rgbd" / "cameras.txt").exists()
