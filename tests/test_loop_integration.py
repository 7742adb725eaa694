"""LoopCloser plumbing over a real SlamSystem map (synthetic sequence)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput
from semantic_slam_tpu.slam.loop import LoopCloser
from semantic_slam_tpu.slam.vocab import train_vocabulary


def test_loop_closer_on_slam_map():
    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=64, max_points=8192,
                                    max_kp_per_frame=512, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    scene = synth.make_scene(2500, extent=3.0, depth_center=2.0, seed=31)
    traj = synth.orbit_trajectory(30, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw in enumerate(traj):
        obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=700 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
            timestamp=float(i)))
    assert sys_.n_kf >= 3

    # vocabulary from the map's own descriptors
    sel = sys_.pt_valid
    from semantic_slam_tpu.ops.orb import unpack_to_pm1
    desc = np.asarray(unpack_to_pm1(jnp.asarray(sys_.pt_desc[sel][:2048])))
    vocab = train_vocabulary(desc, np.ones(len(desc), bool), n_words=128,
                             iters=4)
    lc = LoopCloser(sys_, vocab, min_matches=15)

    # feed keyframes through the closer; adjacent keyframes are excluded by
    # covisibility/gap rules so no (false) loop should fire on an open arc
    fired = []
    for k in range(sys_.n_kf):
        out = lc.on_keyframe(k)
        if out is not None:
            fired.append((k, out[0]))
    assert fired == [], f"false loop closures: {fired}"

    # direct geometric verification between two genuinely-overlapping
    # keyframes must succeed (same scene points, near-identity Sim3)
    res = lc._verify(sys_.n_kf - 1, sys_.n_kf - 2)
    assert res is not None
    S, n_inl = res
    assert n_inl >= 15
    S = np.asarray(S)
    # accumulated drift in this short synthetic run is tiny -> S ~ identity
    assert np.abs(S - np.eye(4)).max() < 0.05, S
