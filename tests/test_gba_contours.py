import dataclasses

import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.geometry import se3_inverse
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.io.evaluate import ate_rmse
from semantic_slam_tpu.slam.system import SlamSystem, FrameInput


def test_global_bundle_adjust_improves_or_keeps_map():
    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=64, max_points=8192,
                                    max_kp_per_frame=512, max_obs_per_point=8))
    sys_ = SlamSystem(cfg)
    scene = synth.make_scene(2500, extent=3.0, depth_center=2.0, seed=51)
    traj = synth.orbit_trajectory(30, radius=0.4, look_at=(0, 0, 2.0))
    for i, Tcw in enumerate(traj):
        obs = synth.observe(scene, Tcw, cfg.camera, max_kp=512, seed=600 + i)
        sys_.track_features(FrameInput(
            uv=obs["uv"], level=obs["level"], desc_u8=obs["desc_u8"],
            desc_pm1=obs["desc_pm1"], valid=obs["valid"], depth=obs["depth"],
            timestamp=float(i)))
    gt_twc = np.asarray(se3_inverse(jnp.asarray(traj)))

    def kf_ate():
        ids = np.nonzero(sys_.kf_valid)[0]
        fids = sys_.kf_frame_id[ids].astype(int)
        est = np.stack([np.linalg.inv(sys_.kf_pose[k]) for k in ids])
        return ate_rmse(est[:, :3, 3], gt_twc[fids][:, :3, 3], align=True)

    before = kf_ate()
    sys_.global_bundle_adjust(iters=8)
    after = kf_ate()
    assert after <= before * 1.5 + 1e-4, (before, after)
    assert after < 0.02


def test_track_by_contours_matches_same_shape():
    """Two similar masks of the same label across keyframes must associate;
    a very different shape must not."""
    from semantic_slam_tpu.semantic import Engine, OracleDetector
    from semantic_slam_tpu.semantic import objects as O
    from semantic_slam_tpu.config import load_categories

    cfg = SlamConfig()
    cats = load_categories()
    eng = Engine(cats, cfg, detector=None)
    H, W = cfg.camera.height, cfg.camera.width

    mask1 = np.zeros((H, W), bool)
    mask1[100:200, 100:220] = True          # rectangle
    mask2 = np.zeros((H, W), bool)
    mask2[120:215, 130:240] = True          # similar rectangle, shifted
    tri = np.zeros((H, W), bool)
    yy, xx = np.mgrid[0:H, 0:W]
    tri[(yy > 300) & (xx > yy) & (xx < 2 * yy - 280)] = True  # triangle wedge

    Tcw = np.eye(4, dtype=np.float32)
    # create an object with an observation of mask1
    eng.bank = O.init_object(eng.bank, jnp.int32(0), jnp.int32(57),
                             jnp.float32(0.9), jnp.ones(3))
    from semantic_slam_tpu.ops.maskops import hu_moments, mask_centroid
    eng.inventory.add_keyframe(0, Tcw)
    eng.inventory.observe(0, 0, 57, 0.9,
                          hu=np.asarray(hu_moments(jnp.asarray(mask1))),
                          centroid=np.asarray(mask_centroid(jnp.asarray(mask1))))

    assert eng.track_by_contours(jnp.asarray(mask2), 57, 0.9, Tcw) == 0
    assert eng.track_by_contours(jnp.asarray(tri), 57, 0.9, Tcw) == -1
