"""SearchAndFuse under a saturated observation table (VERDICT r3 weak #9).

The map's static O-slot observation table can be FULL of odometry-side
observations exactly when a loop closes; a silently-dropped cross-loop
observation would leave GBA with only odometry-consistent factors, and the
loop would relax back open on the next bundle adjustment. The forced-add
path (``SlamSystem._add_observation(force=True)``, used by
LoopClosing::SearchAndFuse parity in ``slam/loop.py``) must instead evict a
redundant odometry observation — never slot 0, which anchors the loop
correction's point transform.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.slam.system import SlamSystem


def _sys():
    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=32, max_points=512,
                                    max_kp_per_frame=64,
                                    max_obs_per_point=8))
    return SlamSystem(cfg)


def test_forced_add_evicts_redundant_never_reference():
    s = _sys()
    p = 0
    s.pt_valid[p] = True
    # 8 observations from keyframes 0..7 at 1 Hz; kf 3 and 4 are closest in
    # time to each other AND to their other neighbors — all interior slots
    # are similar, but slot 0 must survive regardless
    for k in range(8):
        s.kf_valid[k] = True
        s.kf_timestamps[k] = float(k)
        s._add_observation(p, k, kp=k)
    assert s.pt_obs_n[p] == 8

    # plain add on a full table: dropped (legacy behavior)
    s._add_observation(p, 20, kp=9)
    assert 20 not in s.pt_obs_kf[p]

    # forced add: lands, evicting an interior slot
    s.kf_valid[20] = True
    s.kf_timestamps[20] = 99.0
    s._add_observation(p, 20, kp=9, force=True)
    assert 20 in s.pt_obs_kf[p]
    assert s.pt_obs_kf[p, 0] == 0          # reference slot untouched
    assert s.pt_obs_n[p] == 8              # table stays at capacity

    # a second forced add must not evict the first cross-loop factor (its
    # timestamp gap to everything else is large = least redundant)
    s.kf_valid[21] = True
    s.kf_timestamps[21] = 55.0
    s._add_observation(p, 21, kp=10, force=True)
    assert 20 in s.pt_obs_kf[p] and 21 in s.pt_obs_kf[p]


def test_searchandfuse_injects_cross_loop_obs_when_full():
    """End-to-end through _fuse_into(force_obs=True): points whose tables
    are saturated by odometry still gain the loop-side observation."""
    s = _sys()
    cam = s.cfg.camera
    rs = np.random.RandomState(0)

    # a grid of points in front of the origin
    P = 32
    pts = np.zeros((P, 3), np.float32)
    pts[:, 0] = np.linspace(-0.5, 0.5, P)
    pts[:, 1] = rs.uniform(-0.3, 0.3, P)
    pts[:, 2] = 2.0
    s.pt_xyz[:P] = pts
    s.pt_valid[:P] = True
    s.n_pt = P

    # keyframe 8 = the "current side" keyframe at identity, with keypoints
    # exactly at the projections of the points and matching descriptors
    desc = rs.randint(0, 256, (P, 32)).astype(np.uint8)
    from semantic_slam_tpu.ops.orb import unpack_to_pm1

    k_cur = 8
    s.kf_valid[k_cur] = True
    s.kf_pose[k_cur] = np.eye(4, dtype=np.float32)
    s.kf_timestamps[k_cur] = 100.0
    u = cam.fx * pts[:, 0] / pts[:, 2] + cam.cx
    v = cam.fy * pts[:, 1] / pts[:, 2] + cam.cy
    s.kf_kp_uv[k_cur, :P] = np.stack([u, v], -1)
    s.kf_kp_valid[k_cur, :P] = True
    s.kf_desc[k_cur, :P] = desc
    s.pt_desc[:P] = desc
    s.pt_desc_pm1[:P] = np.asarray(unpack_to_pm1(jnp.asarray(desc)))

    # saturate every point's table with odometry keyframes 0..7
    for k in range(8):
        s.kf_valid[k] = True
        s.kf_timestamps[k] = float(k)
    for p in range(P):
        for k in range(8):
            s._add_observation(p, k, kp=p)
    assert (s.pt_obs_n[:P] == 8).all()

    fused_obs_before = sum(s._observes(p, k_cur) for p in range(P))
    assert fused_obs_before == 0
    s._fuse_into(np.arange(P), k_cur, radius=4.0, force_obs=True)
    with_cross = sum(s._observes(p, k_cur) for p in range(P))
    # every visible point must now carry the cross-loop factor
    assert with_cross == P, with_cross
    # and the reference slot survived on all of them
    assert (s.pt_obs_kf[:P, 0] == 0).all()
