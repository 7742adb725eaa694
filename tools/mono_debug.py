"""Deep-dive diagnostics for the mono pixels-first path (not a test).

Steps through two-view init internals and triangulation acceptance on
rendered ring frames with known GT poses, printing where matches die.
"""

import dataclasses
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import extract_orb
from semantic_slam_tpu.ops.match import match_descriptors, window_mask
from semantic_slam_tpu.slam.initializer import two_view_init, accept_init


def make_cfg():
    base = SlamConfig()
    return dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, fx=267.7, fy=269.6,
                                   cx=160.05, cy=123.8, width=320,
                                   height=240),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      max_kp_per_frame=512, max_obs_per_point=8),
        orb=dataclasses.replace(base.orb, n_features=512))


def feats_at(cfg, traj, i, seed_base=1000):
    gray, depth = synth.render_ring_textured(
        traj[i], cfg.camera, seed=seed_base + i, px_noise=2.0,
        depth_noise=0.01)
    f = extract_orb(jnp.asarray(gray, jnp.float32), cfg.orb)
    return (np.asarray(f.uv), np.asarray(f.level), np.asarray(f.desc_pm1),
            np.asarray(f.valid), depth)


def pair_diag(cfg, traj, i, j):
    intr = Intrinsics.from_config(cfg.camera)
    uv1, lv1, d1, v1, dep1 = feats_at(cfg, traj, i)
    uv2, lv2, d2, v2, dep2 = feats_at(cfg, traj, j)
    mask = window_mask(jnp.asarray(uv1), jnp.asarray(uv2), 100.0)
    res = match_descriptors(jnp.asarray(d1), jnp.asarray(d2),
                            jnp.asarray(v1), jnp.asarray(v2), mask,
                            max_dist=50, ratio=0.9, mutual=True)
    midx = np.asarray(res.idx)
    sel = midx >= 0
    nm = int(sel.sum())
    # GT-verified match fraction: project kp1 through GT depth into frame j
    K = np.asarray(intr.K)
    T1, T2 = traj[i], traj[j]  # w2c? ring_trajectory returns Tcw
    x = (uv1[:, 0] - K[0, 2]) / K[0, 0]
    y = (uv1[:, 1] - K[1, 2]) / K[1, 1]
    z = dep1[np.clip(uv1[:, 1].astype(int), 0, cfg.camera.height - 1),
             np.clip(uv1[:, 0].astype(int), 0, cfg.camera.width - 1)]
    pc1 = np.stack([x * z, y * z, z], -1)
    Rw1 = T1[:3, :3].T
    pw = (pc1 - T1[:3, 3]) @ np.linalg.inv(T1[:3, :3]).T
    pc2 = pw @ T2[:3, :3].T + T2[:3, 3]
    pr2 = np.stack([K[0, 0] * pc2[:, 0] / np.maximum(pc2[:, 2], 1e-6) + K[0, 2],
                    K[1, 1] * pc2[:, 1] / np.maximum(pc2[:, 2], 1e-6) + K[1, 2]],
                   -1)
    uv2m = np.zeros_like(uv1)
    uv2m[sel] = uv2[midx[sel]]
    gt_err = np.linalg.norm(pr2 - uv2m, axis=-1)
    good_gt = int((sel & (gt_err < 6.0) & (z > 0.1)).sum())
    print(f"pair ({i},{j}): valid1={int(v1.sum())} valid2={int(v2.sum())} "
          f"matches={nm} gt_consistent={good_gt}")

    init = two_view_init(intr, jnp.asarray(uv1), jnp.asarray(uv2m),
                         jnp.asarray(sel), seed=0)
    ng = int(init.n_good)
    print(f"  two_view: score_f={float(init.score_f):.1f} "
          f"score_h={float(init.score_h):.1f} "
          f"rh={float(init.score_h) / max(float(init.score_h) + float(init.score_f), 1e-9):.3f} "
          f"n_good={ng} n_good2={int(init.n_good_second)} "
          f"med_depth={float(init.median_depth):.3f} "
          f"accept={accept_init(init, nm)}")
    # GT relative pose for comparison
    Trel = T2 @ np.linalg.inv(T1)
    R_est = np.asarray(init.R)
    t_est = np.asarray(init.t)
    t_gt = Trel[:3, 3] / max(np.linalg.norm(Trel[:3, 3]), 1e-9)
    t_e = t_est / max(np.linalg.norm(t_est), 1e-9)
    ang = np.degrees(np.arccos(np.clip(
        (np.trace(R_est @ Trel[:3, :3].T) - 1) / 2, -1, 1)))
    print(f"  R err {ang:.2f} deg; t dir dot {float(t_e @ t_gt):.3f}; "
          f"baseline {np.linalg.norm(Trel[:3, 3]):.3f} m")
    return nm, ng


def main():
    cfg = make_cfg()
    N = 240
    traj = synth.ring_trajectory(N, radius=3.5, laps=1.25)
    for gap in (1, 2, 3, 5, 8):
        pair_diag(cfg, traj, 20, 20 + gap)


if __name__ == "__main__":
    main()
