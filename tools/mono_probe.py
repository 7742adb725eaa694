"""Exploration harness for pixels-first monocular tracking (not a test).

Runs track_monocular over the textured ring corridor and reports init
quality, per-KF triangulation yield, match/inlier counts, and LOST events —
the diagnostics behind hardening the mono front end (VERDICT r3 item 3).
"""

import dataclasses
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_slam_tpu.config import SlamConfig, MapConfig
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.orb import extract_orb
from semantic_slam_tpu.slam.system import SlamSystem
from semantic_slam_tpu.slam.vocab import train_vocabulary


def main(n_frames=240):
    base = SlamConfig()
    cfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, fx=267.7, fy=269.6,
                                   cx=160.05, cy=123.8, width=320,
                                   height=240),
        map=MapConfig(max_keyframes=128, max_points=16384,
                      max_kp_per_frame=512, max_obs_per_point=8),
        orb=dataclasses.replace(base.orb, n_features=512))
    cam = cfg.camera
    N_TRAJ = 240                      # fixed frame spacing regardless of
    N = min(n_frames, N_TRAJ)         # how many frames we actually run
    traj = synth.ring_trajectory(N_TRAJ, radius=3.5, laps=1.25)

    descs, valids = [], []
    for i in range(0, N_TRAJ, N_TRAJ // 6):
        g, _ = synth.render_ring_textured(traj[i], cam, seed=7 * i)
        f = extract_orb(jnp.asarray(g, jnp.float32), cfg.orb)
        descs.append(np.asarray(f.desc_pm1))
        valids.append(np.asarray(f.valid))
    vocab = train_vocabulary(np.concatenate(descs), np.concatenate(valids),
                             n_words=128, iters=3)

    sys_ = SlamSystem(cfg)
    sys_.attach_loop_closing(vocab, run_global_ba=True)
    lc = sys_._loop_closer

    lost = 0
    last_nkf = 0
    last_npt = 0
    t0 = time.time()
    # wrap _post_track to surface per-frame match/inlier counts
    orig_post = sys_._post_track
    frame_stats = {}

    def post(Tcw_pred, Tcw_new, n_match, n_inl, match_pt, inlier_kp, get_fi):
        frame_stats["m"] = n_match
        frame_stats["i"] = n_inl
        return orig_post(Tcw_pred, Tcw_new, n_match, n_inl, match_pt,
                         inlier_kp, get_fi)

    sys_._post_track = post
    for i in range(N):
        gray, _ = synth.render_ring_textured(
            traj[i], cam, seed=1000 + i, px_noise=2.0, depth_noise=0.01)
        sys_.track_monocular(gray, timestamp=float(i))
        if sys_.state == "LOST":
            lost += 1
        if sys_.n_kf != last_nkf:
            nvalid = int(sys_.pt_valid.sum())
            ts = getattr(sys_, "_tri_stats", {})
            print(f"f{i:4d} KF{sys_.n_kf - 1:3d} state={sys_.state} "
                  f"pts_valid={nvalid} (+{nvalid - last_npt}) "
                  f"n_pt={sys_.n_pt} inl={sys_.ref_kf_inliers} "
                  f"tri={ts} loops={len(lc.loops)}", flush=True)
            last_nkf, last_npt = sys_.n_kf, nvalid
        elif i % 5 == 0 or sys_.state != "OK":
            print(f"f{i:4d} state={sys_.state} m={frame_stats.get('m')} "
                  f"i={frame_stats.get('i')}", flush=True)
    print(f"done: {time.time() - t0:.1f}s lost={lost} kf={sys_.n_kf} "
          f"pts={int(sys_.pt_valid.sum())} loops={len(lc.loops)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 240)
