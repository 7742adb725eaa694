"""Child process for test_gba_fixture_full_pointset.

The fixture-scale 8-virtual-device sharded GBA is (with the dp x tp train
step) one of the two heaviest XLA-CPU compiles in the suite; run in-process
after the north-star tests' compile load it reproducibly died inside the
compiler (the same cumulative-state cliff the train-step test hit at r3).
A fresh interpreter gives it a clean compiler; the parent asserts on the
printed metrics.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from semantic_slam_tpu.config import SlamConfig  # noqa: E402
from semantic_slam_tpu.io import mapio  # noqa: E402
from semantic_slam_tpu.slam.system import SlamSystem  # noqa: E402


def reproj_rms(sys_):
    """RMS pixel reprojection error over every (point, observation)."""
    K = np.asarray(sys_.intr.K)
    sel = sys_.pt_valid & (sys_.pt_obs_n >= 2)
    g = sys_.pt_obs_kf[sel]
    kp = sys_.pt_obs_kp[sel]
    ok = (g >= 0) & (g < sys_.n_kf)
    gc, kpc = np.clip(g, 0, None), np.clip(kp, 0, None)
    T = sys_.kf_pose[gc]
    X = sys_.pt_xyz[sel][:, None, :]
    pc = np.einsum("poij,poj->poi", T[..., :3, :3], np.broadcast_to(
        X, T.shape[:2] + (3,))) + T[..., :3, 3]
    z = np.maximum(pc[..., 2], 1e-6)
    pr = np.stack([K[0, 0] * pc[..., 0] / z + K[0, 2],
                   K[1, 1] * pc[..., 1] / z + K[1, 2]], -1)
    uv = sys_.kf_kp_uv[gc, kpc]
    err2 = ((pr - uv) ** 2).sum(-1)
    ok &= pc[..., 2] > 0.05
    return float(np.sqrt(err2[ok].mean())), int(sel.sum())


def main(fixture_dir: str) -> None:
    cfg = SlamConfig.from_yaml("/root/reference/config/TUM3.yaml")
    m = mapio.read_bundle(os.path.join(fixture_dir, "bundle.txt"))
    assert m.num_keyframes() == 194 and m.num_points() == 12498
    sys_ = SlamSystem.from_map(m, cfg)
    sys_._gba_ndev = len(jax.devices())    # the point: the REAL 8-dev mesh
    assert sys_.intr.fx > 500

    base_rms, n_base = reproj_rms(sys_)
    assert n_base > 10000

    rng = np.random.default_rng(0)
    for k in sys_.kf_order[1:]:
        dr = rng.normal(0, 0.004, 3)
        dt = rng.normal(0, 0.02, 3)
        th = np.linalg.norm(dr)
        k_ = dr / max(th, 1e-12)
        Ks = np.array([[0, -k_[2], k_[1]], [k_[2], 0, -k_[0]],
                       [-k_[1], k_[0], 0]])
        dR = np.eye(3) + np.sin(th) * Ks + (1 - np.cos(th)) * Ks @ Ks
        sys_.kf_pose[k][:3, :3] = (dR @ sys_.kf_pose[k][:3, :3]).astype(
            np.float32)
        sys_.kf_pose[k][:3, 3] += dt.astype(np.float32)
    pert_rms, _ = reproj_rms(sys_)

    sys_.global_bundle_adjust(iters=12, max_points=None)
    post_rms, n_post = reproj_rms(sys_)
    print(f"METRICS {base_rms:.6f} {pert_rms:.6f} {post_rms:.6f} "
          f"{n_base} {n_post}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
    sys.exit(0)
