"""Map persistence: the reference text checkpoint formats + array-native ckpt.

Readers/writers byte-compatible with the reference's stage-1 -> stage-2
exchange files so its committed fixtures (``result/rgbd/*``) load directly:

  - ``bundle.txt``   — header ``<K> <P>``; per-KF 5 lines (``0 0 0``, 3 rows of
    R, 1 row of t, world->camera); per-point 3 lines (xyz, ``0 0 0`` color,
    ``nobs kf kp x y ...``). Writer: reference ``System.cc:884-945`` SaveMap;
    reader: reference ``Utility.cpp:106-236`` LoadMap.
  - ``coords.txt``   — per-KF header ``#index = i, name = ..., keys = n, px =
    .., py = .., focal = ..`` then ``j x y 0 0 r g b`` rows
    (``System.cc:950-976`` SaveCoords).
  - ``camera_graph.txt`` — per-KF ``id n (child weight)*`` with only
    backward-looking edges (``System.cc:1057-1101`` SaveCameraGraph).
  - ``associations.txt`` — ``t rgb t depth`` per keyframe
    (``System.cc:981-1002`` SaveAssociations).
  - ``frame_id.txt`` — source frame index per keyframe (``System.cc:1104-1120``).

A fast C++ parser (native/src/textio.cpp, loaded via ctypes) accelerates
bundle.txt parsing when built; the NumPy path is the always-available fallback.
"""

from __future__ import annotations

import dataclasses
import io as _io
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from semantic_slam_tpu.config import MapConfig
from semantic_slam_tpu.slam.map import MapArrays

try:  # optional native fast path
    from semantic_slam_tpu.io import native as _native
except Exception:  # pragma: no cover
    _native = None


# ---------------------------------------------------------------------------
# bundle.txt
# ---------------------------------------------------------------------------


def read_bundle(path: str, map_cfg: Optional[MapConfig] = None) -> MapArrays:
    """Load a reference-format bundle.txt into MapArrays."""
    if _native is not None and _native.available():
        parsed = _native.parse_bundle(path)
        if parsed is not None:
            return _bundle_to_maparrays(*parsed, map_cfg=map_cfg)
    with open(path, "r") as f:
        tokens = np.array(f.read().split(), dtype=np.float64)
    k, p = int(tokens[0]), int(tokens[1])
    ofs = 2
    # per-KF block: 15 floats (3 zeros, 9 R, 3 t)
    kf_block = tokens[ofs: ofs + 15 * k].reshape(k, 15)
    ofs += 15 * k
    R = kf_block[:, 3:12].reshape(k, 3, 3)
    t = kf_block[:, 12:15]
    # points: variable-length observation rows
    xyz = np.zeros((p, 3), np.float64)
    obs_kf: List[np.ndarray] = []
    obs_kp: List[np.ndarray] = []
    obs_uv: List[np.ndarray] = []
    i = ofs
    for j in range(p):
        xyz[j] = tokens[i: i + 3]
        i += 6  # xyz + color
        nobs = int(tokens[i])
        i += 1
        rec = tokens[i: i + 4 * nobs].reshape(nobs, 4)
        i += 4 * nobs
        obs_kf.append(rec[:, 0].astype(np.int32))
        obs_kp.append(rec[:, 1].astype(np.int32))
        obs_uv.append(rec[:, 2:4])
    return _bundle_to_maparrays(R, t, xyz, obs_kf, obs_kp, obs_uv, map_cfg=map_cfg)


def _bundle_to_maparrays(R, t, xyz, obs_kf, obs_kp, obs_uv,
                         map_cfg: Optional[MapConfig] = None) -> MapArrays:
    import jax.numpy as jnp

    k, p = len(R), len(xyz)
    if map_cfg is None:
        map_cfg = MapConfig(
            max_keyframes=max(_next_pow2(k), 256),
            max_points=max(_next_pow2(p), 1024),
        )
    m = MapArrays.empty(map_cfg)
    K, P, N, O = (map_cfg.max_keyframes, map_cfg.max_points,
                  map_cfg.max_kp_per_frame, map_cfg.max_obs_per_point)
    if k > K or p > P:
        raise ValueError(f"fixture larger than capacities: {k}>{K} or {p}>{P}")

    pose = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    pose[:k, :3, :3] = R
    pose[:k, :3, 3] = t

    kp_uv = np.zeros((K, N, 2), np.float32)
    kp_valid = np.zeros((K, N), bool)
    pt_obs_kf = np.full((P, O), -1, np.int32)
    pt_obs_kp = np.full((P, O), -1, np.int32)
    pt_obs_n = np.zeros((P,), np.int32)
    for j in range(p):
        n = min(len(obs_kf[j]), O)
        pt_obs_kf[j, :n] = obs_kf[j][:n]
        pt_obs_kp[j, :n] = obs_kp[j][:n]
        pt_obs_n[j] = n
        for a in range(len(obs_kf[j])):
            kf_i, kp_i = int(obs_kf[j][a]), int(obs_kp[j][a])
            if 0 <= kf_i < K and 0 <= kp_i < N:
                kp_uv[kf_i, kp_i] = obs_uv[j][a]
                kp_valid[kf_i, kp_i] = True

    pt_xyz = np.zeros((P, 3), np.float32)
    pt_xyz[:p] = xyz
    return dataclasses.replace(
        m,
        kf_pose=jnp.asarray(pose),
        kf_valid=jnp.asarray(np.arange(K) < k),
        kf_frame_id=jnp.asarray(np.where(np.arange(K) < k, np.arange(K), -1), jnp.int32),
        kf_kp_uv=jnp.asarray(kp_uv),
        kf_kp_valid=jnp.asarray(kp_valid),
        pt_xyz=jnp.asarray(pt_xyz),
        pt_valid=jnp.asarray(np.arange(P) < p),
        pt_obs_kf=jnp.asarray(pt_obs_kf),
        pt_obs_kp=jnp.asarray(pt_obs_kp),
        pt_obs_n=jnp.asarray(pt_obs_n),
        n_kf=jnp.asarray(k, jnp.int32),
        n_pt=jnp.asarray(p, jnp.int32),
    )


def write_bundle(path: str, m: MapArrays) -> None:
    """Write MapArrays to reference bundle.txt format (System.cc:884-945)."""
    kf_valid = np.asarray(m.kf_valid)
    pt_valid = np.asarray(m.pt_valid)
    pose = np.asarray(m.kf_pose)
    xyz = np.asarray(m.pt_xyz)
    obs_kf = np.asarray(m.pt_obs_kf)
    obs_kp = np.asarray(m.pt_obs_kp)
    obs_n = np.asarray(m.pt_obs_n)
    kp_uv = np.asarray(m.kf_kp_uv)
    kf_ids = np.nonzero(kf_valid)[0]
    pt_ids = np.nonzero(pt_valid)[0]
    # keyframes re-numbered consecutively, invalid slots skipped (ref parity)
    new_id = {int(s): i for i, s in enumerate(kf_ids)}
    buf = _io.StringIO()
    buf.write(f"{len(kf_ids)} {len(pt_ids)}\n")
    for s in kf_ids:
        R = pose[s, :3, :3]
        t = pose[s, :3, 3]
        buf.write("0.000000 0.000000 0.000000\n")
        for r in range(3):
            buf.write(f"{R[r,0]:.6f} {R[r,1]:.6f} {R[r,2]:.6f}\n")
        buf.write(f"{t[0]:.6f} {t[1]:.6f} {t[2]:.6f}\n")
    for j in pt_ids:
        buf.write(f"{xyz[j,0]:.6f} {xyz[j,1]:.6f} {xyz[j,2]:.6f}\n")
        buf.write("0 0 0\n")
        n = int(obs_n[j])
        recs = []
        for a in range(n):
            kf_s, kp_i = int(obs_kf[j, a]), int(obs_kp[j, a])
            if kf_s in new_id:
                u, v = kp_uv[kf_s, kp_i]
                recs.append(f"{new_id[kf_s]} {kp_i} {u:.6f} {v:.6f}")
        buf.write(f"{len(recs)}" + ("" if not recs else " " + " ".join(recs)) + "\n")
    with open(path, "w") as f:
        f.write(buf.getvalue())


def _next_pow2(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


# ---------------------------------------------------------------------------
# coords.txt
# ---------------------------------------------------------------------------


def read_coords(path: str, m: MapArrays) -> MapArrays:
    """Merge a coords.txt keypoint dump into MapArrays (fills kf_kp_uv fully)."""
    import jax.numpy as jnp

    kp_uv = np.asarray(m.kf_kp_uv).copy()
    kp_valid = np.asarray(m.kf_kp_valid).copy()
    kf = -1
    with open(path, "r") as f:
        for line in f:
            if line.startswith("#index"):
                kf += 1
                continue
            parts = line.split()
            if len(parts) < 3 or kf < 0:
                continue
            j = int(parts[0])
            if j < kp_uv.shape[1]:
                kp_uv[kf, j] = (float(parts[1]), float(parts[2]))
                kp_valid[kf, j] = True
    return dataclasses.replace(m, kf_kp_uv=jnp.asarray(kp_uv),
                               kf_kp_valid=jnp.asarray(kp_valid))


def write_coords(path: str, m: MapArrays, fx: float, cx: float, cy: float) -> None:
    kf_valid = np.asarray(m.kf_valid)
    kp_uv = np.asarray(m.kf_kp_uv)
    kp_valid = np.asarray(m.kf_kp_valid)
    with open(path, "w") as f:
        count = 0
        for s in np.nonzero(kf_valid)[0]:
            n = kp_uv.shape[1]
            f.write(f"#index = {count}, name = rgb/xxxxx.jpg, keys = {n}, "
                    f"px = {cx:.6f}, py = {cy:.6f}, focal = {fx:.6f}\n")
            for j in range(n):
                u, v = kp_uv[s, j]
                f.write(f"{j} {u:.6f} {v:.6f} 0 0 r g b\n")
            count += 1


# ---------------------------------------------------------------------------
# camera_graph.txt (backward-looking weighted covisibility)
# ---------------------------------------------------------------------------


def read_camera_graph(path: str, m: MapArrays) -> MapArrays:
    """Load camera_graph.txt edges into covis_idx/covis_w (symmetrized).

    The file stores only backward edges (child id < parent id, reference
    ``System.cc:1086-1094``); the loader re-adds both directions like
    ``Utility.cpp:238-289`` UpdateCameraGraph does via AddConnection.
    """
    import jax.numpy as jnp

    K, C = m.covis_idx.shape
    adj: List[Dict[int, int]] = [dict() for _ in range(K)]
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2:
                continue
            kf = int(parts[0])
            n = int(parts[1])
            for a in range(n):
                child = int(parts[2 + 2 * a])
                w = int(parts[3 + 2 * a])
                adj[kf][child] = w
                adj[child][kf] = w
    covis_idx = np.full((K, C), -1, np.int32)
    covis_w = np.zeros((K, C), np.int32)
    for i in range(K):
        # deterministic top-C: by weight desc, neighbor id asc on ties
        items = sorted(adj[i].items(), key=lambda kv: (-kv[1], kv[0]))[:C]
        for a, (j, w) in enumerate(items):
            covis_idx[i, a] = j
            covis_w[i, a] = w
    return dataclasses.replace(m, covis_idx=jnp.asarray(covis_idx),
                               covis_w=jnp.asarray(covis_w))


def write_camera_graph(path: str, m: MapArrays) -> None:
    """Write backward-looking weighted edges (System.cc:1057-1101 parity)."""
    kf_valid = np.asarray(m.kf_valid)
    covis_idx = np.asarray(m.covis_idx)
    covis_w = np.asarray(m.covis_w)
    kf_ids = np.nonzero(kf_valid)[0]
    new_id = {int(s): i for i, s in enumerate(kf_ids)}
    # collect undirected edges from BOTH endpoints' (possibly capacity-
    # truncated) neighbor lists, so an edge survives as long as either side
    # still holds it.
    undirected = {}
    for s in kf_ids:
        for j, w in zip(covis_idx[s], covis_w[s]):
            if j >= 0 and int(j) in new_id:
                a, b = new_id[int(s)], new_id[int(j)]
                undirected[(min(a, b), max(a, b))] = int(w)
    with open(path, "w") as f:
        for s in kf_ids:
            i = new_id[int(s)]
            edges = sorted((b, w) for (b, a), w in undirected.items() if a == i)
            f.write(f"{i} {len(edges)}")
            for j, w in edges:
                f.write(f" {j} {w}")
            f.write("\n")


# ---------------------------------------------------------------------------
# associations.txt / frame_id.txt / trajectories
# ---------------------------------------------------------------------------


def read_associations(path: str) -> Tuple[np.ndarray, List[str], List[str]]:
    """Parse TUM association lines ``t_rgb rgb t_d depth`` -> (times, rgb, depth)."""
    times, rgb, depth = [], [], []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 4:
                times.append(float(parts[0]))
                rgb.append(parts[1])
                depth.append(parts[3])
    return np.array(times), rgb, depth


def write_associations(path: str, times: Sequence[float], rgb: Sequence[str],
                       depth: Sequence[str]) -> None:
    with open(path, "w") as f:
        for t, r, d in zip(times, rgb, depth):
            f.write(f"{t:.6f} {r} {t:.6f} {d}\n")


def read_frame_ids(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.int64).reshape(-1)


def write_frame_ids(path: str, m: MapArrays) -> None:
    kf_valid = np.asarray(m.kf_valid)
    fid = np.asarray(m.kf_frame_id)
    with open(path, "w") as f:
        for s in np.nonzero(kf_valid)[0]:
            f.write(f"{int(fid[s])}\n")


def write_trajectory_tum(path: str, times: np.ndarray, poses_twc: np.ndarray) -> None:
    """TUM format: ``t tx ty tz qx qy qz qw`` (System.cc SaveTrajectoryTUM parity)."""
    from semantic_slam_tpu.io.evaluate import rotmat_to_quat

    with open(path, "w") as f:
        for t, T in zip(times, poses_twc):
            q = rotmat_to_quat(T[:3, :3])
            tr = T[:3, 3]
            f.write(f"{t:.6f} {tr[0]:.7f} {tr[1]:.7f} {tr[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def write_trajectory_kitti(path: str, poses_twc: np.ndarray) -> None:
    """KITTI format: 12 floats of the 3x4 camera-to-world matrix per line."""
    with open(path, "w") as f:
        for T in poses_twc:
            row = T[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in row) + "\n")


def write_map_points(path: str, m: MapArrays) -> None:
    """Plain xyz rows of all valid map points (System.cc:857-879
    SaveMapPoints parity)."""
    xyz = np.asarray(m.pt_xyz)[np.asarray(m.pt_valid)]
    with open(path, "w") as f:
        for p in xyz:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")


def write_covisibility_graph(path: str, m: MapArrays) -> None:
    """Symmetric unweighted covisibility lists: ``id n ids...`` per keyframe
    (System.cc:1015-1052 SaveCovisibilityGraph parity)."""
    kf_valid = np.asarray(m.kf_valid)
    covis_idx = np.asarray(m.covis_idx)
    kf_ids = np.nonzero(kf_valid)[0]
    new_id = {int(s): i for i, s in enumerate(kf_ids)}
    with open(path, "w") as f:
        for s in kf_ids:
            neigh = [new_id[int(j)] for j in covis_idx[s]
                     if j >= 0 and int(j) in new_id]
            if neigh:
                f.write(f"{new_id[int(s)]} {len(neigh)} "
                        + " ".join(str(j) for j in neigh) + " \n")


def write_pmvs(out_dir: str, m: MapArrays, K: np.ndarray,
               image_names: Optional[List[str]] = None) -> None:
    """PMVS2 export layout (System.cc:534-719 WritePMVS parity): per-keyframe
    ``txt/%08d.txt`` projection matrices P = K [R|t], ``models/option-0000``
    config, ``vis.dat`` covisibility, plus dir stubs for images."""
    os.makedirs(os.path.join(out_dir, "txt"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "visualize"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "models"), exist_ok=True)
    kf_valid = np.asarray(m.kf_valid)
    pose = np.asarray(m.kf_pose)
    kf_ids = np.nonzero(kf_valid)[0]
    for i, s in enumerate(kf_ids):
        P = K @ pose[s][:3, :4]
        with open(os.path.join(out_dir, "txt", f"{i:08d}.txt"), "w") as f:
            f.write("CONTOUR\n")
            for r in range(3):
                f.write(f"{P[r,0]:.8g} {P[r,1]:.8g} {P[r,2]:.8g} {P[r,3]:.8g}\n")
    covis_idx = np.asarray(m.covis_idx)
    new_id = {int(s): i for i, s in enumerate(kf_ids)}
    with open(os.path.join(out_dir, "vis.dat"), "w") as f:
        f.write("VISDATA\n")
        f.write(f"{len(kf_ids)}\n")
        for s in kf_ids:
            neigh = [new_id[int(j)] for j in covis_idx[s]
                     if j >= 0 and int(j) in new_id]
            f.write(f"{new_id[int(s)]} {len(neigh)} "
                    + " ".join(str(j) for j in neigh) + "\n")
    with open(os.path.join(out_dir, "models", "option-0000"), "w") as f:
        f.write("timages -1 0 {}\noimages 0\nlevel 1\n".format(len(kf_ids)))


def write_rgbd_dump(out_dir: str, m: MapArrays, K: np.ndarray,
                    cam_cfg=None) -> None:
    """Keyframe pose/intrinsics dump (System.cc:725-851 WriteRGBD parity:
    per-keyframe camera files; image copying is the dataset's job)."""
    os.makedirs(out_dir, exist_ok=True)
    kf_valid = np.asarray(m.kf_valid)
    pose = np.asarray(m.kf_pose)
    fid = np.asarray(m.kf_frame_id)
    with open(os.path.join(out_dir, "cameras.txt"), "w") as f:
        f.write(f"{K[0,0]:.6f} {K[1,1]:.6f} {K[0,2]:.6f} {K[1,2]:.6f}\n")
        for i, s in enumerate(np.nonzero(kf_valid)[0]):
            T = pose[s]
            vals = " ".join(f"{v:.7f}" for v in T[:3, :4].reshape(-1))
            f.write(f"{i} {int(fid[s])} {vals}\n")
