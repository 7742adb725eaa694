"""Array-native checkpoint/resume.

The reference's only checkpoint is the text map exchange (bundle.txt et al.,
SURVEY.md §5); this module adds the array-native equivalent: the complete
SlamSystem state, semantic ObjectBank, and TSDF volumes serialize to single
``.npz`` files and restore bit-exactly, so stage-1/stage-2 (and mid-sequence
resume) don't round-trip through text precision. The text exporters remain
available for reference-format interchange.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


_SYSTEM_ARRAYS = [
    "kf_pose", "kf_valid", "kf_frame_id", "kf_kp_uv", "kf_kp_level",
    "kf_kp_valid", "kf_desc", "kf_kp_depth", "pt_xyz", "pt_valid", "pt_desc",
    "pt_desc_pm1", "pt_obs_kf", "pt_obs_kp", "pt_obs_n", "pt_first_kf",
    "pt_found", "pt_visible", "covis_idx", "covis_w", "kf_parent",
    "loop_edges", "Tcw", "velocity",
]
_SYSTEM_SCALARS = ["n_kf", "n_pt", "last_kf_id", "frames_since_kf",
                   "ref_kf_inliers", "frame_count"]


def save_system(path: str, sys_) -> None:
    data = {k: np.asarray(getattr(sys_, k)) for k in _SYSTEM_ARRAYS}
    for k in _SYSTEM_SCALARS:
        data[f"scalar_{k}"] = np.asarray(getattr(sys_, k))
    data["state"] = np.asarray(sys_.state)
    data["kf_timestamps"] = np.asarray(sys_.kf_timestamps)
    data["kf_free"] = np.asarray(sys_.kf_free, np.int32)
    data["kf_order"] = np.asarray(sys_.kf_order, np.int32)
    data["pt_free"] = np.asarray(sys_.pt_free, np.int32)
    traj = sys_.trajectory
    data["traj_t"] = np.asarray([t for t, _ in traj])
    data["traj_T"] = (np.stack([T for _, T in traj])
                      if traj else np.zeros((0, 4, 4), np.float32))
    np.savez_compressed(path, **data)


def load_system(path: str, sys_) -> None:
    """Restore into an already-constructed SlamSystem (same capacities)."""
    z = np.load(path, allow_pickle=False)
    for k in _SYSTEM_ARRAYS:
        arr = getattr(sys_, k)
        if arr.shape != z[k].shape:
            raise ValueError(f"capacity mismatch for {k}: "
                             f"{arr.shape} vs {z[k].shape}")
        setattr(sys_, k, z[k].copy())
    for k in _SYSTEM_SCALARS:
        setattr(sys_, k, int(z[f"scalar_{k}"]))
    sys_.state = str(z["state"])
    sys_.trajectory = [(float(t), T.copy())
                       for t, T in zip(z["traj_t"], z["traj_T"])]
    if "kf_timestamps" in z.files:
        sys_.kf_timestamps = z["kf_timestamps"].copy()
        sys_.kf_free = [int(x) for x in z["kf_free"]]
        sys_.kf_order = [int(x) for x in z["kf_order"]]
    # derive for pre-recycling checkpoints; restore exactly otherwise
    sys_.pt_free = ([int(x) for x in z["pt_free"]] if "pt_free" in z.files
                    else [int(i) for i in
                          np.nonzero(~sys_.pt_valid[:sys_.n_pt])[0]])


def save_object_bank(path: str, bank) -> None:
    data = {f.name: np.asarray(getattr(bank, f.name))
            for f in dataclasses.fields(bank)}
    np.savez_compressed(path, **data)


def load_object_bank(path: str, bank_cls=None):
    import jax.numpy as jnp

    if bank_cls is None:
        from semantic_slam_tpu.semantic.objects import ObjectBank as bank_cls
    z = np.load(path, allow_pickle=False)
    return bank_cls(**{k: jnp.asarray(z[k]) for k in z.files})


def save_params(path: str, params, dtype=None) -> None:
    """Serialize a (nested-dict) Flax param tree to one .npz: keys are the
    '/'-joined tree paths. Counterpart of the reference's torch .pth model
    files (``src/MaskRCNN.py.in`` loads COCO weights; here we ship weights
    trained in-framework on the synthetic scenes).

    `dtype` (e.g. "float16") down-casts float leaves for storage — the
    full-size checkpoint ships in f16 (the model computes in bf16, so f16
    storage loses nothing that matters); load_params restores float32."""
    import jax

    flat = {}
    for path_keys, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in path_keys)
        a = np.asarray(leaf)
        if dtype is not None and np.issubdtype(a.dtype, np.floating):
            a = a.astype(dtype)
        flat[key] = a
    np.savez_compressed(path, **flat)


def load_params(path: str):
    """Inverse of save_params: .npz -> nested dict of jnp arrays (float
    leaves widened back to float32)."""
    import jax.numpy as jnp

    z = np.load(path, allow_pickle=False)
    params: dict = {}
    for key in z.files:
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        a = z[key]
        if np.issubdtype(a.dtype, np.floating) and a.dtype != np.float32:
            a = a.astype(np.float32)
        node[parts[-1]] = jnp.asarray(a)
    return params


def save_tsdf(path: str, vol, color_vol=None) -> None:
    data = dict(tsdf=np.asarray(vol.tsdf), weight=np.asarray(vol.weight),
                origin=np.asarray(vol.origin),
                base2world=np.asarray(vol.base2world))
    if color_vol is not None:
        data["color"] = np.asarray(color_vol)
    np.savez_compressed(path, **data)


def load_tsdf(path: str):
    import jax.numpy as jnp

    from semantic_slam_tpu.ops.tsdf import TsdfVolume

    z = np.load(path, allow_pickle=False)
    vol = TsdfVolume(tsdf=jnp.asarray(z["tsdf"]),
                     weight=jnp.asarray(z["weight"]),
                     origin=jnp.asarray(z["origin"]),
                     base2world=jnp.asarray(z["base2world"]))
    color = jnp.asarray(z["color"]) if "color" in z.files else None
    return vol, color
