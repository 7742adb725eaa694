"""Configuration system.

Reads the reference's OpenCV ``FileStorage`` YAML files unchanged (same keys as
``config/TUM3.yaml`` / ``config/KITTI03.yaml`` in the reference: camera
intrinsics/distortion, ORB extractor knobs, DoN scales, Engine block — parity
with reference ``src/Engine.cpp:17-48``), and exposes typed dataclasses used
throughout the framework.

OpenCV FileStorage YAML is *almost* YAML: it begins with a ``%YAML:1.0``
directive and uses flat ``Dotted.Key: value`` entries, so a small tolerant
parser is simpler and dependency-free.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional


def load_opencv_yaml(path: str) -> Dict[str, float]:
    """Parse an OpenCV FileStorage YAML file into a flat {key: value} dict.

    Values are floats/ints/strings. Matches the subset of YAML the reference
    configs use (scalar ``A.B: v`` lines, ``#`` comments).
    """
    out: Dict[str, object] = {}
    with open(path, "r") as f:
        for line in f:
            line = line.split("#", 1)[0].rstrip()
            if not line or line.startswith("%YAML"):
                continue
            m = re.match(r"^([A-Za-z0-9_.]+)\s*:\s*(.+?)\s*$", line)
            if not m:
                continue
            key, raw = m.group(1), m.group(2)
            raw = raw.strip().strip('"')
            try:
                val: object = int(raw)
            except ValueError:
                try:
                    val = float(raw)
                except ValueError:
                    val = raw
            out[key] = val
    return out


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera + radial-tangential distortion (Camera.* keys)."""

    fx: float = 535.4
    fy: float = 539.2
    cx: float = 320.1
    cy: float = 247.6
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 40.0          # stereo baseline * fx
    th_depth: float = 40.0    # close/far point threshold, in baselines
    depth_map_factor: float = 5000.0
    rgb: int = 1

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB feature front-end knobs (ORBextractor.* keys).

    Capacities are static for XLA: per-level keypoint budgets are fixed and
    padded with validity masks.
    """

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    # TPU-native additions (static capacities / grid binning):
    cell_size: int = 32            # grid cell for spatial binning of keypoints
    max_kp_per_cell: int = 4       # top-k corners kept per cell per level
    patch_size: int = 31           # orientation / descriptor patch
    edge_margin: int = 19          # border where no keypoints are extracted


@dataclasses.dataclass(frozen=True)
class DonConfig:
    """Difference-of-Normals segmentation (DoN.* keys; reference src/DoN.cpp)."""

    scale1: float = 0.05
    scale2: float = 0.5
    threshold: float = 0.1
    segradius: float = 0.05
    min_cluster_size: int = 15
    max_cluster_size: int = 1000000
    max_clusters: int = 64         # static cluster capacity (TPU)
    cc_iters: int = 64             # label-propagation sweeps for clustering


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Semantic engine parameters (Engine.* keys; reference src/Engine.cpp:38-48)."""

    sensor: int = 2                # 1=Lidar range image, 2=RGBD, 3=Stereo
    dist: float = 1.0              # min inside-contour distance (px)
    min_depth: float = 0.1
    max_depth: float = 3.0
    min_area: float = 25.0
    max_area: float = 250000.0
    overlap: float = 0.5           # DoN-cluster/mask overlap for fusion
    min_point_count: int = 15
    prob_thd: float = 0.5          # fg/(fg+bg) threshold; 0.75 lidar, 0.5 RGBD
    res: float = 0.0               # pixel spacing of densified points (ref quirk: absent key -> 0)
    # static capacities (TPU)
    max_objects: int = 64
    max_points_per_object: int = 4096
    max_masks: int = 32
    score_margin: float = 1.1      # c4 rule: object.score > margin*det.score


@dataclasses.dataclass(frozen=True)
class TsdfConfig:
    """Per-object TSDF volume (reference include/tsdf.hpp:60-67, src/tsdf.cu)."""

    dim: int = 200                 # 200^3 voxels
    voxel_size: float = 0.004      # 4 mm
    trunc_margin_voxels: float = 5.0
    max_integrate_depth: float = 6.0
    # exact-path block budget for the hierarchically-culled kernel. A
    # single OBJECT's truncation band occupies a few hundred 8^3 blocks;
    # the full-frame default in ops/tsdf.py is 2048. Each budgeted block
    # costs 512 arbitrary-index depth gathers whether or not it is filled,
    # so the per-object path must not carry the full-frame budget.
    max_mixed: int = 512

    @property
    def trunc_margin(self) -> float:
        return self.trunc_margin_voxels * self.voxel_size


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Static capacities for the array-native SLAM map."""

    max_keyframes: int = 512
    max_points: int = 32768
    max_kp_per_frame: int = 1024
    max_obs_per_point: int = 16
    covis_max_neighbors: int = 64


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    orb: OrbConfig = dataclasses.field(default_factory=OrbConfig)
    don: DonConfig = dataclasses.field(default_factory=DonConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    tsdf: TsdfConfig = dataclasses.field(default_factory=TsdfConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)

    @staticmethod
    def from_yaml(path: str, **overrides) -> "SlamConfig":
        """Build a SlamConfig from a reference-format OpenCV YAML file."""
        d = load_opencv_yaml(path)

        def g(key, default):
            return d.get(key, default)

        cam = CameraConfig(
            fx=g("Camera.fx", 535.4), fy=g("Camera.fy", 539.2),
            cx=g("Camera.cx", 320.1), cy=g("Camera.cy", 247.6),
            k1=g("Camera.k1", 0.0), k2=g("Camera.k2", 0.0),
            p1=g("Camera.p1", 0.0), p2=g("Camera.p2", 0.0),
            k3=g("Camera.k3", 0.0),
            width=int(g("Camera.width", 640)), height=int(g("Camera.height", 480)),
            fps=g("Camera.fps", 30.0), bf=g("Camera.bf", 40.0),
            th_depth=g("ThDepth", 40.0),
            depth_map_factor=g("DepthMapFactor", 5000.0),
            rgb=int(g("Camera.RGB", 1)),
        )
        orb = OrbConfig(
            n_features=int(g("ORBextractor.nFeatures", 1000)),
            scale_factor=g("ORBextractor.scaleFactor", 1.2),
            n_levels=int(g("ORBextractor.nLevels", 8)),
            ini_th_fast=int(g("ORBextractor.iniThFAST", 20)),
            min_th_fast=int(g("ORBextractor.minThFAST", 7)),
        )
        don = DonConfig(
            scale1=g("DoN.scale1", 0.05), scale2=g("DoN.scale2", 0.5),
            threshold=g("DoN.threshold", 0.1), segradius=g("DoN.segradius", 0.05),
        )
        eng = EngineConfig(
            sensor=int(g("Engine.Sensor", 2)),
            dist=g("Engine.mnDist", 1.0),
            min_depth=g("Engine.mnMinDepth", 0.1),
            max_depth=g("Engine.mnMaxDepth", 3.0),
            min_area=g("Engine.mMinArea", 25.0),
            max_area=g("Engine.mMaxArea", 250000.0),
            overlap=g("Engine.mOverlap", 0.5),
            min_point_count=int(g("Engine.mMinPointCount", 15)),
            prob_thd=g("Engine.mProbThd", 0.5),
            # reference quirk parity: Engine.mRes missing from YAMLs -> 0.0
            res=g("Engine.mRes", 0.0),
        )
        cfg = SlamConfig(camera=cam, orb=orb, don=don, engine=eng)
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        return cfg


def load_categories(path: Optional[str] = None) -> Dict[int, str]:
    """Load the COCO-81 category map (reference config/categories.txt format:
    ``name  id`` per line; reference src/Utility.cpp:334-367)."""
    if path is None:
        return dict(enumerate(COCO_CATEGORIES))
    out: Dict[int, str] = {}
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[-1])] = parts[0]
    return out


# The 81 COCO categories (background + 80), the detection contract of the
# reference Mask R-CNN bridge (reference include/MaskRCNN.hpp:33-51).
COCO_CATEGORIES = [
    "background", "person", "bicycle", "car", "motorcycle", "airplane", "bus",
    "train", "truck", "boat", "traffic_light", "fire_hydrant", "stop_sign",
    "parking_meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella", "handbag",
    "tie", "suitcase", "frisbee", "skis", "snowboard", "sports_ball", "kite",
    "baseball_bat", "baseball_glove", "skateboard", "surfboard",
    "tennis_racket", "bottle", "wine_glass", "cup", "fork", "knife", "spoon",
    "bowl", "banana", "apple", "sandwich", "orange", "broccoli", "carrot",
    "hot_dog", "pizza", "donut", "cake", "chair", "couch", "potted_plant",
    "bed", "dining_table", "toilet", "tv", "laptop", "mouse", "remote",
    "keyboard", "cell_phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy_bear",
    "hair_drier", "toothbrush",
]
