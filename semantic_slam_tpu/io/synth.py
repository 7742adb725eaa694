"""Synthetic scene generation for end-to-end tests and benchmarks.

There are no camera datasets in the build environment, so correctness is
established against *synthetic worlds with exact ground truth*: random
landmark clouds with stable binary descriptors, smooth camera trajectories,
analytic depth renders of box scenes. This replaces the role the TUM/KITTI
sequences play for the reference (its only fixtures, SURVEY.md §4) while
being stronger: ground-truth poses/depths are exact, so ATE asserts have no
dataset noise floor.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np

from semantic_slam_tpu.config import CameraConfig


class SynthScene(NamedTuple):
    pts_w: np.ndarray        # [P, 3] landmark positions
    desc_pm1: np.ndarray     # [P, 256] int8 {-1,+1} stable landmark descriptors
    desc_u8: np.ndarray      # [P, 32] packed


def make_scene(n_points: int = 2000, extent: float = 4.0, depth_center: float = 3.0,
               seed: int = 0) -> SynthScene:
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-extent / 2, extent / 2, size=(n_points, 3))
    pts[:, 2] += depth_center
    bits = rs.randint(0, 2, size=(n_points, 256)).astype(bool)
    desc_pm1 = np.where(bits, 1, -1).astype(np.int8)
    weights = 2 ** np.arange(8)
    desc_u8 = (bits.reshape(n_points, 32, 8) * weights).sum(-1).astype(np.uint8)
    return SynthScene(pts.astype(np.float32), desc_pm1, desc_u8)


def orbit_trajectory(n_frames: int, radius: float = 0.6, look_at=(0.0, 0.0, 3.0),
                     wobble: float = 0.1, seed: int = 1) -> np.ndarray:
    """[N, 4, 4] world->camera poses (Tcw) on a smooth arc looking at a target."""
    rs = np.random.RandomState(seed)
    target = np.asarray(look_at, np.float64)
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        a = 2.0 * np.pi * i / max(n_frames, 1) * 0.25   # quarter orbit
        center = np.array([radius * np.sin(a),
                           wobble * np.sin(3 * a),
                           radius * (1 - np.cos(a))])
        z = target - center
        z = z / np.linalg.norm(z)
        x = np.cross(np.array([0.0, 1.0, 0.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], axis=1)               # columns = camera axes
        Twc = np.eye(4)
        Twc[:3, :3] = Rwc
        Twc[:3, 3] = center
        poses[i] = np.linalg.inv(Twc)
    return poses.astype(np.float32)


def observe(scene: SynthScene, Tcw: np.ndarray, cam: CameraConfig,
            max_kp: int = 512, px_noise: float = 0.3, depth_noise: float = 0.005,
            bit_flips: int = 12, seed: int = 0, drop: float = 0.1,
            rank: Optional[np.ndarray] = None):
    """Simulate a frame: project landmarks, keep those in-frustum, corrupt.

    Returns dict with uv [max_kp,2], depth [max_kp], desc_pm1, desc_u8,
    level (all zeros), valid mask, and landmark_id [max_kp] ground-truth
    correspondence (for diagnostics only — never consumed by the SLAM code).

    `rank` ([P] float, higher = stronger) models per-landmark corner
    strength: when more than max_kp landmarks are visible, the strongest
    are kept — the way a real detector picks the same physical corners in
    different views of the same scene (stereo pairs need this overlap).
    Without it the subset is random per view.
    """
    rs = np.random.RandomState(seed)
    R, t = Tcw[:3, :3], Tcw[:3, 3]
    pc = scene.pts_w @ R.T + t
    z = pc[:, 2]
    u = cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy
    vis = (z > 0.2) & (u > 8) & (u < cam.width - 8) & (v > 8) & (v < cam.height - 8)
    vis &= rs.uniform(size=len(z)) > drop
    ids = np.nonzero(vis)[0]
    if rank is not None:
        ids = ids[np.argsort(-rank[ids])][:max_kp]
        rs.shuffle(ids)
    else:
        rs.shuffle(ids)
        ids = ids[:max_kp]
    n = len(ids)

    uv = np.zeros((max_kp, 2), np.float32)
    depth = np.zeros((max_kp,), np.float32)
    desc = np.zeros((max_kp, 256), np.int8)
    lid = np.full((max_kp,), -1, np.int32)
    uv[:n, 0] = u[ids] + rs.normal(0, px_noise, n)
    uv[:n, 1] = v[ids] + rs.normal(0, px_noise, n)
    depth[:n] = z[ids] * (1.0 + rs.normal(0, depth_noise, n))
    d = scene.desc_pm1[ids].copy()
    for i in range(n):
        flip = rs.choice(256, size=bit_flips, replace=False)
        d[i, flip] *= -1
    desc[:n] = d
    lid[:n] = ids
    bits = desc > 0
    weights = 2 ** np.arange(8)
    desc_u8 = (bits.reshape(max_kp, 32, 8) * weights).sum(-1).astype(np.uint8)
    return dict(uv=uv, depth=depth, desc_pm1=desc, desc_u8=desc_u8,
                level=np.zeros((max_kp,), np.int32),
                valid=np.arange(max_kp) < n, landmark_id=lid)


def observe_stereo(scene: SynthScene, Tcw: np.ndarray, cam: CameraConfig,
                   max_kp: int = 512, px_noise: float = 0.3,
                   bit_flips: int = 12, seed: int = 0, drop: float = 0.1):
    """Simulate a rectified stereo pair: two independent `observe` passes,
    the right camera displaced by baseline = bf/fx along the camera x-axis
    (same orientation — rectified geometry, the input contract of
    ``ops.stereo.stereo_depth`` / ORB-SLAM2 ComputeStereoMatches).

    Returns (left, right) observation dicts. Each side has its own keypoint
    order, dropout, pixel noise, and descriptor corruption, so recovering
    depth requires genuine left-right descriptor matching. The left dict's
    `depth` field is the ground-truth z (diagnostics only — a stereo
    pipeline must use stereo_depth instead)."""
    # shared per-landmark corner strength: both views keep the same
    # strongest landmarks (what a real detector does), so the stereo pair
    # overlaps even when far more than max_kp are visible
    rank = np.random.RandomState(97).uniform(size=len(scene.pts_w))
    left = observe(scene, Tcw, cam, max_kp=max_kp, px_noise=px_noise,
                   depth_noise=0.0, bit_flips=bit_flips, seed=seed, drop=drop,
                   rank=rank)
    Trl = np.eye(4, dtype=np.float32)
    Trl[0, 3] = -cam.bf / cam.fx
    right = observe(scene, Trl @ Tcw, cam, max_kp=max_kp, px_noise=px_noise,
                    depth_noise=0.0, bit_flips=bit_flips,
                    seed=seed + 7_000_003, drop=drop, rank=rank)
    return left, right


def make_ring_scene(n_points: int = 6000, wall_radius: float = 4.5,
                    height: float = 1.2, thickness: float = 0.3,
                    seed: int = 0) -> SynthScene:
    """Landmarks on a cylindrical corridor wall: the exploration substrate
    for drift/loop-closure tests — a camera circling inside sees only a
    local arc of the wall, so new territory keeps entering the map and pose
    error can accumulate until the lap closes."""
    rs = np.random.RandomState(seed)
    th = rs.uniform(0, 2 * np.pi, n_points)
    r = wall_radius + rs.uniform(-thickness / 2, thickness / 2, n_points)
    y = rs.uniform(-height / 2, height / 2, n_points)
    pts = np.stack([r * np.sin(th), y, r * np.cos(th)], -1).astype(np.float32)
    bits = rs.randint(0, 2, size=(n_points, 256)).astype(bool)
    desc_pm1 = np.where(bits, 1, -1).astype(np.int8)
    weights = 2 ** np.arange(8)
    desc_u8 = (bits.reshape(n_points, 32, 8) * weights).sum(-1).astype(np.uint8)
    return SynthScene(pts, desc_pm1, desc_u8)


def ring_trajectory(n_frames: int, radius: float = 3.5,
                    laps: float = 1.0) -> np.ndarray:
    """[N, 4, 4] Tcw: camera circling at `radius`, facing radially outward
    (at the corridor wall). One full lap returns to the start pose."""
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        phi = 2.0 * np.pi * laps * i / max(n_frames - 1, 1)
        sa, ca = np.sin(phi), np.cos(phi)
        c = np.array([radius * sa, 0.0, radius * ca])
        x = np.array([ca, 0.0, -sa])
        y = np.array([0.0, 1.0, 0.0])
        z = np.array([sa, 0.0, ca])
        Twc = np.eye(4)
        Twc[:3, :3] = np.stack([x, y, z], 1)
        Twc[:3, 3] = c
        poses[i] = np.linalg.inv(Twc)
    return poses.astype(np.float32)


def spiral_ring_trajectory(n_frames: int, radius: float = 3.5,
                           lap1: float = 1.08, ramp: float = 0.12,
                           lap2: float = 1.1, y2: float = 0.9) -> np.ndarray:
    """[N, 4, 4] Tcw: two stacked ring laps joined by a smooth vertical ramp
    — a "spiral staircase" double loop. The camera circles at y=0 for `lap1`
    laps (first loop closes at one lap), climbs to y=`y2` over `ramp` laps,
    then circles the upper wall band for `lap2` laps (second loop). The two
    loops overlap in the ramp region and via the shared essential graph, so
    a second closure must not reopen the first (persistent loop edges)."""
    total = lap1 + ramp + lap2
    poses = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        s = total * i / max(n_frames - 1, 1)          # laps travelled
        phi = 2.0 * np.pi * s
        if s <= lap1:
            y = 0.0
        elif s <= lap1 + ramp:
            f = (s - lap1) / ramp
            y = y2 * (3 * f * f - 2 * f ** 3)         # smoothstep climb
        else:
            y = y2
        sa, ca = np.sin(phi), np.cos(phi)
        c = np.array([radius * sa, y, radius * ca])
        x = np.array([ca, 0.0, -sa])
        yv = np.array([0.0, 1.0, 0.0])
        z = np.array([sa, 0.0, ca])
        Twc = np.eye(4)
        Twc[:3, :3] = np.stack([x, yv, z], 1)
        Twc[:3, 3] = c
        poses[i] = np.linalg.inv(Twc)
    return poses.astype(np.float32)


# ---------------------------------------------------------------------------
# Dense renders (for DoN / TSDF / engine tests)
# ---------------------------------------------------------------------------


class BoxScene(NamedTuple):
    """Axis-aligned boxes over a ground plane at z-depth plane_depth."""
    boxes: np.ndarray   # [B, 6] (xmin, ymin, zmin, xmax, ymax, zmax) world
    labels: np.ndarray  # [B] semantic class per box


def make_box_scene(n_boxes: int = 3, seed: int = 0) -> BoxScene:
    rs = np.random.RandomState(seed)
    boxes = []
    for _ in range(n_boxes):
        cx, cy = rs.uniform(-0.8, 0.8, 2)
        cz = rs.uniform(1.5, 2.5)
        sx, sy, sz = rs.uniform(0.25, 0.5, 3)
        boxes.append([cx - sx / 2, cy - sy / 2, cz - sz / 2,
                      cx + sx / 2, cy + sy / 2, cz + sz / 2])
    labels = rs.choice([57, 63, 41], size=n_boxes)  # chair, laptop, cup
    return BoxScene(np.asarray(boxes, np.float32), labels.astype(np.int32))


def render_depth(scene, Twc: np.ndarray, cam: CameraConfig,
                 plane_depth: float = 3.0) -> Tuple[np.ndarray, np.ndarray]:
    """Ray-cast depth + instance-id images from camera pose Twc (cam->world).

    Returns (depth [H, W] float32 z-depth, inst [H, W] int32 box index or -1
    for the background plane). Vectorized slab-test ray casting in NumPy.
    Accepts a BoxScene or (dispatching to render_scene) a ShapeScene.
    """
    if hasattr(scene, "kinds"):
        return render_scene(scene, Twc, cam)
    H, W = cam.height, cam.width
    ys, xs = np.mgrid[0:H, 0:W]
    dirs_c = np.stack([(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy,
                       np.ones_like(xs, np.float32)], axis=-1).reshape(-1, 3)
    R, o = Twc[:3, :3], Twc[:3, 3]
    dirs_w = dirs_c @ R.T
    # ground plane z_w = plane_depth (a wall in front of the camera)
    dz = dirs_w[:, 2]
    t_plane = np.where(np.abs(dz) > 1e-6, (plane_depth - o[2]) / dz, np.inf)
    t_plane = np.where(t_plane > 0, t_plane, np.inf)
    best_t = t_plane
    best_id = np.full(len(dirs_w), -1, np.int32)
    for b, box in enumerate(scene.boxes):
        lo, hi = box[:3], box[3:]
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - o) / dirs_w
            t2 = (hi - o) / dirs_w
        tmin = np.nanmax(np.minimum(t1, t2), axis=1)
        tmax = np.nanmin(np.maximum(t1, t2), axis=1)
        hit = (tmax >= tmin) & (tmax > 0)
        t_hit = np.where(tmin > 0, tmin, tmax)
        closer = hit & (t_hit < best_t) & (t_hit > 0)
        best_t = np.where(closer, t_hit, best_t)
        best_id = np.where(closer, b, best_id)
    # convert ray param to camera z-depth
    pts_w = o + best_t[:, None] * dirs_w
    Tcw = np.linalg.inv(Twc)
    z = (pts_w @ Tcw[:3, :3].T + Tcw[:3, 3])[:, 2]
    z = np.where(np.isfinite(best_t), z, 0.0)
    return (z.reshape(H, W).astype(np.float32),
            best_id.reshape(H, W).astype(np.int32))


def _cell_hash(i: np.ndarray, j: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic [0,1) value per integer cell (world-anchored texture)."""
    h = (i.astype(np.int64) * 73856093 + j.astype(np.int64) * 19349663
         + salt * 83492791) & 0xFFFFFFFF
    h = (h * 2654435761) & 0xFFFFFFFF
    h = h ^ (h >> 16)
    h = (h * 2246822519) & 0xFFFFFFFF
    return ((h >> 8) & 0xFFFF).astype(np.float64) / 65535.0


def render_ring_textured(Tcw: np.ndarray, cam: CameraConfig,
                         wall_radius: float = 4.5, seed: int = 0,
                         px_noise: float = 0.0, depth_noise: float = 0.0,
                         supersample: int = 2):
    """Antialiased wrapper over :func:`_render_ring_raw`: raycasts at
    ``supersample``× resolution and box-averages down. Point-sampling a
    discontinuous texture makes detected corners snap with sub-pixel phase
    as the camera moves — a systematic (not zero-mean) tracking bias; the
    box filter is the pinhole camera's pixel-integration physics."""
    if supersample <= 1:
        return _render_ring_raw(Tcw, cam, wall_radius, seed,
                                px_noise, depth_noise)
    ss = supersample
    import dataclasses as _dc
    fine = _dc.replace(cam, fx=cam.fx * ss, fy=cam.fy * ss,
                       cx=cam.cx * ss + (ss - 1) / 2.0,
                       cy=cam.cy * ss + (ss - 1) / 2.0,
                       width=cam.width * ss, height=cam.height * ss)
    gray_f, depth_f = _render_ring_raw(Tcw, fine, wall_radius, seed,
                                       0.0, 0.0)
    H, W = cam.height, cam.width
    gray = gray_f.reshape(H, ss, W, ss).mean(axis=(1, 3))
    depth = depth_f.reshape(H, ss, W, ss).mean(axis=(1, 3))
    rs = np.random.RandomState(seed)
    if px_noise > 0:
        gray = gray + rs.normal(0, px_noise, gray.shape)
    if depth_noise > 0:
        depth = depth * (1.0 + rs.normal(0, depth_noise, depth.shape))
    return (np.clip(gray, 0, 255).astype(np.float32),
            depth.astype(np.float32))


def _render_ring_raw(Tcw: np.ndarray, cam: CameraConfig,
                     wall_radius: float = 4.5, seed: int = 0,
                     px_noise: float = 0.0, depth_noise: float = 0.0):
    """Photometric render of the ring-corridor wall: analytic ray-cylinder
    intersection per pixel, with a multi-scale random-cell texture anchored
    to the wall's (arc-length, height) surface coordinates — so image
    corners are world-fixed and re-detectable across viewpoints. This is the
    substrate for the pixels-first north-star: the full ORB front end
    (pyramid, FAST, steered BRIEF) runs on these frames instead of
    ``observe``'s pre-made descriptors.

    Returns (gray [H, W] f32 in [0, 255], depth [H, W] f32 meters, z-depth
    convention matching the RGB-D backprojection in slam/tracking.py).
    """
    H, W = cam.height, cam.width
    Twc = np.linalg.inv(np.asarray(Tcw, np.float64))
    Rwc, c = Twc[:3, :3], Twc[:3, 3]
    u, v = np.meshgrid(np.arange(W), np.arange(H))
    x = (u - cam.cx) / cam.fx
    y = (v - cam.cy) / cam.fy
    dirs = np.stack([x, y, np.ones_like(x)], -1) @ Rwc.T      # [H, W, 3]
    # inside-out ray-cylinder: |c_xz + t d_xz|^2 = R^2, positive root.
    # Two passes: the nominal hit picks a relief cell, whose hashed radial
    # offset displaces the wall block in/out (±relief/2) and the ray is
    # re-intersected — a smooth cylinder is locally planar, which leaves
    # yaw-vs-lateral-translation near-unobservable and lets tracking drift
    # along that null direction; blocky 3D relief (and its depth edges) is
    # what real corridors provide.
    a = dirs[..., 0] ** 2 + dirs[..., 2] ** 2
    b = 2.0 * (c[0] * dirs[..., 0] + c[2] * dirs[..., 2])
    cxz2 = c[0] ** 2 + c[2] ** 2

    def _solve(R):
        disc = np.maximum(b * b - 4 * a * (cxz2 - R ** 2), 0.0)
        return (-b + np.sqrt(disc)) / np.maximum(2 * a, 1e-12)

    relief, cell_r = 0.4, 0.5
    t = _solve(np.float64(wall_radius))
    p = c + t[..., None] * dirs
    th0 = np.mod(np.arctan2(p[..., 0], p[..., 2]), 2 * np.pi)
    dR = relief * (_cell_hash(np.floor(th0 * wall_radius / cell_r),
                              np.floor(p[..., 1] / cell_r), 4) - 0.5)
    t = _solve(wall_radius + dR)                              # z-depth
    p = c + t[..., None] * dirs
    theta = np.mod(np.arctan2(p[..., 0], p[..., 2]), 2 * np.pi)
    s = theta * wall_radius                                   # arc length
    h = p[..., 1]
    gray = np.zeros((H, W))
    for wgt, cell, salt in ((0.45, 0.21, 1), (0.35, 0.09, 2), (0.20, 0.51, 3)):
        gray += wgt * _cell_hash(np.floor(s / cell), np.floor(h / cell), salt)
    gray = 40.0 + 170.0 * gray
    if px_noise > 0 or depth_noise > 0:
        rs = np.random.RandomState(seed)
        if px_noise > 0:
            gray = gray + rs.normal(0, px_noise, gray.shape)
    if depth_noise > 0:
        t = t * (1.0 + rs.normal(0, depth_noise, t.shape))
    return (np.clip(gray, 0, 255).astype(np.float32),
            t.astype(np.float32))


def render_rgb_from_inst(inst: np.ndarray, seed: int = 0) -> np.ndarray:
    """Flat-colored RGB uint8 render from an instance-id image (for display
    paths; the semantic engine consumes depth + masks, not textures)."""
    rs = np.random.RandomState(seed)
    colors = rs.randint(40, 255, size=(int(inst.max()) + 2, 3), dtype=np.uint8)
    return colors[inst + 1]


# ---------------------------------------------------------------------------
# Multi-shape textured scenes (Mask R-CNN training substrate)
#
# The reference trains nothing — it loads COCO weights into maskrcnn-benchmark
# (``src/MaskRCNN.py.in``). This environment has no datasets or weights, so
# the detector is *trained* on these procedurally-textured scenes: each COCO
# class id used by the synthetic world has a fixed, learnable appearance
# (base hue + world-anchored stripe/checker texture + analytic-normal
# shading), and scenes have clutter and occlusion.
# ---------------------------------------------------------------------------

BOX, SPHERE, CYLINDER = 0, 1, 2

# class id -> (base RGB 0..1, texture kind, texture frequency 1/m)
# texture kinds: 0 stripes-x, 1 stripes-y, 2 checker, 3 plain
CLASS_APPEARANCE = {
    41: (np.array([0.85, 0.25, 0.20]), 0, 40.0),   # cup: red, fine x-stripes
    57: (np.array([0.20, 0.65, 0.25]), 2, 25.0),   # chair: green checker
    63: (np.array([0.25, 0.35, 0.85]), 1, 30.0),   # laptop: blue y-stripes
    73: (np.array([0.85, 0.75, 0.20]), 3, 0.0),    # book: plain yellow
    75: (np.array([0.70, 0.25, 0.75]), 2, 50.0),   # vase: purple fine checker
}
SYNTH_CLASSES = tuple(sorted(CLASS_APPEARANCE))


class ShapeScene(NamedTuple):
    """Mixed primitive shapes over a background wall at z = plane_depth.

    kinds[b] selects the primitive; params[b] packs its geometry:
      BOX:      (xmin, ymin, zmin, xmax, ymax, zmax)
      SPHERE:   (cx, cy, cz, r, 0, 0)
      CYLINDER: (cx, cz, r, ymin, ymax, 0) — axis along world y
    """
    kinds: np.ndarray      # [B] int32
    params: np.ndarray     # [B, 6] float32
    labels: np.ndarray     # [B] int32 COCO class id
    plane_depth: float


def make_shape_scene(n_objects: int = 4, seed: int = 0,
                     plane_depth: Optional[float] = None) -> ShapeScene:
    rs = np.random.RandomState(seed)
    if plane_depth is None:
        plane_depth = float(rs.uniform(2.6, 3.4))
    kinds, params, labels = [], [], []
    for _ in range(n_objects):
        kind = int(rs.randint(0, 3))
        cx, cy = rs.uniform(-0.9, 0.9, 2)
        cz = rs.uniform(1.4, plane_depth - 0.3)
        if kind == BOX:
            sx, sy, sz = rs.uniform(0.18, 0.5, 3)
            p = [cx - sx / 2, cy - sy / 2, cz - sz / 2,
                 cx + sx / 2, cy + sy / 2, cz + sz / 2]
        elif kind == SPHERE:
            r = rs.uniform(0.10, 0.28)
            p = [cx, cy, cz, r, 0.0, 0.0]
        else:
            r = rs.uniform(0.08, 0.2)
            h = rs.uniform(0.2, 0.5)
            p = [cx, cz, r, cy - h / 2, cy + h / 2, 0.0]
        kinds.append(kind)
        params.append(p)
        labels.append(int(rs.choice(SYNTH_CLASSES)))
    return ShapeScene(np.asarray(kinds, np.int32),
                      np.asarray(params, np.float32),
                      np.asarray(labels, np.int32), plane_depth)


def _raycast_scene(scene: ShapeScene, Twc: np.ndarray, cam: CameraConfig):
    """Returns (t [N], inst [N], origin [3], dirs_w [N, 3]) flat arrays."""
    H, W = cam.height, cam.width
    ys, xs = np.mgrid[0:H, 0:W]
    dirs_c = np.stack([(xs - cam.cx) / cam.fx, (ys - cam.cy) / cam.fy,
                       np.ones_like(xs, np.float32)], axis=-1).reshape(-1, 3)
    R, o = Twc[:3, :3], Twc[:3, 3]
    d = dirs_c @ R.T
    dz = d[:, 2]
    t_plane = np.where(np.abs(dz) > 1e-6, (scene.plane_depth - o[2]) / dz,
                       np.inf)
    best_t = np.where(t_plane > 0, t_plane, np.inf)
    best_id = np.full(len(d), -1, np.int32)
    for b in range(len(scene.kinds)):
        kind, p = int(scene.kinds[b]), scene.params[b]
        if kind == BOX:
            lo, hi = p[:3], p[3:]
            with np.errstate(divide="ignore", invalid="ignore"):
                t1, t2 = (lo - o) / d, (hi - o) / d
            tmin = np.nanmax(np.minimum(t1, t2), axis=1)
            tmax = np.nanmin(np.maximum(t1, t2), axis=1)
            hit = (tmax >= tmin) & (tmax > 0)
            t_hit = np.where(tmin > 0, tmin, tmax)
        elif kind == SPHERE:
            c, r = p[:3], p[3]
            oc = o - c
            bq = np.sum(d * oc, axis=1)
            cq = np.sum(oc * oc) - r * r
            disc = bq * bq - np.sum(d * d, axis=1) * cq
            sq = np.sqrt(np.maximum(disc, 0.0))
            a2 = np.sum(d * d, axis=1)
            t0 = (-bq - sq) / a2
            t1s = (-bq + sq) / a2
            hit = disc > 0
            t_hit = np.where(t0 > 0, t0, t1s)
            hit &= t_hit > 0
        else:  # CYLINDER along world y
            cx, cz, r, ymin, ymax = p[0], p[1], p[2], p[3], p[4]
            dxz = np.stack([d[:, 0], d[:, 2]], -1)
            oxz = np.array([o[0] - cx, o[2] - cz])
            a = np.sum(dxz * dxz, axis=1)
            bq = np.sum(dxz * oxz, axis=1)
            cq = np.sum(oxz * oxz) - r * r
            disc = bq * bq - a * cq
            sq = np.sqrt(np.maximum(disc, 0.0))
            with np.errstate(divide="ignore", invalid="ignore"):
                t0 = (-bq - sq) / a
                t1s = (-bq + sq) / a
            y0 = o[1] + t0 * d[:, 1]
            y1 = o[1] + t1s * d[:, 1]
            ok0 = (disc > 0) & (t0 > 0) & (y0 >= ymin) & (y0 <= ymax)
            ok1 = (disc > 0) & (t1s > 0) & (y1 >= ymin) & (y1 <= ymax)
            # caps: intersect y = ymin/ymax planes inside the radius
            with np.errstate(divide="ignore", invalid="ignore"):
                tc0 = (ymin - o[1]) / d[:, 1]
                tc1 = (ymax - o[1]) / d[:, 1]
            def _cap_ok(tc):
                px = o[0] + tc * d[:, 0] - cx
                pz = o[2] + tc * d[:, 2] - cz
                return (tc > 0) & (px * px + pz * pz <= r * r)
            okc0, okc1 = _cap_ok(tc0), _cap_ok(tc1)
            t_hit = np.full(len(d), np.inf)
            for ok, tt in ((ok0, t0), (ok1, t1s), (okc0, tc0), (okc1, tc1)):
                t_hit = np.where(ok & (tt < t_hit), tt, t_hit)
            hit = np.isfinite(t_hit)
        closer = hit & (t_hit < best_t) & (t_hit > 0)
        best_t = np.where(closer, t_hit, best_t)
        best_id = np.where(closer, b, best_id)
    return best_t, best_id, o, d


def _scene_normals(scene: ShapeScene, pts: np.ndarray,
                   inst: np.ndarray) -> np.ndarray:
    """Analytic outward surface normals at hit points. [N, 3]."""
    n = np.zeros_like(pts)
    n[:, 2] = -1.0                                   # background wall
    for b in range(len(scene.kinds)):
        m = inst == b
        if not m.any():
            continue
        kind, p = int(scene.kinds[b]), scene.params[b]
        if kind == BOX:
            lo, hi = p[:3], p[3:]
            q = pts[m]
            dist = np.stack([q - lo, hi - q], -1).reshape(-1, 6)  # face dists
            face = np.argmin(np.abs(dist), axis=1)
            nb = np.zeros((len(q), 3))
            axis, side = face % 3, face // 3
            nb[np.arange(len(q)), axis] = np.where(side == 0, -1.0, 1.0)
            n[m] = nb
        elif kind == SPHERE:
            nb = pts[m] - p[:3]
            n[m] = nb / np.maximum(np.linalg.norm(nb, axis=1, keepdims=True),
                                   1e-9)
        else:
            cx, cz, r, ymin, ymax = p[0], p[1], p[2], p[3], p[4]
            q = pts[m]
            nb = np.stack([q[:, 0] - cx, np.zeros(len(q)), q[:, 2] - cz], -1)
            nb /= np.maximum(np.linalg.norm(nb, axis=1, keepdims=True), 1e-9)
            on_cap_lo = np.abs(q[:, 1] - ymin) < 1e-4
            on_cap_hi = np.abs(q[:, 1] - ymax) < 1e-4
            nb[on_cap_lo] = [0.0, -1.0, 0.0]
            nb[on_cap_hi] = [0.0, 1.0, 0.0]
            n[m] = nb
    return n


def render_scene(scene: ShapeScene, Twc: np.ndarray,
                 cam: CameraConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(depth [H, W] f32 camera z-depth, inst [H, W] i32 object-or--1)."""
    H, W = cam.height, cam.width
    t, inst, o, d = _raycast_scene(scene, Twc, cam)
    pts_w = o + t[:, None] * d
    Tcw = np.linalg.inv(Twc)
    z = (pts_w @ Tcw[:3, :3].T + Tcw[:3, 3])[:, 2]
    z = np.where(np.isfinite(t), z, 0.0)
    return (z.reshape(H, W).astype(np.float32),
            inst.reshape(H, W).astype(np.int32))


def render_rgb_textured(scene: ShapeScene, Twc: np.ndarray, cam: CameraConfig,
                        noise: float = 6.0, seed: int = 0) -> np.ndarray:
    """Deterministic textured render: per-class appearance (hue + world-
    anchored stripes/checker) modulated by analytic-normal Lambertian shading
    plus a headlight term. uint8 [H, W, 3]. The appearance is a pure function
    of the class id and world position — consistent across viewpoints, so a
    detector can learn it and the engine sees stable objects."""
    H, W = cam.height, cam.width
    t, inst, o, d = _raycast_scene(scene, Twc, cam)
    pts = o + t[:, None] * np.where(np.isfinite(t[:, None]), d, 0.0)
    pts = np.where(np.isfinite(pts), pts, 0.0)
    normals = _scene_normals(scene, pts, inst)

    # base color + texture per pixel
    color = np.empty((H * W, 3))
    checker = (np.floor(pts[:, 0] * 4) + np.floor(pts[:, 1] * 4)) % 2
    color[:] = (0.42 + 0.10 * checker)[:, None]      # background gray checker
    for b in range(len(scene.kinds)):
        m = inst == b
        if not m.any():
            continue
        base, kind, freq = CLASS_APPEARANCE[int(scene.labels[b])]
        q = pts[m]
        if kind == 0:
            tex = 0.5 + 0.5 * np.sin(q[:, 0] * freq)
        elif kind == 1:
            tex = 0.5 + 0.5 * np.sin(q[:, 1] * freq)
        elif kind == 2:
            tex = ((np.floor(q[:, 0] * freq / 6) +
                    np.floor(q[:, 1] * freq / 6)) % 2)
        else:
            tex = np.ones(len(q)) * 0.5
        color[m] = base[None, :] * (0.65 + 0.35 * tex)[:, None]

    light = np.array([0.35, -0.5, -0.79])
    light = light / np.linalg.norm(light)
    lam = np.clip(normals @ light, 0.0, 1.0)
    dn = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    head = np.clip(-(normals * dn).sum(1), 0.0, 1.0)
    shade = 0.35 + 0.4 * lam + 0.25 * head
    rgb = color * shade[:, None] * 255.0
    rs = np.random.RandomState(seed)
    rgb = rgb + rs.normal(0, noise, rgb.shape)
    return np.clip(rgb, 0, 255).astype(np.uint8).reshape(H, W, 3)


def detections_from_inst(inst: np.ndarray, labels: np.ndarray,
                         max_gt: int, min_pixels: int = 24):
    """inst-id image -> padded GT (boxes xyxy f32, labels i32, masks f32,
    valid bool) for detector training."""
    H, W = inst.shape
    boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros(max_gt, np.int32)
    masks = np.zeros((max_gt, H, W), np.float32)
    valid = np.zeros(max_gt, bool)
    g = 0
    for b in range(len(labels)):
        m = inst == b
        if m.sum() < min_pixels or g >= max_gt:
            continue
        ys, xs = np.nonzero(m)
        boxes[g] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        out_labels[g] = labels[b]
        masks[g] = m
        valid[g] = True
        g += 1
    return boxes, out_labels, masks, valid


def random_viewpoint(rs: np.random.RandomState, target=(0.0, 0.0, 2.0),
                     radius_range=(0.15, 0.6)) -> np.ndarray:
    """Random camera-to-world pose looking roughly at `target`."""
    r = rs.uniform(*radius_range)
    az = rs.uniform(-0.6, 0.6)
    el = rs.uniform(-0.35, 0.35)
    center = np.array([r * np.sin(az), r * np.sin(el),
                       -abs(r * np.cos(az) * np.cos(el)) * 0.3])
    tgt = np.asarray(target) + rs.uniform(-0.2, 0.2, 3) * [1, 1, 0]
    z = tgt - center
    z = z / np.linalg.norm(z)
    x = np.cross([0.0, 1.0, 0.0], z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Twc = np.eye(4)
    Twc[:3, :3] = np.stack([x, y, z], 1)
    Twc[:3, 3] = center
    return Twc.astype(np.float32)


def make_detection_dataset(n_images: int, cam: CameraConfig, max_gt: int = 8,
                           seed: int = 0, n_obj_range=(2, 6)):
    """Pre-rendered detector training set over random shape scenes.

    Returns a dict of stacked numpy arrays matching MaskRCNN.loss inputs:
    image [N,H,W,3] f32 0..255, gt_boxes [N,G,4] xyxy, gt_labels [N,G],
    gt_masks [N,G,H,W] f32, gt_valid [N,G] bool."""
    rs = np.random.RandomState(seed)
    H, W = cam.height, cam.width
    out = dict(image=np.zeros((n_images, H, W, 3), np.float32),
               gt_boxes=np.zeros((n_images, max_gt, 4), np.float32),
               gt_labels=np.zeros((n_images, max_gt), np.int32),
               gt_masks=np.zeros((n_images, max_gt, H, W), np.float32),
               gt_valid=np.zeros((n_images, max_gt), bool))
    for i in range(n_images):
        scene = make_shape_scene(int(rs.randint(*n_obj_range)),
                                 seed=int(rs.randint(1 << 30)))
        Twc = random_viewpoint(rs)
        _, inst = render_scene(scene, Twc, cam)
        rgb = render_rgb_textured(scene, Twc, cam,
                                  seed=int(rs.randint(1 << 30)))
        b, l, m, v = detections_from_inst(inst, scene.labels, max_gt)
        out["image"][i] = rgb
        out["gt_boxes"][i], out["gt_labels"][i] = b, l
        out["gt_masks"][i], out["gt_valid"][i] = m, v
    return out
