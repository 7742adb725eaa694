"""Object bank: the semantic world model as fixed-capacity SoA arrays.

Replaces the reference's ``Inventory ▸ Object ▸ ObjectPoint`` pointer web
(``src/Inventory.cpp``, ``src/Object.cpp``, ``src/ObjectPoint.cpp``) with one
pytree: B object slots × P point slots, every per-point rule a masked batched
op over the whole bank at once. Per-point state mirrors ObjectPoint exactly:
world position + foreground/background evidence accumulators
(``mnFp += score`` on mask agreement, ``mnBp += score`` on disagreement,
probability ``Fp/(Fp+Bp)``, bad ⇔ prob < threshold —
``src/ObjectPoint.cpp:190-219, 149-154``).

Kernel semantics preserved from the reference (with f32/raster equivalents):

  - projection/gating per point (``Engine.cpp:356-496`` TrackObjectPoints):
    world→cam, pixel = int-floor (cv::Point cast), in-image margin 5, z>0,
    1/range ∈ [1/maxDepth, 1/minDepth], the occlusion test *as written*
    (``p_m < 1/maxD && p_m > 1/minD && dp > 0.25`` — note: unsatisfiable for
    the reference configs, a preserved quirk), in-mask = eroded-mask lookup
    (pointPolygonTest dist > mnDist).
  - match rule c1 ∧ (c3 ∨ c4): inliers > MinPointCount ∧ (same label ∨
    object score > 1.1×det score); first object in creation order wins
    (``Engine.cpp:437-443``).
  - inlier counting uses only confidently-labeled points (isBad filter);
    the probability update loop intentionally does NOT filter
    (``Engine.cpp:380`` vs ``:448-483``).
  - densification (``Object.cpp:684-758`` AddSegment): per fused-segment
    pixel: depth gate, spacing gate vs existing projected points (occupancy
    dilation ≙ kd-tree nearest < mnRes; mnRes=0 in the reference configs ⇒
    no-op), undistort, backproject (RGBD d=range; lidar d=range/√(x²+y²+1)),
    world transform, fg=score.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from semantic_slam_tpu.config import EngineConfig
from semantic_slam_tpu.geometry.camera import Intrinsics, undistort_points
from semantic_slam_tpu.ops.maskops import dilate


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ObjectBank:
    obj_valid: jnp.ndarray    # [B] bool
    obj_label: jnp.ndarray    # [B] i32 category id
    obj_score: jnp.ndarray    # [B] f32 detection score
    obj_color: jnp.ndarray    # [B, 3] f32 display color
    obj_created: jnp.ndarray  # [B] i32 creation sequence (for first-match order)
    pt_xyz: jnp.ndarray       # [B, P, 3] world positions
    pt_valid: jnp.ndarray     # [B, P] bool
    pt_fg: jnp.ndarray        # [B, P] f32 foreground evidence
    pt_bg: jnp.ndarray        # [B, P] f32 background evidence
    pt_n: jnp.ndarray         # [B] i32 allocated points per object
    n_created: jnp.ndarray    # [] i32 total objects ever created

    @staticmethod
    def empty(max_objects: int, max_points: int, dtype=jnp.float32) -> "ObjectBank":
        B, P = max_objects, max_points
        return ObjectBank(
            obj_valid=jnp.zeros(B, bool),
            obj_label=jnp.full(B, -1, jnp.int32),
            obj_score=jnp.zeros(B, dtype),
            obj_color=jnp.zeros((B, 3), dtype),
            obj_created=jnp.full(B, 2 ** 30, jnp.int32),
            pt_xyz=jnp.zeros((B, P, 3), dtype),
            pt_valid=jnp.zeros((B, P), bool),
            pt_fg=jnp.zeros((B, P), dtype),
            pt_bg=jnp.zeros((B, P), dtype),
            pt_n=jnp.zeros(B, jnp.int32),
            n_created=jnp.asarray(0, jnp.int32),
        )


def point_prob(bank: ObjectBank) -> jnp.ndarray:
    """fg/(fg+bg) per point ([B, P]); 0 where no evidence."""
    s = bank.pt_fg + bank.pt_bg
    return jnp.where(s > 0, bank.pt_fg / jnp.maximum(s, 1e-12), 0.0)


class ProjGates(NamedTuple):
    uv_i: jnp.ndarray     # [B, P, 2] int32 pixel (floor, cv::Point cast)
    gate: jnp.ndarray     # [B, P] passes frustum/range/occlusion gates
    good: jnp.ndarray     # [B, P] gate & not isBad (prob >= threshold)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def project_gates(bank: ObjectBank, Tcw: jnp.ndarray, depth: jnp.ndarray,
                  intr: Intrinsics, prob_thd: jnp.ndarray,
                  min_depth: jnp.ndarray, max_depth: jnp.ndarray,
                  width: int = 640, height: int = 480) -> ProjGates:
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = jnp.einsum("ij,bpj->bpi", R, bank.pt_xyz) + t
    rng = jnp.linalg.norm(pc, axis=-1)
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = intr.fx * pc[..., 0] / zs + intr.cx
    v = intr.fy * pc[..., 1] / zs + intr.cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)
    in_img = ((u > 5) & (u < width - 5) & (v > 5) & (v < height - 5) & (z > 0))
    p_hat = 1.0 / jnp.maximum(rng, 1e-9)
    range_ok = (p_hat <= 1.0 / min_depth) & (p_hat >= 1.0 / max_depth)
    # occlusion test exactly as written in the reference (Engine.cpp:396-399)
    d_m = depth[jnp.clip(vi, 0, height - 1), jnp.clip(ui, 0, width - 1)]
    p_m = 1.0 / jnp.maximum(d_m, 1e-9)
    dp = jnp.sign(p_hat - p_m)
    occluded = (p_m < 1.0 / max_depth) & (p_m > 1.0 / min_depth) & (dp > 0.25)
    gate = bank.pt_valid & in_img & range_ok & ~occluded
    good = gate & (point_prob(bank) >= prob_thd)
    return ProjGates(uv_i=jnp.stack([ui, vi], -1), gate=gate, good=good)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def count_mask_inliers(gates: ProjGates, mask_eroded: jnp.ndarray,
                       width: int = 640, height: int = 480) -> jnp.ndarray:
    """Per-object count of confidently-labeled points inside the (eroded)
    detection mask — the c1 statistic (Engine.cpp:406-411)."""
    ui = jnp.clip(gates.uv_i[..., 0], 0, width - 1)
    vi = jnp.clip(gates.uv_i[..., 1], 0, height - 1)
    in_mask = mask_eroded[vi, ui]
    return jnp.sum(gates.good & in_mask, axis=-1).astype(jnp.int32)


@jax.jit
def match_decision(bank: ObjectBank, counts: jnp.ndarray, det_label: jnp.ndarray,
                   det_score: jnp.ndarray, min_point_count: jnp.ndarray,
                   score_margin: jnp.ndarray) -> jnp.ndarray:
    """Return the matched object slot (first in creation order) or -1.

    c1 ∧ (c3 ∨ c4) rule, Engine.cpp:437-443."""
    c1 = counts > min_point_count
    c3 = bank.obj_label == det_label
    c4 = bank.obj_score > score_margin * det_score
    match = bank.obj_valid & c1 & (c3 | c4)
    order = jnp.where(match, bank.obj_created, 2 ** 30)
    best = jnp.argmin(order)
    return jnp.where(jnp.any(match), best, -1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def update_probabilities(bank: ObjectBank, oidx: jnp.ndarray,
                         gates: ProjGates, mask_eroded: jnp.ndarray,
                         score: jnp.ndarray,
                         width: int = 640, height: int = 480) -> ObjectBank:
    """fg/bg evidence update for the matched object's points
    (Engine.cpp:448-483: all gated points, no isBad filter)."""
    ui = jnp.clip(gates.uv_i[..., 0], 0, width - 1)
    vi = jnp.clip(gates.uv_i[..., 1], 0, height - 1)
    in_mask = mask_eroded[vi, ui]
    is_obj = (jnp.arange(bank.pt_fg.shape[0]) == oidx)[:, None]
    upd = is_obj & gates.gate
    fg = bank.pt_fg + jnp.where(upd & in_mask, score, 0.0)
    bg = bank.pt_bg + jnp.where(upd & ~in_mask, score, 0.0)
    return dataclasses.replace(bank, pt_fg=fg, pt_bg=bg)


@jax.jit
def init_object(bank: ObjectBank, oidx: jnp.ndarray, label: jnp.ndarray,
                score: jnp.ndarray, color: jnp.ndarray) -> ObjectBank:
    """Allocate slot oidx for a new object (Object ctor + SetLabel/UpdateScore)."""
    B = bank.obj_valid.shape[0]
    onehot = jnp.arange(B) == oidx
    return dataclasses.replace(
        bank,
        obj_valid=jnp.where(onehot, True, bank.obj_valid),
        obj_label=jnp.where(onehot, label, bank.obj_label),
        obj_score=jnp.where(onehot, score, bank.obj_score),
        obj_color=jnp.where(onehot[:, None], color, bank.obj_color),
        obj_created=jnp.where(onehot, bank.n_created, bank.obj_created),
        pt_valid=jnp.where(onehot[:, None], False, bank.pt_valid),
        pt_fg=jnp.where(onehot[:, None], 0.0, bank.pt_fg),
        pt_bg=jnp.where(onehot[:, None], 0.0, bank.pt_bg),
        pt_n=jnp.where(onehot, 0, bank.pt_n),
        n_created=bank.n_created + 1,
    )


@jax.jit
def release_object(bank: ObjectBank, oidx: jnp.ndarray) -> ObjectBank:
    """Free a slot (the delete-if-not-enough-points path, Engine.cpp:247-250)."""
    B = bank.obj_valid.shape[0]
    onehot = jnp.arange(B) == oidx
    return dataclasses.replace(
        bank,
        obj_valid=jnp.where(onehot, False, bank.obj_valid),
        pt_valid=jnp.where(onehot[:, None], False, bank.pt_valid),
        pt_n=jnp.where(onehot, 0, bank.pt_n),
    )


@functools.partial(jax.jit,
                   static_argnames=("sensor", "res_radius", "max_new"))
def add_segment(bank: ObjectBank, oidx: jnp.ndarray, segment: jnp.ndarray,
                depth: jnp.ndarray, Tcw: jnp.ndarray, intr: Intrinsics,
                score: jnp.ndarray, gates: ProjGates,
                min_depth: jnp.ndarray, max_depth: jnp.ndarray,
                *, sensor: int = 2, res_radius: int = 0,
                max_new: int = 2048) -> ObjectBank:
    """Densify object oidx from the fused segment pixels (AddSegment).

    segment: [H, W] bool — fused DoN∧mask pixel set.
    gates:   projections of the object's *existing* points (for the spacing
             exclusion, Get2dFeatures + kd-tree check).
    """
    H, W = depth.shape
    B, P = bank.pt_valid.shape

    cand = segment & (depth > min_depth) & (depth < max_depth)

    if res_radius > 0:
        # occupancy of existing projected points of this object
        is_obj = (jnp.arange(B) == oidx)[:, None]
        occ_pts = gates.gate & is_obj
        ui = jnp.clip(gates.uv_i[..., 0], 0, W - 1)
        vi = jnp.clip(gates.uv_i[..., 1], 0, H - 1)
        occ = jnp.zeros((H, W), bool).at[vi.reshape(-1), ui.reshape(-1)].max(
            occ_pts.reshape(-1))
        cand = cand & ~dilate(occ, res_radius)

    # deterministic pseudo-random subset of up to max_new candidate pixels
    flat = cand.reshape(-1)
    idx = jnp.arange(H * W, dtype=jnp.uint32)
    prio = jnp.where(flat, (idx * jnp.uint32(2654435761)) >> 12, jnp.uint32(0))
    # ensure chosen pixels have prio > 0
    prio = jnp.where(flat, prio | jnp.uint32(1), jnp.uint32(0))
    k = min(max_new, H * W)
    topv, topi = jax.lax.top_k(prio.astype(jnp.float32), k)
    chosen = topv > 0
    py = (topi // W).astype(jnp.float32)
    px = (topi % W).astype(jnp.float32)
    uv = jnp.stack([px, py], -1)
    uv_und = undistort_points(intr, uv)
    rngv = depth.reshape(-1)[topi]
    x = (uv_und[:, 0] - intr.cx) / intr.fx
    y = (uv_und[:, 1] - intr.cy) / intr.fy
    if sensor == 1:
        d = rngv / jnp.sqrt(x * x + y * y + 1.0)
    else:
        d = rngv
    pc = jnp.stack([d * x, d * y, d], -1)
    Rcw = Tcw[:3, :3]
    tcw = Tcw[:3, 3]
    pw = jnp.einsum("ji,nj->ni", Rcw, pc - tcw)   # world = Rcwᵀ (pc - t)

    # write into slots pt_n[oidx] ... pt_n[oidx]+m  (capacity-clamped)
    base = bank.pt_n[oidx]
    pos = jnp.cumsum(chosen.astype(jnp.int32)) - 1
    slot = base + pos
    ok = chosen & (slot < P)
    slot_c = jnp.clip(slot, 0, P - 1)
    brow = jnp.full((k,), 0, jnp.int32) + oidx

    pt_xyz = bank.pt_xyz.at[brow, slot_c].set(
        jnp.where(ok[:, None], pw, bank.pt_xyz[brow, slot_c]))
    pt_valid = bank.pt_valid.at[brow, slot_c].max(ok)
    pt_fg = bank.pt_fg.at[brow, slot_c].set(
        jnp.where(ok, score, bank.pt_fg[brow, slot_c]))
    pt_bg = bank.pt_bg.at[brow, slot_c].set(
        jnp.where(ok, 0.0, bank.pt_bg[brow, slot_c]))
    n_new = jnp.sum(ok).astype(jnp.int32)
    pt_n = bank.pt_n.at[oidx].set(jnp.minimum(base + n_new, P))
    return dataclasses.replace(bank, pt_xyz=pt_xyz, pt_valid=pt_valid,
                               pt_fg=pt_fg, pt_bg=pt_bg, pt_n=pt_n)


def select_candidates(cand: jnp.ndarray, depth: jnp.ndarray,
                      Tcw: jnp.ndarray, intr: Intrinsics, *,
                      sensor: int = 2, max_new: int = 1024):
    """Deterministic pseudo-random subset of up to ``max_new`` candidate
    pixels, undistorted + backprojected to world (the AddSegment pixel loop
    body, Object.cpp:684-758). Returns (pw [k, 3] world, chosen [k] bool)."""
    H, W = depth.shape
    f32 = jnp.float32
    flat = cand.reshape(-1)
    idx = jnp.arange(H * W, dtype=jnp.uint32)
    prio = jnp.where(flat, (idx * jnp.uint32(2654435761)) >> 12,
                     jnp.uint32(0))
    prio = jnp.where(flat, prio | jnp.uint32(1), jnp.uint32(0))
    k = min(max_new, H * W)
    topv, topi = jax.lax.top_k(prio.astype(f32), k)
    chosen = topv > 0
    py = (topi // W).astype(f32)
    px = (topi % W).astype(f32)
    uv_und = undistort_points(intr, jnp.stack([px, py], -1))
    rngv = depth.reshape(-1)[topi]
    x = (uv_und[:, 0] - intr.cx) / intr.fx
    y = (uv_und[:, 1] - intr.cy) / intr.fy
    d = rngv / jnp.sqrt(x * x + y * y + 1.0) if sensor == 1 else rngv
    pc = jnp.stack([d * x, d * y, d], -1)
    pw = jnp.einsum("ji,nj->ni", Tcw[:3, :3], pc - Tcw[:3, 3])
    return pw, chosen


def assign_slots(obj_valid: jnp.ndarray, midx: jnp.ndarray,
                 active: jnp.ndarray, leader: jnp.ndarray = None):
    """Slot assignment for a flat sequence of masks: matched masks keep
    their object; unmatched active masks take ascending free slots in mask
    order (the host allocator's ``free[0]`` policy).

    leader (optional, [N] i32): intra-batch identity merge — an unmatched
    mask whose ``leader[i] < i`` does not allocate; it adopts the slot
    assigned to mask ``leader[i]`` (chunk mode: the same physical object
    seen from several keyframes of one chunk creates ONE object, as the
    sequential loop would). Default: every mask is its own leader.

    Returns (oidx [N] final slot or -1, has_slot [N] allocating-mask flags,
    new_rank [N] creation rank of allocating masks)."""
    i32 = jnp.int32
    B = obj_valid.shape[0]
    N = midx.shape[0]
    if leader is None:
        leader = jnp.arange(N, dtype=i32)
    is_new = active & (midx < 0)
    alloc = is_new & (leader == jnp.arange(N))
    free_sorted = jnp.nonzero(~obj_valid, size=B, fill_value=B - 1)[0]
    n_free = jnp.sum(~obj_valid).astype(i32)
    new_rank = jnp.cumsum(alloc.astype(i32)) - 1
    has_slot = alloc & (new_rank < n_free)
    assigned = jnp.where(has_slot,
                         free_sorted[jnp.clip(new_rank, 0, B - 1)], -1)
    # followers adopt their leader's assignment
    adopted = assigned[jnp.clip(leader, 0, N - 1)]
    assigned = jnp.where(alloc, assigned, jnp.where(is_new, adopted, -1))
    oidx = jnp.where(midx >= 0, midx, assigned).astype(i32)
    return oidx, has_slot, new_rank


def assign_densify_insert(bank1: ObjectBank, midx: jnp.ndarray,
                          active: jnp.ndarray, labels: jnp.ndarray,
                          scores: jnp.ndarray, pw_all: jnp.ndarray,
                          chosen_all: jnp.ndarray, color_table: jnp.ndarray,
                          min_point_count, leader: jnp.ndarray = None):
    """Phase B of the per-keyframe pass, over a FLAT mask sequence [N]
    (one keyframe's M masks, or a chunk's K*M masks in lexicographic
    (keyframe, mask) order): free-slot assignment, batched init_object,
    sequential densification fold, and the insert-or-delete rule
    (Engine.cpp:184-250). pw_all/chosen_all are the precomputed
    world-space densification candidates (pose- and depth-resolved by the
    caller, so the fold itself is keyframe-agnostic).

    Returns (bank, oidx [N], proc [N], has_slot [N], kept [N])."""
    B, P = bank1.pt_valid.shape
    N = midx.shape[0]
    f32, i32 = jnp.float32, jnp.int32
    k = chosen_all.shape[1]

    oidx_f, has_slot, new_rank = assign_slots(bank1.obj_valid, midx, active,
                                              leader)
    proc = active & (oidx_f >= 0)

    # ---- batched init_object for the new slots ---------------------------
    new_slot = jax.nn.one_hot(jnp.where(has_slot, oidx_f, B),
                              B, dtype=bool)                       # [N, B]
    any_new = jnp.any(new_slot, 0)                                 # [B]
    sel = new_slot.astype(f32)
    lab_new = jnp.einsum("mb,m->b", sel, labels.astype(f32)).astype(i32)
    sco_new = jnp.einsum("mb,m->b", sel, scores)
    seq_new = (bank1.n_created
               + jnp.einsum("mb,m->b", sel, new_rank.astype(f32)).astype(i32))
    bank1 = dataclasses.replace(
        bank1,
        obj_valid=bank1.obj_valid | any_new,
        obj_label=jnp.where(any_new, lab_new, bank1.obj_label),
        obj_score=jnp.where(any_new, sco_new, bank1.obj_score),
        obj_color=jnp.where(any_new[:, None], color_table, bank1.obj_color),
        obj_created=jnp.where(any_new, seq_new, bank1.obj_created),
        pt_valid=jnp.where(any_new[:, None], False, bank1.pt_valid),
        pt_fg=jnp.where(any_new[:, None], 0.0, bank1.pt_fg),
        pt_bg=jnp.where(any_new[:, None], 0.0, bank1.pt_bg),
        pt_n=jnp.where(any_new, 0, bank1.pt_n),
        n_created=bank1.n_created + jnp.sum(has_slot).astype(i32),
    )

    # ---- densification: writes sequential (two masks on one object append)
    def _densify_one(m, bk):
        oidx = jnp.clip(oidx_f[m], 0, B - 1)
        okm = chosen_all[m] & proc[m]
        base = bk.pt_n[oidx]
        pos = jnp.cumsum(okm.astype(i32)) - 1
        slot = base + pos
        ok = okm & (slot < P)
        slot_c = jnp.clip(slot, 0, P - 1)
        brow = jnp.full((k,), 0, i32) + oidx
        pt_xyz = bk.pt_xyz.at[brow, slot_c].set(
            jnp.where(ok[:, None], pw_all[m], bk.pt_xyz[brow, slot_c]))
        pt_valid = bk.pt_valid.at[brow, slot_c].max(ok)
        pt_fg = bk.pt_fg.at[brow, slot_c].set(
            jnp.where(ok, scores[m], bk.pt_fg[brow, slot_c]))
        pt_bg = bk.pt_bg.at[brow, slot_c].set(
            jnp.where(ok, 0.0, bk.pt_bg[brow, slot_c]))
        n_new = jnp.sum(ok).astype(i32)
        pt_n = bk.pt_n.at[oidx].set(jnp.minimum(base + n_new, P))
        return dataclasses.replace(bk, pt_xyz=pt_xyz, pt_valid=pt_valid,
                                   pt_fg=pt_fg, pt_bg=pt_bg, pt_n=pt_n)

    bank2 = jax.lax.fori_loop(0, N, _densify_one, bank1)

    # ---- insert-or-delete (HasEnoughObjectPoints) ------------------------
    kept = proc & (bank2.pt_n[jnp.clip(oidx_f, 0, B - 1)]
                   > min_point_count)                              # [N]
    rel_slot = jnp.any(new_slot & (has_slot & ~kept)[:, None], 0)  # [B]
    bank3 = dataclasses.replace(
        bank2,
        obj_valid=bank2.obj_valid & ~rel_slot,
        pt_valid=jnp.where(rel_slot[:, None], False, bank2.pt_valid),
        pt_n=jnp.where(rel_slot, 0, bank2.pt_n),
    )
    return bank3, oidx_f, proc, has_slot, kept


class KeyframeBatch(NamedTuple):
    """Device outputs of the fused per-keyframe mask pass (phase A)."""
    bank: ObjectBank       # probability-updated bank (matched masks applied)
    pack: jnp.ndarray      # [1 + B + M*11] f32 host pack (see keyframe_phase_a)
    masks_er: jnp.ndarray  # [M, H, W] bool eroded masks
    fused: jnp.ndarray     # [M, H, W] bool DoN∧mask fused segments
    gates: ProjGates       # snapshot projections (for add_segment spacing)


def _phase_a_core(bank: ObjectBank, Tcw: jnp.ndarray, depth: jnp.ndarray,
                  intr: Intrinsics, masks: jnp.ndarray, labels: jnp.ndarray,
                  scores: jnp.ndarray, det_valid: jnp.ndarray,
                  cluster_id: jnp.ndarray,
                  prob_thd: jnp.ndarray, min_depth: jnp.ndarray,
                  max_depth: jnp.ndarray, min_area: jnp.ndarray,
                  max_area: jnp.ndarray, min_point_count: jnp.ndarray,
                  score_margin: jnp.ndarray, overlap_thd: jnp.ndarray,
                  *, n_clusters_cap: int, erode_radius: int,
                  width: int, height: int):
    """Shared traced body of the per-keyframe mask pass: area gates, match
    decisions, fg/bg evidence sums, Hu/centroid, DoN∧mask fusion. Returns
    the raw pieces so phase-A-only and fused phase-A+B callers can pack
    them differently."""
    from semantic_slam_tpu.ops.maskops import (
        erode as _erode, hu_moments as _hu, mask_centroid as _cen)

    M = masks.shape[0]
    B, P = bank.pt_valid.shape
    f32 = jnp.float32

    masks_er = _erode(masks, radius=erode_radius)                # [M, H, W]
    areas = jnp.sum(masks, axis=(-2, -1)).astype(f32)
    area_ok = det_valid & (areas >= min_area) & (areas <= max_area)

    gates = project_gates(bank, Tcw, depth, intr, prob_thd,
                          min_depth, max_depth, width=width, height=height)
    ui = jnp.clip(gates.uv_i[..., 0], 0, width - 1)              # [B, P]
    vi = jnp.clip(gates.uv_i[..., 1], 0, height - 1)
    if M <= 32:
        # one gather of M bitplanes packed into int32 instead of M gathers
        # (arbitrary-index gathers are the slow op on TPU — pack the masks)
        shifts = jnp.arange(M, dtype=jnp.int32)[:, None, None]
        packed = jnp.sum(masks_er.astype(jnp.int32) << shifts, axis=0)
        ptbits = packed[vi, ui]                                  # [B, P] i32
        in_mask = ((ptbits[None] >> shifts) & 1).astype(bool)    # [M, B, P]
    else:
        in_mask = masks_er[:, vi, ui]

    counts = jnp.sum(gates.good[None] & in_mask, axis=-1)        # [M, B]
    c1 = counts > min_point_count
    c3 = bank.obj_label[None, :] == labels[:, None]
    c4 = bank.obj_score[None, :] > score_margin * scores[:, None]
    match = (bank.obj_valid[None] & c1 & (c3 | c4)
             & area_ok[:, None])                                 # [M, B]
    order = jnp.where(match, bank.obj_created[None], 2 ** 30)
    midx = jnp.where(jnp.any(match, -1),
                     jnp.argmin(order, -1), -1).astype(jnp.int32)  # [M]

    # fg/bg evidence for every matched mask, summed over masks
    # (Engine.cpp:448-483; all gated points, no isBad filter)
    matched_ob = jax.nn.one_hot(midx, B, dtype=bool) & (midx >= 0)[:, None]
    upd = matched_ob[:, :, None] & gates.gate[None]              # [M, B, P]
    fg_add = jnp.einsum("m,mbp->bp", scores,
                        (upd & in_mask).astype(f32))
    bg_add = jnp.einsum("m,mbp->bp", scores,
                        (upd & ~in_mask).astype(f32))

    hu = jax.vmap(_hu)(masks)                                    # [M, 7]
    cen = jax.vmap(_cen)(masks)                                  # [M, 2]

    # DoN∧mask fusion for all masks (fuse_segments batched over M)
    C = n_clusters_cap
    onehot = jax.nn.one_hot(cluster_id, C, dtype=f32)            # [H, W, C]
    total = jnp.sum(onehot, axis=(0, 1))                         # [C]
    inside = jnp.einsum("hwc,mhw->mc", onehot, masks_er.astype(f32))
    keep = inside / jnp.maximum(total, 1.0) > overlap_thd        # [M, C]
    keep_px = jnp.einsum("hwc,mc->mhw", onehot, keep.astype(f32)) > 0
    fused = keep_px & masks_er

    return (masks_er, area_ok, gates, midx, fg_add, bg_add, hu, cen, fused)


@functools.partial(jax.jit, static_argnames=("n_clusters_cap", "erode_radius",
                                             "width", "height"))
def keyframe_phase_a(bank: ObjectBank, Tcw: jnp.ndarray, depth: jnp.ndarray,
                     intr: Intrinsics, masks: jnp.ndarray, labels: jnp.ndarray,
                     scores: jnp.ndarray, det_valid: jnp.ndarray,
                     cluster_id: jnp.ndarray, n_clusters: jnp.ndarray,
                     prob_thd: jnp.ndarray, min_depth: jnp.ndarray,
                     max_depth: jnp.ndarray, min_area: jnp.ndarray,
                     max_area: jnp.ndarray, min_point_count: jnp.ndarray,
                     score_margin: jnp.ndarray, overlap_thd: jnp.ndarray,
                     *, n_clusters_cap: int, erode_radius: int,
                     width: int = 640, height: int = 480) -> KeyframeBatch:
    """ALL masks of one keyframe against the bank snapshot, in ONE program.

    The reference's per-mask loop is ``#pragma omp parallel for``
    (Engine.cpp:170-172): every mask races against the keyframe-start object
    state, so snapshot semantics — every mask matched/updated against the
    bank as of keyframe entry — is the faithful (and deterministic)
    batching. Per mask: area gate, erosion, inlier counting (c1), the
    c1∧(c3∨c4) match decision, fg/bg probability updates for matched
    objects (applied summed over masks), Hu moments + centroid, DoN∧mask
    fusion. Everything the sequential host loop read back one scalar at a
    time (~30 ms each through a remote transport) is packed into ONE f32
    vector:

      pack[0]              n_clusters (forwarded — saves its own readback)
      pack[1 : 1+B]        bank.obj_valid (0/1) — free-slot map for host alloc
      pack[1+B :]          M rows × 11: [midx, area_ok, hu0..hu6, cx, cy]
    """
    f32 = jnp.float32
    (masks_er, area_ok, gates, midx, fg_add, bg_add, hu, cen,
     fused) = _phase_a_core(
        bank, Tcw, depth, intr, masks, labels, scores, det_valid, cluster_id,
        prob_thd, min_depth, max_depth, min_area, max_area, min_point_count,
        score_margin, overlap_thd, n_clusters_cap=n_clusters_cap,
        erode_radius=erode_radius, width=width, height=height)
    new_bank = dataclasses.replace(bank, pt_fg=bank.pt_fg + fg_add,
                                   pt_bg=bank.pt_bg + bg_add)
    rows = jnp.concatenate([
        midx.astype(f32)[:, None], area_ok.astype(f32)[:, None],
        hu.astype(f32), cen.astype(f32)], axis=1)                # [M, 11]
    pack = jnp.concatenate([
        n_clusters.reshape(1).astype(f32),
        bank.obj_valid.astype(f32),
        rows.reshape(-1)])
    return KeyframeBatch(bank=new_bank, pack=pack, masks_er=masks_er,
                         fused=fused, gates=gates)


class KeyframeBatchAB(NamedTuple):
    """Device outputs of the FULLY fused per-keyframe pass (phase A + B)."""
    bank: ObjectBank       # final bank: matched+created+densified+culled
    pack: jnp.ndarray      # [1 + M*13] f32 host pack (see keyframe_phase_ab)
    fused: jnp.ndarray     # [M, H, W] bool DoN∧mask fused segments


@functools.partial(jax.jit, static_argnames=(
    "n_clusters_cap", "erode_radius", "width", "height", "sensor",
    "res_radius", "max_new", "masks_packed"))
def keyframe_phase_ab(bank: ObjectBank, Tcw: jnp.ndarray, depth: jnp.ndarray,
                      intr: Intrinsics, masks: jnp.ndarray,
                      labels: jnp.ndarray, scores: jnp.ndarray,
                      det_valid: jnp.ndarray, cluster_id: jnp.ndarray,
                      n_clusters: jnp.ndarray, color_table: jnp.ndarray,
                      prob_thd: jnp.ndarray, min_depth: jnp.ndarray,
                      max_depth: jnp.ndarray, min_area: jnp.ndarray,
                      max_area: jnp.ndarray, min_point_count: jnp.ndarray,
                      score_margin: jnp.ndarray, overlap_thd: jnp.ndarray,
                      *, n_clusters_cap: int, erode_radius: int,
                      width: int = 640, height: int = 480, sensor: int = 2,
                      res_radius: int = 0, max_new: int = 1024,
                      masks_packed: bool = False) -> KeyframeBatchAB:
    """The WHOLE per-keyframe engine pass in one compiled program.

    Extends ``keyframe_phase_a`` with everything the host loop used to
    dispatch per mask (Engine.cpp:170-265's body): free-slot assignment for
    unmatched masks (ascending free slots in mask order — exactly the host's
    ``free[0]`` policy), batched ``init_object``, sequential densification
    (``lax.fori_loop`` over masks so two masks hitting the same object
    append, not overwrite), and the insert-or-delete rule
    (HasEnoughObjectPoints, Engine.cpp:247-250). The host does ONE readback
    per keyframe:

      pack[0]    n_clusters
      pack[1:]   M rows × 13: [oidx, processed, is_new, kept,
                               hu0..hu6, cx, cy]

    ``oidx`` is the final slot (matched or newly assigned), ``processed``
    means the mask passed the gates and got a slot, ``kept`` the
    insert-or-delete outcome (drives host-side Inventory bookkeeping).
    color_table: [B, 3] precomputed per-slot display colors (host RNG
    parity).

    Early-return parity: the host applied NOTHING when the DoN pass found
    zero clusters (Engine.cpp:145-148 path); every write below is gated on
    ``n_clusters > 0``.
    """
    from semantic_slam_tpu.ops.maskops import dilate as _dilate

    if masks_packed:
        # masks arrive bit-packed [M, H, ceil(W/8)] u8 (np.packbits,
        # MSB-first): 8x fewer host->device bytes — the mask upload was the
        # largest per-keyframe transfer (2.46 MB -> 0.31 MB at VGA).
        shifts = jnp.arange(7, -1, -1, dtype=jnp.int32)
        bits = (masks.astype(jnp.int32)[..., None] >> shifts) & 1
        masks = bits.reshape(masks.shape[0], masks.shape[1],
                             -1)[:, :, :width].astype(bool)
    M = masks.shape[0]
    B, P = bank.pt_valid.shape
    f32, i32 = jnp.float32, jnp.int32

    (masks_er, area_ok, gates, midx, fg_add, bg_add, hu, cen,
     fused) = _phase_a_core(
        bank, Tcw, depth, intr, masks, labels, scores, det_valid, cluster_id,
        prob_thd, min_depth, max_depth, min_area, max_area, min_point_count,
        score_margin, overlap_thd, n_clusters_cap=n_clusters_cap,
        erode_radius=erode_radius, width=width, height=height)

    have = n_clusters > 0
    gate_f = have.astype(f32)
    bank1 = dataclasses.replace(bank, pt_fg=bank.pt_fg + gate_f * fg_add,
                                pt_bg=bank.pt_bg + gate_f * bg_add)

    # ---- densification candidates (batched per mask) ---------------------
    def _select(fused_m, oidx_m):
        cand = fused_m & (depth > min_depth) & (depth < max_depth)
        if res_radius > 0:
            is_obj = (jnp.arange(B) == oidx_m)[:, None]
            occ_pts = gates.gate & is_obj
            oui = jnp.clip(gates.uv_i[..., 0], 0, width - 1)
            ovi = jnp.clip(gates.uv_i[..., 1], 0, height - 1)
            occ = jnp.zeros((height, width), bool).at[
                ovi.reshape(-1), oui.reshape(-1)].max(occ_pts.reshape(-1))
            cand = cand & ~_dilate(occ, res_radius)
        return select_candidates(cand, depth, Tcw, intr, sensor=sensor,
                                 max_new=max_new)

    if res_radius > 0:
        # oidx is needed for the spacing exclusion; compute assignment first
        active0 = area_ok & have
        oidx_pre, _, _ = assign_slots(bank.obj_valid, midx, active0)
        pw_all, chosen_all = jax.vmap(_select)(fused, oidx_pre)
    else:
        pw_all, chosen_all = jax.vmap(_select)(fused, jnp.zeros(M, i32))

    bank3, oidx_f, proc, has_slot, kept = assign_densify_insert(
        bank1, midx, area_ok & have, labels, scores, pw_all, chosen_all,
        color_table, min_point_count)

    rows = jnp.concatenate([
        oidx_f.astype(f32)[:, None], proc.astype(f32)[:, None],
        has_slot.astype(f32)[:, None], kept.astype(f32)[:, None],
        hu.astype(f32), cen.astype(f32)], axis=1)                  # [M, 13]
    pack = jnp.concatenate([n_clusters.reshape(1).astype(f32),
                            rows.reshape(-1)])
    return KeyframeBatchAB(bank=bank3, pack=pack, fused=fused)


def chunk_perkf(bank: ObjectBank, Tcw: jnp.ndarray, depth: jnp.ndarray,
                intr: Intrinsics, masks: jnp.ndarray, labels: jnp.ndarray,
                scores: jnp.ndarray, det_valid: jnp.ndarray,
                cluster_id: jnp.ndarray, n_clusters: jnp.ndarray,
                prob_thd, min_depth, max_depth, min_area, max_area,
                min_point_count, score_margin, overlap_thd, *,
                n_clusters_cap: int, erode_radius: int, width: int,
                height: int, sensor: int, max_new: int):
    """Per-keyframe half of the CHUNK pass: everything that depends only on
    the chunk-entry bank snapshot and this keyframe's pixels — phase A
    (match decisions, fg/bg evidence, Hu/centroid, DoN∧mask fusion) plus
    densification-candidate selection. This is the embarrassingly-parallel
    part that shards over keyframes (SURVEY §2.3 DP row); the bank fold
    (chunk_fold) is the only order-dependent remainder."""
    (masks_er, area_ok, gates, midx, fg_add, bg_add, hu, cen,
     fused) = _phase_a_core(
        bank, Tcw, depth, intr, masks, labels, scores, det_valid, cluster_id,
        prob_thd, min_depth, max_depth, min_area, max_area, min_point_count,
        score_margin, overlap_thd, n_clusters_cap=n_clusters_cap,
        erode_radius=erode_radius, width=width, height=height)
    have = n_clusters > 0
    gate_f = have.astype(jnp.float32)

    def _select(fused_m):
        cand = fused_m & (depth > min_depth) & (depth < max_depth)
        return select_candidates(cand, depth, Tcw, intr, sensor=sensor,
                                 max_new=max_new)

    pw, chosen = jax.vmap(_select)(fused)
    return dict(midx=midx, active=area_ok & have, fg_add=gate_f * fg_add,
                bg_add=gate_f * bg_add, hu=hu, cen=cen, pw=pw,
                chosen=chosen, n_clusters=n_clusters)


def chunk_fold(bank: ObjectBank, fg_sum: jnp.ndarray, bg_sum: jnp.ndarray,
               midx: jnp.ndarray, active: jnp.ndarray, labels: jnp.ndarray,
               scores: jnp.ndarray, pw: jnp.ndarray, chosen: jnp.ndarray,
               hu: jnp.ndarray, cen: jnp.ndarray, n_clusters: jnp.ndarray,
               color_table: jnp.ndarray, min_point_count):
    """Replicated fold of a chunk's per-keyframe outputs: evidence sums
    applied once, then the FLAT (keyframe, mask)-lexicographic slot
    assignment / init / sequential densify / insert-or-delete — identical
    arithmetic regardless of how the per-keyframe half was sharded.

    midx/active/labels/scores [K, M], pw [K, M, k, 3], chosen [K, M, k].
    Returns (bank, packs [K, 1 + M*13]) — per-keyframe packs with the same
    row layout as keyframe_phase_ab."""
    K, M = midx.shape
    f32 = jnp.float32
    bank1 = dataclasses.replace(bank, pt_fg=bank.pt_fg + fg_sum,
                                pt_bg=bank.pt_bg + bg_sum)
    flat = lambda a: a.reshape((K * M,) + a.shape[2:])
    N = K * M
    midx_f, active_f = flat(midx), flat(active)
    labels_f, scores_f = flat(labels), flat(scores)
    pw_f, chosen_f = flat(pw), flat(chosen)

    # ---- intra-chunk identity merge --------------------------------------
    # The sequential engine would MATCH keyframe k+1's mask to the object
    # keyframe k just created; under chunk-snapshot semantics both look
    # unmatched. Deterministic merge rule: an unmatched mask adopts the
    # earliest unmatched mask (flat order) with the same label whose
    # densification-candidate centroid lies within 0.25 m — the same
    # physical object seen from several chunk keyframes creates ONE object.
    cnt = jnp.sum(chosen_f, -1).astype(f32)                       # [N]
    cen3 = (jnp.sum(pw_f * chosen_f[..., None], 1)
            / jnp.maximum(cnt, 1.0)[:, None])                     # [N, 3]
    is_new = active_f & (midx_f < 0) & (cnt > 0)
    d2 = jnp.sum((cen3[:, None, :] - cen3[None, :, :]) ** 2, -1)  # [N, N]
    compat = (is_new[:, None] & is_new[None, :]
              & (labels_f[:, None] == labels_f[None, :])
              & (d2 < 0.25 ** 2))
    iota = jnp.arange(N)
    first = jnp.min(jnp.where(compat, iota[None, :], N), axis=1)  # [N]
    leader = jnp.where(is_new, jnp.minimum(first, iota), iota)
    # flatten leader chains (a→b→c): two hops cover the centroid-graph
    # diameter at this radius; any residue self-resolves (leader==itself)
    leader = leader[leader]
    leader = leader[leader].astype(jnp.int32)

    bank3, oidx_f, proc, has_slot, kept = assign_densify_insert(
        bank1, midx_f, active_f, labels_f, scores_f,
        pw_f, chosen_f, color_table, min_point_count, leader)
    rows = jnp.concatenate([
        oidx_f.astype(f32)[:, None], proc.astype(f32)[:, None],
        has_slot.astype(f32)[:, None], kept.astype(f32)[:, None],
        flat(hu).astype(f32), flat(cen).astype(f32)], axis=1)   # [K*M, 13]
    packs = jnp.concatenate([
        n_clusters.reshape(K, 1).astype(f32),
        rows.reshape(K, M * 13)], axis=1)                       # [K, 1+M*13]
    return bank3, packs


@functools.partial(jax.jit, static_argnames=(
    "n_clusters_cap", "erode_radius", "width", "height", "sensor",
    "max_new"))
def keyframe_chunk_phase(bank: ObjectBank, Tcws: jnp.ndarray,
                         depths: jnp.ndarray, intr: Intrinsics,
                         masks: jnp.ndarray, labels: jnp.ndarray,
                         scores: jnp.ndarray, det_valid: jnp.ndarray,
                         cluster_ids: jnp.ndarray, n_clusters: jnp.ndarray,
                         color_table: jnp.ndarray, prob_thd, min_depth,
                         max_depth, min_area, max_area, min_point_count,
                         score_margin, overlap_thd, *, n_clusters_cap: int,
                         erode_radius: int, width: int = 640,
                         height: int = 480, sensor: int = 2,
                         max_new: int = 1024):
    """A CHUNK of K keyframes through the engine pass in one program, with
    chunk-snapshot semantics: every keyframe's masks match/update against
    the bank as of CHUNK entry — the same faithful batching the per-mask
    pass applies within one keyframe (the reference's per-mask OpenMP loop,
    Engine.cpp:170-172, races against keyframe-entry state; here the racing
    axis widens to a bounded keyframe chunk). Object creation and
    densification stay sequential in (keyframe, mask) order inside the fold,
    so results are deterministic and independent of HOW the per-keyframe
    half is executed — vmapped here, or sharded over a device mesh in
    ``parallel.stage2.keyframe_chunk_sharded`` (bit-identical discrete
    outcomes; float evidence sums differ only by reduction order).

    Tcws [K, 4, 4], depths [K, H, W], masks [K, M, H, W] bool, labels/
    scores/det_valid [K, M], cluster_ids [K, H, W], n_clusters [K].
    Returns (bank, packs [K, 1 + M*13]).
    """
    per = jax.vmap(lambda T, d, m, l, s, v, c, n: chunk_perkf(
        bank, T, d, intr, m, l, s, v, c, n, prob_thd, min_depth, max_depth,
        min_area, max_area, min_point_count, score_margin, overlap_thd,
        n_clusters_cap=n_clusters_cap, erode_radius=erode_radius,
        width=width, height=height, sensor=sensor, max_new=max_new))(
        Tcws, depths, masks, labels, scores, det_valid, cluster_ids,
        n_clusters)
    fg_sum = jnp.sum(per["fg_add"], 0)
    bg_sum = jnp.sum(per["bg_add"], 0)
    return chunk_fold(bank, fg_sum, bg_sum, per["midx"], per["active"],
                      labels, scores, per["pw"], per["chosen"], per["hu"],
                      per["cen"], n_clusters, color_table, min_point_count)


@functools.partial(jax.jit, static_argnames=("n_clusters_cap",))
def fuse_segments(cluster_id: jnp.ndarray, n_clusters_cap: int,
                  mask_eroded: jnp.ndarray, overlap_thd: jnp.ndarray) -> jnp.ndarray:
    """DoN-cluster ∧ mask fusion (Engine.cpp:300-338 fuse_segments).

    cluster_id: [H, W] int32 in [-1, C); for each cluster, keep its inside-
    mask pixels iff |inside| / |cluster| > overlap threshold. Returns the
    union [H, W] bool."""
    C = n_clusters_cap
    onehot = jax.nn.one_hot(cluster_id, C, dtype=jnp.float32)      # [H, W, C]
    total = jnp.sum(onehot, axis=(0, 1))                           # [C]
    inside = jnp.sum(onehot * mask_eroded[..., None], axis=(0, 1)) # [C]
    overlap = inside / jnp.maximum(total, 1.0)
    keep = overlap > overlap_thd                                   # [C]
    keep_px = jnp.einsum("hwc,c->hw", onehot, keep.astype(jnp.float32)) > 0
    return keep_px & mask_eroded
