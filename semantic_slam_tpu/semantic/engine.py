"""Semantic engine: the per-keyframe object-labeling loop.

Replaces the reference ``Engine`` (``src/Engine.cpp:105-294`` Run): per
keyframe — DoN geometric clusters, instance detections, then per detection
mask: area gate → track-or-create object (point-projection matching) →
fg/bg probability updates → DoN∧mask fusion → point densification →
inventory insert-or-delete. The per-mask loop stays sequential on the host
(an object created by mask i is trackable by mask i+1, as in the reference);
every step inside it is a jitted batched kernel over the whole object bank.

Timing stats per stage mirror the reference's step1..step6 averages
(``Engine.cpp:153-290``).
"""

from __future__ import annotations

import math
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import SlamConfig
from semantic_slam_tpu.geometry.camera import Intrinsics
from semantic_slam_tpu.ops.maskops import (
    hu_moments, mask_centroid, match_shapes_i1)
from semantic_slam_tpu.semantic import objects as O
from semantic_slam_tpu.semantic.don import DoN
from semantic_slam_tpu.semantic.detector import Detections
from semantic_slam_tpu.semantic.inventory import Inventory


class Engine:
    """Per-keyframe semantic labeling engine."""

    def __init__(self, categories: Dict[int, str], cfg: SlamConfig,
                 detector=None, viewer=None, enable_tsdf: bool = False):
        self.cfg = cfg
        self.categories = categories
        self.intr = Intrinsics.from_config(cfg.camera)
        self.detector = detector
        self.don = DoN(cfg.don, self.intr, sensor=cfg.engine.sensor)
        self.inventory = Inventory(cfg)
        self.viewer = viewer
        e = cfg.engine
        self.bank = O.ObjectBank.empty(e.max_objects, e.max_points_per_object)
        self._erode_r = max(1, int(math.ceil(e.dist)))
        self._res_r = int(math.ceil(e.res))
        # per-slot display colors, precomputed once (same RNG stream the
        # host allocator used, so saved PLY colors are unchanged)
        self._color_table = jnp.asarray(np.stack(
            [np.random.RandomState(o + 7).uniform(0.2, 1.0, 3)
             for o in range(e.max_objects)]), jnp.float32)
        # per-object TSDF reconstruction (the reference plumbs this but ships
        # it disabled — Engine.cpp:221-233, Object.cpp:66-68; here it's an
        # opt-in working path over the blocked kernel)
        self.enable_tsdf = enable_tsdf
        self.tsdf_vols: Dict[int, object] = {}
        self.timing: Dict[str, List[float]] = {
            k: [] for k in ("don", "detect", "track", "create", "densify",
                            "insert", "tsdf", "readback")}
        # deferred Inventory bookkeeping: the fused per-keyframe program's
        # pack is only needed on the HOST (observation records), never by
        # the next keyframe's device work — so packs queue as device arrays
        # and materialize lazily. Mirrors the reference's decoupling of
        # Engine::Run from its viewer/inventory consumers.
        self._pending: List[tuple] = []
        self._max_pending = 32

    # ------------------------------------------------------------------

    def run(self, rgb: Optional[np.ndarray], depth: np.ndarray, kf_id: int,
            Tcw: np.ndarray, detections: Optional[Detections] = None):
        """Process one keyframe (Engine::Run parity).

        detections may be given directly (stage-2 drivers with an oracle or a
        precomputed model pass); otherwise self.detector.predict(rgb) runs.

        The ENTIRE per-keyframe mask pass — match decisions, probability
        updates, free-slot assignment, object creation, densification, and
        the insert-or-delete rule — runs as ONE fused device program
        (objects.keyframe_phase_ab), the faithful batching of the
        reference's ``#pragma omp parallel for`` mask loop
        (Engine.cpp:170-265). The host needs the program's packed output
        only for Inventory bookkeeping — never for the next keyframe's
        device work — so the pack queues as a device array and materializes
        lazily (``flush``): keyframes stream through the dispatch pipeline
        with ZERO blocking readbacks on the hot path.
        """
        e = self.cfg.engine
        depth_j = jnp.asarray(depth, jnp.float32)
        Tcw_j = jnp.asarray(Tcw, jnp.float32)

        t0 = time.perf_counter()
        don_res = self.don.extract(depth_j)
        self.timing["don"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        if detections is None:
            detections = self.detector.predict(rgb)
        self.timing["detect"].append(time.perf_counter() - t0)

        det_valid = np.asarray(detections.valid)
        n_masks = int(det_valid.sum())
        if n_masks == 0:
            # Engine.cpp:145-148 warning path
            return

        # ---- one fused program, one readback ------------------------------
        t0 = time.perf_counter()
        if isinstance(detections.masks, jax.Array):
            # detector fast path: masks are already device-resident bool —
            # no host download / packbits / re-upload round trip
            masks_arg = detections.masks & jnp.asarray(det_valid)[:, None, None]
            packed = False
        else:
            masks_np = np.asarray(detections.masks)
            masks_arg = jnp.asarray(
                np.packbits(masks_np.astype(bool), axis=-1))
            packed = True
        batch = O.keyframe_phase_ab(
            self.bank, Tcw_j, depth_j, self.intr,
            masks_arg,
            jnp.asarray(np.asarray(detections.labels), jnp.int32),
            jnp.asarray(np.asarray(detections.scores), jnp.float32),
            jnp.asarray(det_valid),
            don_res.cluster_id, don_res.n_clusters, self._color_table,
            jnp.float32(e.prob_thd), jnp.float32(e.min_depth),
            jnp.float32(e.max_depth), jnp.float32(e.min_area),
            jnp.float32(e.max_area), jnp.int32(e.min_point_count),
            jnp.float32(e.score_margin), jnp.float32(e.overlap),
            n_clusters_cap=self.cfg.don.max_clusters,
            erode_radius=self._erode_r,
            width=self.cfg.camera.width, height=self.cfg.camera.height,
            sensor=e.sensor, res_radius=self._res_r, max_new=1024,
            masks_packed=packed)
        self.bank = batch.bank
        self._pending.append((batch.pack, detections, kf_id,
                              np.asarray(Tcw), depth_j, Tcw_j))
        self.timing["track"].append(time.perf_counter() - t0)
        # the viewer reads the inventory now; otherwise let keyframes stream
        # and flush lazily (per-object TSDF work is deferred too — the
        # integrates dispatch in a burst at flush time, after the ONE
        # batched pack readback resolves the slot ids)
        if (self.viewer is not None
                or len(self._pending) >= self._max_pending):
            self.flush()

        if self.viewer is not None:
            self.viewer.update(self.bank, Tcw)

    def run_chunk(self, frames, mesh=None):
        """Process a CHUNK of keyframes in one fused device program
        (chunk-snapshot semantics — see ``objects.keyframe_chunk_phase``),
        optionally sharding the per-keyframe perception work over a device
        ``mesh`` (keyframe data parallelism, SURVEY §2.3; the reference's
        per-keyframe loop ``examples/label_instance_rgbd.cpp:77-110`` is
        its sequential ancestor).

        frames: list of (kf_id, depth [H, W] np, Tcw [4, 4] np,
        Detections). With a mesh, len(frames) must divide by the mesh's
        ``data`` axis.
        """
        if not frames:
            return
        e = self.cfg.engine
        K = len(frames)
        t0 = time.perf_counter()
        depths = jnp.stack([jnp.asarray(d, jnp.float32)
                            for _, d, _, _ in frames])
        Tcws = jnp.stack([jnp.asarray(T, jnp.float32)
                          for _, _, T, _ in frames])
        dres = [self.don.extract(depths[i]) for i in range(K)]
        cluster_ids = jnp.stack([r.cluster_id for r in dres])
        n_clusters = jnp.stack([r.n_clusters for r in dres])
        self.timing["don"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        masks = jnp.stack([
            dets.masks if isinstance(dets.masks, jax.Array)
            else jnp.asarray(np.asarray(dets.masks, bool))
            for _, _, _, dets in frames])                 # [K, M, H, W]
        labels = jnp.asarray(np.stack([np.asarray(d.labels)
                                       for _, _, _, d in frames]), jnp.int32)
        scores = jnp.asarray(np.stack([np.asarray(d.scores)
                                       for _, _, _, d in frames]), jnp.float32)
        det_valid = jnp.asarray(np.stack([np.asarray(d.valid)
                                          for _, _, _, d in frames]))
        masks = masks & det_valid[:, :, None, None]
        statics = dict(n_clusters_cap=self.cfg.don.max_clusters,
                       erode_radius=self._erode_r,
                       width=self.cfg.camera.width,
                       height=self.cfg.camera.height,
                       sensor=e.sensor, max_new=1024)
        if mesh is not None:
            from semantic_slam_tpu.parallel import stage2
            bank, packs = stage2.keyframe_chunk_sharded(
                mesh, self.bank, Tcws, depths, masks, labels, scores,
                det_valid, cluster_ids, n_clusters, self._color_table,
                self.intr,
                (float(e.prob_thd), float(e.min_depth), float(e.max_depth),
                 float(e.min_area), float(e.max_area),
                 int(e.min_point_count), float(e.score_margin),
                 float(e.overlap)), **statics)
        else:
            bank, packs = O.keyframe_chunk_phase(
                self.bank, Tcws, depths, self.intr, masks, labels, scores,
                det_valid, cluster_ids, n_clusters, self._color_table,
                jnp.float32(e.prob_thd), jnp.float32(e.min_depth),
                jnp.float32(e.max_depth), jnp.float32(e.min_area),
                jnp.float32(e.max_area), jnp.int32(e.min_point_count),
                jnp.float32(e.score_margin), jnp.float32(e.overlap),
                **statics)
        self.bank = bank
        for i, (kf_id, depth, Tcw, dets) in enumerate(frames):
            self._pending.append((packs[i], dets, int(kf_id),
                                  np.asarray(Tcw), depths[i], Tcws[i]))
        self.timing["track"].append(time.perf_counter() - t0)
        if self.viewer is not None or len(self._pending) >= self._max_pending:
            self.flush()

    def flush(self):
        """Materialize queued keyframe packs and apply the host-side
        Inventory bookkeeping (observation records, opt-in per-object TSDF).
        Called lazily by every host-state reader; one batched device_get
        drains the whole dispatch queue in a single sync."""
        pending, self._pending = self._pending, []
        if not pending:
            return
        # ONE batched readback for the whole queue: device_get issues the
        # host copies async then blocks once, so K packs cost ~one tunnel
        # round-trip instead of K sequential ~30 ms np.asarray syncs (the
        # profiled 34 ms/kf "insert" stage was exactly this).
        t0 = time.perf_counter()
        packs = jax.device_get([p[0] for p in pending])
        self.timing["readback"].append(time.perf_counter() - t0)
        tsdf_jobs: Dict[int, list] = {}
        for pack, (pack_d, detections, kf_id, Tcw, depth_j, Tcw_j) in zip(
                packs, pending):
            t0 = time.perf_counter()
            M = detections.masks.shape[0]
            n_clusters = int(pack[0])
            rows = pack[1:].reshape(M, 13)
            if n_clusters == 0:
                continue
            self.inventory.add_keyframe(kf_id, Tcw)
            for i in range(M):
                if rows[i, 1] < 0.5:                     # not processed
                    continue
                oidx = int(rows[i, 0])
                if rows[i, 3] > 0.5:                     # kept
                    self.inventory.observe(
                        oidx, kf_id, int(detections.labels[i]),
                        float(detections.scores[i]),
                        bbox=detections.boxes[i],
                        hu=rows[i, 4:11].copy(),
                        centroid=rows[i, 11:13].copy())
            self.timing["insert"].append(time.perf_counter() - t0)
            if self.enable_tsdf:
                # merge masks that tracked to the SAME object in this
                # keyframe (OR) so each object integrates each keyframe
                # once — several detections can land on one object, and
                # each extra mask costs a full ~3.7 ms scan step
                per_obj: Dict[int, object] = {}
                for i in range(M):
                    if rows[i, 1] < 0.5:
                        continue
                    o = int(rows[i, 0])
                    m = detections.masks[i]
                    per_obj[o] = m if o not in per_obj else (per_obj[o] | m)
                for o, m in per_obj.items():
                    tsdf_jobs.setdefault(o, []).append((m, depth_j, Tcw_j))
        if tsdf_jobs:
            tt = time.perf_counter()
            self._integrate_tsdf_jobs(tsdf_jobs)
            self.timing["tsdf"].append(time.perf_counter() - tt)

    def track_by_contours(self, mask: jnp.ndarray, label: int, score: float,
                          Tcw: np.ndarray,
                          max_shape_dist: float = 1.0,
                          max_epipolar_px: float = 50.0) -> int:
        """Contour-based object association (TrackObjectContours,
        Engine.cpp:503-607): Hu-moment shape similarity against each stored
        observation plus the epipolar distance of the stored centroid's line
        to the new centroid. The reference computes these diagnostics but
        returns no match; here the commented-out decision rule
        c2 ∧ (c3 ∨ c4) is made operational. Returns object slot or -1."""
        from semantic_slam_tpu.geometry.camera import fundamental_from_poses

        self.flush()
        hu_new = np.asarray(hu_moments(mask))
        c_new = np.asarray(mask_centroid(mask))
        e = self.cfg.engine
        bank = self.bank
        order = np.argsort(np.asarray(bank.obj_created))
        K = np.asarray(self.intr.K)
        for o in order:
            if not bool(bank.obj_valid[o]):
                continue
            obs = self.inventory.obs.get(int(o), [])
            if not obs:
                continue
            min_shape = np.inf
            min_epi = np.inf
            for ob in obs:
                if ob.get("hu") is None:
                    continue
                d = float(match_shapes_i1(jnp.asarray(hu_new),
                                          jnp.asarray(ob["hu"])))
                min_shape = min(min_shape, d)
                if ob.get("centroid") is not None and ob["kf"] in \
                        self.inventory.kf_poses:
                    T2 = self.inventory.kf_poses[ob["kf"]]
                    F12 = np.asarray(fundamental_from_poses(
                        jnp.asarray(K), jnp.asarray(Tcw, jnp.float32),
                        jnp.asarray(T2, jnp.float32)))
                    c1h = np.array([c_new[0], c_new[1], 1.0])
                    line = c1h @ F12        # line in the other image
                    c2h = np.array([ob["centroid"][0], ob["centroid"][1], 1.0])
                    dd = abs(line @ c2h) / max(
                        np.hypot(line[0], line[1]), 1e-9)
                    min_epi = min(min_epi, dd)
            c2 = min_shape < max_shape_dist
            c3 = int(bank.obj_label[o]) == label
            c4 = float(bank.obj_score[o]) > e.score_margin * score
            epi_ok = (min_epi < max_epipolar_px) or not np.isfinite(min_epi)
            if c2 and (c3 or c4) and epi_ok:
                return int(o)
        return -1

    def display(self, oidx: int, mask, Tcw: np.ndarray,
                rgb: Optional[np.ndarray] = None,
                path: str = "texture_geometry.png") -> np.ndarray:
        """Debug overlay of one tracked object in the current keyframe
        (Engine::display parity, reference src/Engine.cpp:687-753): mask
        contour + "label id" text + the object's probability-gated points
        projected with the reference's 5-px frustum border and
        [min_depth, max_depth] range gates; writes texture_geometry.png."""
        from semantic_slam_tpu.viz.renderer import render_object_overlay

        e = self.cfg.engine
        return render_object_overlay(
            self.bank, oidx, np.asarray(mask), np.asarray(Tcw),
            np.asarray(self.intr.K), self.categories, e.prob_thd,
            e.min_depth, e.max_depth, image=rgb, path=path)

    def reset(self):
        """Clear all object state (the lidar driver calls this per frame —
        reference ``label_instance_lidar.cpp:129``)."""
        e = self.cfg.engine
        self._pending = []              # queued packs refer to dropped state
        self.bank = O.ObjectBank.empty(e.max_objects, e.max_points_per_object)
        self.inventory = Inventory(self.cfg)
        self.tsdf_vols = {}

    def _alloc_slot(self) -> int:
        free = np.nonzero(~np.asarray(self.bank.obj_valid))[0]
        return int(free[0]) if len(free) else -1

    def _integrate_tsdf_jobs(self, jobs: Dict[int, list]):
        """Per-object TSDF fusion from mask-multiplied depth (the
        Object::Integrate contract, Engine.cpp:192-193). jobs maps object
        slot -> [(mask [H, W], depth_j, Tcw_j), ...] across the whole
        deferred-keyframe window; each object's sequence integrates as ONE
        scanned program (bucketed length), so a flush costs one dispatch
        per object instead of one per (object, keyframe). Volumes anchor at
        the first observing keyframe with the masked-depth min-corner
        origin (Object.cpp:22-49)."""
        from semantic_slam_tpu.geometry.se3 import se3_inverse
        from semantic_slam_tpu.ops.tsdf import (
            origin_from_depth, tsdf_blocked_create, tsdf_integrate_masked_seq)

        import os as _os
        dbg = _os.environ.get("SST_TSDF_DEBUG")
        t = self.cfg.tsdf
        # ONE fixed bucket length for every scan: padded steps are skipped
        # by the scan's lax.cond, and longer job lists (several detections
        # can track to one object per keyframe, so a 32-kf window can queue
        # >32 jobs for one object) chunk into repeated T-length calls — a
        # single compiled scan per process. Per-length bucketing compiled a
        # fresh 13-15 s program per length (T=64, T=128, ...) at flush time.
        T = max(self._max_pending, 1)
        chunked = [(oidx, full[c0:c0 + T])
                   for oidx, full in jobs.items()
                   for c0 in range(0, len(full), T)]
        for oidx, items in chunked:
            tdbg = time.perf_counter()
            n = len(items)
            masks = jnp.stack(
                [jnp.asarray(m, bool) for m, _, _ in items]
                + [jnp.zeros_like(jnp.asarray(items[0][0], bool))] * (T - n))
            depths = jnp.stack([d for _, d, _ in items]
                               + [items[0][1]] * (T - n))
            Tcws = jnp.stack([c for _, _, c in items]
                             + [items[0][2]] * (T - n))
            Twcs = se3_inverse(Tcws)
            valid = jnp.asarray(
                np.arange(T) < n)
            if oidx not in self.tsdf_vols:
                masked0 = jnp.where(masks[0], depths[0], 0.0)
                origin = origin_from_depth(masked0, self.intr)
                # device copy (jnp.array): the volume donates on integrate,
                # so base2world must not alias another live buffer; a host
                # np.asarray round trip here would block ~30 ms per new
                # object through a remote transport
                self.tsdf_vols[oidx] = tsdf_blocked_create(
                    origin, jnp.array(Twcs[0]), dim=t.dim, block=8)
            tdisp = time.perf_counter()
            self.tsdf_vols[oidx] = tsdf_integrate_masked_seq(
                self.tsdf_vols[oidx], masks, depths, Twcs, valid, self.intr,
                voxel_size=t.voxel_size, trunc_margin=t.trunc_margin,
                max_depth=t.max_integrate_depth, block=8,
                max_mixed=t.max_mixed)
            if dbg:
                print(f"[tsdf] obj {oidx} n={n} T={T} "
                      f"build {tdisp - tdbg:.2f}s "
                      f"dispatch {time.perf_counter() - tdisp:.2f}s",
                      flush=True)

    def save_tsdf_surfaces(self, out_dir: str):
        """Export per-object TSDF surface clouds (tsdfN.ply parity,
        tsdf.cu:98-133)."""
        import os

        from semantic_slam_tpu.io.native import write_ply
        from semantic_slam_tpu.ops.tsdf import (
            tsdf_blocked_to_dense, tsdf_surface_points)

        self.flush()
        os.makedirs(out_dir, exist_ok=True)
        t = self.cfg.tsdf
        for oidx, vol in self.tsdf_vols.items():
            dense = tsdf_blocked_to_dense(vol, t.dim, 8)
            pts, valid = tsdf_surface_points(
                dense, max_points=131072, voxel_size=t.voxel_size)
            p = np.asarray(pts)[np.asarray(valid)]
            if len(p):
                write_ply(os.path.join(out_dir, f"tsdf{oidx}.ply"), p)

    # ------------------------------------------------------------------

    def objects_summary(self) -> List[dict]:
        """Host-side view of the bank for drivers/tests."""
        self.flush()
        bank = self.bank
        prob = np.asarray(O.point_prob(bank))
        out = []
        for o in np.nonzero(np.asarray(bank.obj_valid))[0]:
            n = int(bank.pt_n[o])
            out.append(dict(
                slot=int(o),
                label=int(bank.obj_label[o]),
                name=self.categories.get(int(bank.obj_label[o]), "?"),
                score=float(bank.obj_score[o]),
                n_points=n,
                n_good=int((prob[o] >= self.cfg.engine.prob_thd)
                           [np.asarray(bank.pt_valid[o])].sum()),
                observations=self.inventory.observations_of(int(o)),
            ))
        return out

    def save_objects(self, out_dir: str):
        self.flush()
        self.inventory.save_objects(self.bank, self.categories,
                                    self.cfg.engine.prob_thd, out_dir)

    def timing_report(self) -> Dict[str, float]:
        return {k: (sum(v) / len(v) if v else 0.0)
                for k, v in self.timing.items()}
