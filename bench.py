"""Benchmark harness — runs on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: stage-1 tracking throughput (ORB extraction + map tracking,
the reference's per-frame hot loop which it paces to the dataset's 30 Hz —
reference ``examples/rgbd_tum.cpp:109-117``). vs_baseline = fps / 30.
Round-4/5 note: ~318 fps vs round 3's ~409 — the deliberate cost of
two-stage tracking (TrackWithMotionModel THEN TrackLocalMap re-projection,
upstream parity): a second projection re-gather + pose GN per frame. The
single-pass design collapsed on monocular sequences (20 matches from a
700-point visible map once the motion model drifted half a window). The
frame is latency-bound on sequential GN steps (~0.15 ms each); round 5
shares the candidate gather/Hamming matrix between stages and runs
stage 1 at 3 GN rounds (289 -> 318). A confidence-gated lax.cond skip of
stage 2 was tried and REVERTED: stage 2's tight re-gather raises the
matchable ceiling, so no stage-1 statistic proves it redundant (the gate
broke the mono north-star). 10.6x the reference's 30 fps real-time bar
is the right side of that trade.

Secondary metrics (TSDF Mvoxel/s, DoN segmentation fps, Mask R-CNN fps,
engine keyframes/s, Hamming matcher rate) go to bench_details.json.

Architecture (round 4): all sections run IN ONE process by default — the
tunnel started charging ~300 s of first-readback stall to each new client
that connects after a heavy client disconnects, which made round 1's
per-section subprocess isolation (a defense against transport poisoning)
the failure mode itself. One process pays one warm-up; a per-section
watchdog hard-exits after printing the cumulative results if a section
wedges, so completed numbers always reach the driver. SST_BENCH_ISOLATE=1
restores the legacy child-per-section mode.
Round-3 hardening, after two rounds of red artifacts (r01 rc=1, r02 rc=124):

  - Global wall budget (SST_BENCH_BUDGET, default 2800 s ~= 0.8x the driver
    wall). When the remaining budget can't cover a section's timeout the
    section is SKIPPED with an explicit ``<name>_skipped`` marker instead of
    letting the driver kill the whole run mid-section.
  - Heartbeats: children print ``[hb +T] msg`` to stderr at every milestone
    (warm readback, setup, first compile, each timing batch). On a timeout
    the parent records the stderr tail, so compile-hang vs execute-hang is
    diagnosable post-mortem.
  - Child watchdog: a daemon thread hard-exits the child 10 s before the
    parent would kill it, printing where it stalled — the child's own exit
    yields a clean rc/stderr instead of a SIGKILL mid-syscall.
  - Section order puts the short, historically-flaky sections (tsdf) right
    after the headline so a wall kill late in the run can no longer erase
    them. maskrcnn (biggest compile) goes last.
  - bench_details.json records run conditions (device, per-section elapsed,
    order) alongside the numbers, and ends with a newline.

Root-cause note on the r02 tsdf timeout: the identical section measures
1181 Mvox/s with a 9 s compile when the remote-compile helper is idle
(reproduced 2026-08-20); the hang signature (child ~0% CPU, zero output,
no progress past warmup) matches remote-compile queue contention — a prior
client killed mid-compile leaves its compile running server-side and later
compiles queue behind it (CLAUDE.md perf lore). The defenses above make that
state visible (heartbeat shows the stall is pre-first-compile) and bounded
(budget + skip markers) rather than fatal.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

_T0 = time.time()

# (name, timeout_s). Timeouts cover a cold remote compile (first compile
# through the tunnel is slow) but are sized so the full worst case fits the
# default budget: the budget logic skips sections it can no longer afford.
# Round-4 sizing: the green run is ~340 s total (tracking 50, tsdf 30,
# don 27, hamming 8, engine 57, maskrcnn 170 with the persistent compile
# cache warm); timeouts are ~4x green so a contended-helper section fails
# fast instead of eating the whole budget (r03 lost 490 s to one wedged
# tsdf compile).
# don runs LAST. Round-5 root-cause investigation of the r4 in-process
# INVALID_ARGUMENT (VERDICT item 6): the failure is a TRANSPORT-EPOCH
# bug, not a program bug. Evidence: (a) the minimal trigger was two
# static max_clusters variants (32 then 64) of don_extract in one
# process — second execution of the second variant failed and poisoned
# every later don-family execution in that client; (b) an HLO-IDENTICAL
# reconstruction (same pallas kernel, same one-jit-object/two-variant
# structure, diffed via .lower().as_text()) never failed in the same
# epoch; (c) the exact failing call sequence passed cleanly on a quiet
# helper later the same day. Conclusion: axon helper/client state after
# heavy session churn, intermittently tripped by this call pattern.
# Mitigations: section_don uses the engine's max_clusters=32 (single
# don variant per bench process), don stays last, and the child
# fallback remains for a poisoned epoch.
SECTIONS = [
    ("tracking", 420),
    ("hamming", 200),
    ("tsdf", 240),
    ("engine", 520),      # includes the fixture-scale phase (12 VGA
                          # renders + trained detector + TSDF-on stream)
    ("maskrcnn", 520),
    ("don", 240),
]

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (child-side). Verified to work with
    the axon remote-TPU backend: serialized executables round-trip, so a
    re-run bench (or one queued behind a wedged remote compile) skips the
    compile entirely — the r02/r03 rc=124 root cause was compile time, not
    execute time. Committed cache entries are refreshed whenever kernels
    change; stale entries are simply misses."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:           # never let cache config kill a section
        _hb(f"compile cache unavailable: {e}")


def _hb(msg: str) -> None:
    """Child-side heartbeat on stderr (parent captures the tail on timeout)."""
    print(f"[hb +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _arm_watchdog() -> None:
    """Hard-exit the child shortly before the parent's kill would land, so
    the stall location (last heartbeat) survives in clean stderr."""
    limit = float(os.environ.get("SST_BENCH_CHILD_TIMEOUT", "0"))
    if limit <= 10:
        return

    def die():
        _hb(f"WATCHDOG: no completion after {limit - 10:.0f}s — hard exit")
        os._exit(42)

    t = threading.Timer(limit - 10, die)
    t.daemon = True
    t.start()


# --------------------------------------------------------------------------
# child-side helpers
# --------------------------------------------------------------------------

def _sync(x):
    """Force a real device sync. block_until_ready is a no-op through some
    remote-TPU transports (axon tunnel); a scalar readback always syncs."""
    return np.asarray(x.ravel()[0])


def _timeit(fn, warmup: int = 2, iters: int = 100, batches: int = 3) -> float:
    """fn() must return a device array. Queues `iters` async dispatches and
    syncs once at the end — measures amortized device execution time (one
    ~30 ms tunnel readback amortized over the batch). Takes the best of
    `batches` batches: tunnel jitter only ever adds time, so the minimum is
    the stable estimator (headline varied ±15% run-to-run without this).

    iters must be large: the tunnel's dispatch pipeline only saturates past
    ~50 queued calls (measured floor: 2.6 ms/call at depth 10 -> 0.75 ms at
    depth 50 for an empty kernel). Shallow batches measure dispatch, not the
    device."""
    out = None
    for _ in range(warmup):
        out = fn()
    _sync(out)
    _hb("compiled + warm")
    best = float("inf")
    for b in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
        _hb(f"batch {b + 1}/{batches}: {best * 1e3:.3f} ms/iter (best)")
    return best


def _warm():
    """Absorb one-time transport setup (first host readback through a remote
    TPU tunnel can take minutes) before any timing begins."""
    import jax.numpy as jnp

    _sync(jnp.ones((8, 8)) + 1.0)
    _hb("warm readback done")


def _common():
    from semantic_slam_tpu.config import SlamConfig
    from semantic_slam_tpu.geometry import Intrinsics

    cfg = SlamConfig()
    return cfg, Intrinsics.from_config(cfg.camera)


def _box_depth(cfg):
    import jax.numpy as jnp

    from semantic_slam_tpu.io import synth

    scene = synth.make_box_scene(2, seed=2)
    depth, _ = synth.render_depth(scene, np.eye(4), cfg.camera)
    return scene, jnp.asarray(depth)


# --------------------------------------------------------------------------
# sections (each runs in a fresh process)
# --------------------------------------------------------------------------

def section_tracking() -> dict:
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.config import OrbConfig
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.slam.tracking import track_frame

    _warm()
    cfg, intr = _common()
    cam = cfg.camera
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.uniform(0, 255, (480, 640)).astype(np.float32))
    orb_cfg = OrbConfig(n_features=1000)
    scene = synth.make_scene(16384, seed=1)
    pt_xyz = jnp.asarray(scene.pts_w)
    pt_desc = jnp.asarray(scene.desc_pm1)
    pt_valid = jnp.ones(len(scene.pts_w), bool)
    Tcw = jnp.eye(4)
    _hb("setup done")

    def track_step():
        _, res = track_frame(intr, Tcw, pt_xyz, pt_desc, pt_valid,
                             img, orb_cfg, cam.width, cam.height)
        return res.Tcw

    fps = 1.0 / _timeit(track_step)
    return {"tracking_fps": fps, "device": str(jax.devices()[0])}


def section_engine() -> dict:
    """Stage-2 semantic engine keyframes/s (DoN + batched per-mask loop;
    detection excluded — it has its own section). The reference's
    Engine::Run is the per-keyframe hot loop of stage 2
    (examples/label_instance_rgbd.cpp:77-110); it reports seconds per
    keyframe on CPU+930M, so vs_baseline uses 1 kf/s as the bar."""
    import dataclasses

    import jax.numpy as jnp

    from semantic_slam_tpu.config import DonConfig, EngineConfig, load_categories
    from semantic_slam_tpu.geometry import se3_inverse
    from semantic_slam_tpu.io import synth
    from semantic_slam_tpu.semantic import Engine, OracleDetector

    _warm()
    cfg, intr = _common()
    box_scene, _ = _box_depth(cfg)
    ecfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=16, max_points_per_object=2048,
                            min_area=25, max_area=250000,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                      segradius=0.05, max_clusters=32))
    det = OracleDetector(box_scene, ecfg.camera, max_masks=8)
    traj_tcw = synth.orbit_trajectory(8, radius=0.25, look_at=(0, 0, 2.0))
    traj_twc = np.asarray(se3_inverse(jnp.asarray(traj_tcw)))
    frames = []
    for i in range(len(traj_tcw)):
        d, _ = synth.render_depth(box_scene, traj_twc[i], ecfg.camera)
        frames.append((d, det.predict(traj_twc[i]), traj_tcw[i]))
    eng = Engine(load_categories(), ecfg)
    _hb("setup done")
    for i, (d, dets, tcw) in enumerate(frames):      # warmup + compile
        eng.run(None, d, kf_id=i, Tcw=tcw, detections=dets)
        _hb(f"warm kf {i + 1}/{len(frames)}")
    eng.flush()
    n_runs, t0 = 16, time.perf_counter()
    for j in range(n_runs):
        d, dets, tcw = frames[j % len(frames)]
        eng.run(None, d, kf_id=len(frames) + j, Tcw=tcw, detections=dets)
    eng.flush()          # drain the deferred-bookkeeping queue: the timed
    out = {              # region includes every readback the work needs
        "engine_kf_per_s": n_runs / (time.perf_counter() - t0)}

    # ---- fixture-scale phase (VERDICT r4 item 1): 48-slot bank, 40-box
    # scene (~32 concurrent objects), VGA frames, the TRAINED detector
    # in an AsyncDetector worker, per-object TSDF ON — the reference's
    # actual stage-2 configuration (examples/label_instance_rgbd.cpp:77-110
    # at its 194-KF fr3_office scale). 12 rendered viewpoints cycle for
    # 96 keyframes: per-keyframe device work is identical to unique
    # frames; only the host-side render prep is amortized.
    from semantic_slam_tpu.semantic.detector import (AsyncDetector,
                                                     MaskRCNNDetector)

    fcfg = dataclasses.replace(
        cfg,
        engine=EngineConfig(max_objects=48, max_points_per_object=2048,
                            min_area=25, max_area=250000,
                            min_point_count=15, prob_thd=0.5,
                            min_depth=0.1, max_depth=3.5),
        don=DonConfig(scale1=0.05, scale2=0.5, threshold=0.1,
                      segradius=0.05, max_clusters=32))
    fscene = synth.make_shape_scene(40, seed=11)
    fdet = MaskRCNNDetector(max_masks=16, score_threshold=0.5)
    feng = Engine(load_categories(), fcfg, enable_tsdf=True)
    ftraj_tcw = synth.orbit_trajectory(12, radius=0.6, look_at=(0, 0, 2.0))
    ftraj_twc = np.asarray(se3_inverse(jnp.asarray(ftraj_tcw)))
    ffr = []
    for i in range(12):
        d, _ = synth.render_scene(fscene, ftraj_twc[i], fcfg.camera)
        rgb = synth.render_rgb_textured(fscene, ftraj_twc[i], fcfg.camera,
                                        seed=i)
        ffr.append((rgb, d, ftraj_tcw[i]))
    _hb("fixture frames rendered")
    for i in range(2):                                 # warm + compile
        rgb, d, tcw = ffr[i]
        feng.run(None, d, kf_id=i, Tcw=tcw, detections=fdet.predict(rgb))
    feng.flush()
    _hb("fixture warm done")
    n_fix, t0 = 96, time.perf_counter()
    with AsyncDetector(fdet, queue_size=2) as adet:
        pending = []
        for j in range(n_fix):
            rgb, d, tcw = ffr[j % len(ffr)]
            adet.submit(rgb)
            pending.append((d, tcw, j + 2))
            if len(pending) >= 2:
                d0, tcw0, k0 = pending.pop(0)
                feng.run(None, d0, kf_id=k0, Tcw=tcw0,
                         detections=adet.result())
        while pending:
            d0, tcw0, k0 = pending.pop(0)
            feng.run(None, d0, kf_id=k0, Tcw=tcw0, detections=adet.result())
        feng.flush()
    out["engine_fixture_kf_per_s"] = n_fix / (time.perf_counter() - t0)
    out["engine_fixture_objects"] = int(
        np.asarray(feng.bank.obj_valid).sum())
    return out


def section_tsdf() -> dict:
    """Reference workload: 200^3 voxels/frame over a real object depth scene
    (``include/tsdf.hpp:63-67``); hierarchically-culled block kernel."""
    import jax.numpy as jnp

    from semantic_slam_tpu.ops.tsdf import (tsdf_blocked_create,
                                            tsdf_integrate_blocked)

    _warm()
    cfg, intr = _common()
    _, bdepth_j = _box_depth(cfg)
    state = {"vol": tsdf_blocked_create(
        np.array([-0.4, -0.4, 1.4], np.float32),
        np.eye(4, dtype=np.float32), dim=200, block=8)}
    _hb("setup done")

    def tsdf_step():
        state["vol"] = tsdf_integrate_blocked(
            state["vol"], bdepth_j, jnp.eye(4), intr,
            voxel_size=0.004, trunc_margin=0.02, block=8, max_mixed=1024)
        return state["vol"].tsdf

    dt = _timeit(tsdf_step, warmup=2, iters=100)
    return {"tsdf_mvoxels_per_s": 200 ** 3 / dt / 1e6}


def section_don() -> dict:
    from semantic_slam_tpu.semantic.don import don_extract

    _warm()
    cfg, intr = _common()
    _, bdepth_j = _box_depth(cfg)
    _hb("setup done")

    def don_step():
        # max_clusters=32 = the engine sections' configuration: keeps the
        # bench process single-variant for don_extract (see SECTIONS note)
        return don_extract(bdepth_j, intr, 0.05, 0.5, 0.1, 0.05,
                           max_clusters=32).cluster_id

    return {"don_fps": 1.0 / _timeit(don_step, warmup=2, iters=60)}


def section_hamming() -> dict:
    """Descriptor Hamming-matrix rate at map-matching scale (1000 features x
    16k map points ~ 4096x4096). Measured INSIDE one fused jit (32 matrices
    per dispatch, loop-carried variation so nothing hoists): a standalone
    per-matrix call is tunnel-dispatch-bound (~0.7 ms floor) and reports the
    transport, not the device. The max-reduction consumer fuses into the
    matmul epilogue, matching how the matcher's min/argmin passes consume
    the matrix without materializing it."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from semantic_slam_tpu.ops.match import hamming_matrix

    _warm()
    rs = np.random.RandomState(0)
    N, REPS = 4096, 32
    d1 = jnp.asarray(rs.randint(0, 2, (N, 256)).astype(np.int8) * 2 - 1)
    d2 = jnp.asarray(rs.randint(0, 2, (N, 256)).astype(np.int8) * 2 - 1)
    _hb("setup done")

    @jax.jit
    def burst(d1, d2):
        def body(i, acc):
            h = hamming_matrix(jnp.roll(d1, i, axis=0), d2)
            return jnp.maximum(acc, h.max())
        return lax.fori_loop(0, REPS, body, jnp.int32(-1))

    dt = _timeit(lambda: burst(d1, d2), warmup=2, iters=20)
    return {"hamming_gcomparisons_per_s": N * N * REPS / dt / 1e9}


def section_maskrcnn() -> dict:
    """Flagship model inference at 256x320. Compiles in ~60 s on an idle
    remote-compile helper. Contract: reference ``src/MaskRCNN.py.in``."""
    import jax
    import jax.numpy as jnp

    from semantic_slam_tpu.models.maskrcnn import MaskRCNN

    _warm()
    rs = np.random.RandomState(0)
    model = MaskRCNN(pre_nms=256, post_nms=64, roi_samples=32)
    mimg = jnp.asarray(rs.uniform(0, 255, (256, 320, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), mimg)
    _hb("params initialized")
    infer = jax.jit(lambda p, im: model.apply(p, im)["scores"])
    dt = _timeit(lambda: infer(params, mimg), warmup=1, iters=60)
    return {"maskrcnn_fps_256x320": 1.0 / dt}


# --------------------------------------------------------------------------
# parent orchestration
# --------------------------------------------------------------------------

def _run_child(name: str, timeout: float) -> dict:
    """Run one section in a fresh interpreter; parse its last JSON line."""
    env = dict(os.environ, SST_BENCH_CHILD_TIMEOUT=str(timeout))
    try:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        rc, stdout, stderr = p.returncode, p.stdout or "", p.stderr or ""
    except subprocess.TimeoutExpired as e:
        def _s(b):
            return b.decode(errors="replace") if isinstance(b, bytes) else (b or "")
        return {f"{name}_error": f"timeout after {timeout}s",
                f"{name}_tail": _s(e.stderr)[-1500:]}
    for line in reversed(stdout.strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict):
            return d
    return {f"{name}_error": f"rc={rc}", f"{name}_tail": stderr[-1500:]}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        # child mode: run one section, print its metrics as one JSON line
        _arm_watchdog()
        _enable_compile_cache()
        fn = globals()[f"section_{sys.argv[2]}"]
        print(json.dumps(fn()), flush=True)
        return

    budget = float(os.environ.get("SST_BENCH_BUDGET", "1500"))
    # Round-4 default: ALL sections in ONE process. The per-section child
    # isolation (round-1's defense against transport poisoning) became the
    # failure mode itself: the tunnel now charges ~300 s of first-readback
    # stall to the next client that connects after a heavy client
    # disconnects (measured 2026-08-21: A warm 320 s, B-right-after 18 s;
    # r03's tsdf/hamming rc=42 watchdogs were exactly this). One process =
    # one warm = at most one stall, and the persistent compile cache plus
    # cumulative per-section printing bound the damage of any mid-run
    # failure to "later sections missing". Set SST_BENCH_ISOLATE=1 for the
    # legacy per-section children.
    isolate = os.environ.get("SST_BENCH_ISOLATE", "0") == "1"
    details: dict = {"run_conditions": {
        "started_unix": round(_T0, 1),
        "budget_s": budget,
        "order": [n for n, _ in SECTIONS],
    }}
    elapsed: dict = {}
    details["run_conditions"]["section_elapsed_s"] = elapsed
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_details.json")

    def flush_details():
        with open(out_path, "w") as f:
            json.dump(details, f, indent=2)
            f.write("\n")

    def print_cumulative():
        """Emit the full results-so-far as ONE JSON line after EVERY section.

        The driver records the LAST json line of stdout; r03 printed only the
        tracking line, so when the driver wall killed the run, tsdf/hamming/
        maskrcnn numbers that HAD completed never reached BENCH_r03.json.
        Printing cumulatively makes every completed section's number part of
        the official record no matter where a kill lands."""
        fps = float(details.get("tracking_fps", 0.0))
        metrics = {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in details.items()
                   if isinstance(v, (int, float)) and k != "run_conditions"}
        errors = {k: v for k, v in details.items()
                  if k.endswith("_error") or k.endswith("_skipped")}
        line = {"metric": "tracking_fps", "value": round(fps, 2),
                "unit": "frames/s", "vs_baseline": round(fps / 30.0, 2),
                "sections": metrics}
        if errors:
            line["errors"] = errors
        print(json.dumps(line), flush=True)

    def _run_inproc(name: str, eff_tmo: float) -> dict:
        """Run one section in THIS process under a hard per-section timer.

        A wedged remote compile cannot be interrupted from Python; if the
        timer fires, everything measured so far has already been printed
        cumulatively and flushed, so a hard exit loses only the unfinished
        tail — the driver still parses the last cumulative line."""
        def die():
            _hb(f"SECTION WATCHDOG: {name} exceeded {eff_tmo:.0f}s")
            print_cumulative()
            os._exit(43)

        t = threading.Timer(eff_tmo, die)
        t.daemon = True
        t.start()
        try:
            return globals()[f"section_{name}"]()
        except Exception as e:                # noqa: BLE001
            return {f"{name}_error": f"{type(e).__name__}: {e}"[:500]}
        finally:
            t.cancel()

    if not isolate:
        _warm()                       # pay the tunnel stall ONCE, up front
        _enable_compile_cache()

    skip_model = os.environ.get("SST_BENCH_MODEL", "1") == "0"
    for name, tmo in SECTIONS:
        if name == "maskrcnn" and skip_model:
            continue
        remaining = budget - (time.time() - _T0)
        if remaining < min(tmo, 120):
            # Not enough budget even for a truncated attempt: mark + move on
            # (the driver wall must never be what ends this process).
            details[f"{name}_skipped"] = (
                f"budget exhausted ({remaining:.0f}s left < {tmo}s timeout)")
            flush_details()
            print_cumulative()
            continue
        eff_tmo = min(tmo, remaining - 30)
        t_sec = time.time()
        if isolate:
            d = _run_child(name, eff_tmo)
            if name == "tracking" and "tracking_fps" not in d:
                d = _run_child(name, eff_tmo)             # one retry
        else:
            d = _run_inproc(name, eff_tmo)
            if f"{name}_error" in d:
                # one-time fallback to an isolated child: some section
                # pairings poison each other's device state in-process
                # (don vs engine, see SECTIONS note). The child pays the
                # fresh-client stall, so only try it when the budget still
                # covers stall + section.
                remaining = budget - (time.time() - _T0)
                if remaining > 650:
                    _hb(f"{name} errored in-process; retrying in a child")
                    d2 = _run_child(name, min(600.0, remaining - 45))
                    if f"{name}_error" not in d2:
                        d = d2
        elapsed[name] = round(time.time() - t_sec, 1)
        details.update(d)
        # secondary vs_baseline ratios where BASELINE.md documents a bar:
        # engine: reference Engine::Run self-times ~1 s/keyframe on its dev
        # hardware (src/Engine.cpp:267-290, CPU+930M) -> bar 1 kf/s.
        # tsdf: reference integrates 200^3 voxels per frame at camera rate
        # (include/tsdf.hpp:63-67) -> real-time bar 8 Mvox x 30 fps.
        if "engine_kf_per_s" in d:
            details["engine_vs_baseline"] = round(d["engine_kf_per_s"] / 1.0, 2)
        if "tsdf_mvoxels_per_s" in d:
            details["tsdf_vs_baseline"] = round(
                d["tsdf_mvoxels_per_s"] / 240.0, 2)
        flush_details()
        print_cumulative()
    print_cumulative()


if __name__ == "__main__":
    main()
