"""Train the compact Mask R-CNN on procedural shape scenes (real TPU).

The reference ships pretrained COCO weights into maskrcnn-benchmark
(``src/MaskRCNN.py.in``); this environment has no datasets or downloads, so
the detector is trained here, in-framework, on the textured multi-shape
scenes of io/synth.py until its own predictions (not the oracle) can drive
the semantic engine: mask IoU >= 0.7 against ground truth with correct
labels at the reference's 0.8 confidence gate.

Trains at half TUM resolution (240x320) — MaskRCNNDetector mean-pools full
frames 2x to match — and saves the checkpoint to
semantic_slam_tpu/data/maskrcnn_synth.npz (+ meta json with eval metrics).

Usage:  python tools/train_maskrcnn.py --steps 1500 --batch 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def half_cam():
    from semantic_slam_tpu.config import CameraConfig

    return CameraConfig(fx=267.7, fy=269.6, cx=160.05, cy=123.8,
                        width=320, height=240)


def build_dataset(n_images: int, cam, max_gt: int = 8, seed: int = 0):
    """Compact pre-rendered set: uint8 rgb + int8 inst + per-GT metadata.

    Masks are reconstructed per batch from the inst image (inst == gidx),
    which keeps the resident set ~25x smaller than storing [N,G,H,W]."""
    from semantic_slam_tpu.io import synth

    rs = np.random.RandomState(seed)
    H, W = cam.height, cam.width
    rgb = np.zeros((n_images, H, W, 3), np.uint8)
    inst = np.zeros((n_images, H, W), np.int8)
    boxes = np.zeros((n_images, max_gt, 4), np.float32)
    labels = np.zeros((n_images, max_gt), np.int32)
    valid = np.zeros((n_images, max_gt), bool)
    gidx = np.full((n_images, max_gt), -2, np.int8)
    for i in range(n_images):
        scene = synth.make_shape_scene(int(rs.randint(2, 7)),
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


def batch_from(ds, idx):
    """Assemble a device-ready batch (uint8/bool payloads; cast on device)."""
    inst = ds["inst"][idx]                                  # [B, H, W]
    gidx = ds["gidx"][idx]                                  # [B, G]
    masks = inst[:, None, :, :] == gidx[:, :, None, None]   # [B, G, H, W]
    return dict(image=ds["rgb"][idx], gt_boxes=ds["boxes"][idx],
                gt_labels=ds["labels"][idx], gt_masks=masks,
                gt_valid=ds["valid"][idx])


def evaluate(model, params, ds, idx, score_gate: float = 0.8):
    """Held-out metrics: per-GT best predicted-mask IoU and label accuracy."""
    import jax
    import jax.numpy as jnp

    infer = jax.jit(lambda p, im: model.apply(p, im))
    ious, lab_ok, n_gt = [], [], 0
    for i in idx:
        out = jax.tree_util.tree_map(
            np.asarray, infer(params, jnp.asarray(ds["rgb"][i], jnp.float32)))
        keep = (out["scores"] >= score_gate) & out["valid"]
        pm = out["masks"][keep] > 0.5
        pl = out["labels"][keep]
        for g in range(ds["valid"].shape[1]):
            if not ds["valid"][i, g]:
                continue
            n_gt += 1
            gm = ds["inst"][i] == ds["gidx"][i, g]
            if len(pm) == 0:
                ious.append(0.0)
                lab_ok.append(False)
                continue
            inter = (pm & gm).sum((1, 2))
            union = (pm | gm).sum((1, 2))
            j = int(np.argmax(inter / np.maximum(union, 1)))
            ious.append(float(inter[j] / max(union[j], 1)))
            lab_ok.append(bool(pl[j] == ds["labels"][i, g]))
    return dict(mean_iou=float(np.mean(ious)) if ious else 0.0,
                frac_iou70=float(np.mean(np.asarray(ious) >= 0.7)) if ious else 0.0,
                label_acc=float(np.mean(lab_ok)) if lab_ok else 0.0,
                n_gt=n_gt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=512)
    ap.add_argument("--n-eval", type=int, default=24)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--variant", choices=("synth", "full"), default="synth",
                    help="synth = compact committable checkpoint; full = the "
                         "contract-size R-50-FPN (models/maskrcnn.py "
                         "defaults, the reference's MaskRCNN.py.in config)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()
    if args.out is None:
        name = "maskrcnn_synth.npz" if args.variant == "synth" \
            else "maskrcnn_full.npz"
        args.out = os.path.join(REPO, "semantic_slam_tpu", "data", name)

    import jax
    import jax.numpy as jnp
    import optax

    from semantic_slam_tpu.io import checkpoint
    from semantic_slam_tpu.models.maskrcnn import MaskRCNN

    cam = half_cam()
    t0 = time.time()
    print(f"rendering {args.n_train}+{args.n_eval} scenes ...", flush=True)
    ds = build_dataset(args.n_train, cam, seed=args.seed)
    ds_eval = build_dataset(args.n_eval, cam, seed=args.seed + 7777)
    print(f"  rendered in {time.time() - t0:.1f}s", flush=True)

    model = MaskRCNN.synth() if args.variant == "synth" else MaskRCNN()
    rng = jax.random.PRNGKey(args.seed)
    if args.resume and os.path.exists(args.out):
        params = checkpoint.load_params(args.out)
        print("resumed from", args.out)
    else:
        params = model.init(
            rng, jnp.zeros((cam.height, cam.width, 3), jnp.float32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e6:.2f} M", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=max(args.steps, 101))
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=1e-4))
    opt_state = tx.init(params)

    def loss_fn(p, batch):
        img = batch["image"].astype(jnp.float32)
        gm = batch["gt_masks"].astype(jnp.float32)
        losses = jax.vmap(
            lambda im, gb, gl, m, gv: model.apply(
                p, im, gb, gl, m, gv, method=MaskRCNN.loss)
        )(img, batch["gt_boxes"], batch["gt_labels"], gm, batch["gt_valid"])
        return jnp.mean(losses["total"]), jax.tree_util.tree_map(
            jnp.mean, losses)

    @jax.jit
    def step(p, o, batch):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, parts

    rs = np.random.RandomState(args.seed + 1)
    t0 = time.time()
    for it in range(args.steps):
        idx = rs.randint(0, args.n_train, args.batch)
        params, opt_state, parts = step(params, opt_state, batch_from(ds, idx))
        if it % 50 == 0 or it == args.steps - 1:
            parts = {k: float(v) for k, v in parts.items()}
            print(f"step {it:5d}  " + "  ".join(
                f"{k}={v:.4f}" for k, v in sorted(parts.items()))
                + f"  ({time.time() - t0:.0f}s)", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    # full-size checkpoint ships in f16 (halves the file; the model computes
    # in bf16 anyway). Evaluate AFTER the round-trip so the recorded metrics
    # are exactly what a loader of the shipped file gets.
    store_f16 = args.variant == "full"
    checkpoint.save_params(args.out, params, dtype="float16" if store_f16
                           else None)
    print("saved", args.out, f"({os.path.getsize(args.out) / 1e6:.1f} MB)")
    if store_f16:
        params = checkpoint.load_params(args.out)

    for gate in (0.5, 0.8):
        m = evaluate(model, params, ds_eval, range(args.n_eval), gate)
        print(f"eval@{gate}: {m}", flush=True)
        if gate == 0.8:
            with open(args.out.replace(".npz", "_meta.json"), "w") as f:
                json.dump(dict(steps=args.steps, n_params=int(n_params),
                               variant=args.variant,
                               train_res=[cam.height, cam.width], **m), f,
                          indent=2)
                f.write("\n")


if __name__ == "__main__":
    main()
