import time, numpy as np, jax, jax.numpy as jnp
from semantic_slam_tpu.config import SlamConfig, OrbConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.tracking import track_with_map
from semantic_slam_tpu.ops.orb import extract_orb

def _sync(x): return np.asarray(x.ravel()[0])
def timeit(fn, iters=30, batches=3):
    out = fn(); _sync(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters): out = fn()
        _sync(out)
        best = min(best, (time.perf_counter()-t0)/iters)
    return best

_sync(jnp.ones((8,8))+1.0)
cfg = SlamConfig(); cam = cfg.camera
intr = Intrinsics.from_config(cam)
rs = np.random.RandomState(0)
imgs = jnp.asarray(rs.uniform(0,255,(8,480,640)).astype(np.float32))
orb_cfg = OrbConfig(n_features=1000)
scene = synth.make_scene(16384, seed=1)
pt_xyz = jnp.asarray(scene.pts_w); pt_desc = jnp.asarray(scene.desc_pm1)
pt_valid = jnp.ones(len(scene.pts_w), bool); Tcw = jnp.eye(4)

@jax.jit
def scan_orb(imgs):
    def body(c, im):
        f = extract_orb(im, orb_cfg)
        return c + f.uv.sum(), None
    return jax.lax.scan(body, 0.0, imgs)[0]

feats = extract_orb(imgs[0], orb_cfg)
@jax.jit
def scan_track(imgs):
    def body(c, im):
        r = track_with_map(intr, Tcw, pt_xyz, pt_desc, pt_valid,
            feats.uv, feats.desc_pm1, feats.valid, feats.level, cam.width, cam.height)
        return c + r.Tcw.sum() + im[0,0], None
    return jax.lax.scan(body, 0.0, imgs)[0]

@jax.jit
def scan_full(imgs):
    def body(c, im):
        f = extract_orb(im, orb_cfg)
        r = track_with_map(intr, Tcw, pt_xyz, pt_desc, pt_valid,
            f.uv, f.desc_pm1, f.valid, f.level, cam.width, cam.height)
        return c + r.Tcw.sum(), None
    return jax.lax.scan(body, 0.0, imgs)[0]

t = timeit(lambda: scan_full(imgs));  print("full/frame   %.3f ms" % (t/8*1e3), flush=True)
t = timeit(lambda: scan_orb(imgs));   print("orb/frame    %.3f ms" % (t/8*1e3), flush=True)
t = timeit(lambda: scan_track(imgs)); print("track/frame  %.3f ms" % (t/8*1e3), flush=True)
