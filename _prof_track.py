import time, numpy as np, jax, jax.numpy as jnp
from semantic_slam_tpu.config import SlamConfig, OrbConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.slam.tracking import track_with_map
from semantic_slam_tpu.ops.orb import extract_orb

def _sync(x): return np.asarray(x.ravel()[0])
def timeit(fn, iters=100, batches=3):
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
img = jnp.asarray(rs.uniform(0,255,(480,640)).astype(np.float32))
orb_cfg = OrbConfig(n_features=1000)
scene = synth.make_scene(16384, seed=1)
pt_xyz = jnp.asarray(scene.pts_w); pt_desc = jnp.asarray(scene.desc_pm1)
pt_valid = jnp.ones(len(scene.pts_w), bool); Tcw = jnp.eye(4)

f_orb = jax.jit(lambda im: extract_orb(im, orb_cfg).desc_pm1)
print("extract_orb      %.3f ms" % (timeit(lambda: f_orb(img))*1e3))

feats = extract_orb(img, orb_cfg)
f_track = jax.jit(lambda: track_with_map(intr, Tcw, pt_xyz, pt_desc, pt_valid,
    feats.uv, feats.desc_pm1, feats.valid, feats.level, cam.width, cam.height).Tcw)
print("track_with_map   %.3f ms" % (timeit(f_track)*1e3))
