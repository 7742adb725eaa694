import time, numpy as np, jax, jax.numpy as jnp
from semantic_slam_tpu.config import SlamConfig, OrbConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.geometry.camera import project, in_image
from semantic_slam_tpu.geometry.se3 import transform_points
from semantic_slam_tpu.io import synth
from semantic_slam_tpu.ops.match import match_descriptors, window_mask
from semantic_slam_tpu.ops.orb import extract_orb
from semantic_slam_tpu.slam.tracking import pose_optimize

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
scene = synth.make_scene(16384, seed=1)
pt_xyz = jnp.asarray(scene.pts_w); pt_desc = jnp.asarray(scene.desc_pm1)
pt_valid = jnp.ones(len(scene.pts_w), bool); Tcw = jnp.eye(4)
img = jnp.asarray(rs.uniform(0,255,(480,640)).astype(np.float32))
feats = extract_orb(img, OrbConfig(n_features=1000))
P, C = 16384, 4096
dummy = jnp.arange(8, dtype=jnp.float32)

def stageA(Tcw, s):
    pc = transform_points(Tcw[None], pt_xyz[None])[0]
    uv, z = project(intr, pc)
    visible = pt_valid & (z > 0.05) & in_image(uv, 640, 480, margin=5)
    from semantic_slam_tpu.ops.compact import compact_indices
    cand, cvis = compact_indices(visible, C)
    return cand, cvis, uv, s

def stageA_topk(Tcw, s):
    pc = transform_points(Tcw[None], pt_xyz[None])[0]
    uv, z = project(intr, pc)
    visible = pt_valid & (z > 0.05) & in_image(uv, 640, 480, margin=5)
    cand = jax.lax.top_k(visible.astype(jnp.float32), C)[1]
    return cand, visible[cand], uv, s

def stageA_scatter(Tcw, s):
    pc = transform_points(Tcw[None], pt_xyz[None])[0]
    uv, z = project(intr, pc)
    visible = pt_valid & (z > 0.05) & in_image(uv, 640, 480, margin=5)
    from semantic_slam_tpu.ops.compact import prefix_sum
    ps = prefix_sum(visible)
    pos = jnp.where(visible, ps - 1, C)
    cand = jnp.zeros((C,), jnp.int32).at[pos].set(jnp.arange(P, dtype=jnp.int32), mode="drop")
    return cand, jnp.arange(C) < ps[-1], uv, s

def stageB(Tcw, s, A=stageA):
    cand, cvis, uv, _ = A(Tcw, s)
    cuv = uv[cand]
    mask = window_mask(cuv, feats.uv, 15.0)
    res = match_descriptors(pt_desc[cand], feats.desc_pm1, cvis, feats.valid,
                            mask, max_dist=75, ratio=0.95, mutual=True)
    return cand, cvis, res, s

def full(Tcw, s, A=stageA):
    cand, cvis, res, _ = stageB(Tcw, s, A)
    matched = res.idx >= 0
    kp_idx = jnp.clip(res.idx, 0, None)
    uv_obs = feats.uv[kp_idx]
    inv_s2 = 1.0 / (1.2 ** (2.0 * feats.level[kp_idx].astype(jnp.float32)))
    opt = pose_optimize(intr, Tcw, pt_xyz[cand], uv_obs, matched, inv_s2)
    return opt.Tcw.sum() + s

def scan(body):
    @jax.jit
    def f(xs):
        def step(c, x):
            r = body(Tcw, x)
            out = r if isinstance(r, jnp.ndarray) else r[0].sum().astype(jnp.float32)
            return c + out, None
        return jax.lax.scan(step, 0.0, xs)[0]
    return lambda: f(dummy)

for name, body in [
    ("A compact(matvec)", lambda T,s: stageA(T,s)),
    ("A topk", lambda T,s: stageA_topk(T,s)),
    ("A scatter", lambda T,s: stageA_scatter(T,s)),
    ("A+B match", lambda T,s: stageB(T,s)),
    ("full(compact)", lambda T,s: full(T,s)),
    ("full(topk)", lambda T,s: full(T,s,stageA_topk)),
    ("full(scatter)", lambda T,s: full(T,s,stageA_scatter)),
]:
    t = timeit(scan(body))
    print("%-18s %.3f ms" % (name, t/8*1e3), flush=True)
