import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.config import CameraConfig
from semantic_slam_tpu.geometry import Intrinsics
from semantic_slam_tpu.ops.mesh import marching_tetrahedra, write_ply_mesh
from semantic_slam_tpu.ops.tsdf import TsdfVolume, tsdf_integrate_colored

CAM = CameraConfig()
INTR = Intrinsics.from_config(CAM)


def test_marching_tets_sphere():
    """Analytic sphere SDF: extracted vertices must lie on the sphere."""
    D = 32
    vs = 0.05
    r = 0.5
    c = np.array([D / 2, D / 2, D / 2]) * vs
    zz, yy, xx = np.mgrid[0:D, 0:D, 0:D].astype(np.float32) * vs
    sdf = np.sqrt((xx - c[0]) ** 2 + (yy - c[1]) ** 2 + (zz - c[2]) ** 2) - r
    sdf = np.clip(sdf / 0.15, -1, 1)
    w = np.ones((D, D, D), np.float32)
    tris, valid = marching_tetrahedra(
        jnp.asarray(sdf), jnp.asarray(w), jnp.zeros(3), voxel_size=vs,
        max_tris=65536)
    tris = np.asarray(tris)[np.asarray(valid)]
    assert len(tris) > 500
    verts = tris.reshape(-1, 3)
    d = np.abs(np.linalg.norm(verts - c, axis=1) - r)
    assert np.percentile(d, 95) < vs, np.percentile(d, 95)
    # triangle area sums to roughly the sphere surface (4 pi r^2)
    a = tris[:, 1] - tris[:, 0]
    b = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(a, b), axis=1).sum()
    assert abs(area - 4 * np.pi * r * r) / (4 * np.pi * r * r) < 0.15


def test_mesh_ply_roundtrip(tmp_path):
    D = 16
    zz, yy, xx = np.mgrid[0:D, 0:D, 0:D].astype(np.float32) * 0.1
    sdf = np.clip((zz - 0.8) / 0.2, -1, 1)      # flat plane z=0.8
    w = np.ones((D, D, D), np.float32)
    tris, valid = marching_tetrahedra(jnp.asarray(sdf), jnp.asarray(w),
                                      jnp.zeros(3), voxel_size=0.1,
                                      max_tris=8192)
    nv, nf = write_ply_mesh(str(tmp_path / "mesh.ply"), tris, valid)
    assert nv > 50 and nf > 50
    head = open(tmp_path / "mesh.ply", "rb").read(200)
    assert b"element face" in head


def test_colored_tsdf_integration():
    D = 32
    depth = np.full((CAM.height, CAM.width), 2.0, np.float32)
    rgb = np.zeros((CAM.height, CAM.width, 3), np.float32)
    rgb[:, :320] = (255, 0, 0)
    rgb[:, 320:] = (0, 0, 255)
    vol = TsdfVolume.create(np.array([-0.8, -0.8, 1.5], np.float32),
                            np.eye(4, dtype=np.float32), dim=D)
    cvol = jnp.zeros((D, D, D, 3))
    for _ in range(2):
        vol, cvol = tsdf_integrate_colored(
            vol, cvol, jnp.asarray(depth), jnp.asarray(rgb), jnp.eye(4), INTR,
            voxel_size=0.05, trunc_margin=0.25)
    w = np.asarray(vol.weight)
    c = np.asarray(cvol)
    assert (w > 0).any()
    # left half of the volume sees red, right half blue
    seen = w > 0
    left = seen.copy(); left[..., D // 2:] = False
    right = seen.copy(); right[..., : D // 2] = False
    assert c[left][:, 0].mean() > 200 and c[left][:, 2].mean() < 50
    assert c[right][:, 2].mean() > 200 and c[right][:, 0].mean() < 50
