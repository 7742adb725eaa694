import os

import numpy as np
import pytest

from semantic_slam_tpu.config import SlamConfig, load_opencv_yaml, load_categories
from semantic_slam_tpu.io import mapio
from semantic_slam_tpu.io.evaluate import ate_rmse


def test_opencv_yaml_parse():
    path = "/root/reference/config/TUM3.yaml"
    if not os.path.exists(path):
        pytest.skip("no reference configs")
    d = load_opencv_yaml(path)
    assert d["Camera.fx"] == 535.4
    assert d["ORBextractor.nFeatures"] == 1000
    assert d["Engine.Sensor"] == 2
    cfg = SlamConfig.from_yaml(path)
    assert cfg.camera.width == 640
    assert cfg.engine.max_depth == 3.0
    assert cfg.engine.res == 0.0  # reference quirk: missing key defaults to 0
    assert cfg.don.scale2 == 0.5


def test_categories():
    cats = load_categories("/root/reference/config/categories.txt") \
        if os.path.exists("/root/reference/config/categories.txt") else load_categories()
    assert cats[0] == "background"
    assert cats[1] == "person"
    assert cats[57] in ("chair",)


def test_read_bundle_fixture(fixture_dir):
    m = mapio.read_bundle(os.path.join(fixture_dir, "bundle.txt"))
    assert m.num_keyframes() == 194
    assert m.num_points() == 12498
    # first pose is identity (fr3_office starts at origin)
    pose0 = np.asarray(m.kf_pose[0])
    np.testing.assert_allclose(pose0, np.eye(4), atol=1e-4)
    # points should be in a sane metric range for an office scene
    xyz = np.asarray(m.pt_xyz[np.asarray(m.pt_valid)])
    assert np.abs(xyz).max() < 50.0
    # every point has at least one observation
    assert int(np.asarray(m.pt_obs_n)[np.asarray(m.pt_valid)].min()) >= 1


def test_bundle_roundtrip(fixture_dir, tmp_path):
    m = mapio.read_bundle(os.path.join(fixture_dir, "bundle.txt"))
    out = tmp_path / "bundle.txt"
    mapio.write_bundle(str(out), m)
    m2 = mapio.read_bundle(str(out))
    assert m2.num_keyframes() == m.num_keyframes()
    assert m2.num_points() == m.num_points()
    np.testing.assert_allclose(np.asarray(m2.kf_pose[:194]),
                               np.asarray(m.kf_pose[:194]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2.pt_xyz[:12498]),
                               np.asarray(m.pt_xyz[:12498]), atol=1e-5)


def test_camera_graph_fixture(fixture_dir):
    m = mapio.read_bundle(os.path.join(fixture_dir, "bundle.txt"))
    m = mapio.read_camera_graph(os.path.join(fixture_dir, "camera_graph.txt"), m)
    covis_idx = np.asarray(m.covis_idx)
    covis_w = np.asarray(m.covis_w)
    # edges exist and are symmetric
    n_edges = (covis_idx[:194] >= 0).sum()
    assert n_edges > 100
    # spot-check symmetry: for each edge (i -> j, w) the reverse exists with
    # the same weight — unless j's neighbor list is at capacity and every kept
    # edge outweighs w (top-C truncation).
    for i in range(0, 194, 20):
        for j, w in zip(covis_idx[i], covis_w[i]):
            if j < 0:
                continue
            back = covis_idx[j].tolist()
            if i in back:
                assert covis_w[j][back.index(i)] == w
            else:
                assert -1 not in back and covis_w[j].min() >= w


def test_camera_graph_roundtrip(fixture_dir, tmp_path):
    m = mapio.read_bundle(os.path.join(fixture_dir, "bundle.txt"))
    m = mapio.read_camera_graph(os.path.join(fixture_dir, "camera_graph.txt"), m)
    out = tmp_path / "camera_graph.txt"
    mapio.write_camera_graph(str(out), m)
    m2 = mapio.read_camera_graph(str(out), m)
    # same adjacency after roundtrip (up to neighbor-capacity truncation)
    a = np.sort(np.where(np.asarray(m.covis_idx)[:194] < 0, 9999, np.asarray(m.covis_idx)[:194]), axis=1)
    b = np.sort(np.where(np.asarray(m2.covis_idx)[:194] < 0, 9999, np.asarray(m2.covis_idx)[:194]), axis=1)
    np.testing.assert_array_equal(a, b)


def test_associations_fixture(fixture_dir):
    times, rgb, depth = mapio.read_associations(os.path.join(fixture_dir, "associations.txt"))
    assert len(times) == 194
    assert rgb[0].startswith("rgb/")
    assert depth[0].startswith("depth/")


def test_trajectory_tum_roundtrip(tmp_path, rng):
    from semantic_slam_tpu.io.evaluate import read_trajectory_tum
    from semantic_slam_tpu.geometry import se3_exp
    import jax.numpy as jnp
    n = 20
    poses = np.asarray(se3_exp(jnp.asarray(rng.normal(size=(n, 6)) * 0.3, jnp.float32)))
    times = np.arange(n, dtype=np.float64)
    out = tmp_path / "traj.txt"
    mapio.write_trajectory_tum(str(out), times, poses)
    t2, p2 = read_trajectory_tum(str(out))
    np.testing.assert_allclose(p2, poses, atol=1e-5)
    assert ate_rmse(p2[:, :3, 3], poses[:, :3, 3]) < 1e-5
