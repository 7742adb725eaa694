"""Raw-cloud DoN overload (reference src/DoN.cpp:275-408): unorganized
points, no range image — radius-search normals at two scales, DoN magnitude
filter, Euclidean clustering."""

import numpy as np
import jax.numpy as jnp

from semantic_slam_tpu.semantic.don import don_extract_cloud


def _plane_and_spheres(seed=0):
    """Dense plane patch (low DoN) + two separated small spheres (high DoN
    at every sphere point because the small-scale normal follows the local
    curvature while the large-scale normal averages over it)."""
    rs = np.random.RandomState(seed)
    # plane z=0 patch, 3600 pts over 3x3 m: flat at both scales and dense
    # enough that every interior point has >=5 scale1-neighbors
    px = rs.uniform(-1.5, 1.5, (3600, 2))
    plane = np.concatenate([px, np.zeros((3600, 1))], 1)
    # two spheres of radius 0.12 centered 2.4 m apart, 250 pts each
    def sphere(center, n=250):
        v = rs.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return center + 0.12 * v
    s1 = sphere(np.array([-1.2, 0.0, 0.6]))
    s2 = sphere(np.array([1.2, 0.0, 0.6]))
    pts = np.concatenate([plane, s1, s2]).astype(np.float32)
    labels = np.concatenate([np.zeros(3600), np.ones(250), 2 * np.ones(250)])
    return pts, labels


def test_don_cloud_segments_spheres_from_plane():
    pts, gt = _plane_and_spheres()
    res = don_extract_cloud(
        jnp.asarray(pts), jnp.ones(len(pts), bool),
        scale1=0.08, scale2=0.4, threshold=0.25, segradius=0.15,
        min_cluster=30, max_clusters=8)
    cid = np.asarray(res.cluster_id)
    mag = np.asarray(res.don_mag)

    # plane interior is flat at both scales -> low DoN, filtered out
    interior = (gt == 0) & (np.abs(pts[:, 0]) < 1.0) & (np.abs(pts[:, 1]) < 1.0)
    assert np.median(mag[interior]) < 0.1
    assert (cid[interior] >= 0).mean() < 0.05

    # both spheres survive the filter and come out as separate clusters
    assert int(res.n_clusters) == 2, int(res.n_clusters)
    for s in (1, 2):
        ids = cid[gt == s]
        kept = ids[ids >= 0]
        assert len(kept) > 150, len(kept)
        # one dominant cluster id per sphere
        assert (kept == np.bincount(kept).argmax()).mean() > 0.95
    # the two spheres are in different clusters
    c1 = np.bincount(cid[(gt == 1) & (cid >= 0)]).argmax()
    c2 = np.bincount(cid[(gt == 2) & (cid >= 0)]).argmax()
    assert c1 != c2


def test_don_cloud_normals_orientation():
    """Plane normals at the small scale must align with ±z and be flipped
    to the PCL viewpoint convention n·(1,1,1) >= 0 (DoN.cpp:313-315)."""
    pts, gt = _plane_and_spheres(seed=3)
    res = don_extract_cloud(
        jnp.asarray(pts), jnp.ones(len(pts), bool),
        scale1=0.08, scale2=0.4, threshold=0.25, segradius=0.15,
        min_cluster=30, max_clusters=8)
    n_s = np.asarray(res.normals_small)
    interior = (gt == 0) & (np.abs(pts[:, 0]) < 1.0) & (np.abs(pts[:, 1]) < 1.0)
    assert np.abs(n_s[interior, 2]).mean() > 0.98
    assert (n_s.sum(axis=1) >= -1e-5).all()


def test_don_cloud_size_gate():
    """Clusters below min_cluster_size are dropped (EuclideanClusterExtraction
    setMinClusterSize, DoN.cpp:256-264)."""
    pts, gt = _plane_and_spheres()
    res = don_extract_cloud(
        jnp.asarray(pts), jnp.ones(len(pts), bool),
        scale1=0.08, scale2=0.4, threshold=0.25, segradius=0.15,
        min_cluster=100000, max_clusters=8)
    assert int(res.n_clusters) == 0
    assert (np.asarray(res.cluster_id) == -1).all()
