import jax
import jax.numpy as jnp
import numpy as np

from semantic_slam_tpu.geometry import sim3_exp, sim3_transform_points
from semantic_slam_tpu.slam.loop import (
    umeyama_sim3, ransac_sim3, PoseGraphProblem, optimize_pose_graph)
from semantic_slam_tpu.slam.vocab import (
    train_vocabulary, bow_vector, bow_score, KeyFrameDatabase)


def test_umeyama_recovers_sim3(rng):
    src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
    xi = jnp.asarray([0.2, -0.1, 0.3, 0.2, 0.1, -0.3, 0.15], jnp.float32)
    S_gt = sim3_exp(xi)
    dst = sim3_transform_points(S_gt[None], src[None])[0]
    S = umeyama_sim3(src, dst, jnp.ones(50))
    np.testing.assert_allclose(np.asarray(S), np.asarray(S_gt), atol=1e-4)


def test_ransac_sim3_with_outliers(rng):
    n = 100
    src = rng.normal(size=(n, 3)).astype(np.float32)
    xi = jnp.asarray([0.1, 0.2, -0.1, 0.1, -0.2, 0.1, 0.1], jnp.float32)
    S_gt = np.asarray(sim3_exp(xi))
    dst = src @ S_gt[:3, :3].T + S_gt[:3, 3]
    bad = rng.choice(n, 30, replace=False)
    dst[bad] += rng.normal(0, 1.0, (30, 3))
    S, inl, n_inl = ransac_sim3(jnp.asarray(src), jnp.asarray(dst),
                                jnp.ones(n, bool), jax.random.PRNGKey(0))
    assert int(n_inl) >= 60
    np.testing.assert_allclose(np.asarray(S), S_gt, atol=2e-2)
    assert (~np.asarray(inl)[bad]).mean() > 0.9


def test_pose_graph_closes_drift():
    """Chain of keyframes with accumulated drift; a loop edge to the start
    should distribute the correction along the chain."""
    K = 20
    # ground truth: poses on a line
    gt = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        gt[k][:3, 3] = (0.1 * k, 0.0, 0.0)
    # drifted estimate: small rotation+translation error accumulating
    est = gt.copy()
    drift = np.eye(4, dtype=np.float32)
    drift[:3, 3] = (0.0, 0.01, 0.0)
    acc = np.eye(4, dtype=np.float32)
    for k in range(1, K):
        acc = acc @ drift
        est[k] = gt[k] @ acc

    edges_i, edges_j, S_meas, w = [], [], [], []
    # odometry edges from the DRIFTED chain (consistent measurements)
    for k in range(1, K):
        S_ji = est[k] @ np.linalg.inv(est[k - 1])
        edges_i.append(k - 1)
        edges_j.append(k)
        S_meas.append(np.linalg.inv(S_ji))
        w.append(1.0)
    # loop edge with the TRUE relative pose end->start
    S_rel_true = gt[K - 1] @ np.linalg.inv(gt[0])
    edges_i.append(0)
    edges_j.append(K - 1)
    S_meas.append(np.linalg.inv(S_rel_true))
    w.append(5.0)

    fixed = np.zeros(K, bool)
    fixed[0] = True
    prob = PoseGraphProblem(
        S_kf=jnp.asarray(est), edge_i=jnp.asarray(edges_i, jnp.int32),
        edge_j=jnp.asarray(edges_j, jnp.int32),
        S_meas=jnp.asarray(np.stack(S_meas)),
        edge_w=jnp.asarray(w, jnp.float32), fixed=jnp.asarray(fixed))
    S_opt = np.asarray(optimize_pose_graph(prob, iters=20))
    # end pose must now be near ground truth
    end_err_before = np.linalg.norm(est[K - 1][:3, 3] - gt[K - 1][:3, 3])
    end_err_after = np.linalg.norm(S_opt[K - 1][:3, 3] - gt[K - 1][:3, 3])
    assert end_err_after < end_err_before * 0.2, (end_err_before, end_err_after)


def test_vocab_and_database(rng):
    # two "places": descriptor clusters; revisits score high
    def place_desc(seed, n=128, flips=12):
        rs = np.random.RandomState(seed)
        base = rs.randint(0, 2, (n, 256)).astype(np.int8) * 2 - 1
        def frame():
            d = base.copy()
            for i in range(n):
                f = rs.choice(256, flips, replace=False)
                d[i, f] *= -1
            return d
        return frame

    pa, pb = place_desc(1), place_desc(2)
    train = np.concatenate([pa(), pb()])
    vocab = train_vocabulary(train, np.ones(len(train), bool), n_words=64,
                             iters=6)
    db = KeyFrameDatabase(vocab, 16)
    valid = np.ones(128, bool)
    db.add(0, pa(), valid)
    db.add(1, pb(), valid)
    db.add(2, pa(), valid)
    # query with a new frame of place A
    scores = db.query(pa(), valid)
    assert scores[0] > scores[1] and scores[2] > scores[1]
    sa = float(bow_score(bow_vector(vocab, jnp.asarray(pa()), jnp.asarray(valid)),
                         bow_vector(vocab, jnp.asarray(pa()), jnp.asarray(valid))))
    sb = float(bow_score(bow_vector(vocab, jnp.asarray(pa()), jnp.asarray(valid)),
                         bow_vector(vocab, jnp.asarray(pb()), jnp.asarray(valid))))
    assert sa > sb


def test_add_loop_edge_bookkeeping():
    """AddLoopEdge semantics: dedupe, slot fill, drop-oldest overflow."""
    import dataclasses
    from semantic_slam_tpu.config import SlamConfig, MapConfig
    from semantic_slam_tpu.slam.system import SlamSystem

    cfg = dataclasses.replace(
        SlamConfig(), map=MapConfig(max_keyframes=32, max_points=256,
                                    max_kp_per_frame=64, max_obs_per_point=4))
    s = SlamSystem(cfg)
    cap = s.loop_edges.shape[1]
    s._add_loop_edge(3, 7)
    s._add_loop_edge(3, 7)                      # dedupe
    assert (s.loop_edges[3] == 7).sum() == 1
    for j in range(cap + 2):                    # overflow drops oldest
        s._add_loop_edge(5, 10 + j)
    assert (s.loop_edges[5] >= 0).all()
    assert 10 not in s.loop_edges[5] and 11 not in s.loop_edges[5]
    assert 10 + cap + 1 in s.loop_edges[5]
