import numpy as np

from sgg_tpu.augment import FeatureBank, FeatureBankWriter, SceneGraphPerturb
from sgg_tpu.augment.perturb import pairwise_similarity
from sgg_tpu.data.word_vectors import (normalized_class_embeddings,
                                       obj_edge_vectors)

N_CLS = 10


def _embed():
    return normalized_class_embeddings(
        ["__background__"] + [f"class_{i}" for i in range(1, N_CLS)])


def _batch(rng, B=3, N=6, E=8):
    classes = rng.randint(1, N_CLS, (B, N)).astype(np.int32)
    node_mask = np.zeros((B, N), bool)
    rels = np.zeros((B, E, 3), np.int32)
    rel_mask = np.zeros((B, E), bool)
    for b in range(B):
        n = rng.randint(3, N + 1)
        node_mask[b, :n] = True
        m = rng.randint(1, 4)
        for e in range(m):
            s, o = rng.choice(n, 2, replace=False)
            rels[b, e] = (s, o, rng.randint(1, 5))
            rel_mask[b, e] = True
    return classes, rels, node_mask, rel_mask


def test_pairwise_similarity_excludes_bg_and_self():
    sim = pairwise_similarity(_embed())
    assert np.all(np.isneginf(sim[0]))
    assert np.all(np.isneginf(sim[:, 0]))
    assert np.all(np.isneginf(np.diag(sim)))


def test_perturb_rand_changes_sampled_nodes_only():
    rng = np.random.RandomState(0)
    classes, rels, node_mask, rel_mask = _batch(rng)
    sgp = SceneGraphPerturb("rand", _embed(), {}, {}, L=1.0, seed=1)
    new = sgp.perturb_batch(classes, rels, node_mask, rel_mask)
    # L=1: every valid node perturbed to a different non-bg class
    assert (new[node_mask] != classes[node_mask]).all()
    assert (new[node_mask] >= 1).all()
    # padding untouched
    np.testing.assert_array_equal(new[~node_mask], classes[~node_mask])


def test_perturb_fraction_L():
    rng = np.random.RandomState(1)
    classes, rels, node_mask, rel_mask = _batch(rng, B=8, N=6)
    sgp = SceneGraphPerturb("rand", _embed(), {}, {}, L=0.34, seed=2)
    new = sgp.perturb_batch(classes, rels, node_mask, rel_mask)
    for b in range(8):
        n = node_mask[b].sum()
        changed = (new[b, :n] != classes[b, :n]).sum()
        assert changed == max(1, round(0.34 * n))


def test_perturb_neigh_uses_topk_neighbors():
    rng = np.random.RandomState(2)
    classes, rels, node_mask, rel_mask = _batch(rng)
    emb = _embed()
    sim = pairwise_similarity(emb)
    sgp = SceneGraphPerturb("neigh", emb, {}, {}, L=1.0, topk=3, seed=3)
    new = sgp.perturb_batch(classes, rels, node_mask, rel_mask)
    for b in range(classes.shape[0]):
        for i in range(node_mask[b].sum()):
            if new[b, i] != classes[b, i]:
                topk = set(np.argsort(sim[classes[b, i]])[-3:])
                assert int(new[b, i]) in topk


def test_perturb_graphn_respects_cooccurrence():
    # dataset co-occurrence: subject class 1 with pred 2 goes with objects
    # {3: 10, 4: 100}; both appear with min freq >= alpha
    subj_pred = {"1_2": {3: 10, 4: 100}}
    pred_obj = {"2_5": {6: 50, 7: 50}}
    classes = np.asarray([[1, 5, 0]], np.int32)
    rels = np.asarray([[[0, 1, 2]]], np.int32)
    node_mask = np.asarray([[1, 1, 0]], bool)
    rel_mask = np.asarray([[1]], bool)
    sgp = SceneGraphPerturb("graphn", _embed(), subj_pred, pred_obj,
                            L=1.0, topk=0, alpha=2, seed=4)
    counts = {6: 0, 7: 0, "same": 0}
    for _ in range(40):
        new = sgp.perturb_batch(classes.copy(), rels, node_mask, rel_mask)
        # node 0 (class 1 = subject): candidates come from pred_obj["2_5"]
        c = int(new[0, 0])
        if c in (6, 7):
            counts[c] += 1
        elif c == 1:
            counts["same"] += 1
    # with topk=0, graphn only picks co-occurrence candidates (or keeps cls)
    assert counts[6] + counts[7] + counts["same"] == 40
    assert counts[6] + counts[7] > 0


def test_word_vectors_deterministic_fallback():
    emb1, _ = obj_edge_vectors(["a strange class", "tree"], wv_dim=50)
    emb2, _ = obj_edge_vectors(["a strange class", "tree"], wv_dim=50)
    np.testing.assert_array_equal(emb1, emb2)
    assert emb1.shape == (2, 50)
    assert not np.allclose(emb1[0], emb1[1])


def test_word_vectors_loads_glove_file(tmp_path):
    glove_dir = tmp_path / "glove"
    glove_dir.mkdir()
    with open(glove_dir / "glove.6B.4d.txt", "w") as f:
        f.write("cat 1 0 0 0\ndog 0 1 0 0\nbig 0 0 2 0\n")
    emb, wv = obj_edge_vectors(["cat", "big dog"], wv_dir=str(tmp_path),
                               wv_dim=4)
    np.testing.assert_allclose(emb[0], [1, 0, 0, 0])
    np.testing.assert_allclose(emb[1], [0, 0.5, 1, 0])  # avg(big, dog)
    assert wv is not None and "cat" in wv


def test_feature_bank_roundtrip(tmp_path):
    rng = np.random.RandomState(5)
    path = str(tmp_path / "features.hdf5")
    w = FeatureBankWriter(path, (7, 7, 8))
    f_cat = rng.randn(5, 7, 7, 8).astype(np.float32)
    w.append("cat", f_cat[:3])
    w.append("cat", f_cat[3:])  # appendable datasets
    w.append("dog", rng.randn(2, 7, 7, 8).astype(np.float32))
    w.close()

    bank = FeatureBank(path, ["__background__", "cat", "dog"], pool_sz=7,
                       n_ch=8, seed=0)
    classes = np.asarray([[1, 2, 1], [2, 9, 1]])
    mask = np.asarray([[1, 1, 1], [1, 1, 0]], bool)
    out = bank.sample(classes, mask)
    assert out.shape == (2, 3, 7, 7, 8)
    # sampled rows must come from the right class's reservoir
    flat_cat = f_cat.reshape(5, -1)
    got = out[0, 0].reshape(-1)
    assert any(np.allclose(got, row) for row in flat_cat)
    # class 9 absent from the bank -> zeros; masked slot -> zeros
    np.testing.assert_array_equal(out[1, 1], 0)
    np.testing.assert_array_equal(out[1, 2], 0)
