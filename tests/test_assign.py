import jax
import numpy as np

from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.train.assign import all_pairs, sample_edges


def _batch(seed=0, B=4, N=24, E=32):
    ds = SyntheticSGGDataset(num_images=B, max_objects=N - 4, seed=seed)
    return ds.batch(list(range(B)), max_nodes=N, max_edges=E)


def test_sample_edges_invariants():
    gb = _batch()
    key = jax.random.key(0)
    max_out = 48
    out, mask = sample_edges(key, gb.rels, gb.rel_mask, gb.node_mask,
                             max_out=max_out)
    out, mask = np.asarray(out), np.asarray(mask)
    node_mask = np.asarray(gb.node_mask)
    rels = np.asarray(gb.rels)
    rel_mask = np.asarray(gb.rel_mask)

    max_fg = round(max_out * 0.25)
    for b in range(out.shape[0]):
        n = node_mask[b].sum()
        valid = out[b][mask[b]]
        # all sampled endpoints are valid nodes, no self loops
        assert (valid[:, 0] < n).all() and (valid[:, 1] < n).all()
        assert (valid[:, 0] != valid[:, 1]).all()
        # FG edges come from the annotated set
        gt = {tuple(r) for r in rels[b][rel_mask[b]]}
        gt_pairs = {(r[0], r[1]) for r in gt}
        fg = valid[valid[:, 2] > 0]
        bg = valid[valid[:, 2] == 0]
        assert all(tuple(r) in gt for r in fg)
        assert len(fg) == min(len(gt), max_fg)
        # BG edges never collide with annotated pairs
        assert all((r[0], r[1]) not in gt_pairs for r in bg)
        # no duplicate sampled pairs... (FG pairs unique by dataset; BG from grid)
        pairs = [tuple(r[:2]) for r in valid]
        assert len(set(pairs)) == len(pairs)
        # budget: min(gt, max_fg) FG + all-pairs-minus-ALL-gt BG (the
        # reference excludes every annotated pair from BG candidates,
        # proposal_assignments_gtbox.py:42), capped at max_out
        n_cand = min(len(gt), max_fg) + (n * (n - 1) - len(gt_pairs))
        assert mask[b].sum() == min(max_out, n_cand)


def test_sample_edges_fg_first_and_deterministic():
    gb = _batch(seed=1)
    k = jax.random.key(7)
    out1, m1 = sample_edges(k, gb.rels, gb.rel_mask, gb.node_mask, max_out=32)
    out2, m2 = sample_edges(k, gb.rels, gb.rel_mask, gb.node_mask, max_out=32)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # FG edges are sorted before BG edges
    for b in range(out1.shape[0]):
        preds = np.asarray(out1)[b][np.asarray(m1)[b], 2]
        fg_idx = np.nonzero(preds > 0)[0]
        if len(fg_idx):
            assert fg_idx.max() == len(fg_idx) - 1


def test_sample_edges_different_keys_differ():
    gb = _batch(seed=2, B=2, N=20, E=32)
    o1, _ = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                         gb.node_mask, max_out=16)
    o2, _ = sample_edges(jax.random.key(1), gb.rels, gb.rel_mask,
                         gb.node_mask, max_out=16)
    assert not np.array_equal(np.asarray(o1), np.asarray(o2))


def test_all_pairs():
    gb = _batch(B=2, N=8, E=16)
    pairs, mask = all_pairs(gb.node_mask)
    pairs, mask = np.asarray(pairs), np.asarray(mask)
    node_mask = np.asarray(gb.node_mask)
    N = node_mask.shape[1]
    assert pairs.shape == (2, N * (N - 1), 2)
    for b in range(2):
        n = node_mask[b].sum()
        got = {tuple(p) for p in pairs[b][mask[b]]}
        want = {(i, j) for i in range(n) for j in range(n) if i != j}
        assert got == want
        assert mask[b].sum() == n * (n - 1)
