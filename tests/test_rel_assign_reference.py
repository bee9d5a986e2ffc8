"""Distributional differential: our sgdet rel_assignments vs the reference's.

Both samplers are stochastic with different mechanisms (the reference's
per-image numpy ``npr.choice`` loop, ``lib/rel_assignments.py``; our
vectorized Gumbel-argmax, ``sgg_tpu/train/rel_assign.py``), so the
differential compares the SUPPORT: the union over many seeds of emitted FG
triples and BG pairs must be identical — same eligibility semantics (class
match + IoU>=0.5 endpoint matching, per-GT-rel weighted pick, overlap-only
BG excluding FG candidates and background-labelled detections).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sgg_tpu.train.rel_assign import rel_assignments  # noqa: E402

from reference_utils import load_reference  # noqa: E402


def _scene(rng, n_det=7, n_gt=3, n_cls=6):
    gt_boxes = rng.rand(n_gt, 4) * 80
    gt_boxes[:, 2:] = gt_boxes[:, :2] + rng.rand(n_gt, 2) * 50 + 20
    gt_classes = rng.randint(1, n_cls, n_gt)
    # detections: jittered copies of each GT (guaranteed matches) + noise
    det_boxes = np.concatenate([
        gt_boxes + rng.randn(n_gt, 4) * 2,
        rng.rand(n_det - n_gt, 4) * 80], 0).astype(np.float64)
    det_boxes[n_gt:, 2:] = det_boxes[n_gt:, :2] + 30
    det_boxes[:, 2:] = np.maximum(det_boxes[:, 2:], det_boxes[:, :2] + 2)
    det_labels = np.concatenate([
        gt_classes, rng.randint(1, n_cls, n_det - n_gt)])
    gt_rels = np.asarray([[0, 1, 2], [1, 2, 3], [2, 0, 1]], np.int64)[:n_gt]
    return det_boxes, det_labels, gt_boxes, gt_classes, gt_rels


@pytest.mark.parametrize("filter_non_overlap", [True, False])
def test_fg_bg_support_matches_reference(filter_non_overlap, monkeypatch):
    torch = load_reference()
    from lib.rel_assignments import rel_assignments as ref_assign

    # the reference tail does .cuda(...) unconditionally
    # (rel_assignments.py:135) — environmental, not semantic; no-op it
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    rng = np.random.RandomState(0)
    det_boxes, det_labels, gt_boxes, gt_classes, gt_rels = _scene(rng)
    n = len(det_boxes)

    ref_fg, ref_bg = set(), set()
    for seed in range(80):
        np.random.seed(seed)
        out = ref_assign(
            torch.zeros(n).long(),                      # im_inds
            torch.from_numpy(det_boxes).float(),        # boxes (no img col)
            torch.from_numpy(det_labels).long(),
            torch.from_numpy(gt_boxes).float(),
            torch.from_numpy(
                np.column_stack([np.zeros(len(gt_classes), np.int64),
                                 gt_classes])).long(),
            torch.from_numpy(
                np.column_stack([np.zeros(len(gt_rels), np.int64),
                                 gt_rels])).long(),
            0, num_sample_per_gt=1,
            filter_non_overlap=filter_non_overlap)
        rows = out.data.numpy()
        for _, s, o, p in rows:
            (ref_fg if p > 0 else ref_bg).add(
                (int(s), int(o), int(p)) if p > 0 else (int(s), int(o)))

    our_fg, our_bg = set(), set()
    db = jnp.asarray(det_boxes, jnp.float32)[None]
    dl = jnp.asarray(det_labels, jnp.int32)[None]
    dm = jnp.ones((1, n), bool)
    gb = jnp.asarray(gt_boxes, jnp.float32)[None]
    gc = jnp.asarray(gt_classes, jnp.int32)[None]
    gr = jnp.asarray(gt_rels, jnp.int32)[None]
    grm = jnp.ones((1, len(gt_rels)), bool)
    for seed in range(80):
        rels, mask = rel_assignments(
            jax.random.key(seed), db, dl, dm, gb, gc, gr, grm,
            max_out=64, filter_non_overlap=filter_non_overlap)
        rows = np.asarray(rels[0])[np.asarray(mask[0])]
        for s, o, p in rows:
            (our_fg if p > 0 else our_bg).add(
                (int(s), int(o), int(p)) if p > 0 else (int(s), int(o)))

    assert ref_fg == our_fg, (sorted(ref_fg - our_fg)[:5],
                              sorted(our_fg - ref_fg)[:5])
    assert ref_bg == our_bg, (sorted(ref_bg - our_bg)[:5],
                              sorted(our_bg - ref_bg)[:5])
    assert ref_fg  # the scene must actually produce FG assignments


def test_gtbox_sampler_support_matches_reference(monkeypatch):
    """sample_edges vs the reference proposal_assignments_gtbox
    (lib/proposal_assignments_gtbox.py) on a single image: identical FG
    support (the annotated rels), identical BG support (ordered pairs minus
    diagonal minus FG pairs), identical per-seed FG/total counts."""
    torch = load_reference()
    from lib.proposal_assignments_gtbox import proposal_assignments_gtbox

    from sgg_tpu.train.assign import sample_edges

    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)

    rng = np.random.RandomState(1)
    n, n_cls, max_out = 5, 6, 16
    boxes = rng.rand(n, 4).astype(np.float32) * 60
    boxes[:, 2:] += boxes[:, :2] + 10
    classes = rng.randint(1, n_cls, n)
    gt_rels = np.asarray([[0, 1, 2], [1, 2, 3], [3, 0, 1], [2, 4, 2],
                          [4, 1, 3], [0, 3, 1]], np.int64)
    rois = np.column_stack([np.zeros(n), boxes]).astype(np.float32)
    g_cls = np.column_stack([np.zeros(n, np.int64), classes])
    g_rels = np.column_stack([np.zeros(len(gt_rels), np.int64), gt_rels])

    ref_fg, ref_bg, ref_counts = set(), set(), set()
    for seed in range(60):
        torch.manual_seed(seed)
        np.random.seed(seed)
        _, _, rel_labels = proposal_assignments_gtbox(
            torch.from_numpy(rois), torch.from_numpy(boxes),
            torch.from_numpy(g_cls), torch.from_numpy(g_rels),
            0, max_out)
        rows = rel_labels.data.numpy()
        n_fg = 0
        for _, s, o, p in rows:
            if p > 0:
                ref_fg.add((int(s), int(o), int(p)))
                n_fg += 1
            else:
                ref_bg.add((int(s), int(o)))
        ref_counts.add((n_fg, len(rows)))

    our_fg, our_bg, our_counts = set(), set(), set()
    rels_j = jnp.asarray(gt_rels, jnp.int32)[None]
    rm = jnp.ones((1, len(gt_rels)), bool)
    nm = jnp.ones((1, n), bool)
    for seed in range(60):
        out, mask = sample_edges(jax.random.key(seed), rels_j, rm, nm,
                                 max_out=max_out)
        rows = np.asarray(out[0])[np.asarray(mask[0])]
        n_fg = 0
        for s, o, p in rows:
            if p > 0:
                our_fg.add((int(s), int(o), int(p)))
                n_fg += 1
            else:
                our_bg.add((int(s), int(o)))
        our_counts.add((n_fg, len(rows)))

    assert ref_fg == our_fg, (ref_fg ^ our_fg)
    assert ref_bg == our_bg, (ref_bg ^ our_bg)
    assert ref_counts == our_counts, (ref_counts, our_counts)
