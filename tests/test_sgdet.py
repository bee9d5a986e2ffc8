import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models.detector import FasterRCNNVGG
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.models.sgdet import (make_sgdet_eval_step,
                                  make_sgdet_retry_eval_step,
                                  make_sgdet_train_step,
                                  sgdet_eval_with_retry)
from sgg_tpu.train.rel_assign import rel_assignments
from sgg_tpu.train.state import create_train_state
import pytest

pytestmark = pytest.mark.slow

N_CLS, N_PRED = 8, 5


def test_rel_assignments_invariants():
    rng = np.random.RandomState(0)
    B, N, Ng, Eg = 2, 10, 5, 6
    det_boxes = rng.rand(B, N, 4).astype(np.float32) * 80
    det_boxes[..., 2:] += det_boxes[..., :2] + 15
    det_mask = np.ones((B, N), bool)
    det_mask[:, 8:] = False
    gt_boxes = det_boxes[:, :Ng] + rng.randn(B, Ng, 4).astype(np.float32)
    gt_boxes[..., 2:] = np.maximum(gt_boxes[..., 2:],
                                   gt_boxes[..., :2] + 2)
    gt_classes = rng.randint(1, N_CLS, (B, Ng)).astype(np.int32)
    det_labels = np.concatenate(
        [gt_classes, rng.randint(1, N_CLS, (B, N - Ng))], 1).astype(np.int32)
    gt_rels = np.zeros((B, Eg, 3), np.int32)
    gt_rel_mask = np.zeros((B, Eg), bool)
    for b in range(B):
        for e in range(4):
            s, o = rng.choice(Ng, 2, replace=False)
            gt_rels[b, e] = (s, o, rng.randint(1, N_PRED))
            gt_rel_mask[b, e] = True

    rels, mask = rel_assignments(
        jax.random.key(0), jnp.asarray(det_boxes), jnp.asarray(det_labels),
        jnp.asarray(det_mask), jnp.asarray(gt_boxes),
        jnp.asarray(gt_classes), jnp.asarray(gt_rels),
        jnp.asarray(gt_rel_mask), max_out=16, filter_non_overlap=False)
    rels, mask = np.asarray(rels), np.asarray(mask)
    assert rels.shape == (B, 16, 3)
    for b in range(B):
        valid = rels[b][mask[b]]
        assert len(valid) > 0
        # endpoints are valid detections, no self loops (except the dummy)
        if len(valid) > 1 or valid[0].any():
            assert (valid[:, 0] < 8).all() and (valid[:, 1] < 8).all()
        fg = valid[valid[:, 2] > 0]
        assert len(fg) <= round(0.25 * 16)
        for s, o, p in fg:
            # each FG pair matches its GT rel: same class + IoU>=0.5
            g_match = [(gs, go, gp) for gs, go, gp in
                       gt_rels[b][gt_rel_mask[b]]
                       if gp == p and det_labels[b, s] == gt_classes[b, gs]
                       and det_labels[b, o] == gt_classes[b, go]]
            assert g_match, (s, o, p)


def test_rel_assignments_dummy_when_empty():
    # no detections match anything and nothing overlaps -> dummy rel
    det_boxes = jnp.asarray([[[0, 0, 10, 10], [500, 500, 510, 510]]],
                            jnp.float32)
    det_labels = jnp.asarray([[1, 2]])
    det_mask = jnp.ones((1, 2), bool)
    gt_boxes = jnp.asarray([[[100, 100, 120, 120], [200, 200, 220, 220]]],
                           jnp.float32)
    gt_classes = jnp.asarray([[3, 4]])
    gt_rels = jnp.asarray([[[0, 1, 2]]])
    gt_rel_mask = jnp.ones((1, 1), bool)
    rels, mask = rel_assignments(
        jax.random.key(0), det_boxes, det_labels, det_mask, gt_boxes,
        gt_classes, gt_rels, gt_rel_mask, max_out=8,
        filter_non_overlap=True)
    assert np.asarray(mask).sum() == 1
    np.testing.assert_array_equal(np.asarray(rels)[0, 0], [0, 0, 0])


def _sgdet_setup():
    config = Config(batch_size=2, max_nodes=8, max_edges=16, mode="sgdet",
                    loss="dnorm", compute_dtype="float32")
    ds = SyntheticSGGDataset(num_images=2, num_classes=N_CLS,
                             num_predicates=N_PRED, max_objects=5,
                             image_size=96, with_images=True, seed=0)
    gb = ds.batch([0, 1], max_nodes=8, max_edges=16)
    detector = FasterRCNNVGG(num_classes=N_CLS, rpn_pre_nms_top_n=64,
                             rpn_post_nms_top_n=24, detections_per_img=8,
                             obj_dim=48, dtype=jnp.float32,
                             score_thresh=0.01)
    relmodel = RelModelIMP(num_classes=N_CLS, num_predicates=N_PRED,
                           mode="sgdet", hidden_dim=16, obj_dim=32,
                           dtype=jnp.float32)
    det_vars = detector.init(jax.random.key(0), gb.images, gb.im_hw,
                             train=False)
    # rel model init on detector outputs
    det = detector.apply(det_vars, gb.images, gb.im_hw, train=False)
    from sgg_tpu.models.sgdet import detection_pairs
    pairs, pmask = detection_pairs(det["boxes"], det["mask"], True)
    rel_vars = relmodel.init(jax.random.key(1), None, det["boxes"],
                             det["labels"], pairs, pmask, fmap=det["fmap"],
                             train=False, mode="sgdet")
    return config, detector, relmodel, det_vars, rel_vars, gb


def test_sgdet_eval_step():
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    step = make_sgdet_eval_step(detector, relmodel, score_thresh=0.0)
    out = step((det_vars, rel_vars), gb)
    D = 8
    assert out["det_boxes"].shape == (2, D, 4)
    assert out["rel_dists"].shape[:2] == (2, D * (D - 1))
    assert np.isfinite(np.asarray(out["rel_dists"])).all()
    # obj_preds come from the rel head (argmax), in [1, C)
    preds = np.asarray(out["obj_preds"])[np.asarray(out["det_mask"])]
    if len(preds):
        assert (preds >= 1).all()


def test_sgdet_train_step_updates_rel_head_only():
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    state = create_train_state(config, rel_vars)
    step = make_sgdet_train_step(detector, relmodel, config, det_vars)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, metrics = step(state, gb, jax.random.key(0))
    assert np.isfinite(float(metrics["total"]))
    delta = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - np.asarray(b)).max()),
        state.params["imp"], p0["imp"])))
    assert delta > 0


def test_sgdet_retry_loop():
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    cache = {}
    out = sgdet_eval_with_retry(detector, relmodel, (det_vars, rel_vars),
                                gb, thresholds=(0.99, 0.0), _cache=cache)
    # threshold 0.99 likely finds nothing -> falls back to 0.0
    assert len(cache) >= 1
    assert out is not None


def test_sgdet_retry_is_per_image():
    """Reference semantics (lib/eval.py:125-133): retry at a lower threshold
    only changes the images that had < 2 detections — an easy image's
    outputs are byte-identical to a run re-detected at the high threshold.
    The single-pass retry step must reproduce the per-threshold re-detected
    steps exactly (the post-hoc-masking equivalence it is built on)."""
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    base = make_sgdet_eval_step(detector, relmodel, score_thresh=0.0)
    scores = np.sort(np.asarray(base((det_vars, rel_vars), gb)["det_scores"]),
                     axis=1)[:, ::-1]
    s2 = scores[:, 1]  # per-image second-highest detection score
    if abs(s2[0] - s2[1]) < 1e-6:
        import pytest
        pytest.skip("images have identical score profiles")
    easy, hard = (0, 1) if s2[0] > s2[1] else (1, 0)
    t_hi = float((s2[easy] + s2[hard]) / 2)

    out = sgdet_eval_with_retry(detector, relmodel, (det_vars, rel_vars), gb,
                                thresholds=(t_hi, 0.0), max_pairs=None)
    hi = {k: np.asarray(v) for k, v in make_sgdet_eval_step(
        detector, relmodel, score_thresh=t_hi)(
            (det_vars, rel_vars), gb).items()}
    lo = {k: np.asarray(v) for k, v in make_sgdet_eval_step(
        detector, relmodel, score_thresh=0.0)(
            (det_vars, rel_vars), gb).items()}
    assert int(hi["n_det"][easy]) >= 2 and int(hi["n_det"][hard]) < 2
    want_thresh = [0.0, 0.0]
    want_thresh[easy] = t_hi
    np.testing.assert_allclose(out["sel_thresh"], want_thresh, rtol=1e-6)
    for k in hi:
        if k == "n_nms_candidates":
            # diagnostic, defined at each run's own score threshold (the
            # retry step counts at t_min) — not part of the identity claim
            continue
        np.testing.assert_array_equal(out[k][easy], hi[k][easy], err_msg=k)
        np.testing.assert_array_equal(out[k][hard], lo[k][hard], err_msg=k)


def test_sgdet_pair_compaction_exact():
    """Compacted candidate pairs give the same valid (pair, score) sequence
    as the dense enumeration (order-preserving gather), and the wrapper
    falls back to dense when the budget overflows."""
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    dense_step = make_sgdet_retry_eval_step(detector, relmodel,
                                            thresholds=(0.2, 0.0),
                                            max_pairs=None)
    dense = {k: np.asarray(v) for k, v in
             dense_step((det_vars, rel_vars), gb).items()}
    budget = int(dense["pair_count"].max())
    assert budget >= 2
    compact_step = make_sgdet_retry_eval_step(detector, relmodel,
                                              thresholds=(0.2, 0.0),
                                              max_pairs=budget)
    comp = {k: np.asarray(v) for k, v in
            compact_step((det_vars, rel_vars), gb).items()}
    assert comp["pairs"].shape[1] == budget
    for i in range(gb.batch_size):
        dv = dense["pair_mask"][i]
        cv = comp["pair_mask"][i]
        np.testing.assert_array_equal(comp["pairs"][i][cv],
                                      dense["pairs"][i][dv])
        # same per-pair predicate scores (edge order inside the head
        # changes summation order -> allclose, not bitwise)
        np.testing.assert_allclose(comp["rel_dists"][i][cv],
                                   dense["rel_dists"][i][dv],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(comp["obj_scores"][i],
                                   dense["obj_scores"][i],
                                   atol=1e-5, rtol=1e-4)

    # wrapper: a tiny budget must fall back to the exact dense result
    out = sgdet_eval_with_retry(detector, relmodel, (det_vars, rel_vars),
                                gb, thresholds=(0.2, 0.0), max_pairs=2)
    assert out["pairs"].shape[1] == dense["pairs"].shape[1]
    np.testing.assert_array_equal(out["pair_mask"], dense["pair_mask"])


def test_sgdet_nms_candidate_cap_escalation():
    """At low retry thresholds more (proposal, class) candidates can clear
    the score line than the top-M NMS prefilter keeps, breaking the
    exactness precondition of the single-pass retry step; the wrapper must
    detect the overflow (``n_nms_candidates``) and re-run with a doubled
    cap until it covers, matching an uncapped run byte-for-byte."""
    from sgg_tpu.utils import counters

    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    tiny = detector.clone(nms_candidates=8)

    before = counters.snapshot()
    out = sgdet_eval_with_retry(tiny, relmodel, (det_vars, rel_vars), gb,
                                thresholds=(0.2, 0.0), max_pairs=None)
    d = counters.delta(before)
    assert int(np.max(out["n_nms_candidates"])) > 8
    assert d.get("sgdet_nms_cand_overflow", 0) == 1

    big = detector.clone(nms_candidates=10_000)
    ref = sgdet_eval_with_retry(big, relmodel, (det_vars, rel_vars), gb,
                                thresholds=(0.2, 0.0), max_pairs=None)
    for k in ("det_boxes", "det_labels", "det_scores", "det_mask",
              "sel_thresh"):
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_detection_pairs_no_overlap_single_self_pair():
    """Reference fallback when require_overlap leaves nothing: ONE
    degenerate (0, 0) self-pair (rel_model_base.py:159-161), not the full
    pair set — all-pairs would inflate sgdet recall on such images."""
    from sgg_tpu.models.sgdet import detection_pairs

    # image 0: two disjoint boxes (no overlap); image 1: two overlapping
    boxes = np.zeros((2, 3, 4), np.float32)
    boxes[0, 0] = (0, 0, 10, 10)
    boxes[0, 1] = (50, 50, 60, 60)
    boxes[1, 0] = (0, 0, 10, 10)
    boxes[1, 1] = (5, 5, 15, 15)
    mask = np.asarray([[True, True, False], [True, True, False]])
    pairs, pm = detection_pairs(jnp.asarray(boxes), jnp.asarray(mask), True)
    pairs, pm = np.asarray(pairs), np.asarray(pm)
    # no-overlap image: exactly one valid pair and it is (0, 0)
    assert pm[0].sum() == 1
    np.testing.assert_array_equal(pairs[0][pm[0]], [[0, 0]])
    # overlapping image: both ordered pairs (0,1) and (1,0) survive
    got = {tuple(p) for p in pairs[1][pm[1]]}
    assert got == {(0, 1), (1, 0)}


def test_escalation_rechecks_convergence_after_cap_growth(monkeypatch):
    """A cap-escalated re-run can itself be unconverged (more candidates ->
    deeper suppression chains); the wrapper must re-check ALL exactness
    conditions after every re-run and land on the sequential method."""
    import dataclasses as dc

    from sgg_tpu.models import sgdet as sgdet_mod
    from sgg_tpu.utils import counters

    @dc.dataclass(frozen=True)
    class FakeDet:
        nms_candidates: int = 8
        nms_method: str = "rounds"

        def clone(self, **kw):
            return dc.replace(self, **kw)

    calls = []

    def fake_make_step(det, rel, thresholds=(0.2,), require_overlap=True,
                       max_pairs=None, dedup=True):
        def step(variables, batch):
            calls.append((det.nms_method, det.nms_candidates, max_pairs))
            # run 1 (rounds, cap 8): converged but candidate overflow
            # run 2 (rounds, cap 16): covers the cap but UNCONVERGED
            # run 3 (sequential, cap 16): exact
            conv = not (det.nms_candidates > 8
                        and det.nms_method == "rounds")
            return {
                "nms_converged": np.asarray([conv]),
                "n_nms_candidates": np.asarray([9]),
                "pair_count": np.asarray([1]),
            }
        return step

    monkeypatch.setattr(sgdet_mod, "make_sgdet_retry_eval_step",
                        fake_make_step)
    before = counters.snapshot()
    out = sgdet_mod.sgdet_eval_with_retry(
        FakeDet(), None, (None, None), None, thresholds=(0.2,),
        max_pairs=4)
    d = counters.delta(before)
    assert [c[:2] for c in calls] == [
        ("rounds", 8), ("rounds", 16), ("sequential", 16)]
    assert d.get("sgdet_nms_cand_overflow", 0) == 1
    assert d.get("sgdet_nms_unconverged", 0) == 1
    assert bool(np.all(out["nms_converged"]))


def test_sgdet_pair_ladder_switch_exact():
    """The in-program rung ladder (lax.switch over compacted pair budgets,
    models/sgdet.py make_sgdet_retry_eval_step) picks the smallest covering
    rung per batch and matches the dense enumeration on every valid pair;
    outputs are padded to the TOP rung's shape with all-False mask slots."""
    config, detector, relmodel, det_vars, rel_vars, gb = _sgdet_setup()
    dense_step = make_sgdet_retry_eval_step(detector, relmodel,
                                            thresholds=(0.2, 0.0),
                                            max_pairs=None)
    dense = {k: np.asarray(v) for k, v in
             dense_step((det_vars, rel_vars), gb).items()}
    need = int(dense["pair_count"].max())
    P = dense["pairs"].shape[1]
    assert need >= 2
    # small rung covers the batch -> switch must take it; top rung sets
    # the output shape (and must stay below the dense P for the ladder
    # path to engage at all)
    small, top = need, min(P - 1, 2 * need)
    assert top > small, (need, P)
    ladder_step = make_sgdet_retry_eval_step(detector, relmodel,
                                             thresholds=(0.2, 0.0),
                                             max_pairs=top,
                                             pair_ladder=(small,))
    out = {k: np.asarray(v) for k, v in
           ladder_step((det_vars, rel_vars), gb).items()}
    assert out["pairs"].shape[1] == top
    assert not out["pair_mask"][:, small:].any()  # padded slots masked off
    for i in range(gb.batch_size):
        dv, cv = dense["pair_mask"][i], out["pair_mask"][i]
        np.testing.assert_array_equal(out["pairs"][i][cv],
                                      dense["pairs"][i][dv])
        np.testing.assert_allclose(out["rel_dists"][i][cv],
                                   dense["rel_dists"][i][dv],
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(out["obj_scores"][i],
                                   dense["obj_scores"][i],
                                   atol=1e-5, rtol=1e-4)

    # a rung BELOW the batch's need must be skipped for the next rung up
    ladder_step2 = make_sgdet_retry_eval_step(detector, relmodel,
                                              thresholds=(0.2, 0.0),
                                              max_pairs=top,
                                              pair_ladder=(need - 1,))
    out2 = {k: np.asarray(v) for k, v in
            ladder_step2((det_vars, rel_vars), gb).items()}
    for i in range(gb.batch_size):
        dv, cv = dense["pair_mask"][i], out2["pair_mask"][i]
        np.testing.assert_array_equal(out2["pairs"][i][cv],
                                      dense["pairs"][i][dv])
        np.testing.assert_allclose(out2["rel_dists"][i][cv],
                                   dense["rel_dists"][i][dv],
                                   atol=1e-5, rtol=1e-4)
