import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.models.detector import (FasterRCNNVGG, assign_targets,
                                     make_anchors, rpn_losses,
                                     roi_head_losses, generate_proposals,
                                     _sample_balanced)
from sgg_tpu.ops.nms import decode_boxes, encode_boxes, nms
import pytest

pytestmark = pytest.mark.slow


def _np_greedy_nms(boxes, scores, thresh):
    """Independent numpy oracle (torchvision greedy NMS)."""
    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    order = np.argsort(-scores)
    keep = []
    for i in order:
        if all(iou(boxes[i], boxes[j]) <= thresh for j in keep):
            keep.append(i)
    return keep


def test_nms_matches_greedy_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 30
        boxes = rng.rand(n, 4).astype(np.float32) * 50
        boxes[:, 2:] += boxes[:, :2] + 5
        scores = rng.rand(n).astype(np.float32)
        idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(n, bool), 0.5, 20)
        got = np.asarray(idx)[np.asarray(mask)]
        want = _np_greedy_nms(boxes, scores, 0.5)[:20]
        np.testing.assert_array_equal(got, want)


def test_nms_fixpoint_matches_sequential():
    """The parallel fixed-point NMS equals the sequential fori_loop greedy
    bit-for-bit, including on dense suppression-chain-heavy sets."""
    rng = np.random.RandomState(7)
    for n, spread in ((64, 30.0), (200, 15.0), (200, 60.0)):
        boxes = rng.rand(n, 4).astype(np.float32) * spread
        boxes[:, 2:] += boxes[:, :2] + rng.rand(n, 2).astype(np.float32) * 20
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        a_idx, a_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.4, n,
                            method="fixpoint")
        b_idx, b_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.4, n,
                            method="sequential")
        np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
        np.testing.assert_array_equal(np.asarray(a_idx)[np.asarray(a_mask)],
                                      np.asarray(b_idx)[np.asarray(b_mask)])


def test_nms_chunked_matches_sequential():
    """The chunked greedy (blocked loop + unrolled in-chunk resolve) equals
    the sequential fori_loop greedy bit-for-bit, including when the chunk
    width doesn't divide N and on suppression-chain-heavy sets."""
    rng = np.random.RandomState(11)
    for n, spread, chunk in ((64, 30.0, 16), (200, 15.0, 64),
                             (200, 60.0, 32), (37, 10.0, 16),
                             (128, 8.0, 128)):
        boxes = rng.rand(n, 4).astype(np.float32) * spread
        boxes[:, 2:] += boxes[:, :2] + rng.rand(n, 2).astype(np.float32) * 20
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        a_idx, a_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.4, n,
                            method="chunked", chunk=chunk)
        b_idx, b_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.4, n,
                            method="sequential")
        np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
        np.testing.assert_array_equal(np.asarray(a_idx)[np.asarray(a_mask)],
                                      np.asarray(b_idx)[np.asarray(b_mask)])


def test_nms_rounds_matches_sequential_when_converged():
    """The monotone-rounds NMS equals the sequential greedy bit-for-bit
    whenever its converged flag is True."""
    rng = np.random.RandomState(3)
    for n, spread in ((64, 30.0), (200, 15.0), (200, 60.0)):
        boxes = rng.rand(n, 4).astype(np.float32) * spread
        boxes[:, 2:] += boxes[:, :2] + rng.rand(n, 2).astype(np.float32) * 20
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        a_idx, a_mask, conv = nms(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(valid), 0.4, n,
                                  method="rounds", rounds=32,
                                  with_converged=True)
        assert bool(conv)
        b_idx, b_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.4, n,
                            method="sequential")
        np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
        np.testing.assert_array_equal(np.asarray(a_idx)[np.asarray(a_mask)],
                                      np.asarray(b_idx)[np.asarray(b_mask)])


def test_nms_rounds_flags_deep_chain_as_unconverged():
    """A suppression chain deeper than the round budget must report
    converged=False (the caller's escalation signal): boxes in a line,
    each overlapping only its successor, descending scores — the greedy
    keep-decision of box 2k needs k rounds."""
    n = 12
    boxes = np.stack([
        np.arange(n, dtype=np.float32) * 6.0,          # x1, 60% overlap
        np.zeros(n, np.float32),
        np.arange(n, dtype=np.float32) * 6.0 + 15.0,   # x2 (w=15)
        np.full(n, 10.0, np.float32)], axis=1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    _, _, conv = nms(jnp.asarray(boxes), jnp.asarray(scores),
                     jnp.ones(n, bool), 0.3, n,
                     method="rounds", rounds=2, with_converged=True)
    assert not bool(conv)
    # with enough rounds it converges and matches sequential
    a_idx, a_mask, conv = nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), 0.3, n,
                              method="rounds", rounds=n, with_converged=True)
    assert bool(conv)
    b_idx, b_mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                        jnp.ones(n, bool), 0.3, n, method="sequential")
    np.testing.assert_array_equal(np.asarray(a_mask), np.asarray(b_mask))
    np.testing.assert_array_equal(np.asarray(a_idx)[np.asarray(a_mask)],
                                  np.asarray(b_idx)[np.asarray(b_mask)])


def test_nms_respects_validity_and_max_out():
    boxes = np.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                       np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    valid = np.asarray([False, True, True])
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                    jnp.asarray(valid), 0.5, 2)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [1, 2])  # box 0 invalid


def test_box_coding_roundtrip():
    rng = np.random.RandomState(1)
    ref = rng.rand(12, 4).astype(np.float32) * 100
    ref[:, 2:] += ref[:, :2] + 5
    gt = rng.rand(12, 4).astype(np.float32) * 100
    gt[:, 2:] += gt[:, :2] + 5
    for w in [(1., 1., 1., 1.), (10., 10., 5., 5.)]:
        deltas = encode_boxes(jnp.asarray(ref), jnp.asarray(gt), w)
        back = decode_boxes(jnp.asarray(ref), deltas, w)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_make_anchors_layout():
    a = make_anchors(2, 3, stride=16)
    assert a.shape == (2 * 3 * 15, 4)
    # first cell anchors centered at (0, 0)
    cell0 = a[:15]
    np.testing.assert_allclose((cell0[:, 0] + cell0[:, 2]) / 2, 0, atol=1e-4)
    # areas match size^2 per group of 3 ratios
    areas = (cell0[:, 2] - cell0[:, 0]) * (cell0[:, 3] - cell0[:, 1])
    np.testing.assert_allclose(areas.reshape(5, 3),
                               np.asarray([[32**2] * 3, [64**2] * 3,
                                           [128**2] * 3, [256**2] * 3,
                                           [512**2] * 3]), rtol=1e-4)


def test_assign_targets_matcher():
    anchors = jnp.asarray([[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60],
                           [100, 100, 110, 110]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 10], [52, 52, 58, 58]], jnp.float32)
    labels, matched = assign_targets(anchors, gt, jnp.ones(2, bool),
                                     hi=0.7, lo=0.3)
    labels = np.asarray(labels)
    assert labels[0] == 1           # IoU 1.0
    assert labels[3] == 0           # no overlap
    assert labels[2] == 1           # best anchor for gt2 forced positive
    assert np.asarray(matched)[0] == 0


def test_sample_balanced_counts():
    key = jax.random.key(0)
    labels = jnp.asarray([1] * 5 + [0] * 50 + [-1] * 10)
    pos, neg = _sample_balanced(key, labels, num=32, pos_fraction=0.25)
    assert int(pos.sum()) == 5          # fewer positives than target
    assert int(neg.sum()) == 32 - 5
    assert not np.asarray(pos & neg).any()
    assert not np.asarray(pos[5:]).any()


def test_detector_forward_and_losses():
    rng = np.random.RandomState(2)
    B, S = 2, 128
    det = FasterRCNNVGG(num_classes=7, rpn_pre_nms_top_n=64,
                        rpn_post_nms_top_n=32, detections_per_img=10,
                        obj_dim=64, dtype=jnp.float32, score_thresh=0.01)
    images = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
    im_hw = jnp.full((B, 2), float(S))
    variables = det.init(jax.random.key(0), images, im_hw, train=False)
    out = det.apply(variables, images, im_hw, train=False)
    assert out["boxes"].shape == (B, 10, 4)
    assert out["labels"].shape == (B, 10)
    assert out["scores"].shape == (B, 10)
    assert out["proposals"].shape == (B, 32, 4)
    for k in ("boxes", "scores"):
        assert np.isfinite(np.asarray(out[k])).all()
    # detected boxes lie inside the image
    b = np.asarray(out["boxes"])[np.asarray(out["mask"])]
    if len(b):
        assert (b >= -1e-3).all() and (b <= S + 1e-3).all()
    lb = np.asarray(out["labels"])[np.asarray(out["mask"])]
    if len(lb):
        assert (lb >= 1).all()

    # losses are finite and nonzero
    gt_boxes = jnp.asarray(rng.rand(B, 4, 4) * 60, jnp.float32)
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 20)
    gt_classes = jnp.asarray(rng.randint(1, 7, (B, 4)))
    gt_mask = jnp.ones((B, 4), bool)
    rl = rpn_losses(jax.random.key(1), out["anchors"],
                    out["rpn_obj_logits"], out["rpn_deltas"], gt_boxes,
                    gt_mask)
    hl = roi_head_losses(jax.random.key(2), out["proposals"],
                         out["prop_mask"], out["class_logits"],
                         out["box_deltas"], gt_boxes, gt_classes, gt_mask)
    for d in (rl, hl):
        for k, v in d.items():
            assert np.isfinite(float(v)), (k, v)
    assert float(rl["loss_objectness"]) > 0
    assert float(hl["loss_classifier"]) > 0


def test_append_gt_proposals_training_path():
    """Torchvision add_gt_proposals parity: with gt_boxes/gt_mask, the GT
    boxes occupy the trailing proposal slots (padded GT slots keep the RPN
    proposal), so the RoI classifier is guaranteed positive samples from
    step 0 (torchvision roi_heads.select_training_samples; without this
    the classifier collapses to background — found via the fixture sgdet
    overfit, where every detection scored ~1/C uniform)."""
    from sgg_tpu.models.detector import append_gt_proposals

    rng = np.random.RandomState(3)
    B, S = 2, 128
    det = FasterRCNNVGG(num_classes=7, rpn_pre_nms_top_n=64,
                        rpn_post_nms_top_n=32, detections_per_img=10,
                        obj_dim=64, dtype=jnp.float32, score_thresh=0.01)
    images = jnp.asarray(rng.rand(B, S, S, 3), jnp.float32)
    im_hw = jnp.full((B, 2), float(S))
    gt_boxes = jnp.asarray(rng.rand(B, 4, 4) * 60, jnp.float32)
    gt_boxes = gt_boxes.at[..., 2:].set(gt_boxes[..., :2] + 20)
    gt_mask = jnp.asarray([[True, True, True, False],
                           [True, False, False, False]])
    variables = det.init(jax.random.key(0), images, im_hw, train=False)
    base = det.apply(variables, images, im_hw, train=False)
    out = det.apply(variables, images, im_hw, train=False,
                    gt_boxes=gt_boxes, gt_mask=gt_mask)

    props = np.asarray(out["proposals"])
    mask = np.asarray(out["prop_mask"])
    gb, gm = np.asarray(gt_boxes), np.asarray(gt_mask)
    # trailing slots hold the GT boxes where gt_mask, and are valid
    for i in range(B):
        for j in range(4):
            slot = props.shape[1] - 4 + j
            if gm[i, j]:
                assert np.allclose(props[i, slot], gb[i, j]), (i, j)
                assert mask[i, slot]
            else:
                # padded GT slot: the original RPN proposal survives
                assert np.allclose(
                    props[i, slot],
                    np.asarray(base["proposals"])[i, slot]), (i, j)
    # leading slots are untouched
    assert np.allclose(props[:, :-4], np.asarray(base["proposals"])[:, :-4])
    # the RoI losses on the spliced outputs now see IoU-1.0 positives:
    # the classifier CE must differ from the no-GT run (positives sampled)
    gt_classes = jnp.asarray(rng.randint(1, 7, (B, 4)))
    hl = roi_head_losses(jax.random.key(2), out["proposals"],
                         out["prop_mask"], out["class_logits"],
                         out["box_deltas"], gt_boxes, gt_classes, gt_mask)
    assert np.isfinite(float(hl["loss_classifier"]))
    # direct helper check: an IoU-1.0 match exists for every real GT
    from sgg_tpu.models.detector import assign_targets
    for i in range(B):
        labels, matched = assign_targets(out["proposals"][i], gt_boxes[i],
                                         gt_mask[i], 0.5, 0.5,
                                         allow_low_quality=False)
        n_pos = int((np.asarray(labels) == 1)[np.asarray(mask[i])].sum())
        assert n_pos >= int(gm[i].sum()), (i, n_pos)


def test_generate_proposals_clip_and_shapes():
    rng = np.random.RandomState(3)
    K = 60
    anchors = jnp.asarray(rng.rand(K, 4) * 80, jnp.float32)
    anchors = anchors.at[:, 2:].set(anchors[:, :2] + 20)
    logits = jnp.asarray(rng.randn(1, K), jnp.float32)
    deltas = jnp.asarray(rng.randn(1, K, 4) * 0.1, jnp.float32)
    im_hw = jnp.asarray([[50.0, 50.0]])
    props, scores, mask, conv = generate_proposals(
        anchors, logits, deltas, im_hw, pre_nms_top_n=40,
        post_nms_top_n=16, nms_thresh=0.7)
    assert props.shape == (1, 16, 4)
    assert bool(np.all(np.asarray(conv)))
    p = np.asarray(props)[np.asarray(mask)]
    assert (p >= 0).all() and (p <= 50).all()
    s = np.asarray(scores)[np.asarray(mask)]
    assert (np.diff(s) <= 1e-6).all()  # score-ordered


def test_postprocess_nms_candidate_cap():
    """The top-M candidate cap keeps the best-scored detections and is
    exact when fewer than M candidates clear score_thresh (the fixed-shape
    stand-in for torchvision's data-dependent score gather)."""
    from sgg_tpu.models.detector import postprocess_detections

    rng = np.random.RandomState(7)
    B, P, C = 1, 12, 6
    logits = jnp.asarray(rng.randn(B, P, C).astype(np.float32) * 3)
    deltas = jnp.zeros((B, P, C * 4), jnp.float32)
    props = jnp.asarray(rng.rand(B, P, 4).astype(np.float32) * 200)
    props = props.at[..., 2:].set(props[..., :2] + 40 +
                                  jnp.arange(P, dtype=jnp.float32)[None, :,
                                                                   None])
    pm = jnp.ones((B, P), bool)
    hw = jnp.full((B, 2), 300.0)

    kw = dict(score_thresh=0.05, nms_thresh=0.5, detections_per_img=8)
    full = postprocess_detections(logits, deltas, props, pm, hw,
                                  nms_candidates=P * (C - 1), **kw)
    capped = postprocess_detections(logits, deltas, props, pm, hw,
                                    nms_candidates=16, **kw)

    # with a cap >= the number of above-threshold candidates the two runs
    # must agree wherever the capped run kept a detection, and the capped
    # run's kept scores are the top of the full run's kept scores
    fm, cm = np.asarray(full["mask"][0]), np.asarray(capped["mask"][0])
    fs = np.asarray(full["scores"][0])[fm]
    cs = np.asarray(capped["scores"][0])[cm]
    assert cm.sum() <= fm.sum()
    np.testing.assert_allclose(cs, fs[: cm.sum()], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(capped["boxes"][0])[cm],
        np.asarray(full["boxes"][0])[fm][: cm.sum()], rtol=1e-5)
    assert (np.asarray(capped["labels"][0])[cm]
            == np.asarray(full["labels"][0])[fm][: cm.sum()]).all()
