"""SGDet: end-to-end scene-graph detection (detector → relation head).

Rebuild of the reference's sgdet path (``/root/reference/sgg_models/
rel_model_base.py:209-242`` detector branch + ``rel_model_stanford.py``):
the frozen Faster R-CNN produces up to 50 detections per image; candidate
relation pairs are all ordered detection pairs, optionally constrained to
overlapping boxes (``require_overlap``, rel_model_base.py:152-154); training
relation targets come from ``rel_assignments``; the IMP relation head then
classifies objects and predicates exactly as in SGCls, sharing the
detector's feature map.

TPU-native design: detections are padded (B, D) sets; the whole
detector→sampler→rel-head→losses→update chain is ONE jitted program per
step (the reference crosses to numpy for rel_assignments each step).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sgg_tpu.config import Config
from sgg_tpu.data.graph_batch import GraphBatch
from sgg_tpu.ops.boxes import box_iou
from sgg_tpu.train.assign import all_pairs, compact_pairs
from sgg_tpu.train.losses import edge_losses, node_losses
from sgg_tpu.train.rel_assign import rel_assignments
from sgg_tpu.train.state import TrainState


def detection_pairs(det_boxes, det_mask, require_overlap: bool):
    """Candidate pairs over detections (rel_model_base.py:148-163)."""
    pairs, pair_mask = all_pairs(det_mask)
    if require_overlap:
        iou = box_iou(det_boxes, det_boxes)
        ov = jnp.take_along_axis(
            jnp.take_along_axis(iou, pairs[..., 0:1], 1), pairs[..., 1:2],
            2)[..., 0]
        overlap_mask = pair_mask & (ov > 0)
        # reference fallback when nothing overlaps: a SINGLE degenerate
        # (0, 0) self-pair (rel_model_base.py:159-161 fills one zero row),
        # NOT the full pair set — all-pairs here would let such images
        # score recall the reference cannot, inflating sgdet metrics
        any_overlap = overlap_mask.any(axis=1)                     # (B,)
        slot0 = jnp.arange(pair_mask.shape[1])[None, :] == 0       # (1, P)
        fb_mask = slot0 & ~any_overlap[:, None] & det_mask[:, 0:1]
        pairs = jnp.where(any_overlap[:, None, None], pairs,
                          jnp.zeros_like(pairs))
        pair_mask = jnp.where(any_overlap[:, None], overlap_mask, fb_mask)
    return pairs, pair_mask




def _zero_padded(out, det_mask, pair_mask):
    """Zero every output entry outside its validity mask.

    Makes padding deterministic so a post-hoc-thresholded run is
    byte-comparable to a re-detected run (see make_sgdet_retry_eval_step),
    and keeps exported artifacts free of garbage rows."""
    node_keys = ("det_boxes", "det_labels", "det_scores", "obj_logits",
                 "obj_preds", "obj_scores")
    pair_keys = ("rel_logits", "rel_dists", "pairs")
    for k in node_keys:
        if k in out:
            v = out[k]
            m = det_mask.reshape(det_mask.shape + (1,) * (v.ndim - 2))
            out[k] = jnp.where(m, v, jnp.zeros((), v.dtype))
    for k in pair_keys:
        if k in out:
            v = out[k]
            m = pair_mask.reshape(pair_mask.shape + (1,) * (v.ndim - 2))
            out[k] = jnp.where(m, v, jnp.zeros((), v.dtype))
    return out


def make_sgdet_eval_step(detector, relmodel, score_thresh: float = 0.2,
                         require_overlap: bool = True, dedup: bool = True):
    """Jitted ``eval_step((det_vars, rel_vars), batch) -> outputs`` with
    detection boxes/classes/scores plus relation outputs."""

    def eval_step(variables, batch: GraphBatch):
        det_vars, rel_vars = variables
        kw = {"fmap": batch.fmaps} if batch.fmaps is not None else {}
        det = detector.apply(det_vars, batch.images, batch.im_hw,
                             train=False, score_thresh=score_thresh, **kw)
        boxes, labels, mask = det["boxes"], det["labels"], det["mask"]
        boxes = jnp.where(mask[..., None], boxes, 0.0)
        labels = jnp.where(mask, labels, 0)
        pairs, pair_mask = detection_pairs(boxes, mask, require_overlap)
        out = relmodel.apply(rel_vars, None, boxes, labels, pairs,
                             pair_mask, fmap=det["fmap"], train=False,
                             mode="sgdet", dedup_unions=dedup)
        out.update({
            "det_boxes": boxes, "det_labels": labels,
            "det_scores": det["scores"], "det_mask": mask,
            "pairs": pairs, "pair_mask": pair_mask,
            "rel_dists": jax.nn.softmax(out["rel_logits"], axis=-1),
            "n_det": mask.sum(axis=1),
            "n_nms_candidates": det["n_candidates"],
            "nms_converged": det["nms_converged"],
        })
        return _zero_padded(out, mask, pair_mask)

    return jax.jit(eval_step)


def make_sgdet_retry_eval_step(detector, relmodel,
                               thresholds=(0.2, 0.05, 0.01),
                               require_overlap: bool = True,
                               max_pairs: Optional[int] = None,
                               dedup: bool = True,
                               pair_ladder=(256,)):
    """ONE-pass sgdet eval with per-image post-hoc threshold selection.

    The reference re-detects each image at progressively lower box-score
    thresholds until it has >= 2 detections (lib/eval.py:125-133,227-228).
    Re-running the detector is unnecessary here: our fixed-shape NMS emits
    detections in descending score order (ops/nms.py), and for a greedy
    score-ordered NMS the keep-decision of any box depends only on
    higher-scored kept boxes — so the detections at threshold t are exactly
    the ``score > t`` prefix of the detections at the lowest threshold.
    (This holds under the same condition that makes the per-threshold runs
    themselves exact: at most ``nms_candidates`` candidates clear the
    threshold — see postprocess_detections.) One detector pass at
    min(thresholds) therefore reproduces every per-threshold run by
    masking, byte-identically (tests/test_sgdet.py).

    Per image the FIRST threshold with >= 2 detections is selected (the
    last one falls through regardless, as the reference's loop does), the
    relation head runs once on the selected masks, and padded entries are
    zeroed. With ``max_pairs`` the candidate pair set is additionally
    compacted (see compact_pairs); callers must check the ``pair_count``
    output for overflow and fall back to a dense-shape step — done by
    ``sgdet_eval_with_retry``.

    Outputs additionally carry ``sel_thresh`` (per-image chosen threshold)
    and ``pair_count`` (pre-compaction valid-pair count).

    ``pair_ladder``: intermediate pair budgets below ``max_pairs``. The
    relation head is the largest slice of the sgdet eval step (29.7 of
    58.7 ms at the fixed 1024 budget, tools/profile_sgdet.py) while a
    typical image yields far fewer overlap-filtered candidate pairs — so
    the step compiles one rel-head branch per rung and selects the
    smallest rung covering the batch's max valid-pair count with an
    in-program ``lax.switch`` (TPU conditionals execute only the taken
    branch; no host round-trip, which matters on the tunneled chip where
    a readback between two programs costs a full RTT per batch). Exact
    by the same argument as the predcls/sgcls eval ladder
    (eval/driver.py): compaction at a covering rung is order-preserving
    and lossless; a batch no rung covers escalates to the dense re-run
    via ``pair_count`` exactly as before. Branch outputs are padded to
    the top rung's shape with masked (all-False) slots.
    """
    ts = sorted(thresholds, reverse=True)
    t_min = ts[-1]
    rungs = ()
    if max_pairs is not None:
        rungs = tuple(sorted({r for r in (pair_ladder or ())
                              if r < max_pairs})) + (max_pairs,)

    def eval_step(variables, batch: GraphBatch):
        det_vars, rel_vars = variables
        # frozen-trunk feature cache (data/feature_cache.py): batches may
        # carry the precomputed trunk fmap; the detector then starts at
        # the RPN (vgg16 single-scale backbone only)
        kw = {"fmap": batch.fmaps} if batch.fmaps is not None else {}
        det = detector.apply(det_vars, batch.images, batch.im_hw,
                             train=False, score_thresh=t_min, **kw)
        boxes, labels = det["boxes"], det["labels"]
        scores, base_mask = det["scores"], det["mask"]

        # per-image first threshold with >= 2 detections, else the last
        masks_t = jnp.stack([base_mask & (scores > t) for t in ts], 1)
        counts = masks_t.sum(axis=2)                    # (B, T)
        ok = counts >= 2
        sel = jnp.where(ok.any(axis=1), jnp.argmax(ok, axis=1), len(ts) - 1)
        mask = jnp.take_along_axis(masks_t, sel[:, None, None], 1)[:, 0]
        sel_thresh = jnp.asarray(ts, jnp.float32)[sel]

        boxes = jnp.where(mask[..., None], boxes, 0.0)
        labels = jnp.where(mask, labels, 0)
        scores = jnp.where(mask, scores, 0.0)

        pairs, pair_mask = detection_pairs(boxes, mask, require_overlap)
        pair_count = pair_mask.sum(axis=1)

        def rel_fwd(cp, cm):
            o = relmodel.apply(rel_vars, None, boxes, labels, cp, cm,
                               fmap=det["fmap"], train=False,
                               mode="sgdet", dedup_unions=dedup)
            # fixed key order so every ladder branch returns an identical
            # pytree structure for lax.switch
            return o, cp, cm

        if max_pairs is not None and max_pairs < pairs.shape[1]:
            top = rungs[-1]

            def branch(r):
                def _b(_):
                    cp, cm, _cnt = compact_pairs(pairs, pair_mask, r)
                    o, cp, cm = rel_fwd(cp, cm)
                    pad = top - r
                    if pad:
                        def padE(x):  # pad the edge axis with masked slots
                            widths = [(0, 0), (0, pad)] + [(0, 0)] * (
                                x.ndim - 2)
                            return jnp.pad(x, widths)
                        for k in ("rel_logits",):
                            o[k] = padE(o[k])
                        cp, cm = padE(cp), padE(cm)
                    return o, cp, cm
                return _b

            if len(rungs) > 1:
                need = pair_count.max()
                idx = sum((need > r).astype(jnp.int32) for r in rungs[:-1])
                out, pairs, pair_mask = jax.lax.switch(
                    idx, [branch(r) for r in rungs], None)
            else:
                out, pairs, pair_mask = branch(top)(None)
        else:
            out, pairs, pair_mask = rel_fwd(pairs, pair_mask)
        out.update({
            "det_boxes": boxes, "det_labels": labels,
            "det_scores": scores, "det_mask": mask,
            "pairs": pairs, "pair_mask": pair_mask,
            "rel_dists": jax.nn.softmax(out["rel_logits"], axis=-1),
            "n_det": mask.sum(axis=1),
            "sel_thresh": sel_thresh, "pair_count": pair_count,
            # pre-cap NMS candidate count (postprocess_detections): callers
            # compare against detector.nms_candidates to detect cap overflow
            "n_nms_candidates": det["n_candidates"],
            # per-image rounds-NMS convergence (ops/nms.py): callers re-run
            # with an exact NMS method when any image is False
            "nms_converged": det["nms_converged"],
        })
        return _zero_padded(out, mask, pair_mask)

    return jax.jit(eval_step)


def make_sgdet_train_step(detector, relmodel, config: Config,
                          det_variables, require_overlap: bool = True):
    """Sgdet training step: frozen detector → rel_assignments →
    relation-head losses → SGD update of the relation head.

    ``det_variables`` stay frozen (main.py:62-63) but are passed to the
    jitted program as a runtime argument, NOT captured by the closure — a
    closed-over pytree is baked into the HLO as constants, and ~0.5 GB of
    VGG16 weights as inline constants overflows the compiler (observed:
    remote_compile HTTP 413 on the tunneled toolchain).

    TWO jitted programs, not one: the detector forward runs in its own
    jit and hands its (stop_gradient'ed) outputs device-resident to the
    assign+rel-head+update program. On the 2026-08 toolchain snapshot,
    fusing the frozen detector and the relation head into ONE program
    faulted the TPU worker whenever the edge axis was small (bisected:
    E=64/E=256 crashed, E=2450 ran, the rel head alone at E=64 ran).
    REPROBED later in round 3 (after the aligned-top_k and rounds-NMS
    rewrites changed the detector's codegen): the fused program now RUNS
    at E=256 — at the same throughput as this split (183.7 vs 182.7
    img/s at B=8), because the split boundary is zero-cost (stop_gradient
    frontier, intermediates stay device-resident). The split is retained:
    equal speed, and immune to the fault composition returning on a
    future toolchain.
    """
    loss_weights = (config.alpha, config.beta, config.gamma)

    def _det_fwd(v, im, hw, fm):
        kw = {"fmap": fm} if fm is not None else {}
        return jax.lax.stop_gradient(
            {k: x
             for k, x in detector.apply(v, im, hw, train=False,
                                        **kw).items()
             if k in ("boxes", "labels", "mask", "fmap", "nms_converged")})

    det_step = jax.jit(_det_fwd)

    def train_step(state: TrainState, batch: GraphBatch, key, det):
        k_rel, k_drop = jax.random.split(key)
        boxes, labels, mask = det["boxes"], det["labels"], det["mask"]

        rels, rel_mask = rel_assignments(
            k_rel, boxes, labels, mask, batch.boxes, batch.classes,
            batch.rels, batch.rel_mask,
            filter_non_overlap=require_overlap)
        pairs, rel_labels = rels[..., :2], rels[..., 2]

        # object targets for detections: class of the best-IoU GT
        # (class supervision on matched detections)
        iou = box_iou(boxes, batch.boxes)
        iou = jnp.where(batch.node_mask[:, None, :], iou, -1.0)
        best = iou.max(axis=2)
        matched = iou.argmax(axis=2)
        obj_targets = jnp.where(
            best >= 0.5,
            jnp.take_along_axis(batch.classes, matched, 1), 0)

        def loss_fn(params):
            out, mutated = relmodel.apply(
                {"params": params, "batch_stats": state.batch_stats},
                None, boxes, labels, pairs, rel_mask, fmap=det["fmap"],
                train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"], mode="sgdet")
            losses = {}
            losses.update(node_losses(out["obj_logits"], obj_targets, mask))
            losses.update(edge_losses(out["rel_logits"], rel_labels,
                                      rel_mask, config.loss, loss_weights))
            total = sum(jnp.asarray(v) for v in losses.values())
            return total, (losses, mutated)

        (total, (losses, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mutated["batch_stats"])
        metrics = dict(losses)
        metrics["total"] = total
        # rounds-NMS convergence monitor (see pretrain_detector.py): a
        # value < 1 means this step's detections are not provably the
        # greedy NMS solution — surfaced with the loss readback.
        metrics["nms_converged_frac"] = det[
            "nms_converged"].astype(jnp.float32).mean()
        return state, metrics

    jitted = jax.jit(train_step, donate_argnums=(0,))
    det_variables = jax.device_put(det_variables)

    def step(state: TrainState, batch: GraphBatch, key):
        det = det_step(det_variables, batch.images, batch.im_hw,
                       batch.fmaps)
        return jitted(state, batch, key, det)

    return step


# default candidate-pair budget for the compacted sgdet eval step; covers
# any image with up to ~32 mutually-overlapping detections (a real image
# rarely has more than ~30 detections at all), with an exact dense
# fallback when exceeded.
SGDET_EVAL_MAX_PAIRS = 1024


def sgdet_eval_with_retry(detector, relmodel, variables, batch: GraphBatch,
                          thresholds=(0.2, 0.05, 0.01),
                          require_overlap: bool = True,
                          _cache: Optional[dict] = None,
                          max_pairs: Optional[int] = SGDET_EVAL_MAX_PAIRS):
    """Per-image box-threshold retry (reference lib/eval.py:125-133,227-228).

    The reference evaluates at batch size 1 and re-detects a single image
    at progressively lower score thresholds (0.2 -> 0.05 -> 0.01) until it
    has >= 2 detections; per image the first satisfying threshold's
    detections are kept. Implemented as ONE jitted pass (see
    make_sgdet_retry_eval_step for the equivalence argument) with a
    compacted candidate-pair set; batches where some image exceeds
    ``max_pairs`` valid pairs re-run through the dense-shape step, so the
    result is always exact.

    All three exactness caps are checked and escalated here:

    * pair budget: ``pair_count > max_pairs`` re-runs dense-shape;
    * NMS candidate cap: ``n_nms_candidates > detector.nms_candidates``
      (more candidates cleared the lowest threshold than the top-M
      prefilter kept — see ``postprocess_detections``) re-runs with the
      cap doubled until it covers, restoring the prefix-equivalence
      precondition;
    * rounds-NMS budget: any False in ``nms_converged`` (a suppression
      chain deeper than ``detector.nms_rounds`` — see ops/nms.py) re-runs
      with ``nms_method="sequential"``, which is exact unconditionally.

    Overflow/fallback rates accumulate in ``sgg_tpu.utils.counters``
    (``sgdet_batches``, ``sgdet_pair_overflow``,
    ``sgdet_nms_cand_overflow``, ``sgdet_nms_unconverged``)."""
    import numpy as np

    from sgg_tpu.utils import counters

    cache = _cache if _cache is not None else {}

    def get_step(det, mp, dedup=True):
        key = ("retry", tuple(thresholds), require_overlap, mp, dedup,
               getattr(det, "nms_candidates", None),
               getattr(det, "nms_method", None))
        if key not in cache:
            cache[key] = make_sgdet_retry_eval_step(
                det, relmodel, thresholds=thresholds,
                require_overlap=require_overlap, max_pairs=mp, dedup=dedup)
        return cache[key]

    counters.bump("sgdet_batches")
    mp = max_pairs
    dedup = True
    out = get_step(detector, mp, dedup)(variables, batch)

    # Escalation loop: every re-run is re-checked against ALL three
    # exactness conditions (a cap-escalated re-run can itself push the
    # rounds NMS past its budget, etc.). Each escalation is monotone —
    # sequential NMS stays, the candidate cap only grows, the pair budget
    # only drops to dense — so the loop terminates; the bound is a
    # safety net.
    for _ in range(8):
        # rounds-NMS convergence: an unconverged image's keep set is not
        # (provably) the greedy solution — switch to the unconditionally
        # exact sequential method.
        if ("nms_converged" in out
                and not bool(np.all(np.asarray(out["nms_converged"])))
                and getattr(detector, "nms_method", None) != "sequential"):
            counters.bump("sgdet_nms_unconverged")
            detector = detector.clone(nms_method="sequential")
            out = get_step(detector, mp, dedup)(variables, batch)
            continue

        # NMS candidate cap (exactness precondition of the retry step's
        # prefix argument): double M until it covers the batch.
        cap = getattr(detector, "nms_candidates", None)
        if cap is not None and "n_nms_candidates" in out:
            need = int(np.max(np.asarray(out["n_nms_candidates"])))
            if need > cap:
                counters.bump("sgdet_nms_cand_overflow")
                new_cap = cap
                while new_cap < need:
                    new_cap *= 2
                detector = detector.clone(nms_candidates=new_cap)
                out = get_step(detector, mp, dedup)(variables, batch)
                continue

        # pair budget: overflow re-runs with the dense shape.
        if (mp is not None
                and int(np.max(np.asarray(out["pair_count"]))) > mp):
            counters.bump("sgdet_pair_overflow")
            mp = None
            out = get_step(detector, mp, dedup)(variables, batch)
            continue

        # unordered-union dedup exactness: a non-swap-closed pair set
        # (never produced by detection_pairs + in-budget compaction, but
        # checked regardless) overflows the half-size unique budget —
        # re-run without dedup.
        if (dedup and "dedup_ok" in out
                and not bool(np.all(np.asarray(out["dedup_ok"])))):
            counters.bump("sgdet_dedup_fallback")
            dedup = False
            out = get_step(detector, mp, dedup)(variables, batch)
            continue
        break
    return {k: np.asarray(v) for k, v in out.items()}
