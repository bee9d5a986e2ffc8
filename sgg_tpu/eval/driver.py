"""Evaluation driver: run a model over an eval split and compute all metrics.

Rebuild of ``val_epoch``/``val_batch`` (``/root/reference/lib/eval.py``):

* sgcls runs both predcls+sgcls evaluators (``eval.py:21``);
* GC + no-GC evaluators, per-predicate mean-recall lists (skipped for
  zero-shot and val splits, ``eval.py:46-53``), per-triplet stats for
  all-shot splits (``eval.py:41``);
* optional predicate down-weighting by frequency^pred_weight
  (``eval.py:24-29,164-168``);
* sgdet box-threshold retry loop 0.2→0.05→0.01 (``eval.py:125-133``).

TPU-native differences: eval batches are padded fixed-shape (the reference
forces batch size 1, ``visual_genome.py:730``) and the forward is one jitted
program; matching runs in the original numpy evaluator on the host. Boxes
are compared in the model's IM_SCALE frame for both GT and predictions —
IoU is scale-invariant, so metrics match the reference's original-pixel
evaluation.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data.datasets import SGGDataset
from sgg_tpu.data.pipeline import BatchLoader
from sgg_tpu.eval.sgg_eval import MeanRecallEvaluator, SGGEvaluator
from sgg_tpu.eval.surgery import filter_dets
from sgg_tpu.models.frequency_bias import count_matrices
from sgg_tpu.utils import counters

ALL_SHOT_SPLITS = ("val_alls", "test_alls")


def predicate_reweighting(train: SGGDataset, pred_weight: float) -> np.ndarray:
    """Per-predicate weights from dataset frequency (eval.py:24-29)."""
    fg, bg = count_matrices(train.gt_boxes, train.gt_classes,
                            train.relationships, train.num_classes,
                            train.num_predicates, must_overlap=True)
    fg[:, :, 0] = bg + 1
    fg = fg + 1
    return fg.mean(axis=(0, 1)) ** pred_weight


def apply_predicate_weights(rel_scores: np.ndarray,
                            weights: np.ndarray) -> np.ndarray:
    """Down-weight frequent predicates and renormalize (eval.py:164-168)."""
    out = rel_scores.copy()
    out[:, 1:] = out[:, 1:] * (1.0 / weights[1:])
    out = out / out.sum(axis=1, keepdims=True)
    return out


def val_epoch(model, variables, dataset: SGGDataset, config: Config,
              name: str, *, train: Optional[SGGDataset] = None,
              n_batches: int = -1, eval_batch_size: Optional[int] = None,
              with_images: bool = True, collect_entries: bool = False,
              detector=None, det_variables=None,
              log_fn=None, verbose: bool = True,
              pair_ladder=None, mesh=None,
              feature_cache=None) -> Dict[str, float]:
    """Evaluate one split of ``model`` (a RelModelIMP-compatible module).

    Returns a flat results dict ``{eval_m}/{name}_R@K_{GC|NOGC}`` etc.
    Runs one jitted forward per eval regime (the reference re-runs the model
    with ``set_mode`` per regime, eval.py:56). For sgdet, pass the detector
    module + its frozen variables; the box-threshold retry loop of
    ``eval.py:125-133`` applies.

    ``pair_ladder``: candidate-pair budgets to compile (ascending,
    ``None`` = dense N*(N-1)); default ``[128, 512, 2048, None]``. Per
    batch the smallest rung covering every image's valid pairs is used
    (exact — see ``compact_pairs``); batches no rung covers run dense.
    Pass ``[None]`` to disable compaction.

    ``feature_cache``: optional frozen-trunk cache for this split
    (``data/feature_cache.py``) — batches then carry precomputed fmaps and
    the trunk never runs (exact; eval never flips).

    ``mesh``: a ``jax.sharding.Mesh`` to data-parallelize eval over —
    variables are replicated and each batch's leading axis sharded (the
    forward has no cross-image coupling, so XLA runs it embarrassingly
    parallel; no collectives). Batches whose size doesn't divide the mesh
    run unsharded. Metrics are identical either way (the numpy evaluator
    consumes gathered outputs).
    """
    from sgg_tpu.train.step import make_eval_step

    eval_modes = ["sgdet"] if config.mode == "sgdet" else ["predcls", "sgcls"]
    if config.mode == "sgdet":
        assert detector is not None and det_variables is not None, (
            "sgdet evaluation needs the detector")

    pred_weights = None
    if config.pred_weight != 0 and train is not None:
        pred_weights = predicate_reweighting(train, config.pred_weight)

    per_triplet = name in ALL_SHOT_SPLITS
    with_mr = not name.startswith("val_") and "zs" not in name

    evaluators = {}
    mr_lists = {}
    for m in eval_modes:
        if m == "sgdet" and name.startswith("val_"):
            continue  # skipped for validation (eval.py:34-35)
        evaluators[m] = SGGEvaluator(m)
        # per-triplet normalized metrics weight GT triplets by their
        # TRAINING-set frequency (reference main.py:260-261 passes
        # train_loader.dataset.triplet_counts), not the eval split's own
        # counts
        tc = (train.triplet_counts if train is not None
              else dataset.triplet_counts)
        evaluators[m + "_nogc"] = SGGEvaluator(
            m, multiple_preds=True, per_triplet=per_triplet,
            triplet_counts=tc if per_triplet else None)
        if with_mr:
            mr_lists[m] = MeanRecallEvaluator(m, dataset.ind_to_predicates)
            mr_lists[m + "_nogc"] = MeanRecallEvaluator(
                m, dataset.ind_to_predicates, multiple_preds=True)

    # The reference evaluates EVERY GT object at batch size 1
    # (dataloaders/visual_genome.py:730, lib/eval.py:144-170); a fixed
    # max_nodes bucket would silently drop GT relations of large graphs from
    # the recall denominator. Size the eval bucket to the split's true
    # maximum (rounded up for TPU tiling) so no graph is ever truncated.
    n_obj_max = max((len(c) for c in dataset.gt_classes), default=2)
    eval_nodes = max(config.max_nodes, -(-n_obj_max // 8) * 8)

    entries = []
    n_evaluated = 0
    counters_before = counters.snapshot()
    sgdet_cache: Dict = {}
    # Pair-budget ladder: the bucket is sized to the split's LARGEST graph,
    # so the dense N*(N-1) enumeration wastes most of its compute on masked
    # pairs for typical images. Per batch, pick the smallest compiled
    # budget that covers max_i n_i*(n_i-1) — exact by construction
    # (compact_pairs is an order-preserving gather of the valid pairs).
    full_pairs = eval_nodes * (eval_nodes - 1)
    if pair_ladder is None:
        pair_ladder = [b for b in (128, 512, 2048) if b < full_pairs] + [None]
    step_cache: Dict = {}

    mesh_spans_processes = False
    if mesh is not None:
        from sgg_tpu.parallel.mesh import (is_multiprocess, replicate,
                                           shard_batch)
        mesh_spans_processes = is_multiprocess(mesh)
        variables = replicate(variables, mesh)
        if det_variables is not None:
            det_variables = replicate(det_variables, mesh)

    def get_eval_step(m, budget, dedup=True):
        key = (m, budget, dedup)
        if key not in step_cache:
            step_cache[key] = make_eval_step(model, mode=m,
                                             max_pairs=budget, dedup=dedup)
        return step_cache[key]

    for m in eval_modes:
        if m not in evaluators:
            continue
        # measured per-protocol sweet spots on v5e (STATUS round-3): the
        # predcls/sgcls all-pairs step gains ~7-11% at B=16, while the
        # sgdet detector step regresses past B=8
        bs = eval_batch_size or (8 if m == "sgdet" else 16)
        from sgg_tpu.constants import IM_SCALE
        loader = BatchLoader(dataset, batch_size=bs,
                             max_nodes=eval_nodes,
                             max_edges=config.max_edges, shuffle=False,
                             drop_last=False, with_images=with_images,
                             feature_cache=feature_cache,
                             # a cache knows the canvas scale it was
                             # extracted at (tests use small canvases)
                             im_scale=(feature_cache.im_scale
                                       if feature_cache is not None
                                       else IM_SCALE))
        img_base = 0
        for b_i, batch in enumerate(loader):
            if n_batches > -1 and b_i >= n_batches:
                break
            # host copies BEFORE any device placement: the per-image loop
            # below and the budget pick read these repeatedly, and reading
            # them back from a sharded batch would be a D2H per access
            gt_node_mask = np.asarray(batch.node_mask)
            gt_boxes_b = np.asarray(batch.boxes)
            # sgdet outputs are consumed with np.asarray inside the retry
            # wrapper (no process_allgather), which cannot fetch arrays
            # spanning non-addressable devices — keep sgdet batches
            # unsharded on process-spanning meshes
            if mesh is not None and batch.batch_size % mesh.size == 0 \
                    and not (m == "sgdet" and mesh_spans_processes):
                batch = shard_batch(batch, mesh)
            if m == "sgdet":
                from sgg_tpu.models.sgdet import sgdet_eval_with_retry
                out = sgdet_eval_with_retry(
                    detector, model, (det_variables, variables), batch,
                    _cache=sgdet_cache)
                node_mask = np.asarray(out["det_mask"])
                boxes = np.asarray(out["det_boxes"])
            else:
                n_i = gt_node_mask.sum(axis=1)
                need = int((n_i * (n_i - 1)).max()) if len(n_i) else 0
                # dense (None) fallback when a caller-supplied ladder has
                # no rung covering this batch — exactness over speed
                budget = next((b for b in pair_ladder
                               if b is None or b >= need), None)
                counters.bump("eval_ladder_batches")
                counters.bump("eval_ladder_dense" if budget is None
                              else f"eval_ladder_rung_{budget}")
                for dedup in (True, False):
                    out = get_eval_step(m, budget, dedup)(variables, batch)
                    if mesh is not None and mesh_spans_processes:
                        # multi-host DP eval: outputs are sharded across
                        # processes; gather the full value on every host so
                        # the numpy evaluator sees all images (each host
                        # then computes identical metrics)
                        from jax.experimental import multihost_utils
                        # tiled=True: global arrays are fetched as their
                        # full value (the only supported mode for them)
                        out = multihost_utils.process_allgather(out,
                                                                tiled=True)
                    # unordered-union dedup exactness check: all-pairs
                    # enumerations are swap-closed so this never fires in
                    # practice; the fallback keeps eval exact regardless
                    if dedup and not bool(
                            np.all(np.asarray(out.get("dedup_ok", True)))):
                        counters.bump("eval_dedup_fallback")
                        continue
                    break
                node_mask = gt_node_mask
                boxes = gt_boxes_b
            obj_scores = np.asarray(out["obj_scores"], np.float32)
            obj_preds = np.asarray(out["obj_preds"])
            rel_dists = np.asarray(out["rel_dists"], np.float32)
            pairs = np.asarray(out["pairs"])
            pair_mask = np.asarray(out["pair_mask"])
            for i in range(batch.batch_size):
                idx = img_base + i
                if idx >= len(dataset):
                    break
                n = int(node_mask[i].sum())
                gt_rels = dataset.relationships[idx]
                if len(gt_rels) == 0 or n == 0:
                    continue
                if m == "sgdet" and n < 2:
                    # reference protocol: <2 detections at every retry
                    # threshold raises (rel_model_base.py:234-235) and the
                    # image never reaches the evaluator (lib/eval.py:
                    # 227-228 falls through) — scoring it 0 would bias
                    # recall low vs the reference
                    continue
                entry = filter_dets(boxes[i][:n], obj_scores[i][:n],
                                    obj_preds[i][:n], pairs[i], rel_dists[i],
                                    pair_mask[i])
                if pred_weights is not None:
                    entry["rel_scores"] = apply_predicate_weights(
                        entry["rel_scores"], pred_weights)
                # GT in the same (padded-frame) coordinate space as the
                # predictions. The bucket is sized to the split maximum
                # above, so truncation cannot happen — enforce it.
                n_gt = int(gt_node_mask[i].sum())
                if n_gt != len(dataset.gt_classes[idx]):
                    raise RuntimeError(
                        f"eval graph truncated: image {idx} has "
                        f"{len(dataset.gt_classes[idx])} GT objects but the "
                        f"batch carries {n_gt} (bucket {eval_nodes})")
                gt_entry = {
                    "gt_classes": dataset.gt_classes[idx][:n_gt],
                    "gt_relations": gt_rels,
                    "gt_boxes": gt_boxes_b[i][:n_gt],
                }
                if len(gt_entry["gt_relations"]) == 0:
                    continue
                if collect_entries and m == eval_modes[0]:
                    # export boxes in ORIGINAL image pixels (reference
                    # rm_box_priors_org, rel_model_base.py:237-240) so
                    # artifacts are comparable to reference dumps; the
                    # evaluators keep working in the IM_SCALE frame
                    # (IoU-invariant).
                    export = dict(entry)
                    if batch.im_scale_org is not None:
                        export["pred_boxes"] = (
                            entry["pred_boxes"]
                            * float(np.asarray(batch.im_scale_org)[i]))
                    entries.append(export)
                evaluators[m].add_image(gt_entry, entry)
                evaluators[m + "_nogc"].add_image(gt_entry, entry)
                n_evaluated += 1
                if with_mr:
                    mr_lists[m].add_image(gt_entry, entry)
                    mr_lists[m + "_nogc"].add_image(gt_entry, entry)
            img_base += batch.batch_size

    if n_evaluated == 0 and len(dataset) > 0 and evaluators and \
            n_batches != 0:
        raise RuntimeError(
            f"val_epoch evaluated zero images over '{name}' "
            f"({len(dataset)} available) — broken input pipeline?")

    results: Dict[str, float] = {}
    for m in eval_modes:
        if m not in evaluators:
            continue
        for key, sfx in ((m, "GC"), (m + "_nogc", "NOGC")):
            res = evaluators[key].results(verbose=verbose)
            for rk, v in res.items():
                if rk.startswith("R@"):
                    results[f"{m}/{name}_{rk}_{sfx}"] = v
                else:
                    results[f"{m}/{name}_{rk}"] = v
            if with_mr:
                for rk, v in mr_lists[key].results().items():
                    results[f"{m}/{name}_{rk}_{sfx}"] = v
    # headline scalar: mean of every R@K over all regimes and GC settings
    # (reference 'avg/%s_R', lib/eval.py:91,114)
    r_vals = [v for k, v in results.items()
              if "_R@" in k and np.isfinite(v)]
    if r_vals:
        results[f"avg/{name}_R"] = float(np.mean(r_vals))

    if log_fn is not None:
        log_fn(results)
    # exactness-cap instrumentation (VERDICT r2 "weak #3"): which ladder
    # rungs ran and how often the sgdet pair/NMS caps overflowed to their
    # exact fallbacks — so a real-data run shows whether the compiled fast
    # paths actually applied. Attached after log_fn (non-scalar values).
    cap_events = counters.delta(counters_before)
    if cap_events:
        results["_counters"] = cap_events  # type: ignore
        if verbose:
            print(f"[val_epoch {name}] exactness-cap counters: {cap_events}")
    if collect_entries:
        results["_entries"] = entries  # type: ignore
    return results
