"""Object-detection evaluation: COCO-style mAP over IoU thresholds.

Replaces the reference's pycocotools plumbing (``/root/reference/detector/
coco_eval.py``, ``coco_utils.py`` — a faux-COCO conversion of VG feeding
``CocoEvaluator``) with a self-contained numpy implementation of the same
protocol: per-class average precision with 101-point interpolation,
greedy matching to GT by descending score at each IoU threshold, averaged
over IoU 0.5:0.95 (plus AP50/AP75 reported separately).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from sgg_tpu.eval.sgg_eval import np_box_iou

COCO_IOUS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def _ap_from_pr(recall: np.ndarray, precision: np.ndarray) -> float:
    """COCO 101-point interpolated AP."""
    order = np.argsort(recall)
    recall, precision = recall[order], precision[order]
    # precision envelope
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    grid = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, grid, side="left")
    p = np.where(idx < len(precision), precision[np.minimum(
        idx, len(precision) - 1)], 0.0)
    p[idx >= len(precision)] = 0.0
    return float(p.mean())


class DetectionEvaluator:
    """Accumulates per-image detections/GT and computes mAP."""

    def __init__(self, num_classes: int, ious: Sequence[float] = COCO_IOUS):
        self.num_classes = num_classes
        self.ious = tuple(ious)
        # per class: list of (score, is_tp per iou) + gt count
        self._dets: Dict[int, List] = {c: [] for c in range(1, num_classes)}
        self._gt_count = np.zeros(num_classes, np.int64)

    def add_image(self, det_boxes, det_labels, det_scores, gt_boxes,
                  gt_labels):
        """All arrays unpadded numpy for one image."""
        self._gt_count += np.bincount(gt_labels,
                                      minlength=self.num_classes)
        for c in set(det_labels.tolist()):
            if c == 0:
                continue
            d_idx = np.nonzero(det_labels == c)[0]
            g_idx = np.nonzero(gt_labels == c)[0]
            order = d_idx[np.argsort(-det_scores[d_idx])]
            iou = (np_box_iou(det_boxes[order], gt_boxes[g_idx])
                   if len(g_idx) else np.zeros((len(order), 0)))
            for t in self.ious:
                taken = np.zeros(len(g_idx), bool)
                for rank, di in enumerate(order):
                    tp = False
                    if iou.shape[1]:
                        cand = np.where(~taken, iou[rank], -1.0)
                        j = cand.argmax()
                        if cand[j] >= t:
                            taken[j] = True
                            tp = True
                    self._dets[c].append(
                        (float(det_scores[di]), t, tp))

    def results(self) -> Dict[str, float]:
        ap_per_iou = {t: [] for t in self.ious}
        for c in range(1, self.num_classes):
            n_gt = self._gt_count[c]
            if n_gt == 0:
                continue
            recs = self._dets[c]
            for t in self.ious:
                entries = sorted([r for r in recs if r[1] == t],
                                 key=lambda r: -r[0])
                if not entries:
                    ap_per_iou[t].append(0.0)
                    continue
                tp = np.asarray([e[2] for e in entries], np.float64)
                tp_cum = np.cumsum(tp)
                fp_cum = np.cumsum(1 - tp)
                recall = tp_cum / n_gt
                precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                ap_per_iou[t].append(_ap_from_pr(recall, precision))
        out = {}
        means = [np.mean(v) if v else 0.0 for v in ap_per_iou.values()]
        out["mAP"] = float(np.mean(means))
        out["AP50"] = float(np.mean(ap_per_iou[0.5])
                            if ap_per_iou[0.5] else 0.0)
        if 0.75 in ap_per_iou:
            out["AP75"] = float(np.mean(ap_per_iou[0.75])
                                if ap_per_iou[0.75] else 0.0)
        return out
