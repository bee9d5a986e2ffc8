"""Shared machinery for differential tests against /root/reference (oracle).

Installs numpy compat aliases and stub modules for the native dependencies
the reference imports but our oracles never execute (torchvision C++ ops and
detection models; dill), then exposes the read-only reference checkout on
sys.path. The reference path is APPENDED so its root-level module names
(config, main, pretrain_detector) cannot shadow ours.
"""

import sys
import types

import numpy as np

REF = "/root/reference"


def _stub_torchvision(torch):
    if "torchvision" in sys.modules:
        return

    def _box_iou(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.maximum(a[:, None, :2], b[None, :, :2])
        rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None] - inter)

    class _Unavailable:
        def __init__(self, *a, **k):
            raise NotImplementedError("torchvision stub")

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_boxes = types.ModuleType("torchvision.ops.boxes")
    tv_models = types.ModuleType("torchvision.models")
    tv_det = types.ModuleType("torchvision.models.detection")
    tv_frcnn = types.ModuleType("torchvision.models.detection.faster_rcnn")
    tv_rpn = types.ModuleType("torchvision.models.detection.rpn")
    tv_tf = types.ModuleType("torchvision.transforms")

    tv_boxes.box_iou = _box_iou
    tv_ops.boxes = tv_boxes
    tv_ops.roi_align = _Unavailable
    tv_ops.MultiScaleRoIAlign = _Unavailable
    tv_models.vgg16 = _Unavailable
    tv_models.detection = tv_det
    tv_det.FasterRCNN = _Unavailable
    tv_det.maskrcnn_resnet50_fpn = _Unavailable
    tv_frcnn.TwoMLPHead = _Unavailable
    tv_frcnn.FastRCNNPredictor = _Unavailable
    tv_rpn.AnchorGenerator = _Unavailable
    tv_det.faster_rcnn = tv_frcnn
    tv_det.rpn = tv_rpn
    # transforms are imported (never executed) by dataloaders.visual_genome
    for n in ("Resize", "Compose", "ToTensor", "Normalize"):
        setattr(tv_tf, n, _Unavailable)
    tv.ops = tv_ops
    tv.models = tv_models
    tv.transforms = tv_tf

    for name, mod in (("torchvision", tv), ("torchvision.ops", tv_ops),
                      ("torchvision.ops.boxes", tv_boxes),
                      ("torchvision.models", tv_models),
                      ("torchvision.models.detection", tv_det),
                      ("torchvision.models.detection.faster_rcnn", tv_frcnn),
                      ("torchvision.models.detection.rpn", tv_rpn),
                      ("torchvision.transforms", tv_tf)):
        sys.modules[name] = mod


def load_reference():
    """Install stubs + path; returns the torch module. Skips if unusable."""
    import pytest
    try:
        import torch
    except ImportError:
        pytest.skip("torch unavailable")
    for name, repl in (("int", int), ("float", float), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, repl)
    _stub_torchvision(torch)
    if "dill" not in sys.modules:
        try:
            import dill  # noqa: F401
        except ImportError:
            import pickle
            sys.modules["dill"] = pickle
    if REF not in sys.path:
        sys.path.append(REF)
    return torch
