"""Checkpoint save/restore (Orbax) + reference-checkpoint import shim.

Rebuild of the reference checkpoint machinery
(``/root/reference/lib/pytorch_misc.py:160-233``): per-epoch save of model +
optimizer + epoch counter to ``vgrel.pth`` with auto-resume, tolerant
("optimistic") partial restore, and an explicit key-rename map for importing
Rowan Zellers' VGG16 detector checkpoints
(``pytorch_misc.py:183-203``).

TPU-native shape: the whole ``TrainState`` (params, batch_stats, optimizer
state, step) is one pytree checkpointed via Orbax; the torch import shim maps
reference ``state_dict`` names onto our Flax param tree so reference-trained
weights can be ingested for apples-to-apples parity runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from sgg_tpu.train.state import TrainState

CKPT_NAME = "vgrel"  # parity with the reference's vgrel.pth naming


def _manager(save_dir: str):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(save_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=3,
                                             create=True))


def save_payload(save_dir: str, payload: Dict[str, Any], epoch: int) -> None:
    """Save an arbitrary pytree payload under the epoch step."""
    import orbax.checkpoint as ocp
    mgr = _manager(save_dir)
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def restore_payload(save_dir: str, template: Optional[Dict[str, Any]] = None,
                    epoch: Optional[int] = None):
    """Restore a payload into a template; returns (payload, epoch) with
    epoch=-1 when nothing exists. With template=None the save-time
    structure is restored as numpy arrays."""
    import orbax.checkpoint as ocp
    mgr = _manager(save_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            return template, -1
    if template is None:
        restored = mgr.restore(epoch)
    else:
        restored = mgr.restore(epoch,
                               args=ocp.args.StandardRestore(template))
    return restored, int(epoch)


def save_checkpoint(save_dir: str, state: TrainState, epoch: int,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """Save the train state (reference save_checkpoint,
    pytorch_misc.py:217-233)."""
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(epoch),
    }
    if extra:
        payload["extra"] = extra
    save_payload(save_dir, payload, epoch)


def latest_epoch(save_dir: str) -> Optional[int]:
    if not os.path.isdir(save_dir):
        return None
    step = _manager(save_dir).latest_step()
    return None if step is None else int(step)


def restore_checkpoint(save_dir: str, state: TrainState,
                       epoch: Optional[int] = None):
    """Restore into an existing state skeleton; returns (state, epoch).

    Auto-resumes from the latest epoch when ``epoch`` is None (the reference
    auto-resumes from ``save_dir/vgrel.pth``, pytorch_misc.py:164-177).
    """
    import orbax.checkpoint as ocp
    mgr = _manager(save_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            return state, -1
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(0),
    }
    restored = mgr.restore(epoch, args=ocp.args.StandardRestore(template))
    state = state.replace(step=restored["step"], params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"])
    return state, int(restored["epoch"])


# ---------------------------------------------------------------------------
# tolerant parameter transplanting (reference optimistic_restore,
# pytorch_misc.py:17-57)

def optimistic_update(params, flat_updates: Dict[str, np.ndarray],
                      verbose: bool = False):
    """Copy matching-shape arrays from a {'a/b/c': array} dict into a Flax
    param tree; silently skip missing keys and shape mismatches."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    new_leaves = []
    used = set()
    for (path, leaf) in flat[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name in flat_updates and flat_updates[name].shape == leaf.shape:
            new_leaves.append(np.asarray(flat_updates[name], leaf.dtype))
            used.add(name)
        else:
            if verbose and name in flat_updates:
                print(f"shape mismatch for {name}: "
                      f"{flat_updates[name].shape} vs {leaf.shape}")
            new_leaves.append(leaf)
    if verbose:
        unused = set(flat_updates) - used
        if unused:
            print("unused checkpoint keys:", sorted(unused)[:20])
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# torch name -> flax path mapping for the VGG16 trunk/heads. The reference's
# own rename map (pytorch_misc.py:183-203) converts Rowan Zellers' checkpoint
# names to torchvision FasterRCNN names; this table goes one step further to
# our Flax tree. Conv kernels transpose OIHW->HWIO; dense kernels transpose.
def torch_vgg_key_map() -> Dict[str, str]:
    """Maps torchvision ``vgg16.features.{i}`` conv indices to our trunk
    conv names (sequential conv counter over VGG16_CFG)."""
    from sgg_tpu.models.backbone import VGG16_CFG
    mapping = {}
    conv_i = 0       # our Conv_i counter
    torch_i = 0      # torchvision features index (convs and pools interleave)
    for v in VGG16_CFG:
        if v == "M":
            torch_i += 1
        else:
            mapping[f"features.{torch_i}"] = f"trunk/Conv_{conv_i}"
            torch_i += 2  # conv + relu
            conv_i += 1
    return mapping


def import_torch_vgg(params, torch_state: Dict[str, "np.ndarray"],
                     verbose: bool = False):
    """Transplant a torchvision-format VGG16 ``state_dict`` (as numpy) into
    our param tree: trunk convs + roi_fmap/roi_fmap_obj fc6/fc7."""
    flat: Dict[str, np.ndarray] = {}
    for tname, ours in torch_vgg_key_map().items():
        w = torch_state.get(f"{tname}.weight")
        b = torch_state.get(f"{tname}.bias")
        if w is not None:
            flat[f"{ours}/kernel"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
        if b is not None:
            flat[f"{ours}/bias"] = np.asarray(b)
    # classifier -> both RoI heads (the reference duplicates the classifier
    # into roi_fmap and roi_fmap_obj, pytorch_misc.py:195-203)
    for head in ("roi_fmap", "roi_fmap_obj"):
        for tidx, ours in (("0", "fc6"), ("3", "fc7")):
            w = torch_state.get(f"classifier.{tidx}.weight")
            b = torch_state.get(f"classifier.{tidx}.bias")
            if w is not None:
                flat[f"{head}/{ours}/kernel"] = np.asarray(w).T
            if b is not None:
                flat[f"{head}/{ours}/bias"] = np.asarray(b)
    return optimistic_update(params, flat, verbose=verbose)


# torchvision FasterRCNN(vgg16) state_dict -> our FasterRCNNVGG tree. The
# reference loads such detector checkpoints before SGG training
# (pytorch_misc.py:183-211, "sgdet refuses to start without one"); this map
# lets the same checkpoints drive apples-to-apples parity runs here.
_DETECTOR_DENSE = {
    "roi_heads.box_head.fc6": "box_head/fc6",
    "roi_heads.box_head.fc7": "box_head/fc7",
    "roi_heads.box_predictor.cls_score": "cls_score",
    "roi_heads.box_predictor.bbox_pred": "bbox_pred",
}
_DETECTOR_CONV = {
    "rpn.head.conv": "rpn/conv",
    "rpn.head.cls_logits": "rpn/cls_logits",
    "rpn.head.bbox_pred": "rpn/bbox_pred",
}


def import_torch_faster_rcnn(params, torch_state: Dict[str, "np.ndarray"],
                             verbose: bool = False):
    """Transplant a torchvision ``FasterRCNN(vgg16)`` state_dict (as numpy)
    into a ``FasterRCNNVGG`` param tree: backbone convs, RPN head, box head
    and predictors."""
    flat: Dict[str, np.ndarray] = {}
    # backbone convs: torchvision stores them as backbone.{i}
    for tname, ours in torch_vgg_key_map().items():
        idx = tname.split(".")[1]
        w = torch_state.get(f"backbone.{idx}.weight")
        b = torch_state.get(f"backbone.{idx}.bias")
        ours = ours.replace("trunk/", "trunk/")
        if w is not None:
            flat[f"{ours}/kernel"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
        if b is not None:
            flat[f"{ours}/bias"] = np.asarray(b)
    for tname, ours in _DETECTOR_CONV.items():
        w = torch_state.get(f"{tname}.weight")
        b = torch_state.get(f"{tname}.bias")
        if w is not None:
            flat[f"{ours}/kernel"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
        if b is not None:
            flat[f"{ours}/bias"] = np.asarray(b)
    for tname, ours in _DETECTOR_DENSE.items():
        w = torch_state.get(f"{tname}.weight")
        b = torch_state.get(f"{tname}.bias")
        if w is not None:
            flat[f"{ours}/kernel"] = np.asarray(w).T
        if b is not None:
            flat[f"{ours}/bias"] = np.asarray(b)
    return optimistic_update(params, flat, verbose=verbose)


def load_torch_state_dict(path: str) -> Dict[str, "np.ndarray"]:
    """Read a .pth checkpoint into a {name: numpy} dict (CPU torch)."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in state.items()
            if hasattr(v, "numpy")}
