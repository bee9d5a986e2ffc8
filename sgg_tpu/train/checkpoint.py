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
        # Template-less restore must be DEVICE-AGNOSTIC: a bare
        # mgr.restore(epoch) places arrays per the save-time sharding
        # metadata, which names the saving device ("TPU v5 lite0") and
        # fails in a process without it (detector checkpoints are
        # pretrained on the chip and consumed by CPU eval/test runs).
        # Build the template from the checkpoint's own tree metadata and
        # pin every leaf to this process's default device.
        restored = _restore_to_local_device(save_dir, epoch)
    else:
        restored = mgr.restore(epoch,
                               args=ocp.args.StandardRestore(template))
    return restored, int(epoch)


def optimistic_restore_payload(save_dir: str, template: Dict[str, Any],
                               epoch: Optional[int] = None,
                               verbose: bool = True):
    """Tolerant resume (reference ``optimistic_restore``,
    pytorch_misc.py:17-57): restore whatever the checkpoint holds and
    transplant every same-path same-shape leaf into ``template``, keeping
    the template's value elsewhere. Unlike the strict ``restore_payload``
    this survives cross-mode resumes (e.g. an sgcls checkpoint consumed by
    an sgdet run whose state tree has extra detector leaves — the
    reference's GQA SGGen workflow, README.md:239-243) and cross-device
    restores (the on-disk tree is loaded device-agnostically).

    Returns (merged_payload, epoch, on_disk_keys, stats); epoch=-1 when
    nothing exists. ``stats`` reports coverage: ``stats["missing"]`` lists
    template leaf paths NOT filled from disk (empty = the restore was
    exact, i.e. equivalent to a strict StandardRestore) and
    ``stats["unused"]`` lists on-disk leaves with no matching-shape home.
    Callers resuming a run from its OWN save_dir should treat a non-empty
    ``missing`` as suspicious — a partly random-init resume at a saved
    epoch is usually a config drift, not an intended cross-mode resume.
    """
    mgr = _manager(save_dir)
    if epoch is None:
        epoch = mgr.latest_step()
        if epoch is None:
            return template, -1, set(), {"missing": [], "unused": []}
    on_disk = _restore_to_local_device(save_dir, epoch)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(on_disk)[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        flat[name] = np.asarray(leaf)
    merged, stats = optimistic_update(template, flat, verbose=verbose,
                                      return_stats=True)
    return merged, int(epoch), set(on_disk.keys()), stats


def _restore_to_local_device(save_dir: str, epoch: int):
    """Restore a StandardSave payload with all leaves on the local default
    device, regardless of which device type saved it."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(save_dir), str(epoch), "default")
    meta = ckptr.metadata(path).item_metadata
    tree = meta.tree if hasattr(meta, "tree") else meta
    shard = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
    template = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=shard),
        tree)
    return ckptr.restore(path, template)


def save_checkpoint(save_dir: str, state: TrainState, epoch: int) -> None:
    """Save the train state (reference save_checkpoint,
    pytorch_misc.py:217-233). Extra trees (GAN state etc.) go through
    ``save_payload``/``restore_payload`` directly, which keep the save and
    restore templates symmetric — ``restore_checkpoint``'s fixed template
    could not restore a payload carrying unknown keys."""
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": np.asarray(epoch),
    }
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
                      verbose: bool = False, return_stats: bool = False):
    """Copy matching-shape arrays from a {'a/b/c': array} dict into a Flax
    param tree; skip missing keys and shape mismatches (printed when
    ``verbose``). With ``return_stats`` also returns
    ``{"missing": [template leaves not updated], "unused": [update keys
    without a home]}`` so callers can distinguish an exact restore from a
    partial one."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    new_leaves = []
    used = set()
    missing = []
    for (path, leaf) in flat[0]:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name in flat_updates and flat_updates[name].shape == leaf.shape:
            new_leaves.append(np.asarray(flat_updates[name], leaf.dtype))
            used.add(name)
        else:
            if verbose and name in flat_updates:
                print(f"shape mismatch for {name}: "
                      f"{flat_updates[name].shape} vs {leaf.shape}")
            missing.append(name)
            new_leaves.append(leaf)
    unused = sorted(set(flat_updates) - used)
    if verbose and unused:
        print("unused checkpoint keys:", unused[:20])
    merged = jax.tree_util.tree_unflatten(treedef, new_leaves)
    if return_stats:
        return merged, {"missing": missing, "unused": unused}
    return merged


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


def _fc6_chw_to_hwc(w: np.ndarray, pool: int = 7) -> np.ndarray:
    """Permute a torch fc-over-flattened-RoI weight to our flatten order.

    Torch flattens pooled RoI features channel-first ((C, P, P) -> C*P*P);
    our NHWC heads flatten (P, P, C) -> P*P*C. Returns the (in, out) kernel
    for the Flax Dense."""
    w = np.asarray(w)
    out_dim, in_dim = w.shape
    c = in_dim // (pool * pool)
    return (w.reshape(out_dim, c, pool, pool)
            .transpose(0, 2, 3, 1).reshape(out_dim, pool * pool * c).T)


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
    # into roi_fmap and roi_fmap_obj, pytorch_misc.py:195-203). fc6 consumes
    # the flattened 7x7x512 pool: permute CHW->HWC flatten order.
    for head in ("roi_fmap", "roi_fmap_obj"):
        for tidx, ours in (("0", "fc6"), ("3", "fc7")):
            w = torch_state.get(f"classifier.{tidx}.weight")
            b = torch_state.get(f"classifier.{tidx}.bias")
            if w is not None:
                flat[f"{head}/{ours}/kernel"] = (
                    _fc6_chw_to_hwc(w) if ours == "fc6" else np.asarray(w).T)
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
            # box_head fc6 consumes flattened pooled RoIs: CHW->HWC order
            flat[f"{ours}/kernel"] = (
                _fc6_chw_to_hwc(w) if ours.endswith("fc6")
                else np.asarray(w).T)
        if b is not None:
            flat[f"{ours}/bias"] = np.asarray(b)
    return optimistic_update(params, flat, verbose=verbose)


# ---------------------------------------------------------------------------
# RelModelStanford state_dict -> RelModelIMP variables. Covers the IMP head
# (unary/GRU/gates/output fcs, rel_model_stanford.py:29-45), both RoI heads
# (rel_model_base.py:110-111), the union-boxes conv branch
# (get_union_boxes.py:51-59), the frequency bias (sparse_targets.py:25-26)
# and the detector's VGG trunk.

def _gru_updates(prefix_t: str, prefix_f: str,
                 ts: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch.nn.GRUCell tensors -> our fused-gate GRUCell denses.

    Our ``models.relhead.GRUCell`` keeps torch's exact parameterization
    (fused [r; z; n] gate matmuls, BOTH bias vectors), so the map is a
    plain transpose — lossless in both directions, which is what makes
    gradient- and optimizer-step-level parity possible (the earlier flax
    ``nn.GRUCell`` target required folding b_ih + b_hh for r/z, which is
    forward-equivalent but changes training dynamics)."""
    out = {}
    for t, f in (("weight_ih", "ih/kernel"), ("weight_hh", "hh/kernel"),
                 ("bias_ih", "ih/bias"), ("bias_hh", "hh/bias")):
        v = ts.get(f"{prefix_t}.{t}")
        if v is not None:
            out[f"{prefix_f}/{f}"] = (np.asarray(v).T if t.startswith("weight")
                                      else np.asarray(v))
    return out


def _dense_updates(tname: str, ours: str,
                   ts: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    w, b = ts.get(f"{tname}.weight"), ts.get(f"{tname}.bias")
    if w is not None:
        out[f"{ours}/kernel"] = np.asarray(w).T
    if b is not None:
        out[f"{ours}/bias"] = np.asarray(b)
    return out


def _conv_updates(tname: str, ours: str,
                  ts: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    w, b = ts.get(f"{tname}.weight"), ts.get(f"{tname}.bias")
    if w is not None:
        out[f"{ours}/kernel"] = np.transpose(np.asarray(w), (2, 3, 1, 0))
    if b is not None:
        out[f"{ours}/bias"] = np.asarray(b)
    return out


def relmodel_flat_updates(
        torch_state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference ``RelModelStanford.state_dict()`` -> flat path updates for a
    ``RelModelIMP`` *variables* tree ({'params':..., 'batch_stats':...})."""
    ts = torch_state
    flat: Dict[str, np.ndarray] = {}
    P = "params"

    # IMP head: unary projections, output fcs, gate denses (Sequential[0])
    for tname, ours in (("obj_unary", "imp/obj_unary"),
                        ("edge_unary", "imp/edge_unary"),
                        ("obj_fc", "imp/obj_fc"),
                        ("rel_fc", "imp/rel_fc"),
                        ("sub_vert_w_fc.0", "imp/sub_vert_w_fc"),
                        ("obj_vert_w_fc.0", "imp/obj_vert_w_fc"),
                        ("out_edge_w_fc.0", "imp/out_edge_w_fc"),
                        ("in_edge_w_fc.0", "imp/in_edge_w_fc")):
        flat.update(_dense_updates(tname, f"{P}/{ours}", ts))
    flat.update(_gru_updates("node_gru", f"{P}/imp/node_gru", ts))
    flat.update(_gru_updates("edge_gru", f"{P}/imp/edge_gru", ts))

    # RoI heads. roi_fmap = Sequential(Flatten, classifier) -> indices 1.0 /
    # 1.3; roi_fmap_obj = classifier -> indices 0 / 3. fc6 permutes CHW->HWC.
    for tname, ours in (("roi_fmap.1.0", "roi_fmap/fc6"),
                        ("roi_fmap.1.3", "roi_fmap/fc7"),
                        ("roi_fmap_obj.0", "roi_fmap_obj/fc6"),
                        ("roi_fmap_obj.3", "roi_fmap_obj/fc7")):
        upd = _dense_updates(tname, f"{P}/{ours}", ts)
        k = f"{P}/{ours}/kernel"
        if ours.endswith("fc6") and k in upd:
            upd[k] = _fc6_chw_to_hwc(ts[f"{tname}.weight"])
        flat.update(upd)

    # union-boxes conv branch: Sequential(conv,relu,bn,maxpool,conv,relu,bn)
    flat.update(_conv_updates("union_boxes.conv.0",
                              f"{P}/union_feats/conv1", ts))
    flat.update(_conv_updates("union_boxes.conv.4",
                              f"{P}/union_feats/conv2", ts))
    for tidx, ours in (("2", "bn1"), ("6", "bn2")):
        base = f"union_boxes.conv.{tidx}"
        w, b = ts.get(f"{base}.weight"), ts.get(f"{base}.bias")
        m = ts.get(f"{base}.running_mean")
        v = ts.get(f"{base}.running_var")
        if w is not None:
            flat[f"{P}/union_feats/{ours}/scale"] = np.asarray(w)
        if b is not None:
            flat[f"{P}/union_feats/{ours}/bias"] = np.asarray(b)
        if m is not None:
            flat[f"batch_stats/union_feats/{ours}/mean"] = np.asarray(m)
        if v is not None:
            flat[f"batch_stats/union_feats/{ours}/var"] = np.asarray(v)

    # frequency bias embedding (C*C, R)
    if "freq_bias.obj_baseline.weight" in ts:
        flat[f"{P}/freq_bias/table"] = np.asarray(
            ts["freq_bias.obj_baseline.weight"])

    # VGG trunk inside the frozen detector (FasterRCNN(vgg.features))
    for tname, ours in torch_vgg_key_map().items():
        idx = tname.split(".")[1]
        flat.update(_conv_updates(f"detector.backbone.{idx}",
                                  f"{P}/{ours}", ts))
    return flat


def import_torch_relmodel(variables, torch_state: Dict[str, np.ndarray],
                          verbose: bool = False):
    """Transplant a reference ``RelModelStanford`` state_dict (as numpy) into
    a ``RelModelIMP`` variables tree (params + batch_stats)."""
    return optimistic_update(variables, relmodel_flat_updates(torch_state),
                             verbose=verbose)


# ---------------------------------------------------------------------------
# torchvision maskrcnn/fasterrcnn_resnet50_fpn backbone -> our ResNet50FPN.
# The reference builds its GQA/VTE detector from the COCO-pretrained
# maskrcnn_resnet50_fpn (rel_model_base.py:58-81); this map lets those
# weights drive our ResNet50FPN trunk for apples-to-apples runs.

def _bn_updates(tname: str, ours: str,
                ts: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    pairs = ((".weight", f"params/{ours}/scale"),
             (".bias", f"params/{ours}/bias"),
             (".running_mean", f"batch_stats/{ours}/mean"),
             (".running_var", f"batch_stats/{ours}/var"))
    for sfx, key in pairs:
        v = ts.get(tname + sfx)
        if v is not None:
            out[key] = np.asarray(v)
    return out


def resnet50_fpn_flat_updates(
        torch_state: Dict[str, np.ndarray],
        prefix: str = "backbone.",
        ours_prefix: str = "") -> Dict[str, np.ndarray]:
    """torchvision ``backbone.body``/``backbone.fpn`` tensors -> flat updates
    for a ``ResNet50FPN`` variables tree. ``ours_prefix`` prepends a module
    path (e.g. ``"trunk/"`` when the FPN lives inside a bigger model)."""
    from sgg_tpu.models.resnet import RESNET50_BLOCKS

    ts = torch_state
    op = ours_prefix
    flat: Dict[str, np.ndarray] = {}

    def conv(tname, ours):
        flat.update(_conv_updates(tname, f"params/{op}{ours}", ts))

    # stem
    conv(f"{prefix}body.conv1", "body/conv1")
    flat.update(_bn_updates(f"{prefix}body.bn1", f"{op}body/bn1", ts))
    # residual stages: torch layer{L}.{i} -> ours layer{L}_{i}
    for stage, n_blocks in enumerate(RESNET50_BLOCKS, start=1):
        for i in range(n_blocks):
            t = f"{prefix}body.layer{stage}.{i}"
            o = f"body/layer{stage}_{i}"
            for c in ("conv1", "conv2", "conv3"):
                conv(f"{t}.{c}", f"{o}/{c}")
            for b in ("bn1", "bn2", "bn3"):
                flat.update(_bn_updates(f"{t}.{b}", f"{op}{o}/{b}", ts))
            conv(f"{t}.downsample.0", f"{o}/downsample")
            flat.update(_bn_updates(f"{t}.downsample.1",
                                    f"{op}{o}/bn_down", ts))
    # FPN: inner_blocks.{i}(.0) -> lateral_c{i+2}; layer_blocks -> output
    for i, lvl in enumerate(("c2", "c3", "c4", "c5")):
        for tbase in (f"{prefix}fpn.inner_blocks.{i}.0",
                      f"{prefix}fpn.inner_blocks.{i}"):
            if f"{tbase}.weight" in ts:
                conv(tbase, f"fpn/lateral_{lvl}")
                break
        for tbase in (f"{prefix}fpn.layer_blocks.{i}.0",
                      f"{prefix}fpn.layer_blocks.{i}"):
            if f"{tbase}.weight" in ts:
                conv(tbase, f"fpn/output_{lvl}")
                break
    return flat


def import_torch_resnet50_fpn(variables, torch_state: Dict[str, np.ndarray],
                              prefix: str = "backbone.",
                              ours_prefix: str = "",
                              verbose: bool = False):
    """Transplant a torchvision resnet50-FPN backbone state_dict (as numpy)
    into a ``ResNet50FPN`` variables tree ({'params':..., 'batch_stats':...})."""
    return optimistic_update(
        variables,
        resnet50_fpn_flat_updates(torch_state, prefix=prefix,
                                  ours_prefix=ours_prefix),
        verbose=verbose)


# ---------------------------------------------------------------------------
# Reference GAN (augment/gan.py) -> our GANModel. Generator G_* modules map
# structurally; the spectral-normed discriminators map through the
# weight_orig/u/v reparameterization (see _snconv_updates).

def gan_generator_flat_updates(
        torch_state: Dict[str, np.ndarray], num_gcn_layers: int = 5,
        batch_norm: bool = True) -> Dict[str, np.ndarray]:
    """Reference ``GAN`` G_* tensors -> flat updates for our ``Generator``.

    Covers G_obj_embed/G_rel_embed, the GCN stack (build_mlp Linears at
    Sequential indices 0/3, BatchNorm1d at 1/4 when ``mlp_normalization=
    'batch'`` — the final-layer net has no trailing BN), the G_node
    spatialization convs, G_proj and the CRN (refinement_modules.{i}.net
    conv@0/bn@1/conv@3/bn@4 + output_conv.0)."""
    ts = torch_state
    flat: Dict[str, np.ndarray] = {}
    for tname, ours in (("G_obj_embed", "obj_embed"),
                        ("G_rel_embed", "rel_embed")):
        w = ts.get(f"{tname}.weight")
        if w is not None:
            flat[f"params/{ours}/embedding"] = np.asarray(w)

    for i in range(num_gcn_layers):
        final = i == num_gcn_layers - 1
        for net in ("net1", "net2"):
            base_t = f"G_gcn.gconvs.{i}.{net}"
            base_o = f"gcn/gconv_{i}/{net}"
            if batch_norm:
                lin_idx = ("0", "3")
                flat.update(_bn_updates(
                    f"{base_t}.1", f"{base_o}/MaskedBatchNorm_0", ts))
                if not final:
                    flat.update(_bn_updates(
                        f"{base_t}.4", f"{base_o}/MaskedBatchNorm_1", ts))
            else:
                # without BN: [Linear, ReLU, Linear(, ReLU)] -> 0 and 2
                lin_idx = ("0", "2")
            for j, tidx in enumerate(lin_idx):
                flat.update(_dense_updates(f"{base_t}.{tidx}",
                                           f"params/{base_o}/Dense_{j}", ts))

    flat.update(_conv_updates("G_node.0", "params/node_conv0", ts))
    flat.update(_conv_updates("G_node.2", "params/node_conv1", ts))
    flat.update(_conv_updates("G_proj", "params/proj", ts))

    # CRN: 3 refinement modules + output conv
    for i in range(8):
        base_t = f"G_refine.refinement_modules.{i}.net"
        if f"{base_t}.0.weight" not in ts:
            break
        base_o = f"refine/mod{i}"
        flat.update(_conv_updates(f"{base_t}.0", f"params/{base_o}/conv0",
                                  ts))
        flat.update(_bn_updates(f"{base_t}.1", f"{base_o}/bn0", ts))
        flat.update(_conv_updates(f"{base_t}.3", f"params/{base_o}/conv1",
                                  ts))
        flat.update(_bn_updates(f"{base_t}.4", f"{base_o}/bn1", ts))
    flat.update(_conv_updates("G_refine.output_conv.0",
                              "params/refine/output_conv", ts))
    return flat


def import_torch_gan_generator(variables, torch_state: Dict[str, np.ndarray],
                               num_gcn_layers: int = 5,
                               batch_norm: bool = True,
                               verbose: bool = False):
    """Transplant reference GAN generator weights into our ``Generator``."""
    return optimistic_update(
        variables,
        gan_generator_flat_updates(torch_state,
                                   num_gcn_layers=num_gcn_layers,
                                   batch_norm=batch_norm),
        verbose=verbose)


def _snconv_updates(tname: str, ours: str,
                    ts: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch ``spectral_norm(Conv2d)`` tensors -> our ``SNConv`` updates.

    torch's reparameterization (reference gan.py:70) stores ``weight_orig``
    plus power-iteration vectors ``weight_u`` (out,) / ``weight_v``
    (in*kh*kw,) and computes the effective weight W_eff = weight_orig /
    sigma with sigma = u . (W_mat @ v). Flax ``nn.SpectralNorm`` recomputes
    sigma at every forward by ONE power-iteration step from its stored ``u``
    over ``kernel.reshape(-1, out)``; the two flattening orders differ only
    by an index permutation and l2-normalization is permutation-invariant,
    so at torch's converged fixed point mapping ``weight_orig -> kernel``
    and ``weight_u -> u`` reproduces torch's eval forward exactly. The
    stored ``sigma`` is also set (torch's scalar) for completeness.
    Falls back to a plain conv mapping when the checkpoint was saved with
    ``SN=False`` (no ``weight_orig`` suffix).
    """
    out: Dict[str, np.ndarray] = {}
    w = ts.get(f"{tname}.weight_orig")
    if w is None:
        return {f"params/{k}": v
                for k, v in _conv_updates(tname, f"{ours}/Conv_0",
                                          ts).items()}
    out[f"params/{ours}/Conv_0/kernel"] = np.transpose(
        np.asarray(w), (2, 3, 1, 0))
    b = ts.get(f"{tname}.bias")
    if b is not None:
        out[f"params/{ours}/Conv_0/bias"] = np.asarray(b)
    u = ts.get(f"{tname}.weight_u")
    v = ts.get(f"{tname}.weight_v")
    stats = f"batch_stats/{ours}/SpectralNorm_0/Conv_0/kernel"
    if u is not None:
        out[f"{stats}/u"] = np.asarray(u)[None, :]
        if v is not None:
            wm = np.asarray(w).reshape(np.asarray(u).shape[0], -1)
            out[f"{stats}/sigma"] = np.asarray(
                np.asarray(u) @ (wm @ np.asarray(v)), np.float32)
    return out


def gan_discriminator_flat_updates(
        torch_state: Dict[str, np.ndarray],
        largeD: bool = False) -> Dict[str, np.ndarray]:
    """Reference GAN discriminator tensors -> flat updates for ``GANModel``.

    Covers the two class-conditional patch discriminators (reference
    gan.py:74-86, Sequential conv indices 0/2/4/6) and the global fmap
    discriminator (gan.py:87-103; with ``largeD`` the extra 1x1 convs sit at
    Sequential indices 2/7/12, otherwise those slots are parameterless
    ``nn.Identity``)."""
    ts = torch_state
    flat: Dict[str, np.ndarray] = {}
    for d in ("D_nodes", "D_edges"):
        for j, ti in enumerate((0, 2, 4, 6)):
            flat.update(_snconv_updates(f"{d}.{ti}", f"{d}/SNConv_{j}", ts))
    tidx = (0, 2, 5, 7, 10, 12, 15) if largeD else (0, 5, 10, 15)
    for j, ti in enumerate(tidx):
        flat.update(_snconv_updates(f"D_global.{ti}",
                                    f"D_global/SNConv_{j}", ts))
    return flat


def gan_flat_updates(torch_state: Dict[str, np.ndarray],
                     num_gcn_layers: int = 5, batch_norm: bool = True,
                     largeD: bool = False) -> Dict[str, np.ndarray]:
    """Full reference ``GAN.state_dict()`` -> flat updates for ``GANModel``
    (generator re-rooted under the ``G`` submodule + all three Ds)."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in gan_generator_flat_updates(
            torch_state, num_gcn_layers=num_gcn_layers,
            batch_norm=batch_norm).items():
        coll, rest = k.split("/", 1)
        flat[f"{coll}/G/{rest}"] = v
    flat.update(gan_discriminator_flat_updates(torch_state, largeD=largeD))
    return flat


def import_torch_gan(variables, torch_state: Dict[str, np.ndarray],
                     num_gcn_layers: int = 5, batch_norm: bool = True,
                     largeD: bool = False, verbose: bool = False):
    """Transplant a full reference GAN state_dict (G + spectral-norm Ds)
    into a ``GANModel`` variables tree."""
    return optimistic_update(
        variables,
        gan_flat_updates(torch_state, num_gcn_layers=num_gcn_layers,
                         batch_norm=batch_norm, largeD=largeD),
        verbose=verbose)


def load_torch_state_dict(path: str,
                          key: str = "state_dict") -> Dict[str, "np.ndarray"]:
    """Read a .pth checkpoint into a {name: numpy} dict (CPU torch).

    ``key`` selects the sub-dict inside a full training checkpoint — the
    reference saves the model under ``state_dict`` and the GAN under ``gan``
    (pytorch_misc.py:226-231, main.py:249-254); a bare state_dict loads
    as-is."""
    import torch
    ckpt = torch.load(path, map_location="cpu")
    state = ckpt.get(key, ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() for k, v in state.items()
            if hasattr(v, "numpy")}
