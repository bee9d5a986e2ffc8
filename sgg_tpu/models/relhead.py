"""IMP relation head and the full SGG model (PredCls/SGCls paths).

Rebuild of ``RelModelStanford`` — GRU-based iterative message passing (Xu et
al. 2017) — from ``/root/reference/sgg_models/rel_model_stanford.py`` and the
shared machinery of ``rel_model_base.py``, redesigned for fixed-shape padded
graph batches:

* the reference builds dense ``(num_obj, num_rel)`` incidence matrices per
  ragged batch (``rel_model_stanford.py:58-66``); here message pooling is a
  per-image one-hot einsum over the padded ``(B, E)`` edge set — a batched
  MXU matmul with masked (invalid) edges contributing zero;
* node/edge features come from the shared RoIAlign kernel
  (``sgg_tpu/ops/roi_align.py``) over NHWC feature maps; union boxes are the
  elementwise min/max construction of ``rel_model_base.py:248-250``;
* the detector trunk output is ``stop_gradient``-ed, matching the frozen
  detector (``rel_model_stanford.py:125-131``, ``main.py:62-63``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sgg_tpu.constants import POOL_SIZE, STRIDE, VGG_OBJ_DIM
from sgg_tpu.models.backbone import RoiHead, VGG16Trunk
from sgg_tpu.models.frequency_bias import FrequencyBias
from sgg_tpu.models.union_features import UnionBoxFeats
from sgg_tpu.ops.boxes import union_boxes
from sgg_tpu.ops.roi_align import roi_align


def _take_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather per-edge node values: (B, N, H)[(B, E)] -> (B, E, H)."""
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class GRUCell(nn.Module):
    """GRU cell with torch's exact parameterization (``torch.nn.GRUCell``).

    Two fused gate matmuls — ``x @ W_ih (in,3H) + b_ih`` and
    ``h @ W_hh (H,3H) + b_hh`` — instead of flax ``nn.GRUCell``'s six
    per-gate denses: fewer, larger MXU matmuls, and *parameter-exact*
    parity with the reference's ``node_gru``/``edge_gru``
    (rel_model_stanford.py:34-35). The redundant per-gate bias pair
    (b_ih + b_hh both live for r/z) is kept deliberately: folding them
    into one bias is forward-equivalent but changes training dynamics —
    torch updates both copies (2x the effective gradient on the summed
    bias) and its global clip norm counts that gradient twice. Verified
    at the gradient level in tests/test_grad_reference_parity.py.

    Gate order matches torch: [r; z; n] along the 3H axis;
    ``h' = (1 - z) * n + z * h`` with ``n = tanh(i_n + r * h_n)``.
    Init matches torch GRUCell: U(-1/sqrt(H), 1/sqrt(H)) for all
    weights and biases.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, carry: jnp.ndarray, inputs: jnp.ndarray):
        H = self.features
        k = 1.0 / float(np.sqrt(H))
        init = nn.initializers.uniform(scale=2 * k)
        shift = lambda f: (lambda *a: f(*a) - k)  # U(0,2k) -> U(-k,k)
        gi = nn.Dense(3 * H, dtype=self.dtype, name="ih",
                      kernel_init=shift(init),
                      bias_init=shift(init))(inputs)
        gh = nn.Dense(3 * H, dtype=self.dtype, name="hh",
                      kernel_init=shift(init),
                      bias_init=shift(init))(carry)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        new_h = (1.0 - z) * n + z * carry
        return new_h, new_h


class IMPHead(nn.Module):
    """3-iteration GRU message passing over node/edge representations.

    Reference: ``message_pass`` (rel_model_stanford.py:48-94) and the
    obj/rel heads (``:29-33``).
    """

    num_classes: int
    num_predicates: int
    hidden_dim: int = 512
    mp_iter: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, node_feat: jnp.ndarray, edge_feat: jnp.ndarray,
                 pairs: jnp.ndarray, pair_mask: jnp.ndarray):
        """node_feat (B,N,obj_dim), edge_feat (B,E,obj_dim), pairs (B,E,2).

        Returns (obj_logits (B,N,C) f32, rel_logits (B,E,R) f32).
        """
        H = self.hidden_dim
        dt = self.dtype
        N = node_feat.shape[1]

        obj_rep = nn.Dense(H, dtype=dt, name="obj_unary")(node_feat)
        rel_rep = nn.relu(nn.Dense(H, dtype=dt, name="edge_unary")(edge_feat))

        node_gru = GRUCell(H, dtype=dt, name="node_gru")
        edge_gru = GRUCell(H, dtype=dt, name="edge_gru")
        gate = lambda name: nn.Dense(1, dtype=dt, name=name)

        sub_vert_w = gate("sub_vert_w_fc")
        obj_vert_w = gate("obj_vert_w_fc")
        out_edge_w = gate("out_edge_w_fc")
        in_edge_w = gate("in_edge_w_fc")

        vert, _ = node_gru(jnp.zeros_like(obj_rep), obj_rep)
        edge, _ = edge_gru(jnp.zeros_like(rel_rep), rel_rep)

        subj, obj = pairs[..., 0], pairs[..., 1]
        m = pair_mask.astype(dt)
        subj_inc = jax.nn.one_hot(subj, N, dtype=dt) * m[..., None]  # (B,E,N)
        obj_inc = jax.nn.one_hot(obj, N, dtype=dt) * m[..., None]

        for _ in range(self.mp_iter):
            sub_vert = _take_nodes(vert, subj)  # (B, E, H)
            obj_vert = _take_nodes(vert, obj)
            cat_sub = jnp.concatenate([sub_vert, edge], axis=-1)
            cat_obj = jnp.concatenate([obj_vert, edge], axis=-1)

            # edge update: gated sum of endpoint states
            # (rel_model_stanford.py:78-83)
            msg = (nn.sigmoid(sub_vert_w(cat_sub)) * sub_vert
                   + nn.sigmoid(obj_vert_w(cat_obj)) * obj_vert)
            new_edge, _ = edge_gru(edge, msg)

            # node update: incidence-pooled gated edge states
            # (rel_model_stanford.py:86-92)
            pre_out = nn.sigmoid(out_edge_w(cat_sub)) * edge
            pre_in = nn.sigmoid(in_edge_w(cat_obj)) * edge
            vert_ctx = (
                jnp.einsum("ben,beh->bnh", subj_inc, pre_out,
                           preferred_element_type=jnp.float32)
                + jnp.einsum("ben,beh->bnh", obj_inc, pre_in,
                             preferred_element_type=jnp.float32)).astype(dt)
            new_vert, _ = node_gru(vert, vert_ctx)

            vert, edge = new_vert, new_edge

        obj_logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                              name="obj_fc")(vert.astype(jnp.float32))
        rel_logits = nn.Dense(self.num_predicates, dtype=jnp.float32,
                              name="rel_fc")(edge.astype(jnp.float32))
        return obj_logits, rel_logits


class RelModelIMP(nn.Module):
    """Full PredCls/SGCls SGG model: trunk -> RoI features -> IMP head.

    Reference assembly: RelModelStanford.forward/predict
    (rel_model_stanford.py:97-207) with the VGG16 backbone path of
    RelModelBase (rel_model_base.py:83-117). The sgdet path plugs a detector
    in front and reuses everything from ``node_edge_features`` on.
    """

    num_classes: int
    num_predicates: int
    mode: str = "sgcls"
    use_bias: bool = False
    test_bias: bool = False
    hidden_dim: int = 512
    obj_dim: int = VGG_OBJ_DIM
    pool_size: int = POOL_SIZE
    stride: int = STRIDE
    mp_iter: int = 3
    # 'vgg16': stride-16 VGG trunk (obj_dim 4096). 'resnet50': ResNet50-FPN,
    # relation features pooled from the LAST pyramid level at stride 64
    # with obj_dim 1024 (reference rel_model_base.py:58-81,239 — the
    # MultiScaleRoIAlign receives only result.fmap wrapped as one level).
    backbone: str = "vgg16"
    edge_model: str = "motifs"  # {motifs, raw_boxes} (config.py:179-180)
    dtype: Any = jnp.bfloat16
    freq_table: Optional[np.ndarray] = None  # (C, C, R) log distribution

    @nn.compact
    def __call__(self, images, boxes, classes, pairs, pair_mask, *,
                 fmap=None, im_hw=None, train: bool = False,
                 mode: Optional[str] = None, return_feats: bool = False,
                 dedup_unions: bool = False):
        """Forward pass over a padded batch.

        Args:
          images: (B, H, W, 3) or None when ``fmap`` given.
          boxes: (B, N, 4) image-pixel boxes (GT boxes for predcls/sgcls,
            detections for sgdet).
          classes: (B, N) GT/detected classes (used for predcls obj_preds
            and frequency-bias indexing).
          pairs: (B, E, 2) candidate edges; pair_mask (B, E).
          fmap: optional precomputed (B, h, w, C) feature maps.
          train: enables dropout/batchnorm updates.

          mode: evaluation regime override; defaults to the module's mode.
            The reference switches the model mode per eval regime
            (lib/eval.py:56 ``set_mode``) — here it is a call-time static.
          dedup_unions: compute union RoIAlign (and the linear bulk of the
            edge fc6 when the rects branch is spatially constant) once per
            UNORDERED pair at half the edge budget and gather back — exact
            for swap-closed pair sets (every eval enumeration; see
            ``train/assign.unordered_union_index``). The output then
            carries ``dedup_ok`` (per-image bool): False (unique pairs
            overflowed E//2 — the set was not swap-closed) means garbage
            edge features; callers re-run without dedup. Keep False for
            training (sampled edge sets are not swap-closed).

        Returns dict with obj_logits (B,N,C), rel_logits (B,E,R),
        obj_preds (B,N), obj_scores (B,N) — all float32.
        """
        mode = mode or self.mode
        stride = self.stride
        if fmap is None:
            # frozen detector semantics (rel_model_stanford.py:125-131)
            if self.backbone == "resnet50":
                from sgg_tpu.models.resnet import ResNet50FPN
                pyramid = ResNet50FPN(dtype=self.dtype,
                                      name="trunk")(images, train=False)
                fmap = jax.lax.stop_gradient(pyramid["pool"])
                stride = 64
            else:
                fmap = jax.lax.stop_gradient(
                    VGG16Trunk(dtype=self.dtype, name="trunk")(images))
        elif self.backbone == "resnet50":
            stride = 64

        # node + union RoI features through one RoIAlign kernel
        # (rel_model_base.py:245-260)
        node_pool = roi_align(fmap, boxes, spatial_scale=1.0 / stride,
                              pooled=self.pool_size)
        uboxes = union_boxes(boxes, pairs[..., 0], pairs[..., 1])
        dedup_ok = None
        gidx = None
        if dedup_unions:
            # union boxes are pair-order symmetric: pool once per UNORDERED
            # pair at half the edge budget, gather back (exactness via
            # dedup_ok — see unordered_union_index)
            from sgg_tpu.train.assign import unordered_union_index
            n_uni = max(pairs.shape[1] // 2, 1)
            uni_slots, gidx, dedup_ok, _ = unordered_union_index(
                pairs, pair_mask, n_uni, num_nodes=boxes.shape[1])
            uboxes = jnp.take_along_axis(uboxes, uni_slots[..., None], 1)
        union_pool_u = roi_align(fmap, uboxes, spatial_scale=1.0 / stride,
                                 pooled=self.pool_size)
        union_pool_raw = union_pool_u if gidx is None else None

        # add rasterized box-pair conv features (get_union_boxes.py:99-101)
        b_s = jnp.take_along_axis(boxes, pairs[..., 0:1].repeat(4, -1), 1)
        b_o = jnp.take_along_axis(boxes, pairs[..., 1:2].repeat(4, -1), 1)
        pair_boxes = jnp.concatenate([b_s, b_o], axis=-1)
        union_feats = UnionBoxFeats(dim=fmap.shape[-1],
                                    pooling_size=self.pool_size,
                                    edge_model=self.edge_model,
                                    dtype=self.dtype, name="union_feats")
        rects = union_feats(pair_boxes, im_hw=im_hw, train=train)
        # (B, E, h, w, C); h = w = 1 under the reference-faithful strides
        rects_is_bcast = rects.shape[2] == 1 and rects.shape[3] == 1
        edge_split = dedup_unions and rects_is_bcast
        if not edge_split:
            if union_pool_raw is None:  # dedup'd but 7x7 rects: gather pools
                union_pool_raw = jnp.take_along_axis(
                    union_pool_u, gidx[..., None, None, None], 1)
            union_pool = union_pool_raw + rects

        # vgg16: roi_fmap_obj = full VGG classifier (fc6-relu-drop-fc7-
        # relu-drop), roi_fmap = fc6-relu-drop-fc7 (load_vgg with
        # use_dropout/use_relu False removes only the SECOND drop/relu,
        # rel_model_base.py:310-321). resnet50: BOTH heads are copies of
        # torchvision's TwoMLPHead — final relu, NO dropout
        # (rel_model_base.py:78-80).
        if self.backbone == "resnet50":
            head_kw = dict(with_final_relu=True, dropout_rate=0.0)
            edge_kw = dict(head_kw)
        else:
            head_kw = dict(with_final_relu=True)
            edge_kw = dict(with_final_relu=False)
        node_feat = RoiHead(out_dim=self.obj_dim, dtype=self.dtype,
                            name="roi_fmap_obj",
                            **head_kw)(node_pool, train=train)
        edge_head = RoiHead(out_dim=self.obj_dim, dtype=self.dtype,
                            name="roi_fmap", **edge_kw)
        if edge_split:
            # fc6 is linear pre-ReLU: run it on the deduped pools, gather,
            # and add the spatially-constant rects vector through the
            # summed kernel (see RoiHead docstring) — halves the dominant
            # 25088->4096 matmul
            edge_feat = edge_head(union_pool_u, train=train,
                                  gather_idx=gidx,
                                  broadcast_add=rects[:, :, 0, 0, :])
        else:
            edge_feat = edge_head(union_pool, train=train)

        obj_logits, rel_logits = IMPHead(
            num_classes=self.num_classes,
            num_predicates=self.num_predicates,
            hidden_dim=self.hidden_dim, mp_iter=self.mp_iter,
            dtype=self.dtype, name="imp")(node_feat, edge_feat, pairs,
                                          pair_mask)

        # object predictions: argmax of non-background softmax
        # (rel_model_stanford.py:159-196)
        probs = jax.nn.softmax(obj_logits, axis=-1)
        obj_preds = jnp.argmax(probs[..., 1:], axis=-1) + 1
        obj_scores = jnp.max(probs[..., 1:], axis=-1)
        if mode == "predcls":
            obj_preds = classes
            obj_scores = jnp.ones_like(obj_scores)

        if self.use_bias:
            subj_cls = jnp.take_along_axis(obj_preds, pairs[..., 0], 1)
            obj_cls = jnp.take_along_axis(obj_preds, pairs[..., 1], 1)
            freq = FrequencyBias(num_classes=self.num_classes,
                                 num_predicates=self.num_predicates,
                                 init_table=self.freq_table,
                                 name="freq_bias")(subj_cls, obj_cls)
            rel_logits = freq if self.test_bias else rel_logits + freq

        out = {
            "obj_logits": obj_logits,
            "rel_logits": rel_logits,
            "obj_preds": obj_preds,
            "obj_scores": obj_scores,
        }
        if dedup_ok is not None:
            out["dedup_ok"] = dedup_ok
        if return_feats:
            # raw RoIAlign pools — the "real" features the GAN
            # discriminators judge (reference node_edge_features outputs,
            # main.py:184-190)
            if union_pool_raw is None:
                union_pool_raw = jnp.take_along_axis(
                    union_pool_u, gidx[..., None, None, None], 1)
            out["fmap"] = fmap
            out["node_pool"] = node_pool
            out["edge_pool"] = union_pool_raw
        return out
