"""Weight-level differential: our model vs the reference torch model.

Builds the reference ``RelModelStanford`` layers with the exact constructor
calls of ``/root/reference/sgg_models/rel_model_stanford.py:29-45`` (bound to
a bare instance — the full ``__init__`` needs torchvision's detector, absent
here), exports its ``state_dict``, imports it through
``sgg_tpu.train.checkpoint.relmodel_flat_updates``, and asserts logit parity
between the reference's own ``message_pass``/``predict`` code paths and our
Flax modules on identical inputs. This converts "recall parity" into a
weight-level theorem for the IMP head, both RoI heads, the union-boxes conv
branch, and the frequency bias (VERDICT round-1, next-round item 2).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn_flax  # noqa: E402

from sgg_tpu.models.backbone import RoiHead  # noqa: E402
from sgg_tpu.models.frequency_bias import FrequencyBias  # noqa: E402
from sgg_tpu.models.relhead import GRUCell, IMPHead  # noqa: E402
from sgg_tpu.models.union_features import UnionBoxFeats  # noqa: E402
from sgg_tpu.train.checkpoint import (_gru_updates, optimistic_update,
                                      relmodel_flat_updates)  # noqa: E402

from reference_utils import load_reference  # noqa: E402

pytestmark = pytest.mark.slow

C_CLS, R_PRED = 11, 7
HID, OBJ_DIM, FMAP_C, POOL = 32, 48, 24, 7


def _make_ref_model(torch):
    """Reference RelModelStanford layers on a bare instance (ctor lines
    rel_model_stanford.py:29-45 + rel_model_base.py:110-121)."""
    import torch.nn as nn
    from sgg_models.rel_model_stanford import RelModelStanford
    from lib.get_union_boxes import UnionBoxesAndFeats

    torch.manual_seed(0)
    m = RelModelStanford.__new__(RelModelStanford)
    nn.Module.__init__(m)
    m.hidden_dim, m.mp_iter, m.pool_sz = HID, 3, POOL

    m.rel_fc = nn.Linear(HID, R_PRED)
    m.obj_fc = nn.Linear(HID, C_CLS)
    m.obj_unary = nn.Linear(OBJ_DIM, HID)
    m.edge_unary = nn.Linear(OBJ_DIM, HID)
    m.edge_gru = nn.GRUCell(input_size=HID, hidden_size=HID)
    m.node_gru = nn.GRUCell(input_size=HID, hidden_size=HID)
    m.sub_vert_w_fc = nn.Sequential(nn.Linear(HID * 2, 1), nn.Sigmoid())
    m.obj_vert_w_fc = nn.Sequential(nn.Linear(HID * 2, 1), nn.Sigmoid())
    m.out_edge_w_fc = nn.Sequential(nn.Linear(HID * 2, 1), nn.Sigmoid())
    m.in_edge_w_fc = nn.Sequential(nn.Linear(HID * 2, 1), nn.Sigmoid())

    # load_vgg classifier structure (rel_model_base.py:310-321): roi_fmap_obj
    # keeps [fc6, relu, drop, fc7, relu, drop]; roi_fmap drops the final
    # relu/dropout and is wrapped with a Flatten.
    in_dim = POOL * POOL * FMAP_C
    m.roi_fmap_obj = nn.Sequential(
        nn.Linear(in_dim, OBJ_DIM), nn.ReLU(True), nn.Dropout(),
        nn.Linear(OBJ_DIM, OBJ_DIM), nn.ReLU(True), nn.Dropout())
    m.roi_fmap = nn.Sequential(nn.Flatten(), nn.Sequential(
        nn.Linear(in_dim, OBJ_DIM), nn.ReLU(True), nn.Dropout(),
        nn.Linear(OBJ_DIM, OBJ_DIM)))
    # raw_boxes avoids the (unbuilt) Cython rasterizer; the motifs rects
    # math is parity-tested against the C++ oracle in test_ops_rects.py.
    m.union_boxes = UnionBoxesAndFeats(edge_model="raw_boxes",
                                       pooling_size=POOL, stride=16,
                                       dim=FMAP_C)
    m.eval()
    return m


def _state_np(torch, m):
    return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()
            if v.dtype.is_floating_point}


def _scene(rng, n, e):
    node_feat = rng.randn(n, OBJ_DIM).astype(np.float32)
    edge_feat = rng.randn(e, OBJ_DIM).astype(np.float32)
    pairs = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)], 1)
    bad = pairs[:, 0] == pairs[:, 1]
    pairs[bad, 1] = (pairs[bad, 0] + 1) % n
    return node_feat, edge_feat, pairs.astype(np.int32)


def test_grucell_weight_mapping():
    """torch.nn.GRUCell == our fused-gate GRUCell under _gru_updates.

    The mapping is a plain transpose (our cell keeps torch's exact
    parameterization incl. both bias vectors), so every torch tensor must
    land — asserted via full key coverage, which guards the grad-level
    parity suite's assumption that the map is lossless."""
    torch = load_reference()
    torch.manual_seed(1)
    h = 16
    cell_t = torch.nn.GRUCell(h, h)
    ts = {f"g.{k}": v.detach().numpy() for k, v in
          cell_t.state_dict().items()}
    cell_f = GRUCell(h, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(5, h).astype(np.float32)
    hx = np.random.RandomState(1).randn(5, h).astype(np.float32)
    variables = cell_f.init(jax.random.key(0), jnp.asarray(hx),
                            jnp.asarray(x))
    upd = _gru_updates("g", "params", ts)
    assert len(upd) == 4  # ih/hh kernels + BOTH biases, nothing folded
    flat_names = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert set(upd) == flat_names
    variables = optimistic_update(variables, upd)
    got, _ = cell_f.apply(variables, jnp.asarray(hx), jnp.asarray(x))
    want = cell_t(torch.from_numpy(x), torch.from_numpy(hx)).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-6, rtol=1e-5)


def test_imp_head_logit_parity():
    """Reference message_pass + fcs vs IMPHead with imported weights."""
    torch = load_reference()
    import torch.nn.functional as F
    m = _make_ref_model(torch)
    ts = _state_np(torch, m)

    rng = np.random.RandomState(2)
    n, e = 9, 20
    node_feat, edge_feat, pairs = _scene(rng, n, e)

    with torch.no_grad():
        obj_rep = m.obj_unary(torch.from_numpy(node_feat))
        edge_rep = F.relu(m.edge_unary(torch.from_numpy(edge_feat)))
        vert, edge = m.message_pass(edge_rep, obj_rep,
                                    torch.from_numpy(pairs).long())
        ref_obj = m.obj_fc(vert).numpy()
        ref_rel = m.rel_fc(edge).numpy()

    head = IMPHead(num_classes=C_CLS, num_predicates=R_PRED, hidden_dim=HID,
                   dtype=jnp.float32)
    nf, ef = jnp.asarray(node_feat)[None], jnp.asarray(edge_feat)[None]
    pr = jnp.asarray(pairs)[None]
    mask = jnp.ones((1, e), bool)
    variables = head.init(jax.random.key(0), nf, ef, pr, mask)
    flat = {k.replace("params/imp/", "params/"): v
            for k, v in relmodel_flat_updates(ts).items()
            if k.startswith("params/imp/")}
    variables = optimistic_update(variables, flat)
    obj_logits, rel_logits = head.apply(variables, nf, ef, pr, mask)

    np.testing.assert_allclose(np.asarray(obj_logits[0]), ref_obj,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rel_logits[0]), ref_rel,
                               atol=2e-5, rtol=1e-4)

    # padding invariance against the same oracle: extra masked edges must
    # not change the valid logits (the reference has no padding at all).
    e_pad = e + 7
    pr_p = jnp.concatenate([pr, jnp.zeros((1, 7, 2), pr.dtype)], 1)
    ef_p = jnp.concatenate(
        [ef, jnp.asarray(rng.randn(1, 7, OBJ_DIM), jnp.float32)], 1)
    mask_p = jnp.concatenate([mask, jnp.zeros((1, 7), bool)], 1)
    assert mask_p.shape == (1, e_pad)
    obj_p, rel_p = head.apply(variables, nf, ef_p, pr_p, mask_p)
    np.testing.assert_allclose(np.asarray(obj_p[0]), ref_obj,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rel_p[0, :e]), ref_rel,
                               atol=2e-5, rtol=1e-4)


class _Tail(nn_flax.Module):
    """Our predict() tail with relhead's submodule names, so the imported
    flat paths (params/imp/..., params/roi_fmap/..., params/union_feats/...)
    apply verbatim."""

    @nn_flax.compact
    def __call__(self, node_pool, union_pool, pair_boxes, pairs, pair_mask,
                 im_hw):
        uf = UnionBoxFeats(dim=FMAP_C, pooling_size=POOL,
                           edge_model="raw_boxes", dtype=jnp.float32,
                           name="union_feats")
        union_pool = union_pool + uf(pair_boxes, im_hw=im_hw, train=False)
        node_feat = RoiHead(out_dim=OBJ_DIM, with_final_relu=True,
                            dtype=jnp.float32,
                            name="roi_fmap_obj")(node_pool, train=False)
        edge_feat = RoiHead(out_dim=OBJ_DIM, with_final_relu=False,
                            dtype=jnp.float32,
                            name="roi_fmap")(union_pool, train=False)
        return IMPHead(num_classes=C_CLS, num_predicates=R_PRED,
                       hidden_dim=HID, dtype=jnp.float32,
                       name="imp")(node_feat, edge_feat, pairs, pair_mask)


def test_predict_tail_end_to_end_parity():
    """Reference predict() (RoI heads + union conv + IMP) vs our tail."""
    torch = load_reference()
    m = _make_ref_model(torch)
    ts = _state_np(torch, m)

    rng = np.random.RandomState(3)
    n, e = 8, 14
    h_img, w_img = 160, 192
    node_pool = rng.randn(n, FMAP_C, POOL, POOL).astype(np.float32)
    union_pool = rng.randn(e, FMAP_C, POOL, POOL).astype(np.float32)
    boxes = rng.rand(n, 4).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + boxes[:, 2:] * 0.4 + 0.05
    boxes = np.clip(boxes, 0, 1) * [w_img, h_img, w_img, h_img]
    _, _, pairs = _scene(rng, n, e)
    rois = np.concatenate([np.zeros((n, 1), np.float32),
                           boxes.astype(np.float32)], 1)
    rel_inds = np.concatenate([np.zeros((e, 1), np.int64),
                               pairs.astype(np.int64)], 1)

    with torch.no_grad():
        ref_obj, ref_rel = m.predict(
            torch.from_numpy(node_pool),
            torch.from_numpy(union_pool),
            torch.from_numpy(rel_inds),
            rois=torch.from_numpy(rois),
            im_sizes=[(h_img, w_img)])
        ref_obj, ref_rel = ref_obj.numpy(), ref_rel.numpy()

    tail = _Tail()
    np_ = np.transpose(node_pool, (0, 2, 3, 1))[None]      # NHWC
    up_ = np.transpose(union_pool, (0, 2, 3, 1))[None]
    b_s = boxes[pairs[:, 0]]
    b_o = boxes[pairs[:, 1]]
    pair_boxes = np.concatenate([b_s, b_o], 1)[None].astype(np.float32)
    pr = jnp.asarray(pairs)[None]
    mask = jnp.ones((1, e), bool)
    im_hw = jnp.asarray([[h_img, w_img]], jnp.float32)
    args = (jnp.asarray(np_), jnp.asarray(up_), jnp.asarray(pair_boxes),
            pr, mask, im_hw)
    variables = tail.init(jax.random.key(0), *args)
    variables = optimistic_update(variables, relmodel_flat_updates(ts))
    obj_logits, rel_logits = tail.apply(variables, *args)

    np.testing.assert_allclose(np.asarray(obj_logits[0]), ref_obj,
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rel_logits[0]), ref_rel,
                               atol=5e-5, rtol=1e-3)


def test_frequency_bias_parity():
    """Reference FrequencyBias.index_with_labels vs our embedding lookup."""
    torch = load_reference()
    import torch.nn as nn
    from lib.sparse_targets import FrequencyBias as RefFB

    table = np.random.RandomState(4).randn(C_CLS * C_CLS,
                                           R_PRED).astype(np.float32)
    fb = RefFB.__new__(RefFB)
    nn.Module.__init__(fb)
    fb.num_objs = C_CLS
    fb.obj_baseline = nn.Embedding(C_CLS * C_CLS, R_PRED)
    fb.obj_baseline.weight.data = torch.from_numpy(table)

    rng = np.random.RandomState(5)
    subj = rng.randint(0, C_CLS, 13)
    obj = rng.randint(0, C_CLS, 13)
    with torch.no_grad():
        want = fb.index_with_labels(
            torch.from_numpy(np.stack([subj, obj], 1)).long()).numpy()

    ours = FrequencyBias(num_classes=C_CLS, num_predicates=R_PRED,
                         init_table=table.reshape(C_CLS, C_CLS, R_PRED))
    variables = ours.init(jax.random.key(0), jnp.asarray(subj),
                          jnp.asarray(obj))
    got = ours.apply(variables, jnp.asarray(subj), jnp.asarray(obj))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # and through the state_dict import path
    flat = relmodel_flat_updates({"freq_bias.obj_baseline.weight": table})
    assert np.array_equal(flat["params/freq_bias/table"], table)
