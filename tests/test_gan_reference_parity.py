"""Weight-level differential: our GAN generator vs the reference torch GAN.

Runs the reference's own modules (``/root/reference/augment/{gan,graphconv,
crn,layout}.py`` — pure torch, CPU-constructible) with randomized weights,
imports their state_dict through
``sgg_tpu.train.checkpoint.gan_generator_flat_updates`` and asserts output
parity on identical scene graphs: boxes_to_layout, GraphTripleConvNet
(masked-BN eval), the CRN (exact adaptive-pool binning + legacy-nearest
upsampling), and the FULL generator forward (embeddings -> dummy nodes ->
GCN -> spatialize -> proj -> layout -> CRN).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from sgg_tpu.models.gan import boxes_to_layout  # noqa: E402
from sgg_tpu.models.gan.crn import RefinementNetwork  # noqa: E402
from sgg_tpu.models.gan.gan import Generator  # noqa: E402
from sgg_tpu.models.gan.graphconv import GraphTripleConvNet  # noqa: E402
from sgg_tpu.train.checkpoint import (gan_generator_flat_updates,
                                      optimistic_update)  # noqa: E402

from reference_utils import load_reference  # noqa: E402

pytestmark = pytest.mark.slow

C_CLS, R_PRED = 9, 6
EMBED, HID, N_CH, POOL, FMAP, LAYERS = 16, 8, 16, 7, 19, 2


def _randomize_bn(torch, module):
    """Perturb BN affine + running stats so import mapping errors show."""
    g = torch.Generator().manual_seed(5)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.weight.data = torch.rand(m.weight.shape, generator=g) + 0.5
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.3
            m.running_mean.data = torch.randn(m.running_mean.shape,
                                              generator=g) * 0.2
            m.running_var.data = torch.rand(m.running_var.shape,
                                            generator=g) * 0.5 + 0.7


def _state_np(m):
    return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()
            if v.dtype.is_floating_point}


def _make_ref_gan(torch):
    """Bare reference GAN with the generator ctor lines (gan.py:66-131)."""
    import torch.nn as nn
    from augment.crn import RefinementNetwork as RefCRN
    from augment.gan import GAN
    from augment.graphconv import GraphTripleConvNet as RefGCN

    torch.manual_seed(3)
    g = GAN.__new__(GAN)
    nn.Module.__init__(g)
    g.pool_sz, g.fmap_sz, g.n_ch, g.h5_data = POOL, FMAP, N_CH, None
    g.G_obj_embed = nn.Embedding(C_CLS, EMBED)
    g.G_rel_embed = nn.Embedding(R_PRED, EMBED)
    g.G_gcn = RefGCN(input_dim=EMBED + 4, input_edge_dim=EMBED,
                     output_dim=HID // 2 * POOL * POOL, num_layers=LAYERS,
                     hidden_dim=HID, pooling="avg",
                     mlp_normalization="batch")
    g.G_node = nn.Sequential(
        nn.Conv2d(HID // 2, HID, kernel_size=3, padding=1), nn.ReLU(),
        nn.Conv2d(HID, HID, kernel_size=3, padding=1), nn.ReLU())
    g.G_proj = nn.Conv2d(HID, HID, kernel_size=1)
    g.G_refine = RefCRN(dims=(HID, N_CH // 4, N_CH // 2, N_CH),
                        normalization="batch", activation="leakyrelu-0.2")
    _randomize_bn(torch, g)
    g.eval()
    return g


def _scene(rng, n=5, e=6):
    classes = rng.randint(1, C_CLS, n)
    boxes01 = rng.rand(n, 4).astype(np.float32) * 0.5
    boxes01[:, 2:] = boxes01[:, :2] + rng.rand(n, 2).astype(np.float32) * 0.4
    rels = np.stack([rng.randint(0, n, e), rng.randint(0, n, e),
                     rng.randint(1, R_PRED, e)], 1)
    bad = rels[:, 0] == rels[:, 1]
    rels[bad, 1] = (rels[bad, 0] + 1) % n
    return classes.astype(np.int32), boxes01, rels.astype(np.int32)


def test_boxes_to_layout_parity():
    torch = load_reference()
    from augment.layout import boxes_to_layout as ref_layout

    rng = np.random.RandomState(0)
    n, d = 4, 5
    vecs = rng.randn(n, d, POOL, POOL).astype(np.float32)
    boxes = rng.rand(n, 4).astype(np.float32) * 0.5
    boxes[:, 2:] = boxes[:, :2] + 0.3
    with torch.no_grad():
        want = ref_layout(torch.from_numpy(vecs), torch.from_numpy(boxes),
                          torch.zeros(n).long(), FMAP, FMAP,
                          pooling="sum").numpy()
    got = boxes_to_layout(
        jnp.asarray(np.transpose(vecs, (0, 2, 3, 1)))[None],
        jnp.asarray(boxes)[None], jnp.ones((1, n), bool), FMAP, FMAP,
        pooling="sum")
    np.testing.assert_allclose(np.asarray(got[0]).transpose(2, 0, 1),
                               want[0], atol=2e-5, rtol=1e-4)


def test_graphconvnet_parity():
    torch = load_reference()
    from augment.graphconv import GraphTripleConvNet as RefGCN

    torch.manual_seed(1)
    din, dpe, dout = 10, 6, 12
    ref = RefGCN(input_dim=din, input_edge_dim=dpe, output_dim=dout,
                 num_layers=3, hidden_dim=HID, pooling="avg",
                 mlp_normalization="batch")
    _randomize_bn(torch, ref)
    ref.eval()
    ts = {f"G_gcn.{k}": v for k, v in _state_np(ref).items()}

    rng = np.random.RandomState(2)
    n, e = 6, 8
    obj = rng.randn(n, din).astype(np.float32)
    pred = rng.randn(e, dpe).astype(np.float32)
    edges = np.stack([rng.randint(0, n, e), rng.randint(0, n, e)],
                     1).astype(np.int64)
    with torch.no_grad():
        want_o, want_p = ref(torch.from_numpy(obj), torch.from_numpy(pred),
                             torch.from_numpy(edges))

    ours = GraphTripleConvNet(output_dim=dout, num_layers=3, hidden_dim=HID,
                              pooling="avg", batch_norm=True,
                              dtype=jnp.float32)
    args = (jnp.asarray(obj)[None], jnp.asarray(pred)[None],
            jnp.asarray(edges.astype(np.int32))[None],
            jnp.ones((1, n), bool), jnp.ones((1, e), bool))
    variables = ours.init(jax.random.key(0), *args)
    flat = {k.replace("gcn/gconv_", "gconv_"): v
            for k, v in gan_generator_flat_updates(ts, num_gcn_layers=3)
            .items() if "gconv_" in k}
    variables = optimistic_update(variables, flat)
    got_o, got_p = ours.apply(variables, *args)
    np.testing.assert_allclose(np.asarray(got_o[0]), want_o.numpy(),
                               atol=3e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_p[0]), want_p.numpy(),
                               atol=3e-5, rtol=1e-3)


def test_crn_parity():
    torch = load_reference()
    from augment.crn import RefinementNetwork as RefCRN

    torch.manual_seed(4)
    ref = RefCRN(dims=(HID, N_CH // 4, N_CH // 2, N_CH),
                 normalization="batch", activation="leakyrelu-0.2")
    _randomize_bn(torch, ref)
    ref.eval()
    ts = {f"G_refine.{k}": v for k, v in _state_np(ref).items()}

    rng = np.random.RandomState(6)
    layout = rng.randn(1, HID, FMAP, FMAP).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(layout)).numpy()

    ours = RefinementNetwork(dims=(HID, N_CH // 4, N_CH // 2, N_CH),
                             dtype=jnp.float32)
    x = jnp.asarray(np.transpose(layout, (0, 2, 3, 1)))
    variables = ours.init(jax.random.key(0), x, train=False)
    flat = {k.replace("refine/", ""): v
            for k, v in gan_generator_flat_updates(ts).items()
            if "refine/" in k}
    variables = optimistic_update(variables, flat)
    got = ours.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got[0]).transpose(2, 0, 1),
                               want[0], atol=5e-5, rtol=1e-3)


def test_full_generator_parity():
    torch = load_reference()
    g = _make_ref_gan(torch)
    ts = _state_np(g)

    rng = np.random.RandomState(8)
    classes, boxes01, rels = _scene(rng)
    n = len(classes)
    gt_objects = np.column_stack([np.zeros(n, np.int64), classes])
    gt_rels = np.column_stack([np.zeros(len(rels), np.int64), rels])
    with torch.no_grad():
        want = g(torch.from_numpy(gt_objects).long(),
                 torch.from_numpy(boxes01),
                 torch.from_numpy(gt_rels).long()).numpy()

    ours = Generator(num_classes=C_CLS, num_predicates=R_PRED,
                     embed_dim=EMBED, hidden_dim=HID, n_ch=N_CH,
                     pool_sz=POOL, fmap_sz=FMAP, n_layers=LAYERS,
                     batch_norm=True, dtype=jnp.float32)
    args = (jnp.asarray(classes)[None], jnp.asarray(boxes01)[None],
            jnp.asarray(rels)[None], jnp.ones((1, n), bool),
            jnp.ones((1, len(rels)), bool))
    variables = ours.init(jax.random.key(0), *args, train=False)
    variables = optimistic_update(
        variables, gan_generator_flat_updates(ts, num_gcn_layers=LAYERS))
    got = ours.apply(variables, *args, train=False)
    np.testing.assert_allclose(np.asarray(got[0]).transpose(2, 0, 1),
                               want[0], atol=1e-4, rtol=1e-3)
