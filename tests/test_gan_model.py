import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg_tpu.models.gan import (GANModel, GraphTripleConvNet,
                                add_dummy_nodes, avg_pool_ceil,
                                boxes_to_layout)

pytestmark = pytest.mark.slow


def test_add_dummy_nodes_static_slot():
    B, N, E = 2, 4, 3
    classes = jnp.asarray([[3, 5, 0, 0], [2, 4, 6, 0]])
    node_mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 0]], bool)
    boxes01 = jnp.ones((B, N, 4)) * 0.5
    rels = jnp.asarray([[[0, 1, 2], [0, 0, 0], [0, 0, 0]],
                        [[0, 2, 1], [1, 2, 3], [0, 0, 0]]])
    rel_mask = jnp.asarray([[1, 0, 0], [1, 1, 0]], bool)
    c, b, e, nm, em = add_dummy_nodes(classes, boxes01, rels, node_mask,
                                      rel_mask)
    assert c.shape == (B, N + 1) and b.shape == (B, N + 1, 4)
    assert e.shape == (B, E + 2 * N, 3) and em.shape == (B, E + 2 * N)
    # dummy is slot N, class 0, box [0,0,1,1], always valid
    np.testing.assert_array_equal(np.asarray(c[:, N]), 0)
    np.testing.assert_array_equal(np.asarray(b[0, N]), [0, 0, 1, 1])
    assert np.asarray(nm[:, N]).all()
    # extra edges masked by node validity: image 0 has 2 valid nodes ->
    # 2*2 extra valid edges; image 1 has 3 -> 6
    em = np.asarray(em)
    assert em[0].sum() == 1 + 4
    assert em[1].sum() == 2 + 6
    # two-way wiring
    e = np.asarray(e)
    assert (e[0, E] == [0, N, 0]).all()      # node0 -> dummy
    assert (e[0, E + N] == [N, 0, 0]).all()  # dummy -> node0


def test_gcn_padding_invariance():
    rng = np.random.RandomState(0)
    B, N, E, D = 1, 5, 4, 12
    net = GraphTripleConvNet(output_dim=8, num_layers=2, hidden_dim=16,
                             batch_norm=False)
    obj = rng.randn(B, N, D).astype(np.float32)
    pred = rng.randn(B, E, D).astype(np.float32)
    edges = np.asarray([[[0, 1], [1, 2], [0, 0], [0, 0]]])
    nmask = np.asarray([[1, 1, 1, 0, 0]], bool)
    emask = np.asarray([[1, 1, 0, 0]], bool)
    params = net.init(jax.random.key(0), jnp.asarray(obj), jnp.asarray(pred),
                      jnp.asarray(edges), jnp.asarray(nmask),
                      jnp.asarray(emask))
    o1, p1 = net.apply(params, jnp.asarray(obj), jnp.asarray(pred),
                       jnp.asarray(edges), jnp.asarray(nmask),
                       jnp.asarray(emask))
    # wildly perturb padded entries
    pred2 = pred.copy()
    pred2[0, 2:] = 1e3
    edges2 = edges.copy()
    edges2[0, 2:] = [[2, 1], [1, 0]]
    o2, p2 = net.apply(params, jnp.asarray(obj), jnp.asarray(pred2),
                       jnp.asarray(edges2), jnp.asarray(nmask),
                       jnp.asarray(emask))
    np.testing.assert_allclose(np.asarray(o1[0, :3]), np.asarray(o2[0, :3]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p1[0, :2]), np.asarray(p2[0, :2]),
                               atol=1e-4)


def test_boxes_to_layout_masks_padding():
    rng = np.random.RandomState(1)
    vecs = rng.randn(1, 3, 4, 4, 2).astype(np.float32)
    boxes = jnp.asarray([[[0, 0, 1, 1], [0.2, 0.2, 0.8, 0.8],
                          [0, 0, 1, 1]]], jnp.float32)
    mask = jnp.asarray([[1, 1, 0]], bool)
    out = boxes_to_layout(jnp.asarray(vecs), boxes, mask, 8, 8)
    # padded node must not contribute: compare against 2-node version
    out2 = boxes_to_layout(jnp.asarray(vecs[:, :2]), boxes[:, :2],
                           mask[:, :2], 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_boxes_to_layout_matches_gather_formulation():
    """The separable-einsum paint equals the 4-tap-gather grid_sample
    composition it replaced (same affine grid, same tap math)."""
    from sgg_tpu.ops.grid_sample import boxes01_to_grid, grid_sample_2d

    rng = np.random.RandomState(3)
    B, N, P, D, H = 2, 5, 7, 6, 19
    vecs = rng.randn(B, N, P, P, D).astype(np.float32)
    boxes = rng.rand(B, N, 4).astype(np.float32) * 0.5
    boxes[..., 2:] = boxes[..., :2] + rng.rand(B, N, 2).astype(np.float32) * 0.5
    boxes[0, 1] = [0.3, 0.3, 0.3, 0.9]  # degenerate width
    mask = np.ones((B, N), bool)
    mask[1, 3:] = False

    got = np.asarray(boxes_to_layout(jnp.asarray(vecs), jnp.asarray(boxes),
                                     jnp.asarray(mask), H, H, pooling="avg"))
    grid = boxes01_to_grid(jnp.asarray(boxes), H, H)
    sampled = grid_sample_2d(jnp.asarray(vecs), grid)
    m = jnp.asarray(mask, jnp.float32)[..., None, None, None]
    want = (sampled * m).sum(axis=1)
    want = want / jnp.maximum(mask.sum(axis=1), 1)[:, None, None, None]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5)


def test_avg_pool_ceil_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    x = rng.randn(1, 35, 35, 3).astype(np.float32)
    got = np.asarray(avg_pool_ceil(jnp.asarray(x), 2))
    want = torch.nn.functional.avg_pool2d(
        torch.tensor(x).permute(0, 3, 1, 2), 2,
        ceil_mode=True, count_include_pad=False)
    want = want.permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (1, 18, 18, 3)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gan_generate_and_discriminate_shapes():
    rng = np.random.RandomState(3)
    B, N, E = 2, 5, 6
    gan = GANModel(num_classes=10, num_predicates=6, hidden_dim=8, n_ch=32,
                   fmap_sz=24, n_layers_G=2)
    classes = jnp.asarray(rng.randint(1, 10, (B, N)))
    boxes01 = jnp.asarray(rng.rand(B, N, 4), jnp.float32)
    boxes01 = boxes01.at[..., 2:].set(
        jnp.clip(boxes01[..., :2] + 0.3, 0, 1))
    rels = jnp.asarray(rng.randint(0, N, (B, E, 3)))
    rels = rels.at[..., 2].set(rng.randint(1, 6, (B, E)))
    nmask = jnp.ones((B, N), bool)
    emask = jnp.ones((B, E), bool)

    variables = gan.init(jax.random.key(0), classes, boxes01, rels, nmask,
                         emask, train=False, method=gan.init_all)
    fmaps = gan.apply(variables, classes, boxes01, rels, nmask, emask,
                      train=False)
    assert fmaps.shape == (B, 24, 24, 32)
    assert np.isfinite(np.asarray(fmaps)).all()
    assert (np.asarray(fmaps) >= 0).all()  # final relu

    node_feats = jnp.asarray(rng.randn(B, N, 7, 7, 32), jnp.float32)
    d_out = gan.apply(variables, node_feats, classes,
                      method=gan.disc_nodes)
    assert d_out.shape == (B, N, 1)
    d_edge = gan.apply(variables, jnp.asarray(
        rng.randn(B, E, 7, 7, 32), jnp.float32),
        rels[..., 2], method=gan.disc_edges)
    assert d_edge.shape == (B, E, 1)
    d_glob = gan.apply(variables, fmaps, method=gan.disc_global)
    assert d_glob.shape == (B, 1)
    # G_/D_ param partition exists at the top level
    top = set(variables["params"].keys())
    assert "G" in top and {"D_nodes", "D_edges", "D_global"} <= top


def test_init_embed_initializes_embeddings():
    from sgg_tpu.data.word_vectors import normalized_class_embeddings
    names = ["__background__"] + [f"class_{i}" for i in range(1, 10)]
    emb_o = normalized_class_embeddings(names, wv_dim=200)
    gan = GANModel(num_classes=10, num_predicates=6, hidden_dim=8, n_ch=32,
                   fmap_sz=24, n_layers_G=2, init_embed_objs=emb_o)
    rng = np.random.RandomState(0)
    classes = jnp.asarray(rng.randint(1, 10, (1, 4)))
    boxes01 = jnp.asarray(rng.rand(1, 4, 4), jnp.float32)
    rels = jnp.asarray([[[0, 1, 2]]])
    variables = gan.init(jax.random.key(0), classes, boxes01, rels,
                         jnp.ones((1, 4), bool), jnp.ones((1, 1), bool),
                         train=False, method=gan.init_all)
    got = np.asarray(variables["params"]["G"]["obj_embed"]["embedding"])
    np.testing.assert_allclose(got, emb_o, atol=1e-6)
