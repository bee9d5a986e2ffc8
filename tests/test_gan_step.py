"""GAN training-step tests: three-optimizer choreography + detach map."""

import jax
import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models.gan import GANModel
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.ops.boxes import scale_boxes_01
from sgg_tpu.train.assign import sample_edges
from sgg_tpu.train.gan_step import create_gan_state, make_gan_train_step
from sgg_tpu.train.state import create_train_state
import pytest

pytestmark = pytest.mark.slow

N_CLS, N_PRED = 9, 5


def _setup(ganlosses=("D", "G", "rec"), attachG=False, perturb=None):
    config = Config(batch_size=2, max_nodes=6, max_edges=10, mode="sgcls",
                    loss="dnorm", compute_dtype="float32", gan=True,
                    ganlosses=ganlosses, attachG=attachG, perturb=perturb,
                    L=0.5 if perturb else 0.2)
    ds = SyntheticSGGDataset(num_images=2, num_classes=N_CLS,
                             num_predicates=N_PRED, max_objects=4,
                             image_size=128, with_images=True, seed=0)
    gb = ds.batch([0, 1], max_nodes=6, max_edges=10)
    model = RelModelIMP(num_classes=N_CLS, num_predicates=N_PRED,
                        mode="sgcls", hidden_dim=16, obj_dim=32,
                        dtype=jnp.float32)
    gan = GANModel(num_classes=N_CLS, num_predicates=N_PRED, hidden_dim=8,
                   n_ch=512, fmap_sz=128 // 16, n_layers_G=2)
    sampled, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                               gb.node_mask, max_out=10)
    variables = model.init(jax.random.key(0), gb.images, gb.boxes,
                           gb.classes, sampled[..., :2], pm, train=False)
    sgg_state = create_train_state(config, variables)
    boxes01 = scale_boxes_01(gb.boxes, gb.im_hw)
    gan_vars = gan.init(jax.random.key(1), gb.classes, boxes01, gb.rels,
                        gb.node_mask, gb.rel_mask, train=False,
                        method=gan.init_all)
    state = create_gan_state(config, sgg_state, gan_vars)
    return config, model, gan, gb, state


def test_gan_step_runs_and_updates_everything():
    config, model, gan, gb, state = _setup()
    step = make_gan_train_step(model, gan, config)
    p0 = jax.tree_util.tree_map(np.asarray, state.gan_params)
    f0 = jax.tree_util.tree_map(np.asarray, state.sgg.params)
    state, metrics = step(state, gb, gb.classes, None, jax.random.key(0))
    for k in ("obj_loss", "rel_loss", "G_obj", "G_rel", "G_fmap",
              "obj_loss_rec", "rel_loss_rec", "D_obj", "D_rel", "D_fmap"):
        assert k in metrics, (k, sorted(metrics))
        assert np.isfinite(float(metrics[k])), k

    def max_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - np.asarray(y)).max()), a, b)))

    # G and D params both moved
    assert max_delta(state.gan_params["G"], p0["G"]) > 0
    assert max_delta(state.gan_params["D_nodes"], p0["D_nodes"]) > 0
    # SGG head moved (F update + rec)
    assert max_delta(state.sgg.params["imp"], f0["imp"]) > 0
    # frozen trunk untouched
    assert max_delta(state.sgg.params["trunk"], f0["trunk"]) == 0


def test_gan_step_from_cached_fmaps_matches_image_path():
    """The F/G/D step on a feature-cache batch (fmaps instead of images)
    produces the same losses — the trunk is frozen under -gan too, so the
    discriminators' 'real' fmap is exactly the cached one."""
    import dataclasses as dc

    from sgg_tpu.models.backbone import VGG16Trunk

    config, model, gan, gb, state = _setup()
    # non-square CONTENT inside the square canvas: the layout frame must
    # be the padded canvas (identical for the image batch and the
    # fmaps-only batch), not the per-image content size
    gb = dc.replace(gb, im_hw=np.asarray([[128.0, 96.0], [100.0, 128.0]],
                                         np.float32))
    trunk = VGG16Trunk(dtype=jnp.float32)
    fmaps = jax.jit(lambda v, x: trunk.apply(v, x))(
        {"params": state.sgg.params["trunk"]}, gb.images)
    gbc = dc.replace(gb, images=None, fmaps=fmaps)
    step = make_gan_train_step(model, gan, config)

    state_b = jax.tree_util.tree_map(jnp.array, state)
    _, m_img = step(state, gb, gb.classes, None, jax.random.key(0))
    _, m_cached = step(state_b, gbc, gbc.classes, None, jax.random.key(0))
    for k in ("obj_loss", "rel_loss", "G_fmap", "D_fmap", "total"):
        if k in m_img:
            assert float(m_cached[k]) == pytest.approx(float(m_img[k]),
                                                       rel=1e-4, abs=1e-5), k


def test_d_only_update_leaves_g_alone():
    config, model, gan, gb, state = _setup(ganlosses=("D",))
    step = make_gan_train_step(model, gan, config)
    p0 = jax.tree_util.tree_map(np.asarray, state.gan_params)
    state, metrics = step(state, gb, gb.classes, None, jax.random.key(0))
    assert "D_obj" in metrics and "G_obj" not in metrics

    def max_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - np.asarray(y)).max()), a, b)))

    assert max_delta(state.gan_params["G"], p0["G"]) == 0
    assert max_delta(state.gan_params["D_global"], p0["D_global"]) > 0


def test_g_only_update_leaves_d_alone():
    config, model, gan, gb, state = _setup(ganlosses=("G",))
    step = make_gan_train_step(model, gan, config)
    p0 = jax.tree_util.tree_map(np.asarray, state.gan_params)
    state, metrics = step(state, gb, gb.classes, None, jax.random.key(0))
    assert "G_obj" in metrics and "D_obj" not in metrics

    def max_delta(a, b):
        return max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda x, y: float(jnp.abs(x - np.asarray(y)).max()), a, b)))

    assert max_delta(state.gan_params["G"], p0["G"]) > 0
    assert max_delta(state.gan_params["D_nodes"], p0["D_nodes"]) == 0


def test_perturbed_classes_flow_through():
    config, model, gan, gb, state = _setup()
    step = make_gan_train_step(model, gan, config)
    fake = np.asarray(gb.classes).copy()
    fake[np.asarray(gb.node_mask)] = (
        fake[np.asarray(gb.node_mask)] % (N_CLS - 1)) + 1
    state, metrics = step(state, gb, jnp.asarray(fake), None,
                          jax.random.key(0))
    assert np.isfinite(float(metrics["total"]))
