"""Full GAN training program: Trainer.fit with -gan -perturb graphn."""

import jax.numpy as jnp
import numpy as np

from sgg_tpu.config import Config
from sgg_tpu.models.gan import GANModel
from sgg_tpu.models.relhead import RelModelIMP
from sgg_tpu.train.trainer import Trainer
from test_trainer import _splits
import pytest

pytestmark = pytest.mark.slow


def test_gan_trainer_fit(tmp_path):
    config = Config(batch_size=4, max_nodes=8, max_edges=12, mode="sgcls",
                    loss="dnorm", num_epochs=1, print_interval=2,
                    val_size=0, notest=True, compute_dtype="float32",
                    save_dir=str(tmp_path / "gan_run"), gan=True,
                    ganlosses=("D", "G", "rec"), perturb="graphn", L=0.5)
    splits = _splits()
    # im_scale for the fake-image path in BatchLoader is 592-based; use
    # feature-free batches at a small scale by overriding the model dims
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    gan = GANModel(num_classes=9, num_predicates=5, hidden_dim=8, n_ch=512,
                   fmap_sz=300 // 16, n_layers_G=2)
    trainer = Trainer(config, splits, model=model, gan_model=gan,
                      with_images=False)
    assert trainer.gan_state is not None
    assert trainer.perturber is not None
    losses = trainer.train_epoch(0)
    for k in ("obj_loss", "rel_loss", "G_obj", "D_obj", "rel_loss_rec"):
        assert k in losses, (k, sorted(losses))
        assert np.isfinite(losses[k])
    # checkpoint round trip including GAN state
    trainer._save(0)
    t2 = Trainer(config, splits, model=model, gan_model=gan,
                 with_images=False)
    assert t2.start_epoch == 1
    a = jnp.asarray(trainer.gan_state.gan_params["G"]["obj_embed"]
                    ["embedding"])
    b = jnp.asarray(t2.gan_state.gan_params["G"]["obj_embed"]["embedding"])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
