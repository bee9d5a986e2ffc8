"""Shared Trainer assembly for the 2-process full-loop test.

Both the multi-host workers and the single-process reference run build the
EXACT same config/model/splits through here, so the parity comparison in
``test_distributed.test_two_process_full_trainer_loop`` cannot drift.
``SGG_IM_SCALE`` must be set (small canvas) in the environment before
sgg_tpu imports — the parent sets it for every subprocess.
"""

import os

import jax

# persistent compile cache (the parent's conftest sets this via jax.config,
# which subprocesses don't inherit)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from sgg_tpu.config import Config  # noqa: E402
from sgg_tpu.data import SyntheticSGGDataset  # noqa: E402
from sgg_tpu.data.datasets import SGGDataset  # noqa: E402
from sgg_tpu.models.relhead import RelModelIMP  # noqa: E402
from sgg_tpu.train.trainer import Trainer  # noqa: E402


def _to_sggdataset(ds: SyntheticSGGDataset, mode: str) -> SGGDataset:
    return SGGDataset(name="stanford", mode=mode, filenames=[],
                      images_dir="", gt_boxes=ds.gt_boxes,
                      gt_classes=ds.gt_classes,
                      relationships=ds.relationships,
                      ind_to_classes=ds.ind_to_classes,
                      ind_to_predicates=ds.ind_to_predicates,
                      box_coordinates="native")


def build_trainer(workdir: str) -> Trainer:
    """16-image train split (2 global batches/epoch), shared ckpt +
    feature-cache dirs under ``workdir``."""
    mk = lambda seed, n, mode: _to_sggdataset(
        SyntheticSGGDataset(num_images=n, num_classes=9, num_predicates=5,
                            max_objects=5, image_size=80, seed=seed), mode)
    splits = {"train": mk(0, 16, "train"), "val_alls": mk(1, 4, "val"),
              "test_alls": mk(2, 4, "test")}
    config = Config(batch_size=8, max_nodes=8, max_edges=12, mode="sgcls",
                    loss="dnorm", num_epochs=2, print_interval=1,
                    compute_dtype="float32", use_bias=True, steps=(1,),
                    save_dir=os.path.join(workdir, "ckpt"),
                    feature_cache=os.path.join(workdir, "fcache"))
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        use_bias=True, hidden_dim=16, obj_dim=32,
                        dtype=jnp.float32)
    return Trainer(config, splits, model=model, with_images=False)


def build_gan_trainer(workdir: str) -> Trainer:
    """-gan -perturb graphn trainer over the same synthetic splits; the
    2-process run must reproduce the single-process F/G/D losses (the
    perturbation is content-seeded per image, Trainer._gan_host_inputs)."""
    from sgg_tpu.models.gan import GANModel
    mk = lambda seed, n, mode: _to_sggdataset(
        SyntheticSGGDataset(num_images=n, num_classes=9, num_predicates=5,
                            max_objects=5, image_size=80, seed=seed), mode)
    splits = {"train": mk(0, 16, "train"), "val_alls": mk(1, 4, "val"),
              "test_alls": mk(2, 4, "test")}
    config = Config(batch_size=8, max_nodes=8, max_edges=12, mode="sgcls",
                    loss="dnorm", num_epochs=1, print_interval=1,
                    val_size=0, notest=True, compute_dtype="float32",
                    gan=True, ganlosses=("D", "G", "rec"),
                    perturb="graphn", L=0.5,
                    save_dir=os.path.join(workdir, "gan_ckpt"))
    model = RelModelIMP(num_classes=9, num_predicates=5, mode="sgcls",
                        hidden_dim=16, obj_dim=32, dtype=jnp.float32)
    gan = GANModel(num_classes=9, num_predicates=5, hidden_dim=8, n_ch=512,
                   fmap_sz=300 // 16, n_layers_G=2)
    return Trainer(config, splits, model=model, gan_model=gan,
                   with_images=False)


def run_fit(trainer: Trainer):
    """fit() with val every epoch; returns (last interval loss, results)."""
    logged = []
    trainer.log_fn = lambda d, **kw: logged.append(dict(d))
    results = trainer.fit(val_names=("val_alls",),
                          test_names=("test_alls",), val_every=1)
    losses = [d["loss/total"] for d in logged if "loss/total" in d]
    assert losses, "no interval losses were logged"
    return losses[-1], results
