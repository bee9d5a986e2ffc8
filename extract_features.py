"""Offline per-class feature extraction for the GAN feature bank.

Rebuild of ``/root/reference/extract_features.py``: one pass over the train
set through the (frozen-detector) SGG model, appending each GT object's
RoIAligned node features to per-class datasets in
``{save_dir}/features.hdf5`` — the bank that conditions the GAN generator
(``-vis_cond``). Here the forward is the jitted eval step over padded
batches; the bank writer lives in ``sgg_tpu.augment.feature_bank``.
"""

from __future__ import annotations

import os


def extract_features(trainer, save_dir: str, n_batches: int = -1,
                     batch_size: int = 8, num_workers: int = 4) -> str:
    """Run the extraction with an assembled Trainer; returns the hdf5 path."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from sgg_tpu.augment.feature_bank import FeatureBankWriter
    from sgg_tpu.data.pipeline import BatchLoader
    from sgg_tpu.train.assign import sample_edges

    config = trainer.config
    ds = trainer.train_data
    model = trainer.model

    @jax.jit
    def feats_step(variables, batch):
        sampled, pm = sample_edges(jax.random.key(0), batch.rels,
                                   batch.rel_mask, batch.node_mask,
                                   max_out=batch.max_edges)
        out = model.apply(variables, batch.images, batch.boxes,
                          batch.classes, sampled[..., :2], pm,
                          fmap=batch.fmaps, train=False,
                          return_feats=True)
        return out["node_pool"].astype(jnp.float32)

    # with -feature_cache the one-time bank pass skips the trunk too
    # (reference budget: "~1 hour" on a modern GPU, README.md:75)
    loader = BatchLoader(ds, batch_size=batch_size,
                         max_nodes=config.max_nodes,
                         max_edges=config.max_edges, shuffle=False,
                         drop_last=False, with_images=trainer.with_images,
                         num_workers=num_workers,
                         feature_cache=trainer._feature_cache_for(
                             "train", ds))
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "features.hdf5")
    pool_shape = None
    writer = None
    for b_i, batch in enumerate(loader):
        if n_batches > -1 and b_i >= n_batches:
            break
        pools = np.asarray(feats_step(trainer.variables, batch))
        if writer is None:
            pool_shape = pools.shape[2:]
            writer = FeatureBankWriter(path, pool_shape)
        classes = np.asarray(batch.classes)
        mask = np.asarray(batch.node_mask)
        for b in range(pools.shape[0]):
            for i in range(pools.shape[1]):
                if not mask[b, i]:
                    continue
                name = ds.ind_to_classes[classes[b, i]]
                writer.append(name, pools[b, i][None])
    if writer is not None:
        writer.close()
    return path


def main():
    from sgg_tpu.config import config_from_args
    from sgg_tpu.data import visual_genome
    from sgg_tpu.train.trainer import Trainer

    config = config_from_args()
    assert config.save_dir, "-save_dir is required"
    splits = visual_genome.splits(config.data, num_val_im=config.val_size)
    trainer = Trainer(config, splits)
    path = extract_features(trainer, config.save_dir)
    print("wrote", path)


if __name__ == "__main__":
    main()
