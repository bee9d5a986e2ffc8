"""Production-shape soak on the real chip: full Trainer loop over a
VG-statistics synthetic set (151 classes / 51 predicates, 592px, b=24),
several epochs with eval — demonstrates sustained pipeline throughput,
overfitting dynamics, checkpointing and the NaN guard end-to-end.

Run: python tools/soak_tpu.py [n_images] [epochs] [cache_dir]
A third argument enables the frozen-trunk feature cache
(data/feature_cache.py): epoch 0 pays one extraction pass, every epoch
trains/evals from the cache.
"""

import sys
import time

sys.path.insert(0, ".")

import jax


def main():
    import numpy as np

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.data.datasets import SGGDataset
    from sgg_tpu.train.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    cache_dir = sys.argv[3] if len(sys.argv) > 3 else None

    def mk(seed, n, mode):
        syn = SyntheticSGGDataset(num_images=n, num_classes=151,
                                  num_predicates=51, max_objects=20,
                                  image_size=592, seed=seed)
        return SGGDataset(name="stanford", mode=mode, filenames=[],
                          images_dir="", gt_boxes=syn.gt_boxes,
                          gt_classes=syn.gt_classes,
                          relationships=syn.relationships,
                          ind_to_classes=syn.ind_to_classes,
                          ind_to_predicates=syn.ind_to_predicates,
                          box_coordinates="native")

    splits = {"train": mk(0, n_img, "train"),
              "val_alls": mk(1, 48, "val"),
              "test_alls": mk(0, 48, "test"),  # same stats as train
              "val_zs": mk(3, 24, "val"), "test_zs": mk(4, 24, "test")}
    config = Config(batch_size=24, max_nodes=40, max_edges=256,
                    mode="predcls", loss="dnorm", use_bias=True,
                    num_epochs=epochs, print_interval=5, val_size=0,
                    compute_dtype="bfloat16", save_dir="/tmp/soak_run",
                    lr=3e-3, feature_cache=cache_dir)
    t0 = time.time()
    trainer = Trainer(config, splits, with_images=False)
    results = trainer.fit(test_names=("test_alls",))
    dt = time.time() - t0
    n_steps = (n_img // 24) * epochs
    print(f"SOAK: {epochs} epochs x {n_img} imgs in {dt:.0f}s "
          f"({24 * n_steps / dt:.1f} img/s incl eval+ckpt)")
    for k in sorted(results):
        if "R@100" in k or k.startswith("avg/"):
            print(f"  {k}: {results[k]:.4f}")


if __name__ == "__main__":
    main()
