"""End-to-end Trainer throughput on the real chip: input pipeline included.

Unlike bench.py (device-resident batch, pure step time), this drives the
full path: host image prep → native packing → bf16 conversion → prefetched
H2D → jitted train step.  Run: python tools/e2e_throughput.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax


def main():
    import jax.numpy as jnp

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.data.datasets import SGGDataset
    from sgg_tpu.train.trainer import Trainer

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    B, N, E = 24, 40, 256
    n_img = B * 6
    syn = SyntheticSGGDataset(num_images=n_img, num_classes=151,
                              num_predicates=51, max_objects=20,
                              image_size=592, with_images=True, seed=0)
    ds = SGGDataset(name="stanford", mode="train", filenames=[],
                    images_dir="", gt_boxes=syn.gt_boxes,
                    gt_classes=syn.gt_classes,
                    relationships=syn.relationships,
                    ind_to_classes=syn.ind_to_classes,
                    ind_to_predicates=syn.ind_to_predicates,
                    box_coordinates="native")
    config = Config(batch_size=B, max_nodes=N, max_edges=E, mode="sgcls",
                    loss="dnorm", val_size=0, notest=True,
                    print_interval=100, num_epochs=1)
    trainer = Trainer(config, {"train": ds}, with_images=False)

    # warmup epoch (compile)
    t0 = time.time()
    trainer.train_epoch(0)
    print(f"epoch 0 (compile): {time.time() - t0:.1f}s")
    t0 = time.time()
    trainer.train_epoch(1)
    dt = time.time() - t0
    steps = n_img // B
    print(f"epoch 1: {dt:.2f}s for {steps} steps -> "
          f"{n_img / dt:.1f} img/s end-to-end")


if __name__ == "__main__":
    main()
# note: Config default image_format='uint8' exercises the low-bandwidth path
