"""CLI entry point: train/evaluate SGG models on VG / GQA / VTE.

Flag-parity with the reference ``python main.py -m {predcls,sgcls,sgdet} ...``
(``/root/reference/main.py``); see ``sgg_tpu/config.py`` for the full flag
list. Dataset splits load from ``-data`` (the reference's download helper is
``sgg_tpu.data.download``).
"""

from __future__ import annotations

import os


def main():
    import jax

    from sgg_tpu.config import config_from_args
    from sgg_tpu.train.trainer import Trainer
    from sgg_tpu.utils.logging import make_logger

    config = config_from_args()
    print("~~~~~~~~ Hyperparameters: ~~~~~~~")
    for k, v in sorted(vars(config).items()):
        print(f"{k} : {v}")

    if config.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    if config.split == "stanford":
        from sgg_tpu.data import visual_genome as dsmod
        splits = dsmod.splits(config.data, num_val_im=config.val_size,
                              min_graph_size=config.min_graph_size,
                              max_graph_size=config.max_graph_size)
    elif config.split == "gqa":
        from sgg_tpu.data import gqa as dsmod
        splits = dsmod.splits(config.data, num_val_im=config.val_size,
                              min_graph_size=config.min_graph_size,
                              max_graph_size=config.max_graph_size,
                              exclude_left_right=config.exclude_left_right)
    else:
        from sgg_tpu.data import vtranse as dsmod
        splits = dsmod.splits(config.data, num_val_im=config.val_size,
                              min_graph_size=config.min_graph_size,
                              max_graph_size=config.max_graph_size)

    log_fn = make_logger(config)
    trainer = Trainer(config, splits, log_fn=log_fn)
    results = trainer.fit()
    for k, v in sorted(results.items()):
        if not k.startswith("_"):
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
