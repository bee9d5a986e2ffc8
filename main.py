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

    # SGG_CHECK_SIZES=0 relaxes the full-dataset integrity asserts
    # (108073 images, hardcoded eval-split sizes) so a miniature
    # schema-exact fixture (sgg_tpu.data.fixtures / tools/
    # make_fixture_dataset.py) can drive the complete CLI end-to-end.
    check_sizes = os.environ.get("SGG_CHECK_SIZES", "1") != "0"
    if config.split == "stanford":
        from sgg_tpu.data import visual_genome as dsmod
        splits = dsmod.splits(config.data, check_sizes=check_sizes,
                              num_val_im=config.val_size,
                              min_graph_size=config.min_graph_size,
                              max_graph_size=config.max_graph_size,
                              # non-overlap filtering is an sgdet-only train
                              # filter (reference main.py:47)
                              filter_non_overlap=config.mode == "sgdet")
    elif config.split == "synthetic":
        # full train/eval path on generated data — no 60 GB download needed
        # (smoke-testing / CI; vocabulary sizes match VG-Stanford). val_size
        # sizes the generated eval sets only when set to something small —
        # its reference DEFAULT of 5000 (a subsample cap for the real 26k
        # val split) would otherwise generate 5000-image eval sets and turn
        # the smoke run into hours of eval.
        from sgg_tpu.data.synthetic import synthetic_splits
        if not (0 < config.val_size <= 1000):
            print(f"[synthetic] -val_size {config.val_size} out of the "
                  "smoke-run range (0, 1000] -> generating 16-image eval "
                  "sets instead")
        splits = synthetic_splits(
            num_eval=config.val_size if 0 < config.val_size <= 1000 else 16)
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

    detector = det_variables = None
    if config.mode == "sgdet":
        # load the pretrained detector (reference: sgdet refuses to start
        # without one, pytorch_misc.py:210-211)
        assert config.ckpt, "-ckpt must point to a pretrained detector dir"
        from sgg_tpu.models.detector import FasterRCNNFPN, FasterRCNNVGG
        from sgg_tpu.train.checkpoint import restore_payload
        cls = FasterRCNNVGG if config.backbone == "vgg16" else FasterRCNNFPN
        detector = cls(num_classes=splits["train"].num_classes)
        # restore_payload needs no template — a detector.init forward here
        # would be discarded immediately
        restored, epoch = restore_payload(config.ckpt)
        assert epoch >= 0, f"no detector checkpoint found in {config.ckpt}"
        det_variables = {"params": restored["params"],
                         "batch_stats": restored["batch_stats"]}
        print(f"loaded detector checkpoint from epoch {epoch}")

    trainer = Trainer(config, splits, detector=detector,
                      det_variables=det_variables, log_fn=log_fn)
    results = trainer.fit()
    for k, v in sorted(results.items()):
        if not k.startswith("_"):
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
