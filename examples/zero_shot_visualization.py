"""Zero-shot scene-graph visualization (reference ``Zero_Shot_VG.ipynb``).

Runs a model over zero-shot split images and renders ground-truth vs
predicted scene graphs with zero-shot edges highlighted red
(``lib/visualize.py`` semantics). With no real dataset present it falls back
to the synthetic dataset so the pipeline is demonstrable anywhere:

    python examples/zero_shot_visualization.py [data_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(data_dir: str = "./data", out_dir: str = "./zs_viz", n_images=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgg_tpu.config import Config
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.data.datasets import SGGDataset
    from sgg_tpu.eval import filter_dets, rank_predicted_rels
    from sgg_tpu.models.relhead import RelModelIMP
    from sgg_tpu.train.assign import sample_edges
    from sgg_tpu.train.step import make_eval_step
    from sgg_tpu.train.trainer import Trainer
    from sgg_tpu.utils.visualize import show_nx

    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(os.path.join(data_dir, "VG", "stanford_filtered")):
        from sgg_tpu.data import visual_genome
        splits = visual_genome.splits(data_dir)
    else:
        print("no VG data found — using the synthetic dataset")
        mk = lambda seed, mode: SGGDataset(
            name="stanford", mode=mode, filenames=[], images_dir="",
            gt_boxes=SyntheticSGGDataset(num_images=8, seed=seed).gt_boxes,
            gt_classes=SyntheticSGGDataset(num_images=8,
                                           seed=seed).gt_classes,
            relationships=SyntheticSGGDataset(num_images=8,
                                              seed=seed).relationships,
            ind_to_classes=SyntheticSGGDataset(num_images=1).ind_to_classes,
            ind_to_predicates=SyntheticSGGDataset(
                num_images=1).ind_to_predicates)
        splits = {"train": mk(0, "train"), "val_zs": mk(1, "val"),
                  "val_alls": mk(2, "val"), "test_zs": mk(3, "test"),
                  "test_alls": mk(4, "test")}

    config = Config(batch_size=2, max_nodes=24, max_edges=64,
                    mode="predcls", compute_dtype="float32", val_size=0,
                    notest=True)
    model = RelModelIMP(num_classes=splits["train"].num_classes,
                        num_predicates=splits["train"].num_predicates,
                        mode="predcls", hidden_dim=64, obj_dim=128,
                        dtype=jnp.float32)
    trainer = Trainer(config, splits, model=model, with_images=False)
    eval_step = make_eval_step(model, mode="predcls")

    from sgg_tpu.data.pipeline import BatchLoader
    ds = splits["test_zs"]
    loader = BatchLoader(ds, batch_size=1, max_nodes=24, max_edges=64,
                         with_images=False, shuffle=False)
    train_counts = splits["train"].triplet_counts
    zs = set(ds.triplet_counts)
    for i, batch in enumerate(loader):
        if i >= n_images:
            break
        out = eval_step(trainer.variables, batch)
        n = int(np.asarray(batch.node_mask[0]).sum())
        entry = filter_dets(batch.boxes[0][:n], out["obj_scores"][0][:n],
                            out["obj_preds"][0][:n], out["pairs"][0],
                            out["rel_dists"][0], out["pair_mask"][0])
        ranked, _ = rank_predicted_rels(entry["pred_rel_inds"],
                                        entry["rel_scores"],
                                        entry["obj_scores"],
                                        multiple_preds=True)
        # GT graph
        fig = show_nx(ds.gt_classes[i], ds.relationships[i],
                      ds.ind_to_classes, ds.ind_to_predicates,
                      train_triplet_counts=train_counts,
                      zeroshot_triplets=zs,
                      name=os.path.join(out_dir, f"gt_{i}"))
        # top-10 predicted graph
        fig = show_nx(np.asarray(entry["pred_classes"]), ranked[:10],
                      ds.ind_to_classes, ds.ind_to_predicates,
                      train_triplet_counts=train_counts,
                      zeroshot_triplets=zs,
                      name=os.path.join(out_dir, f"pred_{i}"))
        import matplotlib.pyplot as plt
        plt.close("all")
        print(f"wrote {out_dir}/gt_{i}.png and {out_dir}/pred_{i}.png")


if __name__ == "__main__":
    main(*sys.argv[1:3])
