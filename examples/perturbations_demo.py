"""Scene-graph perturbation demo (reference
``Scene_Graph_Perturbations_VG.ipynb``, stripped from the public mount).

Shows before/after triplets for the three perturbation strategies:

    python examples/perturbations_demo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import numpy as np

    from sgg_tpu.augment.perturb import SceneGraphPerturb
    from sgg_tpu.data import SyntheticSGGDataset
    from sgg_tpu.data.datasets import SGGDataset
    from sgg_tpu.data.word_vectors import normalized_class_embeddings

    syn = SyntheticSGGDataset(num_images=12, num_classes=20,
                              num_predicates=8, max_objects=6, seed=0)
    ds = SGGDataset(name="stanford", mode="train", filenames=[],
                    images_dir="", gt_boxes=syn.gt_boxes,
                    gt_classes=syn.gt_classes,
                    relationships=syn.relationships,
                    ind_to_classes=syn.ind_to_classes,
                    ind_to_predicates=syn.ind_to_predicates)
    emb = normalized_class_embeddings(ds.ind_to_classes)

    img = 0
    classes = ds.gt_classes[img][None].copy()
    rels = ds.relationships[img][None]
    nm = np.ones_like(classes, bool)
    rm = np.ones((1, rels.shape[1]), bool)

    def show(title, new_classes):
        print(f"\n=== {title} ===")
        for s, o, p in rels[0]:
            before = (ds.ind_to_classes[classes[0][s]],
                      ds.ind_to_predicates[p],
                      ds.ind_to_classes[classes[0][o]])
            after = (ds.ind_to_classes[new_classes[0][s]],
                     ds.ind_to_predicates[p],
                     ds.ind_to_classes[new_classes[0][o]])
            marker = "  ->  " + "_".join(after) if after != before else ""
            print("_".join(before) + marker)

    for method in ("rand", "neigh", "graphn"):
        sgp = SceneGraphPerturb(method, emb, ds.subj_pred_pairs,
                                ds.pred_obj_pairs, L=0.5, topk=5, alpha=1,
                                seed=42)
        new = sgp.perturb_batch(classes.copy(), rels, nm, rm)
        show(method, new)


if __name__ == "__main__":
    main()
