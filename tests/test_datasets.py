"""Dataset parser tests over synthetic on-disk fixtures (no 60GB downloads)."""

import json
import os

import h5py
import numpy as np
import pytest

from sgg_tpu.constants import BOX_SCALE
from sgg_tpu.data import visual_genome as vg
from sgg_tpu.data import gqa
from sgg_tpu.data import vtranse
from sgg_tpu.data.datasets import (build_eval_splits, filter_duplicate_rels,
                                   shot_filter)


# ---------------------------------------------------------------------------
# fixtures

def _write_vg_h5(path, rng, n_images=20, n_classes=8, n_preds=5):
    """Synthetic VG-SGG.h5 with the reference's exact schema."""
    boxes, labels, rels_flat, preds_flat = [], [], [], []
    first_box, last_box, first_rel, last_rel, split = [], [], [], [], []
    for i in range(n_images):
        n = rng.randint(2, 7)
        fb = len(labels)
        for _ in range(n):
            cx, cy = rng.randint(100, 900, 2)
            w, h = rng.randint(20, 200, 2)
            boxes.append([cx, cy, w, h])  # center format at BOX_SCALE
            labels.append(rng.randint(1, n_classes))
        fr = len(preds_flat)
        n_rel = rng.randint(1, 4)
        for _ in range(n_rel):
            s, o = rng.choice(n, 2, replace=False)
            rels_flat.append([fb + s, fb + o])  # absolute box indices
            preds_flat.append(rng.randint(1, n_preds))
        first_box.append(fb)
        last_box.append(len(labels) - 1)
        first_rel.append(fr)
        last_rel.append(len(preds_flat) - 1)
        split.append(0 if i < n_images * 3 // 4 else 2)
    with h5py.File(path, "w") as f:
        f["split"] = np.asarray(split)
        f["img_to_first_box"] = np.asarray(first_box)
        f["img_to_last_box"] = np.asarray(last_box)
        f["img_to_first_rel"] = np.asarray(first_rel)
        f["img_to_last_rel"] = np.asarray(last_rel)
        f["labels"] = np.asarray(labels)[:, None]
        f[f"boxes_{BOX_SCALE}"] = np.asarray(boxes)
        f["relationships"] = np.asarray(rels_flat)
        f["predicates"] = np.asarray(preds_flat)[:, None]
    return n_images


@pytest.fixture
def vg_dir(tmp_path):
    rng = np.random.RandomState(0)
    base = tmp_path / "VG" / "stanford_filtered"
    base.mkdir(parents=True)
    (tmp_path / "VG" / "VG_100K").mkdir()
    n = _write_vg_h5(base / "VG-SGG.h5", rng)
    dicts = {"label_to_idx": {f"c{i}": i for i in range(1, 8)},
             "predicate_to_idx": {f"p{i}": i for i in range(1, 5)}}
    (base / "VG-SGG-dicts.json").write_text(json.dumps(dicts))
    image_data = [{"image_id": i} for i in range(n)]
    (base / "image_data.json").write_text(json.dumps(image_data))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# VG h5 parser

def test_vg_load_graphs_contract(vg_dir):
    h5path = os.path.join(vg_dir, "VG", "stanford_filtered", "VG-SGG.h5")
    mask, boxes, classes, rels = vg.load_graphs(h5path, "train",
                                                num_val_im=3)
    assert mask.sum() == len(boxes) == len(classes) == len(rels)
    for b, c, r in zip(boxes, classes, rels):
        assert b.shape[1] == 4 and (b[:, 2:] >= b[:, :2]).all()
        assert len(b) == len(c)
        assert r.shape[1] == 3
        assert r[:, :2].max() < len(b)
        assert (r[:, 2] >= 1).all()
    # val/train partition is disjoint and covers the train-split images
    mask_v, bv, _, _ = vg.load_graphs(h5path, "val", num_val_im=3)
    assert not (mask & mask_v).any()
    assert mask_v.sum() == 3
    mask_t, _, _, _ = vg.load_graphs(h5path, "test")
    assert not (mask_t & (mask | mask_v)).any()


def test_vg_full_splits_and_zero_shot(vg_dir):
    s = vg.splits(vg_dir, check_sizes=False, num_val_im=3,
                  filter_non_overlap=False)
    assert set(s) == {"train", "val_zs", "val_alls", "test_zs", "test_10s",
                      "test_100s", "test_alls"}
    train_triplets = set(s["train"].triplet_counts)
    # zero-shot val split contains no training triplet
    for classes, rels in zip(s["val_zs"].gt_classes,
                             s["val_zs"].relationships):
        for sub, ob, p in rels:
            key = f"{classes[sub]}_{p}_{classes[ob]}"
            assert key not in train_triplets
        assert len(rels) > 0  # empty-rel images are dropped
    # test_zs excludes train+val triplets
    tv = train_triplets | set(s["val_alls"].triplet_counts)
    for classes, rels in zip(s["test_zs"].gt_classes,
                             s["test_zs"].relationships):
        for sub, ob, p in rels:
            assert f"{classes[sub]}_{p}_{classes[ob]}" not in tv


def test_shot_filter_count_ranges():
    classes = np.asarray([1, 2, 3])
    rels = np.asarray([[0, 1, 1], [1, 2, 2], [0, 2, 3]])
    counts = {"1_1_2": 5, "2_2_3": 50, "1_3_3": 500}
    np.testing.assert_array_equal(
        shot_filter(rels, classes, counts, n_shots=10), [0])
    np.testing.assert_array_equal(
        shot_filter(rels, classes, counts, n_shots=100), [1])
    # zero-shot via set
    np.testing.assert_array_equal(
        shot_filter(rels, classes, {"1_1_2", "2_2_3"}), [2])


def test_filter_duplicate_rels():
    rng = np.random.RandomState(0)
    rels = np.asarray([[0, 1, 2], [0, 1, 3], [1, 2, 4]])
    out = filter_duplicate_rels(rels, rng)
    assert len(out) == 2
    pairs = {tuple(r[:2]) for r in out}
    assert pairs == {(0, 1), (1, 2)}
    pred01 = out[[tuple(r[:2]) == (0, 1) for r in out]][0, 2]
    assert pred01 in (2, 3)


def test_triplet_counts_and_cooccurrence(vg_dir):
    s = vg.splits(vg_dir, check_sizes=False, num_val_im=3,
                  filter_non_overlap=False)
    train = s["train"]
    total = sum(len(r) for r in train.relationships)
    assert sum(train.triplet_counts.values()) == total
    assert train.subj_pred_pairs and train.pred_obj_pairs
    # co-occurrence dicts store triplet counts
    for key, objs in train.subj_pred_pairs.items():
        sc, p = key.split("_")
        for oc, c in objs.items():
            assert train.triplet_counts[f"{sc}_{p}_{oc}"] == c


# ---------------------------------------------------------------------------
# GQA parser

def _gqa_sg(rng, n_cls_names, n_pred_names, n_obj=4):
    objs = {}
    oids = [f"o{i}" for i in range(n_obj)]
    for i, oid in enumerate(oids):
        rels = []
        if i + 1 < n_obj:
            rels.append({"object": oids[i + 1],
                         "name": rng.choice(n_pred_names)})
        objs[oid] = {"name": rng.choice(n_cls_names),
                     "x": int(rng.randint(0, 50)),
                     "y": int(rng.randint(0, 50)),
                     "w": int(rng.randint(5, 50)),
                     "h": int(rng.randint(5, 50)),
                     "relations": rels}
    return {"objects": objs}


def test_gqa_parse_scene_graph():
    rng = np.random.RandomState(1)
    cls_names = ["cat", "dog", "tree"]
    pred_names = ["on", "under", "to the left of"]
    sgs = {f"im{i}": _gqa_sg(rng, cls_names, pred_names) for i in range(6)}
    vocab = gqa.load_info(sgs, {})
    ind_cls, ind_pred, cls2ind, pred2ind = vocab
    assert ind_cls[0] == "__background__" and ind_pred[0] == "__background__"
    mask, boxes, classes, rels = gqa.load_graphs(
        sgs, sorted(sgs), cls2ind, pred2ind, mode="train")
    assert mask.sum() == len(boxes)
    for b, c, r in zip(boxes, classes, rels):
        assert (b[:, 2:] > b[:, :2]).all()
        assert r[:, :2].max() < len(b)
        assert (r[:, 2] >= 1).all()


def test_gqa_exclude_left_right():
    rng = np.random.RandomState(2)
    cls_names = ["cat", "dog"]
    pred_names = ["to the left of", "to the right of", "on"]
    sgs = {f"im{i}": _gqa_sg(rng, cls_names, pred_names, n_obj=5)
           for i in range(8)}
    vocab = gqa.load_info(sgs, {})
    _, ind_pred, cls2ind, pred2ind = vocab
    mask, _, _, rels = gqa.load_graphs(sgs, sorted(sgs), cls2ind, pred2ind,
                                       mode="train",
                                       exclude_left_right=True)
    banned = {pred2ind["to the left of"], pred2ind["to the right of"]}
    for r in rels:
        assert not set(r[:, 2]) & banned


def test_gqa_skips_invalid_boxes():
    sg = {"objects": {
        "a": {"name": "cat", "x": 0, "y": 0, "w": 10, "h": 10,
              "relations": [{"object": "b", "name": "on"},
                            {"object": "c", "name": "on"}]},
        "b": {"name": "dog", "x": 5, "y": 5, "w": 0, "h": 10,  # invalid
              "relations": []},
        "c": {"name": "dog", "x": 1, "y": 1, "w": 5, "h": 5,
              "relations": []},
    }}
    out = gqa.parse_scene_graph(sg, {"cat": 1, "dog": 2}, {"on": 1})
    boxes, classes, rels = out
    assert len(boxes) == 2  # 'b' skipped
    assert len(rels) == 1   # rel to 'b' dropped, rel to 'c' kept


# ---------------------------------------------------------------------------
# VTE parser

@pytest.fixture
def vte_h5(tmp_path):
    rng = np.random.RandomState(3)
    path = tmp_path / "vg1_2_meta.h5"
    with h5py.File(path, "w") as f:
        for file_mode, n_img in (("train", 12), ("test", 6)):
            for i in range(n_img):
                g = f.create_group(f"gt/{file_mode}/{1000 + i}")
                n_rel = rng.randint(1, 4)
                subs = rng.randint(0, 200, (n_rel, 4)).astype(float)
                subs[:, 2:] = subs[:, :2] + 10
                objs = rng.randint(0, 200, (n_rel, 4)).astype(float)
                objs[:, 2:] = objs[:, :2] + 10
                rlp = np.stack([rng.randint(2, 6, n_rel),
                                rng.randint(0, 3, n_rel),
                                rng.randint(2, 6, n_rel)], 1)
                g["sub_boxes"] = subs
                g["obj_boxes"] = objs
                g["rlp_labels"] = rlp
        f.create_group("meta/pre/name2idx").attrs["_"] = 0
        for p in ("on", "in", "near"):
            f[f"meta/pre/name2idx/{p}"] = 0
        for j, c in enumerate(["cls_a", "__background__", "cls_b", "cls_c",
                               "cls_d", "cls_e"]):
            f[f"meta/cls/name2idx/{c}"] = j
    return str(path)


def test_vte_parse_and_split(vte_h5, tmp_path):
    images_dir = str(tmp_path)
    ds = vtranse.load_split(vte_h5, images_dir, "train", num_val_im=3)
    assert ds.ind_to_classes[0] == "__background__"
    assert ds.ind_to_predicates[0] == "__background__"
    for b, c, r in zip(ds.gt_boxes, ds.gt_classes, ds.relationships):
        assert len(b) == len(c) and len(b) >= 2
        # deduped nodes: unique boxes
        assert len(np.unique(b, axis=0)) == len(b)
        assert r[:, :2].max() < len(b)
        assert (r[:, 2] >= 1).all()  # predicates shifted +1 past background
    val = vtranse.load_split(vte_h5, images_dir, "val", num_val_im=3)
    assert len(val) <= 3
    test = vtranse.load_split(vte_h5, images_dir, "test")
    assert len(test) > 0


def test_build_eval_splits_generic():
    """Split builder on a fake loader: k-shot filters behave per spec."""
    rng = np.random.RandomState(5)

    def loader(mode, training_triplets=None, n_shots=-1):
        seed = {"train": 0, "val": 1, "test": 2}[mode]
        r = np.random.RandomState(seed)
        boxes, classes, rels = [], [], []
        for _ in range(12):
            n = r.randint(2, 5)
            b = r.rand(n, 4).astype(np.float32) * 50
            b[:, 2:] += b[:, :2] + 1
            c = r.randint(1, 6, n)
            rel = np.asarray([[0, 1, r.randint(1, 4)]], np.int32)
            keep = shot_filter(rel, c, training_triplets, n_shots)
            rel = rel[keep]
            if len(rel) == 0:
                continue
            boxes.append(b)
            classes.append(c)
            rels.append(rel)
        from sgg_tpu.data.datasets import SGGDataset
        return SGGDataset(name="fake", mode=mode, filenames=[],
                          images_dir="", gt_boxes=boxes, gt_classes=classes,
                          relationships=rels,
                          ind_to_classes=["bg"] + [f"c{i}" for i in range(5)],
                          ind_to_predicates=["bg", "p1", "p2", "p3"])

    splits = build_eval_splits(loader)
    train_keys = set(splits["train"].triplet_counts)
    for ck in splits["val_zs"].triplet_counts:
        assert ck not in train_keys


def test_gqa_full_splits(tmp_path):
    """gqa.splits end to end over a synthetic GQA directory."""
    rng = np.random.RandomState(9)
    base = tmp_path / "GQA" / "sceneGraphs"
    base.mkdir(parents=True)
    cls_names = ["cat", "dog", "tree", "car"]
    pred_names = ["on", "under", "near"]
    train_sgs = {f"t{i}": _gqa_sg(rng, cls_names, pred_names, n_obj=4)
                 for i in range(16)}
    val_sgs = {f"v{i}": _gqa_sg(rng, cls_names, pred_names, n_obj=4)
               for i in range(6)}
    (base / "train_sceneGraphs.json").write_text(json.dumps(train_sgs))
    (base / "val_sceneGraphs.json").write_text(json.dumps(val_sgs))
    for mode, sgs in (("train", train_sgs), ("val", val_sgs)):
        qs = {f"q{i}": {"imageId": imid}
              for i, imid in enumerate(sgs.keys())}
        (tmp_path / "GQA" / f"{mode}_balanced_questions.json").write_text(
            json.dumps(qs))

    splits = gqa.splits(str(tmp_path), num_val_im=4)
    assert set(splits) == {"train", "val_zs", "val_alls", "test_zs",
                           "test_alls"}
    assert len(splits["train"]) > 0 and len(splits["test_alls"]) > 0
    # image-id cache file was produced (visual_genome.py:110-130 behavior)
    assert (tmp_path / "GQA" / "train_images.json").exists()
    # zero-shot val excludes training triplets
    tt = set(splits["train"].triplet_counts)
    for k in splits["val_zs"].triplet_counts:
        assert k not in tt


def test_vte_full_splits(vte_h5, tmp_path):
    import os
    d = os.path.dirname(vte_h5)
    # arrange the expected layout {data}/VG/vtranse/vg1_2_meta.h5
    base = tmp_path / "data" / "VG" / "vtranse"
    base.mkdir(parents=True)
    os.rename(vte_h5, base / "vg1_2_meta.h5")
    (tmp_path / "data" / "VG" / "VG_100K").mkdir()
    splits = vtranse.splits(str(tmp_path / "data"), num_val_im=3)
    assert set(splits) == {"train", "val_zs", "val_alls", "test_zs",
                           "test_alls"}
    assert len(splits["train"]) > 0
    tt = set(splits["train"].triplet_counts)
    for k in splits["val_zs"].triplet_counts:
        assert k not in tt


def test_synthetic_splits_contract():
    """-split synthetic: reference-shaped splits through the real
    build_eval_splits machinery (zero-shot sets disjoint from train)."""
    from sgg_tpu.data.synthetic import synthetic_splits

    splits = synthetic_splits(num_train=24, num_eval=10, num_classes=20,
                              num_predicates=8, max_objects=6, seed=0)
    for k in ("train", "val_alls", "val_zs", "test_alls", "test_zs",
              "test_10s", "test_100s"):
        assert k in splits, k
    train_trips = set(splits["train"].triplet_counts)
    assert len(splits["train"]) == 24
    # zero-shot: no val_zs triplet appears in train
    assert not (set(splits["val_zs"].triplet_counts) & train_trips)
    tv = train_trips | set(splits["val_alls"].triplet_counts)
    assert not (set(splits["test_zs"].triplet_counts) & tv)
    # 10-shot: every kept triplet has train+val count in [1, 10]
    counts = dict(splits["train"].triplet_counts)
    for k2, v in splits["val_alls"].triplet_counts.items():
        counts[k2] = counts.get(k2, 0) + v
    for t in splits["test_10s"].triplet_counts:
        assert 1 <= counts.get(t, 0) <= 10, t
    # every split loads through BatchLoader (blank canvases, native boxes)
    from sgg_tpu.data.pipeline import BatchLoader
    gb = next(iter(BatchLoader(splits["val_alls"], batch_size=2, max_nodes=8,
                               max_edges=12, with_images=False,
                               shuffle=False)))
    assert gb.boxes.shape[0] == 2
