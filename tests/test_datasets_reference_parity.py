"""Differential tests: our dataset parsers vs the reference's own parsers.

The h5/JSON parsers are elsewhere tested against hand-built expectations;
here the oracle is the reference code itself — ``dataloaders/
visual_genome.py:516-659`` (``load_graphs`` + shot/graph-size/overlap
filters), ``dataloaders/gqa.py:28-205`` and ``dataloaders/vtranse.py:25-171``
are pure numpy+h5py and run directly on the same synthetic on-disk fixtures
our parser tests use. Asserts identical ``(split_mask, boxes, gt_classes,
relationships)`` and zero-/10-/100-shot membership.
"""

import json
import shutil

import numpy as np
import pytest

from sgg_tpu.data import gqa as our_gqa
from sgg_tpu.data import visual_genome as our_vg
from sgg_tpu.data import vtranse as our_vte
from sgg_tpu.data.datasets import triplet_strings

from reference_utils import load_reference
from test_datasets import _gqa_sg, _write_vg_h5


def _assert_same_graphs(ours, ref):
    mask_o, boxes_o, cls_o, rels_o = ours
    mask_r, boxes_r, cls_r, rels_r = ref
    np.testing.assert_array_equal(np.asarray(mask_o), np.asarray(mask_r))
    assert len(boxes_o) == len(boxes_r)
    for i in range(len(boxes_o)):
        np.testing.assert_array_equal(boxes_o[i], boxes_r[i],
                                      err_msg=f"boxes[{i}]")
        np.testing.assert_array_equal(cls_o[i], cls_r[i],
                                      err_msg=f"classes[{i}]")
        np.testing.assert_array_equal(np.asarray(rels_o[i]).reshape(-1, 3),
                                      np.asarray(rels_r[i]).reshape(-1, 3),
                                      err_msg=f"rels[{i}]")


# ---------------------------------------------------------------------------
# VG-SGG.h5


@pytest.fixture(scope="module")
def vg_h5(tmp_path_factory):
    path = tmp_path_factory.mktemp("vgref") / "VG-SGG.h5"
    _write_vg_h5(path, np.random.RandomState(11), n_images=30, n_classes=8,
                 n_preds=5)
    return str(path)


VG_CONFIGS = [
    dict(mode="train", num_val_im=3),
    dict(mode="val", num_val_im=3),
    dict(mode="test"),
    dict(mode="train", num_val_im=2, num_im=12),
    dict(mode="train", num_val_im=3, min_graph_size=3),
    dict(mode="train", num_val_im=3, max_graph_size=4),
    dict(mode="train", num_val_im=3, filter_non_overlap=True),
]


@pytest.mark.parametrize("kw", VG_CONFIGS,
                         ids=[str(sorted(c.items())) for c in VG_CONFIGS])
def test_vg_load_graphs_matches_reference(vg_h5, kw):
    load_reference()
    from dataloaders.visual_genome import load_graphs as ref_load

    _assert_same_graphs(our_vg.load_graphs(vg_h5, **kw),
                        ref_load(vg_h5, **kw))


def _train_counts(vg_h5):
    _, _, cls_tr, rels_tr = our_vg.load_graphs(vg_h5, "train", num_val_im=3)
    counts = {}
    for c, r in zip(cls_tr, rels_tr):
        for t in triplet_strings(c, r):
            counts[t] = counts.get(t, 0) + 1
    return counts


def test_vg_zero_shot_matches_reference(vg_h5):
    load_reference()
    from dataloaders.visual_genome import load_graphs as ref_load

    triplets = set(_train_counts(vg_h5))
    ours = our_vg.load_graphs(vg_h5, "test", training_triplets=triplets)
    ref = ref_load(vg_h5, "test", training_triplets=triplets)
    _assert_same_graphs(ours, ref)
    assert sum(len(r) for r in ours[3]) > 0, "vacuous zero-shot fixture"


@pytest.mark.parametrize("n_shots", [10, 100])
def test_vg_k_shot_matches_reference(vg_h5, n_shots):
    load_reference()
    from dataloaders.visual_genome import load_graphs as ref_load

    # counts straddling both k-shot bands ([1,10] and [11,100]) so each
    # filter keeps a nonempty, strict subset
    counts = {t: (5 if i % 2 == 0 else 50)
              for i, t in enumerate(sorted(_train_counts(vg_h5)))}
    ours = our_vg.load_graphs(vg_h5, "test", training_triplets=counts,
                              n_shots=n_shots)
    ref = ref_load(vg_h5, "test", training_triplets=counts, n_shots=n_shots)
    _assert_same_graphs(ours, ref)
    assert sum(len(r) for r in ours[3]) > 0, "vacuous k-shot fixture"


# ---------------------------------------------------------------------------
# GQA scene graphs


@pytest.fixture(scope="module")
def gqa_sgs():
    rng = np.random.RandomState(13)
    cls_names = ["cat", "dog", "tree", "car"]
    pred_names = ["on", "under", "to the left of", "to the right of"]
    sgs = {f"im{i:02d}": _gqa_sg(rng, cls_names, pred_names,
                                 n_obj=int(rng.randint(2, 6)))
           for i in range(20)}
    # an image with an invalid box (skipped object + dangling relation)
    sgs["im_bad"] = {"objects": {
        "a": {"name": "cat", "x": 0, "y": 0, "w": 10, "h": 10,
              "relations": [{"object": "b", "name": "on"},
                            {"object": "c", "name": "on"}]},
        "b": {"name": "dog", "x": 5, "y": 5, "w": 0, "h": 10,
              "relations": []},
        "c": {"name": "dog", "x": 1, "y": 1, "w": 5, "h": 5,
              "relations": []}}}
    return sgs


def test_gqa_load_info_matches_reference(gqa_sgs):
    load_reference()
    import dataloaders.gqa as ref_gqa

    ours = our_gqa.load_info(gqa_sgs, {})
    ref = ref_gqa.load_info(gqa_sgs, {})
    assert ours[0] == ref[0] and ours[1] == ref[1]
    assert ours[2] == ref[2] and ours[3] == ref[3]


GQA_CONFIGS = [
    dict(mode="train", num_val_im=4),
    dict(mode="val", num_val_im=4),
    dict(mode="train", num_val_im=4, min_graph_size=2),
    dict(mode="train", num_val_im=4, max_graph_size=3),
    dict(mode="train", num_val_im=4, exclude_left_right=True),
]


@pytest.mark.parametrize("kw", GQA_CONFIGS,
                         ids=[str(sorted(c.items())) for c in GQA_CONFIGS])
def test_gqa_load_graphs_matches_reference(gqa_sgs, kw):
    load_reference()
    import dataloaders.gqa as ref_gqa

    _, _, cls2ind, pred2ind = our_gqa.load_info(gqa_sgs, {})
    ids = sorted(gqa_sgs)
    _assert_same_graphs(
        our_gqa.load_graphs(gqa_sgs, ids, cls2ind, pred2ind, **kw),
        ref_gqa.load_graphs(gqa_sgs, ids, cls2ind, pred2ind, **kw))


def test_gqa_zero_shot_matches_reference(gqa_sgs):
    load_reference()
    import dataloaders.gqa as ref_gqa

    _, _, cls2ind, pred2ind = our_gqa.load_info(gqa_sgs, {})
    ids = sorted(gqa_sgs)
    _, _, cls_tr, rels_tr = our_gqa.load_graphs(gqa_sgs, ids, cls2ind,
                                                pred2ind, mode="train",
                                                num_val_im=4)
    triplets = {t for c, r in zip(cls_tr, rels_tr)
                for t in triplet_strings(c, r)}
    ours = our_gqa.load_graphs(gqa_sgs, ids, cls2ind, pred2ind, mode="val",
                               num_val_im=4, training_triplets=triplets)
    ref = ref_gqa.load_graphs(gqa_sgs, ids, cls2ind, pred2ind, mode="val",
                              num_val_im=4, training_triplets=triplets)
    _assert_same_graphs(ours, ref)


# ---------------------------------------------------------------------------
# VTE (vg1_2_meta.h5)


def _write_vte_h5(path):
    """Same schema as tests/test_datasets.py::vte_h5 (module-scope copy)."""
    import h5py

    rng = np.random.RandomState(3)
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
        # h5py returns keys ALPHABETICALLY; the reference swaps positions
        # 0/1 and then asserts bg landed at 0 (vtranse.py:62-64), so the
        # real file's first sorted class precedes '__background__' — mirror
        # that ('A' < '_' in ASCII).
        for j, c in enumerate(["Acls_a", "__background__", "cls_b", "cls_c",
                               "cls_d", "cls_e"]):
            f[f"meta/cls/name2idx/{c}"] = j


@pytest.mark.parametrize("mode,num_val_im", [("train", 3), ("val", 3),
                                             ("test", 0)])
def test_vte_matches_reference(tmp_path, mode, num_val_im):
    """Our VTE load_split vs the reference VTESplit on identical h5 copies
    (separate copies: both sides write a .pkl cache next to the h5)."""
    load_reference()
    from dataloaders.vtranse import VTESplit

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    ours_dir.mkdir(), ref_dir.mkdir()
    _write_vte_h5(ours_dir / "vg1_2_meta.h5")
    shutil.copy(ours_dir / "vg1_2_meta.h5", ref_dir / "vg1_2_meta.h5")

    ref_split = VTESplit(str(ref_dir / "vg1_2_meta.h5"), mode=mode)
    mask_r, boxes_r, cls_r, rels_r = ref_split.load_graphs(
        num_val_im=num_val_im)
    cls_list_r, pre_list_r = ref_split.load_info()

    ds = our_vte.load_split(str(ours_dir / "vg1_2_meta.h5"), str(ours_dir),
                            mode, num_val_im=num_val_im)
    assert ds.ind_to_classes == cls_list_r
    assert ds.ind_to_predicates == pre_list_r
    assert len(ds) == len(boxes_r)
    for i in range(len(ds)):
        np.testing.assert_allclose(ds.gt_boxes[i], boxes_r[i], rtol=1e-6,
                                   err_msg=f"boxes[{i}]")
        np.testing.assert_array_equal(ds.gt_classes[i], cls_r[i],
                                      err_msg=f"classes[{i}]")
        np.testing.assert_array_equal(ds.relationships[i], rels_r[i],
                                      err_msg=f"rels[{i}]")


def test_vte_zero_shot_matches_reference(tmp_path):
    load_reference()
    from dataloaders.vtranse import VTESplit

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    ours_dir.mkdir(), ref_dir.mkdir()
    _write_vte_h5(ours_dir / "vg1_2_meta.h5")
    shutil.copy(ours_dir / "vg1_2_meta.h5", ref_dir / "vg1_2_meta.h5")

    train = our_vte.load_split(str(ours_dir / "vg1_2_meta.h5"),
                               str(ours_dir), "train", num_val_im=3)
    triplets = set(train.triplet_counts)

    ref_split = VTESplit(str(ref_dir / "vg1_2_meta.h5"), mode="test")
    mask_r, boxes_r, cls_r, rels_r = ref_split.load_graphs(
        training_triplets=triplets)
    ds = our_vte.load_split(str(ours_dir / "vg1_2_meta.h5"), str(ours_dir),
                            "test", training_triplets=triplets)
    assert len(ds) == len(boxes_r)
    for i in range(len(ds)):
        np.testing.assert_array_equal(ds.relationships[i], rels_r[i],
                                      err_msg=f"rels[{i}]")
        np.testing.assert_array_equal(ds.gt_classes[i], cls_r[i])
