import numpy as np

from sgg_tpu.data import GraphBatch, SyntheticSGGDataset, pack_ragged


def test_pack_ragged_basic():
    boxes = [np.asarray([[0, 0, 10, 10], [5, 5, 20, 20]], np.float32),
             np.asarray([[1, 1, 2, 2]], np.float32)]
    classes = [np.asarray([3, 7], np.int32), np.asarray([9], np.int32)]
    rels = [np.asarray([[0, 1, 4]], np.int32),
            np.zeros((0, 3), np.int32)]
    gb = pack_ragged(boxes, classes, rels, max_nodes=4, max_edges=3)
    assert gb.boxes.shape == (2, 4, 4)
    assert gb.rels.shape == (2, 3, 3)
    np.testing.assert_array_equal(np.asarray(gb.node_mask),
                                  [[1, 1, 0, 0], [1, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(gb.rel_mask),
                                  [[1, 0, 0], [0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(gb.rels[0, 0]), [0, 1, 4])
    np.testing.assert_array_equal(np.asarray(gb.classes[0]), [3, 7, 0, 0])
    assert np.asarray(gb.num_nodes()).tolist() == [2, 1]
    assert np.asarray(gb.num_edges()).tolist() == [1, 0]


def test_pack_truncates_and_drops():
    # 5 nodes into max_nodes=3: rels referencing truncated nodes are dropped.
    boxes = [np.arange(20, dtype=np.float32).reshape(5, 4)]
    classes = [np.arange(5, dtype=np.int32) + 1]
    rels = [np.asarray([[0, 1, 2], [0, 4, 3], [2, 1, 5]], np.int32)]
    gb = pack_ragged(boxes, classes, rels, max_nodes=3, max_edges=2)
    assert np.asarray(gb.num_nodes()).tolist() == [3]
    kept = np.asarray(gb.rels[0])[np.asarray(gb.rel_mask[0])]
    # rel (0,4) dropped: node 4 truncated
    assert [r.tolist() for r in kept] == [[0, 1, 2], [2, 1, 5]]


def test_synthetic_dataset_contract():
    ds = SyntheticSGGDataset(num_images=10, seed=1)
    assert len(ds) == 10
    assert len(ds.ind_to_classes) == 151
    assert len(ds.ind_to_predicates) == 51
    for i in range(10):
        boxes, classes, rels = ds.gt_boxes[i], ds.gt_classes[i], ds.relationships[i]
        assert boxes.shape[0] == classes.shape[0]
        assert (boxes[:, 2:] >= boxes[:, :2]).all()
        assert (classes >= 1).all() and (classes < 151).all()
        if len(rels):
            assert rels[:, :2].max() < len(boxes)
            assert (rels[:, 2] >= 1).all()
            # ordered pairs are unique and non-diagonal
            assert (rels[:, 0] != rels[:, 1]).all()
            pairs = set(map(tuple, rels[:, :2]))
            assert len(pairs) == len(rels)


def test_synthetic_batching_deterministic():
    ds = SyntheticSGGDataset(num_images=8, seed=3)
    b1 = ds.batch([0, 1, 2], max_nodes=32, max_edges=64)
    b2 = ds.batch([0, 1, 2], max_nodes=32, max_edges=64)
    np.testing.assert_array_equal(np.asarray(b1.boxes), np.asarray(b2.boxes))
    batches = list(ds.batches(batch_size=3, max_nodes=32, max_edges=64))
    assert len(batches) == 2  # drop_last
    assert isinstance(batches[0], GraphBatch)


def test_synthetic_images():
    ds = SyntheticSGGDataset(num_images=2, image_size=64, with_images=True)
    gb = ds.batch([0, 1], max_nodes=8, max_edges=8)
    assert gb.images.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(np.asarray(gb.im_hw), [[64, 64], [64, 64]])
