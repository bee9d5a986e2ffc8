"""Single-process exercises of the multi-host helpers."""

import jax
import numpy as np

from sgg_tpu.parallel import (global_batch, host_mean, initialize,
                              make_mesh, process_local_indices)
from sgg_tpu.data import SyntheticSGGDataset


def test_initialize_single_process_noop():
    initialize(num_processes=1)  # must not raise


def test_process_local_indices_single_host():
    idx = process_local_indices(100, batch_size=8)
    np.testing.assert_array_equal(idx, np.arange(8))


def test_global_batch_single_process_sharded():
    ds = SyntheticSGGDataset(num_images=8, max_objects=5, seed=0)
    gb = ds.batch(list(range(8)), max_nodes=8, max_edges=8)
    mesh = make_mesh()
    out = global_batch(gb, mesh)
    assert out.boxes.shape == gb.boxes.shape
    # sharded over the data axis across the 8 virtual devices
    assert len(out.boxes.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(out.classes),
                                  np.asarray(gb.classes))


def test_host_mean_single():
    assert host_mean(3.5) == 3.5
