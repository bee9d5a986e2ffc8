"""Edge-axis sharding (the CP analogue, SURVEY.md §2.11): the train step
compiles and matches the single-device result when edge arrays are sharded
over a 2-D (data x edge) mesh."""

import jax
import numpy as np

from sgg_tpu.parallel import make_mesh_2d, replicate, shard_batch_edges
from test_train_e2e import _setup
import pytest

pytestmark = pytest.mark.slow


def test_edge_sharded_train_step_matches():
    assert len(jax.devices()) == 8
    config, ds, model, gb, state = _setup(batch_size=2, n=8, e=16)
    from sgg_tpu.train.step import make_train_step
    step = make_train_step(model, config)

    # single-device baseline
    _, _, _, _, state_ref = _setup(batch_size=2, n=8, e=16)
    _, metrics_ref = step(state_ref, gb, jax.random.key(0))

    mesh = make_mesh_2d(2, 4)
    state_sh = replicate(state, mesh)
    batch_sh = shard_batch_edges(gb, mesh)
    _, metrics_sh = step(state_sh, batch_sh, jax.random.key(0))

    np.testing.assert_allclose(float(metrics_sh["total"]),
                               float(metrics_ref["total"]), rtol=2e-4)
