"""bf16-vs-f32 numerical health of the flagship forward (TPU compute dtype).

Guards against precision regressions: the bf16 model (the TPU default) must
stay close to its f32 twin on identical weights, and produce finite
logits with sane magnitudes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgg_tpu.data import SyntheticSGGDataset
from sgg_tpu.models import RelModelIMP
from sgg_tpu.train.assign import sample_edges

pytestmark = pytest.mark.slow


def test_bf16_forward_tracks_f32():
    kw = dict(num_classes=9, num_predicates=5, mode="sgcls", hidden_dim=16,
              obj_dim=32)
    m32 = RelModelIMP(dtype=jnp.float32, **kw)
    m16 = RelModelIMP(dtype=jnp.bfloat16, **kw)
    ds = SyntheticSGGDataset(num_images=2, num_classes=9, num_predicates=5,
                             max_objects=5, image_size=64, with_images=True,
                             seed=0)
    gb = ds.batch([0, 1], max_nodes=8, max_edges=12)
    s, pm = sample_edges(jax.random.key(0), gb.rels, gb.rel_mask,
                         gb.node_mask, max_out=12)
    args = (gb.images, gb.boxes, gb.classes, s[..., :2], pm)
    variables = m32.init(jax.random.key(0), *args, train=False)

    out32 = m32.apply(variables, *args, train=False)
    out16 = m16.apply(variables, *args, train=False)  # same f32 params

    for k in ("obj_logits", "rel_logits"):
        a = np.asarray(out32[k], np.float32)
        b = np.asarray(out16[k], np.float32)
        assert np.isfinite(b).all(), k
        # logits stay close in absolute terms and correlate strongly
        assert np.abs(a - b).max() < 0.15 * max(1.0, np.abs(a).max()), k
        corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert corr > 0.995, (k, corr)
        # the argmax predictions barely move
        agree = (a.argmax(-1) == b.argmax(-1)).mean()
        assert agree > 0.9, (k, agree)
