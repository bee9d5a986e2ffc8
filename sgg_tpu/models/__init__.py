"""Model zoo: backbones, relation heads, frequency bias, GAN components."""

from sgg_tpu.models.backbone import RoiHead, VGG16Trunk  # noqa: F401
from sgg_tpu.models.frequency_bias import (  # noqa: F401
    FrequencyBias, count_matrices, log_predicate_distribution,
    overlapping_pairs,
)
from sgg_tpu.models.relhead import IMPHead, RelModelIMP  # noqa: F401
from sgg_tpu.models.union_features import UnionBoxFeats  # noqa: F401
