"""Compositional augmentation: perturbations, feature bank, GAN eval."""

from sgg_tpu.augment.feature_bank import FeatureBank, FeatureBankWriter  # noqa: F401
from sgg_tpu.augment.perturb import SceneGraphPerturb, pairwise_similarity  # noqa: F401
