"""GAN compositional-augmentation models (ICCV 2021 stack)."""

from sgg_tpu.models.gan.crn import RefinementNetwork  # noqa: F401
from sgg_tpu.models.gan.discriminators import (  # noqa: F401
    CondPatchDiscriminator, GlobalDiscriminator, avg_pool_ceil,
    conditioned_features,
)
from sgg_tpu.models.gan.gan import (  # noqa: F401
    GANModel, Generator, add_dummy_nodes,
)
from sgg_tpu.models.gan.graphconv import (  # noqa: F401
    GraphTripleConv, GraphTripleConvNet, MaskedBatchNorm,
)
from sgg_tpu.models.gan.layout import boxes_to_layout, masks_to_layout  # noqa: F401
