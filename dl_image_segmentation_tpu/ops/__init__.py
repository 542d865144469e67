"""Device kernels: rasterization, compositing, augmentation."""

from .rasterize import rasterize, pack_features
from .compositing import (masked_median, masked_median_composite,
                          masked_median_pallas,
                          nearest_valid_mosaic, pad_stack)
from .augment import (augment_pairs, normalize,
                      random_invert_pairs, random_rotate_pairs)

__all__ = [
    "rasterize", "pack_features",
    "masked_median", "masked_median_composite", "masked_median_pallas",
    "nearest_valid_mosaic",
    "pad_stack",
    "augment_pairs", "normalize", "random_invert_pairs",
    "random_rotate_pairs",
]
