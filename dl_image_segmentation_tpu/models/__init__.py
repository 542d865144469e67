"""Models: U-Net (flagship), DeepLab-lite, SegFormer-lite (flax)."""

from .unet import UNet, ConvBlock
from .deeplab import DeepLabLite, ASPP
from .segformer import SegFormerLite

__all__ = ["UNet", "ConvBlock", "DeepLabLite", "ASPP", "SegFormerLite"]
