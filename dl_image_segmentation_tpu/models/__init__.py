"""Models: U-Net (flagship) and DeepLab-lite segmentation (flax)."""

from .unet import UNet, ConvBlock
from .deeplab import DeepLabLite, ASPP

__all__ = ["UNet", "ConvBlock", "DeepLabLite", "ASPP"]
