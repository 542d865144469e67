"""Models: U-Net segmentation (flax)."""

from .unet import UNet, ConvBlock

__all__ = ["UNet", "ConvBlock"]
