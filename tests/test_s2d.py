"""Space-to-depth U-Net variant (models/unet.py s2d>1).

The TPU motivation is measured lane padding: XLA pads conv channels to
the MXU's 128 lanes, so the judge shape's 256^2 C=32 convs move ~9x
their ideal HBM bytes (probe recorded in TPU_EVIDENCE.json). s2d=2
folds 2x2 pixel blocks into channels so every conv runs at half the
spatial size, and a sub-pixel head restores full-resolution logits --
the input/output contract is unchanged while step bytes drop ~40%.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_image_segmentation_tpu.models.unet import (UNet, depth_to_space,
                                                   space_to_depth)
from dl_image_segmentation_tpu.train.trainer import TrainConfig, Trainer


def test_space_to_depth_round_trip_and_block_order():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    s = space_to_depth(x, 2)
    assert s.shape == (2, 4, 4, 12)
    # channel layout is (row-in-block, col-in-block, source-channel)
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0, 0:3]),
                                  np.asarray(x[0, 0, 0, :]))
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0, 3:6]),
                                  np.asarray(x[0, 0, 1, :]))
    np.testing.assert_array_equal(np.asarray(s[0, 0, 0, 6:9]),
                                  np.asarray(x[0, 1, 0, :]))
    np.testing.assert_array_equal(np.asarray(depth_to_space(s, 2)),
                                  np.asarray(x))
    s4 = space_to_depth(x, 4)
    assert s4.shape == (2, 2, 2, 48)
    np.testing.assert_array_equal(np.asarray(depth_to_space(s4, 4)),
                                  np.asarray(x))


def test_s2d_unet_keeps_io_contract():
    m = UNet(num_classes=3, base_features=8, levels=2, s2d=2)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 5)))["params"]
    out = m.apply({"params": p}, jnp.zeros((2, 64, 64, 5)))
    assert out.shape == (2, 64, 64, 3)
    assert out.dtype == jnp.float32


def test_s2d_learns_the_separable_task():
    # rule of thumb baked into the test: the s2d trunk must be wider
    # than the folded input (2x2x3=12 channels), so width 16, not 8 --
    # and the sub-pixel head makes the per-pixel task an easier fit
    # for a slightly higher lr
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=16,
                      levels=2, image_size=64, batch_size=8, s2d=2,
                      seed=1, learning_rate=3e-3)
    tr = Trainer(cfg)
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
    metrics = {}
    losses = []
    for _ in range(120):
        metrics = tr.train_step(imgs, lbls)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.5 * losses[0], losses[::20]
    assert float(metrics["accuracy"]) > 0.8, metrics


def test_s2d_checkpoint_round_trip(tmp_path):
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                      levels=2, image_size=64, batch_size=8, s2d=2)
    tr = Trainer(cfg)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    lbls = (imgs[:, :, :, 0] > 100).astype(np.uint8)
    tr.train_step(imgs, lbls)
    tr.save_checkpoint(str(tmp_path / "ck"))
    tr2 = Trainer(cfg)
    tr2.restore_checkpoint(str(tmp_path / "ck"))
    a = np.asarray(tr.predict(imgs))
    b = np.asarray(tr2.predict(imgs))
    np.testing.assert_array_equal(a, b)


def test_s2d_composes_with_int8_quant():
    cfg = TrainConfig(num_classes=2, in_channels=3, base_features=8,
                      levels=2, image_size=64, batch_size=8, s2d=2,
                      quantize="int8")
    tr = Trainer(cfg)
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    lbls = (imgs[:, :, :, 0] > 128).astype(np.uint8)
    for _ in range(40):
        tr.train_step(imgs, lbls)
    # quantized infer_model consumes the float tree directly
    preds = np.asarray(tr.predict(imgs))
    assert preds.shape == (8, 64, 64)
    cfg_f = TrainConfig(**{**cfg.__dict__, "quantize": "none"})
    tr_f = Trainer(cfg_f)
    tr_f.state = tr.state
    agree = (np.asarray(tr_f.predict(imgs)) == preds).mean()
    assert agree > 0.9, agree


def test_s2d_rejects_bad_configs():
    with pytest.raises(ValueError, match="unet"):
        Trainer(TrainConfig(model="deeplab", s2d=2, image_size=64,
                            base_features=8))
    with pytest.raises(ValueError, match="divide"):
        Trainer(TrainConfig(model="unet", s2d=3, image_size=64,
                            base_features=8, levels=2))
