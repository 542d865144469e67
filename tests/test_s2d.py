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


class TestS2dAuto:
    """s2d=0 (the new default) auto-selects the equal-FLOPs packing at
    the measured HBM-bound regime, leaves everything else classic, and
    migrates across checkpoint variants on restore (VERDICT r3 #3)."""

    def test_auto_resolves_classic_at_small_shapes(self):
        tr = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                 base_features=8, levels=1,
                                 image_size=32, batch_size=8))
        assert tr.s2d == 1 and tr.model_features == 8
        explicit = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                       base_features=8, levels=1,
                                       image_size=32, batch_size=8,
                                       s2d=1))
        assert jax.tree_util.tree_structure(tr.state.params) \
            == jax.tree_util.tree_structure(explicit.state.params)

    def test_auto_resolves_packed_at_hbm_bound_shapes(self):
        tr = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                 base_features=4, levels=1,
                                 image_size=128, batch_size=8))
        assert tr.s2d == 2 and tr.model_features == 8
        # equal-FLOPs tree == the explicit round-3 (s2d=2, 2x features)
        explicit = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                       base_features=8, levels=1,
                                       image_size=128, batch_size=8,
                                       s2d=2))
        assert jax.tree_util.tree_structure(tr.state.params) \
            == jax.tree_util.tree_structure(explicit.state.params)
        # io contract unchanged
        x = np.random.RandomState(0).rand(8, 128, 128, 3).astype(
            np.float32)
        assert tr.predict(x).shape == (8, 128, 128)

    def test_auto_never_packs_wide_models(self):
        tr = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                 base_features=64, levels=1,
                                 image_size=128, batch_size=8))
        assert tr.s2d == 1 and tr.model_features == 64

    def test_restore_migrates_classic_checkpoint_under_auto(self,
                                                            tmp_path):
        """A pre-auto (classic s2d=1) checkpoint restores with the
        SAME command line under the new auto default."""
        cfg_old = TrainConfig(num_classes=2, in_channels=3,
                              base_features=4, levels=1,
                              image_size=128, batch_size=8,
                              precision="fp32", s2d=1)
        old = Trainer(cfg_old)
        rng = np.random.RandomState(0)
        imgs = rng.rand(8, 128, 128, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 128, 128)).astype(np.int32)
        old.train_step(imgs, lbls)
        old.save_checkpoint(str(tmp_path / "old"))
        pred_old = old.predict(imgs)

        cfg_auto = TrainConfig(num_classes=2, in_channels=3,
                               base_features=4, levels=1,
                               image_size=128, batch_size=8,
                               precision="fp32")  # s2d defaults to auto
        tr = Trainer(cfg_auto)
        assert tr.s2d == 2  # auto picked the packed tree first
        tr.restore_checkpoint(str(tmp_path / "old"))
        assert tr.s2d == 1  # migrated to the checkpoint's variant
        assert int(tr.state.step) == 1
        np.testing.assert_array_equal(tr.predict(imgs), pred_old)

    def test_auto_checkpoint_restores_under_auto(self, tmp_path):
        cfg = TrainConfig(num_classes=2, in_channels=3,
                          base_features=4, levels=1, image_size=128,
                          batch_size=8, precision="fp32")
        a = Trainer(cfg)
        rng = np.random.RandomState(1)
        imgs = rng.rand(8, 128, 128, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 128, 128)).astype(np.int32)
        a.train_step(imgs, lbls)
        a.save_checkpoint(str(tmp_path / "auto"))
        b = Trainer(cfg)
        b.restore_checkpoint(str(tmp_path / "auto"))
        assert b.s2d == 2
        np.testing.assert_array_equal(b.predict(imgs), a.predict(imgs))

    def test_packed_auto_ckpt_restores_when_auto_resolves_classic(
            self, tmp_path):
        """A checkpoint saved under auto-packed (s2d=2, width 2*bf)
        must restore with the same base_features when auto resolves
        classic (e.g. inference at a small image size) — the variant
        walk has to reach the DOUBLED-width tree, not just flip s2d."""
        cfg_big = TrainConfig(num_classes=2, in_channels=3,
                              base_features=4, levels=1,
                              image_size=128, batch_size=8,
                              precision="fp32")
        a = Trainer(cfg_big)
        assert (a.s2d, a.model_features) == (2, 8)
        rng = np.random.RandomState(3)
        imgs = rng.rand(8, 128, 128, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 128, 128)).astype(np.int32)
        a.train_step(imgs, lbls)
        a.save_checkpoint(str(tmp_path / "packed"))

        cfg_small = TrainConfig(num_classes=2, in_channels=3,
                                base_features=4, levels=1,
                                image_size=64, batch_size=8,
                                precision="fp32")
        b = Trainer(cfg_small)
        assert (b.s2d, b.model_features) == (1, 4)  # auto: classic
        b.restore_checkpoint(str(tmp_path / "packed"))
        assert (b.s2d, b.model_features) == (2, 8)
        assert int(b.state.step) == 1
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               a.state.params, b.state.params)

    def test_round3_explicit_packed_ckpt_restores_under_auto(
            self, tmp_path):
        """A pre-auto explicit --s2d 2 checkpoint (s2d=2 at the
        UNDOUBLED width) restores under the new auto default — the
        third reachable variant in the walk."""
        cfg_old = TrainConfig(num_classes=2, in_channels=3,
                              base_features=4, levels=1,
                              image_size=128, batch_size=8,
                              precision="fp32", s2d=2)
        old = Trainer(cfg_old)
        assert (old.s2d, old.model_features) == (2, 4)
        rng = np.random.RandomState(4)
        imgs = rng.rand(8, 128, 128, 3).astype(np.float32)
        lbls = rng.randint(0, 2, (8, 128, 128)).astype(np.int32)
        old.train_step(imgs, lbls)
        old.save_checkpoint(str(tmp_path / "r3"))
        pred_old = old.predict(imgs)

        cfg_auto = TrainConfig(num_classes=2, in_channels=3,
                               base_features=4, levels=1,
                               image_size=128, batch_size=8,
                               precision="fp32")
        tr = Trainer(cfg_auto)
        assert (tr.s2d, tr.model_features) == (2, 8)
        tr.restore_checkpoint(str(tmp_path / "r3"))
        assert (tr.s2d, tr.model_features) == (2, 4)
        np.testing.assert_array_equal(tr.predict(imgs), pred_old)

    def test_explicit_mismatch_still_fails_loudly(self, tmp_path):
        cfg1 = TrainConfig(num_classes=2, in_channels=3,
                           base_features=4, levels=1, image_size=128,
                           batch_size=8, precision="fp32", s2d=1)
        t1 = Trainer(cfg1)
        rng = np.random.RandomState(2)
        t1.train_step(rng.rand(8, 128, 128, 3).astype(np.float32),
                      rng.randint(0, 2, (8, 128, 128)).astype(np.int32))
        t1.save_checkpoint(str(tmp_path / "c"))
        t2 = Trainer(TrainConfig(num_classes=2, in_channels=3,
                                 base_features=4, levels=1,
                                 image_size=128, batch_size=8,
                                 precision="fp32", s2d=2))
        with pytest.raises(Exception):
            t2.restore_checkpoint(str(tmp_path / "c"))
