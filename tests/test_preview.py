"""Preview contact-sheet helpers (the parse notebook's display
conventions: band selection + per-band max normalization)."""

import numpy as np
import pytest

from dl_image_segmentation_tpu.utils.preview import (colorize_label,
                                                     display_rgb,
                                                     render_pair_sheet)


class TestDisplayRGB:
    def test_12band_defaults_to_s2_rgb(self):
        # notebook cells 20-21: a 12-band S2 stack displays bands
        # (3, 2, 1), each normalized by its own tile max
        img = np.zeros((4, 4, 12), np.int16)
        img[:, :, 3] = 100   # -> red channel
        img[:, :, 2] = 50    # -> green
        img[:, :, 1] = 25    # -> blue
        out = display_rgb(img)
        assert out.dtype == np.uint8 and out.shape == (4, 4, 3)
        # per-band max normalization saturates each displayed band
        assert (out == 255).all()

    def test_3band_passthrough_order(self):
        img = np.stack([np.full((2, 2), v, np.uint8)
                        for v in (10, 20, 30)], axis=-1)
        out = display_rgb(img)
        assert (out[..., 0] == 255).all()  # each band / its own max
        rev = display_rgb(img, rgb_bands=(2, 1, 0))
        np.testing.assert_array_equal(rev, out[..., ::-1])

    def test_single_band_replicates(self):
        out = display_rgb(np.arange(4, dtype=np.float32).reshape(2, 2))
        assert out.shape == (2, 2, 3)
        assert (out[..., 0] == out[..., 1]).all()

    def test_out_of_range_band_raises(self):
        with pytest.raises(ValueError, match="out of range"):
            display_rgb(np.zeros((2, 2, 3)), rgb_bands=(0, 1, 5))

    def test_all_zero_tile_stays_black_not_nan(self):
        out = display_rgb(np.zeros((3, 3, 3), np.uint16))
        assert (out == 0).all()


class TestColorize:
    def test_nodata_black_classes_distinct(self):
        t = np.array([[0, 1], [2, 255]], np.uint8)
        out = colorize_label(t, nodata=255)
        assert (out[1, 1] == 0).all()
        colors = {tuple(out[i, j]) for i, j in
                  ((0, 0), (0, 1), (1, 0))}
        assert len(colors) == 3


class TestSheet:
    def test_layout_and_anchoring(self):
        pairs = [(np.ones((8, 8, 3), np.uint8),
                  np.zeros((8, 8), np.uint8)),
                 (np.ones((4, 6, 3), np.uint8),   # smaller pair
                  np.zeros((4, 6), np.uint8))]
        sheet = render_pair_sheet(pairs, gap=2)
        assert sheet.shape == (2 * 8 + 3 * 2, 2 * 8 + 3 * 2, 3)
        # the smaller pair's unused cell area stays white
        assert (sheet[2 + 8 + 2 + 5, 2 + 1] == 255).all()

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="no pairs"):
            render_pair_sheet([])
