"""Device kernel tests: rasterization semantics (interior, ALL_TOUCHED,
last-writer-wins, holes), masked median vs np.ma.median, nearest-date
mosaic vs a sequential last-wins reference, augmentation invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dl_image_segmentation_tpu.ops.rasterize import rasterize
from dl_image_segmentation_tpu.ops.compositing import (
    masked_median, masked_median_pallas, nearest_valid_mosaic, pad_stack)
from dl_image_segmentation_tpu.ops.augment import augment_pairs


def brute_force_burn(features, shape, background, all_touched):
    """Slow geometric oracle: even-odd interior + exact
    segment-vs-pixel-square intersection, feature emit order."""
    h, w = shape
    out = np.full(shape, background, np.float64)
    ys, xs = np.mgrid[0:h, 0:w]
    cx = xs.ravel() + 0.5
    cy = ys.ravel() + 0.5
    for rings, value in features:
        # even-odd over all rings of the feature
        cross = np.zeros(h * w, np.int64)
        for ring in rings:
            r = np.asarray(ring, float)
            if not np.allclose(r[0], r[-1]):
                r = np.concatenate([r, r[:1]])
            x0, y0 = r[:-1, 0], r[:-1, 1]
            x1, y1 = r[1:, 0], r[1:, 1]
            for i in range(len(x0)):
                strad = (y0[i] > cy) != (y1[i] > cy)
                dy = y1[i] - y0[i]
                with np.errstate(divide="ignore", invalid="ignore"):
                    xi = x0[i] + (cy - y0[i]) * (x1[i] - x0[i]) / (
                        dy if dy != 0 else 1)
                cross += (strad & (cx < xi)).astype(np.int64)
        inside = (cross % 2) == 1
        mask = inside
        if all_touched:
            touch = np.zeros(h * w, bool)
            for ring in rings:
                r = np.asarray(ring, float)
                if not np.allclose(r[0], r[-1]):
                    r = np.concatenate([r, r[:1]])
                for i in range(len(r) - 1):
                    x0, y0 = r[i]
                    x1, y1 = r[i + 1]
                    bb = ((cx + 0.5 >= min(x0, x1)) & (cx - 0.5 <= max(x0, x1))
                          & (cy + 0.5 >= min(y0, y1))
                          & (cy - 0.5 <= max(y0, y1)))
                    nx, ny = (y1 - y0), (x0 - x1)
                    dist = np.abs(nx * (cx - x0) + ny * (cy - y0))
                    touch |= bb & (dist <= (abs(nx) + abs(ny)) * 0.5)
            mask = inside | touch
        out.ravel()[mask] = value
    return out


class TestRasterize:
    def test_simple_square_interior(self):
        sq = np.array([[2, 2], [8, 2], [8, 8], [2, 8]], float)
        out = rasterize([( [sq], 1 )], (12, 12), background=0,
                        all_touched=False, backend="jnp")
        assert out[5, 5] == 1
        assert out[0, 0] == 0
        # centre-inside only: rows/cols 2..7 have centres inside
        assert out.sum() == 36

    def test_all_touched_widens(self):
        sq = np.array([[2.6, 2.6], [7.4, 2.6], [7.4, 7.4], [2.6, 7.4]], float)
        interior = rasterize([([sq], 1)], (12, 12), 0, all_touched=False,
                             backend="jnp")
        touched = rasterize([([sq], 1)], (12, 12), 0, all_touched=True,
                            backend="jnp")
        assert touched.sum() > interior.sum()
        # pixel (2,2): square corner at (2.4, 2.4) clips it -> touched
        assert touched[2, 2] == 1 and interior[2, 2] == 0

    def test_last_writer_wins(self):
        a = np.array([[1, 1], [9, 1], [9, 9], [1, 9]], float)
        b = np.array([[4, 4], [11, 4], [11, 11], [4, 11]], float)
        out = rasterize([([a], 1), ([b], 2)], (12, 12), 0, backend="jnp")
        assert out[5, 5] == 2  # overlap -> later feature
        assert out[2, 2] == 1
        out2 = rasterize([([b], 2), ([a], 1)], (12, 12), 0, backend="jnp")
        assert out2[5, 5] == 1

    def test_hole(self):
        ext = np.array([[1, 1], [11, 1], [11, 11], [1, 11]], float)
        hole = np.array([[4, 4], [8, 4], [8, 8], [4, 8]], float)
        out = rasterize([([ext, hole], 7)], (12, 12), 0, all_touched=False,
                        backend="jnp")
        assert out[2, 2] == 7
        assert out[6, 6] == 0  # inside hole
        # ALL_TOUCHED: hole boundary pixels are burned
        out2 = rasterize([([ext, hole], 7)], (12, 12), 0, all_touched=True,
                         backend="jnp")
        assert out2[4, 4] == 7

    @pytest.mark.parametrize("all_touched", [False, True])
    def test_matches_bruteforce_random_triangles(self, all_touched):
        rng = np.random.RandomState(0)
        feats = []
        for v in range(1, 6):
            tri = rng.rand(3, 2) * 20
            feats.append(([tri], v))
        ours = rasterize(feats, (20, 20), 255, all_touched=all_touched,
                         backend="jnp")
        oracle = brute_force_burn(feats, (20, 20), 255, all_touched)
        np.testing.assert_array_equal(ours, oracle.astype(np.uint8))

    def test_pallas_matches_jnp(self):
        rng = np.random.RandomState(1)
        feats = []
        for v in range(1, 8):
            poly = rng.rand(5, 2) * 60
            feats.append(([poly], v))
        a = rasterize(feats, (64, 64), 255, backend="jnp")
        b = rasterize(feats, (64, 64), 255, backend="pallas")
        np.testing.assert_array_equal(a, b)

    def test_empty_features(self):
        out = rasterize([], (8, 8), background=255, backend="jnp")
        assert (out == 255).all()

    def test_pallas_binned_many_features_matches_jnp(self):
        """520 concrete features route to the BINNED kernel (above
        _BIN_THRESHOLD=64) -- output must stay identical to jnp,
        including last-writer-wins ordering of overlapping features."""
        rng = np.random.RandomState(2)
        feats = []
        for v in range(1, 521):
            c = rng.rand(2) * 56 + 4
            tri = c + (rng.rand(3, 2) - 0.5) * 8
            feats.append(([tri], (v % 250) + 1))
        # overlapping pair: the later feature must win
        sq = np.array([[10, 10], [30, 10], [30, 30], [10, 30]], float)
        feats[510] = ([sq], 77)
        feats[512] = ([sq + 0.5], 99)
        a = rasterize(feats, (64, 64), 255, backend="jnp")
        b = rasterize(feats, (64, 64), 255, backend="pallas")
        np.testing.assert_array_equal(a, b)
        assert 99 in np.unique(b)  # the later feature won the overlap

    def test_pallas_traced_chunked_dense_matches_jnp(self):
        """Under jit, edges are tracers so host binning is impossible:
        _rasterize_pallas must route ANY feature count through the
        dense kernel, splitting F > _F_CHUNK across sequential
        canvas-threading calls (Mosaic SMEM limit). Exercises the
        cross-chunk last-writer-wins ordering for real (F padded to a
        chunk multiple -> two chunks)."""
        from dl_image_segmentation_tpu.ops.rasterize import (
            _F_CHUNK, _rasterize_jnp, _rasterize_pallas, pack_features)
        rng = np.random.RandomState(3)
        feats = []
        for v in range(1, 521):
            c = rng.rand(2) * 56 + 4
            tri = c + (rng.rand(3, 2) - 0.5) * 8
            feats.append(([tri], (v % 250) + 1))
        sq = np.array([[10, 10], [30, 10], [30, 30], [10, 30]], float)
        feats[200] = ([sq], 77)       # chunk 0
        feats[515] = ([sq + 0.5], 99)  # chunk 1 overwrites the overlap
        edges, values, windows = pack_features(feats)
        assert len(edges) > _F_CHUNK  # pow2 pad -> 1024 -> two chunks

        @jax.jit
        def traced(e, v, w):
            return _rasterize_pallas(e, v, jnp.float32(255), 64, 64,
                                     True, interpret=True, windows=w)

        b = np.asarray(traced(jnp.asarray(edges), jnp.asarray(values),
                              jnp.asarray(windows)))
        a = np.asarray(_rasterize_jnp(
            jnp.asarray(edges), jnp.asarray(values), jnp.float32(255),
            64, 64, True, windows=jnp.asarray(windows)))
        np.testing.assert_array_equal(a, b)
        assert 99 in np.unique(b)

    def test_pallas_binned_slot_chunking_matches_jnp(self):
        """More than _F_CHUNK features binned into the SAME canvas
        block forces _binned_burn's slot-chunk loop (lo > 0) to thread
        the canvas across sequential kernel calls; ordering across the
        chunk boundary must stay last-writer-wins."""
        import importlib
        rz = importlib.import_module(
            "dl_image_segmentation_tpu.ops.rasterize")
        old = rz._F_CHUNK
        rz._F_CHUNK = 8  # force multi-chunk without 512 real features
        try:
            rng = np.random.RandomState(4)
            feats = []
            # 70 features all overlapping one small region -> one block
            # holds all 70 slots -> 9 chunks of 8
            for v in range(1, 71):
                c = rng.rand(2) * 10 + 10
                tri = c + (rng.rand(3, 2) - 0.5) * 6
                feats.append(([tri], (v % 250) + 1))
            sq = np.array([[12, 12], [18, 12], [18, 18], [12, 18]], float)
            feats[3] = ([sq], 77)        # early chunk
            feats[69] = ([sq + 0.3], 99)  # last chunk overwrites
            a = rasterize(feats, (32, 32), 255, backend="jnp")
            b = rasterize(feats, (32, 32), 255, backend="pallas")
            np.testing.assert_array_equal(a, b)
            assert 99 in np.unique(b)
        finally:
            rz._F_CHUNK = old

    def test_attribute_values_and_nodata(self):
        sq = np.array([[1, 1], [4, 1], [4, 4], [1, 4]], float)
        out = rasterize([([sq], 3)], (8, 8), background=255, backend="jnp")
        assert set(np.unique(out)) == {3, 255}


class TestMaskedMedian:
    def _random_case(self, seed, S=7, H=9, W=11, B=3):
        rng = np.random.RandomState(seed)
        stack = rng.rand(S, H, W, B).astype(np.float32) * 100
        valid = rng.rand(S, H, W) > 0.35
        return stack, valid

    def test_matches_numpy_ma(self):
        stack, valid = self._random_case(0)
        mask3 = ~np.broadcast_to(valid[..., None], stack.shape)
        expected = np.ma.median(np.ma.masked_array(stack, mask3), axis=0)
        med, any_valid = masked_median(jnp.asarray(stack),
                                       jnp.asarray(valid))
        med = np.asarray(med)
        av = np.asarray(any_valid)
        np.testing.assert_array_equal(av, ~expected.mask)
        np.testing.assert_allclose(med[av], expected.data[av], rtol=1e-6)

    def test_all_masked_pixel(self):
        stack = np.ones((3, 4, 4, 2), np.float32)
        valid = np.ones((3, 4, 4), bool)
        valid[:, 1, 2] = False
        med, av = masked_median(jnp.asarray(stack), jnp.asarray(valid))
        assert not np.asarray(av)[1, 2].any()
        assert np.asarray(med)[1, 2].sum() == 0

    def test_pallas_matches_jnp(self):
        stack, valid = self._random_case(2, S=5, H=16, W=16, B=4)
        m1, v1 = masked_median(jnp.asarray(stack), jnp.asarray(valid))
        m2, v2 = masked_median_pallas(jnp.asarray(stack),
                                      jnp.asarray(valid))
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_pad_stack(self):
        stack = np.ones((3, 2, 2, 1), np.float32)
        valid = np.ones((3, 2, 2), bool)
        s2, v2 = pad_stack(stack, valid, 8)
        assert s2.shape[0] == 8 and v2.shape[0] == 8
        assert not v2[3:].any()
        med, av = masked_median(jnp.asarray(s2), jnp.asarray(v2))
        np.testing.assert_allclose(np.asarray(med), 1.0)


class TestNearestMosaic:
    def test_matches_sequential_lastwins(self):
        rng = np.random.RandomState(3)
        S, H, W, B = 6, 8, 8, 2
        stack = rng.rand(S, H, W, B).astype(np.float32)
        valid = rng.rand(S, H, W) > 0.4
        dist = np.array([5, 3, 0, 7, 3, 1], np.float32)
        # reference behaviour: sort by dist DESC (stable), paint in order
        order = sorted(range(S), key=lambda i: dist[i], reverse=True)
        expect = np.zeros((H, W, B), np.float32)
        got_any = np.zeros((H, W), bool)
        for i in order:
            m = valid[i]
            expect[m] = stack[i][m]
            got_any |= m
        mosaic, av = nearest_valid_mosaic(
            jnp.asarray(stack), jnp.asarray(valid), jnp.asarray(dist))
        mosaic = np.asarray(mosaic)
        np.testing.assert_array_equal(np.asarray(av)[..., 0], got_any)
        np.testing.assert_allclose(mosaic[got_any], expect[got_any],
                                   rtol=1e-6)


    def test_large_distance_ties_break_to_later_scene(self):
        """Regression: the old (S-idx)*1e-6 tie-break penalty vanished
        below one float32 ulp once distances exceeded ~100 (ulp(100) ~
        7.6e-6), flipping ties to the EARLIEST scene. Ties must break
        to the later scene at any distance magnitude."""
        S, H, W, B = 3, 4, 4, 1
        stack = np.stack([np.full((H, W, B), v, np.float32)
                          for v in (1.0, 2.0, 3.0)])
        valid = np.ones((S, H, W), bool)
        for dist in (0.0, 3.0, 100.0, 365.0, 10000.0):
            d = np.full(S, dist, np.float32)
            mosaic, _ = nearest_valid_mosaic(
                jnp.asarray(stack), jnp.asarray(valid), jnp.asarray(d))
            np.testing.assert_array_equal(np.asarray(mosaic),
                                          stack[-1], err_msg=str(dist))
        # tie only between scenes 0 and 2 (scene 1 invalid everywhere)
        valid[1] = False
        d = np.full(S, 200.0, np.float32)
        mosaic, _ = nearest_valid_mosaic(
            jnp.asarray(stack), jnp.asarray(valid), jnp.asarray(d))
        np.testing.assert_array_equal(np.asarray(mosaic), stack[2])


class TestAugment:
    def test_shapes_and_determinism(self):
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.rand(4, 16, 16, 3).astype(np.float32))
        lbls = jnp.asarray(rng.randint(0, 3, (4, 16, 16)).astype(np.int32))
        key = jax.random.PRNGKey(0)
        i1, l1 = augment_pairs(key, imgs, lbls)
        i2, l2 = augment_pairs(key, imgs, lbls)
        assert i1.shape == imgs.shape and l1.shape == lbls.shape
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_image_label_alignment(self):
        # mark one corner; after any dihedral op the label must follow
        imgs = np.zeros((8, 8, 8, 1), np.float32)
        imgs[:, 0, 0, 0] = 1.0
        lbls = np.zeros((8, 8, 8), np.int32)
        lbls[:, 0, 0] = 1
        i, l = augment_pairs(jax.random.PRNGKey(7), jnp.asarray(imgs),
                             jnp.asarray(lbls))
        i = np.asarray(i)[..., 0]
        l = np.asarray(l)
        for n in range(8):
            iy, ix = np.unravel_index(np.argmax(i[n]), i[n].shape)
            ly, lx = np.unravel_index(np.argmax(l[n]), l[n].shape)
            assert (iy, ix) == (ly, lx)


class TestBaselineConfig4:
    def test_padded_512_tile_10_scene_stack(self):
        """BASELINE config 4 shapes: cloud-masked median +
        nearest-to-date over a 10-scene stack into a padded 512x512
        tile (smaller band count to keep CI fast)."""
        rng = np.random.RandomState(0)
        S, size, B = 10, 512, 4
        stack = rng.rand(7, size, size, B).astype(np.float32) * 1e4
        valid = rng.rand(7, size, size) > 0.4
        stack, valid = pad_stack(stack, valid, S)
        assert stack.shape == (S, size, size, B)
        med, av = masked_median(jnp.asarray(stack), jnp.asarray(valid))
        assert med.shape == (size, size, B)
        mask3 = ~np.broadcast_to(valid[..., None], stack.shape)
        exp = np.ma.median(np.ma.masked_array(stack, mask3), axis=0)
        got_valid = np.asarray(av)
        np.testing.assert_allclose(np.asarray(med)[got_valid],
                                   exp.data[got_valid], rtol=1e-6)
        dist = np.abs(np.arange(S, dtype=np.float32) - 4.5)
        mosaic, av2 = nearest_valid_mosaic(
            jnp.asarray(stack), jnp.asarray(valid), jnp.asarray(dist))
        assert mosaic.shape == (size, size, B)


class TestGeoref:
    def test_tile_key_identifier(self):
        from dl_image_segmentation_tpu.geo.georef import (
            georef_from_identifier, tile_from_identifier)
        gt, crs_s = georef_from_identifier(b"252:2:1.0:43:-902:8394")
        t = tile_from_identifier("252:2:1.0:43:-902:8394")
        assert crs_s == "EPSG:32643"
        assert gt == t.geotrans

    def test_gt_crs_identifier(self):
        from dl_image_segmentation_tpu.geo.georef import (
            georef_from_identifier)
        ident = "chip.tif|[272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0]|EPSG:32643"
        gt, crs_s = georef_from_identifier(ident)
        assert gt == (272696.0, 10.0, 0.0, 2115548.0, 0.0, -10.0)
        assert crs_s == "EPSG:32643"

    def test_plain_filename(self):
        from dl_image_segmentation_tpu.geo.georef import (
            georef_from_identifier)
        assert georef_from_identifier("whatever.png") == (None, None)


class TestMaskedMedianDispatch:
    def test_auto_matches_jnp_on_cpu(self):
        from dl_image_segmentation_tpu.ops.compositing import (
            masked_median_composite)
        rng = np.random.RandomState(3)
        stack = rng.randint(0, 4096, (7, 40, 40, 3)).astype(np.float32)
        valid = rng.rand(7, 40, 40) > 0.4
        m_auto, a_auto = masked_median_composite(stack, valid)
        m_jnp, a_jnp = masked_median(jnp.asarray(stack),
                                     jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(m_auto),
                                      np.asarray(m_jnp))
        np.testing.assert_array_equal(np.asarray(a_auto),
                                      np.asarray(a_jnp))

    def test_pallas_backend_forced(self):
        from dl_image_segmentation_tpu.ops.compositing import (
            masked_median_composite)
        rng = np.random.RandomState(4)
        stack = rng.randint(0, 4096, (5, 32, 32, 2)).astype(np.float32)
        valid = rng.rand(5, 32, 32) > 0.4
        m_p, a_p = masked_median_composite(stack, valid,
                                           backend="pallas")
        m_j, a_j = masked_median_composite(stack, valid, backend="jnp")
        np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_j))
        np.testing.assert_array_equal(np.asarray(a_p), np.asarray(a_j))


class TestRandomInvert:
    def test_inverts_some_not_labels(self):
        from dl_image_segmentation_tpu.ops.augment import (
            random_invert_pairs)
        rng = np.random.RandomState(0)
        imgs = jnp.asarray(rng.rand(16, 8, 8, 3).astype(np.float32))
        lbls = jnp.asarray(rng.randint(0, 2, (16, 8, 8)))
        out, lo = random_invert_pairs(jax.random.PRNGKey(0), imgs, lbls,
                                      prob=0.5)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(lbls))
        same = np.array([np.allclose(out[i], imgs[i]) for i in range(16)])
        inv = np.array([np.allclose(out[i], 1.0 - imgs[i])
                        for i in range(16)])
        assert (same | inv).all() and same.any() and inv.any()

    def test_prob_extremes(self):
        from dl_image_segmentation_tpu.ops.augment import (
            random_invert_pairs)
        imgs = jnp.ones((4, 4, 4, 1)) * 0.25
        lbls = jnp.zeros((4, 4, 4), jnp.int32)
        out, _ = random_invert_pairs(jax.random.PRNGKey(1), imgs, lbls,
                                     prob=0.0)
        np.testing.assert_allclose(np.asarray(out), 0.25)
        out, _ = random_invert_pairs(jax.random.PRNGKey(1), imgs, lbls,
                                     prob=1.0)
        np.testing.assert_allclose(np.asarray(out), 0.75)


class TestPhotometricAugment:
    """brightness/contrast jitter in augment_pairs (the reference's
    Keras RandomBrightness/RandomContrast family, parse nb cells
    50-56): numerics, label safety, and the off-by-default contract."""

    def _pairs(self, n=16):
        rng = np.random.RandomState(5)
        imgs = jnp.asarray(rng.rand(n, 8, 8, 3).astype(np.float32))
        lbls = jnp.asarray(rng.randint(0, 3, (n, 8, 8)).astype(np.int32))
        return imgs, lbls

    def test_brightness_additive_and_clipped(self):
        imgs, lbls = self._pairs()
        out, lo = augment_pairs(jax.random.PRNGKey(0), imgs, lbls,
                                hflip=False, vflip=False, rot90=False,
                                brightness=0.2)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(lbls))
        o, im = np.asarray(out), np.asarray(imgs)
        assert o.min() >= 0.0 and o.max() <= 1.0
        # per example, the unclipped delta is one constant
        for i in range(len(o)):
            interior = (im[i] > 0.25) & (im[i] < 0.75) \
                & (o[i] > 1e-6) & (o[i] < 1 - 1e-6)
            d = (o[i] - im[i])[interior]
            if d.size:
                assert np.ptp(d) < 1e-5 and abs(d[0]) <= 0.2 + 1e-6
        assert not np.allclose(o, im)  # some example actually moved

    def test_contrast_preserves_mean_and_direction(self):
        imgs, lbls = self._pairs()
        out, lo = augment_pairs(jax.random.PRNGKey(1), imgs, lbls,
                                hflip=False, vflip=False, rot90=False,
                                contrast=0.5)
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(lbls))
        o, im = np.asarray(out), np.asarray(imgs)
        # x -> mean + (x - mean) * f preserves the per-channel mean
        np.testing.assert_allclose(o.mean(axis=(1, 2)),
                                   im.mean(axis=(1, 2)), atol=1e-5)
        # per example the factor is one constant within [0.5, 1.5]
        mean = im.mean(axis=(1, 2), keepdims=True)
        f = (o - mean) / np.where(np.abs(im - mean) < 1e-4, np.nan,
                                  im - mean)
        for i in range(len(o)):
            fi = f[i][np.isfinite(f[i])]
            assert fi.size and np.ptp(fi) < 1e-4
            assert 0.5 - 1e-5 <= fi[0] <= 1.5 + 1e-5

    def test_defaults_off(self):
        imgs, lbls = self._pairs(4)
        out, _ = augment_pairs(jax.random.PRNGKey(2), imgs, lbls,
                               hflip=False, vflip=False, rot90=False)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))

    def test_composes_with_geometric_label_alignment(self):
        imgs = np.zeros((8, 8, 8, 1), np.float32)
        imgs[:, 0, 0, 0] = 1.0
        lbls = np.zeros((8, 8, 8), np.int32)
        lbls[:, 0, 0] = 1
        i, l = augment_pairs(jax.random.PRNGKey(3), jnp.asarray(imgs),
                             jnp.asarray(lbls), invert_prob=0.5,
                             brightness=0.1, contrast=0.3)
        i, l = np.asarray(i), np.asarray(l)
        for n in range(8):
            ly, lx = np.unravel_index(np.argmax(l[n]), l[n].shape)
            # the marked pixel remains the extremum (min if inverted)
            vals = i[n, :, :, 0]
            ext = np.unravel_index(
                np.argmax(np.abs(vals - np.median(vals))), vals.shape)
            assert ext == (ly, lx)


class TestPackFeatureEdges:
    def test_max_edges_overflow_raises(self):
        from dl_image_segmentation_tpu.ops.rasterize import pack_features
        ring = np.array([[0, 0], [4, 0], [4, 4], [2, 6], [0, 4], [0, 0]],
                        np.float32)
        with pytest.raises(ValueError, match="over max_edges"):
            pack_features([([ring], 1.0)], max_edges=2)

    def test_pow2_bucketing_identical_output(self):
        """(F, E) pad to powers of two with _FAR sentinels: output must
        be identical to the burn result, and the padded axes bounded."""
        from dl_image_segmentation_tpu.ops.rasterize import (pack_features,
                                                             rasterize)
        rings = []
        for k in range(3):  # 3 features -> F_pad 4
            r = np.array([[k * 3, 0], [k * 3 + 2, 0], [k * 3 + 2, 2],
                          [k * 3, 2], [k * 3, 0]], np.float32)
            rings.append(([r], float(k + 1)))
        edges, values, windows = pack_features(rings)
        assert edges.shape[0] == 4 and edges.shape[1] == 4  # pow2 pads
        out = rasterize(rings, (4, 12), background=0, all_touched=False,
                        dtype=np.uint8)
        for k in range(3):
            assert out[1, k * 3 + 1] == k + 1

    def test_nearly_closed_ring_is_closed_exactly(self):
        """A dirty ring whose endpoints differ by a sub-pixel amount at
        large coordinates must still get its closing segment (allclose
        rtol used to swallow the gap and corrupt parity)."""
        from dl_image_segmentation_tpu.ops.rasterize import rasterize
        ring = np.array([[5000.0, 5000.0], [5008.0, 5000.0],
                         [5008.0, 5008.0], [5000.0, 5008.0],
                         [5000.0, 5000.05]], np.float32)  # 0.05 px gap
        shifted = [r - 4998.0 for r in [ring]]
        out = rasterize([(shifted, 1.0)], (12, 12), background=0,
                        all_touched=False, dtype=np.uint8)
        # interior fully burned despite the dirty closure
        assert out[3:9, 3:9].all()


class TestAugmentRectangles:
    def test_rot90_rectangular_raises_clearly(self):
        import jax
        from dl_image_segmentation_tpu.ops.augment import augment_pairs
        imgs = jnp.zeros((2, 8, 16, 3), jnp.float32)
        lbls = jnp.zeros((2, 8, 16), jnp.int32)
        with pytest.raises(ValueError, match="square tiles"):
            augment_pairs(jax.random.PRNGKey(0), imgs, lbls)

    def test_pad_stack_never_truncates(self):
        from dl_image_segmentation_tpu.ops.compositing import pad_stack
        stack = np.zeros((5, 4, 4, 2), np.float32)
        valid = np.ones((5, 4, 4), bool)
        with pytest.raises(ValueError, match="drop scenes"):
            pad_stack(stack, valid, 3)
        s2, v2 = pad_stack(stack, valid, 8)
        assert s2.shape[0] == 8 and not v2[5:].any()
