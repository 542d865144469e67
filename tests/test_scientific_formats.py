"""Scientific raster containers: NetCDF classic, HDF5/NetCDF-4, GRIB2,
VRT — the last formats the reference reached through rasterio/GDAL's
universal decode (_img_to_tf_mp.py:45-53) that this framework now
decodes in-repo.

External goldens: the classic netCDF fixtures are WRITTEN by
scipy.io.netcdf_file (an independent implementation of the wire
format); HDF5 fixtures by h5py (the runtime decode dependency but an
independent writer); the GRIB2 golden message is hand-assembled
byte-by-byte in this file from the WMO spec tables, independent of the
in-repo fixture encoder.
"""

import io
import os
import struct

import numpy as np
import pytest

from dl_image_segmentation_tpu.raster import (GeoTIFF, decode_image_bytes,
                                              write_geotiff)
from dl_image_segmentation_tpu.raster.image import (UnsupportedFormatError,
                                                    sniff_image_info)
from dl_image_segmentation_tpu.raster.netcdf import (
    decode_netcdf, is_netcdf_classic, netcdf_variables, sniff_netcdf_info)
from dl_image_segmentation_tpu.raster.hdf5 import (
    decode_hdf5, hdf5_variables, is_hdf5, sniff_hdf5_info)
from dl_image_segmentation_tpu.raster.grib import (
    decode_grib, encode_grib2, is_grib, sniff_grib_info)
from dl_image_segmentation_tpu.raster.vrt import (decode_vrt, is_vrt,
                                                  sniff_vrt_info)


def _scipy_nc(build):
    from scipy.io import netcdf_file
    buf = io.BytesIO()
    f = netcdf_file(buf, "w")
    build(f)
    f.flush()
    return buf.getvalue()


class TestNetCDFClassic:
    def test_cdf1_latlon_scipy_golden(self):
        """scipy-written CDF-1 with CF lat/lon coords: values,
        pixel-corner geotransform, EPSG:4326, _FillValue."""
        truth = np.arange(12, dtype=np.int16).reshape(3, 4)

        def build(f):
            f.createDimension("y", 3)
            f.createDimension("x", 4)
            vy = f.createVariable("y", "d", ("y",))
            vy[:] = [50.25, 50.15, 50.05]
            vy.units = b"degrees_north"
            vx = f.createVariable("x", "d", ("x",))
            vx[:] = [8.05, 8.15, 8.25, 8.35]
            vx.units = b"degrees_east"
            v = f.createVariable("band", "h", ("y", "x"))
            v[:] = truth
            v._FillValue = np.int16(-9)

        data = _scipy_nc(build)
        assert is_netcdf_classic(data)
        g = decode_netcdf(data)
        assert g.array.shape == (3, 4, 1)
        assert g.array.dtype == np.int16
        np.testing.assert_array_equal(g.array[:, :, 0], truth)
        gt = g.info.geotransform
        assert gt == pytest.approx((8.0, 0.1, 0.0, 50.3, 0.0, -0.1))
        assert g.info.epsg == 4326
        assert g.info.nodata == -9.0

    def test_cdf2_record_variable(self):
        """64-bit-offset file with an unlimited (record) dim: the
        (time, y, x) variable flattens to bands-last."""
        arr = np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3)

        def build(f):
            f.createDimension("time", None)
            f.createDimension("y", 2)
            f.createDimension("x", 3)
            v = f.createVariable("t2m", "f", ("time", "y", "x"))
            v[:] = arr

        data = _scipy_nc(build)
        assert data[:4] == b"CDF\x02" or data[:4] == b"CDF\x01"
        g = decode_netcdf(data)
        assert g.array.shape == (2, 3, 2)
        np.testing.assert_array_equal(g.array.transpose(2, 0, 1), arr)

    def test_two_record_variables_interleaved(self):
        """Multiple record variables share the record slab with
        per-record interleaving — the stride math must skip the other
        variable's bytes."""
        a = np.arange(3 * 2 * 2, dtype=np.float32).reshape(3, 2, 2)
        b = a * 10.0

        def build(f):
            f.createDimension("time", None)
            f.createDimension("y", 2)
            f.createDimension("x", 2)
            va = f.createVariable("a", "f", ("time", "y", "x"))
            vb = f.createVariable("b", "f", ("time", "y", "x"))
            va[:] = a
            vb[:] = b

        data = _scipy_nc(build)
        ga = decode_netcdf(data, variable="a")
        gb = decode_netcdf(data, variable="b")
        np.testing.assert_array_equal(ga.array.transpose(2, 0, 1), a)
        np.testing.assert_array_equal(gb.array.transpose(2, 0, 1), b)

    def test_cdf5_hand_crafted(self):
        """CDF-5 (64-bit sizes) parsed from hand-assembled bytes: the
        spec's NON_NEG fields all widen to 8 bytes."""
        def name(s):
            b = s.encode()
            pad = (-len(b)) % 4
            return struct.pack(">Q", len(b)) + b + bytes(pad)

        header = bytearray()
        header += b"CDF\x05"
        header += struct.pack(">Q", 0)  # numrecs
        header += struct.pack(">I", 0x0A) + struct.pack(">Q", 2)
        header += name("y") + struct.pack(">Q", 2)
        header += name("x") + struct.pack(">Q", 3)
        header += struct.pack(">IQ", 0, 0)  # gatts ABSENT
        header += struct.pack(">I", 0x0B) + struct.pack(">Q", 1)
        var = bytearray()
        var += name("v")
        var += struct.pack(">Q", 2)          # ndims
        var += struct.pack(">II", 0, 1)      # dimids (4 bytes each)
        var += struct.pack(">IQ", 0, 0)      # vatts ABSENT
        var += struct.pack(">I", 4)          # NC_INT
        var += struct.pack(">Q", 24)         # vsize
        begin = len(header) + len(var) + 8   # begin is 8 bytes itself
        var += struct.pack(">Q", begin)
        payload = np.arange(6, dtype=">i4").tobytes()
        data = bytes(header) + bytes(var) + payload
        g = decode_netcdf(data)
        assert g.array.shape == (2, 3, 1)
        assert g.array.dtype == np.int32
        np.testing.assert_array_equal(
            g.array[:, :, 0], np.arange(6).reshape(2, 3))

    def test_variable_selection_and_errors(self):
        def build(f):
            f.createDimension("y", 4)
            f.createDimension("x", 4)
            f.createDimension("y2", 2)
            f.createDimension("x2", 2)
            big = f.createVariable("big", "f", ("y", "x"))
            big[:] = np.ones((4, 4), np.float32)
            small = f.createVariable("small", "f", ("y2", "x2"))
            small[:] = np.zeros((2, 2), np.float32)

        data = _scipy_nc(build)
        assert set(netcdf_variables(data)) == {"big", "small"}
        assert decode_netcdf(data).array.shape == (4, 4, 1)
        assert decode_netcdf(data, "small").array.shape == (2, 2, 1)
        with pytest.raises(ValueError, match="small"):
            decode_netcdf(data, variable="nope")

    def test_sniff_matches_decode(self):
        def build(f):
            f.createDimension("y", 3)
            f.createDimension("x", 4)
            vy = f.createVariable("y", "d", ("y",))
            vy[:] = [30.0, 20.0, 10.0]
            vy.units = b"degrees_north"
            vx = f.createVariable("x", "d", ("x",))
            vx[:] = [0.0, 10.0, 20.0, 30.0]
            vx.units = b"degrees_east"
            v = f.createVariable("band", "b", ("y", "x"))
            v[:] = np.zeros((3, 4), np.int8)

        data = _scipy_nc(build)
        si = sniff_netcdf_info(data)
        g = decode_netcdf(data)
        assert (si.width, si.height, si.count) == (4, 3, 1)
        assert si.dtype == g.array.dtype.name == "int8"
        assert si.geotransform == g.info.geotransform
        assert si.epsg == g.info.epsg == 4326


class TestHDF5:
    def _nc4_utm(self):
        import h5py
        buf = io.BytesIO()
        with h5py.File(buf, "w") as f:
            y = f.create_dataset(
                "y", data=np.array([600005.0, 599995.0, 599985.0]))
            x = f.create_dataset(
                "x", data=np.array([399985.0, 399995.0, 400005.0,
                                    400015.0]))
            y.attrs["standard_name"] = "projection_y_coordinate"
            x.attrs["standard_name"] = "projection_x_coordinate"
            y.make_scale("y")
            x.make_scale("x")
            d = f.create_dataset(
                "refl", data=np.arange(12, dtype=np.uint16).reshape(3, 4))
            d.dims[0].attach_scale(y)
            d.dims[1].attach_scale(x)
            gm = f.create_dataset("tm", data=np.array(0, dtype="i1"))
            gm.attrs["grid_mapping_name"] = "transverse_mercator"
            gm.attrs["scale_factor_at_central_meridian"] = 0.9996
            gm.attrs["false_easting"] = 500000.0
            gm.attrs["false_northing"] = 0.0
            gm.attrs["longitude_of_central_meridian"] = 15.0
            d.attrs["grid_mapping"] = "tm"
            d.attrs["_FillValue"] = np.uint16(65535)
        return buf.getvalue()

    def test_netcdf4_style_utm(self):
        """NetCDF-4 = HDF5 + dimension scales + CF attrs: projected
        coords and a transverse_mercator grid_mapping resolve to the
        UTM EPSG; values and nodata round-trip."""
        data = self._nc4_utm()
        assert is_hdf5(data)
        g = decode_hdf5(data)
        assert g.array.shape == (3, 4, 1) and g.array.dtype == np.uint16
        np.testing.assert_array_equal(
            g.array[:, :, 0], np.arange(12).reshape(3, 4))
        assert g.info.epsg == 32633
        assert g.info.geotransform == (399980.0, 10.0, 0.0,
                                       600010.0, 0.0, -10.0)
        assert g.info.nodata == 65535.0
        si = sniff_hdf5_info(data)
        assert (si.geotransform, si.epsg) == (g.info.geotransform, 32633)

    def test_sibling_coords_3d_bands(self):
        """No dimension scales: sibling 1-D CF lat/lon datasets still
        georeference; a (time, y, x) cube flattens to bands-last."""
        import h5py
        arr = np.arange(2 * 2 * 3, dtype=np.float32).reshape(2, 2, 3)
        buf = io.BytesIO()
        with h5py.File(buf, "w") as f:
            grp = f.create_group("product")
            lat = grp.create_dataset("lat", data=np.array([50.25, 50.15]))
            lon = grp.create_dataset(
                "lon", data=np.array([8.05, 8.15, 8.25]))
            lat.attrs["units"] = "degrees_north"
            lon.attrs["units"] = "degrees_east"
            grp.create_dataset("t2m", data=arr)
        data = buf.getvalue()
        assert set(hdf5_variables(data)) == {
            "/product/lat", "/product/lon", "/product/t2m"}
        g = decode_hdf5(data)
        assert g.array.shape == (2, 3, 2)
        np.testing.assert_array_equal(g.array.transpose(2, 0, 1), arr)
        assert g.info.epsg == 4326
        assert g.info.geotransform == pytest.approx(
            (8.0, 0.1, 0.0, 50.3, 0.0, -0.1))

    def test_explicit_path_and_missing(self):
        data = self._nc4_utm()
        g = decode_hdf5(data, variable="refl")
        assert g.array.shape == (3, 4, 1)
        with pytest.raises(ValueError, match="refl"):
            decode_hdf5(data, variable="nothere")


class TestGRIB2:
    def test_hand_assembled_spec_golden(self):
        """A GRIB2 message assembled byte-by-byte from the WMO spec
        tables (independent of encode_grib2): 2x3 grid, simple packing,
        nbits=8, R=100, E=1, D=0 -> Y = 100 + 2*X."""
        def sec(num, body):
            return struct.pack(">IB", 5 + len(body), num) + body

        ident = sec(1, struct.pack(">HHBBBHBBBBBBB", 7, 0, 2, 1, 1,
                                   2026, 8, 19, 0, 0, 0, 0, 1))
        grid = bytearray()
        grid += b"\x00"                       # source of grid def
        grid += struct.pack(">I", 6)          # number of points
        grid += b"\x00\x00"                   # octets, interpretation
        grid += struct.pack(">H", 0)          # template 3.0
        grid += b"\x06"                       # shape of earth
        grid += bytes(15)                     # radii scale/value fields
        grid += struct.pack(">II", 3, 2)      # Ni, Nj
        grid += struct.pack(">II", 0, 0)      # basic angle, subdivs
        grid += struct.pack(">I", 60_000_000)   # La1 = 60N
        grid += struct.pack(">I", 10_000_000)   # Lo1 = 10E
        grid += b"\x30"                       # res/component flags
        grid += struct.pack(">I", 59_000_000)   # La2
        grid += struct.pack(">I", 12_000_000)   # Lo2
        grid += struct.pack(">I", 1_000_000)    # Di = 1 deg
        grid += struct.pack(">I", 1_000_000)    # Dj = 1 deg
        grid += b"\x00"                       # scanning mode 0
        product = sec(4, struct.pack(">HH", 0, 0) + bytes(25))
        drs = sec(5, struct.pack(">IH", 6, 0)
                  + struct.pack(">f", 100.0)   # reference value R
                  + struct.pack(">H", 1)       # binary scale E = 1
                  + struct.pack(">H", 0)       # decimal scale D = 0
                  + b"\x08\x00")               # 8 bits, float field
        bitmap = sec(6, b"\xff")
        payload = sec(7, bytes([0, 1, 2, 3, 4, 5]))
        body = ident + sec(3, bytes(grid)) + product + drs + bitmap \
            + payload
        total = 16 + len(body) + 4
        msg = (b"GRIB" + bytes(2) + bytes([0, 2])
               + struct.pack(">Q", total) + body + b"7777")

        assert is_grib(msg)
        g = decode_grib(msg)
        assert g.array.shape == (2, 3, 1)
        np.testing.assert_array_equal(
            g.array[:, :, 0],
            100.0 + 2.0 * np.arange(6, dtype=np.float32).reshape(2, 3))
        assert g.info.epsg == 4326
        assert g.info.geotransform == pytest.approx(
            (9.5, 1.0, 0.0, 60.5, 0.0, -1.0))

    def test_simple_packing_roundtrip(self):
        rng = np.random.default_rng(0)
        field = np.round(rng.uniform(250, 310, (5, 8)), 1)
        data = encode_grib2(field, la1=50.0, lo1=8.0, di=0.25, dj=0.25,
                            nbits=16, dec_scale=1)
        g = decode_grib(data)
        np.testing.assert_allclose(g.array[:, :, 0], field, atol=0.051)
        si = sniff_grib_info(data)
        assert si.geotransform == g.info.geotransform
        assert si.geotransform == pytest.approx(
            (7.875, 0.25, 0.0, 50.125, 0.0, -0.25))

    @pytest.mark.parametrize("packing", ["png", "jp2"])
    def test_compressed_packing_roundtrip(self, packing):
        rng = np.random.default_rng(1)
        field = np.round(rng.uniform(0, 300, (7, 9)), 1)
        data = encode_grib2(field, 10.0, -5.0, 0.5, 0.5, nbits=12,
                            dec_scale=1, packing=packing)
        g = decode_grib(data)
        np.testing.assert_allclose(g.array[:, :, 0], field, atol=0.051)

    def test_bitmap_and_multimessage(self):
        rng = np.random.default_rng(2)
        field = np.round(rng.uniform(0, 100, (5, 8)), 0)
        mask = np.ones((5, 8), bool)
        mask[0, 0] = mask[3, 4] = False
        d1 = encode_grib2(field, 50.0, 8.0, 0.25, 0.25, nbits=12,
                          mask=mask)
        d2 = encode_grib2(field + 1.0, 50.0, 8.0, 0.25, 0.25, nbits=12)
        g = decode_grib(d1 + d2)
        assert g.array.shape == (5, 8, 2)
        assert np.isnan(g.array[0, 0, 0]) and np.isnan(g.array[3, 4, 0])
        np.testing.assert_allclose(g.array[:, :, 0][mask], field[mask])
        np.testing.assert_allclose(g.array[:, :, 1], field + 1.0)
        assert np.isnan(g.info.nodata)
        assert sniff_grib_info(d1 + d2).count == 2

    def test_south_to_north_scan_flips(self):
        """Scanning mode 0x40 (+j): rows arrive south-first and must
        flip to image order, with the geotransform tracking the flip."""
        field = np.arange(6, dtype=np.float64).reshape(2, 3)
        data = encode_grib2(field, 50.0, 8.0, 1.0, 1.0, nbits=8)
        # rewrite the scanning mode byte inside section 3 and swap La1
        # to the southern row (what a +j producer would store)
        raw = bytearray(data)
        pos = 16
        while True:
            (ln,) = struct.unpack_from(">I", raw, pos)
            if raw[pos + 4] == 3:
                break
            pos += ln
        raw[pos + 71] = 0x40
        south = int(round((50.0 - 1.0) * 1e6))
        struct.pack_into(">I", raw, pos + 46, south)
        g_flipped = decode_grib(bytes(raw))
        g_plain = decode_grib(data)
        np.testing.assert_array_equal(g_flipped.array[::-1],
                                      g_plain.array)
        assert g_flipped.info.geotransform == g_plain.info.geotransform

    @pytest.mark.parametrize(
        "packing", ["complex", "complex-sd1", "complex-sd2"])
    def test_complex_packing_roundtrip(self, packing):
        """Templates 5.2/5.3 (the NCEP default) survive a round trip,
        including a non-multiple-of-group-size point count and a
        smooth field where spatial differencing bites."""
        rng = np.random.default_rng(3)
        field = (np.cumsum(rng.integers(-3, 4, 10 * 21))
                 .reshape(10, 21).astype(np.float64) + 250.0)
        data = encode_grib2(field, 40.0, 5.0, 0.1, 0.1, nbits=16,
                            packing=packing)
        g = decode_grib(data)
        np.testing.assert_allclose(g.array[:, :, 0], field, atol=1e-4)
        si = sniff_grib_info(data)
        assert si.geotransform == g.info.geotransform

    def test_complex_packing_with_bitmap(self):
        rng = np.random.default_rng(4)
        field = np.round(rng.uniform(0, 50, (6, 9)), 1)
        mask = np.ones((6, 9), bool)
        mask[0, 0] = mask[5, 8] = mask[2, 3] = False
        data = encode_grib2(field, 30.0, -2.0, 0.5, 0.5, nbits=12,
                            dec_scale=1, packing="complex-sd2",
                            mask=mask)
        g = decode_grib(data)
        assert np.isnan(g.array[0, 0, 0]) and np.isnan(g.array[2, 3, 0])
        np.testing.assert_allclose(g.array[:, :, 0][mask], field[mask],
                                   atol=0.051)

    def test_hand_assembled_complex_golden(self):
        """A template-5.2 message assembled byte-by-byte from the WMO
        spec tables, independent of encode_grib2 — pins the octet
        padding between the packed arrays and every DRS field offset.

        2 groups of 3 points: refs [2,5] at nbits=3, widths [2,0] at
        width_bits=2, lengths via len_ref=3/len_bits=0, group-0 values
        [1,2,3] -> X = [3,4,5,5,5,5]; R=1.5, E=1, D=1."""
        def sec(num, body):
            return struct.pack(">IB", 5 + len(body), num) + body

        ident = sec(1, struct.pack(">HHBBBHBBBBBBB", 7, 0, 2, 1, 1,
                                   2026, 8, 19, 0, 0, 0, 0, 1))
        grid = bytearray()
        grid += b"\x00" + struct.pack(">I", 6) + b"\x00\x00"
        grid += struct.pack(">H", 0) + b"\x06" + bytes(15)
        grid += struct.pack(">II", 3, 2) + struct.pack(">II", 0, 0)
        grid += struct.pack(">I", 60_000_000)
        grid += struct.pack(">I", 10_000_000) + b"\x30"
        grid += struct.pack(">I", 59_000_000)
        grid += struct.pack(">I", 12_000_000)
        grid += struct.pack(">II", 1_000_000, 1_000_000) + b"\x00"
        product = sec(4, struct.pack(">HH", 0, 0) + bytes(25))
        drs = sec(5, struct.pack(">IH", 6, 2)        # 6 pts, 5.2
                  + struct.pack(">f", 1.5)           # R
                  + struct.pack(">HH", 1, 1)         # E=1, D=1
                  + bytes([3, 0])                    # nbits, field type
                  + bytes([1, 0]) + bytes(8)         # split, mvm, missing
                  + struct.pack(">I", 2)             # ngroups
                  + bytes([0, 2])                    # width ref/bits
                  + struct.pack(">I", 3) + bytes([1])  # len ref, inc
                  + struct.pack(">I", 3)             # last length
                  + bytes([0]))                      # len bits
        payload = sec(7, bytes([0x54, 0x80, 0x6C]))
        body = (ident + sec(3, bytes(grid)) + product + drs
                + sec(6, b"\xff") + payload)
        total = 16 + len(body) + 4
        msg = (b"GRIB" + bytes(2) + bytes([0, 2])
               + struct.pack(">Q", total) + body + b"7777")

        g = decode_grib(msg)
        expected = (1.5 + np.array([3, 4, 5, 5, 5, 5.0]) * 2.0) / 10.0
        np.testing.assert_allclose(
            g.array[:, :, 0], expected.reshape(2, 3).astype(np.float32))

    def test_unsupported_named_loudly(self):
        data = bytearray(encode_grib2(np.ones((2, 2)), 0, 0, 1, 1))
        data[7] = 3  # edition byte
        with pytest.raises(ValueError, match="edition 3"):
            decode_grib(bytes(data))

    def test_zero_length_section_is_loud_not_a_hang(self):
        # a zero section length must raise, not spin the section walk
        # forever (sp += 0)
        data = bytearray(encode_grib2(np.ones((2, 2)), 0, 0, 1, 1))
        struct.pack_into(">I", data, 16, 0)  # first section's length
        with pytest.raises(ValueError, match="section"):
            decode_grib(bytes(data))


class TestGRIB1:
    def test_hand_assembled_spec_golden(self):
        """A GRIB edition-1 message assembled byte-by-byte from the WMO
        FM 92-VIII tables, independent of encode_grib1: 3x2 grid,
        simple packing, nbits=8, IBM-float R=100 (0x42640000), E=1,
        D=0 -> Y = 100 + 2*X; Di/Dj = 0xFFFF ("increments not given",
        derived from the corner coordinates)."""
        pds = bytearray(28)
        pds[0:3] = (28).to_bytes(3, "big")
        pds[3:7] = bytes([2, 7, 0, 255])
        pds[7] = 0x80                       # GDS present, no BMS
        pds[8:12] = bytes([11, 1, 0, 0])    # param, level
        pds[12:17] = bytes([26, 8, 19, 0, 0])
        gds = bytearray(32)
        gds[0:3] = (32).to_bytes(3, "big")
        gds[3:6] = bytes([0, 255, 0])
        gds[6:8] = struct.pack(">H", 3)     # Ni
        gds[8:10] = struct.pack(">H", 2)    # Nj
        gds[10:13] = (60_000).to_bytes(3, "big")   # La1 = 60N
        gds[13:16] = (10_000).to_bytes(3, "big")   # Lo1 = 10E
        gds[16] = 0
        gds[17:20] = (59_000).to_bytes(3, "big")   # La2
        gds[20:23] = (12_000).to_bytes(3, "big")   # Lo2
        gds[23:27] = b"\xff\xff\xff\xff"    # increments not given
        gds[27] = 0
        payload = bytes([0, 1, 2, 3, 4, 5])
        bds = ((18).to_bytes(3, "big") + bytes([8])   # 8 unused bits
               + struct.pack(">H", 1)                 # E = 1
               + b"\x42\x64\x00\x00"                  # R = 100.0 (IBM)
               + bytes([8]) + payload + b"\x00")
        body = bytes(pds) + bytes(gds) + bds
        msg = (b"GRIB" + (8 + len(body) + 4).to_bytes(3, "big")
               + b"\x01" + body + b"7777")

        from dl_image_segmentation_tpu.raster.grib import is_grib
        assert is_grib(msg)
        g = decode_grib(msg)
        assert g.array.shape == (2, 3, 1)
        np.testing.assert_array_equal(
            g.array[:, :, 0],
            100.0 + 2.0 * np.arange(6, dtype=np.float32).reshape(2, 3))
        assert g.info.epsg == 4326
        assert g.info.geotransform == pytest.approx(
            (9.5, 1.0, 0.0, 60.5, 0.0, -1.0))

    def test_ibm_float_codec(self):
        from dl_image_segmentation_tpu.raster.grib import (_ibm_encode,
                                                           _ibm_float)
        # published example: -118.625 = 0xC276A000
        assert _ibm_encode(-118.625) == b"\xc2\x76\xa0\x00"
        assert _ibm_float(b"\xc2\x76\xa0\x00") == -118.625
        for v in (0.0, 1.0, -1.0, 0.5, 100.0, 273.15, 1e-5, 987654.0):
            # hex normalization leaves as few as 21 mantissa bits
            assert _ibm_float(_ibm_encode(v)) == pytest.approx(
                v, rel=2 ** -21, abs=1e-12)

    def test_roundtrip_and_bitmap(self):
        from dl_image_segmentation_tpu.raster.grib import encode_grib1
        rng = np.random.default_rng(8)
        field = np.round(rng.uniform(250, 310, (5, 8)), 1)
        data = encode_grib1(field, 50.0, 8.0, 0.25, 0.25, nbits=16,
                            dec_scale=1)
        g = decode_grib(data)
        np.testing.assert_allclose(g.array[:, :, 0], field, atol=0.051)
        assert g.info.geotransform == pytest.approx(
            (7.875, 0.25, 0.0, 50.125, 0.0, -0.25))
        mask = np.ones((5, 8), bool)
        mask[0, 0] = mask[4, 7] = False
        d2 = encode_grib1(field, 50.0, 8.0, 0.25, 0.25, nbits=16,
                          dec_scale=1, mask=mask)
        g2 = decode_grib(d2)
        assert np.isnan(g2.array[0, 0, 0]) and np.isnan(g2.array[4, 7, 0])
        np.testing.assert_allclose(g2.array[:, :, 0][mask], field[mask],
                                   atol=0.051)
        # multi-message: two GRIB1 fields stack into two bands
        g3 = decode_grib(data + d2)
        assert g3.array.shape == (5, 8, 2)
        assert sniff_grib_info(data + d2).count == 2

    def test_unsupported_layouts_loud(self):
        from dl_image_segmentation_tpu.raster.grib import encode_grib1
        base = bytearray(encode_grib1(np.ones((2, 2)), 0, 0, 1, 1))
        gds_grid_type = 8 + 28 + 5
        bad = bytearray(base)
        bad[gds_grid_type] = 5  # polar stereographic
        with pytest.raises(ValueError, match="grid type 5"):
            decode_grib(bytes(bad))
        bad = bytearray(base)
        bad[8 + 28 + 32 + 3] |= 0x40  # complex packing flag
        with pytest.raises(ValueError, match="complex"):
            decode_grib(bytes(bad))
        bad = bytearray(base)
        struct.pack_into(">H", bad, 8 + 28 + 6, 0xFFFF)  # thinned Ni
        with pytest.raises(ValueError, match="thinned"):
            decode_grib(bytes(bad))

    def test_zero_length_message_is_loud_not_a_hang(self):
        # a second message whose 3-byte total length is 0 would re-read
        # the same bytes forever (and its terminator check would
        # false-match the FIRST message's 7777); must raise instead
        from dl_image_segmentation_tpu.raster.grib import encode_grib1
        good = encode_grib1(np.ones((2, 2)), 0, 0, 1, 1)
        bad = bytearray(good + good)
        bad[len(good) + 4:len(good) + 7] = (0).to_bytes(3, "big")
        with pytest.raises(ValueError, match="corrupt GRIB1"):
            decode_grib(bytes(bad))


class TestHDF4:
    def _mk(self, **kw):
        from dl_image_segmentation_tpu.raster.hdf4 import encode_hdf4
        rng = np.random.default_rng(12)
        img = rng.integers(-2000, 16000, (3, 7, 9)).astype(np.int16)
        return img, encode_hdf4({"sur_refl": img}, **kw)

    @pytest.mark.parametrize("storage", ["plain", "deflate", "chunked"])
    def test_storage_roundtrip(self, storage):
        from dl_image_segmentation_tpu.raster.hdf4 import (
            decode_hdf4, hdf4_variables, sniff_hdf4_info)
        img, data = self._mk(storage=storage)
        g = decode_hdf4(data)
        # (3, 7, 9) -> bands-last (7, 9, 3)
        np.testing.assert_array_equal(
            g.array, img.transpose(1, 2, 0))
        assert g.array.dtype == np.int16
        assert hdf4_variables(data) == {"sur_refl": (3, 7, 9)}
        si = sniff_hdf4_info(data)
        assert (si.width, si.height, si.count) == (9, 7, 3)

    def test_chunked_edge_chunks_and_dtype(self):
        """Chunk grid not dividing the shape: edge chunks crop; a
        float64 SDS keeps its values bit-exact through deflate."""
        from dl_image_segmentation_tpu.raster.hdf4 import (decode_hdf4,
                                                           encode_hdf4)
        rng = np.random.default_rng(13)
        img = rng.standard_normal((11, 13))
        data = encode_hdf4({"f": img}, storage="chunked", chunk=(4, 5))
        np.testing.assert_array_equal(
            decode_hdf4(data).array[:, :, 0], img)

    def test_fill_value_and_selection(self):
        from dl_image_segmentation_tpu.raster.hdf4 import (
            decode_hdf4, encode_hdf4)
        small = np.ones((2, 2), np.uint8)
        big = np.full((8, 8), 7, np.uint16)
        data = encode_hdf4({"small": small, "big": big},
                           fill_value=65535.0)
        g = decode_hdf4(data)            # biggest wins by default
        assert (g.array[:, :, 0] == 7).all()
        assert g.info.nodata == 65535.0
        g2 = decode_hdf4(data, variable="small")
        assert g2.array.shape == (2, 2, 1)
        with pytest.raises(ValueError, match="not found"):
            decode_hdf4(data, variable="nope")

    def test_hand_assembled_spec_golden(self):
        """An HDF4 file assembled byte-by-byte from the HDF 4.2 spec
        (magic, one DD block, NT/SDD/SD/NDG), independent of
        encode_hdf4: a 2x3 big-endian int16 SDS."""
        vals = np.arange(6, dtype=">i2").reshape(2, 3)
        nt = bytes([1, 22, 16, 0])                     # ver, INT16, 16b
        sdd = (struct.pack(">H", 2) + struct.pack(">ii", 2, 3)
               + struct.pack(">HH", 106, 2) * 3)       # data + 2 scales
        sd = vals.tobytes()
        ndg = struct.pack(">HHHH", 701, 3, 702, 4)
        payloads = [(106, 2, nt), (701, 3, sdd), (702, 4, sd),
                    (720, 5, ndg)]
        header = 4 + 6 + 12 * len(payloads)
        out = bytearray(b"\x0e\x03\x13\x01")
        out += struct.pack(">hi", len(payloads), 0)
        pos = header
        for tag, ref, body in payloads:
            out += struct.pack(">HHii", tag, ref, pos, len(body))
            pos += len(body)
        for _, _, body in payloads:
            out += body

        from dl_image_segmentation_tpu.raster.hdf4 import (decode_hdf4,
                                                           is_hdf4)
        assert is_hdf4(bytes(out))
        g = decode_hdf4(bytes(out))
        np.testing.assert_array_equal(g.array[:, :, 0], vals)
        assert g.array.dtype == np.int16

    def test_unsupported_named_loudly(self):
        from dl_image_segmentation_tpu.raster.hdf4 import decode_hdf4
        img, data = self._mk(storage="deflate")
        raw = bytearray(data)
        # find the extended SD element and patch the comp-type field
        # inside its special header
        from dl_image_segmentation_tpu.raster.hdf4 import _dd_list, _SD
        dds = _dd_list(bytes(raw))
        off, ln = dds[(_SD | 0x4000, next(
            ref for (tag, ref) in dds if tag == (_SD | 0x4000)))]
        struct.pack_into(">H", raw, off + 12, 9)       # comp type 9
        with pytest.raises(ValueError, match="compression type 9"):
            decode_hdf4(bytes(raw))


class TestENVI:
    def test_interleaves_roundtrip(self):
        from dl_image_segmentation_tpu.raster.envi import (decode_envi,
                                                           encode_envi)
        rng = np.random.default_rng(5)
        arr = rng.integers(0, 4000, (5, 7, 3)).astype(np.uint16)
        gt = (500000.0, 10.0, 0.0, 2100000.0, 0.0, -10.0)
        for il in ("bsq", "bil", "bip"):
            for bo in (0, 1):
                hdr, data = encode_envi(arr, interleave=il,
                                        geotransform=gt, epsg=32643,
                                        nodata=0.0, byte_order=bo)
                g = decode_envi(hdr, data=data)
                np.testing.assert_array_equal(g.array, arr)
                assert g.info.geotransform == pytest.approx(gt)
                assert g.info.epsg == 32643
                assert g.info.nodata == 0.0
                assert g.array.dtype == np.uint16

    def test_hand_written_header_golden(self):
        """A header typed out by hand (independent of encode_envi):
        southern-hemisphere UTM, ref pixel not at (1,1), multi-line
        description, header offset."""
        from dl_image_segmentation_tpu.raster.envi import (
            decode_envi, sniff_envi_info, is_envi_header)
        hdr = (b"ENVI\n"
               b"description = {\n  two-line\n  description }\n"
               b"samples = 4\nlines = 3\nbands   = 1\n"
               b"header offset = 7\nfile type = ENVI Standard\n"
               b"data type = 4\ninterleave = bsq\nbyte order = 0\n"
               b"map info = {UTM, 3.0, 2.0, 500020.0, 8999990.0, "
               b"10.0, 10.0, 43, South, WGS-84, units=Meters}\n")
        assert is_envi_header(hdr)
        si = sniff_envi_info(hdr)
        assert (si.width, si.height, si.count) == (4, 3, 1)
        assert si.dtype == "float32" and si.epsg == 32743
        # ref pixel (3,2) at (500020, 8999990) -> corner (500000, 9e6)
        assert si.geotransform == pytest.approx(
            (500000.0, 10.0, 0.0, 9000000.0, 0.0, -10.0))
        vals = np.arange(12, dtype="<f4")
        g = decode_envi(hdr, data=b"PADDING" + vals.tobytes())
        np.testing.assert_array_equal(g.array[:, :, 0],
                                      vals.reshape(3, 4))

    def test_wkt_epsg_fallback_and_geographic(self):
        from dl_image_segmentation_tpu.raster.envi import sniff_envi_info
        hdr = (b"ENVI\nsamples = 2\nlines = 2\ndata type = 1\n"
               b'coordinate system string = {PROJCS["WGS 84 / UTM 31N",'
               b'GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]],'
               b'AUTHORITY["EPSG","32631"]]}\n')
        assert sniff_envi_info(hdr).epsg == 32631
        geo = (b"ENVI\nsamples = 2\nlines = 2\ndata type = 2\n"
               b"map info = {Geographic Lat/Lon, 1, 1, 8.0, 50.0, "
               b"0.5, 0.5, WGS-84}\n")
        si = sniff_envi_info(geo)
        assert si.epsg == 4326 and si.dtype == "int16"

    def test_sibling_data_file_resolution(self, tmp_path):
        from dl_image_segmentation_tpu.raster.envi import encode_envi
        from dl_image_segmentation_tpu.raster.image import (
            decode_image_bytes, sniff_image_info)
        arr = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
        hdr, data = encode_envi(arr, interleave="bil")
        # foo.hdr -> foo.img, and foo.img.hdr -> foo.img
        for hname, dname in [("a.hdr", "a.img"), ("b.img.hdr", "b.img"),
                             ("c.hdr", "c.dat")]:
            (tmp_path / hname).write_bytes(hdr)
            (tmp_path / dname).write_bytes(data)
            g = decode_image_bytes(hdr, base_dir=str(tmp_path),
                                   origin=hname)
            np.testing.assert_array_equal(g.array, arr)
        si = sniff_image_info(hdr)   # dispatch, header-only
        assert (si.width, si.height) == (6, 4)

    def test_loud_failures(self, tmp_path):
        from dl_image_segmentation_tpu.raster.envi import (decode_envi,
                                                           encode_envi)
        hdr, data = encode_envi(np.zeros((2, 2), np.uint8))
        with pytest.raises(ValueError, match="not found"):
            decode_envi(hdr, base_dir=str(tmp_path), origin="x.hdr")
        with pytest.raises(ValueError, match="too short"):
            decode_envi(hdr, data=data[:-1])
        bad = hdr.replace(b"data type = 1", b"data type = 6")
        with pytest.raises(ValueError, match="data type 6"):
            decode_envi(bad, data=data)
        bad = hdr.replace(b"interleave = bsq", b"interleave = foo")
        with pytest.raises(ValueError, match="interleave"):
            decode_envi(bad, data=data)

    def test_chips_to_tfrecords(self, tmp_path):
        """An ENVI chip folder flows through the MP engine
        (file_ext='hdr') into FloatList records that parse back —
        closing the reference's any-GDAL-format loop
        (_img_to_tf_mp.py:45-53) for ENVI."""
        from dl_image_segmentation_tpu import (
            images_to_tfrecords_mp, parse_higher_dtype_array_proto)
        from dl_image_segmentation_tpu.records.tfrecord import read_records
        from dl_image_segmentation_tpu.raster.envi import encode_envi

        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.default_rng(6)
        gt = (500000.0, 10.0, 0.0, 2100000.0, 0.0, -10.0)
        truth = {}
        for i in range(3):
            img = rng.integers(0, 4000, (6, 5, 4)).astype(np.int16)
            lbl = rng.integers(0, 3, (6, 5, 1)).astype(np.uint8)
            name = f"chip{i}"
            for sub, a in (("images", img), ("labels", lbl)):
                hdr, data = encode_envi(a, interleave="bsq",
                                        geotransform=gt, epsg=32643)
                (root / sub / f"{name}.hdr").write_bytes(hdr)
                (root / sub / f"{name}.img").write_bytes(data)
            truth[f"{name}.hdr"] = (img, lbl)
        n = images_to_tfrecords_mp(
            "envi", str(root), str(tmp_path / "recs"), num_shards=2,
            num_proc=2, dltile_from_filename=False, file_ext="hdr",
            store_as_array=True)
        assert n == 3
        seen = 0
        for shard in sorted((tmp_path / "recs").iterdir()):
            for rec in read_records(str(shard)):
                img, lbl, ident = parse_higher_dtype_array_proto(rec)
                name = str(ident if isinstance(ident, str)
                           else ident.decode()).split("|")[0]
                eimg, elbl = truth[name]
                np.testing.assert_array_equal(
                    np.asarray(img).reshape(6, 5, 4), eimg)
                np.testing.assert_array_equal(
                    np.asarray(lbl).reshape(6, 5), elbl[:, :, 0])
                seen += 1
        assert seen == 3


class TestVRT:
    def _parts(self, tmp_path):
        left = (np.arange(16, dtype=np.uint16).reshape(4, 4, 1) + 1)
        right = left + 100
        gt_l = (500000.0, 10.0, 0.0, 4000000.0, 0.0, -10.0)
        write_geotiff(str(tmp_path / "left.tif"), left,
                      geotransform=gt_l, epsg=32632)
        write_geotiff(str(tmp_path / "right.tif"), right,
                      geotransform=(500040.0,) + gt_l[1:], epsg=32632)
        return left, right

    def test_mosaic_relative_sources(self, tmp_path):
        left, right = self._parts(tmp_path)
        xml = """<VRTDataset rasterXSize="8" rasterYSize="4">
          <SRS>EPSG:32632</SRS>
          <GeoTransform>500000, 10, 0, 4000000, 0, -10</GeoTransform>
          <VRTRasterBand dataType="UInt16" band="1">
            <NoDataValue>0</NoDataValue>
            <SimpleSource>
              <SourceFilename relativeToVRT="1">left.tif</SourceFilename>
              <SourceBand>1</SourceBand>
              <DstRect xOff="0" yOff="0" xSize="4" ySize="4"/>
            </SimpleSource>
            <SimpleSource>
              <SourceFilename relativeToVRT="1">right.tif</SourceFilename>
              <DstRect xOff="4" yOff="0" xSize="4" ySize="4"/>
            </SimpleSource>
          </VRTRasterBand>
        </VRTDataset>"""
        data = xml.encode()
        assert is_vrt(data)
        g = decode_vrt(data, base_dir=str(tmp_path))
        assert g.array.shape == (4, 8, 1) and g.array.dtype == np.uint16
        np.testing.assert_array_equal(g.array[:, :4, 0], left[:, :, 0])
        np.testing.assert_array_equal(g.array[:, 4:, 0], right[:, :, 0])
        assert g.info.epsg == 32632
        assert g.info.geotransform == (500000.0, 10.0, 0.0,
                                       4000000.0, 0.0, -10.0)
        si = sniff_vrt_info(data)
        assert (si.width, si.height, si.count) == (8, 4, 1)
        assert si.nodata == 0.0

    def test_complex_source_scale_and_window(self, tmp_path):
        left, _ = self._parts(tmp_path)
        xml = f"""<?xml version="1.0"?>
        <VRTDataset rasterXSize="4" rasterYSize="4">
          <VRTRasterBand dataType="Float32" band="1">
            <ComplexSource>
              <SourceFilename relativeToVRT="0">{tmp_path}/left.tif</SourceFilename>
              <SrcRect xOff="0" yOff="0" xSize="2" ySize="2"/>
              <DstRect xOff="0" yOff="0" xSize="4" ySize="4"/>
              <ScaleRatio>2</ScaleRatio>
              <ScaleOffset>0.5</ScaleOffset>
            </ComplexSource>
          </VRTRasterBand>
        </VRTDataset>"""
        g = decode_vrt(xml.encode())
        assert g.array.dtype == np.float32
        # 2x2 window nearest-upsampled to 4x4, then scaled
        expect = np.repeat(np.repeat(
            left[:2, :2, 0].astype(np.float64), 2, 0), 2, 1) * 2 + 0.5
        np.testing.assert_allclose(g.array[:, :, 0], expect)

    def test_complex_source_nodata_masks_source_values(self, tmp_path):
        """NODATA applies to SOURCE values BEFORE ScaleRatio/Offset
        (GDAL's ComplexSource semantics): a nodata source pixel stays
        at the band NoDataValue even though its scaled value differs,
        and a valid pixel that scales TO the nodata value survives."""
        left, _ = self._parts(tmp_path)  # values 1..16 uint16
        xml = f"""<VRTDataset rasterXSize="4" rasterYSize="4">
          <VRTRasterBand dataType="Float32" band="1">
            <NoDataValue>0</NoDataValue>
            <ComplexSource>
              <SourceFilename>{tmp_path}/left.tif</SourceFilename>
              <NODATA>6</NODATA>
              <ScaleRatio>2</ScaleRatio>
              <ScaleOffset>-2</ScaleOffset>
            </ComplexSource>
          </VRTRasterBand>
        </VRTDataset>"""
        g = decode_vrt(xml.encode())
        src = left[:, :, 0].astype(np.float64)
        expect = src * 2 - 2          # source 4 scales to 6: kept
        expect[src == 6] = 0.0        # source 6 is nodata: masked
        np.testing.assert_array_equal(g.array[:, :, 0], expect)

    def test_unsupported_features_loud(self, tmp_path):
        warped = b'<VRTDataset rasterXSize="2" rasterYSize="2" ' \
                 b'subClass="VRTWarpedDataset"></VRTDataset>'
        with pytest.raises(ValueError, match="subClass"):
            decode_vrt(warped)
        rel_no_base = b"""<VRTDataset rasterXSize="2" rasterYSize="2">
          <VRTRasterBand dataType="Byte" band="1"><SimpleSource>
            <SourceFilename relativeToVRT="1">p.tif</SourceFilename>
          </SimpleSource></VRTRasterBand></VRTDataset>"""
        with pytest.raises(ValueError, match="base"):
            decode_vrt(rel_no_base)


class TestDispatchAndPipeline:
    def test_universal_dispatch(self, tmp_path):
        """decode_image_bytes / sniff_image_info route all the new
        containers; a truly unknown blob stays a loud
        UnsupportedFormatError."""
        def build(f):
            f.createDimension("y", 2)
            f.createDimension("x", 2)
            v = f.createVariable("v", "b", ("y", "x"))
            v[:] = np.ones((2, 2), np.int8)

        nc = _scipy_nc(build)
        assert decode_image_bytes(nc).array.shape == (2, 2, 1)
        assert sniff_image_info(nc).count == 1

        import h5py
        buf = io.BytesIO()
        with h5py.File(buf, "w") as f:
            f.create_dataset("d", data=np.zeros((2, 3), np.float32))
        h5 = buf.getvalue()
        assert decode_image_bytes(h5).array.shape == (2, 3, 1)
        assert sniff_image_info(h5).width == 3

        gb = encode_grib2(np.ones((2, 2)), 0.0, 0.0, 1.0, 1.0)
        assert decode_image_bytes(gb).array.shape == (2, 2, 1)
        assert sniff_image_info(gb).epsg == 4326

        write_geotiff(str(tmp_path / "p.tif"),
                      np.ones((2, 2, 1), np.uint8))
        vrt = (b'<VRTDataset rasterXSize="2" rasterYSize="2">'
               b'<VRTRasterBand dataType="Byte" band="1"><SimpleSource>'
               b'<SourceFilename relativeToVRT="1">p.tif'
               b'</SourceFilename></SimpleSource></VRTRasterBand>'
               b'</VRTDataset>')
        g = decode_image_bytes(vrt, base_dir=str(tmp_path))
        assert g.array.shape == (2, 2, 1)
        assert sniff_image_info(vrt).width == 2

        from dl_image_segmentation_tpu.raster.hdf4 import encode_hdf4
        h4 = encode_hdf4(
            {"v": np.arange(6, dtype=np.int16).reshape(2, 3)})
        assert decode_image_bytes(h4).array.shape == (2, 3, 1)
        assert sniff_image_info(h4).width == 3

        with pytest.raises(UnsupportedFormatError, match="unknown"):
            decode_image_bytes(b"\x00\x11\x22\x33" + bytes(64))

    def test_netcdf_chips_to_tfrecords(self, tmp_path):
        """End-to-end: a .nc chip folder flows through the MP engine
        (file_ext='nc') into FloatList records that parse back, with
        the name|gt|crs identifier built from CF georeferencing —
        closing the reference's any-GDAL-format loop
        (_img_to_tf_mp.py:45-53) for NetCDF."""
        from dl_image_segmentation_tpu import (
            images_to_tfrecords_mp, parse_higher_dtype_array_proto)
        from dl_image_segmentation_tpu.records.tfrecord import read_records

        root = tmp_path / "chips"
        (root / "images").mkdir(parents=True)
        (root / "labels").mkdir()
        rng = np.random.default_rng(3)
        truth = {}
        for i in range(3):
            img = rng.integers(0, 4000, (2, 6, 5)).astype(np.int16)
            lbl = rng.integers(0, 3, (6, 5)).astype(np.int8)

            def build_img(f, img=img):
                f.createDimension("band", 2)
                f.createDimension("y", 6)
                f.createDimension("x", 5)
                vy = f.createVariable("y", "d", ("y",))
                vy[:] = 50.0 - 0.1 * np.arange(6)
                vy.units = b"degrees_north"
                vx = f.createVariable("x", "d", ("x",))
                vx[:] = 8.0 + 0.1 * np.arange(5)
                vx.units = b"degrees_east"
                v = f.createVariable("refl", "h", ("band", "y", "x"))
                v[:] = img

            def build_lbl(f, lbl=lbl):
                # labels share the image's grid so the name|gt|crs
                # identifiers pair up (writer asserts ikey == lkey)
                f.createDimension("y", 6)
                f.createDimension("x", 5)
                vy = f.createVariable("y", "d", ("y",))
                vy[:] = 50.0 - 0.1 * np.arange(6)
                vy.units = b"degrees_north"
                vx = f.createVariable("x", "d", ("x",))
                vx[:] = 8.0 + 0.1 * np.arange(5)
                vx.units = b"degrees_east"
                v = f.createVariable("label", "b", ("y", "x"))
                v[:] = lbl

            (root / "images" / f"chip{i}.nc").write_bytes(
                _scipy_nc(build_img))
            (root / "labels" / f"chip{i}.nc").write_bytes(
                _scipy_nc(build_lbl))
            truth[f"chip{i}.nc"] = (img, lbl)

        out = tmp_path / "recs"
        n = images_to_tfrecords_mp(
            "nc", str(root), str(out), num_shards=1, num_proc=1,
            dltile_from_filename=False, file_ext="nc",
            store_as_array=True)
        assert n == 3
        seen = 0
        for rec in read_records(str(out / "nc-00000-of-00001")):
            img_a, lbl_a, ident = parse_higher_dtype_array_proto(rec)
            name, gt, crs = ident.decode().split("|")
            assert crs == "EPSG:4326"
            assert abs(eval(gt)[1] - 0.1) < 1e-9
            img, lbl = truth[name]
            np.testing.assert_array_equal(
                img_a, img.transpose(1, 2, 0).astype(np.float32))
            np.testing.assert_array_equal(
                lbl_a, lbl.astype(np.float32))
            seen += 1
        assert seen == 3
