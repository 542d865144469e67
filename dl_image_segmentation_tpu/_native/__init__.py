"""Native extension loader: builds fastcodec.cc on first import (g++,
-O3 -march=native) and exposes it through ctypes.

All entry points degrade gracefully: if the toolchain is unavailable
the pure-Python fallbacks in records/crc32c.py and raster/lzw.py are
used instead (same outputs, validated against each other in
tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastcodec.cc")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()
_build_failed = False

# fd-write functions return this when a partial frame write could not
# be rolled back (shard must be aborted -- see fastcodec.cc)
_FD_CORRUPT = (1 << 64) - 1


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"fastcodec-{digest}.so")


def _build(so: str) -> bool:
    # pid-unique temp: concurrent first-use builds from several
    # processes each link their own file and atomically replace --
    # a shared tmp name would interleave linker writes and could
    # promote a corrupt .so that poisons every later run
    tmp = f"{so}.{os.getpid()}.tmp"
    # -ldl: fc_png_decode dlopens libdeflate at load time (no hard
    # dependency; explicit -ldl for pre-2.34 glibc where dlopen is not
    # in libc)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", tmp, _SRC, "-ldl"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
        # drop builds of previous source revisions (hash-named, so
        # they accumulate unboundedly across edits otherwise)
        for old in os.listdir(_DIR):
            if (old.startswith("fastcodec-") and old.endswith(".so")
                    and os.path.join(_DIR, old) != so):
                try:
                    os.unlink(os.path.join(_DIR, old))
                except OSError:
                    pass
        return True
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        # another process may have finished the build meanwhile
        return os.path.exists(so)


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _so_path()
        if not os.path.exists(so) and not _build(so):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            _build_failed = True
            return None
        lib.fc_crc32c.restype = ctypes.c_uint32
        lib.fc_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                  ctypes.c_uint32]
        lib.fc_masked_crc32c.restype = ctypes.c_uint32
        lib.fc_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_tfrecord_frame.restype = ctypes.c_uint64
        lib.fc_tfrecord_frame.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                          ctypes.c_char_p]
        lib.fc_encode_example_framed.restype = ctypes.c_uint64
        lib.fc_encode_example_framed.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_encode_pair_from_files.restype = ctypes.c_uint64
        lib.fc_encode_pair_from_files.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_write_shard.restype = ctypes.c_uint64
        lib.fc_write_shard.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p]
        lib.fc_tiff_decode_f32.restype = ctypes.c_uint64
        lib.fc_tiff_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_write_shard_tifarr.restype = ctypes.c_uint64
        lib.fc_write_shard_tifarr.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p]
        lib.fc_png_decode.restype = ctypes.c_uint64
        lib.fc_png_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64,
            ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_lzw_encode.restype = ctypes.c_uint64
        lib.fc_lzw_encode.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_char_p, ctypes.c_uint64]
        lib.fc_lzw_decode.restype = ctypes.c_uint64
        lib.fc_lzw_decode.argtypes = [ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_char_p, ctypes.c_uint64,
                                      ctypes.c_uint64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# -- typed wrappers ----------------------------------------------------------

def crc32c(data: bytes, initial: int = 0) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return lib.fc_crc32c(data, len(data), initial)


def masked_crc32c(data: bytes) -> Optional[int]:
    lib = get_lib()
    if lib is None:
        return None
    return lib.fc_masked_crc32c(data, len(data))


def tfrecord_frame(payload: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(len(payload) + 16)
    n = lib.fc_tfrecord_frame(payload, len(payload), out)
    return out.raw[:n]


_framed_buf = threading.local()


def encode_example_framed_view(img: bytes, img_is_bytes: bool,
                               tgt: bytes, tgt_is_bytes: bool,
                               ih: int, iw: int, ic: int, th: int, tw: int,
                               ident: bytes):
    """Zero-copy variant: returns a memoryview into a thread-local
    buffer, valid only until the next call on the same thread (write it
    to a file immediately). None when the extension is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    need = len(img) + len(tgt) + len(ident) + 512
    buf = getattr(_framed_buf, "buf", None)
    if buf is None or len(buf) < need:
        buf = bytearray(max(need, 1 << 20))
        _framed_buf.buf = buf
    cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
    n = lib.fc_encode_example_framed(
        img, len(img), int(img_is_bytes),
        tgt, len(tgt), int(tgt_is_bytes),
        ih, iw, ic, th, tw, ident, len(ident),
        cbuf, len(buf))
    del cbuf
    if n == 0:
        return None
    return memoryview(buf)[:n]


def encode_pair_from_files(img_path: str, lbl_path: str, ident: bytes):
    """Fully-native raw-bytes pair path: file reads land directly in
    the framed output buffer. Returns a memoryview valid until the next
    call on this thread, or None on any failure (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        need = (os.path.getsize(img_path) + os.path.getsize(lbl_path)
                + len(ident) + 512)
    except OSError:
        return None
    buf = getattr(_framed_buf, "buf", None)
    if buf is None or len(buf) < need:
        buf = bytearray(max(need, 1 << 20))
        _framed_buf.buf = buf
    cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
    n = lib.fc_encode_pair_from_files(
        img_path.encode(), lbl_path.encode(), ident, len(ident),
        cbuf, len(buf))
    del cbuf
    if n == 0:
        return None
    return memoryview(buf)[:n]


def _write_shard_common(fn, img_paths, lbl_paths, idents, fd: int,
                        scratch_bytes: int):
    n = len(img_paths)
    ArrP = ctypes.c_char_p * n
    imgs = ArrP(*[p.encode() for p in img_paths])
    lbls = ArrP(*[p.encode() for p in lbl_paths])
    ids = ArrP(*idents)
    lens = (ctypes.c_uint64 * n)(*[len(i) for i in idents])
    buf = getattr(_framed_buf, "buf", None)
    if buf is None or len(buf) < scratch_bytes:
        buf = bytearray(scratch_bytes)
        _framed_buf.buf = buf
    cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
    failed = ctypes.create_string_buffer(n)
    written = fn(imgs, lbls, ids, lens, n, fd, cbuf, len(buf), failed)
    del cbuf
    if written == _FD_CORRUPT:
        raise IOError(
            "native shard write failed and the fd could not be rolled "
            "back; shard must be aborted (torn frame would corrupt it)")
    failed_idx = [i for i in range(n) if failed.raw[i]]
    return int(written), failed_idx


def write_shard(img_paths, lbl_paths, idents, fd: int,
                scratch_bytes: int = 32 << 20):
    """Write a whole raw-bytes shard natively. Returns (written,
    failed_indices) or None when the extension is unavailable. Pairs
    too large for the scratch buffer are reported failed (caller's
    Python path handles them)."""
    lib = get_lib()
    if lib is None:
        return None
    return _write_shard_common(lib.fc_write_shard, img_paths, lbl_paths,
                               idents, fd, scratch_bytes)


def write_shard_tifarr(img_paths, lbl_paths, idents, fd: int,
                       scratch_bytes: int = 48 << 20):
    """Write a whole decoded-array GeoTIFF shard natively: TIFF parse +
    LZW decode + predictor undo + dtype conversion land directly in
    each framed Example's payload (no raster materialisation). Returns
    (written, failed_indices) or None when unavailable; unsupported or
    oversized containers are reported failed (Python path handles
    them)."""
    lib = get_lib()
    if lib is None:
        return None
    filebuf = getattr(_tiff_buf, "filebuf", None)
    if filebuf is None:
        filebuf = bytearray(64 << 20)
        _tiff_buf.filebuf = filebuf
    chunk = getattr(_tiff_buf, "chunk", None)
    if chunk is None:
        chunk = bytearray(16 << 20)
        _tiff_buf.chunk = chunk
    cfile = (ctypes.c_char * len(filebuf)).from_buffer(filebuf)
    cchunk = (ctypes.c_char * len(chunk)).from_buffer(chunk)

    def fn(imgs, lbls, ids, lens, n, fd_, cbuf, cap, failed):
        return lib.fc_write_shard_tifarr(imgs, lbls, ids, lens, n, fd_,
                                         cbuf, cap, cfile, len(filebuf),
                                         cchunk, len(chunk), failed)

    try:
        return _write_shard_common(fn, img_paths, lbl_paths, idents, fd,
                                   scratch_bytes)
    finally:
        del cfile, cchunk


_tiff_buf = threading.local()


def tiff_decode_f32(data: bytes):
    """Decode a chip-contract TIFF straight to a float32 (h, w, c)
    array in C++ (LZW + predictor + conversion in one pass). Returns
    None when the extension is unavailable or the container is outside
    the supported subset (caller falls back to the Python codec)."""
    import numpy as np
    lib = get_lib()
    if lib is None:
        return None
    # exact output size from the container header (a heuristic based
    # on the compressed length starved the buffer for highly
    # compressible chips, silently losing the native path)
    try:
        from ..raster.geotiff import decode_geotiff_info
        info = decode_geotiff_info(data)
        cap = info.height * info.width * info.count * 4
    except Exception:
        return None
    buf = getattr(_tiff_buf, "buf", None)
    if buf is None or len(buf) < cap:
        buf = bytearray(max(cap, 1 << 22))
        _tiff_buf.buf = buf
    chunk = getattr(_tiff_buf, "chunk", None)
    if chunk is None:
        chunk = bytearray(16 << 20)
        _tiff_buf.chunk = chunk
    cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
    cchunk = (ctypes.c_char * len(chunk)).from_buffer(chunk)
    r = lib.fc_tiff_decode_f32(data, len(data), cbuf, len(buf),
                               cchunk, len(chunk))
    del cbuf, cchunk
    if r == 0:
        return None
    h = int(r >> 32)
    w = int((r >> 16) & 0xFFFF)
    c = int(r & 0xFFFF)
    out = np.frombuffer(buf, dtype="<f4", count=h * w * c).reshape(
        h, w, c).copy()
    return out


_png_buf = threading.local()


def png_decode(data: bytes):
    """Decode an 8-bit non-interlaced grey/RGB PNG to an (H, W, C)
    uint8 array via libdeflate (inflate is the bottleneck of the
    training-feed PNG lane; libdeflate runs it 2-3x faster than
    PIL's zlib). Returns None when the extension or libdeflate is
    unavailable or the container is outside the supported subset
    (palette/alpha/16-bit/interlaced, >32 MiB of pixels) -- callers
    fall back to PIL. Critical-chunk CRCs are validated in C (PIL
    rejects CRC-damaged containers; the fast path must match)."""
    import numpy as np
    lib = get_lib()
    if lib is None or len(data) < 33:
        return None
    # header parse through the validated sniffer (checks the IHDR tag
    # and maps every colour type to its true band count) -- the C side
    # re-validates depth/colour/interlace before touching pixels
    try:
        from ..raster.image import sniff_image_info
        info = sniff_image_info(data)
    except Exception:
        return None
    if info.dtype != "uint8":
        return None
    h, w, c = info.height, info.width, info.count
    need = h * w * c
    # cap the native path at 32 MiB of pixels (~3300^2 RGB; chips are
    # <=2048^2): a crafted 100-byte header claiming huge dims must not
    # size the thread-retained buffers, and past the cap PIL's
    # decompression-bomb guard takes over on the fallback path
    if need == 0 or need > 1 << 25:
        return None
    scratch_need = len(data) + h * (w * c + 1) + 64
    buf = getattr(_png_buf, "buf", None)
    if buf is None or len(buf) < need:
        buf = bytearray(max(need, 1 << 20))
        _png_buf.buf = buf
    scratch = getattr(_png_buf, "scratch", None)
    if scratch is None or len(scratch) < scratch_need:
        scratch = bytearray(max(scratch_need, 1 << 20))
        _png_buf.scratch = scratch
    cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
    cscr = (ctypes.c_char * len(scratch)).from_buffer(scratch)
    r = lib.fc_png_decode(data, len(data), cbuf, len(buf),
                          cscr, len(scratch))
    del cbuf, cscr
    if r == 0:
        return None
    rh = int(r >> 32)
    rw = int((r >> 16) & 0xFFFF)
    rc = int(r & 0xFFFF)
    return np.frombuffer(buf, dtype=np.uint8, count=rh * rw * rc) \
        .reshape(rh, rw, rc).copy()


_lzw_buf = threading.local()
_lzw_enc_buf = threading.local()


def lzw_encode(data: bytes) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    cap = len(data) + (len(data) >> 1) + 1024
    # bounded growth: 0 also signals table-OOM inside the extension --
    # without a ceiling that would loop doubling forever; past 5x the
    # input even pathological LZW expansion (~1.5x) cannot be the
    # cause, so fall back to the Python codec
    limit = len(data) * 5 + (1 << 16)
    while True:
        # thread-local scratch (create_string_buffer memsets `cap`
        # bytes per call -- measurable on the chip-encode hot path)
        buf = getattr(_lzw_enc_buf, "buf", None)
        if buf is None or len(buf) < cap:
            buf = bytearray(max(cap, 1 << 20))
            _lzw_enc_buf.buf = buf
        cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
        n = lib.fc_lzw_encode(data, len(data), cbuf, len(buf))
        del cbuf
        if n:
            return bytes(memoryview(buf)[:n])
        cap = len(buf) * 2
        if cap > limit:
            return None


def lzw_decode(data: bytes, max_size: Optional[int] = None) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    stop_at = max_size if max_size is not None else 0
    # with a stop point the decoder exits once it is reached, so the
    # buffer only needs stop_at plus one max-length table string of
    # slack -- no unbounded growth for high-expansion streams
    cap = (max_size + 4096 if max_size is not None
           else max(len(data) * 8, 1 << 16))
    while True:
        # thread-local scratch (create_string_buffer would memset `cap`
        # bytes on every call -- measurable on the decode hot path)
        buf = getattr(_lzw_buf, "buf", None)
        if buf is None or len(buf) < cap:
            buf = bytearray(max(cap, 1 << 20))
            _lzw_buf.buf = buf
        cbuf = (ctypes.c_char * len(buf)).from_buffer(buf)
        n = lib.fc_lzw_decode(data, len(data), cbuf, len(buf), stop_at)
        del cbuf
        if n == (1 << 64) - 1:
            raise ValueError("corrupt LZW stream")
        if n == (1 << 64) - 2:
            cap = len(buf) * 4
            continue
        n = int(n)
        if max_size is not None:
            n = min(n, max_size)
        return bytes(memoryview(buf)[:n])
