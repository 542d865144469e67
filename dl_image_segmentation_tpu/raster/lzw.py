"""TIFF-variant LZW codec, pure-Python reference implementation.

The chip contract requires LZW-compressed GeoTIFFs
(/root/reference/dl_segmentation_utils/_descartes_img_chips.py:784:
COMPRESS=LZW), which the reference gets from GDAL's C++ libtiff. The
fast path here is the C++ extension (_native/fastrecord.cc); this
module is the dependency-free fallback and correctness oracle.

TIFF LZW specifics (TIFF 6.0 spec + the universally-implemented
"early change" quirk): MSB-first bit packing, 9->12 bit codes,
ClearCode=256, EOI=257, code width bumps one code EARLY (when the next
code to assign equals 2^bits - 1), table reset after code 4093.
"""

from __future__ import annotations

_CLEAR = 256
_EOI = 257
_FIRST = 258
_MAX_BITS = 12
_RESET_AT = 4094  # emit Clear when next_code reaches this (early change incl.)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def put(code: int, bits: int):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << bits) | code
        bitcnt += bits
        while bitcnt >= 8:
            bitcnt -= 8
            out.append((bitbuf >> bitcnt) & 0xFF)

    table = {bytes([i]): i for i in range(256)}
    next_code = _FIRST
    bits = 9
    put(_CLEAR, bits)
    w = b""
    for ch in data:
        k = bytes([ch])
        wk = w + k
        if wk in table:
            w = wk
            continue
        put(table[w], bits)
        table[wk] = next_code
        next_code += 1
        w = k
        if next_code >= _RESET_AT:
            # table full: emit Clear, reset, keep current pending prefix
            put(_CLEAR, bits)
            table = {bytes([i]): i for i in range(256)}
            next_code = _FIRST
            bits = 9
        elif next_code == (1 << bits) and bits < _MAX_BITS:
            # encoder widens when the next code to assign overflows the
            # current width; because the decoder's table add lags the
            # encoder's by one code, its matching check is
            # len(table) == 2^bits - 1 (the TIFF "early change").
            # Both directions validated against libtiff/PIL streams.
            bits += 1
    if w:
        put(table[w], bits)
    put(_EOI, bits)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, max_size: int | None = None) -> bytes:
    out = bytearray()
    pos = 0
    bitbuf = 0
    bitcnt = 0
    n = len(data)

    bits = 9

    def get() -> int:
        nonlocal pos, bitbuf, bitcnt
        while bitcnt < bits:
            if pos >= n:
                return _EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitcnt += 8
        bitcnt -= bits
        code = (bitbuf >> bitcnt) & ((1 << bits) - 1)
        return code

    table: list[bytes] = []

    def reset():
        nonlocal table, bits
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        bits = 9

    reset()
    old: bytes | None = None
    while True:
        code = get()
        if code == _EOI:
            break
        if code == _CLEAR:
            reset()
            code = get()
            if code == _EOI:
                break
            entry = table[code]
            out += entry
            old = entry
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and old is not None:
            entry = old + old[:1]
        else:
            raise ValueError(f"corrupt LZW stream (code {code})")
        out += entry
        if old is not None:
            table.append(old + entry[:1])
            # early change on decode: width grows when the NEXT entry
            # index would be 2^bits - 1
            if len(table) == (1 << bits) - 1 and bits < _MAX_BITS:
                bits += 1
        old = entry
        if max_size is not None and len(out) >= max_size:
            break
    if max_size is not None and len(out) > max_size:
        # exact cap, matching the native decoder's truncation -- the
        # two paths must return identical bytes for identical inputs
        return bytes(out[:max_size])
    return bytes(out)
