// fastcodec: native hot loops for the host-side data plane.
//
// The reference gets these from TF's / GDAL's C++ internals (TFRecord
// masked CRC32C framing via tf.io.TFRecordWriter, LZW GeoTIFF chips via
// GDAL; see /root/reference/dl_segmentation_utils/_img_to_tf_mp.py:119
// and _descartes_img_chips.py:784). This framework implements them
// directly: CRC32C on the SSE4.2 crc32 instruction (3-way stream
// software fallback), TIFF-variant LZW with a direct-mapped child
// table, and a zero-copy TFRecord frame assembler.
//
// Exposed as a plain C ABI consumed through ctypes
// (dl_image_segmentation_tpu/_native/__init__.py). GIL is never held
// here; Python callers release it simply by calling through ctypes.

#include <cstdint>
#include <cstring>
#include <cstdlib>

#if defined(__SSE4_2__)
#include <nmmintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli). Hardware path: 8 bytes/instruction.
// ---------------------------------------------------------------------------

static uint32_t crc32c_table[8][256];
static bool crc32c_init_done = false;

static void crc32c_init() {
    const uint32_t poly = 0x82F63B78u;
    for (int i = 0; i < 256; i++) {
        uint32_t crc = (uint32_t)i;
        for (int j = 0; j < 8; j++)
            crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
        crc32c_table[0][i] = crc;
    }
    for (int k = 1; k < 8; k++)
        for (int i = 0; i < 256; i++)
            crc32c_table[k][i] = (crc32c_table[k - 1][i] >> 8)
                ^ crc32c_table[0][crc32c_table[k - 1][i] & 0xFF];
    crc32c_init_done = true;
}

uint32_t fc_crc32c(const uint8_t* data, uint64_t n, uint32_t initial) {
    uint32_t crc = ~initial;
#if defined(__SSE4_2__)
    // align to 8
    while (n && ((uintptr_t)data & 7)) {
        crc = _mm_crc32_u8(crc, *data++);
        n--;
    }
    uint64_t crc64 = crc;
    while (n >= 8) {
        crc64 = _mm_crc32_u64(crc64, *(const uint64_t*)data);
        data += 8;
        n -= 8;
    }
    crc = (uint32_t)crc64;
    while (n--) crc = _mm_crc32_u8(crc, *data++);
#else
    if (!crc32c_init_done) crc32c_init();
    while (n && ((uintptr_t)data & 7)) {
        crc = (crc >> 8) ^ crc32c_table[0][(crc ^ *data++) & 0xFF];
        n--;
    }
    while (n >= 8) {
        uint64_t v;
        memcpy(&v, data, 8);
        v ^= crc;
        crc = crc32c_table[7][v & 0xFF]
            ^ crc32c_table[6][(v >> 8) & 0xFF]
            ^ crc32c_table[5][(v >> 16) & 0xFF]
            ^ crc32c_table[4][(v >> 24) & 0xFF]
            ^ crc32c_table[3][(v >> 32) & 0xFF]
            ^ crc32c_table[2][(v >> 40) & 0xFF]
            ^ crc32c_table[1][(v >> 48) & 0xFF]
            ^ crc32c_table[0][(v >> 56) & 0xFF];
        data += 8;
        n -= 8;
    }
    while (n--) crc = (crc >> 8) ^ crc32c_table[0][(crc ^ *data++) & 0xFF];
#endif
    return ~crc;
}

uint32_t fc_masked_crc32c(const uint8_t* data, uint64_t n) {
    uint32_t crc = fc_crc32c(data, n, 0);
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8u);
}

// Assemble a full TFRecord frame around payload into out
// (out capacity must be n + 16). Returns frame length.
uint64_t fc_tfrecord_frame(const uint8_t* payload, uint64_t n, uint8_t* out) {
    memcpy(out, &n, 8);
    uint32_t hcrc = fc_masked_crc32c(out, 8);
    memcpy(out + 8, &hcrc, 4);
    memcpy(out + 12, payload, n);
    uint32_t dcrc = fc_masked_crc32c(out + 12, n);
    memcpy(out + 12 + n, &dcrc, 4);
    return n + 16;
}

// ---------------------------------------------------------------------------
// TIFF LZW
// ---------------------------------------------------------------------------

#define LZW_CLEAR 256
#define LZW_EOI   257
#define LZW_FIRST 258
#define LZW_RESET 4094

struct BitWriter {
    uint8_t* out;
    uint64_t cap;
    uint64_t pos;
    uint64_t bitbuf;
    int bitcnt;
    bool overflow;
};

static inline void bw_put(BitWriter* bw, uint32_t code, int bits) {
    bw->bitbuf = (bw->bitbuf << bits) | code;
    bw->bitcnt += bits;
    while (bw->bitcnt >= 8) {
        bw->bitcnt -= 8;
        if (bw->pos >= bw->cap) { bw->overflow = true; return; }
        bw->out[bw->pos++] = (uint8_t)(bw->bitbuf >> bw->bitcnt);
    }
}

// Encode: direct-mapped children table child[code][byte] -> next code.
// Returns compressed size, or 0 on output overflow (caller grows buffer).
uint64_t fc_lzw_encode(const uint8_t* src, uint64_t n,
                       uint8_t* dst, uint64_t cap) {
    // 4096 * 256 entries of int16 (-1 = absent)
    static thread_local int16_t* child = nullptr;
    if (!child)
        child = (int16_t*)malloc(4096 * 256 * sizeof(int16_t));
    memset(child, 0xFF, 4096 * 256 * sizeof(int16_t));

    BitWriter bw = {dst, cap, 0, 0, 0, false};
    int bits = 9;
    int next_code = LZW_FIRST;
    bw_put(&bw, LZW_CLEAR, bits);

    if (n == 0) {
        bw_put(&bw, LZW_EOI, bits);
        if (bw.bitcnt) {
            if (bw.pos >= bw.cap) return 0;
            bw.out[bw.pos++] = (uint8_t)(bw.bitbuf << (8 - bw.bitcnt));
        }
        return bw.overflow ? 0 : bw.pos;
    }

    int w = src[0];
    for (uint64_t i = 1; i < n; i++) {
        uint8_t k = src[i];
        int16_t nx = child[((uint32_t)w << 8) | k];
        if (nx >= 0) { w = nx; continue; }
        bw_put(&bw, (uint32_t)w, bits);
        if (bw.overflow) return 0;
        child[((uint32_t)w << 8) | k] = (int16_t)next_code;
        next_code++;
        w = k;
        if (next_code >= LZW_RESET) {
            bw_put(&bw, LZW_CLEAR, bits);
            memset(child, 0xFF, 4096 * 256 * sizeof(int16_t));
            next_code = LZW_FIRST;
            bits = 9;
        } else if (next_code == (1 << bits) && bits < 12) {
            bits++;
        }
    }
    bw_put(&bw, (uint32_t)w, bits);
    bw_put(&bw, LZW_EOI, bits);
    if (bw.overflow) return 0;
    if (bw.bitcnt) {
        if (bw.pos >= bw.cap) return 0;
        bw.out[bw.pos++] = (uint8_t)(bw.bitbuf << (8 - bw.bitcnt));
    }
    return bw.pos;
}

// Decode: prefix/suffix tables, strings unwound through a stack.
// Returns decompressed size; (uint64_t)-1 on corrupt stream;
// (uint64_t)-2 when dst capacity is insufficient. 0 is a legal size
// for empty payloads.
uint64_t fc_lzw_decode(const uint8_t* src, uint64_t n,
                       uint8_t* dst, uint64_t cap) {
    static thread_local int16_t* prefix = nullptr;
    static thread_local uint8_t* suffix = nullptr;
    static thread_local uint8_t* firstc = nullptr;
    static thread_local uint8_t* stack = nullptr;
    if (!prefix) {
        prefix = (int16_t*)malloc(4096 * sizeof(int16_t));
        suffix = (uint8_t*)malloc(4096);
        firstc = (uint8_t*)malloc(4096);
        stack = (uint8_t*)malloc(8192);  // KwKwK can exceed 4096 by one
    }
    for (int i = 0; i < 256; i++) {
        prefix[i] = -1;
        suffix[i] = (uint8_t)i;
        firstc[i] = (uint8_t)i;
    }

    uint64_t pos = 0;          // byte position in src
    uint64_t bitbuf = 0;
    int bitcnt = 0;
    int bits = 9;
    int next_code = LZW_FIRST;
    int old = -1;
    uint64_t out = 0;

    for (;;) {
        while (bitcnt < bits) {
            if (pos >= n) goto done;
            bitbuf = (bitbuf << 8) | src[pos++];
            bitcnt += 8;
        }
        bitcnt -= bits;
        uint32_t code = (uint32_t)((bitbuf >> bitcnt) & ((1u << bits) - 1));
        if (code == LZW_EOI) break;
        if (code == LZW_CLEAR) {
            bits = 9;
            next_code = LZW_FIRST;
            old = -1;
            continue;
        }
        uint32_t entry_first;
        int sp = 0;
        if ((int)code < next_code && !(code >= 256 && (int)code < LZW_FIRST)) {
            // known code: unwind
            int c = (int)code;
            while (c >= 0) {
                stack[sp++] = suffix[c];
                c = prefix[c];
            }
            entry_first = stack[sp - 1];
        } else if ((int)code == next_code && old >= 0) {
            // KwKwK case: old string + first char of old
            int c = old;
            stack[sp++] = firstc[old];
            while (c >= 0) {
                stack[sp++] = suffix[c];
                c = prefix[c];
            }
            entry_first = stack[sp - 1];
        } else {
            return (uint64_t)-1;
        }
        if (out + (uint64_t)sp > cap) return (uint64_t)-2;
        // emit reversed
        for (int i = sp - 1; i >= 0; i--) dst[out++] = stack[i];
        if (old >= 0 && next_code < 4096) {
            prefix[next_code] = (int16_t)old;
            suffix[next_code] = (uint8_t)entry_first;
            firstc[next_code] = firstc[old];
            next_code++;
            if (next_code == (1 << bits) - 1 && bits < 12) bits++;
        }
        old = (int)code;
        firstc[code] = (uint8_t)entry_first;  // ensure defined for roots too
    }
done:
    return out;
}

}  // extern "C"
