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

// load-time init (see crc_shift_init_at_load: lazy bool checks from
// multiple threads are a data race)
static const bool crc32c_init_at_load = [] {
    crc32c_init();
    return true;
}();

// --- 3-stream CRC32C -------------------------------------------------------
// The crc32 instruction has 3-cycle latency / 1-cycle throughput: a
// single dependency chain runs at ~2.7 GB/s while three interleaved
// chains reach ~8 GB/s. Streams are stitched with precomputed
// zero-extension operators (append-N-zero-bytes is linear over GF(2);
// represent it as 4x256 lookup tables built once by operator squaring).

#if defined(__SSE4_2__)
#define CRC_LONG 8192u
#define CRC_SHORT 256u

static uint32_t crc_shift_long[4][256];
static uint32_t crc_shift_short[4][256];
static bool crc_shift_init_done = false;

// multiply two GF(2) operators represented as 32 column vectors
static void gf2_matrix_square(uint32_t* square, const uint32_t* mat) {
    for (int n = 0; n < 32; n++) {
        uint32_t col = 0;
        uint32_t vec = mat[n];
        const uint32_t* m = mat;
        // apply mat to mat[n]
        col = 0;
        for (int b = 0; b < 32 && vec; b++, vec >>= 1)
            if (vec & 1) col ^= m[b];
        square[n] = col;
    }
}

// build the 4x256 table form of the append-len-zero-bytes operator
static void crc32c_zeros(uint32_t table[4][256], uint32_t len) {
    const uint32_t poly = 0x82F63B78u;
    uint32_t op[32], tmp[32];
    // operator for one zero BIT
    op[0] = poly;
    for (int n = 1; n < 32; n++) op[n] = 1u << (n - 1);
    // square to one zero BYTE (x8 bits -> 3 squarings)
    gf2_matrix_square(tmp, op);
    gf2_matrix_square(op, tmp);
    gf2_matrix_square(tmp, op);
    // tmp = 1-byte operator; square len-1 more times doubling bytes
    uint32_t cur[32];
    memcpy(cur, tmp, sizeof cur);
    uint32_t bytes = 1;
    while (bytes < len) {
        gf2_matrix_square(op, cur);
        memcpy(cur, op, sizeof cur);
        bytes <<= 1;
    }
    if (bytes != len) {
        // len must be a power of two for this builder
        abort();
    }
    for (int k = 0; k < 4; k++)
        for (int i = 0; i < 256; i++) {
            uint32_t c = 0;
            uint32_t v = (uint32_t)i << (k * 8);
            for (int b = 0; b < 32 && v; b++, v >>= 1)
                if (v & 1) c ^= cur[b];
            table[k][i] = c;
        }
}

static inline uint32_t crc_shift(const uint32_t table[4][256],
                                 uint32_t crc) {
    return table[0][crc & 0xFF] ^ table[1][(crc >> 8) & 0xFF]
         ^ table[2][(crc >> 16) & 0xFF] ^ table[3][crc >> 24];
}

static void crc_shift_init() {
    crc32c_zeros(crc_shift_long, CRC_LONG);
    crc32c_zeros(crc_shift_short, CRC_SHORT);
    crc_shift_init_done = true;
}

// load-time init: a lazy plain-bool check from N writer threads is a
// data race (a thread could observe done==true before the table
// stores are visible and compute wrong CRCs -> silently corrupt
// frames); running it before main/dlopen returns makes every later
// read race-free, same pattern as fc_lit_table
static const bool crc_shift_init_at_load = [] {
    crc_shift_init();
    return true;
}();
#endif  // __SSE4_2__

uint32_t fc_crc32c(const uint8_t* data, uint64_t n, uint32_t initial) {
    uint32_t crc = ~initial;
#if defined(__SSE4_2__)
    if (!crc_shift_init_done) crc_shift_init();
    // align to 8
    while (n && ((uintptr_t)data & 7)) {
        crc = _mm_crc32_u8(crc, *data++);
        n--;
    }
    uint64_t crc64 = crc;
    // 3 interleaved streams over LONG blocks
    while (n >= 3 * CRC_LONG) {
        uint64_t a = crc64, b = 0, c = 0;
        const uint64_t* p = (const uint64_t*)data;
        const uint64_t* pb = (const uint64_t*)(data + CRC_LONG);
        const uint64_t* pc = (const uint64_t*)(data + 2 * CRC_LONG);
        for (uint32_t i = 0; i < CRC_LONG / 8; i++) {
            a = _mm_crc32_u64(a, p[i]);
            b = _mm_crc32_u64(b, pb[i]);
            c = _mm_crc32_u64(c, pc[i]);
        }
        crc64 = crc_shift(crc_shift_long, (uint32_t)a) ^ (uint32_t)b;
        crc64 = crc_shift(crc_shift_long, (uint32_t)crc64) ^ (uint32_t)c;
        data += 3 * CRC_LONG;
        n -= 3 * CRC_LONG;
    }
    while (n >= 3 * CRC_SHORT) {
        uint64_t a = crc64, b = 0, c = 0;
        const uint64_t* p = (const uint64_t*)data;
        const uint64_t* pb = (const uint64_t*)(data + CRC_SHORT);
        const uint64_t* pc = (const uint64_t*)(data + 2 * CRC_SHORT);
        for (uint32_t i = 0; i < CRC_SHORT / 8; i++) {
            a = _mm_crc32_u64(a, p[i]);
            b = _mm_crc32_u64(b, pb[i]);
            c = _mm_crc32_u64(c, pc[i]);
        }
        crc64 = crc_shift(crc_shift_short, (uint32_t)a) ^ (uint32_t)b;
        crc64 = crc_shift(crc_shift_short, (uint32_t)crc64) ^ (uint32_t)c;
        data += 3 * CRC_SHORT;
        n -= 3 * CRC_SHORT;
    }
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
// Fused tf.train.Example encode + TFRecord frame.
//
// Emits the 8-feature chip schema (image/*, target/*, identifier --
// reference _tfrecord_image_translation.py:199-209) with map entries
// sorted by key (protobuf deterministic mode), bit-identical to the
// Python encoder in records/proto.py, directly into a caller buffer
// already framed (length + masked CRCs). One memcpy + one CRC pass
// over the payload instead of the ~4 copies a nested builder makes.
// ---------------------------------------------------------------------------

static inline int varint_size(uint64_t v) {
    int n = 1;
    while (v >= 128) { v >>= 7; n++; }
    return n;
}

static inline uint8_t* put_varint(uint8_t* p, uint64_t v) {
    while (v >= 128) { *p++ = (uint8_t)(v | 128); v >>= 7; }
    *p++ = (uint8_t)v;
    return p;
}

// Feature{ <kind>_list { value: payload } } size; kind tag byte differs
static inline uint64_t data_feature_size(uint64_t payload_len) {
    uint64_t inner = 1 + varint_size(payload_len) + payload_len;
    return 1 + varint_size(inner) + inner;
}

static inline uint8_t* put_data_feature(uint8_t* p, uint8_t kind_tag,
                                        const uint8_t* payload,
                                        uint64_t payload_len) {
    uint64_t inner = 1 + varint_size(payload_len) + payload_len;
    *p++ = kind_tag;                 // 0x0A bytes_list / 0x12 float_list
    p = put_varint(p, inner);
    *p++ = 0x0A;                     // repeated value, field 1
    p = put_varint(p, payload_len);
    memcpy(p, payload, payload_len);
    return p + payload_len;
}

static inline uint64_t int64_feature_size(int64_t v) {
    uint64_t s = varint_size((uint64_t)v);
    uint64_t inner = 1 + varint_size(s) + s;
    return 1 + varint_size(inner) + inner;
}

static inline uint8_t* put_int64_feature(uint8_t* p, int64_t v) {
    uint64_t s = varint_size((uint64_t)v);
    uint64_t inner = 1 + varint_size(s) + s;
    *p++ = 0x1A;                     // int64_list, field 3
    p = put_varint(p, inner);
    *p++ = 0x0A;                     // packed values, field 1
    p = put_varint(p, s);
    p = put_varint(p, (uint64_t)v);
    return p;
}

static inline uint64_t entry_size(uint64_t klen, uint64_t flen) {
    uint64_t entry = 1 + varint_size(klen) + klen
                   + 1 + varint_size(flen) + flen;
    return 1 + varint_size(entry) + entry;
}

static inline uint8_t* put_entry_header(uint8_t* p, const char* key,
                                        uint64_t klen, uint64_t flen) {
    uint64_t entry = 1 + varint_size(klen) + klen
                   + 1 + varint_size(flen) + flen;
    *p++ = 0x0A;                     // map entry, field 1 of Features
    p = put_varint(p, entry);
    *p++ = 0x0A;                     // key
    p = put_varint(p, klen);
    memcpy(p, key, klen);
    p += klen;
    *p++ = 0x12;                     // value (Feature)
    p = put_varint(p, flen);
    return p;
}

// Returns total frame length written to out, or 0 if cap insufficient.
uint64_t fc_encode_example_framed(
    const uint8_t* img, uint64_t img_len, int img_is_bytes,
    const uint8_t* tgt, uint64_t tgt_len, int tgt_is_bytes,
    int64_t ih, int64_t iw, int64_t ic, int64_t th, int64_t tw,
    const uint8_t* ident, uint64_t ident_len,
    uint8_t* out, uint64_t cap) {
    // feature sizes, keys in sorted order:
    // identifier, image/channels, image/height, image/image_data,
    // image/width, target/height, target/target_data, target/width
    uint64_t f_ident = data_feature_size(ident_len);
    uint64_t f_ic = int64_feature_size(ic);
    uint64_t f_ih = int64_feature_size(ih);
    uint64_t f_img = data_feature_size(img_len);
    uint64_t f_iw = int64_feature_size(iw);
    uint64_t f_th = int64_feature_size(th);
    uint64_t f_tgt = data_feature_size(tgt_len);
    uint64_t f_tw = int64_feature_size(tw);

    uint64_t body = entry_size(10, f_ident)
                  + entry_size(14, f_ic) + entry_size(12, f_ih)
                  + entry_size(16, f_img) + entry_size(11, f_iw)
                  + entry_size(13, f_th) + entry_size(18, f_tgt)
                  + entry_size(12, f_tw);
    uint64_t example_len = 1 + varint_size(body) + body;
    if (example_len + 16 > cap) return 0;

    uint8_t* base = out + 12;        // payload starts after len + hcrc
    uint8_t* p = base;
    *p++ = 0x0A;                     // Example.features, field 1
    p = put_varint(p, body);

    p = put_entry_header(p, "identifier", 10, f_ident);
    p = put_data_feature(p, 0x0A, ident, ident_len);
    p = put_entry_header(p, "image/channels", 14, f_ic);
    p = put_int64_feature(p, ic);
    p = put_entry_header(p, "image/height", 12, f_ih);
    p = put_int64_feature(p, ih);
    p = put_entry_header(p, "image/image_data", 16, f_img);
    p = put_data_feature(p, img_is_bytes ? 0x0A : 0x12, img, img_len);
    p = put_entry_header(p, "image/width", 11, f_iw);
    p = put_int64_feature(p, iw);
    p = put_entry_header(p, "target/height", 13, f_th);
    p = put_int64_feature(p, th);
    p = put_entry_header(p, "target/target_data", 18, f_tgt);
    p = put_data_feature(p, tgt_is_bytes ? 0x0A : 0x12, tgt, tgt_len);
    p = put_entry_header(p, "target/width", 12, f_tw);
    p = put_int64_feature(p, tw);

    // frame
    memcpy(out, &example_len, 8);
    uint32_t hcrc = fc_masked_crc32c(out, 8);
    memcpy(out + 8, &hcrc, 4);
    uint32_t dcrc = fc_masked_crc32c(base, example_len);
    memcpy(out + 12 + example_len, &dcrc, 4);
    return example_len + 16;
}

// ---------------------------------------------------------------------------
// Whole-pair fast path: read both chip files STRAIGHT INTO the framed
// output buffer (no intermediate copies), parse shapes from PNG/JPEG
// headers, emit the framed Example. Returns frame length; 0 on any
// parse/size problem (caller falls back to the Python path).
// ---------------------------------------------------------------------------

#include <cstdio>
#include <sys/stat.h>
#include <fcntl.h>
#include <unistd.h>

static bool read_file_into(const char* path, uint8_t* dst, uint64_t len) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    size_t got = fread(dst, 1, len, f);
    fclose(f);
    return got == len;
}

// One open(2) per file for the whole pair encode: fstat for the size,
// pread for the sniff head and the payload (fopen/fread twice per file
// was ~6 extra syscalls + 2 FILE allocations per pair -- measurable at
// ~10k pairs/s on one core).
struct FdFile {
    int fd = -1;
    int64_t len = -1;
    explicit FdFile(const char* path) {
        fd = open(path, O_RDONLY | O_CLOEXEC);
        if (fd < 0) return;
        struct stat st;
        if (fstat(fd, &st) != 0 || st.st_size <= 0) return;
        len = (int64_t)st.st_size;
    }
    ~FdFile() { if (fd >= 0) close(fd); }
    bool ok() const { return fd >= 0 && len > 0; }
    bool pread_all(uint8_t* dst, uint64_t n, uint64_t off) const {
        while (n) {
            ssize_t r = pread(fd, dst, n, (off_t)off);
            if (r <= 0) return false;
            dst += r; off += (uint64_t)r; n -= (uint64_t)r;
        }
        return true;
    }
    int64_t pread_head(uint8_t* dst, uint64_t n) const {
        ssize_t r = pread(fd, dst, n, 0);
        return (int64_t)r;
    }
};

static int64_t file_size(const char* path) {
    struct stat st;
    if (stat(path, &st) != 0) return -1;
    return (int64_t)st.st_size;
}

// parse (h, w, bands) from PNG IHDR or JPEG SOF; data = first bytes
static bool sniff_shape(const uint8_t* d, uint64_t n,
                        int64_t* h, int64_t* w, int64_t* bands) {
    if (n >= 26 && d[0] == 0x89 && d[1] == 'P' && d[2] == 'N'
        && d[3] == 'G' && memcmp(d + 12, "IHDR", 4) == 0) {
        *w = ((int64_t)d[16] << 24) | (d[17] << 16) | (d[18] << 8) | d[19];
        *h = ((int64_t)d[20] << 24) | (d[21] << 16) | (d[22] << 8) | d[23];
        switch (d[25]) {  // color type
            case 0: *bands = 1; break;
            case 2: *bands = 3; break;
            case 3: *bands = 1; break;
            case 4: *bands = 2; break;
            case 6: *bands = 4; break;
            default: return false;
        }
        return true;
    }
    if (n >= 4 && d[0] == 0xFF && d[1] == 0xD8 && d[2] == 0xFF) {
        uint64_t i = 2;
        while (i + 9 < n) {
            if (d[i] != 0xFF) { i++; continue; }
            uint8_t m = d[i + 1];
            if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) {
                i += 2;
                continue;
            }
            uint64_t seglen = ((uint64_t)d[i + 2] << 8) | d[i + 3];
            if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8
                && m != 0xCC) {
                *h = ((int64_t)d[i + 5] << 8) | d[i + 6];
                *w = ((int64_t)d[i + 7] << 8) | d[i + 8];
                *bands = d[i + 9];
                return true;
            }
            i += 2 + seglen;
        }
    }
    return false;
}

// Core pair encoder. `cap_short`, when non-null, is set to 1 if the
// ONLY reason for failure was insufficient `cap` (the mapped shard
// writer uses this to grow its window and retry instead of falling
// back to Python).
static uint64_t encode_pair_files_core(
    const char* img_path, const char* lbl_path,
    const uint8_t* ident, uint64_t ident_len,
    uint8_t* out, uint64_t cap, int* cap_short) {
    FdFile fimg(img_path), flbl(lbl_path);
    if (!fimg.ok() || !flbl.ok()) return 0;
    int64_t img_len = fimg.len;
    int64_t lbl_len = flbl.len;

    // feature sizes (both payloads as BytesList: raw encoded files)
    uint64_t f_ident = data_feature_size(ident_len);
    uint64_t f_img = data_feature_size((uint64_t)img_len);
    uint64_t f_tgt = data_feature_size((uint64_t)lbl_len);
    // dims come from the container headers: sniff the first 4KB of
    // each file, compute the exact layout, then pread the payloads
    // straight into their final positions (the files stay open -- one
    // open/fstat per file for the whole encode).
    uint8_t head[4096];
    int64_t hn = fimg.pread_head(head, sizeof head);
    int64_t ih, iw, ic;
    if (hn <= 0 || !sniff_shape(head, (uint64_t)hn, &ih, &iw, &ic))
        return 0;
    hn = flbl.pread_head(head, sizeof head);
    int64_t lh, lw, lc;
    if (hn <= 0 || !sniff_shape(head, (uint64_t)hn, &lh, &lw, &lc))
        return 0;
    if (ic > 3) return 0;  // MT-engine contract: <=3 bands

    uint64_t f_ic = int64_feature_size(ic);
    uint64_t f_ih = int64_feature_size(ih);
    uint64_t f_iw = int64_feature_size(iw);
    uint64_t f_th = int64_feature_size(lh);
    uint64_t f_tw = int64_feature_size(lw);

    uint64_t body = entry_size(10, f_ident)
                  + entry_size(14, f_ic) + entry_size(12, f_ih)
                  + entry_size(16, f_img) + entry_size(11, f_iw)
                  + entry_size(13, f_th) + entry_size(18, f_tgt)
                  + entry_size(12, f_tw);
    uint64_t example_len = 1 + varint_size(body) + body;
    if (example_len + 16 > cap) {
        if (cap_short) *cap_short = 1;
        return 0;
    }

    uint8_t* base = out + 12;
    uint8_t* p = base;
    *p++ = 0x0A;
    p = put_varint(p, body);

    p = put_entry_header(p, "identifier", 10, f_ident);
    p = put_data_feature(p, 0x0A, ident, ident_len);
    p = put_entry_header(p, "image/channels", 14, f_ic);
    p = put_int64_feature(p, ic);
    p = put_entry_header(p, "image/height", 12, f_ih);
    p = put_int64_feature(p, ih);
    // image payload read straight into place
    p = put_entry_header(p, "image/image_data", 16, f_img);
    {
        uint64_t inner = 1 + varint_size((uint64_t)img_len)
                       + (uint64_t)img_len;
        *p++ = 0x0A;
        p = put_varint(p, inner);
        *p++ = 0x0A;
        p = put_varint(p, (uint64_t)img_len);
        if (!fimg.pread_all(p, (uint64_t)img_len, 0)) return 0;
        p += img_len;
    }
    p = put_entry_header(p, "image/width", 11, f_iw);
    p = put_int64_feature(p, iw);
    p = put_entry_header(p, "target/height", 13, f_th);
    p = put_int64_feature(p, lh);
    p = put_entry_header(p, "target/target_data", 18, f_tgt);
    {
        uint64_t inner = 1 + varint_size((uint64_t)lbl_len)
                       + (uint64_t)lbl_len;
        *p++ = 0x0A;
        p = put_varint(p, inner);
        *p++ = 0x0A;
        p = put_varint(p, (uint64_t)lbl_len);
        if (!flbl.pread_all(p, (uint64_t)lbl_len, 0)) return 0;
        p += lbl_len;
    }
    p = put_entry_header(p, "target/width", 12, f_tw);
    p = put_int64_feature(p, lw);

    memcpy(out, &example_len, 8);
    uint32_t hcrc = fc_masked_crc32c(out, 8);
    memcpy(out + 8, &hcrc, 4);
    uint32_t dcrc = fc_masked_crc32c(base, example_len);
    memcpy(out + 12 + example_len, &dcrc, 4);
    return example_len + 16;
}

uint64_t fc_encode_pair_from_files(
    const char* img_path, const char* lbl_path,
    const uint8_t* ident, uint64_t ident_len,
    uint8_t* out, uint64_t cap) {
    return encode_pair_files_core(img_path, lbl_path, ident, ident_len,
                                  out, cap, nullptr);
}

#include <unistd.h>

#define FC_FD_CORRUPT ((uint64_t)-1)

// Write a whole frame; on a short/failed write, roll the fd back to
// the frame's start (ftruncate + lseek) so no torn bytes remain.
// Returns 1 on success, 0 on clean rollback, FC_FD_CORRUPT otherwise.
static uint64_t write_frame_or_rollback(int fd, const uint8_t* buf,
                                        uint64_t n) {
    off_t start = lseek(fd, 0, SEEK_CUR);
    if (start < 0) return FC_FD_CORRUPT;  // unseekable fd: can't be safe
    uint64_t off = 0;
    while (off < n) {
        ssize_t w = write(fd, buf + off, n - off);
        if (w <= 0) {
            if (ftruncate(fd, start) != 0) return FC_FD_CORRUPT;
            if (lseek(fd, start, SEEK_SET) != start) return FC_FD_CORRUPT;
            return 0;
        }
        off += (uint64_t)w;
    }
    return 1;
}

// ---------------------------------------------------------------------------
// Mapped shard assembly. Frames are encoded DIRECTLY into an mmap'd
// window of the shard file, which removes the scratch->fd write()
// copy and its page-cache re-allocation from the hot loop -- on this
// class of box that copy costs ~0.4-0.6 ms per ~1.4 MB tifarr frame,
// a third of the per-pair budget. Failure handling is also simpler
// than the write() path: a failed encode just doesn't advance the
// logical end, and the final ftruncate clips any partial garbage, so
// the atomic-rename "existing shard == complete shard" invariant
// holds with no rollback protocol at all.
//
// The file is extended SPARSELY (ftruncate) and pages are materialized
// just ahead of the assembly cursor with MADV_POPULATE_WRITE, in
// chunks sized to the running frame-size estimate. Encoders are
// capped at the populated watermark, so stores can never fault an
// unpopulated page: allocation failure (tmpfs full, disk full under
// delalloc) surfaces as a clean madvise() error -- never a SIGBUS --
// and the loop falls back to the write()-based path for the rest.
// MAP_POPULATE/fallocate are deliberately NOT used: both materialize
// the whole window eagerly, and the tail-window overshoot measurably
// costs more than the write() copy they save on short shards.
// ---------------------------------------------------------------------------
#include <sys/mman.h>
#include <fcntl.h>
#include <cerrno>

#ifndef MADV_POPULATE_WRITE
#define MADV_POPULATE_WRITE 23  // linux 5.14+; older kernels -> EINVAL
#endif

struct FcMap {
    int fd;
    uint8_t* win;        // current mapped window (nullptr when inactive)
    uint64_t win_off;    // file offset of win[0] (page-aligned)
    uint64_t win_len;
    uint64_t used;       // logical end of complete frames (file offset)
    uint64_t pop;        // populate watermark (absolute file offset)
    uint64_t est;        // last frame length (populate-ahead estimate)
};

static const uint64_t FC_MAP_WINDOW = 256ull << 20;
static const uint64_t FC_POP_CHUNK = 8ull << 20;

// (Re)position the window at `used`. Sparse ftruncate only -- no
// eager block allocation. Returns 1 on success; on failure the old
// window is unmapped and the caller must fall back to write() output.
static int fcmap_window(FcMap* m) {
    if (m->win) {
        munmap(m->win, m->win_len);
        m->win = nullptr;
    }
    uint64_t off = m->used & ~4095ull;
    uint64_t len = FC_MAP_WINDOW;
    if (ftruncate(m->fd, (off_t)(off + len)) != 0) return 0;
    void* p = mmap(nullptr, (size_t)len, PROT_READ | PROT_WRITE,
                   MAP_SHARED, m->fd, (off_t)off);
    if (p == MAP_FAILED) return 0;
    m->win = (uint8_t*)p;
    m->win_off = off;
    m->win_len = len;
    m->pop = off;
    return 1;
}

// Raise the populate watermark toward `need` bytes past `used`
// (clamped to the window -- an exhausted window is NOT a failure:
// encoders are capped at the watermark and the shard loop repositions
// the window when a frame doesn't fit the remaining room). Returns 0
// only when pages could not be materialized (madvise error: kernel
// without MADV_POPULATE_WRITE, or allocation failure on a full
// tmpfs/disk), in which case the caller falls back to write() output.
static int fcmap_populate(FcMap* m, uint64_t need) {
    uint64_t want = m->used + need;
    if (want <= m->pop) return 1;
    uint64_t end = m->pop + FC_POP_CHUNK;
    if (end < want) end = want + FC_POP_CHUNK;
    uint64_t win_end = m->win_off + m->win_len;
    if (end > win_end) end = win_end;
    if (end <= m->pop) return 1;  // window exhausted; caller handles
    if (madvise(m->win + (m->pop - m->win_off), (size_t)(end - m->pop),
                MADV_POPULATE_WRITE) != 0)
        return 0;
    m->pop = end;
    return 1;
}

// Unmap, clip the file to the logical end, and leave the fd offset
// there so subsequent plain write()s (Python fallback records) append
// correctly. Returns 1 on success.
static int fcmap_finish(FcMap* m) {
    if (m->win) {
        munmap(m->win, m->win_len);
        m->win = nullptr;
    }
    if (ftruncate(m->fd, (off_t)m->used) != 0) return 0;
    if (lseek(m->fd, (off_t)m->used, SEEK_SET) != (off_t)m->used)
        return 0;
    return 1;
}

// Whole-shard loop in native code: encode + write every pair of the
// shard with zero per-record Python involvement. Pairs that fail to
// parse/read are flagged in `failed` (caller retries them through the
// Python path, which produces the reference's SKIPPED diagnostics).
// Frames are assembled straight into the mapped shard (see above);
// when mapping is unavailable the loop falls back to scratch +
// write(), where failed frame WRITES are rolled back (ftruncate to
// frame start) so a later append lands on a clean boundary; if
// rollback itself fails the whole call returns FC_FD_CORRUPT and the
// caller must abort the shard (leave the .tmp).
// Returns the number of records written.
// One mapped-encode attempt loop shared by both shard writers: call
// ENCODE_EXPR (which must use `dst` and `room`) with the cursor capped
// at the populate watermark, widening the watermark -- and
// repositioning the window once if it runs dry -- until the frame
// fits or the pair genuinely fails. Leaves `n` = frame length (0 =
// fallback pair) and may clear `mapped` (mapping broke; caller falls
// through to the write() path). Evaluates to FC_FD_CORRUPT on an
// unrecoverable finish failure, which the caller must return.
#define FC_MAPPED_ENCODE(m, mapped, n, ENCODE_EXPR)                          \
    do {                                                                     \
        if ((m).win_off + (m).win_len - (m).used < (4ull << 20)) {           \
            if (!fcmap_window(&(m))) {                                       \
                if (!fcmap_finish(&(m))) return FC_FD_CORRUPT;               \
                (mapped) = 0;                                                \
                break;                                                       \
            }                                                                \
        }                                                                    \
        uint64_t need_ = (m).est ? (m).est + (m).est / 2 + 65536             \
                                 : (4ull << 20);                             \
        if (!fcmap_populate(&(m), need_)) {                                  \
            if (!fcmap_finish(&(m))) return FC_FD_CORRUPT;                   \
            (mapped) = 0;                                                    \
            break;                                                           \
        }                                                                    \
        for (;;) {                                                           \
            int cap_short = 0;                                               \
            uint8_t* dst = (m).win + ((m).used - (m).win_off);               \
            uint64_t room = (m).pop - (m).used;                              \
            (n) = (ENCODE_EXPR);                                             \
            if ((n) || !cap_short) break;                                    \
            uint64_t win_room = (m).win_off + (m).win_len - (m).used;        \
            if (room >= win_room) {                                          \
                if ((m).used - (m).win_off < 4096) break;                    \
                if (!fcmap_window(&(m))) {                                   \
                    if (!fcmap_finish(&(m))) return FC_FD_CORRUPT;           \
                    (mapped) = 0;                                            \
                    break;                                                   \
                }                                                            \
            }                                                                \
            if (!fcmap_populate(&(m), room ? room * 2 : (8ull << 20))) {     \
                if (!fcmap_finish(&(m))) return FC_FD_CORRUPT;               \
                (mapped) = 0;                                                \
                break;                                                       \
            }                                                                \
        }                                                                    \
    } while (0)

uint64_t fc_write_shard(const char* const* img_paths,
                        const char* const* lbl_paths,
                        const char* const* idents,
                        const uint64_t* ident_lens,
                        uint64_t count, int fd,
                        uint8_t* scratch, uint64_t cap,
                        uint8_t* failed) {
    FcMap m = {fd, nullptr, 0, 0, 0, 0, 0};
    off_t end = lseek(fd, 0, SEEK_END);
    int mapped = end >= 0;
    if (mapped) {
        m.used = (uint64_t)end;
        mapped = fcmap_window(&m);
        if (!mapped && !fcmap_finish(&m)) return FC_FD_CORRUPT;
    }
    uint64_t written = 0;
    for (uint64_t i = 0; i < count; i++) {
        failed[i] = 1;
        uint64_t n = 0;
        if (mapped) {
            FC_MAPPED_ENCODE(m, mapped, n,
                encode_pair_files_core(
                    img_paths[i], lbl_paths[i],
                    (const uint8_t*)idents[i], ident_lens[i],
                    dst, room, &cap_short));
            if (mapped) {
                if (n == 0) continue;
                m.used += n;
                m.est = n;
                failed[i] = 0;
                written++;
                continue;
            }
        }
        // write()-based fallback
        n = fc_encode_pair_from_files(
            img_paths[i], lbl_paths[i],
            (const uint8_t*)idents[i], ident_lens[i], scratch, cap);
        if (n == 0) continue;
        uint64_t r = write_frame_or_rollback(fd, scratch, n);
        if (r == FC_FD_CORRUPT) return FC_FD_CORRUPT;
        if (r == 0) continue;
        failed[i] = 0;
        written++;
    }
    if (mapped && !fcmap_finish(&m)) return FC_FD_CORRUPT;
    return written;
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

// Per-thread LZW scratch tables, freed at thread exit via the C++
// thread_local destructor (__cxa_thread_atexit). Bare thread_local
// mallocs would leak at every worker-thread exit, and both the
// training feed and the writer engines spawn fresh worker threads per
// stream/run. Lazy accessor so the TLS-init wrapper runs once per use
// site; callers immediately copy the raw pointers into locals.
struct FcTls {
    uint64_t* dec_tab = nullptr;    // decoder: 4096 x (start<<16|len)
    uint32_t* enc_child = nullptr;  // encoder: 4096x256 children
    uint32_t enc_epoch = 0;
    ~FcTls() {
        free(dec_tab);
        free(enc_child);
    }
};

static FcTls& fc_tls() {
    static thread_local FcTls tls;
    return tls;
}

// Encode: direct-mapped children table child[code][byte] -> next code,
// epoch-stamped so table resets cost nothing (no 2 MB memset per Clear
// -- random-ish data resets every ~4-6 KB of input).
// Returns compressed size, or 0 on output overflow (caller grows buffer).
uint64_t fc_lzw_encode(const uint8_t* src, uint64_t n,
                       uint8_t* dst, uint64_t cap) {
    // entry = (epoch << 16) | code; entry valid iff its epoch matches.
    // Tables live in the RAII per-thread bundle (freed at thread exit;
    // feed/writer pools spawn fresh workers, so a bare thread_local
    // malloc would leak 4 MB per exited worker).
    FcTls& tls = fc_tls();
    uint32_t*& child = tls.enc_child;
    uint32_t& epoch = tls.enc_epoch;
    if (!child) {
        child = (uint32_t*)malloc(4096 * 256 * sizeof(uint32_t));
        if (!child) return 0;  // OOM: caller falls back to Python
        memset(child, 0, 4096 * 256 * sizeof(uint32_t));
        epoch = 0;
    }
    if (epoch >= 0xFFFEu) {  // epoch wrap: one real reset per ~65k clears
        memset(child, 0, 4096 * 256 * sizeof(uint32_t));
        epoch = 0;
    }
    epoch++;

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
        uint32_t e = child[((uint32_t)w << 8) | k];
        if ((e >> 16) == epoch) { w = (int)(e & 0xFFFF); continue; }
        bw_put(&bw, (uint32_t)w, bits);
        if (bw.overflow) return 0;
        child[((uint32_t)w << 8) | k] = (epoch << 16) | (uint32_t)next_code;
        next_code++;
        w = k;
        if (next_code >= LZW_RESET) {
            bw_put(&bw, LZW_CLEAR, bits);
            epoch++;
            if (epoch >= 0xFFFFu) {  // 16-bit stamp wrap mid-stream
                memset(child, 0, 4096 * 256 * sizeof(uint32_t));
                epoch = 1;
            }
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

// Decode via output back-references: every table code maps to a
// (start, length) range of the ALREADY-DECODED output, so emitting a
// code is one sequential copy (KwKwK overlap handled by byte-forward
// copying) instead of a per-byte stack unwind. New entry (prev string
// + first char of current emit) is exactly the output range starting
// at the previous emit with length prev_len + 1, because emissions are
// contiguous.
//
// Bit reading is positional: while at least 8 source bytes remain, one
// unaligned 64-bit load + bswap yields a window that always spans two
// whole codes (bit offset <= 7, two 12-bit codes => 31 bits < 64), so
// the hot loop consumes two codes per load with no running bit
// accumulator. The last 8 bytes fall back to byte-wise assembly. On
// chip-like noisy uint16 data (~1.07 output bytes/code, the worst
// case) this measures ~1.1x the accumulator form.
//
// Returns decompressed size; (uint64_t)-1 on corrupt stream;
// (uint64_t)-2 when dst capacity is insufficient. 0 is a legal size
// for empty payloads.

// Identity byte table backing literal codes (< 256): lets the emit
// path treat literals as length-1 strings sourced from here instead of
// branching on literal-vs-table (the one data-dependent ~50/50 branch
// on noisy chip data). 8 bytes of slack so the constant-size 8-byte
// copy trick may over-read from lit_table[255]. Initialized at load
// time (no per-thread race).
static uint8_t fc_lit_table[256 + 8];
static const bool fc_lit_table_init = [] {
    for (int i = 0; i < 256; i++) fc_lit_table[i] = (uint8_t)i;
    return true;
}();

// stop_at: 0 = decode the full stream; else stop (successfully) once
// at least stop_at bytes are produced -- mirrors the Python oracle's
// max_size early exit, so a caller capping output neither grows the
// buffer unboundedly for high-expansion streams nor notices
// corruption beyond the stop point (the oracle doesn't either).
uint64_t fc_lzw_decode(const uint8_t* src, uint64_t n,
                       uint8_t* dst, uint64_t cap, uint64_t stop_at) {
    // one 8-byte entry per code: (output start << 16) | length -- a
    // single load on the table-hit path. Output offsets are < 2^48
    // (strip payloads are far below that) and string lengths < 2^16
    // (table resets at 4094 codes, so max string length ~3840).
    // Entries 0..255 are fixed length-1 (their bytes come from
    // fc_lit_table, selected by code < 256 below) and survive CLEAR
    // since next_code never drops below LZW_FIRST. Table lives in the
    // RAII per-thread bundle (freed at thread exit).
    uint64_t*& tab_tls = fc_tls().dec_tab;
    if (!tab_tls) {
        tab_tls = (uint64_t*)malloc(4096 * sizeof(uint64_t));
        if (!tab_tls) return (uint64_t)-1;  // OOM: loud, never UB
        for (int i = 0; i < 256; i++) tab_tls[i] = 1;
    }
    // local copy: under -fPIC a thread_local read is a __tls_get_addr
    // call, and the char stores into dst force a re-read per access;
    // a local pointer never aliases and stays in a register
    uint64_t* const tab = tab_tls;

    uint64_t bitpos = 0;       // absolute bit position in src
    uint64_t total_bits = n * 8;
    // fast 8-byte loads stay in-bounds while (bitpos>>3) + 8 <= n;
    // exclusive limit so that n < 8 disables the fast path entirely
    // (0 would otherwise pass a `<=` gate at bitpos 0 and over-read)
    uint64_t fast_lim = n >= 8 ? (n - 8) * 8 + 1 : 0;
    int bits = 9;
    int next_code = LZW_FIRST;
    uint64_t prev_start = 0;
    uint32_t prev_len = 0;     // 0 = no previous emit (start / post-clear)
    uint64_t out = 0;

    // Handle one extracted code. Control flow: EOI exits, CLEAR resets
    // and restarts the window loop (any second pre-extracted code is
    // simply re-read at the new bitpos next iteration).
#define FC_LZW_EMIT(code_)                                                   \
    {                                                                        \
        uint32_t code = (code_);                                             \
        if (code == LZW_EOI) goto done;                                      \
        if (code == LZW_CLEAR) {                                             \
            bits = 9; next_code = LZW_FIRST; prev_len = 0;                   \
            goto next_window;                                                \
        }                                                                    \
        uint64_t emit_start = out;                                           \
        uint32_t emit_len;                                                   \
        if ((int)code < next_code) {                                         \
            /* literals (< 256) ride the same path: their table entry  */    \
            /* is length 1 and the source pointer selects (cmov, not   */    \
            /* branch) the identity byte table instead of dst --       */    \
            /* removes the one ~50/50 data-dependent branch            */    \
            uint64_t e = tab[code];                                          \
            emit_len = (uint32_t)(e & 0xFFFF);                               \
            const uint8_t* s = code < 256 ? fc_lit_table + code              \
                                          : dst + (e >> 16);                 \
            if (out + emit_len > cap) return (uint64_t)-2;                   \
            /* constant-size copies: loads complete before stores, so  */    \
            /* the tail over-read past emit_len is harmless; the       */    \
            /* over-write past emit_len lands in output slack          */    \
            if (emit_len <= 8 && out + 8 <= cap) {                           \
                uint64_t a;                                                  \
                memcpy(&a, s, 8);                                            \
                memcpy(dst + out, &a, 8);                                    \
            } else if (emit_len <= 16 && out + 16 <= cap) {                  \
                uint64_t a, b;                                               \
                memcpy(&a, s, 8);                                            \
                memcpy(&b, s + 8, 8);                                        \
                memcpy(dst + out, &a, 8);                                    \
                memcpy(dst + out + 8, &b, 8);                                \
            } else {                                                         \
                memcpy(dst + out, s, emit_len);                              \
            }                                                                \
            out += emit_len;                                                 \
        } else if ((int)code == next_code && prev_len > 0) {                 \
            /* KwKwK: prev string + its first char; source overlaps   */     \
            /* dest by exactly the final byte -> forward byte copy    */     \
            emit_len = prev_len + 1;                                         \
            if (out + emit_len > cap) return (uint64_t)-2;                   \
            const uint8_t* s = dst + prev_start;                             \
            uint8_t* d = dst + out;                                          \
            for (uint32_t i = 0; i < emit_len; i++) d[i] = s[i];             \
            out += emit_len;                                                 \
        } else {                                                             \
            return (uint64_t)-1;                                             \
        }                                                                    \
        if (prev_len > 0 && next_code < 4096) {                              \
            tab[next_code] = (prev_start << 16) | (prev_len + 1);            \
            next_code++;                                                     \
            if (next_code == (1 << bits) - 1 && bits < 12) bits++;           \
        }                                                                    \
        prev_start = emit_start;                                             \
        prev_len = emit_len;                                                 \
        if (stop_at && out >= stop_at) goto done;                            \
    }

    for (;;) {
        if (bitpos < fast_lim) {
            uint64_t w;
            memcpy(&w, src + (bitpos >> 3), 8);
            w = __builtin_bswap64(w);
            unsigned off = (unsigned)(bitpos & 7);
            uint32_t c1 = (uint32_t)((w >> (64 - off - bits))
                                     & ((1u << bits) - 1));
            bitpos += bits;
            off += bits;
            FC_LZW_EMIT(c1);
            // second code from the same window; `bits` may have grown
            // by one above, still off + bits <= 7 + 12 + 12 = 31 < 64.
            // (A 4-codes-per-load unroll fits the window too -- 7 +
            // 4*12 = 55 < 64 -- but measured ~15% SLOWER here: four
            // copies of the emit macro overflow the decoded-uop
            // cache.)
            uint32_t c2 = (uint32_t)((w >> (64 - off - bits))
                                     & ((1u << bits) - 1));
            bitpos += bits;
            FC_LZW_EMIT(c2);
        } else {
            // byte-wise tail: assemble just enough bytes for one code
            if (bitpos + (unsigned)bits > total_bits) break;
            uint64_t v = 0;
            uint64_t bp = bitpos >> 3;
            int have = 0;
            while (have < bits + (int)(bitpos & 7) && bp < n) {
                v = (v << 8) | src[bp++];
                have += 8;
            }
            int shift = have - (int)(bitpos & 7) - bits;
            if (shift < 0) break;
            uint32_t c = (uint32_t)((v >> shift) & ((1u << bits) - 1));
            bitpos += bits;
            FC_LZW_EMIT(c);
        }
next_window:;
    }
done:
#undef FC_LZW_EMIT
    return out;
}

// ---------------------------------------------------------------------------
// Fused GeoTIFF pair -> framed FloatList/BytesList Example (tifarr mode).
//
// Decodes the chip-contract subset of classic TIFF -- chunky planar,
// compression none(1)/LZW(5), predictor 1/2, uint8/uint16 samples,
// strips or tiles, little-endian -- with LZW-decode + predictor-undo +
// dtype conversion landing DIRECTLY in the Example's payload hole (no
// intermediate raster materialisation, no Python glue). Anything
// outside the subset returns 0 and the caller falls back to the
// Python path (raster/geotiff.py, the correctness oracle). Matches
// records/example.py's promotion rule: both payloads are raw bytes
// when BOTH rasters are uint8, else both little-endian float32.
// ---------------------------------------------------------------------------

struct TiffMeta {
    int64_t w, h;
    int spp, bps, comp, predictor;
    int tiled;
    int64_t tw, th;           // tile dims (tiled) or width/rps (striped)
    uint32_t nchunks;
    uint64_t offs[4096];
    uint64_t cnts[4096];
};

static inline uint32_t rd16le(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8);
}
static inline uint32_t rd32le(const uint8_t* p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8)
         | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

// Read IFD entry values (SHORT/LONG) into out[max]; returns count read.
static uint32_t tiff_values(const uint8_t* d, uint64_t n,
                            const uint8_t* entry, uint64_t* out,
                            uint32_t maxv) {
    uint32_t type = rd16le(entry + 2);
    uint32_t count = rd32le(entry + 4);
    uint32_t size = (type == 3) ? 2 : (type == 4) ? 4 : 0;
    if (!size || count == 0) return 0;
    if (count > maxv) return 0;
    uint64_t total = (uint64_t)count * size;
    const uint8_t* src;
    if (total <= 4) {
        src = entry + 8;
    } else {
        uint64_t off = rd32le(entry + 8);
        if (off + total > n) return 0;
        src = d + off;
    }
    for (uint32_t i = 0; i < count; i++)
        out[i] = (size == 2) ? rd16le(src + 2 * i) : rd32le(src + 4 * i);
    return count;
}

static bool tiff_parse(const uint8_t* d, uint64_t n, TiffMeta* m) {
    if (n < 16 || d[0] != 'I' || d[1] != 'I' || d[2] != 42 || d[3] != 0)
        return false;  // little-endian classic TIFF only (our writer's)
    uint64_t ifd = rd32le(d + 4);
    if (ifd + 2 > n) return false;
    uint32_t nent = rd16le(d + ifd);
    if (ifd + 2 + 12ull * nent > n) return false;
    m->w = m->h = 0;
    m->spp = 1; m->bps = 8; m->comp = 1; m->predictor = 1;
    m->tiled = 0; m->tw = m->th = 0; m->nchunks = 0;
    int sfmt = 1, planar = 1;
    uint64_t rps = 0;
    uint64_t v[4096];
    uint32_t noffs = 0, ncnts = 0;
    // A tag we dispatch on that is PRESENT but unparseable (wrong
    // type, zero count, count over our limit, out-of-bounds values)
    // must fail the parse -- keeping the default would silently decode
    // garbage (e.g. a >64-band uint16 file parsed as bps=8). Absent
    // tags keep their spec defaults.
    for (uint32_t i = 0; i < nent; i++) {
        const uint8_t* e = d + ifd + 2 + 12ull * i;
        uint32_t tag = rd16le(e);
        uint32_t cnt;
        switch (tag) {
            case 256:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->w = v[0]; break;
            case 257:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->h = v[0]; break;
            case 258:  // count == samples-per-pixel; must be uniform
                cnt = tiff_values(d, n, e, v, 64);
                if (!cnt) return false;
                for (uint32_t k = 1; k < cnt; k++)
                    if (v[k] != v[0]) return false;
                m->bps = (int)v[0];
                break;
            case 259:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->comp = (int)v[0]; break;
            case 277:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->spp = (int)v[0]; break;
            case 278:
                if (!tiff_values(d, n, e, v, 1)) return false;
                rps = v[0]; break;
            case 284:
                if (!tiff_values(d, n, e, v, 1)) return false;
                planar = (int)v[0]; break;
            case 317:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->predictor = (int)v[0]; break;
            case 339:  // count == samples-per-pixel; must be uniform
                cnt = tiff_values(d, n, e, v, 64);
                if (!cnt) return false;
                for (uint32_t k = 1; k < cnt; k++)
                    if (v[k] != v[0]) return false;
                sfmt = (int)v[0];
                break;
            case 273: case 324:
                noffs = tiff_values(d, n, e, v, 4096);
                if (!noffs) return false;
                for (uint32_t k = 0; k < noffs; k++) m->offs[k] = v[k];
                if (tag == 324) m->tiled = 1;
                break;
            case 279: case 325:
                ncnts = tiff_values(d, n, e, v, 4096);
                if (!ncnts) return false;
                for (uint32_t k = 0; k < ncnts; k++) m->cnts[k] = v[k];
                break;
            case 322:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->tw = v[0]; break;
            case 323:
                if (!tiff_values(d, n, e, v, 1)) return false;
                m->th = v[0]; break;
        }
    }
    if (m->w <= 0 || m->h <= 0 || noffs == 0 || noffs != ncnts)
        return false;
    m->nchunks = noffs;
    // dimension sanity caps: with w/h/tw/th <= 2^20 and spp <= 256,
    // every size product below stays far under 2^64 -- without them a
    // crafted header (e.g. TileWidth = TileLength = 2^31) wraps
    // chunk_bytes to a tiny value, defeats the scratch-capacity
    // check, and tiff_scatter scribbles far outside the buffer
    if (m->w > (1 << 20) || m->h > (1 << 20)) return false;
    if (m->tw > (1 << 20) || m->th > (1 << 20)) return false;
    if (m->spp <= 0 || m->spp > 256) return false;
    if (planar != 1 || sfmt != 1) return false;       // chunky uint only
    if (m->bps != 8 && m->bps != 16) return false;
    if (m->comp != 1 && m->comp != 5) return false;
    if (m->predictor != 1 && m->predictor != 2) return false;
    if (m->tiled) {
        if (m->tw <= 0 || m->th <= 0) return false;
    } else {
        if (rps == 0 || rps > (uint64_t)m->h) rps = (uint64_t)m->h;
        m->tw = m->w;
        m->th = (int64_t)rps;
    }
    // chunk bounds sanity
    for (uint32_t k = 0; k < m->nchunks; k++)
        if (m->offs[k] + m->cnts[k] > n) return false;
    return true;
}

// Decode one chunk's raw (post-LZW) samples: undo predictor in place,
// then scatter into the payload hole (float32 or raw uint8), clipping
// to the image bounds. raw is the decoded chunk (row-major th x tw x
// spp samples of bps bits).
static void tiff_scatter(uint8_t* raw, const TiffMeta* m,
                         int64_t y0, int64_t x0, uint8_t* payload,
                         int as_float) {
    int64_t rows = m->th, cols = m->tw;
    int spp = m->spp;
    int64_t vis_rows = m->h - y0 < rows ? m->h - y0 : rows;
    int64_t vis_cols = m->w - x0 < cols ? m->w - x0 : cols;
    if (m->bps == 16) {
        uint16_t* s = (uint16_t*)raw;
        if (m->predictor == 2) {
            for (int64_t r = 0; r < vis_rows; r++) {
                uint16_t* row = s + r * cols * spp;
                for (int64_t x = 1; x < cols; x++)
                    for (int c = 0; c < spp; c++)
                        row[x * spp + c] = (uint16_t)(
                            row[x * spp + c] + row[(x - 1) * spp + c]);
            }
        }
        if (as_float) {
            float* dst = (float*)payload;
            for (int64_t r = 0; r < vis_rows; r++) {
                const uint16_t* row = s + r * cols * spp;
                float* drow = dst + ((y0 + r) * m->w + x0) * spp;
                for (int64_t k = 0; k < vis_cols * spp; k++)
                    drow[k] = (float)row[k];
            }
        } else {
            // uint16 never stores as bytes (promotion rule)
        }
    } else {
        uint8_t* s = raw;
        if (m->predictor == 2) {
            for (int64_t r = 0; r < vis_rows; r++) {
                uint8_t* row = s + r * cols * spp;
                for (int64_t x = 1; x < cols; x++)
                    for (int c = 0; c < spp; c++)
                        row[x * spp + c] = (uint8_t)(
                            row[x * spp + c] + row[(x - 1) * spp + c]);
            }
        }
        if (as_float) {
            float* dst = (float*)payload;
            for (int64_t r = 0; r < vis_rows; r++) {
                const uint8_t* row = s + r * cols * spp;
                float* drow = dst + ((y0 + r) * m->w + x0) * spp;
                for (int64_t k = 0; k < vis_cols * spp; k++)
                    drow[k] = (float)row[k];
            }
        } else {
            uint8_t* dst = payload;
            for (int64_t r = 0; r < vis_rows; r++)
                memcpy(dst + ((y0 + r) * m->w + x0) * spp,
                       s + r * cols * spp, vis_cols * spp);
        }
    }
}

// Decode the whole raster into the payload hole. chunk_scratch must
// hold th*tw*spp*(bps/8) bytes. Returns true on success.
static bool tiff_decode_into(const uint8_t* d, const TiffMeta* m,
                             uint8_t* payload, int as_float,
                             uint8_t* chunk_scratch,
                             uint64_t chunk_cap) {
    uint64_t chunk_bytes = (uint64_t)m->th * m->tw * m->spp * (m->bps / 8);
    if (chunk_bytes > chunk_cap) return false;
    int64_t across = m->tiled ? (m->w + m->tw - 1) / m->tw : 1;
    uint32_t idx = 0;
    for (int64_t y0 = 0; y0 < m->h; y0 += m->th) {
        for (int64_t t = 0; t < across; t++) {
            if (idx >= m->nchunks) return false;
            const uint8_t* src = d + m->offs[idx];
            uint64_t cnt = m->cnts[idx];
            idx++;
            uint8_t* raw;
            uint64_t need = chunk_bytes;
            if (!m->tiled) {
                int64_t nrows = m->h - y0 < m->th ? m->h - y0 : m->th;
                need = (uint64_t)nrows * m->tw * m->spp * (m->bps / 8);
            }
            if (m->comp == 1) {
                if (cnt < need) return false;
                memcpy(chunk_scratch, src, need);
                raw = chunk_scratch;
            } else {
                uint64_t got = fc_lzw_decode(src, cnt, chunk_scratch,
                                             chunk_cap, 0);
                if (got == (uint64_t)-1 || got == (uint64_t)-2
                    || got < need)
                    return false;
                raw = chunk_scratch;
            }
            TiffMeta mm = *m;
            if (!m->tiled) {
                int64_t nrows = m->h - y0 < m->th ? m->h - y0 : m->th;
                mm.th = nrows;
            }
            tiff_scatter(raw, &mm, y0, (int64_t)(t * m->tw), payload,
                         as_float);
        }
    }
    return true;
}

// Encode one GeoTIFF chip pair as a framed Example with the decoded
// arrays as payloads (the reference's store_as_array=True MP engine,
// _img_to_tf_mp.py:123-143). Returns frame length in `out`, 0 on
// fallback-needed. file_scratch/chunk_scratch are thread-reused.
static uint64_t encode_tiff_pair(
    const uint8_t* img_data, uint64_t img_n,
    const uint8_t* lbl_data, uint64_t lbl_n,
    const uint8_t* ident, uint64_t ident_len,
    uint8_t* out, uint64_t cap, uint8_t* chunk_scratch,
    uint64_t chunk_cap, int* cap_short = nullptr) {
    TiffMeta im, lm;
    if (!tiff_parse(img_data, img_n, &im)) return 0;
    if (!tiff_parse(lbl_data, lbl_n, &lm)) return 0;
    if (lm.spp != 1) return 0;  // labels are single-band (h, w)
    int bytes_mode = (im.bps == 8 && lm.bps == 8);
    uint64_t img_len = (uint64_t)im.h * im.w * im.spp
                       * (bytes_mode ? 1 : 4);
    uint64_t tgt_len = (uint64_t)lm.h * lm.w * (bytes_mode ? 1 : 4);

    uint64_t f_ident = data_feature_size(ident_len);
    uint64_t f_ic = int64_feature_size(im.spp);
    uint64_t f_ih = int64_feature_size(im.h);
    uint64_t f_img = data_feature_size(img_len);
    uint64_t f_iw = int64_feature_size(im.w);
    uint64_t f_th = int64_feature_size(lm.h);
    uint64_t f_tgt = data_feature_size(tgt_len);
    uint64_t f_tw = int64_feature_size(lm.w);
    uint64_t body = entry_size(10, f_ident)
                  + entry_size(14, f_ic) + entry_size(12, f_ih)
                  + entry_size(16, f_img) + entry_size(11, f_iw)
                  + entry_size(13, f_th) + entry_size(18, f_tgt)
                  + entry_size(12, f_tw);
    uint64_t example_len = 1 + varint_size(body) + body;
    if (example_len + 16 > cap) {
        if (cap_short) *cap_short = 1;
        return 0;
    }

    uint8_t kind = bytes_mode ? 0x0A : 0x12;
    uint8_t* base = out + 12;
    uint8_t* p = base;
    *p++ = 0x0A;
    p = put_varint(p, body);
    p = put_entry_header(p, "identifier", 10, f_ident);
    p = put_data_feature(p, 0x0A, ident, ident_len);
    p = put_entry_header(p, "image/channels", 14, f_ic);
    p = put_int64_feature(p, im.spp);
    p = put_entry_header(p, "image/height", 12, f_ih);
    p = put_int64_feature(p, im.h);
    p = put_entry_header(p, "image/image_data", 16, f_img);
    {
        uint64_t inner = 1 + varint_size(img_len) + img_len;
        *p++ = kind;
        p = put_varint(p, inner);
        *p++ = 0x0A;
        p = put_varint(p, img_len);
        if (!tiff_decode_into(img_data, &im, p, !bytes_mode,
                              chunk_scratch, chunk_cap))
            return 0;
        p += img_len;
    }
    p = put_entry_header(p, "image/width", 11, f_iw);
    p = put_int64_feature(p, im.w);
    p = put_entry_header(p, "target/height", 13, f_th);
    p = put_int64_feature(p, lm.h);
    p = put_entry_header(p, "target/target_data", 18, f_tgt);
    {
        uint64_t inner = 1 + varint_size(tgt_len) + tgt_len;
        *p++ = kind;
        p = put_varint(p, inner);
        *p++ = 0x0A;
        p = put_varint(p, tgt_len);
        if (!tiff_decode_into(lbl_data, &lm, p, !bytes_mode,
                              chunk_scratch, chunk_cap))
            return 0;
        p += tgt_len;
    }
    p = put_entry_header(p, "target/width", 12, f_tw);
    p = put_int64_feature(p, lm.w);

    memcpy(out, &example_len, 8);
    uint32_t hcrc = fc_masked_crc32c(out, 8);
    memcpy(out + 8, &hcrc, 4);
    uint32_t dcrc = fc_masked_crc32c(base, example_len);
    memcpy(out + 12 + example_len, &dcrc, 4);
    return example_len + 16;
}

// Standalone TIFF -> float32 array decode (the training-feed parse
// path for encoded-GeoTIFF records, records/parsers.py
// parse_encoded_gdal_proto_wrapped). Writes (h * w * spp) f32 samples
// row-major chunky into dst. Returns (h << 32) | (w << 16) | spp on
// success (all fit: chips are < 65k px and < 256 bands), 0 on
// fallback-needed (container outside the supported subset).
uint64_t fc_tiff_decode_f32(const uint8_t* data, uint64_t n,
                            uint8_t* dst, uint64_t cap,
                            uint8_t* chunk_scratch, uint64_t chunk_cap) {
    // scratch comes from the caller (a Python thread-local bytearray
    // whose lifetime tracks the thread): a C thread_local here would
    // leak its malloc at every worker-thread exit, and the training
    // feed spawns fresh workers per stream.
    TiffMeta m;
    if (!tiff_parse(data, n, &m)) return 0;
    if (m.w >= (1 << 16) || m.h >= (1 << 16) || m.spp >= 256) return 0;
    uint64_t need = (uint64_t)m.h * m.w * m.spp * 4;
    if (need > cap) return 0;
    if (!tiff_decode_into(data, &m, dst, /*as_float=*/1, chunk_scratch,
                          chunk_cap))
        return 0;
    return ((uint64_t)m.h << 32) | ((uint64_t)m.w << 16)
         | (uint64_t)m.spp;
}

// Whole-shard decoded-array loop: the tifarr counterpart of
// fc_write_shard. Frames (LZW decode + predictor undo + dtype
// conversion included) land directly in the mapped shard; the
// write()-with-rollback loop remains as the fallback.
uint64_t fc_write_shard_tifarr(const char* const* img_paths,
                               const char* const* lbl_paths,
                               const char* const* idents,
                               const uint64_t* ident_lens,
                               uint64_t count, int fd,
                               uint8_t* scratch, uint64_t cap,
                               uint8_t* filebuf, uint64_t filecap,
                               uint8_t* chunkbuf, uint64_t chunkcap,
                               uint8_t* failed) {
    // all scratch comes from the caller (Python thread-locals): C
    // thread_locals leak their mallocs at every worker-thread exit,
    // and the writers spin up fresh thread pools per conversion call.
    FcMap m = {fd, nullptr, 0, 0, 0, 0, 0};
    off_t end = lseek(fd, 0, SEEK_END);
    int mapped = end >= 0;
    if (mapped) {
        m.used = (uint64_t)end;
        mapped = fcmap_window(&m);
        if (!mapped && !fcmap_finish(&m)) return FC_FD_CORRUPT;
    }
    uint64_t written = 0;
    for (uint64_t i = 0; i < count; i++) {
        failed[i] = 1;
        FdFile fimg(img_paths[i]), flbl(lbl_paths[i]);
        if (!fimg.ok() || !flbl.ok()) continue;
        int64_t isz = fimg.len;
        int64_t lsz = flbl.len;
        uint64_t need = (uint64_t)isz + (uint64_t)lsz;
        if (need > filecap) continue;  // oversized pair: Python path
        if (!fimg.pread_all(filebuf, (uint64_t)isz, 0)) continue;
        if (!flbl.pread_all(filebuf + isz, (uint64_t)lsz, 0)) continue;
        uint64_t n = 0;
        if (mapped) {
            FC_MAPPED_ENCODE(m, mapped, n,
                encode_tiff_pair(
                    filebuf, (uint64_t)isz, filebuf + isz,
                    (uint64_t)lsz, (const uint8_t*)idents[i],
                    ident_lens[i], dst, room, chunkbuf, chunkcap,
                    &cap_short));
            if (mapped) {
                if (n == 0) continue;
                m.used += n;
                m.est = n;
                failed[i] = 0;
                written++;
                continue;
            }
        }
        // write()-based fallback
        n = encode_tiff_pair(
            filebuf, (uint64_t)isz, filebuf + isz, (uint64_t)lsz,
            (const uint8_t*)idents[i], ident_lens[i], scratch, cap,
            chunkbuf, chunkcap);
        if (n == 0) continue;
        uint64_t r = write_frame_or_rollback(fd, scratch, n);
        if (r == FC_FD_CORRUPT) return FC_FD_CORRUPT;
        if (r == 0) continue;
        failed[i] = 0;
        written++;
    }
    if (mapped && !fcmap_finish(&m)) return FC_FD_CORRUPT;
    return written;
}

// ---------------------------------------------------------------------------
// PNG decode (training-feed hot path). The reference decodes PNGs with
// tf.io.decode_png inside the parse map
// (_tfrecord_image_translation.py:252-263); this framework's Python
// path uses PIL. PIL is inflate-bound on stock zlib (~1.3 of
// ~1.8 ms/img at 256^2 RGB), so this decoder dlopens libdeflate
// (2-3x faster inflate; whole-buffer API, no streaming window) and
// unfilters in one pass. Scope: the chip contract -- 8-bit depth,
// greyscale (colour type 0) or RGB (2), non-interlaced. Anything else
// returns 0 and the caller falls back to PIL, so behaviour is
// identical across the full format space. No hard link dependency:
// if libdeflate is absent at runtime every call returns 0.
// ---------------------------------------------------------------------------

}  // extern "C"

#include <dlfcn.h>

struct libdeflate_decompressor;
typedef libdeflate_decompressor* (*ld_alloc_fn)();
typedef int (*ld_zlib_fn)(libdeflate_decompressor*, const void*, size_t,
                          void*, size_t, size_t*);
typedef uint32_t (*ld_crc_fn)(uint32_t, const void*, size_t);

static ld_alloc_fn g_ld_alloc = nullptr;
static ld_zlib_fn g_ld_zlib = nullptr;
static ld_crc_fn g_ld_crc = nullptr;

static const bool ld_init_at_load = [] {
    void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_GLOBAL);
    if (!h) return false;
    g_ld_alloc = (ld_alloc_fn)dlsym(h, "libdeflate_alloc_decompressor");
    g_ld_zlib = (ld_zlib_fn)dlsym(h, "libdeflate_zlib_decompress");
    g_ld_crc = (ld_crc_fn)dlsym(h, "libdeflate_crc32");
    if (!g_ld_alloc || !g_ld_zlib || !g_ld_crc) {
        g_ld_alloc = nullptr;
        g_ld_zlib = nullptr;
        g_ld_crc = nullptr;
        return false;
    }
    return true;
}();

// one decompressor per thread (allocation builds internal tables)
static thread_local libdeflate_decompressor* tl_ld = nullptr;

static inline uint32_t be32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16)
         | ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

static inline uint8_t paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return (uint8_t)a;
    if (pb <= pc) return (uint8_t)b;
    return (uint8_t)c;
}

extern "C" {

// Decode an 8-bit non-interlaced grey/RGB PNG into out (h*w*c bytes,
// row-major channel-interleaved). scratch receives the concatenated
// IDAT stream and then the filtered raster (needs >= idat_len +
// h*(w*c+1) bytes; callers pass a generous thread-local buffer).
// Returns (h << 32) | (w << 16) | c, or 0 when the container is
// outside the supported subset / corrupt / libdeflate is unavailable.
uint64_t fc_png_decode(const uint8_t* data, uint64_t len,
                       uint8_t* out, uint64_t out_cap,
                       uint8_t* scratch, uint64_t scratch_cap) {
    static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (!g_ld_zlib || len < 45 || memcmp(data, sig, 8) != 0) return 0;
    // IHDR is mandatory-first (13-byte payload); CRC covers type+data.
    // PIL verifies CRCs on chunks it reads through its chunk stream
    // (IHDR et al.) though not IDAT during lazy load; we validate every
    // critical chunk -- strictly safer, and a rejected container just
    // falls back to PIL for the authoritative verdict.
    if (be32(data + 8) != 13 || memcmp(data + 12, "IHDR", 4) != 0)
        return 0;
    if (g_ld_crc(0, data + 12, 17) != be32(data + 29)) return 0;
    uint32_t w = be32(data + 16);
    uint32_t h = be32(data + 20);
    uint8_t depth = data[24], colour = data[25];
    uint8_t interlace = data[28];
    if (depth != 8 || interlace != 0) return 0;
    uint32_t c;
    if (colour == 0) c = 1;
    else if (colour == 2) c = 3;
    else return 0;  // palette / alpha / 16-bit -> PIL fallback
    if (w == 0 || h == 0 || w > 0xFFFF || h > 0xFFFFFFFFull) return 0;
    uint64_t stride = (uint64_t)w * c;
    uint64_t raster = (stride + 1) * h;  // +1 filter byte per row
    if ((uint64_t)h * stride > out_cap) return 0;

    // concatenate IDAT payloads at the FRONT of scratch; inflate the
    // filtered raster into the back half
    uint64_t pos = 33;  // 8 sig + 25 IHDR chunk
    uint64_t idat = 0;
    while (pos + 12 <= len) {
        uint32_t clen = be32(data + pos);
        const uint8_t* typ = data + pos + 4;
        if (pos + 12 + clen > len) return 0;
        // critical chunks (bit 5 of the first type byte clear) get CRC
        // validation, matching PIL; ancillary chunks are skipped as-is
        if ((typ[0] & 0x20) == 0
            && g_ld_crc(0, typ, clen + 4) != be32(data + pos + 8 + clen))
            return 0;
        if (memcmp(typ, "IDAT", 4) == 0) {
            if (idat + clen > scratch_cap) return 0;
            memcpy(scratch + idat, data + pos + 8, clen);
            idat += clen;
        } else if (memcmp(typ, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + clen;
    }
    if (idat == 0 || idat + raster > scratch_cap) return 0;

    if (!tl_ld) {
        tl_ld = g_ld_alloc();
        if (!tl_ld) return 0;
    }
    uint8_t* filt = scratch + idat;
    size_t got = 0;
    // libdeflate result 0 == LIBDEFLATE_SUCCESS
    if (g_ld_zlib(tl_ld, scratch, idat, filt, raster, &got) != 0
        || got != raster)
        return 0;

    // unfilter rows in place into out. prev = reconstructed row above.
    const uint8_t* prev = nullptr;
    for (uint32_t y = 0; y < h; y++) {
        const uint8_t* src = filt + (uint64_t)y * (stride + 1);
        uint8_t ftype = src[0];
        src++;
        uint8_t* dst = out + (uint64_t)y * stride;
        switch (ftype) {
            case 0:  // None
                memcpy(dst, src, stride);
                break;
            case 1:  // Sub
                for (uint32_t i = 0; i < c; i++) dst[i] = src[i];
                for (uint64_t i = c; i < stride; i++)
                    dst[i] = (uint8_t)(src[i] + dst[i - c]);
                break;
            case 2:  // Up
                if (prev) {
                    for (uint64_t i = 0; i < stride; i++)
                        dst[i] = (uint8_t)(src[i] + prev[i]);
                } else {
                    memcpy(dst, src, stride);
                }
                break;
            case 3:  // Average
                for (uint64_t i = 0; i < stride; i++) {
                    int left = i >= c ? dst[i - c] : 0;
                    int up = prev ? prev[i] : 0;
                    dst[i] = (uint8_t)(src[i] + ((left + up) >> 1));
                }
                break;
            case 4:  // Paeth
                for (uint64_t i = 0; i < stride; i++) {
                    int left = i >= c ? dst[i - c] : 0;
                    int up = prev ? prev[i] : 0;
                    int ul = (prev && i >= c) ? prev[i - c] : 0;
                    dst[i] = (uint8_t)(src[i] + paeth(left, up, ul));
                }
                break;
            default:
                return 0;
        }
        prev = dst;
    }
    return ((uint64_t)h << 32) | ((uint64_t)w << 16) | c;
}

}  // extern "C"
