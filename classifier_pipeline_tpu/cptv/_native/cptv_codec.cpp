// CPTV v2 codec (decoder + encoder), C++ implementation.
//
// CPTV ("Cacophony Project Thermal Video") is the container used by FLIR
// Lepton thermal cameras in the Cacophony ecosystem.  The reference pipeline
// consumes it through an external Rust extension (cptv_rs_python_bindings; see
// reference src/track/cliptrackextractor.py:30).  This file is a clean-room
// reimplementation derived from inspecting real .cptv recordings:
//
//   outer layer : gzip stream
//   magic       : "CPTV" + version byte (2)
//   sections    : 'H' (one header) then repeated 'F' (frames)
//   section body: u8 field-count, then fields of [u8 len][u8 code][len bytes]
//
// Header field codes (all integers little-endian):
//   T u64 timestamp-µs   X u32 width        Y u32 height      C u8 compression
//   D str devicename     E str model        B str brand       V str firmware
//   I u32 device-id      N u32 camera-serial Z u8 fps         P u8 preview-secs
//   M str motion-config  L f32 latitude     O f32 longitude   S u64 loc-ts-µs
//   A f32 altitude       U f32 accuracy     g u8 has-background-frame
//
// Frame field codes:
//   t u32 time-on-ms     c u32 last-ffc-ms  a f32 temp-c      b f32 last-ffc-temp-c
//   w u8 bit-width       f u32 data-size    g u8 is-background-frame
//
// Frame data (compression 1): an i32 LE "first delta" (pixel[0] minus previous
// frame's pixel[0]), then (W*H - 1) signed values bit-packed MSB-first at
// bit-width bits each.  Those values are the derivative, along a boustrophedon
// (snake) scan with odd rows reversed, of the per-pixel difference between this
// frame and the previous frame.  Decoding = cumulative sum along the snake,
// un-snake, add previous frame.  The background frame (if present) is frame 0
// and is chained into the per-frame deltas like any other frame.
#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <mutex>
#include <thread>
#include <utility>
#include <vector>
#include <zlib.h>
#ifdef USE_LIBDEFLATE
#include <libdeflate.h>
#endif
#if defined(__AVX2__)
#include <immintrin.h>
#endif

namespace {

struct FrameMeta {
  uint32_t time_on_ms = 0;
  uint32_t last_ffc_ms = 0;
  float temp_c = 0.f;
  float last_ffc_temp_c = 0.f;
  uint8_t is_background = 0;
};

struct Header {
  uint64_t timestamp_us = 0;
  uint32_t width = 0, height = 0;
  uint8_t compression = 1;
  uint32_t device_id = 0, camera_serial = 0;
  uint8_t fps = 9, preview_secs = 0, has_background = 0;
  float latitude = 0.f, longitude = 0.f, altitude = 0.f, accuracy = 0.f;
  uint64_t loc_timestamp_us = 0;
  std::string devicename, model, brand, firmware, motion_config;
};

struct Reader {
  Header header;
  std::vector<uint16_t> pixels;     // n_frames * W * H
  std::vector<FrameMeta> metas;
  int n_frames = 0;
  std::string error;
  // Upload-ready delta stream, produced during decode (the decoder's inner
  // loop already holds each pixel's frame-to-frame delta; re-deriving it
  // later from two uint16 frames costs a full extra pass over the corpus).
  // Layout matches track/tracker_jax._encode_delta_u16: per frame i>=1 a
  // global int32 shift (rounded mean delta) + int8 residuals; residuals
  // outside [-127, 127] go to an exception list of (flat index, remainder)
  // with flat index = (frame-1)*W*H + pixel.
  std::vector<int8_t> resid;        // (n_frames-1) * W * H
  std::vector<int32_t> shift;       // (n_frames-1)
  std::vector<int32_t> exc_idx;
  std::vector<int32_t> exc_val;
  bool delta_overflow = false;      // per-clip flat index would exceed int32
};

template <typename T>
T read_le(const uint8_t* p) {
  T v;
  memcpy(&v, p, sizeof(T));
  return v;  // little-endian hosts only (x86/arm)
}

bool gunzip_all_zlib(const uint8_t* src, size_t n, std::vector<uint8_t>& out) {
  z_stream zs{};
  if (inflateInit2(&zs, 15 + 32) != Z_OK) return false;
  out.clear();
  out.reserve(n * 6);
  std::vector<uint8_t> buf(1 << 20);
  zs.next_in = const_cast<Bytef*>(src);
  zs.avail_in = static_cast<uInt>(n);
  int ret = Z_OK;
  do {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) { inflateEnd(&zs); return false; }
    out.insert(out.end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
    // Concatenated gzip members: restart inflate on leftover input.
    if (ret == Z_STREAM_END && zs.avail_in > 0) {
      if (inflateReset2(&zs, 15 + 32) != Z_OK) { inflateEnd(&zs); return false; }
      ret = Z_OK;
    }
  } while (ret != Z_STREAM_END);
  inflateEnd(&zs);
  return true;
}

#ifndef USE_LIBDEFLATE
bool gunzip_all(const uint8_t* src, size_t n, std::vector<uint8_t>& out) {
  return gunzip_all_zlib(src, n, out);
}
#else
// libdeflate inflate (~2x zlib on this host; inflate is ~40% of decode
// time). One-shot into a buffer sized from the gzip ISIZE trailer (exact
// for the single-member streams CPTV writers emit); doubling retry +
// zlib fallback keep behavior identical on odd inputs.
bool gunzip_all(const uint8_t* src, size_t n, std::vector<uint8_t>& out) {
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (d == nullptr) return gunzip_all_zlib(src, n, out);
  size_t hint = n >= 18 ? read_le<uint32_t>(src + n - 4) : 0;
  // implausible trailer (corrupt/truncated file, or >1000:1 ratio): size
  // heuristically rather than trusting ISIZE with a multi-GB resize
  if (hint < n || hint > n * 1000 + (1 << 20)) hint = n * 6 + 64;
  out.clear();
  size_t logical = 0, in_pos = 0;
  while (in_pos < n) {
    size_t cap = hint + 64;
    for (;;) {
      try {
        out.resize(logical + cap);
      } catch (const std::bad_alloc&) {
        // don't let OOM escape the extern-C boundary; the streaming zlib
        // path reports failure cleanly
        libdeflate_free_decompressor(d);
        return gunzip_all_zlib(src, n, out);
      }
      size_t actual_in = 0, actual_out = 0;
      libdeflate_result r = libdeflate_gzip_decompress_ex(
          d, src + in_pos, n - in_pos, out.data() + logical, cap,
          &actual_in, &actual_out);
      if (r == LIBDEFLATE_SUCCESS) {
        logical += actual_out;
        in_pos += actual_in;
        break;
      }
      if (r == LIBDEFLATE_INSUFFICIENT_SPACE) {
        cap *= 2;
        continue;
      }
      libdeflate_free_decompressor(d);
      return gunzip_all_zlib(src, n, out);
    }
    // Concatenated gzip members continue only at a gzip magic; anything
    // else is trailer padding.
    if (in_pos + 1 >= n || src[in_pos] != 0x1f || src[in_pos + 1] != 0x8b)
      break;
  }
  libdeflate_free_decompressor(d);
  out.resize(logical);
  return logical > 0;
}
#endif  // USE_LIBDEFLATE

class FieldParser {
 public:
  FieldParser(const uint8_t* data, size_t size, size_t pos) : d_(data), n_(size), pos_(pos) {}
  // Parses one section's fields; calls cb(code, ptr, len).
  template <typename CB>
  bool parse(CB cb) {
    if (pos_ >= n_) return false;
    unsigned count = d_[pos_++];
    for (unsigned i = 0; i < count; i++) {
      if (pos_ + 2 > n_) return false;
      unsigned len = d_[pos_];
      char code = static_cast<char>(d_[pos_ + 1]);
      pos_ += 2;
      if (pos_ + len > n_) return false;
      cb(code, d_ + pos_, len);
      pos_ += len;
    }
    return true;
  }
  size_t pos() const { return pos_; }

 private:
  const uint8_t* d_;
  size_t n_;
  size_t pos_;
};

#if defined(__AVX2__)
// Vectorized MSB-first bit-field unpack: adj[i] = sign-extended w_bits-wide
// value number i of the packed stream. Requires w_bits <= 24 (a field plus
// its <=7 leading slack bits must fit one 32-bit load). 8 values per
// iteration: dword gather at byte offsets, byte-swap, variable shift, mask,
// sign-extend.
static void unpack_bits_avx2(const uint8_t* packed, size_t nbytes, int n,
                             int w_bits, int32_t* adj) {
  const uint32_t sign_bit = 1u << (w_bits - 1);
  const uint32_t mask = (1u << w_bits) - 1;
  int i = 0;
  const __m256i vlane = _mm256_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7);
  const __m256i bswap = _mm256_setr_epi8(
      3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13, 12,
      3, 2, 1, 0, 7, 6, 5, 4, 11, 10, 9, 8, 15, 14, 13, 12);
  const __m256i vsign = _mm256_set1_epi32((int)sign_bit);
  const __m256i vseven = _mm256_set1_epi32(7);
  const __m256i vw = _mm256_set1_epi32(w_bits);
  for (; i + 8 <= n; i += 8) {
    const long long last_bit = (long long)(i + 7) * w_bits;
    if ((size_t)((last_bit >> 3) + 4) > nbytes) break;  // tail: scalar
    __m256i vi = _mm256_add_epi32(_mm256_set1_epi32(i), vlane);
    __m256i vo = _mm256_mullo_epi32(vi, vw);
    __m256i vbyte = _mm256_srli_epi32(vo, 3);
    __m256i vrem = _mm256_and_si256(vo, vseven);
    __m256i raw = _mm256_i32gather_epi32((const int*)packed, vbyte, 1);
    raw = _mm256_shuffle_epi8(raw, bswap);      // LE load -> big-endian value
    raw = _mm256_sllv_epi32(raw, vrem);         // drop leading slack bits
    raw = _mm256_srli_epi32(raw, 32 - w_bits);  // keep the field
    raw = _mm256_sub_epi32(_mm256_xor_si256(raw, vsign), vsign);  // sign ext
    _mm256_storeu_si256((__m256i*)(adj + i), raw);
  }
  for (; i < n; i++) {  // scalar tail (also covers the last <4 bytes)
    const long long o = (long long)i * w_bits;
    size_t b = (size_t)(o >> 3);
    const int rem = (int)(o & 7);
    uint32_t word = 0;
    int loaded = 0;
    for (; loaded < 4 && b + loaded < nbytes; loaded++)
      word = (word << 8) | packed[b + loaded];
    if (loaded > 0 && loaded < 4) word <<= (4 - loaded) * 8;
    // loaded == 0 (field starts past the buffer): word stays 0 — garbage-in
    // for a truncated frame, but defined (a shift by 32 would be UB)
    uint32_t raw = (word << rem) >> (32 - w_bits);
    int32_t v = (int32_t)(raw & mask);
    if (raw & sign_bit) v -= (int32_t)mask + 1;
    adj[i] = v;
  }
}

// In-place running (prefix) sum of n int32 values, matching the scalar
// accumulation mod 2^32.
static void prefix_sum_avx2(int32_t* vals, int n) {
  int i = 0;
  __m256i carry = _mm256_setzero_si256();
  const __m256i bcast7 = _mm256_set1_epi32(7);
  const __m256i bcast3 = _mm256_set1_epi32(3);
  for (; i + 8 <= n; i += 8) {
    __m256i x = _mm256_loadu_si256((const __m256i*)(vals + i));
    x = _mm256_add_epi32(x, _mm256_slli_si256(x, 4));
    x = _mm256_add_epi32(x, _mm256_slli_si256(x, 8));
    // propagate low 128-lane total into the high lane
    __m256i lowtot = _mm256_permutevar8x32_epi32(x, bcast3);
    lowtot = _mm256_blend_epi32(lowtot, _mm256_setzero_si256(), 0x0F);
    x = _mm256_add_epi32(x, lowtot);
    x = _mm256_add_epi32(x, carry);
    _mm256_storeu_si256((__m256i*)(vals + i), x);
    carry = _mm256_permutevar8x32_epi32(x, bcast7);
  }
  int32_t c = i ? vals[i - 1] : 0;
  for (; i < n; i++) {
    c += vals[i];
    vals[i] = c;
  }
}

static int64_t sum_i32_as_i64_avx2(const int32_t* v, int n) {
  __m256i acc = _mm256_setzero_si256();  // 4 x int64 partials
  int i = 0;
  for (; i + 8 <= n; i += 8) {
    __m256i x = _mm256_loadu_si256((const __m256i*)(v + i));
    acc = _mm256_add_epi64(
        acc, _mm256_cvtepi32_epi64(_mm256_castsi256_si128(x)));
    acc = _mm256_add_epi64(
        acc, _mm256_cvtepi32_epi64(_mm256_extracti128_si256(x, 1)));
  }
  alignas(32) int64_t tmp[4];
  _mm256_store_si256((__m256i*)tmp, acc);
  int64_t s = tmp[0] + tmp[1] + tmp[2] + tmp[3];
  for (; i < n; i++) s += v[i];
  return s;
}

// Fused row pass over one frame's prefix-summed snake values: snake
// un-reversal + uint16 reconstruction (prev + delta, mod 2^16) + int8
// residual emission (delta - shift, clamped, exceptions appended in
// row-major order) in a single sweep. Replaces three separate scans (out
// rows, dsum re-scan, scalar resid pass) — bit-identical to them.
static void fused_rows_avx2(const int32_t* vals, const uint16_t* prev,
                            uint16_t* out, int8_t* resid, int32_t s,
                            int width, int height, int64_t base_idx,
                            std::vector<int32_t>& exc_idx,
                            std::vector<int32_t>& exc_val) {
  const __m256i rev = _mm256_setr_epi32(7, 6, 5, 4, 3, 2, 1, 0);
  const __m256i vs = _mm256_set1_epi32(s);
  const __m256i lo16 = _mm256_set1_epi32(0xFFFF);
  const __m256i cmin = _mm256_set1_epi32(-127);
  const __m256i cmax = _mm256_set1_epi32(127);
  for (int row = 0; row < height; row++) {
    const int32_t* vrow = vals + (size_t)row * width;
    const uint16_t* prow = prev + (size_t)row * width;
    uint16_t* orow = out + (size_t)row * width;
    int8_t* rrow = resid + (size_t)row * width;
    const bool revrow = row & 1;
    int c = 0;
    for (; c + 8 <= width; c += 8) {
      __m256i d;
      if (revrow) {
        // output cols c..c+7 read vrow[w-1-c .. w-8-c]
        d = _mm256_loadu_si256((const __m256i*)(vrow + width - 8 - c));
        d = _mm256_permutevar8x32_epi32(d, rev);
      } else {
        d = _mm256_loadu_si256((const __m256i*)(vrow + c));
      }
      __m256i p = _mm256_cvtepu16_epi32(
          _mm_loadu_si128((const __m128i*)(prow + c)));
      __m256i o = _mm256_and_si256(_mm256_add_epi32(p, d), lo16);
      // packus saturation can't trigger: values already masked to 16 bits
      __m128i o16 = _mm_packus_epi32(_mm256_castsi256_si128(o),
                                     _mm256_extracti128_si256(o, 1));
      _mm_storeu_si128((__m128i*)(orow + c), o16);
      __m256i dm = _mm256_sub_epi32(d, vs);
      __m256i cl = _mm256_min_epi32(_mm256_max_epi32(dm, cmin), cmax);
      __m128i w16 = _mm_packs_epi32(_mm256_castsi256_si128(cl),
                                    _mm256_extracti128_si256(cl, 1));
      __m128i b8 = _mm_packs_epi16(w16, w16);
      _mm_storel_epi64((__m128i*)(rrow + c), b8);
      __m256i eq = _mm256_cmpeq_epi32(dm, cl);
      if (_mm256_movemask_epi8(eq) != -1) {  // rare: clamped residual(s)
        alignas(32) int32_t dd[8], cc[8];
        _mm256_store_si256((__m256i*)dd, dm);
        _mm256_store_si256((__m256i*)cc, cl);
        for (int k = 0; k < 8; k++)
          if (dd[k] != cc[k]) {
            exc_idx.push_back(
                (int32_t)(base_idx + (int64_t)row * width + c + k));
            exc_val.push_back(dd[k] - cc[k]);
          }
      }
    }
    for (; c < width; c++) {  // width % 8 tail
      int32_t dv = revrow ? vrow[width - 1 - c] : vrow[c];
      orow[c] = (uint16_t)((int32_t)prow[c] + dv);
      int32_t dm = dv - s;
      int32_t cl = dm < -127 ? -127 : (dm > 127 ? 127 : dm);
      rrow[c] = (int8_t)cl;
      if (dm != cl) {
        exc_idx.push_back((int32_t)(base_idx + (int64_t)row * width + c));
        exc_val.push_back(dm - cl);
      }
    }
  }
}
#endif  // __AVX2__

// Decodes one frame's packed data into `out` given the previous frame.
// When `dscratch` is non-null (and prev is non-null), also writes the
// row-major per-pixel delta (cur - prev) and returns its int64 sum — the
// ingredients of the upload delta stream (see Reader::resid).
// `vals_scratch` (npix int32) enables the vectorized path.
int64_t decode_frame_data_scalar(const uint8_t* data, size_t size, int w_bits,
                                 int width, int height, const uint16_t* prev,
                                 uint16_t* out, int32_t* dscratch) {
  const int npix = width * height;
  int32_t value = read_le<int32_t>(data);  // snake-order running delta
  const uint8_t* packed = data + 4;
  uint64_t bitbuf = 0;
  int nbits = 0;
  size_t bytepos = 0;
  const size_t nbytes = size - 4;
  const uint32_t sign_bit = 1u << (w_bits - 1);
  const uint32_t mask = (w_bits >= 32) ? 0xffffffffu : ((1u << w_bits) - 1);
  // row-major outer loop with a direction flip per row (snake scan): no
  // per-pixel div/mod, prev-null hoisted, and the bit reader refills up to
  // 32 bits at a time (w_bits <= 32, so one refill per pixel suffices)
  (void)npix;
  const int32_t signed_bias = static_cast<int32_t>(mask) + 1;
  int64_t dsum = 0;
  bool first = true;
  for (int row = 0; row < height; row++) {
    uint16_t* orow = out + static_cast<size_t>(row) * width;
    const uint16_t* prow =
        prev ? prev + static_cast<size_t>(row) * width : nullptr;
    int32_t* drow =
        (dscratch && prev) ? dscratch + static_cast<size_t>(row) * width
                           : nullptr;
    const bool rev = row & 1;
    for (int c = 0; c < width; c++) {
      if (!first) {
        if (nbits < w_bits) {
          // bulk refill: one unaligned big-endian 64-bit load replaces up
          // to 7 byte-at-a-time appends (the bit unpack is the decoder's
          // hot loop — ~2.7M values per clip)
          if (bytepos + 8 <= nbytes) {
            uint64_t chunk;
            memcpy(&chunk, packed + bytepos, 8);
            chunk = __builtin_bswap64(chunk);
            const int take = (63 - nbits) >> 3;  // >= 4 when nbits < 32
            bitbuf = (bitbuf << (take * 8)) | (chunk >> (64 - take * 8));
            bytepos += take;
            nbits += take * 8;
          } else {
            while (nbits <= 56 && bytepos < nbytes) {
              bitbuf = (bitbuf << 8) | packed[bytepos++];
              nbits += 8;
            }
            if (nbits < w_bits) {
              // truncated payload (fewer packed bits than npix values):
              // zero-pad the tail instead of shifting by a negative count
              bitbuf <<= (w_bits - nbits);
              nbits = w_bits;
            }
          }
        }
        uint32_t raw =
            static_cast<uint32_t>(bitbuf >> (nbits - w_bits)) & mask;
        nbits -= w_bits;
        int32_t adj = static_cast<int32_t>(raw);
        if (raw & sign_bit) adj -= signed_bias;
        value += adj;
      }
      first = false;
      const int col = rev ? width - 1 - c : c;
      orow[col] = static_cast<uint16_t>(
          (prow ? static_cast<int32_t>(prow[col]) : 0) + value);
      if (drow) {
        drow[col] = value;
        dsum += value;
      }
    }
  }
  return dsum;
}

// Dispatcher: vectorized unpack + prefix sum + row pass when available,
// scalar fallback otherwise. Bit-identical results (int32 arithmetic mod
// 2^32 in both paths).
int64_t decode_frame_data(const uint8_t* data, size_t size, int w_bits,
                          int width, int height, const uint16_t* prev,
                          uint16_t* out, int32_t* dscratch,
                          int32_t* vals_scratch) {
#if defined(__AVX2__)
  const int npix = width * height;
  if (vals_scratch && w_bits >= 2 && w_bits <= 24 && size >= 4) {
    int32_t* vals = vals_scratch;
    vals[0] = read_le<int32_t>(data);
    unpack_bits_avx2(data + 4, size - 4, npix - 1, w_bits, vals + 1);
    prefix_sum_avx2(vals, npix);  // snake-order running values
    int64_t dsum = 0;
    for (int row = 0; row < height; row++) {
      const int32_t* vrow = vals + (size_t)row * width;
      uint16_t* orow = out + (size_t)row * width;
      const uint16_t* prow =
          prev ? prev + (size_t)row * width : nullptr;
      int32_t* drow =
          (dscratch && prev) ? dscratch + (size_t)row * width : nullptr;
      if (row & 1) {  // snake: odd rows reversed
        if (prow) {
          for (int c = 0; c < width; c++)
            orow[c] = (uint16_t)((int32_t)prow[c] + vrow[width - 1 - c]);
          if (drow)
            for (int c = 0; c < width; c++) drow[c] = vrow[width - 1 - c];
        } else {
          for (int c = 0; c < width; c++)
            orow[c] = (uint16_t)vrow[width - 1 - c];
        }
      } else {
        if (prow) {
          for (int c = 0; c < width; c++)
            orow[c] = (uint16_t)((int32_t)prow[c] + vrow[c]);
          if (drow) memcpy(drow, vrow, width * sizeof(int32_t));
        } else {
          for (int c = 0; c < width; c++) orow[c] = (uint16_t)vrow[c];
        }
      }
    }
    if (dscratch && prev) {
      for (int i = 0; i < npix; i++) dsum += dscratch[i];
    }
    return dsum;
  }
#else
  (void)vals_scratch;
#endif
  return decode_frame_data_scalar(data, size, w_bits, width, height, prev,
                                  out, dscratch);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- reader ----

void* cptv_open(const uint8_t* buf, size_t size) {
  auto* r = new Reader();
  std::vector<uint8_t> data;
  if (!gunzip_all(buf, size, data)) {
    r->error = "gzip decompression failed";
    return r;
  }
  if (data.size() < 6 || memcmp(data.data(), "CPTV", 4) != 0) {
    r->error = "bad magic";
    return r;
  }
  if (data[4] != 2) {
    r->error = "unsupported CPTV version";
    return r;
  }
  size_t pos = 5;
  if (static_cast<char>(data[pos]) != 'H') {
    r->error = "expected header section";
    return r;
  }
  pos++;
  Header& h = r->header;
  FieldParser hp(data.data(), data.size(), pos);
  bool ok = hp.parse([&](char code, const uint8_t* p, unsigned len) {
    switch (code) {
      case 'T': h.timestamp_us = read_le<uint64_t>(p); break;
      case 'X': h.width = read_le<uint32_t>(p); break;
      case 'Y': h.height = read_le<uint32_t>(p); break;
      case 'C': h.compression = p[0]; break;
      case 'D': h.devicename.assign(reinterpret_cast<const char*>(p), len); break;
      case 'E': h.model.assign(reinterpret_cast<const char*>(p), len); break;
      case 'B': h.brand.assign(reinterpret_cast<const char*>(p), len); break;
      case 'V': h.firmware.assign(reinterpret_cast<const char*>(p), len); break;
      case 'M': h.motion_config.assign(reinterpret_cast<const char*>(p), len); break;
      case 'I': h.device_id = read_le<uint32_t>(p); break;
      case 'N': h.camera_serial = read_le<uint32_t>(p); break;
      case 'Z': h.fps = p[0]; break;
      case 'P': h.preview_secs = p[0]; break;
      case 'L': h.latitude = read_le<float>(p); break;
      case 'O': h.longitude = read_le<float>(p); break;
      case 'S': h.loc_timestamp_us = read_le<uint64_t>(p); break;
      case 'A': h.altitude = read_le<float>(p); break;
      case 'U': h.accuracy = read_le<float>(p); break;
      case 'g': h.has_background = p[0]; break;
      default: break;  // forward compatible: skip unknown fields
    }
  });
  if (!ok) {
    r->error = "truncated header";
    return r;
  }
  pos = hp.pos();
  const int W = static_cast<int>(h.width), H = static_cast<int>(h.height);
  if (W <= 0 || H <= 0 || W > 4096 || H > 4096) {
    r->error = "bad resolution";
    return r;
  }
  const int npix = W * H;
  std::vector<int32_t> dscratch(npix);  // L2-resident per-frame delta
  std::vector<int32_t> vals(npix);      // decode scratch (vector path)
  // frame-count estimate from the inflated size: one reserve avoids both
  // repeated reallocs and the per-frame prev-frame copy (prev is a pointer
  // into the pixels buffer, kept valid by reserving capacity up front)
  r->pixels.reserve(((data.size() / (npix / 3 + 64)) + 8) * npix);
  while (pos < data.size()) {
    if (static_cast<char>(data[pos]) != 'F') {
      r->error = "unexpected section";
      return r;
    }
    pos++;
    FrameMeta meta;
    uint32_t fsize = 0;
    int w_bits = 0;
    FieldParser fp(data.data(), data.size(), pos);
    ok = fp.parse([&](char code, const uint8_t* p, unsigned len) {
      switch (code) {
        case 't': meta.time_on_ms = read_le<uint32_t>(p); break;
        case 'c': meta.last_ffc_ms = read_le<uint32_t>(p); break;
        case 'a': meta.temp_c = read_le<float>(p); break;
        case 'b': meta.last_ffc_temp_c = read_le<float>(p); break;
        case 'w': w_bits = p[0]; break;
        case 'f': fsize = read_le<uint32_t>(p); break;
        case 'g': meta.is_background = p[0]; break;
        default: break;
      }
    });
    if (!ok) {
      r->error = "truncated frame header";
      return r;
    }
    pos = fp.pos();
    if (fsize < 4 || pos + fsize > data.size() || w_bits < 1 || w_bits > 32) {
      r->error = "bad frame data";
      return r;
    }
    size_t base = r->pixels.size();
    r->pixels.resize(base + npix);
    // prev = previous frame in the pixels buffer; pointer taken AFTER the
    // resize so a realloc can't invalidate it
    const uint16_t* prevp =
        r->n_frames == 0 ? nullptr : r->pixels.data() + base - npix;
    const int fi = r->n_frames - 1;  // resid/shift row index (frames >= 1)
    if (r->n_frames > 0 && (int64_t)(fi + 1) * npix > INT32_MAX)
      r->delta_overflow = true;
    bool fused = false;
#if defined(__AVX2__)
    if (r->n_frames > 0 && !r->delta_overflow && w_bits >= 2 &&
        w_bits <= 24 && fsize >= 4) {
      // fused fast path: one sweep produces the uint16 frame AND the
      // upload residual stream; no dscratch materialization or re-scan
      int32_t* v = vals.data();
      v[0] = read_le<int32_t>(data.data() + pos);
      unpack_bits_avx2(data.data() + pos + 4, fsize - 4, npix - 1, w_bits,
                       v + 1);
      prefix_sum_avx2(v, npix);  // snake-order per-pixel frame deltas
      const int64_t dsum = sum_i32_as_i64_avx2(v, npix);
      const int32_t s =
          static_cast<int32_t>(llround(static_cast<double>(dsum) / npix));
      r->shift.push_back(s);
      r->resid.resize(static_cast<size_t>(fi + 1) * npix);
      fused_rows_avx2(v, prevp, r->pixels.data() + base,
                      r->resid.data() + static_cast<size_t>(fi) * npix, s,
                      W, H, (int64_t)fi * npix, r->exc_idx, r->exc_val);
      fused = true;
    }
#endif
    if (!fused) {
      int64_t dsum = decode_frame_data(data.data() + pos, fsize, w_bits, W,
                                       H, prevp, r->pixels.data() + base,
                                       dscratch.data(), vals.data());
      if (r->n_frames > 0 && !r->delta_overflow) {
        // fold this frame's deltas into the upload stream while they're
        // hot. (On delta_overflow — flat exception indices past int32,
        // ~3.4h clip at 160x120 — the stream is unusable; callers fall
        // back to the batch re-encoder, cptv_num_exceptions reports -1.)
        const int32_t s =
            static_cast<int32_t>(llround(static_cast<double>(dsum) / npix));
        r->shift.push_back(s);
        r->resid.resize(static_cast<size_t>(fi + 1) * npix);
        int8_t* rr = r->resid.data() + static_cast<size_t>(fi) * npix;
        const int32_t* dd = dscratch.data();
        for (int i = 0; i < npix; i++) {
          int32_t d = dd[i] - s;
          int32_t c = d < -127 ? -127 : (d > 127 ? 127 : d);
          rr[i] = static_cast<int8_t>(c);
          if (d != c) {
            r->exc_idx.push_back(fi * npix + i);
            r->exc_val.push_back(d - c);
          }
        }
      }
    }
    r->metas.push_back(meta);
    r->n_frames++;
    pos += fsize;
  }
  return r;
}

void* cptv_open_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    auto* r = new Reader();
    r->error = "cannot open file";
    return r;
  }
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  size_t got = fread(buf.data(), 1, size, f);
  fclose(f);
  if (static_cast<long>(got) != size) {
    auto* r = new Reader();
    r->error = "short read";
    return r;
  }
  return cptv_open(buf.data(), buf.size());
}

const char* cptv_error(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

int cptv_num_frames(void* h) { return static_cast<Reader*>(h)->n_frames; }

// Header accessors. String getters return internal pointers valid until close.
uint64_t cptv_timestamp_us(void* h) { return static_cast<Reader*>(h)->header.timestamp_us; }
uint32_t cptv_width(void* h) { return static_cast<Reader*>(h)->header.width; }
uint32_t cptv_height(void* h) { return static_cast<Reader*>(h)->header.height; }
uint32_t cptv_device_id(void* h) { return static_cast<Reader*>(h)->header.device_id; }
uint32_t cptv_camera_serial(void* h) { return static_cast<Reader*>(h)->header.camera_serial; }
uint8_t cptv_fps(void* h) { return static_cast<Reader*>(h)->header.fps; }
uint8_t cptv_preview_secs(void* h) { return static_cast<Reader*>(h)->header.preview_secs; }
uint8_t cptv_has_background(void* h) { return static_cast<Reader*>(h)->header.has_background; }
float cptv_latitude(void* h) { return static_cast<Reader*>(h)->header.latitude; }
float cptv_longitude(void* h) { return static_cast<Reader*>(h)->header.longitude; }
float cptv_altitude(void* h) { return static_cast<Reader*>(h)->header.altitude; }
float cptv_accuracy(void* h) { return static_cast<Reader*>(h)->header.accuracy; }
uint64_t cptv_loc_timestamp_us(void* h) { return static_cast<Reader*>(h)->header.loc_timestamp_us; }
const char* cptv_devicename(void* h) { return static_cast<Reader*>(h)->header.devicename.c_str(); }
const char* cptv_model(void* h) { return static_cast<Reader*>(h)->header.model.c_str(); }
const char* cptv_brand(void* h) { return static_cast<Reader*>(h)->header.brand.c_str(); }
const char* cptv_firmware(void* h) { return static_cast<Reader*>(h)->header.firmware.c_str(); }
const char* cptv_motion_config(void* h) { return static_cast<Reader*>(h)->header.motion_config.c_str(); }

// Copies the per-frame metadata into the caller's buffer. meta layout per
// frame: [time_on_ms u32, last_ffc_ms u32, is_background u32, temp_c f32,
// last_ffc_temp_c f32] as 5 u32 slots.
int cptv_read_meta(void* h, uint32_t* meta) {
  auto* r = static_cast<Reader*>(h);
  if (!r->error.empty()) return -1;
  for (int i = 0; i < r->n_frames; i++) {
    const FrameMeta& m = r->metas[i];
    meta[i * 5 + 0] = m.time_on_ms;
    meta[i * 5 + 1] = m.last_ffc_ms;
    meta[i * 5 + 2] = m.is_background;
    memcpy(&meta[i * 5 + 3], &m.temp_c, 4);
    memcpy(&meta[i * 5 + 4], &m.last_ffc_temp_c, 4);
  }
  return r->n_frames;
}

// Copies all frames into caller-provided buffers. pixels: n*W*H u16.
// (Compatibility path; the Python wrapper normally uses the zero-copy
// pointer accessors below and keeps the handle alive instead.)
int cptv_read_all(void* h, uint16_t* pixels, uint32_t* meta) {
  auto* r = static_cast<Reader*>(h);
  if (!r->error.empty()) return -1;
  memcpy(pixels, r->pixels.data(), r->pixels.size() * sizeof(uint16_t));
  return cptv_read_meta(h, meta);
}

// Zero-copy accessors: pointers into the Reader's own decode buffers, valid
// until cptv_close. The Python wrapper wraps these as numpy arrays whose
// base object owns the handle — decode then costs no output memcpy at all
// (the read_all + read_delta copies were ~22MB/clip of pure memory traffic
// plus fresh-numpy page faults on a one-core host).
const uint16_t* cptv_pixels_ptr(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r->error.empty() ? r->pixels.data() : nullptr;
}
const int8_t* cptv_resid_ptr(void* h) {
  return static_cast<Reader*>(h)->resid.data();
}
const int32_t* cptv_shift_ptr(void* h) {
  return static_cast<Reader*>(h)->shift.data();
}
const int32_t* cptv_exc_idx_ptr(void* h) {
  return static_cast<Reader*>(h)->exc_idx.data();
}
const int32_t* cptv_exc_val_ptr(void* h) {
  return static_cast<Reader*>(h)->exc_val.data();
}

void cptv_close(void* h) { delete static_cast<Reader*>(h); }

// Upload-ready delta stream accessors (see Reader::resid). n_exceptions is
// the exception-list length; cptv_read_delta copies residuals/shifts and up
// to `cap` exceptions into caller buffers, returning the exception count.
long long cptv_num_exceptions(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r->delta_overflow) return -1;  // stream unusable: fall back
  return static_cast<long long>(r->exc_idx.size());
}

long long cptv_read_delta(void* h, int8_t* resid, int32_t* shift,
                          int32_t* exc_idx, int32_t* exc_val, long long cap) {
  auto* r = static_cast<Reader*>(h);
  if (!r->error.empty() || r->n_frames < 2 || r->delta_overflow) return -1;
  memcpy(resid, r->resid.data(), r->resid.size());
  memcpy(shift, r->shift.data(), r->shift.size() * sizeof(int32_t));
  long long n = std::min<long long>(cap, (long long)r->exc_idx.size());
  memcpy(exc_idx, r->exc_idx.data(), n * sizeof(int32_t));
  memcpy(exc_val, r->exc_val.data(), n * sizeof(int32_t));
  return static_cast<long long>(r->exc_idx.size());
}

// ---------------------------------------------------- 4-bit residual pack ----
// The upload residual stream is int8 per pixel, but ~98% of thermal frame
// residuals fit a signed nibble [-8, 7]. Packing two pixels per byte halves
// the (dominant) host->device upload bytes; the clamp remainders ride the
// existing exception scatter (value = resid - clamp, applied additively on
// device alongside the u16-level exceptions, so duplicate indices compose).
// Pixel 2k -> low nibble of byte k, pixel 2k+1 -> high nibble; the device
// inverse sign-extends with arithmetic shifts (tracker_jax._split_delta_fused).

// Count of residuals outside [-8, 7] (the exception-list size pack4_emit_i8
// will produce), so callers can size exact buffers before packing.
long long pack4_count_i8(const int8_t* resid, long long n) {
  long long cnt = 0;
  long long i = 0;
#if defined(__AVX2__)
  const __m256i lo = _mm256_set1_epi8(-8);
  const __m256i hi = _mm256_set1_epi8(7);
  for (; i + 32 <= n; i += 32) {
    __m256i v = _mm256_loadu_si256((const __m256i*)(resid + i));
    __m256i in = _mm256_and_si256(_mm256_cmpgt_epi8(v, _mm256_sub_epi8(lo, _mm256_set1_epi8(1))),
                                  _mm256_cmpgt_epi8(_mm256_add_epi8(hi, _mm256_set1_epi8(1)), v));
    cnt += 32 - __builtin_popcount((unsigned)_mm256_movemask_epi8(in));
  }
#endif
  for (; i < n; i++) {
    int v = resid[i];
    if (v < -8 || v > 7) cnt++;
  }
  return cnt;
}

// Pack n int8 residuals (n even) into n/2 bytes, clamping to [-8, 7].
// Out-of-range remainders append (base_idx + i, resid[i] - clamp) to
// exc_idx/exc_val, which the caller sized via pack4_count_i8.
// Returns the emitted exception count.
long long pack4_emit_i8(const int8_t* resid, long long n, uint8_t* packed,
                        int32_t* exc_idx, int32_t* exc_val,
                        long long base_idx) {
  long long k = 0;
  long long i = 0;
#if defined(__AVX2__)
  const __m256i cmin = _mm256_set1_epi8(-8);
  const __m256i cmax = _mm256_set1_epi8(7);
  const __m256i m0f16 = _mm256_set1_epi16(0x000F);
  const __m256i mf016 = _mm256_set1_epi16(0x00F0);
  for (; i + 32 <= n; i += 32) {
    __m256i v = _mm256_loadu_si256((const __m256i*)(resid + i));
    __m256i c = _mm256_min_epi8(_mm256_max_epi8(v, cmin), cmax);
    // per 16-bit lane: even byte -> low nibble, odd byte -> high nibble
    __m256i ev = _mm256_and_si256(c, m0f16);
    __m256i od = _mm256_and_si256(_mm256_srli_epi16(c, 4), mf016);
    __m256i b16 = _mm256_or_si256(ev, od);  // packed byte in each u16's low 8
    // u16 -> u8 (values <= 0xFF so packus never saturates); fix lane order
    __m256i p = _mm256_packus_epi16(b16, _mm256_permute2x128_si256(b16, b16, 1));
    _mm_storeu_si128((__m128i*)(packed + i / 2), _mm256_castsi256_si128(p));
    __m256i eq = _mm256_cmpeq_epi8(v, c);
    unsigned m = ~(unsigned)_mm256_movemask_epi8(eq);
    if (m) {  // rare: clamped residual(s) — walk only the set bits
      alignas(32) int8_t vv[32], cc[32];
      _mm256_store_si256((__m256i*)vv, v);
      _mm256_store_si256((__m256i*)cc, c);
      do {
        int j = __builtin_ctz(m);
        m &= m - 1;
        exc_idx[k] = (int32_t)(base_idx + i + j);
        exc_val[k] = (int32_t)vv[j] - cc[j];
        k++;
      } while (m);
    }
  }
#endif
  for (; i < n; i += 2) {
    int out = 0;
    for (int j = 0; j < 2; j++) {
      int v = resid[i + j];
      int c = v < -8 ? -8 : (v > 7 ? 7 : v);
      if (v != c) {
        exc_idx[k] = (int32_t)(base_idx + i + j);
        exc_val[k] = v - c;
        k++;
      }
      out |= (c & 0x0F) << (4 * j);
    }
    packed[i / 2] = (uint8_t)out;
  }
  return k;
}

// ---------------------------------------------------------------- writer ----

struct Writer {
  gzFile gz = nullptr;
  int width = 0, height = 0;
  std::vector<uint16_t> prev;
  bool first = true;
  std::string error;
};

static void put_field(std::string& out, char code, const void* data, uint8_t len) {
  out.push_back(static_cast<char>(len));
  out.push_back(code);
  out.append(reinterpret_cast<const char*>(data), len);
}

static void put_str_field(std::string& out, char code, const char* s) {
  size_t len = strlen(s);
  if (len > 255) len = 255;
  put_field(out, code, s, static_cast<uint8_t>(len));
}

void* cptv_writer_open(const char* path, uint32_t width, uint32_t height,
                       uint64_t timestamp_us, const char* devicename,
                       const char* model, const char* brand, uint32_t device_id,
                       uint8_t fps, uint8_t preview_secs, uint8_t has_background,
                       float latitude, float longitude) {
  auto* w = new Writer();
  w->width = static_cast<int>(width);
  w->height = static_cast<int>(height);
  w->prev.assign(width * height, 0);
  w->gz = gzopen(path, "wb6");
  if (!w->gz) {
    w->error = "cannot open output";
    return w;
  }
  std::string fields;
  uint8_t compression = 1;
  put_field(fields, 'T', &timestamp_us, 8);
  put_field(fields, 'X', &width, 4);
  put_field(fields, 'Y', &height, 4);
  put_field(fields, 'C', &compression, 1);
  put_field(fields, 'Z', &fps, 1);
  put_field(fields, 'P', &preview_secs, 1);
  put_field(fields, 'I', &device_id, 4);
  if (has_background) put_field(fields, 'g', &has_background, 1);
  if (latitude != 0.f) put_field(fields, 'L', &latitude, 4);
  if (longitude != 0.f) put_field(fields, 'O', &longitude, 4);
  int count = 7 + (has_background ? 1 : 0) + (latitude != 0.f) + (longitude != 0.f);
  if (devicename && devicename[0]) { put_str_field(fields, 'D', devicename); count++; }
  if (model && model[0]) { put_str_field(fields, 'E', model); count++; }
  if (brand && brand[0]) { put_str_field(fields, 'B', brand); count++; }
  std::string out = "CPTV";
  out.push_back(2);
  out.push_back('H');
  out.push_back(static_cast<char>(count));
  out += fields;
  gzwrite(w->gz, out.data(), static_cast<unsigned>(out.size()));
  return w;
}

const char* cptv_writer_error(void* h) {
  auto* w = static_cast<Writer*>(h);
  return w->error.empty() ? nullptr : w->error.c_str();
}

int cptv_writer_write_frame(void* h, const uint16_t* pix, uint32_t time_on_ms,
                            uint32_t last_ffc_ms, float temp_c,
                            float last_ffc_temp_c, uint8_t is_background) {
  auto* w = static_cast<Writer*>(h);
  if (!w->gz) return -1;
  const int W = w->width, H = w->height, npix = W * H;
  // Per-pixel delta vs previous frame, in snake order.
  std::vector<int32_t> snake(npix);
  for (int row = 0; row < H; row++) {
    for (int col = 0; col < W; col++) {
      int src = row * W + col;
      int dst = row * W + ((row & 1) ? (W - 1 - col) : col);
      snake[dst] = static_cast<int32_t>(pix[src]) -
                   static_cast<int32_t>(w->first ? 0 : w->prev[src]);
    }
  }
  // Derivative along the snake; find needed bit width for values [1..].
  int32_t prev_v = snake[0];
  int32_t max_abs = 0;
  std::vector<int32_t> adj(npix - 1);
  for (int i = 1; i < npix; i++) {
    adj[i - 1] = snake[i] - prev_v;
    prev_v = snake[i];
    int32_t a = adj[i - 1] < 0 ? -adj[i - 1] - 1 : adj[i - 1];
    if (a > max_abs) max_abs = a;
  }
  int w_bits = 2;
  while (w_bits < 32 && (max_abs >> (w_bits - 1)) != 0) w_bits++;
  // Pack MSB-first.
  std::vector<uint8_t> packed((static_cast<size_t>(npix - 1) * w_bits + 7) / 8, 0);
  uint64_t bitbuf = 0;
  int nbits = 0;
  size_t bytepos = 0;
  const uint32_t mask = (w_bits >= 32) ? 0xffffffffu : ((1u << w_bits) - 1);
  for (int i = 0; i < npix - 1; i++) {
    bitbuf = (bitbuf << w_bits) | (static_cast<uint32_t>(adj[i]) & mask);
    nbits += w_bits;
    while (nbits >= 8) {
      packed[bytepos++] = static_cast<uint8_t>(bitbuf >> (nbits - 8));
      nbits -= 8;
    }
  }
  if (nbits > 0) packed[bytepos++] = static_cast<uint8_t>(bitbuf << (8 - nbits));
  uint32_t fsize = static_cast<uint32_t>(4 + packed.size());
  std::string fields;
  int count = 2;
  uint8_t wb = static_cast<uint8_t>(w_bits);
  if (is_background) {
    put_field(fields, 'g', &is_background, 1);
    count++;
  } else {
    put_field(fields, 't', &time_on_ms, 4);
    put_field(fields, 'c', &last_ffc_ms, 4);
    put_field(fields, 'a', &temp_c, 4);
    put_field(fields, 'b', &last_ffc_temp_c, 4);
    count += 4;
  }
  put_field(fields, 'w', &wb, 1);
  put_field(fields, 'f', &fsize, 4);
  std::string out = "F";
  out.push_back(static_cast<char>(count));
  out += fields;
  out.append(reinterpret_cast<const char*>(&snake[0]), 4);  // first value i32 LE
  out.append(reinterpret_cast<const char*>(packed.data()), packed.size());
  gzwrite(w->gz, out.data(), static_cast<unsigned>(out.size()));
  memcpy(w->prev.data(), pix, npix * sizeof(uint16_t));
  w->first = false;
  return 0;
}

int cptv_writer_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  int rc = 0;
  if (w->gz) rc = gzclose(w->gz);
  delete w;
  return rc;
}

// ------------------------------------------------------- NL-means (host) ----
// cv2.fastNlMeansDenoising(u8, h=3) BIT-EXACT for the host/CPU streaming
// path (pipeline/streamtracker.py): the XLA formulation costs ~200ms/frame
// on a weak host CPU, two orders over the 9 fps real-time budget.
// cv2's fast path is FIXED-POINT (fast_nlmeans_denoising_invoker.hpp,
// constants re-derived empirically against the cv2 oracle in this env):
//   fpm   = INT_MAX / (21*21*255) = 19096            (fixed_point_mult)
//   idx   = boxsum >> 6                               (49 -> 64 bin shift)
//   w     = round(fpm * exp(-idx*(64/49)/(h*h)))      (double, h = 3)
//   w     = 0 when w < 0.001*fpm (WEIGHT_THRESHOLD)   => idx >= 48 is 0
//   out   = (sum(w*v) + sum(w)/2) / sum(w)            (integer division)
// boxsum is the exact int32 7x7 patch distance (REFLECT_101 padding).
// Integer num/den accumulation is order-independent, so results are
// identical on any machine / core count (the 8-stripe partition remains
// for cache locality only). Verified bit-equal to cv2 on impulse sweeps,
// random families, and real streaming frames
// (tests/test_imageops.py::test_native_nlmeans_vs_cv2_oracle).


// Thread count for the row/stripe-parallel host kernels: CPTPU_NATIVE_THREADS
// overrides hardware_concurrency (e.g. to measure Pi-4-style 4-thread
// striping on a 1-core dev box, or to pin a deployment).
static long long native_thread_count() {
  const char* e = std::getenv("CPTPU_NATIVE_THREADS");
  if (e && *e) {
    long long v = std::atoll(e);
    if (v >= 1) return v < 64 ? v : 64;
  }
  long long hwc = (long long)std::thread::hardware_concurrency();
  return hwc ? hwc : 1;
}

static const int NLM_TPL = 7, NLM_SEARCH = 21;
static const int32_t NLM_FPM = 2147483647 / (NLM_SEARCH * NLM_SEARCH * 255);
// nonzero weights only for idx = boxsum>>6 in [0, 48): boxsum < 3072
static const int NLM_LUT_N = 48;
static const int NLM_BOX_MAX = NLM_LUT_N << 6;  // 3072

long long nl_means_u8(const uint8_t* img, long long Hn, long long Wn,
                      int32_t* out) {
  const int ts = NLM_TPL / 2, hs = NLM_SEARCH / 2, p = ts + hs;
  const int H = (int)Hn, W = (int)Wn;
  const int Hp = H + 2 * p, Wp = W + 2 * p;
  const int Hb = H + 2 * ts, Wb = W + 2 * ts;
  static const std::vector<int32_t>& lut = *[] {
    auto* t = new std::vector<int32_t>(NLM_LUT_N);
    const double mult = 64.0 / (NLM_TPL * NLM_TPL);
    for (int i = 0; i < NLM_LUT_N; i++) {
      int32_t w = (int32_t)llround(NLM_FPM * exp(-(i * mult) / (3.0 * 3.0)));
      (*t)[i] = (double)w < 0.001 * NLM_FPM ? 0 : w;
    }
    return t;
  }();  // C++11 static init: thread-safe
  // REFLECT_101 pad (iterated: pads wider than the frame, as in the tiny
  // availability-probe inputs, need repeated reflection to stay in range)
  std::vector<int32_t> pad((size_t)Hp * Wp);
  auto refl = [](int i, int n) {
    if (n == 1) return 0;
    while (i < 0 || i >= n) {
      if (i < 0) i = -i;
      if (i >= n) i = 2 * n - 2 - i;
    }
    return i;
  };
  for (int y = 0; y < Hp; y++) {
    const uint8_t* row = img + (size_t)refl(y - p, H) * W;
    int32_t* prow = pad.data() + (size_t)y * Wp;
    for (int x = 0; x < Wp; x++) prow[x] = row[refl(x - p, W)];
  }
  std::vector<int64_t> num((size_t)H * W, 0), den((size_t)H * W, 0);
  // Symmetric weight reuse: the patch distance is sign-symmetric in the
  // offset — boxsum_o(x) = boxsum_{-o}(x+o) with bit-identical int32 sums —
  // so only offsets with dy >= 0 (and dx > 0 when dy == 0) are computed,
  // each weight plane feeding BOTH the +o tap at x and the -o tap at x-o.
  // The centre offset (w == NLM_FPM, dist 0) is applied after the merge.
  struct Pair {
    int v, u;
  };
  std::vector<Pair> pairs;
  for (int u = 1; u <= hs; u++) pairs.push_back({0, u});
  for (int v = 1; v <= hs; v++)
    for (int u = -hs; u <= hs; u++) pairs.push_back({v, u});
  // fixed pair->stripe partition + ordered merge => identical float results
  // on any machine / core count (only parallelism varies, not arithmetic)
  const long long n_stripes = 8;
  std::vector<std::vector<int64_t>> pnum(n_stripes), pden(n_stripes);
  long long n_threads = std::max<long long>(
      1, std::min<long long>(n_stripes, native_thread_count()));
  std::atomic<long long> next_stripe(0);
  std::vector<std::thread> threads;
  for (long long w = 0; w < n_threads; w++) {
    threads.emplace_back([&, w]() {
      // local copies of the bounds + __restrict__ pointers: by-reference
      // lambda captures defeat the vectorizer (it can't prove the bounds
      // loop-invariant against the stores)
      const int W_ = W, H_ = H, Wb_ = Wb, Hb_ = Hb, Wp_ = Wp;
      const int ts_ = ts, hs2 = hs;
      // row-major working buffers (extended-grid capacity) so every inner
      // loop vectorizes across x
      std::vector<int32_t> d2v((size_t)(Hb_ + hs2) * (Wb_ + hs2)),
          vsumv((size_t)(H_ + hs2) * (Wb_ + hs2)), hsumv(W_ + hs2);
      std::vector<int32_t> wbufv((size_t)(H_ + hs2) * (W_ + hs2));
      std::vector<int64_t> lnumv((size_t)H_ * W_, 0),
          ldenv((size_t)H_ * W_, 0);
      int32_t* __restrict__ d2 = d2v.data();
      int32_t* __restrict__ vsum = vsumv.data();
      int32_t* __restrict__ hsum = hsumv.data();
      int32_t* __restrict__ wbuf = wbufv.data();
      int64_t* __restrict__ lnum = lnumv.data();
      int64_t* __restrict__ lden = ldenv.data();
      const int32_t* __restrict__ padp = pad.data();
      const int32_t* __restrict__ lutp = lut.data();
      long long stripe;
      while ((stripe = next_stripe.fetch_add(1)) < n_stripes) {
      std::fill(lnumv.begin(), lnumv.end(), (int64_t)0);
      std::fill(ldenv.begin(), ldenv.end(), (int64_t)0);
      for (size_t pi = (size_t)stripe; pi < pairs.size();
           pi += (size_t)n_stripes) {
        const int v = pairs[pi].v, u = pairs[pi].u;
        const int au = u < 0 ? -u : u;
        const int cu = u > 0 ? u : 0;   // +o tap col shift in the w grid
        const int cm = u < 0 ? -u : 0;  // -o tap col shift in the w grid
        // extended grid: w rows [0, H+v) map to output rows y-v of the -o
        // tap and (row - v) of the +o tap; cols [0, W+|u|) likewise
        const int RE = Hb_ + v, CE = Wb_ + au;
        const int CBH = H_ + v, CBW = W_ + au;
        const int colA = u > 0 ? hs2 : hs2 + u;  // hs+u-cu
        const int colB = u > 0 ? hs2 - u : hs2;  // hs-cu
        // d2 over the extended patch frame (SIMD across x):
        // d2[r][c] = (pad[r+hs][c+colA+u-part] - pad[r+hs-v][c+colB])^2
        for (int y = 0; y < RE; y++) {
          const int32_t* __restrict__ sh =
              padp + (size_t)(y + hs2) * Wp_ + colA;
          const int32_t* __restrict__ bs =
              padp + (size_t)(y + hs2 - v) * Wp_ + colB;
          int32_t* __restrict__ d = d2 + (size_t)y * CE;
          for (int x = 0; x < CE; x++) {
            int32_t diff = sh[x] - bs[x];
            d[x] = diff * diff;
          }
        }
        // vertical 7-sum: row-wise sliding (2 vector ops/px, exact int32)
        for (int x = 0; x < CE; x++) {
          int32_t s = d2[x];
          for (int y = 1; y < NLM_TPL; y++) s += d2[(size_t)y * CE + x];
          vsum[x] = s;
        }
        for (int y = 1; y < CBH; y++) {
          const int32_t* __restrict__ add = d2 + (size_t)(y + NLM_TPL - 1) * CE;
          const int32_t* __restrict__ sub = d2 + (size_t)(y - 1) * CE;
          const int32_t* __restrict__ prev = vsum + (size_t)(y - 1) * CE;
          int32_t* __restrict__ cur = vsum + (size_t)y * CE;
          for (int x = 0; x < CE; x++) cur[x] = prev[x] + add[x] - sub[x];
        }
        // horizontal 7-sum (6 shifted vector adds) + one LUT pass into the
        // weight plane (~1.15*H*W gathers per pair vs 2*H*W before)
        for (int y = 0; y < CBH; y++) {
          const int32_t* __restrict__ vr = vsum + (size_t)y * CE;
          int32_t* __restrict__ wr = wbuf + (size_t)y * CBW;
          for (int x = 0; x < CBW; x++)
            hsum[x] = vr[x] + vr[x + 1] + vr[x + 2] + vr[x + 3] + vr[x + 4] +
                      vr[x + 5] + vr[x + 6];
          for (int x = 0; x < CBW; x++)
            wr[x] = hsum[x] < NLM_BOX_MAX ? lutp[hsum[x] >> 6] : 0;
        }
        // accumulate both taps (contiguous vector loads, no gathers)
        for (int y = 0; y < H_; y++) {
          const int32_t* __restrict__ wp = wbuf + (size_t)(y + v) * CBW + cu;
          const int32_t* __restrict__ wm = wbuf + (size_t)y * CBW + cm;
          const int32_t* __restrict__ cp =
              padp + (size_t)(y + v + hs2 + ts_) * Wp_ + (hs2 + u + ts_);
          const int32_t* __restrict__ cmv =
              padp + (size_t)(y - v + hs2 + ts_) * Wp_ + (hs2 - u + ts_);
          int64_t* __restrict__ ln = lnum + (size_t)y * W_;
          int64_t* __restrict__ ld = lden + (size_t)y * W_;
          for (int x = 0; x < W_; x++) {
            ln[x] += (int64_t)wp[x] * cp[x] + (int64_t)wm[x] * cmv[x];
            ld[x] += (int64_t)wp[x] + wm[x];
          }
        }
      }
      pnum[stripe] = lnumv;
      pden[stripe] = ldenv;
      }  // while stripes
    });
  }
  for (auto& t : threads) t.join();
  // merge partials in fixed stripe order: identical results on any host
  for (long long s = 0; s < n_stripes; s++) {
    for (size_t i = 0; i < (size_t)H * W; i++) {
      num[i] += pnum[s][i];
      den[i] += pden[s][i];
    }
  }
  // centre offset: dist 0 => w == NLM_FPM exactly
  for (int y = 0; y < H; y++) {
    const int32_t* __restrict__ c0 = pad.data() + (size_t)(y + p) * Wp + p;
    for (int x = 0; x < W; x++) {
      num[(size_t)y * W + x] += (int64_t)NLM_FPM * c0[x];
      den[(size_t)y * W + x] += NLM_FPM;
    }
  }
  // cv2: estimation = (sum(w*v) + weights_sum/2) / weights_sum
  for (size_t i = 0; i < (size_t)H * W; i++) {
    int64_t v = (num[i] + den[i] / 2) / den[i];
    out[i] = (int32_t)(v > 255 ? 255 : v);
  }
  return 0;
}

// ------------------------------------------------- delta upload encoder ----
// Delta-encode a (B, T, HW) uint16 batch for the compressed host->TPU
// upload (track/tracker_jax._encode_delta_u16): per frame-pair, a global
// int32 shift = round(mean(delta)) plus int8 residuals; residuals outside
// [-127, 127] go to a flat-index exception list applied on device before
// the cumulative sum. Single streaming pass; threaded over clips.
// Returns the total exception count (caller falls back to raw upload when
// it exceeds `cap`; entries past cap are dropped but counted).
long long delta_encode_u16(const uint16_t* th, long long B, long long T,
                           long long HW, int8_t* resid, int32_t* shift,
                           int32_t* exc_idx, int32_t* exc_val,
                           long long cap) {
  std::atomic<long long> total_exc(0);
  long long n_threads = std::min<long long>(B, 8);
  std::vector<std::thread> threads;
  // each clip writes exceptions into its own slice bound later; collect
  // per-clip exception vectors and merge afterwards to keep writes race-free
  std::vector<std::vector<std::pair<long long, int32_t>>> exc_per(B);
  for (long long w = 0; w < n_threads; w++) {
    threads.emplace_back([&, w]() {
      for (long long b = w; b < B; b += n_threads) {
        const uint16_t* clip = th + b * T * HW;
        int8_t* rclip = resid + b * (T - 1) * HW;
        auto& exc = exc_per[b];
        for (long long t = 0; t + 1 < T; t++) {
          const uint16_t* prev = clip + t * HW;
          const uint16_t* cur = prev + HW;
          long long sum = 0;
          for (long long i = 0; i < HW; i++)
            sum += (long long)cur[i] - (long long)prev[i];
          double mean = (double)sum / (double)HW;
          int32_t s = (int32_t)llround(mean);
          shift[b * (T - 1) + t] = s;
          int8_t* r = rclip + t * HW;
          for (long long i = 0; i < HW; i++) {
            int32_t d = (int32_t)cur[i] - (int32_t)prev[i] - s;
            int32_t c = d < -127 ? -127 : (d > 127 ? 127 : d);
            r[i] = (int8_t)c;
            if (d != c)
              exc.emplace_back((b * (T - 1) + t) * HW + i, d - c);
          }
        }
        total_exc += (long long)exc.size();
      }
    });
  }
  for (auto& t : threads) t.join();
  long long n = 0;
  for (long long b = 0; b < B && n < cap; b++)
    for (auto& e : exc_per[b]) {
      if (n >= cap) break;
      exc_idx[n] = (int32_t)e.first;
      exc_val[n] = e.second;
      n++;
    }
  return total_exc.load();
}

// -------------------------------------------------------- MOG2 (host) ----
// cv2 BackgroundSubtractorMOG2 (Zivkovic) per-pixel update, mirroring
// track/mog2_jax.py operation-for-operation (which is itself per-pixel
// oracle-equal to cv2 — tests/test_ir_mog2_oracle.py). The jitted JAX
// formulation costs ~1.7 s/frame at 640x480 on a weak host core (an
// unfused ~100-op graph over 5 full planes per step); the reference's live
// IR loop runs cv2's C++ at a few ms. This scalar pass restores that for
// the IR streaming runtime. State arrays are numpy-owned (K,H,W) float32
// + (H,W) int32, updated in place. Pixels are independent, so the row
// striping changes scheduling only, never results.

static const int MOG_K = 5;
static const float MOG_TB = 0.9f;       // backgroundRatio
static const float MOG_Tb = 16.0f;      // varThreshold
static const float MOG_Tg = 9.0f;       // varThresholdGen
static const float MOG_VAR_INIT = 15.0f;
static const float MOG_VAR_MIN = 4.0f;
static const float MOG_VAR_MAX = 75.0f;
static const float MOG_CT = 0.05f;      // fCT

static void mog2_rows(const uint8_t* frame, long long HW, long long p0,
                      long long p1, float alphaT, float* weight, float* mean,
                      float* var, int32_t* nmodes, uint8_t* mask_out) {
  const float alpha1 = 1.0f - alphaT;
  const float prune = -alphaT * MOG_CT;
  for (long long p = p0; p < p1; p++) {
    const float x = (float)frame[p];
    float w[MOG_K], m[MOG_K], v[MOG_K];
    for (int k = 0; k < MOG_K; k++) {
      w[k] = weight[k * HW + p];
      m[k] = mean[k * HW + p];
      v[k] = var[k * HW + p];
    }
    const int nm = nmodes[p];
    int fits = 0, background = 0, pruned = 0;
    float total = 0.0f;
    for (int k = 0; k < MOG_K; k++) {
      // cv2 re-reads nmodes after in-loop prunes: a prune shrinks the
      // active range, stranding one stale tail mode
      const int active = k < nm - pruned;
      float wk = alpha1 * w[k] + prune;
      const float d = m[k] - x;
      const float dist2 = d * d;
      const int testable = active && !fits;
      // FG/BG decision: cumulative post-update weight so far vs the
      // PRE-update variance
      if (testable && total < MOG_TB && dist2 < MOG_Tb * v[k])
        background = 1;
      const int fit_k = testable && (dist2 < MOG_Tg * v[k]);
      if (fit_k) {
        wk = wk + alphaT;
        const float kfac = alphaT / (wk == 0.0f ? 1.0f : wk);
        m[k] = m[k] - kfac * d;
        float nv = v[k] + kfac * (dist2 - v[k]);
        nv = nv < MOG_VAR_MIN ? MOG_VAR_MIN : nv;
        v[k] = nv > MOG_VAR_MAX ? MOG_VAR_MAX : nv;
        fits = 1;
      }
      if (active && wk < -prune) {
        wk = 0.0f;
        pruned++;
      }
      if (active) {
        w[k] = wk;
        total += wk;
      }
      if (fit_k) {
        // bubble the matched mode toward slot 0 while weight >= the one
        // above (modes above already hold their final weights)
        for (int i = k; i > 0 && w[i] >= w[i - 1]; i--) {
          float t;
          t = w[i - 1]; w[i - 1] = w[i]; w[i] = t;
          t = m[i - 1]; m[i - 1] = m[i]; m[i] = t;
          t = v[i - 1]; v[i - 1] = v[i]; v[i] = t;
        }
      }
    }
    const int nm_after = nm - pruned;
    const float inv_total = total > 0.0f ? 1.0f / total : 0.0f;
    for (int k = 0; k < nm_after; k++) w[k] = w[k] * inv_total;
    int nm_new = nm_after;
    if (!fits && alphaT > 0.0f) {
      const int slot = nm_after == MOG_K ? MOG_K - 1 : nm_after;
      nm_new = nm_after + 1 < MOG_K ? nm_after + 1 : MOG_K;
      const int single = nm_new == 1;
      w[slot] = single ? 1.0f : alphaT;
      m[slot] = x;
      v[slot] = MOG_VAR_INIT;
      if (!single) {
        // cv2 renormalizes every OTHER in-range mode by alpha1 (the new
        // mode sits at nm_new-1 and keeps weight == alphaT)
        for (int k = 0; k < nm_new - 1; k++) w[k] = w[k] * alpha1;
        // insert-sort the fresh mode upward (compares alphaT vs stored)
        for (int i = slot; i > 0 && alphaT >= w[i - 1]; i--) {
          float t;
          t = w[i - 1]; w[i - 1] = w[i]; w[i] = t;
          t = m[i - 1]; m[i - 1] = m[i]; m[i] = t;
          t = v[i - 1]; v[i - 1] = v[i]; v[i] = t;
        }
      }
    }
    nmodes[p] = nm_new;
    mask_out[p] = background ? 0 : 255;
    for (int k = 0; k < MOG_K; k++) {
      weight[k * HW + p] = w[k];
      mean[k * HW + p] = m[k];
      var[k * HW + p] = v[k];
    }
  }
}

extern "C" void mog2_update_u8(const uint8_t* frame, long long H, long long W,
                               float alphaT, float* weight, float* mean,
                               float* var, int32_t* nmodes,
                               uint8_t* mask_out) {
  const long long HW = H * W;
  long long n_threads =
      std::max<long long>(1, std::min<long long>(8, native_thread_count()));
  if (n_threads == 1 || HW < 1 << 15) {
    mog2_rows(frame, HW, 0, HW, alphaT, weight, mean, var, nmodes, mask_out);
    return;
  }
  std::vector<std::thread> threads;
  const long long step = (HW + n_threads - 1) / n_threads;
  for (long long t = 0; t < n_threads; t++) {
    const long long p0 = t * step, p1 = std::min(HW, p0 + step);
    if (p0 >= p1) break;
    threads.emplace_back([=]() {
      mog2_rows(frame, HW, p0, p1, alphaT, weight, mean, var, nmodes,
                mask_out);
    });
  }
  for (auto& th : threads) th.join();
}

extern "C" void mog2_background_u8(const float* weight, const float* mean,
                                   const int32_t* nmodes, long long H,
                                   long long W, uint8_t* out) {
  const long long HW = H * W;
  for (long long p = 0; p < HW; p++) {
    float cum = 0.0f, wsum = 0.0f, msum = 0.0f;
    const int nm = nmodes[p];
    for (int k = 0; k < nm; k++) {
      const float wk = weight[k * HW + p];
      if (cum <= MOG_TB) {  // cumulative weight BEFORE this mode
        wsum += wk;
        msum += wk * mean[k * HW + p];
      }
      cum += wk;
    }
    float o = wsum > 0.0f ? msum / wsum : 0.0f;
    o = rintf(o);  // round-half-even, as jnp.round / cv2 saturate_cast
    o = o < 0.0f ? 0.0f : (o > 255.0f ? 255.0f : o);
    out[p] = (uint8_t)o;
  }
}

}  // extern "C"
