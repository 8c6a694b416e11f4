// TFRecord container reader/writer with crc32c (Castagnoli), C++.
//
// Format (public spec): each record is
//   uint64le length | uint32le masked_crc32c(length bytes) |
//   data bytes      | uint32le masked_crc32c(data)
// masked_crc = ((crc >> 15 | crc << 17) + 0xa282ead8)
//
// Replaces the reference's TensorFlow-side TFRecord writing
// (reference src/ml_tools/tfwriter.py via tf.io.TFRecordWriter) with a
// dependency-free native implementation; optional whole-file gzip framing
// matches tf.data's GZIP compression_type.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

uint32_t crc32c_table[8][256];
bool table_init = false;

void init_crc32c() {
  if (table_init) return;
  const uint32_t poly = 0x82f63b78u;  // reflected Castagnoli
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? (poly ^ (c >> 1)) : (c >> 1);
    crc32c_table[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = crc32c_table[0][i];
    for (int s = 1; s < 8; s++) {
      c = crc32c_table[0][c & 0xff] ^ (c >> 8);
      crc32c_table[s][i] = c;
    }
  }
  table_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t n, uint32_t crc = 0) {
  init_crc32c();
  crc = ~crc;
  // slicing-by-8
  while (n >= 8) {
    crc ^= static_cast<uint32_t>(data[0]) | (data[1] << 8) | (data[2] << 16) |
           (static_cast<uint32_t>(data[3]) << 24);
    uint32_t hi = static_cast<uint32_t>(data[4]) | (data[5] << 8) |
                  (data[6] << 16) | (static_cast<uint32_t>(data[7]) << 24);
    crc = crc32c_table[7][crc & 0xff] ^ crc32c_table[6][(crc >> 8) & 0xff] ^
          crc32c_table[5][(crc >> 16) & 0xff] ^ crc32c_table[4][crc >> 24] ^
          crc32c_table[3][hi & 0xff] ^ crc32c_table[2][(hi >> 8) & 0xff] ^
          crc32c_table[1][(hi >> 16) & 0xff] ^ crc32c_table[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = crc32c_table[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
  return ~crc;
}

uint32_t masked_crc(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

struct Writer {
  FILE* f = nullptr;
  gzFile gz = nullptr;
  bool use_gzip = false;
};

struct Reader {
  std::vector<uint8_t> data;
  size_t pos = 0;
  std::string error;
  std::vector<uint8_t> current;
};

}  // namespace

extern "C" {

void* rec_writer_open(const char* path, int use_gzip) {
  auto* w = new Writer();
  w->use_gzip = use_gzip != 0;
  if (w->use_gzip) {
    w->gz = gzopen(path, "wb6");
    if (!w->gz) { delete w; return nullptr; }
  } else {
    w->f = fopen(path, "wb");
    if (!w->f) { delete w; return nullptr; }
  }
  return w;
}

int rec_writer_write(void* h, const uint8_t* data, uint64_t n) {
  auto* w = static_cast<Writer*>(h);
  uint8_t header[12];
  memcpy(header, &n, 8);
  uint32_t len_crc = masked_crc(header, 8);
  memcpy(header + 8, &len_crc, 4);
  uint32_t data_crc = masked_crc(data, n);
  if (w->use_gzip) {
    if (gzwrite(w->gz, header, 12) != 12) return -1;
    if (static_cast<uint64_t>(gzwrite(w->gz, data, n)) != n) return -1;
    if (gzwrite(w->gz, &data_crc, 4) != 4) return -1;
  } else {
    if (fwrite(header, 1, 12, w->f) != 12) return -1;
    if (fwrite(data, 1, n, w->f) != n) return -1;
    if (fwrite(&data_crc, 1, 4, w->f) != 4) return -1;
  }
  return 0;
}

int rec_writer_close(void* h) {
  auto* w = static_cast<Writer*>(h);
  int rc = 0;
  if (w->gz) rc = gzclose(w->gz);
  if (w->f) rc = fclose(w->f);
  delete w;
  return rc;
}

void* rec_reader_open(const char* path) {
  auto* r = new Reader();
  // transparently handle gzip via zlib's gz layer
  gzFile gz = gzopen(path, "rb");
  if (!gz) {
    r->error = "cannot open";
    return r;
  }
  std::vector<uint8_t> buf(1 << 20);
  int got;
  while ((got = gzread(gz, buf.data(), buf.size())) > 0) {
    r->data.insert(r->data.end(), buf.data(), buf.data() + got);
  }
  gzclose(gz);
  return r;
}

const char* rec_reader_error(void* h) {
  auto* r = static_cast<Reader*>(h);
  return r->error.empty() ? nullptr : r->error.c_str();
}

// Returns record length, 0 at EOF, -1 on error. Data via rec_reader_data.
int64_t rec_reader_next(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (r->pos >= r->data.size()) return 0;
  if (r->pos + 12 > r->data.size()) { r->error = "truncated header"; return -1; }
  uint64_t n;
  memcpy(&n, r->data.data() + r->pos, 8);
  uint32_t len_crc;
  memcpy(&len_crc, r->data.data() + r->pos + 8, 4);
  if (masked_crc(r->data.data() + r->pos, 8) != len_crc) {
    r->error = "length crc mismatch";
    return -1;
  }
  r->pos += 12;
  if (r->pos + n + 4 > r->data.size()) { r->error = "truncated record"; return -1; }
  uint32_t data_crc;
  memcpy(&data_crc, r->data.data() + r->pos + n, 4);
  if (masked_crc(r->data.data() + r->pos, n) != data_crc) {
    r->error = "data crc mismatch";
    return -1;
  }
  r->current.assign(r->data.begin() + r->pos, r->data.begin() + r->pos + n);
  r->pos += n + 4;
  return static_cast<int64_t>(n);
}

const uint8_t* rec_reader_data(void* h) {
  return static_cast<Reader*>(h)->current.data();
}

void rec_reader_close(void* h) { delete static_cast<Reader*>(h); }

}  // extern "C"
