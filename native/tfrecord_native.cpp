// Native TFRecord + tf.train.Example fast path for the host input pipeline.
//
// Role: the reference delegates record IO and proto parsing to TensorFlow's
// C++ tf.data kernels (SURVEY.md §2.3); this library is the equivalent
// native component for our TF-free pipeline. The Python implementation in
// retinanet_tpu/data/tfrecord.py stays as the portable fallback and the
// behavioral spec — retinanet_tpu/data/native.py cross-checks both.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtfrecord_native.so \
//            tfrecord_native.cpp

#include <cstdint>
#include <cstring>

namespace {

// ---------------------------------------------------------------------------
// crc32c (Castagnoli), 8-slice table driven.
// ---------------------------------------------------------------------------

uint32_t g_tables[8][256];
bool g_tables_ready = false;

void init_tables() {
  if (g_tables_ready) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    g_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = g_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = g_tables[0][crc & 0xFF] ^ (crc >> 8);
      g_tables[t][i] = crc;
    }
  }
  g_tables_ready = true;
}

uint32_t crc32c(const uint8_t* data, int64_t n) {
  init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint64_t v;
    std::memcpy(&v, data, 8);
    v ^= crc;
    crc = g_tables[7][v & 0xFF] ^ g_tables[6][(v >> 8) & 0xFF] ^
          g_tables[5][(v >> 16) & 0xFF] ^ g_tables[4][(v >> 24) & 0xFF] ^
          g_tables[3][(v >> 32) & 0xFF] ^ g_tables[2][(v >> 40) & 0xFF] ^
          g_tables[1][(v >> 48) & 0xFF] ^ g_tables[0][(v >> 56) & 0xFF];
    data += 8;
    n -= 8;
  }
  while (n--) crc = g_tables[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc32c(const uint8_t* data, int64_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---------------------------------------------------------------------------
// protobuf wire-format primitives
// ---------------------------------------------------------------------------

bool read_varint(const uint8_t* buf, int64_t size, int64_t* pos,
                 uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < size && shift < 64) {
    uint8_t b = buf[*pos];
    ++*pos;
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

struct Field {
  uint32_t number;
  uint32_t wire_type;
  const uint8_t* data;  // for length-delimited: payload; else unused
  int64_t len;
  uint64_t varint;      // for wire type 0
};

// Iterate fields of a message [buf, buf+size).
struct MessageReader {
  const uint8_t* buf;
  int64_t size;
  int64_t pos = 0;

  bool next(Field* f) {
    if (pos >= size) return false;
    uint64_t tag;
    if (!read_varint(buf, size, &pos, &tag)) return false;
    f->number = static_cast<uint32_t>(tag >> 3);
    f->wire_type = static_cast<uint32_t>(tag & 7);
    switch (f->wire_type) {
      case 0:
        return read_varint(buf, size, &pos, &f->varint);
      case 2: {
        uint64_t len;
        if (!read_varint(buf, size, &pos, &len)) return false;
        if (pos + static_cast<int64_t>(len) > size) return false;
        f->data = buf + pos;
        f->len = static_cast<int64_t>(len);
        pos += len;
        return true;
      }
      case 5:
        if (pos + 4 > size) return false;
        f->data = buf + pos;
        f->len = 4;
        pos += 4;
        return true;
      case 1:
        if (pos + 8 > size) return false;
        f->data = buf + pos;
        f->len = 8;
        pos += 8;
        return true;
      default:
        return false;
    }
  }
};

// Feature { bytes_list=1 { value=1 } | float_list=2 { packed value=1 } |
//           int64_list=3 { packed value=1 } }
struct FeatureView {
  const uint8_t* bytes = nullptr;  // first bytes value
  int64_t bytes_len = 0;
  const uint8_t* floats = nullptr;  // packed float payload
  int64_t floats_len = 0;           // bytes (len/4 floats)
  const uint8_t* ints = nullptr;    // packed varint payload
  int64_t ints_len = 0;
};

bool parse_feature(const uint8_t* buf, int64_t size, FeatureView* out) {
  MessageReader feature{buf, size};
  Field f;
  while (feature.next(&f)) {
    if (f.wire_type != 2) continue;
    MessageReader list{f.data, f.len};
    Field v;
    while (list.next(&v)) {
      if (v.number != 1) continue;
      if (f.number == 1 && v.wire_type == 2) {  // bytes_list
        out->bytes = v.data;
        out->bytes_len = v.len;
      } else if (f.number == 2) {  // float_list
        if (v.wire_type == 2) {
          out->floats = v.data;
          out->floats_len = v.len;
        } else if (v.wire_type == 5) {  // unpacked single float
          out->floats = v.data;
          out->floats_len = 4;
        }
      } else if (f.number == 3) {  // int64_list (packed or single)
        if (v.wire_type == 2) {
          out->ints = v.data;
          out->ints_len = v.len;
        }
        // single varint int64 handled by caller via varint field: rare in
        // our schema (always packed by both TF and our writer)
      }
    }
  }
  return true;
}

int64_t decode_packed_floats(const FeatureView& fv, float* out,
                             int64_t cap) {
  int64_t n = fv.floats_len / 4;
  if (n > cap) n = cap;
  std::memcpy(out, fv.floats, n * 4);
  return n;
}

int64_t decode_packed_int64(const FeatureView& fv, int64_t* out,
                            int64_t cap) {
  int64_t pos = 0, n = 0;
  while (pos < fv.ints_len && n < cap) {
    uint64_t v;
    if (!read_varint(fv.ints, fv.ints_len, &pos, &v)) break;
    out[n++] = static_cast<int64_t>(v);
  }
  return n;
}

bool key_equals(const uint8_t* data, int64_t len, const char* name) {
  int64_t want = static_cast<int64_t>(std::strlen(name));
  return len == want && std::memcmp(data, name, len) == 0;
}

}  // namespace

extern "C" {

// Index the records of a TFRecord buffer. Returns the record count (or
// negative on corruption), filling offsets/lengths up to max_records.
// verify != 0 checks both masked crcs.
int64_t tfr_index(const uint8_t* data, int64_t size, int64_t* offsets,
                  int64_t* lengths, int64_t max_records, int verify) {
  int64_t pos = 0, n = 0;
  while (pos + 12 <= size && n < max_records) {
    uint64_t len;
    std::memcpy(&len, data + pos, 8);
    int64_t rec_len = static_cast<int64_t>(len);
    if (rec_len < 0 || pos + 12 + rec_len + 4 > size + 4) break;
    if (pos + 12 + rec_len + 4 > size) break;  // truncated tail
    if (verify) {
      uint32_t crc_h, crc_d;
      std::memcpy(&crc_h, data + pos + 8, 4);
      std::memcpy(&crc_d, data + pos + 12 + rec_len, 4);
      if (crc_h != masked_crc32c(data + pos, 8)) return -(n + 1);
      if (crc_d != masked_crc32c(data + pos + 12, rec_len)) return -(n + 1);
    }
    offsets[n] = pos + 12;
    lengths[n] = rec_len;
    ++n;
    pos += 12 + rec_len + 4;
  }
  return n;
}

// Parse one detection tf.train.Example (schema of
// data/tfrecord.py:parse_detection_example). Boxes are written as
// [x1,y1,x2,y2] rows. Returns 0 on success, negative on malformed input.
// image_off is relative to `rec`.
int tfr_parse_detection(const uint8_t* rec, int64_t len, int64_t* image_off,
                        int64_t* image_len, int64_t* image_id, float* boxes,
                        int64_t* classes, int64_t cap, int64_t* nboxes) {
  FeatureView image{}, xmins{}, ymins{}, xmaxs{}, ymaxs{}, cls{};
  int64_t img_id = -1;

  MessageReader example{rec, len};
  Field f;
  while (example.next(&f)) {
    if (f.number != 1 || f.wire_type != 2) continue;  // Example.features
    MessageReader features{f.data, f.len};
    Field entry;
    while (features.next(&entry)) {
      if (entry.number != 1 || entry.wire_type != 2) continue;  // map entry
      MessageReader kv{entry.data, entry.len};
      Field part;
      const uint8_t* key = nullptr;
      int64_t key_len = 0;
      const uint8_t* value = nullptr;
      int64_t value_len = 0;
      while (kv.next(&part)) {
        if (part.number == 1 && part.wire_type == 2) {
          key = part.data;
          key_len = part.len;
        } else if (part.number == 2 && part.wire_type == 2) {
          value = part.data;
          value_len = part.len;
        }
      }
      if (!key || !value) continue;
      FeatureView fv{};
      parse_feature(value, value_len, &fv);
      if (key_equals(key, key_len, "image")) image = fv;
      else if (key_equals(key, key_len, "image_id")) {
        int64_t one;
        if (decode_packed_int64(fv, &one, 1) == 1) img_id = one;
      } else if (key_equals(key, key_len, "xmins")) xmins = fv;
      else if (key_equals(key, key_len, "ymins")) ymins = fv;
      else if (key_equals(key, key_len, "xmaxs")) xmaxs = fv;
      else if (key_equals(key, key_len, "ymaxs")) ymaxs = fv;
      else if (key_equals(key, key_len, "classes")) cls = fv;
    }
  }

  if (!image.bytes) return -1;
  *image_off = image.bytes - rec;
  *image_len = image.bytes_len;
  *image_id = img_id;

  int64_t n = xmins.floats_len / 4;
  if (n > cap) n = cap;
  for (int64_t i = 0; i < n; ++i) {
    float x1, y1, x2, y2;
    std::memcpy(&x1, xmins.floats + 4 * i, 4);
    std::memcpy(&y1, ymins.floats + 4 * i, 4);
    std::memcpy(&x2, xmaxs.floats + 4 * i, 4);
    std::memcpy(&y2, ymaxs.floats + 4 * i, 4);
    boxes[4 * i + 0] = x1;
    boxes[4 * i + 1] = y1;
    boxes[4 * i + 2] = x2;
    boxes[4 * i + 3] = y2;
  }
  int64_t ncls = decode_packed_int64(cls, classes, cap);
  *nboxes = n < ncls ? n : ncls;
  return 0;
}

uint32_t tfr_masked_crc32c(const uint8_t* data, int64_t n) {
  return masked_crc32c(data, n);
}

}  // extern "C"
