// Native host codec for fdeflate_tpu.
//
// One-shot (whole-buffer) zlib encode/decode used by the host convenience
// API when streams fit in memory; the Python state machine remains the
// resumable/streaming fallback, and device kernels handle batch workloads.
//
// Decode uses the same 4096-entry multi-byte-literal table layout as the
// rest of the framework (see fdeflate_tpu/tables.py for the entry format,
// mirroring /root/reference/src/tables.rs:90-140); tables are built here
// independently so the library is self-contained.
//
// Build: g++ -O3 -march=native -shared -fPIC fdeflate_native.cpp -o libfdeflate_native.so

#include <cstdint>
#include <cstring>
#include <cstddef>
#include <vector>

namespace {

constexpr uint32_t LITERAL_ENTRY = 0x8000;
constexpr uint32_t EXCEPTIONAL_ENTRY = 0x4000;
constexpr uint32_t SECONDARY_TABLE_ENTRY = 0x2000;
constexpr int LITLEN_BITS = 12;
constexpr int DIST_BITS = 9;
constexpr size_t LITLEN_SIZE = 1u << LITLEN_BITS;
constexpr size_t DIST_SIZE = 1u << DIST_BITS;

// ---- status codes (match fdeflate_tpu.errors.Status) ----------------------
enum Status : int {
  OK = 0,
  BAD_ZLIB_HEADER = 1,
  INSUFFICIENT_INPUT = 2,
  INVALID_BLOCK_TYPE = 3,
  INVALID_UNCOMPRESSED_BLOCK_LENGTH = 4,
  INVALID_HLIT = 5,
  INVALID_HDIST = 6,
  INVALID_CODE_LENGTH_REPEAT = 7,
  BAD_CODE_LENGTH_HUFFMAN_TREE = 8,
  BAD_LITERAL_LENGTH_HUFFMAN_TREE = 9,
  BAD_DISTANCE_HUFFMAN_TREE = 10,
  INVALID_LITERAL_LENGTH_CODE = 11,
  INVALID_DISTANCE_CODE = 12,
  DISTANCE_TOO_FAR_BACK = 14,
  WRONG_CHECKSUM = 15,
  OUTPUT_TOO_LARGE = 17,  // out buffer too small; *needed has the hint
};

// ---- spec tables ----------------------------------------------------------
constexpr uint16_t kLenBase[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
                                   19, 23, 27, 31, 35, 43, 51, 59, 67, 83,
                                   99, 115, 131, 163, 195, 227, 258};
constexpr uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                   2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
constexpr uint16_t kDistBase[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25,
                                    33, 49, 65, 97, 129, 193, 257, 385,
                                    513, 769, 1025, 1537, 2049, 3073, 4097,
                                    6145, 8193, 12289, 16385, 24577};
constexpr uint8_t kDistExtra[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                                    6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
                                    12, 12, 13, 13};
constexpr uint8_t kClclOrder[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                    11, 4, 12, 3, 13, 2, 14, 1, 15};

// ---- adler32 --------------------------------------------------------------
// Block form so the compiler can vectorize: over a 16-byte block,
// a' = a + sum(d), b' = b + 16*a + sum((16-i)*d[i]).
static uint32_t adler32(const uint8_t* p, size_t n, uint32_t seed = 1) {
  uint32_t a = seed & 0xffff, b = seed >> 16;
  while (n >= 16) {
    size_t blocks = n / 16;
    if (blocks > 347) blocks = 347;  // 347*16 < 5552: no 32-bit overflow
    n -= blocks * 16;
    for (size_t blk = 0; blk < blocks; blk++) {
      uint32_t sum = 0, wsum = 0;
      for (int i = 0; i < 16; i++) {
        sum += p[i];
        wsum += (16 - i) * p[i];
      }
      b += 16 * a + wsum;
      a += sum;
      p += 16;
    }
    a %= 65521;
    b %= 65521;
  }
  for (size_t i = 0; i < n; i++) {
    a += *p++;
    b += a;
  }
  a %= 65521;
  b %= 65521;
  return (b << 16) | a;
}

// ---- bit reader -----------------------------------------------------------
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  uint64_t buf = 0;
  int nbits = 0;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  inline void refill() {
    while (nbits <= 56 && byte < size) {
      buf |= static_cast<uint64_t>(data[byte++]) << nbits;
      nbits += 8;
    }
  }
  inline void refill_fast() {
    if (nbits <= 56 && byte + 8 <= size) {
      uint64_t w;
      std::memcpy(&w, data + byte, 8);
      buf |= w << nbits;
      int take = (63 - nbits) >> 3;
      byte += take;
      nbits |= 56;
    } else {
      refill();
    }
  }
  inline uint64_t peek(int n) const { return buf & ((1ull << n) - 1); }
  inline void consume(int n) {
    buf >>= n;
    nbits -= n;
  }
  // Total bits still available (buffer + input).
  inline size_t bits_left() const { return nbits + (size - byte) * 8; }
};

// ---- decode table construction -------------------------------------------
// Canonical, bit-reversed code assignment + primary/secondary tables with
// packed double-literal entries (semantics documented in
// fdeflate_tpu/huffman.py; independently implemented here).
struct DecodeTables {
  std::vector<uint32_t> litlen = std::vector<uint32_t>(LITLEN_SIZE);
  std::vector<uint16_t> litlen_sec;
  std::vector<uint32_t> dist = std::vector<uint32_t>(DIST_SIZE);
  std::vector<uint16_t> dist_sec;
  uint16_t eof_code = 0;
  uint16_t eof_mask = 0;
  uint8_t eof_bits = 0;
};

static inline uint16_t rev_bits(uint32_t v, int n) {
  uint16_t r = 0;
  for (int i = 0; i < n; i++) {
    r = (r << 1) | (v & 1);
    v >>= 1;
  }
  return r;
}

// Generic table builder. `kind`: 0 = litlen (double literal), 1 = distance,
// 2 = code-length (no templates, table_bits 7).
static bool build_table(const uint8_t* lengths, int n, int table_bits,
                        int kind, uint32_t* primary, size_t primary_size,
                        std::vector<uint16_t>* secondary, uint16_t* codes_out) {
  int hist[16] = {0};
  for (int i = 0; i < n; i++) hist[lengths[i]]++;

  int max_len = 15;
  while (max_len > 1 && hist[max_len] == 0) max_len--;

  if (kind == 1) {
    if (hist[0] == n) {  // all zero: caller handles, but be safe
      std::memset(primary, 0, primary_size * sizeof(uint32_t));
      return true;
    }
    if (max_len == 1 && hist[1] == 1) {
      int sym = 0;
      while (lengths[sym] != 1) sym++;
      uint32_t entry;
      if (sym < 30) {
        entry = (static_cast<uint32_t>(kDistBase[sym]) << 16) |
                (static_cast<uint32_t>(kDistExtra[sym]) << 8) | LITERAL_ENTRY | 1;
      } else {
        entry = (static_cast<uint32_t>(sym) << 16) | 1;
      }
      for (size_t i = 0; i < primary_size; i += 2) {
        primary[i] = entry;
        primary[i + 1] = 0;
      }
      return true;
    }
  }

  long codespace = 0;
  for (int l = 1; l <= max_len; l++) codespace = (codespace << 1) + hist[l];
  if (codespace != (1l << max_len)) return false;

  // Canonical codes (bit-reversed).
  uint32_t next_code[16] = {0};
  uint32_t code = 0;
  for (int l = 1; l <= 15; l++) {
    next_code[l] = code;
    code = (code + hist[l]) << 1;
  }
  std::vector<uint16_t> codes(n);
  std::vector<int> order;  // symbols sorted by (length, symbol)
  order.reserve(n);
  for (int l = 1; l <= max_len; l++)
    for (int s = 0; s < n; s++)
      if (lengths[s] == l) {
        codes[s] = rev_bits(next_code[l]++, l);
        order.push_back(s);
      }
  if (codes_out) std::memcpy(codes_out, codes.data(), n * sizeof(uint16_t));

  std::memset(primary, 0, primary_size * sizeof(uint32_t));
  // First-symbol maps for double-literal packing.
  std::vector<int16_t> fs_sym(primary_size, -1);
  std::vector<int8_t> fs_len(primary_size, 0);

  auto template_entry = [&](int sym) -> uint32_t {
    if (kind == 0) {
      if (sym < 256)
        return (static_cast<uint32_t>(sym) << 16) | LITERAL_ENTRY | (1u << 8);
      if (sym == 256) return EXCEPTIONAL_ENTRY;
      if (sym < 286)
        return (static_cast<uint32_t>(kLenBase[sym - 257]) << 16) |
               (static_cast<uint32_t>(kLenExtra[sym - 257]) << 8);
      return EXCEPTIONAL_ENTRY;
    }
    if (kind == 1) {
      if (sym < 30)
        return (static_cast<uint32_t>(kDistBase[sym]) << 16) |
               (static_cast<uint32_t>(kDistExtra[sym]) << 8) | LITERAL_ENTRY;
      return 0;
    }
    return static_cast<uint32_t>(sym) << 16;  // code-length table
  };

  for (int s : order) {
    int l = lengths[s];
    if (l > table_bits) break;
    uint32_t entry = template_entry(s) | static_cast<uint32_t>(l);
    for (size_t i = codes[s]; i < primary_size; i += (1u << l)) {
      primary[i] = entry;
      fs_sym[i] = static_cast<int16_t>(s);
      fs_len[i] = static_cast<int8_t>(l);
    }
  }

  if (kind == 0) {
    size_t mask = primary_size - 1;
    for (size_t i = 0; i < primary_size; i++) {
      int s1 = fs_sym[i];
      if (s1 < 0 || s1 >= 256) continue;
      int l1 = fs_len[i];
      size_t rest = (i >> l1) & mask;
      int s2 = fs_sym[rest];
      int l2 = (s2 >= 0) ? fs_len[rest] : 0;
      if (s2 >= 0 && s2 < 256 && l1 + l2 <= table_bits) {
        primary[i] = (static_cast<uint32_t>(s1) << 16) |
                     (static_cast<uint32_t>(s2) << 24) | LITERAL_ENTRY |
                     (2u << 8) | static_cast<uint32_t>(l1 + l2);
      }
    }
  }

  // Secondary tables for codes longer than table_bits.
  if (max_len > table_bits && secondary) {
    secondary->clear();
    size_t mask = primary_size - 1;
    int i = 0;
    while (i < static_cast<int>(order.size()) &&
           lengths[order[i]] <= table_bits)
      i++;
    long sub_start = -1;
    uint32_t sub_prefix = 0xffffffff;
    int group_max = 0;
    // group symbols by primary prefix (consecutive in canonical order)
    while (i < static_cast<int>(order.size())) {
      int s = order[i];
      int l = lengths[s];
      uint32_t prefix = codes[s] & mask;
      if (prefix != sub_prefix) {
        sub_prefix = prefix;
        sub_start = static_cast<long>(secondary->size());
        // subtable size: 2^(max length in this prefix group - table_bits)
        group_max = l;
        for (int j = i; j < static_cast<int>(order.size()); j++) {
          if ((codes[order[j]] & mask) != static_cast<uint32_t>(sub_prefix))
            continue;
          if (lengths[order[j]] > group_max) group_max = lengths[order[j]];
        }
        size_t sub_size = 1u << (group_max - table_bits);
        secondary->resize(sub_start + sub_size, 0);
        primary[sub_prefix] = (static_cast<uint32_t>(sub_start) << 16) |
                              EXCEPTIONAL_ENTRY | SECONDARY_TABLE_ENTRY |
                              static_cast<uint32_t>(sub_size - 1);
      }
      size_t step = 1u << (l - table_bits);
      uint16_t entry = static_cast<uint16_t>((s << 4) | l);
      for (size_t j = codes[s] >> table_bits;
           j < (1u << (group_max - table_bits)); j += step)
        (*secondary)[sub_start + j] = entry;
      i++;
    }
  }
  return true;
}

// ---- inflate --------------------------------------------------------------

static int inflate_block(BitReader& br, const DecodeTables& t, uint8_t* out,
                         size_t cap, size_t& pos, size_t* needed) {
  const uint32_t* litlen = t.litlen.data();
  const uint32_t* dist_tab = t.dist.data();
  for (;;) {
    br.refill_fast();
    uint64_t bits = br.buf;
    uint32_t e = litlen[bits & (LITLEN_SIZE - 1)];
    int code_bits = e & 0xff;

    if (e & LITERAL_ENTRY) {
      // Fast literal path: chain extra lookups while output room allows.
      if (br.nbits >= 48 && pos + 8 <= cap) {
        int adv1 = (e >> 8) & 0xf;
        out[pos] = static_cast<uint8_t>(e >> 16);
        out[pos + 1] = static_cast<uint8_t>(e >> 24);
        pos += adv1;
        uint64_t b2 = bits >> code_bits;
        uint32_t e2 = litlen[b2 & (LITLEN_SIZE - 1)];
        if (e2 & LITERAL_ENTRY) {
          int cb2 = e2 & 0xff;
          out[pos] = static_cast<uint8_t>(e2 >> 16);
          out[pos + 1] = static_cast<uint8_t>(e2 >> 24);
          pos += (e2 >> 8) & 0xf;
          uint64_t b3 = b2 >> cb2;
          uint32_t e3 = litlen[b3 & (LITLEN_SIZE - 1)];
          if (e3 & LITERAL_ENTRY) {
            out[pos] = static_cast<uint8_t>(e3 >> 16);
            out[pos + 1] = static_cast<uint8_t>(e3 >> 24);
            pos += (e3 >> 8) & 0xf;
            br.consume(code_bits + cb2 + (e3 & 0xff));
            continue;
          }
          br.consume(code_bits + cb2);
          continue;
        }
        br.consume(code_bits);
        continue;
      }
      // Careful literal path.
      if (br.nbits < code_bits) return INSUFFICIENT_INPUT;
      int adv = (e >> 8) & 0xf;
      if (pos + adv > cap) {
        if (needed) *needed = pos + adv;
        return OUTPUT_TOO_LARGE;
      }
      out[pos] = static_cast<uint8_t>(e >> 16);
      if (adv == 2) out[pos + 1] = static_cast<uint8_t>(e >> 24);
      pos += adv;
      br.consume(code_bits);
      continue;
    }

    uint32_t length_base, length_extra;
    if (!(e & EXCEPTIONAL_ENTRY)) {
      length_base = e >> 16;
      length_extra = (e >> 8) & 0xff;
    } else if (e & SECONDARY_TABLE_ENTRY) {
      uint32_t idx = (e >> 16) + ((bits >> LITLEN_BITS) & (e & 0xff));
      uint16_t se = t.litlen_sec[idx];
      int sym = se >> 4;
      code_bits = se & 0xf;
      if (br.nbits < code_bits) return INSUFFICIENT_INPUT;
      if (sym < 256) {
        if (pos + 1 > cap) {
          if (needed) *needed = pos + 1;
          return OUTPUT_TOO_LARGE;
        }
        out[pos++] = static_cast<uint8_t>(sym);
        br.consume(code_bits);
        continue;
      }
      if (sym == 256) {
        br.consume(code_bits);
        return -1;  // end of block
      }
      length_base = kLenBase[sym - 257];
      length_extra = kLenExtra[sym - 257];
    } else if (code_bits == 0) {
      return INVALID_LITERAL_LENGTH_CODE;
    } else {
      if (br.nbits < code_bits) return INSUFFICIENT_INPUT;
      br.consume(code_bits);
      return -1;  // end of block (EOF entry)
    }

    bits >>= code_bits;
    uint32_t length = length_base + (bits & ((1u << length_extra) - 1));
    bits >>= length_extra;

    uint32_t de = dist_tab[bits & (DIST_SIZE - 1)];
    uint32_t dist_base, dist_extra;
    int dist_code_bits;
    if (de & LITERAL_ENTRY) {
      dist_base = (de >> 16) & 0xffff;
      dist_extra = (de >> 8) & 0xf;
      dist_code_bits = de & 0xff;
    } else {
      if (br.nbits <= code_bits + static_cast<int>(length_extra) + DIST_BITS)
        return INSUFFICIENT_INPUT;
      if ((de >> 8) == 0) return INVALID_DISTANCE_CODE;
      uint32_t idx = (de >> 16) + ((bits >> DIST_BITS) & (de & 0xff));
      uint16_t se = t.dist_sec[idx];
      int sym = se >> 4;
      if (sym >= 30) return INVALID_DISTANCE_CODE;
      dist_base = kDistBase[sym];
      dist_extra = kDistExtra[sym];
      dist_code_bits = se & 0xf;
    }
    bits >>= dist_code_bits;
    uint32_t d = dist_base + (bits & ((1u << dist_extra) - 1));
    int total_bits =
        code_bits + length_extra + dist_code_bits + dist_extra;
    if (br.nbits < total_bits) return INSUFFICIENT_INPUT;
    if (d > pos) return DISTANCE_TOO_FAR_BACK;
    br.consume(total_bits);

    if (pos + length > cap) {
      if (needed) *needed = pos + length;
      return OUTPUT_TOO_LARGE;
    }
    if (d == 1) {
      std::memset(out + pos, out[pos - 1], length);
      pos += length;
    } else if (d >= length) {
      std::memcpy(out + pos, out + pos - d, length);
      pos += length;
    } else {
      // Overlapping copy: replicate the period, doubling each step.
      uint8_t* dst = out + pos;
      std::memmove(dst, dst - d, d);
      uint32_t filled = d;
      while (filled < length) {
        uint32_t chunk = filled < length - filled ? filled : length - filled;
        std::memcpy(dst + filled, dst, chunk);
        filled += chunk;
      }
      pos += length;
    }
  }
}

static int parse_dynamic_header(BitReader& br, DecodeTables& t) {
  br.refill();
  if (br.bits_left() < 17) return INSUFFICIENT_INPUT;
  int hlit = static_cast<int>(br.peek(5)) + 257;
  br.consume(5);
  int hdist = static_cast<int>(br.peek(5)) + 1;
  br.consume(5);
  int hclen = static_cast<int>(br.peek(4)) + 4;
  br.consume(4);
  if (hlit > 286) return INVALID_HLIT;
  if (hdist > 30) return INVALID_HDIST;

  uint8_t cl_lengths[19] = {0};
  for (int i = 0; i < hclen; i++) {
    br.refill();
    if (br.nbits < 3) return INSUFFICIENT_INPUT;
    cl_lengths[kClclOrder[i]] = static_cast<uint8_t>(br.peek(3));
    br.consume(3);
  }
  uint32_t cl_table[128];
  if (!build_table(cl_lengths, 19, 7, 2, cl_table, 128, nullptr, nullptr))
    return BAD_CODE_LENGTH_HUFFMAN_TREE;

  uint8_t lengths[320] = {0};
  int total = hlit + hdist;
  int n = 0;
  while (n < total) {
    br.refill();
    if (br.nbits < 7) return INSUFFICIENT_INPUT;
    uint32_t e = cl_table[br.peek(7)];
    int len = e & 0x7;
    int sym = (e >> 16) & 0xff;
    if (sym <= 15) {
      lengths[n++] = static_cast<uint8_t>(sym);
      br.consume(len);
    } else {
      int base, extra;
      uint8_t value = 0;
      if (sym == 16) {
        base = 3;
        extra = 2;
        if (n == 0) return INVALID_CODE_LENGTH_REPEAT;
        value = lengths[n - 1];
      } else if (sym == 17) {
        base = 3;
        extra = 3;
      } else {
        base = 11;
        extra = 7;
      }
      if (br.nbits < len + extra) return INSUFFICIENT_INPUT;
      int repeat = static_cast<int>(br.peek(len + extra) >> len) + base;
      br.consume(len + extra);
      if (n + repeat > total) return INVALID_CODE_LENGTH_REPEAT;
      std::memset(lengths + n, value, repeat);
      n += repeat;
    }
  }

  uint8_t litlen_lengths[288] = {0};
  uint8_t dist_lengths[32] = {0};
  std::memcpy(litlen_lengths, lengths, hlit);
  std::memcpy(dist_lengths, lengths + hlit, hdist);

  if (litlen_lengths[256] == 0) return BAD_LITERAL_LENGTH_HUFFMAN_TREE;
  uint16_t codes[288];
  if (!build_table(litlen_lengths, hlit, LITLEN_BITS, 0, t.litlen.data(),
                   LITLEN_SIZE, &t.litlen_sec, codes))
    return BAD_CODE_LENGTH_HUFFMAN_TREE;
  t.eof_code = codes[256];
  t.eof_bits = litlen_lengths[256];
  t.eof_mask = static_cast<uint16_t>((1u << t.eof_bits) - 1);

  bool any = false;
  for (int i = 0; i < 32; i++) any |= dist_lengths[i] != 0;
  if (!any) {
    std::fill(t.dist.begin(), t.dist.end(), 0);
  } else if (!build_table(dist_lengths, 32, DIST_BITS, 1, t.dist.data(),
                          DIST_SIZE, &t.dist_sec, nullptr)) {
    return BAD_DISTANCE_HUFFMAN_TREE;
  }
  return OK;
}

static void fixed_tables(DecodeTables& t) {
  uint8_t lengths[288];
  for (int i = 0; i < 144; i++) lengths[i] = 8;
  for (int i = 144; i < 256; i++) lengths[i] = 9;
  for (int i = 256; i < 280; i++) lengths[i] = 7;
  for (int i = 280; i < 288; i++) lengths[i] = 8;
  uint16_t codes[288];
  build_table(lengths, 288, LITLEN_BITS, 0, t.litlen.data(), LITLEN_SIZE,
              &t.litlen_sec, codes);
  uint8_t dl[32];
  for (int i = 0; i < 32; i++) dl[i] = 5;
  build_table(dl, 32, DIST_BITS, 1, t.dist.data(), DIST_SIZE, &t.dist_sec,
              nullptr);
  t.eof_code = codes[256];
  t.eof_bits = 7;
  t.eof_mask = 0x7f;
}

}  // namespace

extern "C" {

// Decode a whole zlib stream.  Returns bytes written (>= 0) or -status.
// On OUTPUT_TOO_LARGE, *needed contains a lower bound for the retry size.
long long fdn_inflate(const uint8_t* in, size_t in_len, uint8_t* out,
                      size_t cap, int ignore_adler32, size_t* needed) {
  BitReader br(in, in_len);
  br.refill();
  if (br.bits_left() < 16) return -INSUFFICIENT_INPUT;
  uint32_t cmf = static_cast<uint32_t>(br.peek(8));
  uint32_t flg = static_cast<uint32_t>(br.peek(16) >> 8);
  if ((cmf & 0x0f) != 0x08 || (cmf & 0xf0) > 0x70 || (flg & 0x20) != 0 ||
      ((cmf << 8) | flg) % 31 != 0)
    return -BAD_ZLIB_HEADER;
  br.consume(16);

  DecodeTables tables;
  bool have_fixed = false;
  size_t pos = 0;
  bool last = false;
  while (!last) {
    br.refill();
    if (br.nbits < 3) return -INSUFFICIENT_INPUT;
    last = br.peek(1);
    int btype = static_cast<int>(br.peek(3) >> 1);
    br.consume(3);
    if (btype == 0) {  // stored
      br.consume(br.nbits & 7);
      br.refill();
      if (br.nbits < 32) return -INSUFFICIENT_INPUT;
      uint32_t len = static_cast<uint32_t>(br.peek(16));
      br.consume(16);
      uint32_t nlen = static_cast<uint32_t>(br.peek(16));
      br.consume(16);
      if (nlen != (~len & 0xffff)) return -INVALID_UNCOMPRESSED_BLOCK_LENGTH;
      if (pos + len > cap) {
        if (needed) *needed = pos + len;
        return -OUTPUT_TOO_LARGE;
      }
      // Drain buffered bytes, then copy directly.
      while (len > 0 && br.nbits >= 8) {
        out[pos++] = static_cast<uint8_t>(br.peek(8));
        br.consume(8);
        len--;
      }
      if (len > 0) {
        if (br.size - br.byte < len) return -INSUFFICIENT_INPUT;
        std::memcpy(out + pos, br.data + br.byte, len);
        pos += len;
        br.byte += len;
      }
      continue;
    }
    if (btype == 1) {
      if (!have_fixed) {
        fixed_tables(tables);
        have_fixed = true;
      }
    } else if (btype == 2) {
      int rc = parse_dynamic_header(br, tables);
      if (rc != OK) return -rc;
      have_fixed = false;
    } else {
      return -INVALID_BLOCK_TYPE;
    }
    int rc = inflate_block(br, tables, out, cap, pos, needed);
    if (rc != -1) return -rc;
  }

  // checksum
  br.consume(br.nbits & 7);
  br.refill();
  if (br.nbits < 32) return -INSUFFICIENT_INPUT;
  uint32_t stored = static_cast<uint32_t>(br.peek(32));
  stored = __builtin_bswap32(stored);
  br.consume(32);
  if (!ignore_adler32 && stored != adler32(out, pos)) return -WRONG_CHECKSUM;
  return static_cast<long long>(pos);
}

// Expand packed decode records from the TPU record kernel
// (fdeflate_tpu/ops/pallas_inflate.py: bits 30..28 kind — 0 idle, 1 packed
// literals cnt<<16|lit1<<8|lit0, 2 match (len-3)<<15|(dist-1), 3 EOB,
// 4 error) into output bytes.  Consumer-side materialization: the TPU does
// the bit-serial symbol phase in parallel lanes; the LZ77 byte expansion is
// memcpy-bound and runs wherever the bytes are consumed.  Returns bytes
// written, or -1 on a malformed record stream (bad distance / error record
// / overflow).
long long fdn_materialize(const int32_t* recs, size_t n_recs, uint8_t* out,
                          size_t cap) {
  size_t pos = 0;
  for (size_t i = 0; i < n_recs; i++) {
    uint32_t rec = static_cast<uint32_t>(recs[i]);
    uint32_t kind = (rec >> 28) & 0xF;
    if (kind == 0 || kind == 3) continue;  // idle / end-of-block
    uint32_t pay = rec & 0x0FFFFFFF;
    if (kind == 1) {
      uint32_t cnt = (pay >> 16) & 3;
      if (pos + cnt > cap) return -1;
      out[pos] = static_cast<uint8_t>(pay & 0xFF);
      if (cnt == 2) out[pos + 1] = static_cast<uint8_t>((pay >> 8) & 0xFF);
      pos += cnt;
    } else if (kind == 2) {
      uint32_t len = ((pay >> 15) & 0xFF) + 3;
      uint32_t dist = (pay & 0x7FFF) + 1;
      if (dist > pos || pos + len > cap) return -1;
      uint8_t* dst = out + pos;
      const uint8_t* src = dst - dist;
      if (dist == 1) {
        memset(dst, src[0], len);
      } else if (dist >= len) {
        memcpy(dst, src, len);
      } else {
        for (uint32_t j = 0; j < len; j++) dst[j] = src[j];
      }
      pos += len;
    } else {
      return -1;  // error record
    }
  }
  return static_cast<long long>(pos);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Encoder
// ---------------------------------------------------------------------------

namespace {

struct BitWriter {
  uint8_t* out;
  size_t cap;
  size_t pos = 0;
  uint64_t buf = 0;
  int nbits = 0;
  bool overflow = false;

  BitWriter(uint8_t* o, size_t c) : out(o), cap(c) {}

  inline void write(uint64_t bits, int n) {
    buf |= bits << nbits;
    nbits += n;
    if (nbits >= 64) {
      if (pos + 8 > cap) {
        overflow = true;
        return;
      }
      std::memcpy(out + pos, &buf, 8);
      pos += 8;
      nbits -= 64;
      buf = nbits > 0 ? bits >> (n - nbits) : 0;
    }
  }
  void flush_byte_align() {
    if (nbits & 7) write(0, 8 - (nbits & 7));
    while (nbits >= 8) {
      if (pos >= cap) {
        overflow = true;
        return;
      }
      out[pos++] = static_cast<uint8_t>(buf);
      buf >>= 8;
      nbits -= 8;
    }
  }
  void put_bytes(const uint8_t* p, size_t n) {
    if (pos + n > cap) {
      overflow = true;
      return;
    }
    std::memcpy(out + pos, p, n);
    pos += n;
  }
};

// Trained tree (data shared with the Python layer; tables.py documents it).
#include "trained_tree.inc"


uint16_t g_length_to_symbol[259];
uint8_t g_length_to_extra[259];
uint8_t g_dist_to_sym_small[256];

struct InitMaps {
  InitMaps() {
    for (int s = 0; s < 28; s++) {
      uint32_t base = kLenBase[s];
      uint32_t span = 1u << kLenExtra[s];
      for (uint32_t l = base; l < base + span && l <= 258; l++) {
        g_length_to_symbol[l] = static_cast<uint16_t>(257 + s);
        g_length_to_extra[l] = kLenExtra[s];
      }
    }
    g_length_to_symbol[258] = 285;
    g_length_to_extra[258] = 0;
    for (int d = 1; d <= 256; d++) {
      int sym = 29;
      while (sym > 0 && d < kDistBase[sym]) sym--;
      g_dist_to_sym_small[d - 1] = static_cast<uint8_t>(sym);
    }
  }
} g_init_maps;

static inline int dist_to_sym(uint32_t d) {
  if (d <= 256) return g_dist_to_sym_small[d - 1];
  int sym = 29;
  while (sym > 0 && d < kDistBase[sym]) sym--;
  return sym;
}

// ---- ultra-fast encoder ---------------------------------------------------

constexpr uint8_t kUltraHeader[54] = {
    120, 1,   237, 192, 3,   160, 36,  89,  150, 198, 241, 255, 119, 238,
    141, 200, 204, 167, 114, 75,  99,  174, 109, 219, 182, 109, 219, 182,
    109, 219, 182, 109, 105, 140, 158, 150, 74,  175, 158, 50,  51,  34,
    238, 249, 118, 183, 106, 122, 166, 135, 59,  107, 213, 15};

static void write_run(BitWriter& bw, uint32_t run) {
  bw.write(kTrainedCodes[0], kTrainedLengths[0]);
  run -= 1;
  while (run >= 258) {
    bw.write(kTrainedCodes[285], kTrainedLengths[285] + 1);
    run -= 258;
  }
  if (run > 4) {
    int sym = g_length_to_symbol[run];
    bw.write(kTrainedCodes[sym], kTrainedLengths[sym]);
    int extra = g_length_to_extra[run];
    bw.write((run - 3) & ((1u << extra) - 1), extra + 1);
  } else {
    bw.write(0, static_cast<int>(run) * kTrainedLengths[0]);
  }
}

}  // namespace

extern "C" {

// Ultra-fast compress; returns bytes written or -1 if out buffer too small.
long long fdn_compress_ultra(const uint8_t* in, size_t n, uint8_t* out,
                             size_t cap) {
  if (cap < 64) return -1;
  BitWriter bw(out, cap);
  bw.put_bytes(kUltraHeader, 53);
  bw.write(kUltraHeader[53] & 0x1f, 5);

  uint32_t run = 0;
  size_t i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t chunk;
    std::memcpy(&chunk, in + i, 8);
    if (chunk == 0) {
      run += 8;
      continue;
    }
    if (run > 0) {
      uint32_t t = __builtin_ctzll(chunk) / 8;
      write_run(bw, run + t);
      run = 0;
      if (t > 0) {
        uint32_t l = __builtin_clzll(chunk) / 8;
        for (size_t j = i + t; j < i + 8 - l; j++)
          bw.write(kTrainedCodes[in[j]], kTrainedLengths[in[j]]);
        run = l;
        continue;
      }
    }
    uint32_t l = __builtin_clzll(chunk) / 8;
    if (l > 0) {
      for (size_t j = i; j < i + 8 - l; j++)
        bw.write(kTrainedCodes[in[j]], kTrainedLengths[in[j]]);
      run = l;
      continue;
    }
    // dense chunk: two packed 4-literal writes
    for (int half = 0; half < 2; half++) {
      const uint8_t* p = in + i + half * 4;
      uint64_t bits = 0;
      int total = 0;
      for (int j = 0; j < 4; j++) {
        bits |= static_cast<uint64_t>(kTrainedCodes[p[j]]) << total;
        total += kTrainedLengths[p[j]];
      }
      bw.write(bits, total);
    }
    if (bw.overflow) return -1;
  }
  if (run > 0) write_run(bw, run);
  for (; i < n; i++) bw.write(kTrainedCodes[in[i]], kTrainedLengths[in[i]]);

  bw.write(kTrainedCodes[256], kTrainedLengths[256]);
  bw.flush_byte_align();
  if (bw.overflow) return -1;
  uint32_t ck = adler32(in, n);
  uint8_t be[4] = {static_cast<uint8_t>(ck >> 24), static_cast<uint8_t>(ck >> 16),
                   static_cast<uint8_t>(ck >> 8), static_cast<uint8_t>(ck)};
  bw.put_bytes(be, 4);
  if (bw.overflow) return -1;
  return static_cast<long long>(bw.pos);
}

}  // extern "C"
