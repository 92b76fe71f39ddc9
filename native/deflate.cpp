// Native compressor: levels 0-7 greedy/lazy LZ77 + dynamic Huffman blocks.
//
// One-shot (whole-buffer) encoder with the same level -> (parser, finder)
// map and parsing semantics as the Python layer (fdeflate_tpu/models/
// compressor.py, mirroring /root/reference/src/compress/mod.rs:75-88):
// inline RLE runs, skip-ahead, backward match extension with greedy
// "fizzle", lazy deferral, 16384-symbol block cuts, 32 KiB window.
//
// Compiled into libfdeflate_native.so together with fdeflate_native.cpp.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace fdn_defl {

constexpr int WINDOW_SIZE = 32768;
constexpr int CACHE_SIZE = 1 << 16;
constexpr int MAX_MATCH = 258;
constexpr int BLOCK_SYMBOLS = 16384;

extern const uint16_t kLenBase2[29];
extern const uint8_t kLenExtra2[29];
extern const uint16_t kDistBase2[30];
extern const uint8_t kDistExtra2[30];
const uint16_t kLenBase2[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17,
                                19, 23, 27, 31, 35, 43, 51, 59, 67, 83,
                                99, 115, 131, 163, 195, 227, 258};
const uint8_t kLenExtra2[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
const uint16_t kDistBase2[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25,
                                 33, 49, 65, 97, 129, 193, 257, 385,
                                 513, 769, 1025, 1537, 2049, 3073, 4097,
                                 6145, 8193, 12289, 16385, 24577};
const uint8_t kDistExtra2[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
                                 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
                                 12, 12, 13, 13};
const uint8_t kClclOrder2[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                 11, 4, 12, 3, 13, 2, 14, 1, 15};

struct LenMaps {
  uint16_t sym[259];
  uint8_t extra[259];
  LenMaps() {
    for (int s = 0; s < 28; s++)
      for (uint32_t l = kLenBase2[s];
           l < kLenBase2[s] + (1u << kLenExtra2[s]) && l <= 258; l++) {
        sym[l] = static_cast<uint16_t>(257 + s);
        extra[l] = kLenExtra2[s];
      }
    sym[258] = 285;
    extra[258] = 0;
  }
};
static const LenMaps g_len;

static inline int dist_sym(uint32_t d) {
  int s = 29;
  while (s > 0 && d < kDistBase2[s]) s--;
  return s;
}

static uint32_t adler32d(const uint8_t* p, size_t n) {
  uint32_t a = 1, b = 0;
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

struct Writer {
  uint8_t* out;
  size_t cap;
  size_t pos = 0;
  uint64_t buf = 0;
  int nbits = 0;
  bool overflow = false;

  inline void bits(uint64_t v, int n) {
    buf |= v << nbits;
    nbits += n;
    if (nbits >= 64) {
      if (pos + 8 > cap) {
        overflow = true;
        nbits -= 64;
        return;
      }
      std::memcpy(out + pos, &buf, 8);
      pos += 8;
      nbits -= 64;
      buf = nbits > 0 ? v >> (n - nbits) : 0;
    }
  }
  void align_flush() {
    if (nbits & 7) bits(0, 8 - (nbits & 7));
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
  void bytes(const uint8_t* p, size_t n) {
    if (pos + n > cap) {
      overflow = true;
      return;
    }
    std::memcpy(out + pos, p, n);
    pos += n;
  }
};

// Symbols: literal run [start, end) or backref (length, distance).
struct Sym {
  uint32_t start;
  uint32_t end;      // end == 0 => backref
  uint16_t length;
  uint16_t distance;
};

// ---- Huffman tree construction (heap + Kraft length limiting) -------------

static bool huffman_lengths(const uint32_t* freq, int n, int limit,
                            uint8_t* lengths, uint16_t* codes) {
  std::memset(lengths, 0, n);
  std::memset(codes, 0, n * sizeof(uint16_t));

  int used = 0, first = -1;
  for (int i = 0; i < n; i++)
    if (freq[i]) {
      used++;
      if (first < 0) first = i;
    }
  if (used <= 1) {
    if (first >= 0) lengths[first] = 1;
    return false;
  }

  using Item = std::pair<uint32_t, int>;  // (freq, node id), min-heap
  std::priority_queue<Item, std::vector<Item>, std::greater<Item>> heap;
  std::vector<std::pair<int, int>> parents;
  parents.reserve(n);
  for (int i = 0; i < n; i++)
    if (freq[i]) heap.push({freq[i], i});
  int next_id = n;
  while (heap.size() > 1) {
    Item a = heap.top();
    heap.pop();
    Item b = heap.top();
    heap.pop();
    parents.push_back({a.second, b.second});
    heap.push({a.first + b.first, next_id++});
  }

  std::vector<std::pair<int, int>> stack;
  stack.push_back({heap.top().second, 0});
  int max_len = 0;
  while (!stack.empty()) {
    auto [node, depth] = stack.back();
    stack.pop_back();
    if (node < n) {
      lengths[node] = static_cast<uint8_t>(depth);
      max_len = std::max(max_len, depth);
    } else {
      auto [l, r] = parents[node - n];
      stack.push_back({l, depth + 1});
      stack.push_back({r, depth + 1});
    }
  }

  if (max_len > limit) {
    uint32_t counts[16] = {0};
    for (int i = 0; i < n; i++)
      if (lengths[i]) counts[std::min<int>(lengths[i], limit)]++;
    long total = 0;
    for (int i = 1; i <= limit; i++)
      total += static_cast<long>(counts[i]) << (limit - i);
    while (total > (1l << limit)) {
      int i = limit - 1;
      while (counts[i] == 0) i--;
      counts[i]--;
      counts[limit]--;
      counts[i + 1] += 2;
      total--;
    }
    // least-frequent symbols take the longest codes (stable by freq)
    std::vector<int> order(n);
    for (int i = 0; i < n; i++) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return freq[a] < freq[b]; });
    int len = limit;
    for (int i : order) {
      if (!freq[i]) continue;
      while (counts[len] == 0) len--;
      lengths[i] = static_cast<uint8_t>(len);
      counts[len]--;
    }
  }

  // canonical bit-reversed codes
  uint32_t code = 0;
  for (int l = 1; l <= limit; l++) {
    for (int i = 0; i < n; i++)
      if (lengths[i] == l) {
        uint32_t c = code++, r = 0;
        for (int b = 0; b < l; b++) {
          r = (r << 1) | (c & 1);
          c >>= 1;
        }
        codes[i] = static_cast<uint16_t>(r);
      }
    code <<= 1;
  }
  return true;
}

// ---- block writer ---------------------------------------------------------

static void count_and_build(const uint8_t* data, const std::vector<Sym>& syms,
                            uint8_t* lens, uint16_t* codes, uint8_t* dlens,
                            uint16_t* dcodes) {
  uint32_t freq[286] = {0};
  uint32_t dfreq[30] = {0};
  freq[256] = 1;
  for (const Sym& s : syms) {
    if (s.end) {
      for (uint32_t i = s.start; i < s.end; i++) freq[data[i]]++;
    } else {
      freq[g_len.sym[s.length]]++;
      dfreq[dist_sym(s.distance)]++;
    }
  }
  huffman_lengths(freq, 286, 15, lens, codes);
  huffman_lengths(dfreq, 30, 15, dlens, dcodes);
}

// Cost-aware backref demotion (twin of models/bitstream.py:_demote_unprofitable):
// short matches whose literal encoding is cheaper — under a shadow
// literals-only tree, plus a margin for the codespace the match symbols
// consume — are rewritten as literal runs.  Keeps compressed size monotone
// in the level on LZ-hostile inputs (SIZES.md).
static const uint32_t kDemoteMaxLen = 32;
static const int kDemoteMargin = 3;

static bool demote_unprofitable(const uint8_t* data, std::vector<Sym>& syms,
                                const uint8_t* lens, const uint8_t* dlens) {
  uint32_t hist[256] = {0};
  for (const Sym& s : syms) {
    uint32_t lo = s.start;
    uint32_t hi = s.end ? s.end : s.start + s.length;
    for (uint32_t i = lo; i < hi; i++) hist[data[i]]++;
  }
  uint8_t slens[256];
  uint16_t scodes[256];
  huffman_lengths(hist, 256, 15, slens, scodes);
  int cost[256];
  for (int i = 0; i < 256; i++) cost[i] = slens[i] ? slens[i] : 15;

  bool changed = false;
  std::vector<Sym> out;
  out.reserve(syms.size());
  for (const Sym& s : syms) {
    if (!s.end && s.length <= kDemoteMaxLen) {
      int ls = g_len.sym[s.length];
      int ds = dist_sym(s.distance);
      int mb = lens[ls] + g_len.extra[s.length] + dlens[ds] + kDistExtra2[ds] +
               kDemoteMargin;
      long lb = 0;
      for (uint32_t i = s.start; i < s.start + s.length; i++) lb += cost[data[i]];
      if (lb < mb) {
        changed = true;
        if (!out.empty() && out.back().end == s.start) {
          out.back().end = s.start + s.length;
        } else {
          out.push_back({s.start, s.start + s.length, 0, 0});
        }
        continue;
      }
    }
    out.push_back(s);
  }
  if (changed) syms.swap(out);
  return changed;
}

// Exact serialized bit size of a block under the given trees.
static long long block_cost_bits(const uint8_t* data,
                                 const std::vector<Sym>& syms,
                                 const uint8_t* lens, const uint8_t* dlens) {
  int nlit = 286;
  while (nlit > 257 && lens[nlit - 1] == 0) nlit--;
  int ndist = 30;
  while (ndist > 1 && dlens[ndist - 1] == 0) ndist--;
  uint32_t clfreq[19] = {0};
  for (int i = 0; i < nlit; i++) clfreq[lens[i]]++;
  for (int i = 0; i < ndist; i++) clfreq[dlens[i]]++;
  uint8_t cllens[19];
  uint16_t clcodes[19];
  huffman_lengths(clfreq, 19, 7, cllens, clcodes);
  long long bits = 3 + 5 + 5 + 4 + 3 * 19;
  for (int i = 0; i < nlit; i++) bits += cllens[lens[i]];
  for (int i = 0; i < ndist; i++) bits += cllens[dlens[i]];
  for (const Sym& s : syms) {
    if (s.end) {
      for (uint32_t i = s.start; i < s.end; i++) bits += lens[data[i]];
    } else {
      int ds = dist_sym(s.distance);
      bits += lens[g_len.sym[s.length]] + g_len.extra[s.length] + dlens[ds] +
              kDistExtra2[ds];
    }
  }
  return bits + lens[256];
}

static void write_block(Writer& w, const uint8_t* data, std::vector<Sym>& syms,
                        bool final_block) {
  uint8_t lens[286], dlens[30], cllens[19];
  uint16_t codes[286], dcodes[30], clcodes[19];
  count_and_build(data, syms, lens, codes, dlens, dcodes);
  // Iterated demotion, keeping the exactly-cheapest candidate (the
  // per-symbol cost model can over-fire; the whole-block measured size
  // decides, so demotion never grows a block).
  {
    long long best_cost = block_cost_bits(data, syms, lens, dlens);
    std::vector<Sym> best_syms = syms;
    uint8_t blens[286], bdlens[30];
    uint16_t bcodes[286], bdcodes[30];
    std::memcpy(blens, lens, sizeof lens);
    std::memcpy(bdlens, dlens, sizeof dlens);
    std::memcpy(bcodes, codes, sizeof codes);
    std::memcpy(bdcodes, dcodes, sizeof dcodes);
    for (int pass = 0; pass < 3; pass++) {
      if (!demote_unprofitable(data, syms, lens, dlens)) break;
      count_and_build(data, syms, lens, codes, dlens, dcodes);
      long long cost = block_cost_bits(data, syms, lens, dlens);
      if (cost < best_cost) {
        best_cost = cost;
        best_syms = syms;
        std::memcpy(blens, lens, sizeof lens);
        std::memcpy(bdlens, dlens, sizeof dlens);
        std::memcpy(bcodes, codes, sizeof codes);
        std::memcpy(bdcodes, dcodes, sizeof dcodes);
      }
    }
    syms.swap(best_syms);
    std::memcpy(lens, blens, sizeof lens);
    std::memcpy(dlens, bdlens, sizeof dlens);
    std::memcpy(codes, bcodes, sizeof codes);
    std::memcpy(dcodes, bdcodes, sizeof dcodes);
  }

  int nlit = 286;
  while (nlit > 257 && lens[nlit - 1] == 0) nlit--;
  int ndist = 30;
  while (ndist > 1 && dlens[ndist - 1] == 0) ndist--;

  uint32_t clfreq[19] = {0};
  for (int i = 0; i < nlit; i++) clfreq[lens[i]]++;
  for (int i = 0; i < ndist; i++) clfreq[dlens[i]]++;
  huffman_lengths(clfreq, 19, 7, cllens, clcodes);

  w.bits(final_block ? 0b101 : 0b100, 3);
  w.bits(nlit - 257, 5);
  w.bits(ndist - 1, 5);
  w.bits(15, 4);
  for (int i = 0; i < 19; i++) w.bits(cllens[kClclOrder2[i]], 3);
  for (int i = 0; i < nlit; i++) w.bits(clcodes[lens[i]], cllens[lens[i]]);
  for (int i = 0; i < ndist; i++) w.bits(clcodes[dlens[i]], cllens[dlens[i]]);

  for (const Sym& s : syms) {
    if (s.end) {
      uint32_t i = s.start;
      for (; i + 4 <= s.end; i += 4) {
        uint64_t b = codes[data[i]];
        int t = lens[data[i]];
        b |= static_cast<uint64_t>(codes[data[i + 1]]) << t;
        t += lens[data[i + 1]];
        b |= static_cast<uint64_t>(codes[data[i + 2]]) << t;
        t += lens[data[i + 2]];
        b |= static_cast<uint64_t>(codes[data[i + 3]]) << t;
        t += lens[data[i + 3]];
        w.bits(b, t);
      }
      for (; i < s.end; i++) w.bits(codes[data[i]], lens[data[i]]);
    } else {
      int ls = g_len.sym[s.length];
      w.bits(codes[ls], lens[ls]);
      int le = g_len.extra[s.length];
      w.bits((s.length - 3) & ((1u << le) - 1), le);
      int ds = dist_sym(s.distance);
      w.bits(dcodes[ds], dlens[ds]);
      int de = kDistExtra2[ds];
      w.bits(s.distance - kDistBase2[ds], de);
    }
  }
  w.bits(codes[256], lens[256]);
}

// ---- match finding --------------------------------------------------------

static inline uint32_t hash_of(uint64_t v) {
  return static_cast<uint32_t>((v * 11400714785074694791ull) >> 40);
}
static inline uint64_t read8(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

struct MatchResult {
  uint32_t length = 0;
  uint32_t distance = 0;
  uint32_t start = 0;
  bool empty() const { return length == 0; }
  uint32_t end() const { return start + length; }
};

// common prefix/suffix extension
static MatchResult extend(const uint8_t* data, size_t n, uint64_t value,
                          size_t anchor, size_t ip, size_t prev, bool min8) {
  uint64_t pv = read8(data + prev);
  uint32_t length;
  if (min8) {
    if (value != pv) return {};
    length = 8;
  } else {
    if (static_cast<uint32_t>(value) != static_cast<uint32_t>(pv)) return {};
    length = value == pv ? 8 : __builtin_ctzll(value ^ pv) / 8;
  }
  // backward
  while (length < MAX_MATCH && ip > anchor && prev > 0 &&
         data[ip - 1] == data[prev - 1]) {
    length++;
    ip--;
    prev--;
  }
  // forward
  size_t limit = std::min<size_t>(n - ip, MAX_MATCH);
  while (length + 8 <= limit) {
    uint64_t a = read8(data + ip + length);
    uint64_t b = read8(data + prev + length);
    if (a == b) {
      length += 8;
    } else {
      length += __builtin_ctzll(a ^ b) / 8;
      if (length > limit) length = static_cast<uint32_t>(limit);
      return {length, static_cast<uint32_t>(ip - prev),
              static_cast<uint32_t>(ip)};
    }
  }
  while (length < limit && data[ip + length] == data[prev + length]) length++;
  return {length, static_cast<uint32_t>(ip - prev), static_cast<uint32_t>(ip)};
}

static MatchResult rle_match(const uint8_t* data, size_t n, size_t last_match,
                             size_t ip) {
  uint8_t v = data[ip];
  MatchResult m{4, 1, static_cast<uint32_t>(ip + 1)};
  size_t min_start = std::max<size_t>(
      {1, last_match, m.end() > MAX_MATCH ? m.end() - MAX_MATCH : 0});
  while (m.start > min_start && data[m.start - 2] == v) {
    m.start--;
    m.length++;
  }
  size_t limit = std::min<size_t>(n - m.end(), MAX_MATCH - m.length);
  size_t p = m.end();
  size_t c = 0;
  while (c < limit && data[p + c] == v) c++;
  m.length += static_cast<uint32_t>(c);
  return m;
}

struct Finder {
  // Unified finder covering hashtable (chains=0), hashchain, hybrid modes.
  std::vector<uint32_t> head = std::vector<uint32_t>(CACHE_SIZE, 0);
  std::vector<uint32_t> links;
  std::vector<uint32_t> head4;
  int min_match;
  int search_depth;
  int nice_length;
  uint64_t mask;
  uint64_t mask4 = 0;
  bool hybrid = false;
  bool min8;

  Finder(int min_match_, int depth, int nice, bool hybrid_)
      : min_match(min_match_),
        search_depth(depth),
        nice_length(nice),
        hybrid(hybrid_) {
    int chain_bytes = hybrid ? std::min(min_match + 1, 8) : min_match;
    mask = ~0ull >> (8 * (8 - chain_bytes));
    min8 = !hybrid && min_match == 8;
    if (search_depth > 1 || hybrid) links.assign(WINDOW_SIZE, 0);
    if (hybrid) {
      head4.assign(CACHE_SIZE, 0);
      mask4 = ~0ull >> (8 * (8 - min_match));
    }
  }

  MatchResult lookup(const uint8_t* data, size_t n, size_t anchor, size_t ip,
                     uint64_t value, int want_match) {
    uint32_t min_offset =
        std::max<uint32_t>(ip > 32768 ? static_cast<uint32_t>(ip - 32768) : 0, 1);
    MatchResult best{};
    uint32_t best_len = want_match - 1;

    uint32_t off4 = 0;
    if (hybrid) {
      uint32_t h4 = hash_of(value & mask4) % CACHE_SIZE;
      off4 = head4[h4];
      head4[h4] = static_cast<uint32_t>(ip);
    }

    uint32_t h = hash_of(value & mask) % CACHE_SIZE;
    uint32_t off = head[h];
    head[h] = static_cast<uint32_t>(ip);
    if (!links.empty()) links[ip % WINDOW_SIZE] = off;

    int depth = search_depth;
    if (hybrid && want_match > min_match) depth >>= 2;

    while (off >= min_offset) {
      MatchResult m = extend(data, n, value, anchor, ip, off, min8);
      if (m.length > best_len) {
        best_len = m.length;
        best = m;
      }
      if (m.length >= static_cast<uint32_t>(nice_length) ||
          ip + m.length == n)
        break;
      if (--depth == 0 || links.empty()) break;
      off = links[off % WINDOW_SIZE];
    }

    if (hybrid && best_len < static_cast<uint32_t>(min_match) &&
        off4 > min_offset) {
      MatchResult m = extend(data, n, value, anchor, ip, off4, false);
      best_len = m.length;
      best = m;
    }

    int need = hybrid ? want_match : min_match;
    if (best_len >= static_cast<uint32_t>(need)) return best;
    return {};
  }

  inline void insert(uint64_t value, size_t pos) {
    if (hybrid) head4[hash_of(value & mask4) % CACHE_SIZE] = static_cast<uint32_t>(pos);
    uint32_t h = hash_of(value & mask) % CACHE_SIZE;
    if (!links.empty()) links[pos % WINDOW_SIZE] = head[h];
    head[h] = static_cast<uint32_t>(pos);
  }
};

// ---- parsers --------------------------------------------------------------

struct Parser {
  Finder finder;
  int skip_shift;
  int max_lazy;  // 0 => greedy
  std::vector<Sym> syms;
  size_t ip = 0;
  size_t last_match = 0;

  Parser(Finder f, int skip, int lazy)
      : finder(std::move(f)), skip_shift(skip), max_lazy(lazy) {}

  MatchResult get_match(const uint8_t* data, size_t n, bool fizzle) {
    uint64_t cur = read8(data + ip);
    if (static_cast<uint32_t>(cur) == static_cast<uint32_t>(cur >> 8)) {
      MatchResult m = rle_match(data, n, last_match, ip);
      ip = m.end() - 3;
      return m;
    }
    size_t anchor = fizzle ? ip : last_match;
    MatchResult m = finder.lookup(data, n, anchor, ip, cur,
                                  finder.hybrid ? 4 : finder.min_match);
    if (fizzle && !m.empty()) {
      while (m.length < MAX_MATCH && m.start > last_match &&
             m.start > m.distance + 1u &&
             data[m.start - 1] == data[m.start - m.distance - 1]) {
        m.length++;
        m.start--;
      }
    }
    ip++;
    return m;
  }

  MatchResult advance_to_match(const uint8_t* data, size_t n, size_t max_ip) {
    while (ip < max_ip) {
      MatchResult m = get_match(data, n, false);
      if (!m.empty()) return m;
      ip += (ip - last_match) >> skip_shift;
    }
    return {};
  }

  void advance_insert(const uint8_t* data, size_t n, size_t end) {
    size_t stop = std::min(end, n >= 8 ? n - 8 : 0);
    for (size_t j = ip; j < stop; j++) finder.insert(read8(data + j), j);
    ip = std::max(ip, end);
  }

  void emit(const uint8_t* data, const MatchResult& m) {
    if (m.start > last_match)
      syms.push_back({static_cast<uint32_t>(last_match), m.start, 0, 0});
    // start carries the match position (end == 0 still marks a backref);
    // the block writer's demotion pass needs it to price the literals.
    syms.push_back({static_cast<uint32_t>(m.start), 0,
                    static_cast<uint16_t>(m.length),
                    static_cast<uint16_t>(m.distance)});
    last_match = m.end();
  }

  void maybe_block(Writer& w, const uint8_t* data, size_t n) {
    if (syms.size() >= BLOCK_SYMBOLS) {
      write_block(w, data, syms, false);
      syms.clear();
    }
  }

  void run_greedy(Writer& w, const uint8_t* data, size_t n) {
    size_t max_ip = n > 7 ? n - 7 : 0;
    MatchResult m{};
    for (;;) {
      if (m.empty()) {
        m = advance_to_match(data, n, max_ip);
        if (m.empty()) break;
      }
      advance_insert(data, n, m.end());
      MatchResult m2{};
      if (ip < max_ip) m2 = get_match(data, n, true);
      if (m2.empty() || m2.start > m.start + 1) {
        emit(data, m);
        maybe_block(w, data, n);
        if (!m2.empty() && m2.start < last_match) {
          uint32_t cut = static_cast<uint32_t>(last_match) - m2.start;
          if (m2.length >= cut + 4) {
            m2.length -= cut;
            m2.start = static_cast<uint32_t>(last_match);
          } else {
            m2 = {};
          }
        }
      }
      m = m2;
    }
  }

  void run_lazy(Writer& w, const uint8_t* data, size_t n) {
    size_t max_ip = n > 7 ? n - 7 : 0;
    MatchResult m0{}, m1{};
    for (;;) {
      if (m1.empty()) {
        m1 = advance_to_match(data, n, max_ip);
        if (m1.empty()) break;
      }
      MatchResult m2{};
      if (m1.length <= static_cast<uint32_t>(max_lazy) && ip < max_ip) {
        uint64_t v = read8(data + ip);
        m2 = finder.lookup(data, n, last_match, ip, v, m1.length + 1);
        ip++;
        if (m2.length <= m1.length) m2 = {};
      }
      if (m2.empty()) {
        advance_insert(data, n, m1.end());
        if (!m0.empty() && m0.start + 4 <= m1.start) {
          m0.length = std::min<uint32_t>(m0.length, m1.start - m0.start);
          emit(data, m0);
          m0 = {};
        }
        emit(data, m1);
        m0 = {};
        m1 = {};
        continue;
      } else if (m2.start <= m1.start) {
        m1 = m2;
        continue;
      } else {
        if (m0.empty() || m1.start < m0.start ||
            (m1.start == m0.start && m1.length > m0.length)) {
          m0 = m1;
        }
        m1 = m2;
      }
      maybe_block(w, data, n);
    }
  }

  void finish(Writer& w, const uint8_t* data, size_t n) {
    ip = std::min(ip, n);
    if (!syms.empty() || last_match < n) {
      if (last_match < n) {
        syms.push_back({static_cast<uint32_t>(last_match),
                        static_cast<uint32_t>(n), 0, 0});
        last_match = n;
      }
      write_block(w, data, syms, true);
      syms.clear();
    }
  }
};

}  // namespace fdn_defl

extern "C" {

// One-shot deflate. Returns bytes written or -1 on insufficient output cap.
long long fdn_deflate(int level, const uint8_t* in, size_t n, uint8_t* out,
                      size_t cap, int zlib_mode) {
  using namespace fdn_defl;
  Writer w{out, cap};
  if (zlib_mode) {
    const uint8_t hdr[2] = {0x78, 0x01};
    w.bytes(hdr, 2);
  }

  if (n == 0) {
    w.bits(3, 10);  // empty fixed-huffman final block
    w.align_flush();
  } else if (level <= 0) {  // stored
    size_t pos = 0;
    do {
      size_t chunk = std::min<size_t>(n - pos, 65535);
      bool last = pos + chunk == n;
      w.bits(last ? 1 : 0, 3);
      w.align_flush();
      uint8_t lenb[4] = {
          static_cast<uint8_t>(chunk), static_cast<uint8_t>(chunk >> 8),
          static_cast<uint8_t>(~chunk), static_cast<uint8_t>(~chunk >> 8)};
      w.bytes(lenb, 4);
      w.bytes(in + pos, chunk);
      pos += chunk;
    } while (pos < n);
  } else {
    Parser parser = [&]() -> Parser {
      switch (level) {
        case 1:
          return Parser(Finder(8, 1, 8, false), 5, 0);
        case 2:
          return Parser(Finder(8, 16, 64, false), 6, 0);
        case 3:
          return Parser(Finder(6, 16, 32, false), 6, 0);
        case 4:
          return Parser(Finder(5, 16, 32, true), 9, 12);
        case 5:
          return Parser(Finder(5, 64, 64, true), 9, 16);
        case 6:
          return Parser(Finder(4, 128, 128, true), 9, 16);
        default:
          return Parser(Finder(4, 256, 258, true), 12, 256);
      }
    }();
    if (parser.max_lazy)
      parser.run_lazy(w, in, n);
    else
      parser.run_greedy(w, in, n);
    parser.finish(w, in, n);
  }

  w.align_flush();
  if (zlib_mode) {
    uint32_t ck = adler32d(in, n);
    uint8_t be[4] = {static_cast<uint8_t>(ck >> 24),
                     static_cast<uint8_t>(ck >> 16),
                     static_cast<uint8_t>(ck >> 8), static_cast<uint8_t>(ck)};
    w.bytes(be, 4);
  }
  if (w.overflow) return -1;
  return static_cast<long long>(w.pos);
}

}  // extern "C"
