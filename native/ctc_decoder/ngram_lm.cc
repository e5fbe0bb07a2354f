#include "ngram_lm.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <sstream>

namespace os2s {

namespace {
// 8-byte magic for the binary format ("OS2SLM" + version)
constexpr char kMagic[8] = {'O', 'S', '2', 'S', 'L', 'M', '0', '1'};

// KenLM binary files open with this sanity string (format version 5).
constexpr char kKenlmMagic[] =
    "mmap lm http://kheafield.com/code format version 5\n";

// KenLM's n-gram key chain (lm/model.cc detail::CombineWordHash):
// seeded with the LAST word id, then folds context words backwards.
constexpr uint64_t kCombineA = 8978948897894561157ULL;
constexpr uint64_t kCombineB = 17894857484156487943ULL;

inline uint64_t KenlmCombine(uint64_t current, uint64_t next_id) {
  return (current * kCombineA) ^ ((1 + next_id) * kCombineB);
}

inline uint64_t KenlmKey(const int* ids, int n) {
  uint64_t h = (uint64_t)(uint32_t)ids[n - 1];
  for (int i = n - 2; i >= 0; --i) h = KenlmCombine(h, (uint32_t)ids[i]);
  return h;
}

// buckets for a KenLM probing table of `entries` records
// (util/probing_hash_table.hh Size(), float multiplier arithmetic).
inline uint64_t KenlmBuckets(uint64_t entries, float multiplier) {
  uint64_t scaled = (uint64_t)(multiplier * (float)entries);
  return entries + 1 > scaled ? entries + 1 : scaled;
}

inline uint64_t ReadU64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

// --- KenLM trie helpers -----------------------------------------------

// util/bit_packing.hh semantics: a field of `bits` bits starts at
// absolute bit offset `bit_off`, little-endian within the byte stream
// (first field of a record sits in the LOW bits). Every bit-packed
// section carries 8 slack bytes so this unconditional 8-byte read
// never runs past the mapping.
inline uint64_t ReadBits(const uint8_t* base, uint64_t bit_off,
                         uint8_t bits) {
  uint64_t chunk;
  std::memcpy(&chunk, base + (bit_off >> 3), 8);
  chunk >>= (bit_off & 7);
  return bits >= 64 ? chunk : (chunk & ((1ULL << bits) - 1ULL));
}

// probs are <= 0 so KenLM drops the sign bit and stores 31 bits
// (util/bit_packing.hh WriteNonPositiveFloat31).
inline float ReadProb31(const uint8_t* base, uint64_t bit_off) {
  uint32_t u = (uint32_t)ReadBits(base, bit_off, 31) | 0x80000000u;
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

inline float ReadPackedFloat32(const uint8_t* base, uint64_t bit_off) {
  uint32_t u = (uint32_t)ReadBits(base, bit_off, 32);
  float f;
  std::memcpy(&f, &u, 4);
  return f;
}

// util::RequiredBits: bits needed to store values in [0, max_value].
inline uint8_t RequiredBits(uint64_t max_value) {
  if (!max_value) return 0;
  uint8_t ret = 1;
  while (max_value >>= 1) ++ret;
  return ret;
}

// lm/bhiksha.hh ChopBits: how many high bits of the next pointer move
// into the offsets array. Minimises total size: the array costs 64
// bits per high value, chopping saves `chop` bits in each of the
// max_offset inline fields.
inline uint8_t KenlmChopBits(uint64_t max_offset, uint64_t max_next,
                             uint8_t conf_bits) {
  uint8_t required = RequiredBits(max_next);
  uint8_t best_chop = 0;
  int64_t lowest_change = INT64_MAX;
  uint8_t bound = required < conf_bits ? required : conf_bits;
  for (uint8_t chop = 0; chop <= bound; ++chop) {
    int64_t change = (int64_t)(max_next >> (required - chop)) * 64 -
                     (int64_t)max_offset * (int64_t)chop;
    if (change < lowest_change) {
      lowest_change = change;
      best_chop = chop;
    }
  }
  return best_chop;
}

// util::MurmurHash64A with seed 0 — KenLM's vocab hash
// (lm/vocab.cc detail::HashForVocab).
inline uint64_t MurmurHash64A(const void* key, size_t len) {
  const uint64_t m = 0xc6a4a7935bd1e995ULL;
  const int r = 47;
  uint64_t h = 0 ^ (len * m);
  const uint8_t* data = (const uint8_t*)key;
  const uint8_t* end8 = data + (len / 8) * 8;
  while (data != end8) {
    uint64_t k;
    std::memcpy(&k, data, 8);
    data += 8;
    k *= m;
    k ^= k >> r;
    k *= m;
    h ^= k;
    h *= m;
  }
  uint64_t tail = 0;
  size_t rem = len & 7;
  if (rem) {
    std::memcpy(&tail, data, rem);
    h ^= tail;
    h *= m;
  }
  h ^= h >> r;
  h *= m;
  h ^= h >> r;
  return h;
}
}  // namespace

NGramLM::~NGramLM() {
  if (map_base_ != nullptr) munmap(map_base_, map_size_);
}

std::string NGramLM::Key(const std::vector<int>& ids) {
  std::string out(ids.size() * sizeof(int), '\0');
  std::memcpy(&out[0], ids.data(), ids.size() * sizeof(int));
  return out;
}

bool NGramLM::Load(const std::string& path) {
  std::ifstream probe(path, std::ios::binary);
  if (!probe.is_open()) return false;
  char head[64] = {0};
  probe.read(head, 64);
  probe.close();
  if (std::memcmp(head, kMagic, 8) == 0) return LoadBinary(path);
  if (std::memcmp(head, kKenlmMagic, sizeof(kKenlmMagic) - 1) == 0)
    return LoadKenlm(path);
  return LoadArpa(path);
}

bool NGramLM::MapFile(const std::string& path) {
  int fd = open(path.c_str(), O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 24) {
    close(fd);
    return false;
  }
  map_size_ = (size_t)st.st_size;
  map_base_ = mmap(nullptr, map_size_, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);  // mapping survives the close
  if (map_base_ == MAP_FAILED) {
    map_base_ = nullptr;
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// KenLM ".binary" reader (format documented in ngram_lm.h). PROBING
// (model_type 0) and the trie family (2 TRIE / 3 QUANT_TRIE /
// 4 ARRAY_TRIE / 5 QUANT_ARRAY_TRIE) load directly; REST_PROBING (1)
// must be converted through ARPA text.
// ---------------------------------------------------------------------------
bool NGramLM::LoadKenlm(const std::string& path) {
  if (!MapFile(path)) return false;
  const uint8_t* b = (const uint8_t*)map_base_;
  const uint8_t* end = b + map_size_;
  if (map_size_ < 136) return false;

  int order = b[88];
  float multiplier;
  int32_t model_type, has_vocab;
  std::memcpy(&multiplier, b + 92, 4);
  std::memcpy(&model_type, b + 96, 4);
  std::memcpy(&has_vocab, b + 100, 4);
  if (!has_vocab) {
    std::fprintf(stderr,
                 "NGramLM: KenLM binary lacks an embedded vocabulary "
                 "(build_binary was run with vocabulary stripping)\n");
    return false;
  }
  if (order < 1 || (size_t)(108 + 8 * order) > map_size_) return false;
  std::vector<uint64_t> counts(order);
  for (int k = 0; k < order; ++k) counts[k] = ReadU64(b + 108 + 8 * k);
  if (model_type >= 2 && model_type <= 5)
    return LoadKenlmTrie(order, model_type, counts);
  if (model_type != 0) {
    std::fprintf(stderr,
                 "NGramLM: KenLM model_type %d unsupported (PROBING and "
                 "the trie family load directly; convert REST_PROBING "
                 "via ARPA text)\n",
                 model_type);
    return false;
  }

  size_t off = (size_t)(108 + 8 * order);
  off = (off + 7) & ~(size_t)7;  // header padding
  off += 8;                      // ProbingVocabularyHeader {version, bound}
  off += KenlmBuckets(counts[0], multiplier) * 12;  // vocab hash table
  if (off + (counts[0] + 1) * 8 > map_size_) return false;
  kenlm_unigrams_ = b + off;
  kenlm_n_unigrams_ = counts[0];
  off += (counts[0] + 1) * 8;
  kenlm_tables_.resize(order >= 2 ? order - 1 : 0);
  for (int k = 2; k <= order; ++k) {
    KenlmTable& t = kenlm_tables_[k - 2];
    t.has_backoff = k < order;
    t.buckets = KenlmBuckets(counts[k - 1], multiplier);
    t.base = b + off;
    off += t.buckets * t.stride();
    if (off > map_size_) return false;
  }
  // vocab strings, NUL-separated in id order, run to end of file
  const char* w = (const char*)(b + off);
  vocab_.reserve(counts[0]);
  for (uint64_t i = 0; i < counts[0]; ++i) {
    size_t len = strnlen(w, (size_t)((const char*)end - w));
    vocab_.emplace(std::string(w, len), (int)i);
    w += len + 1;
    if (w > (const char*)end) return false;
  }
  order_ = order;
  return true;
}

// ---------------------------------------------------------------------------
// KenLM trie-family reader (layout documented in ngram_lm.h; the
// reference's published LMs are `build_binary trie -q 8 -b 7 -a 256`,
// reference scripts/build_lm.py:38). Structural invariants — every
// level's terminal next pointer must equal the next level's count and
// the vocab strings must exactly fill the file — are validated at
// load so a layout mismatch fails loudly instead of mis-scoring.
// ---------------------------------------------------------------------------
bool NGramLM::LoadKenlmTrie(int order, int model_type,
                            const std::vector<uint64_t>& counts) {
  const uint8_t* b = (const uint8_t*)map_base_;
  const bool quantized = model_type == 3 || model_type == 5;
  const bool arrayed = model_type == 4 || model_type == 5;
  const int search_version = b[104];
  if (search_version != 1) {
    std::fprintf(stderr,
                 "NGramLM: KenLM trie search_version %d unsupported "
                 "(expected 1)\n",
                 search_version);
    return false;
  }
  if (order < 2) return false;  // KenLM tries are order >= 2
  size_t off = ((size_t)(108 + 8 * order) + 7) & ~(size_t)7;

  // SortedVocabulary: uint64 hash count, sorted MurmurHash64A values
  // (one per word except <unk>); region is 8*(counts[0]+1) bytes.
  if (off + 8 * (counts[0] + 1) > map_size_) return false;
  const uint64_t n_hashes = ReadU64(b + off);
  const uint64_t* hashes = (const uint64_t*)(b + off + 8);
  if (n_hashes >= counts[0] + 1) return false;
  off += 8 * (counts[0] + 1);

  // quantization tables
  uint8_t prob_bits = 0, backoff_bits = 0;
  const float* quant_tables = nullptr;
  if (quantized) {
    if (off + 8 > map_size_) return false;
    if (b[off] != 2) {
      std::fprintf(stderr,
                   "NGramLM: KenLM quantization version %d unsupported "
                   "(expected 2)\n",
                   (int)b[off]);
      return false;
    }
    prob_bits = b[off + 1];
    backoff_bits = b[off + 2];
    if (prob_bits == 0 || prob_bits > 25 || backoff_bits > 25)
      return false;
    quant_tables = (const float*)(b + off + 8);
    size_t n_floats =
        (size_t)(order - 2) *
            (((size_t)1 << prob_bits) + ((size_t)1 << backoff_bits)) +
        ((size_t)1 << prob_bits);
    off += 8 + 4 * n_floats;
    if (off > map_size_) return false;
  }

  // unigram array: (counts[0]+2) x {float prob, float backoff, u64 next}
  trie_unigrams_ = b + off;
  trie_n_words_ = counts[0];
  off += (counts[0] + 2) * 16;
  if (off > map_size_) return false;
  if (order >= 2 &&
      ReadU64(trie_unigrams_ + 16 * counts[0] + 8) != counts[1]) {
    std::fprintf(stderr,
                 "NGramLM: KenLM trie unigram terminal pointer mismatch "
                 "(corrupt file or layout drift)\n");
    return false;
  }

  // middle levels (orders 2..N-1)
  const uint8_t word_bits = RequiredBits(counts[0]);
  const float* qt = quant_tables;
  trie_middles_.assign(order >= 3 ? order - 2 : 0, KenlmTrieMiddle());
  for (int d = 2; d < order; ++d) {
    KenlmTrieMiddle& m = trie_middles_[d - 2];
    m.count = counts[d - 1];
    m.word_bits = word_bits;
    if (quantized) {
      m.prob_field_bits = prob_bits;
      m.backoff_field_bits = backoff_bits;
      m.prob_bins = qt;
      qt += (size_t)1 << prob_bits;
      m.backoff_bins = qt;
      qt += (size_t)1 << backoff_bits;
    } else {
      m.prob_field_bits = 31;
      m.backoff_field_bits = 32;
    }
    const uint64_t max_next = counts[d];
    const uint8_t required = RequiredBits(max_next);
    if (arrayed) {
      // bhiksha section: {u8 version, u8 conf_bits} at base; u64
      // offsets table at align8(base)+8; region 8*(1+table)+7 bytes.
      if (off + 8 > map_size_) return false;
      if (b[off] != 0) {
        std::fprintf(stderr,
                     "NGramLM: KenLM bhiksha version %d unsupported "
                     "(expected 0)\n",
                     (int)b[off]);
        return false;
      }
      const uint8_t conf_bits = b[off + 1];
      const uint8_t chopped =
          KenlmChopBits(m.count + 1, max_next, conf_bits);
      m.inline_bits = required - chopped;
      m.bhiksha_count = (max_next >> m.inline_bits) + 1;
      size_t table_at = ((off + 7) & ~(size_t)7) + 8;
      m.bhiksha = (const uint64_t*)(b + table_at);
      off += 8 * (1 + m.bhiksha_count) + 7;
      if (table_at + 8 * m.bhiksha_count > map_size_ || off > map_size_)
        return false;
    } else {
      m.inline_bits = required;
    }
    m.total_bits = m.word_bits + m.prob_field_bits +
                   m.backoff_field_bits + m.inline_bits;
    m.records = b + off;
    off += ((1 + m.count) * m.total_bits + 7) / 8 + 8;
    if (off > map_size_) return false;
    if (TrieNext(m, m.count) != max_next) {
      std::fprintf(stderr,
                   "NGramLM: KenLM trie order-%d terminal pointer "
                   "mismatch (corrupt file or layout drift)\n",
                   d);
      return false;
    }
  }

  // longest level (order N)
  if (order >= 2) {
    trie_longest_ = b + off;
    trie_longest_word_bits_ = word_bits;
    if (quantized) {
      trie_longest_prob_bits_ = prob_bits;
      trie_longest_bins_ = qt;
    } else {
      trie_longest_prob_bits_ = 31;
    }
    uint8_t total = word_bits + trie_longest_prob_bits_;
    off += ((1 + counts[order - 1]) * total + 7) / 8 + 8;
    if (off > map_size_) return false;
  }

  // vocab strings in word-id order; ids recovered through the sorted
  // hash array so the mapping holds even if string order ever drifts.
  const char* w = (const char*)(b + off);
  const char* send = (const char*)(b + map_size_);
  vocab_.reserve(counts[0]);
  for (uint64_t i = 0; i < counts[0]; ++i) {
    size_t len = strnlen(w, (size_t)(send - w));
    if (w + len >= send && i + 1 < counts[0]) return false;
    uint64_t h = MurmurHash64A(w, len);
    const uint64_t* pos =
        std::lower_bound(hashes, hashes + n_hashes, h);
    int id;
    if (pos != hashes + n_hashes && *pos == h) {
      id = (int)(pos - hashes) + 1;
    } else {
      // only <unk>/<UNK> hash outside the array (KenLM pins them to 0)
      id = 0;
    }
    vocab_.emplace(std::string(w, len), id);
    w += len + 1;
  }
  if ((size_t)(send - w) >= 8) {
    std::fprintf(stderr,
                 "NGramLM: KenLM trie has %zu unexplained trailing "
                 "bytes (layout drift)\n",
                 (size_t)(send - w));
    return false;
  }
  order_ = order;
  return true;
}

uint64_t NGramLM::TrieNext(const KenlmTrieMiddle& m, uint64_t idx) const {
  uint64_t low = ReadBits(m.records,
                          idx * m.total_bits + m.word_bits +
                              m.prob_field_bits + m.backoff_field_bits,
                          m.inline_bits);
  if (m.bhiksha == nullptr) return low;
  // offsets[h] = first record index whose high part >= h (offsets[0]=0);
  // high(idx) = largest h with offsets[h] <= idx.
  const uint64_t* p =
      std::upper_bound(m.bhiksha, m.bhiksha + m.bhiksha_count, idx);
  uint64_t high = (uint64_t)(p - m.bhiksha) - 1;
  return (high << m.inline_bits) | low;
}

bool NGramLM::FindTrie(const std::vector<int>& ids, Entry* e) const {
  const int k = (int)ids.size();
  for (int id : ids)
    if (id < 0 || (uint64_t)id >= trie_n_words_) return false;
  const uint8_t* uni = trie_unigrams_ + 16 * (size_t)ids[k - 1];
  if (k == 1) {
    std::memcpy(&e->prob, uni, 4);
    std::memcpy(&e->backoff, uni + 4, 4);
    return true;
  }
  uint64_t begin = ReadU64(uni + 8);
  uint64_t end = ReadU64(uni + 24);
  for (int d = 2; d <= k; ++d) {
    const uint64_t word = (uint64_t)ids[k - d];
    if (d == order_) {
      // longest level: [word][prob] records, no next pointers
      const uint8_t total = trie_longest_word_bits_ +
                            trie_longest_prob_bits_;
      uint64_t lo = begin, hi = end;
      while (lo < hi) {
        uint64_t mid = lo + (hi - lo) / 2;
        uint64_t wm = ReadBits(trie_longest_, mid * total,
                               trie_longest_word_bits_);
        if (wm < word) {
          lo = mid + 1;
        } else if (wm > word) {
          hi = mid;
        } else {
          uint64_t at = mid * total + trie_longest_word_bits_;
          e->prob = trie_longest_bins_ != nullptr
                        ? trie_longest_bins_[ReadBits(
                              trie_longest_, at, trie_longest_prob_bits_)]
                        : ReadProb31(trie_longest_, at);
          e->backoff = 0.0f;
          return true;
        }
      }
      return false;
    }
    const KenlmTrieMiddle& m = trie_middles_[d - 2];
    uint64_t lo = begin, hi = end, found = ~0ULL;
    while (lo < hi) {
      uint64_t mid = lo + (hi - lo) / 2;
      uint64_t wm = ReadBits(m.records, mid * m.total_bits, m.word_bits);
      if (wm < word) {
        lo = mid + 1;
      } else if (wm > word) {
        hi = mid;
      } else {
        found = mid;
        break;
      }
    }
    if (found == ~0ULL) return false;
    if (d == k) {
      uint64_t at = found * m.total_bits + m.word_bits;
      if (m.prob_bins != nullptr) {
        e->prob = m.prob_bins[ReadBits(m.records, at, m.prob_field_bits)];
        e->backoff = m.backoff_bins[ReadBits(m.records,
                                             at + m.prob_field_bits,
                                             m.backoff_field_bits)];
      } else {
        e->prob = ReadProb31(m.records, at);
        e->backoff = ReadPackedFloat32(m.records, at + 31);
      }
      return true;
    }
    begin = TrieNext(m, found);
    end = TrieNext(m, found + 1);
  }
  return false;
}

bool NGramLM::LoadArpa(const std::string& arpa_path) {
  std::ifstream f(arpa_path);
  if (!f.is_open()) return false;
  std::string line;
  int section = 0;
  while (std::getline(f, line)) {
    // trim
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    if (line.empty()) continue;
    if (line == "\\end\\") break;
    if (line[0] == '\\') {
      auto pos = line.find("-grams:");
      if (pos != std::string::npos) {
        section = std::stoi(line.substr(1, pos - 1));
        if ((int)tables_.size() < section) tables_.resize(section);
        if (section > order_) order_ = section;
      }
      continue;
    }
    if (section == 0) continue;  // \data\ header lines
    std::istringstream ss(line);
    double prob;
    if (!(ss >> prob)) continue;
    std::vector<int> ids;
    ids.reserve(section);
    std::string w;
    for (int i = 0; i < section; ++i) {
      if (!(ss >> w)) break;
      auto it = vocab_.find(w);
      int id;
      if (it == vocab_.end()) {
        id = (int)vocab_.size();
        vocab_.emplace(w, id);
      } else {
        id = it->second;
      }
      ids.push_back(id);
    }
    if ((int)ids.size() != section) continue;
    double backoff = 0.0;
    ss >> backoff;  // optional
    tables_[section - 1][Key(ids)] = {(float)prob, (float)backoff};
  }
  return order_ > 0;
}

// ---------------------------------------------------------------------------
// binary format
//
//   magic[8] | int32 order | int32 vocab_count | int64 vocab_blob_size
//   vocab blob: vocab_count null-terminated strings, in word-id order
//   pad to 8-byte alignment
//   per order k=1..order:
//     int64 count
//     count records of (k * int32 ids, float prob, float backoff),
//     sorted ascending by id tuple
// ---------------------------------------------------------------------------
bool NGramLM::SaveBinary(const std::string& path) const {
  if (order_ == 0 || !bin_tables_.empty() || kenlm_unigrams_ != nullptr ||
      trie_unigrams_ != nullptr)
    return false;  // hash (ARPA-loaded) mode only
  std::ofstream out(path, std::ios::binary | std::ios::trunc);
  if (!out.is_open()) return false;
  out.write(kMagic, 8);
  int32_t order32 = order_;
  int32_t nv = (int32_t)vocab_.size();
  out.write((const char*)&order32, 4);
  out.write((const char*)&nv, 4);
  // vocab blob in id order
  std::vector<const std::string*> by_id(vocab_.size());
  for (const auto& kv : vocab_) by_id[kv.second] = &kv.first;
  std::string blob;
  for (const std::string* w : by_id) {
    blob.append(*w);
    blob.push_back('\0');
  }
  int64_t blob_size = (int64_t)blob.size();
  out.write((const char*)&blob_size, 8);
  out.write(blob.data(), blob.size());
  size_t written = 8 + 4 + 4 + 8 + blob.size();
  while (written % 8 != 0) {
    out.put('\0');
    ++written;
  }
  for (int k = 1; k <= order_; ++k) {
    const auto& table = tables_[k - 1];
    std::vector<const std::string*> keys;
    keys.reserve(table.size());
    for (const auto& kv : table) keys.push_back(&kv.first);
    // packed little-endian int32 keys sort correctly via memcmp only
    // per-int — sort on the decoded tuples instead
    std::sort(keys.begin(), keys.end(),
              [](const std::string* a, const std::string* b) {
                const int* ia = (const int*)a->data();
                const int* ib = (const int*)b->data();
                size_t n = a->size() / 4;
                for (size_t i = 0; i < n; ++i) {
                  if (ia[i] != ib[i]) return ia[i] < ib[i];
                }
                return false;
              });
    int64_t count = (int64_t)keys.size();
    out.write((const char*)&count, 8);
    for (const std::string* key : keys) {
      const Entry& e = table.at(*key);
      out.write(key->data(), key->size());
      out.write((const char*)&e.prob, 4);
      out.write((const char*)&e.backoff, 4);
    }
  }
  return out.good();
}

bool NGramLM::LoadBinary(const std::string& path) {
  if (!MapFile(path)) return false;
  const uint8_t* p = (const uint8_t*)map_base_;
  const uint8_t* end = p + map_size_;
  p += 8;  // magic (verified by Load)
  int32_t order32, nv;
  std::memcpy(&order32, p, 4);
  std::memcpy(&nv, p + 4, 4);
  p += 8;
  int64_t blob_size;
  std::memcpy(&blob_size, p, 8);
  p += 8;
  if (p + blob_size > end) return false;
  // vocab hash rebuilt from the blob (small next to the tables)
  const char* w = (const char*)p;
  vocab_.reserve(nv);
  for (int32_t i = 0; i < nv; ++i) {
    size_t len = strnlen(w, (size_t)(end - (const uint8_t*)w));
    vocab_.emplace(std::string(w, len), i);
    w += len + 1;
  }
  p += blob_size;
  size_t off = (size_t)(p - (const uint8_t*)map_base_);
  p += (8 - off % 8) % 8;
  order_ = order32;
  bin_tables_.resize(order_);
  for (int k = 1; k <= order_; ++k) {
    if (p + 8 > end) return false;
    int64_t count;
    std::memcpy(&count, p, 8);
    p += 8;
    BinTable& t = bin_tables_[k - 1];
    t.base = p;
    t.count = count;
    t.k = k;
    p += (size_t)count * t.record_bytes();
    if (p > end) return false;
  }
  return order_ > 0;
}

bool NGramLM::Find(const std::vector<int>& ids, Entry* e) const {
  int k = (int)ids.size();
  if (k < 1 || k > order_) return false;
  if (trie_unigrams_ != nullptr) return FindTrie(ids, e);
  if (kenlm_unigrams_ != nullptr) {
    for (int id : ids)
      if (id < 0 || (uint64_t)id >= kenlm_n_unigrams_) return false;
    if (k == 1) {
      std::memcpy(e, kenlm_unigrams_ + (size_t)ids[0] * 8, 8);
      // non-longest probs carry KenLM's left-extension flag in the
      // sign bit; true log10 probs are always <= 0
      if (order_ > 1) e->prob = -std::fabs(e->prob);
      return true;
    }
    const KenlmTable& t = kenlm_tables_[k - 2];
    if (t.buckets == 0) return false;
    uint64_t key = KenlmKey(ids.data(), k);
    uint64_t i = key % t.buckets;
    for (uint64_t probes = 0; probes < t.buckets; ++probes) {
      const uint8_t* rec = t.base + (size_t)i * t.stride();
      uint64_t stored = ReadU64(rec);
      if (stored == key) {
        float prob, backoff = 0.0f;
        std::memcpy(&prob, rec + 8, 4);
        if (t.has_backoff) std::memcpy(&backoff, rec + 12, 4);
        e->prob = (k == order_) ? prob : -std::fabs(prob);
        e->backoff = backoff;
        return true;
      }
      if (stored == 0) return false;  // empty bucket ends the probe run
      if (++i == t.buckets) i = 0;
    }
    return false;
  }
  if (!bin_tables_.empty()) {
    const BinTable& t = bin_tables_[k - 1];
    size_t rec = t.record_bytes();
    int64_t lo = 0, hi = t.count;
    while (lo < hi) {
      int64_t mid = lo + (hi - lo) / 2;
      const int* rid = (const int*)(t.base + (size_t)mid * rec);
      int cmp = 0;
      for (int i = 0; i < k; ++i) {
        if (rid[i] != ids[i]) {
          cmp = rid[i] < ids[i] ? -1 : 1;
          break;
        }
      }
      if (cmp == 0) {
        std::memcpy(e, t.base + (size_t)mid * rec + (size_t)k * 4, 8);
        return true;
      }
      if (cmp < 0)
        lo = mid + 1;
      else
        hi = mid;
    }
    return false;
  }
  const auto& table = tables_[k - 1];
  auto it = table.find(Key(ids));
  if (it == table.end()) return false;
  *e = it->second;
  return true;
}

double NGramLM::Lookup(std::vector<int> ctx, int word) const {
  // direct hit on (ctx, word)?
  std::vector<int> full = ctx;
  full.push_back(word);
  Entry e;
  if ((int)full.size() <= order_ && Find(full, &e)) return e.prob;
  if (ctx.empty()) {
    if (Find({word}, &e)) return e.prob;
    auto unk = vocab_.find("<unk>");
    if (unk != vocab_.end() && Find({unk->second}, &e)) return e.prob;
    return -99.0;
  }
  // back off: weight of ctx + recurse on shorter context
  double bo = 0.0;
  if ((int)ctx.size() <= order_ && Find(ctx, &e)) bo = e.backoff;
  ctx.erase(ctx.begin());
  return bo + Lookup(std::move(ctx), word);
}

double NGramLM::LogCond(const std::vector<int>& context, int word) const {
  if (order_ == 0) return -99.0;
  std::vector<int> ctx = context;
  int max_ctx = order_ - 1;
  if ((int)ctx.size() > max_ctx)
    ctx.erase(ctx.begin(), ctx.end() - max_ctx);
  return Lookup(std::move(ctx), word);
}

}  // namespace os2s
