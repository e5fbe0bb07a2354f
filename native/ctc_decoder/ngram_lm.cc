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
// KenLM ".binary" reader (format documented in ngram_lm.h). Only the
// PROBING model type (build_binary's default, model_type 0) is
// supported; trie variants must be converted through ARPA text.
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
  if (model_type != 0) {
    std::fprintf(stderr,
                 "NGramLM: KenLM model_type %d unsupported (only PROBING"
                 " binaries load directly; rebuild with `build_binary "
                 "probing` or convert via ARPA text)\n",
                 model_type);
    return false;
  }
  if (!has_vocab) {
    std::fprintf(stderr,
                 "NGramLM: KenLM binary lacks an embedded vocabulary "
                 "(build_binary was run with vocabulary stripping)\n");
    return false;
  }
  if (order < 1 || (size_t)(108 + 8 * order) > map_size_) return false;
  std::vector<uint64_t> counts(order);
  for (int k = 0; k < order; ++k) counts[k] = ReadU64(b + 108 + 8 * k);

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
  if (order_ == 0 || !bin_tables_.empty() || kenlm_unigrams_ != nullptr)
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
