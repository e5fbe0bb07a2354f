// ARPA n-gram language model with Katz backoff (log10 domain).
// C++ replacement for the reference's KenLM dependency
// (reference: decoders/scorer.{h,cpp}, ctc_decoder_with_lm/beam_search.h).
//
// Two storage backends:
//  * text ARPA -> per-order hash tables (fast to query, slow to load);
//  * binary ".blm" -> per-order SORTED id-tuple arrays, memory-mapped
//    and binary-searched in place (the KenLM-binary analogue:
//    reference decoders/scorer.cpp:60-62 loads mmap'd KenLM binaries
//    via lm::ngram::LoadVirtual; generate_trie.cpp binarizes).
//    Load() auto-detects the format from the file magic.
#pragma once

#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace os2s {

class NGramLM {
 public:
  ~NGramLM();

  // auto-detects binary (magic) vs text ARPA.
  bool Load(const std::string& path);

  // serialize to the mmap-able binary format (load with Load()).
  bool SaveBinary(const std::string& path) const;

  // log10 P(word | context); context is most-recent-last.
  double LogCond(const std::vector<int>& context, int word) const;

  int WordId(const std::string& w) const {
    auto it = vocab_.find(w);
    if (it != vocab_.end()) return it->second;
    auto unk = vocab_.find("<unk>");
    return unk != vocab_.end() ? unk->second : -1;
  }
  // -1 when the word is unknown (no <unk> fallback) — used by the trie.
  int WordIdStrict(const std::string& w) const {
    auto it = vocab_.find(w);
    return it != vocab_.end() ? it->second : -1;
  }
  int order() const { return order_; }
  const std::unordered_map<std::string, int>& vocab() const {
    return vocab_;
  }

 private:
  struct Entry {
    float prob;
    float backoff;
  };
  // mmap'd sorted table for one n-gram order: records of
  // (k int32 ids, float prob, float backoff), ascending by id tuple.
  struct BinTable {
    const uint8_t* base = nullptr;
    int64_t count = 0;
    int k = 0;  // ids per record
    size_t record_bytes() const { return (size_t)(k + 2) * 4; }
  };
  // key: packed ids (little-endian int32 sequence as string bytes)
  static std::string Key(const std::vector<int>& ids);

  bool LoadArpa(const std::string& path);
  bool LoadBinary(const std::string& path);
  // returns true + fills *e when the id tuple exists at its order.
  bool Find(const std::vector<int>& ids, Entry* e) const;
  double Lookup(std::vector<int> ctx, int word) const;

  int order_ = 0;
  std::unordered_map<std::string, int> vocab_;
  std::vector<std::unordered_map<std::string, Entry>> tables_;

  // binary backend state (tables stay inside the mapping)
  std::vector<BinTable> bin_tables_;
  void* map_base_ = nullptr;
  size_t map_size_ = 0;
};

}  // namespace os2s
