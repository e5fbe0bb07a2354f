// ARPA n-gram language model with Katz backoff (log10 domain).
// C++ replacement for the reference's KenLM dependency
// (reference: decoders/scorer.{h,cpp}, ctc_decoder_with_lm/beam_search.h).
//
// Three storage backends:
//  * text ARPA -> per-order hash tables (fast to query, slow to load);
//  * binary ".blm" -> per-order SORTED id-tuple arrays, memory-mapped
//    and binary-searched in place (generate_trie.cpp analogue:
//    binarize once, mmap afterwards);
//  * KenLM ".binary" (PROBING model type) -> memory-mapped in place and
//    queried through KenLM's own hashed layout, so an artifact built by
//    KenLM's build_binary works directly, exactly as the reference
//    loads it via lm::ngram::LoadVirtual (reference
//    decoders/scorer.cpp:19-40). Format (reverse-verified against a
//    KenLM-produced fixture, reference
//    open_seq2seq/test_utils/toy_speech_data/toy_data-lm.binary):
//      sanity block ("mmap lm ... version 5", 88 B) |
//      {uint8 order, float probing_multiplier, int32 model_type,
//       int32 has_vocabulary, uint32 search_version} |
//      uint64 counts[order], pad to 8 |
//      vocab: {uint32 version, uint32 bound} + linear-probing table of
//        (uint64 MurmurHash64A(word), uint32 id), ideal bucket =
//        hash % buckets, buckets = max(n+1, floor(1.5f * n));
//      unigrams: (counts[0]+1) x {float prob, float backoff} by id;
//      orders 2..N-1: probing tables of (uint64 key, float prob,
//        float backoff); order N: (uint64 key, float prob);
//      vocab strings, NUL-separated, in id order.
//    N-gram keys chain BACKWARDS from the last word:
//      h = id[n-1]; h = (h * A) ^ ((1 + id[i]) * B) for i = n-2..0.
//    Probs of non-longest orders carry a left-extension flag in the
//    sign bit -> true prob = -|stored|; backoffs are stored raw
//    (+-0.0 encodes KenLM's extension flag, numerically zero either
//    way).
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

  // mmap'd KenLM probing table for one n-gram order (orders >= 2).
  struct KenlmTable {
    const uint8_t* base = nullptr;
    uint64_t buckets = 0;
    bool has_backoff = false;  // middle orders carry a backoff float
    size_t stride() const { return has_backoff ? 16 : 12; }
  };

  bool LoadArpa(const std::string& path);
  bool LoadBinary(const std::string& path);
  bool LoadKenlm(const std::string& path);
  bool MapFile(const std::string& path);
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

  // KenLM probing backend state (inside the mapping)
  const uint8_t* kenlm_unigrams_ = nullptr;  // (counts[0]+1) ProbBackoff
  uint64_t kenlm_n_unigrams_ = 0;
  std::vector<KenlmTable> kenlm_tables_;     // orders 2..order_
};

}  // namespace os2s
