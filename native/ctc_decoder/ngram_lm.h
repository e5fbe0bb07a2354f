// ARPA n-gram language model with Katz backoff (log10 domain).
// C++ replacement for the reference's KenLM dependency
// (reference: decoders/scorer.{h,cpp}, ctc_decoder_with_lm/beam_search.h).
//
// Three storage backends:
//  * text ARPA -> per-order hash tables (fast to query, slow to load);
//  * binary ".blm" -> per-order SORTED id-tuple arrays, memory-mapped
//    and binary-searched in place (generate_trie.cpp analogue:
//    binarize once, mmap afterwards);
//  * KenLM ".binary" (PROBING and the four TRIE model types) ->
//    memory-mapped in place and queried through KenLM's own layouts, so
//    an artifact built by KenLM's build_binary works directly, exactly
//    as the reference loads it via lm::ngram::LoadVirtual (reference
//    decoders/scorer.cpp:19-40). The reference's published LM recipe
//    builds `build_binary trie -q 8 -b 7 -a 256`
//    (reference scripts/build_lm.py:38) — i.e. QUANT_ARRAY_TRIE — so
//    the trie family is the format real reference users hold.
//    PROBING format (reverse-verified against a KenLM-produced
//    fixture, reference
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
//    TRIE formats (model_type 2 TRIE / 3 QUANT_TRIE / 4 ARRAY_TRIE /
//    5 QUANT_ARRAY_TRIE, search_version 1; layout reverse-verified
//    against the KenLM-produced fixture, reference
//    ctc_decoder_with_lm/ctc-test-lm.binary, a `-q 8 -b 7` order-2
//    QUANT_ARRAY_TRIE):
//      vocab: uint64 hash_count, then counts[0]+... slack — region is
//        8*(counts[0]+1) bytes; hash_count sorted MurmurHash64A(word,0)
//        values, one per word EXCEPT <unk> (always id 0); word id =
//        position in the sorted array + 1;
//      quant tables (QUANT_* only): {uint8 version=2, uint8 prob_bits,
//        uint8 backoff_bits} padded to 8, then per middle order
//        2^prob_bits prob floats + 2^backoff_bits backoff floats, then
//        2^prob_bits longest-prob floats (bin index -> float center;
//        backoff bins 0/1 are reserved -0.0/+0.0);
//      unigrams: (counts[0]+2) x {float prob, float backoff,
//        uint64 next}; entries with last word w live at level-2 indices
//        [uni[w].next, uni[w+1].next);
//      middles (orders 2..N-1): optional bhiksha section ({uint8
//        version=0, uint8 conf_bits} header; uint64 offsets table of
//        (counts[k] >> inline_bits)+1 entries at align8(base)+8; region
//        is 8*(1+entries)+7 bytes), then (counts[k-1]+1) bit-packed
//        records [word: RequiredBits(counts[0])][prob: 31 raw or
//        prob_bits quant][backoff: 32 raw or backoff_bits quant]
//        [next low bits: inline_bits], little-endian bit order,
//        +8 slack bytes; full next = (high << inline_bits) | low where
//        high = largest h with offsets[h] <= record index;
//      longest (order N): records [word][prob: 31 raw or quant];
//      vocab strings, NUL-separated, in word-id order.
//    The trie is REVERSED: an n-gram (w1..wn) is the path
//    unigram[wn] -> find w(n-1) at level 2 -> ... -> find w1 at level
//    n; sibling records are sorted by word index within each range.
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

  // mmap'd KenLM trie middle level (one per order 2..N-1).
  struct KenlmTrieMiddle {
    const uint8_t* records = nullptr;  // (count+1) bit-packed records
    uint64_t count = 0;
    uint8_t word_bits = 0;
    uint8_t prob_field_bits = 0;     // 31 raw or quant prob_bits
    uint8_t backoff_field_bits = 0;  // 32 raw or quant backoff_bits
    uint8_t inline_bits = 0;         // low bits of the next pointer
    uint8_t total_bits = 0;
    const float* prob_bins = nullptr;     // quantized only
    const float* backoff_bins = nullptr;  // quantized only
    const uint64_t* bhiksha = nullptr;    // ARRAY_* high-part offsets
    uint64_t bhiksha_count = 0;
  };

  bool LoadArpa(const std::string& path);
  bool LoadBinary(const std::string& path);
  bool LoadKenlm(const std::string& path);
  bool LoadKenlmTrie(int order, int model_type,
                     const std::vector<uint64_t>& counts);
  bool MapFile(const std::string& path);
  // returns true + fills *e when the id tuple exists at its order.
  bool Find(const std::vector<int>& ids, Entry* e) const;
  bool FindTrie(const std::vector<int>& ids, Entry* e) const;
  // full next pointer of trie middle record `idx` (bhiksha-aware).
  uint64_t TrieNext(const KenlmTrieMiddle& m, uint64_t idx) const;
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

  // KenLM trie backend state (inside the mapping)
  const uint8_t* trie_unigrams_ = nullptr;  // (counts[0]+2) UnigramValue
  uint64_t trie_n_words_ = 0;               // counts[0]
  std::vector<KenlmTrieMiddle> trie_middles_;
  const uint8_t* trie_longest_ = nullptr;   // bit-packed records
  uint8_t trie_longest_word_bits_ = 0;
  uint8_t trie_longest_prob_bits_ = 0;      // 31 raw or quant prob_bits
  const float* trie_longest_bins_ = nullptr;  // quantized only
};

}  // namespace os2s
