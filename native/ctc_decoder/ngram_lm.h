// ARPA n-gram language model with Katz backoff (log10 domain).
// C++ replacement for the reference's KenLM dependency
// (reference: decoders/scorer.{h,cpp}, ctc_decoder_with_lm/beam_search.h).
#pragma once

#include <string>
#include <unordered_map>
#include <vector>

namespace os2s {

class NGramLM {
 public:
  bool Load(const std::string& arpa_path);

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
  // key: packed ids (little-endian int32 sequence as string bytes)
  static std::string Key(const std::vector<int>& ids);

  double Lookup(std::vector<int> ctx, int word) const;

  int order_ = 0;
  std::unordered_map<std::string, int> vocab_;
  std::vector<std::unordered_map<std::string, Entry>> tables_;
};

}  // namespace os2s
