// CTC prefix beam search with optional n-gram LM + vocabulary trie.
// C++ runtime replacing the reference's SWIG decoder package
// (decoders/ctc_beam_search_decoder.{h,cpp}, path_trie.{h,cpp}) and the
// in-graph KenLM op's word scoring (ctc_decoder_with_lm/beam_search.h).
//
// Prefixes live in a shared path tree (parent, char, time); word-LM
// contexts are interned so beams carry only small ints. Batch decoding
// fans utterances over std::thread workers.
#pragma once

#include <memory>
#include <string>
#include <unordered_map>
#include <vector>

#include "ngram_lm.h"

namespace os2s {

// character trie over the LM vocabulary (constrains in-progress words)
class CharTrie {
 public:
  CharTrie() { nodes_.push_back(Node{}); }
  void AddWord(const std::string& word);
  // advance from node via ch; -1 if not a valid prefix
  int Step(int node, char ch) const;
  bool IsWord(int node) const { return nodes_[node].is_word; }
  static constexpr int kRoot = 0;

 private:
  struct Node {
    std::unordered_map<char, int> next;
    bool is_word = false;
  };
  std::vector<Node> nodes_;
};

struct ScorerConfig {
  double alpha = 0.0;
  double beta = 0.0;
};

class Scorer {
 public:
  // ``path`` is a text ARPA or the mmap-able binary format
  // (scripts/build_lm.py --binarize), auto-detected.
  bool Load(const std::string& path, double alpha, double beta,
            bool build_trie = true);
  // natural-log word score: alpha * ln P(word|ctx) + beta.
  // ctx is a vector of LM word ids; returns the new context word id via
  // *word_id.
  double ScoreWord(const std::vector<int>& ctx, const std::string& word,
                   int* word_id) const;
  const CharTrie* trie() const { return has_trie_ ? &trie_ : nullptr; }
  int lm_order() const { return lm_.order(); }
  // Mandarin-style character LM: every LM vocab entry is one character
  // (one UTF-8 codepoint); scoring applies per emitted char, no space
  // segmentation and no trie (reference decoders/scorer.h:60-89).
  bool is_character_based() const { return char_based_; }
  // hard dictionary constraint (the reference's FSTMATCH mode,
  // decoders/ctc_beam_search_decoder.cpp:104-120 + scorer.h:77-89
  // fill_dictionary): beams may only complete words that exist in the
  // LM vocabulary trie; non-words are pruned at the closing space.
  void set_dictionary_mode(bool m) { dict_constrained_ = m; }
  bool dictionary_mode() const { return dict_constrained_ && has_trie_; }
  // binarize the loaded LM (mmap format; KenLM-binary analogue)
  bool SaveBinary(const std::string& path) const {
    return lm_.SaveBinary(path);
  }
  // raw log10 P(word | context) from the underlying n-gram model
  // (unknown words map to <unk>) — the verification probe behind
  // os2s_lm_logcond, used to check that a KenLM ".binary" scores
  // identically to its ARPA source.
  double LogCond(const std::vector<std::string>& context,
                 const std::string& word) const;

 private:
  NGramLM lm_;
  CharTrie trie_;
  bool has_trie_ = false;
  bool char_based_ = false;
  bool dict_constrained_ = false;
  double alpha_ = 0.0;
  double beta_ = 0.0;
};

struct BeamResult {
  double score;
  std::string text;
  std::vector<int> times;  // frame index per emitted character
};

struct DecodeOptions {
  int beam_size = 100;
  double cutoff_prob = 1.0;
  int cutoff_top_n = 40;
  int blank_id = -1;  // -1 => V-1
};

// probs: row-major (T, V) per-frame probability distributions.
// Returns up to ``nbest`` hypotheses, best-first (nbest <= beam_size).
std::vector<BeamResult> BeamSearch(const float* probs, int T, int V,
                                   const std::string& alphabet,
                                   const DecodeOptions& opts,
                                   const Scorer* scorer, int nbest = 1);

// batched, multithreaded over utterances.
std::vector<std::vector<BeamResult>> BeamSearchBatch(
    const float* probs, const int* seq_lens, int B, int Tmax, int V,
    const std::string& alphabet, const DecodeOptions& opts,
    const Scorer* scorer, int num_threads);

// Stateful streaming decoder (reference BeamDecoder): accumulates beam
// state across chunks; O(chunk) per call.
class StreamingDecoder {
 public:
  StreamingDecoder(const std::string& alphabet, const DecodeOptions& opts,
                   const Scorer* scorer);
  void Reset();
  // feed (T, V) chunk, returns current best transcript
  std::string Decode(const float* probs, int T, int V);
  BeamResult Best() const;
  // top-n final hypotheses, best-first (LM tail scores applied)
  std::vector<BeamResult> TopN(int n) const;

 private:
  struct Node {
    int parent;
    int ch;       // alphabet index
    int t;        // frame when first emitted
  };
  struct Beam {
    int node;
    double lp_b;
    double lp_nb;
    int ctx;         // interned LM context id
    int trie_node;   // current partial-word position in the char trie
    int word_start;  // node id where current word started (exclusive)
  };

  void Step(const float* frame, int V);
  std::string TextOf(int node) const;
  std::string PartialWord(const Beam& b) const;
  // extend *proto (a copy of the source beam) with character ch:
  // applies the trie constraint and, on a space, the LM word score.
  // Returns false when the extension is pruned. *add is the log prob of
  // the extension, *child the target path-tree node.
  bool Extend(Beam* proto, int ch, double* add, int child);

  std::string alphabet_;
  DecodeOptions opts_;
  const Scorer* scorer_;
  int frame_ = 0;

  std::vector<Node> nodes_;
  std::vector<Beam> beams_;
  std::vector<std::vector<int>> contexts_;  // interned LM contexts
  std::unordered_map<std::string, int> context_ids_;
  int InternContext(std::vector<int> ctx);
};

}  // namespace os2s
