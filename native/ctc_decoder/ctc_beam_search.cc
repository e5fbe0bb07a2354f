#include "ctc_beam_search.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <atomic>
#include <thread>

namespace os2s {

namespace {
constexpr double kLog0 = -1e30;
const double kLn10 = std::log(10.0);

inline double LogSumExp(double a, double b) {
  if (a <= kLog0) return b;
  if (b <= kLog0) return a;
  double mx = a > b ? a : b;
  return mx + std::log1p(std::exp((a > b ? b : a) - mx));
}

inline double Total(double lp_b, double lp_nb) {
  return LogSumExp(lp_b, lp_nb);
}
}  // namespace

// ---------------------------------------------------------------------------
// CharTrie
// ---------------------------------------------------------------------------
void CharTrie::AddWord(const std::string& word) {
  int node = kRoot;
  for (char ch : word) {
    auto it = nodes_[node].next.find(ch);
    if (it == nodes_[node].next.end()) {
      int id = (int)nodes_.size();
      nodes_[node].next.emplace(ch, id);
      nodes_.push_back(Node{});
      node = id;
    } else {
      node = it->second;
    }
  }
  nodes_[node].is_word = true;
}

int CharTrie::Step(int node, char ch) const {
  auto it = nodes_[node].next.find(ch);
  return it == nodes_[node].next.end() ? -1 : it->second;
}

// ---------------------------------------------------------------------------
// Scorer
// ---------------------------------------------------------------------------
namespace {
// UTF-8 codepoint count (for character-LM detection)
inline size_t CodepointCount(const std::string& s) {
  size_t n = 0;
  for (unsigned char c : s)
    if ((c & 0xC0) != 0x80) ++n;
  return n;
}
}  // namespace

bool Scorer::Load(const std::string& path, double alpha, double beta,
                  bool build_trie) {
  alpha_ = alpha;
  beta_ = beta;
  if (!lm_.Load(path)) return false;
  // character-based LM detection (reference scorer.cpp: every vocab
  // entry is a single character)
  bool any = false;
  char_based_ = true;
  for (const auto& kv : lm_.vocab()) {
    const std::string& w = kv.first;
    if (w == "<s>" || w == "</s>" || w == "<unk>") continue;
    any = true;
    if (CodepointCount(w) != 1) {
      char_based_ = false;
      break;
    }
  }
  if (!any) char_based_ = false;
  if (build_trie && !char_based_) {
    for (const auto& kv : lm_.vocab()) {
      const std::string& w = kv.first;
      if (w == "<s>" || w == "</s>" || w == "<unk>") continue;
      trie_.AddWord(w);
    }
    has_trie_ = true;
  }
  return true;
}

double Scorer::ScoreWord(const std::vector<int>& ctx,
                         const std::string& word, int* word_id) const {
  int id = lm_.WordId(word);
  *word_id = id;
  double lp10 = lm_.LogCond(ctx, id);
  return alpha_ * lp10 * kLn10 + beta_;
}

double Scorer::LogCond(const std::vector<std::string>& context,
                       const std::string& word) const {
  std::vector<int> ctx;
  ctx.reserve(context.size());
  for (const std::string& w : context) ctx.push_back(lm_.WordId(w));
  return lm_.LogCond(ctx, lm_.WordId(word));
}

// ---------------------------------------------------------------------------
// StreamingDecoder
// ---------------------------------------------------------------------------
StreamingDecoder::StreamingDecoder(const std::string& alphabet,
                                   const DecodeOptions& opts,
                                   const Scorer* scorer)
    : alphabet_(alphabet), opts_(opts), scorer_(scorer) {
  Reset();
}

void StreamingDecoder::Reset() {
  frame_ = 0;
  nodes_.clear();
  nodes_.push_back(Node{-1, -1, -1});  // root = empty prefix
  beams_.clear();
  contexts_.clear();
  context_ids_.clear();
  int root_ctx = InternContext({});
  beams_.push_back(Beam{0, 0.0, kLog0, root_ctx, CharTrie::kRoot, 0});
}

int StreamingDecoder::InternContext(std::vector<int> ctx) {
  std::string key((const char*)ctx.data(), ctx.size() * sizeof(int));
  auto it = context_ids_.find(key);
  if (it != context_ids_.end()) return it->second;
  int id = (int)contexts_.size();
  contexts_.push_back(std::move(ctx));
  context_ids_.emplace(std::move(key), id);
  return id;
}

std::string StreamingDecoder::TextOf(int node) const {
  std::string rev;
  while (node > 0) {
    rev.push_back(alphabet_[nodes_[node].ch]);
    node = nodes_[node].parent;
  }
  std::reverse(rev.begin(), rev.end());
  return rev;
}

std::string StreamingDecoder::PartialWord(const Beam& b) const {
  std::string rev;
  int node = b.node;
  while (node > 0 && node != b.word_start) {
    char c = alphabet_[nodes_[node].ch];
    if (c == ' ') break;
    rev.push_back(c);
    node = nodes_[node].parent;
  }
  std::reverse(rev.begin(), rev.end());
  return rev;
}

void StreamingDecoder::Step(const float* frame, int V) {
  int blank = opts_.blank_id >= 0 ? opts_.blank_id : V - 1;

  // ---- prune frame: top-n chars within cumulative cutoff_prob
  std::vector<std::pair<int, double>> pruned;
  {
    std::vector<int> order(V);
    for (int i = 0; i < V; ++i) order[i] = i;
    std::partial_sort(order.begin(),
                      order.begin() + std::min(V, opts_.cutoff_top_n),
                      order.end(), [&](int a, int b) {
                        return frame[a] > frame[b];
                      });
    double cum = 0.0;
    for (int i = 0; i < std::min(V, opts_.cutoff_top_n); ++i) {
      double p = frame[order[i]];
      if (p <= 1e-12 && !pruned.empty()) break;
      pruned.emplace_back(order[i],
                          std::log(std::max(p, 1e-12)));
      cum += p;
      if (cum >= opts_.cutoff_prob) break;
    }
  }

  // path-tree child lookup (parent, ch) -> node id, rebuilt per step
  // from the node table (nodes count stays O(beams * steps-survived))
  std::unordered_map<long long, int> child_of;
  child_of.reserve(nodes_.size());
  for (int i = 1; i < (int)nodes_.size(); ++i) {
    child_of[((long long)nodes_[i].parent << 20) | nodes_[i].ch] = i;
  }
  auto get_child = [&](int parent, int ch) {
    long long key = ((long long)parent << 20) | ch;
    auto it = child_of.find(key);
    if (it != child_of.end()) return it->second;
    int id = (int)nodes_.size();
    nodes_.push_back(Node{parent, ch, frame_});
    child_of.emplace(key, id);
    return id;
  };

  std::unordered_map<int, Beam> merged;
  auto accumulate = [&](int node, double lp_b, double lp_nb,
                        const Beam& proto) {
    auto it = merged.find(node);
    if (it == merged.end()) {
      Beam b = proto;
      b.node = node;
      b.lp_b = lp_b;
      b.lp_nb = lp_nb;
      merged.emplace(node, b);
    } else {
      it->second.lp_b = LogSumExp(it->second.lp_b, lp_b);
      it->second.lp_nb = LogSumExp(it->second.lp_nb, lp_nb);
    }
  };

  for (const Beam& b : beams_) {
    double total = Total(b.lp_b, b.lp_nb);
    for (const auto& pc : pruned) {
      int ch = pc.first;
      double lp = pc.second;
      if (ch == blank) {
        accumulate(b.node, total + lp, kLog0, b);
        continue;
      }
      int last_ch = nodes_[b.node].ch;
      if (ch == last_ch) {
        // repeat merges into the same prefix
        if (b.lp_nb > kLog0)
          accumulate(b.node, kLog0, b.lp_nb + lp, b);
        // blank-separated repeat extends
        if (b.lp_b > kLog0) {
          Beam proto = b;
          double add = b.lp_b + lp;
          int child = get_child(b.node, ch);
          if (Extend(&proto, ch, &add, child))
            accumulate(child, kLog0, add, proto);
        }
        continue;
      }
      Beam proto = b;
      double add = total + lp;
      int child = get_child(b.node, ch);
      if (Extend(&proto, ch, &add, child))
        accumulate(child, kLog0, add, proto);
    }
  }

  // top beam_size by total prob
  std::vector<Beam> next;
  next.reserve(merged.size());
  for (auto& kv : merged) next.push_back(kv.second);
  int keep = std::min((int)next.size(), opts_.beam_size);
  std::partial_sort(next.begin(), next.begin() + keep, next.end(),
                    [](const Beam& a, const Beam& b) {
                      return Total(a.lp_b, a.lp_nb) >
                             Total(b.lp_b, b.lp_nb);
                    });
  next.resize(keep);
  beams_ = std::move(next);
  ++frame_;
}

bool StreamingDecoder::Extend(Beam* proto, int ch, double* add,
                              int child) {
  const CharTrie* trie = scorer_ ? scorer_->trie() : nullptr;
  char c = alphabet_[ch];
  if (scorer_ != nullptr && scorer_->is_character_based()) {
    // character LM: every emitted character is scored; context is the
    // character history (reference scorer.h:60-89, no trie/space logic)
    int cid;
    *add += scorer_->ScoreWord(contexts_[proto->ctx],
                               std::string(1, c), &cid);
    std::vector<int> ctx = contexts_[proto->ctx];
    ctx.push_back(cid);
    int max_ctx = scorer_->lm_order() - 1;
    if ((int)ctx.size() > max_ctx && max_ctx >= 0)
      ctx.erase(ctx.begin(), ctx.end() - max_ctx);
    proto->ctx = InternContext(std::move(ctx));
    return true;
  }
  if (c == ' ') {
    if (scorer_ != nullptr) {
      std::string word = PartialWord(*proto);
      // FSTMATCH-equivalent dictionary mode: the completed word must be
      // a full vocabulary word, not merely a valid trie prefix
      // (reference decoders/ctc_beam_search_decoder.cpp:104-120)
      if (scorer_->dictionary_mode() && !word.empty() &&
          !trie->IsWord(proto->trie_node))
        return false;
      if (!word.empty()) {
        int wid;
        *add += scorer_->ScoreWord(contexts_[proto->ctx], word, &wid);
        std::vector<int> ctx = contexts_[proto->ctx];
        ctx.push_back(wid);
        int max_ctx = scorer_->lm_order() - 1;
        if ((int)ctx.size() > max_ctx && max_ctx >= 0)
          ctx.erase(ctx.begin(), ctx.end() - max_ctx);
        proto->ctx = InternContext(std::move(ctx));
      }
    }
    proto->word_start = child;
    proto->trie_node = CharTrie::kRoot;
    return true;
  }
  if (trie != nullptr) {
    int next = trie->Step(proto->trie_node, c);
    if (next < 0) return false;
    proto->trie_node = next;
  }
  return true;
}

std::string StreamingDecoder::Decode(const float* probs, int T, int V) {
  for (int t = 0; t < T; ++t) Step(probs + (size_t)t * V, V);
  return Best().text;
}

std::vector<BeamResult> StreamingDecoder::TopN(int n) const {
  std::vector<BeamResult> out;
  out.reserve(beams_.size());
  for (const Beam& b : beams_) {
    double score = Total(b.lp_b, b.lp_nb);
    if (scorer_ != nullptr && !scorer_->is_character_based()) {
      std::string tail = PartialWord(b);
      if (!tail.empty()) {
        int wid;
        score += scorer_->ScoreWord(contexts_[b.ctx], tail, &wid);
      }
    }
    BeamResult r;
    r.score = score;
    r.text = TextOf(b.node);
    std::vector<int> times;
    int node = b.node;
    while (node > 0) {
      times.push_back(nodes_[node].t);
      node = nodes_[node].parent;
    }
    std::reverse(times.begin(), times.end());
    r.times = std::move(times);
    out.push_back(std::move(r));
  }
  int keep = std::min((int)out.size(), n);
  std::partial_sort(out.begin(), out.begin() + keep, out.end(),
                    [](const BeamResult& a, const BeamResult& b) {
                      return a.score > b.score;
                    });
  out.resize(keep);
  return out;
}

BeamResult StreamingDecoder::Best() const {
  // Hot path for streaming (called per audio chunk): pick the argmax
  // beam by score first and materialize text/timestamps for that one
  // beam only — TopN(1) would build text and walk the time chain for
  // every live beam just to throw all but one away.
  if (beams_.empty()) return BeamResult{-1e300, "", {}};
  int best = 0;
  double best_score = -1e300;
  for (int i = 0; i < (int)beams_.size(); ++i) {
    const Beam& b = beams_[i];
    double score = Total(b.lp_b, b.lp_nb);
    if (scorer_ != nullptr && !scorer_->is_character_based()) {
      std::string tail = PartialWord(b);
      if (!tail.empty()) {
        int wid;
        score += scorer_->ScoreWord(contexts_[b.ctx], tail, &wid);
      }
    }
    if (score > best_score) {
      best_score = score;
      best = i;
    }
  }
  const Beam& b = beams_[best];
  BeamResult r;
  r.score = best_score;
  r.text = TextOf(b.node);
  std::vector<int> times;
  int node = b.node;
  while (node > 0) {
    times.push_back(nodes_[node].t);
    node = nodes_[node].parent;
  }
  std::reverse(times.begin(), times.end());
  r.times = std::move(times);
  return r;
}

// ---------------------------------------------------------------------------
// free functions
// ---------------------------------------------------------------------------
std::vector<BeamResult> BeamSearch(const float* probs, int T, int V,
                                   const std::string& alphabet,
                                   const DecodeOptions& opts,
                                   const Scorer* scorer, int nbest) {
  StreamingDecoder dec(alphabet, opts, scorer);
  dec.Decode(probs, T, V);
  return dec.TopN(nbest < 1 ? 1 : nbest);
}

std::vector<std::vector<BeamResult>> BeamSearchBatch(
    const float* probs, const int* seq_lens, int B, int Tmax, int V,
    const std::string& alphabet, const DecodeOptions& opts,
    const Scorer* scorer, int num_threads) {
  std::vector<std::vector<BeamResult>> results(B);
  if (num_threads < 1) num_threads = 1;
  std::vector<std::thread> workers;
  std::atomic_int next_idx{0};
  auto worker = [&]() {
    while (true) {
      int i = next_idx.fetch_add(1);
      if (i >= B) return;
      results[i] = BeamSearch(probs + (size_t)i * Tmax * V, seq_lens[i],
                              V, alphabet, opts, scorer);
    }
  };
  int n = std::min(num_threads, B);
  for (int i = 0; i < n; ++i) workers.emplace_back(worker);
  for (auto& w : workers) w.join();
  return results;
}

}  // namespace os2s
