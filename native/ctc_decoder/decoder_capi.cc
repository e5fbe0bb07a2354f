// C API for ctypes binding (this environment has no pybind11; the
// Python side is openseq2seq_tpu/ops/ctc_beam_native.py).
#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

#include "ctc_beam_search.h"

using os2s::BeamResult;
using os2s::DecodeOptions;
using os2s::Scorer;
using os2s::StreamingDecoder;

extern "C" {

void* os2s_scorer_create(double alpha, double beta,
                         const char* arpa_path, int build_trie) {
  auto* s = new Scorer();
  if (!s->Load(arpa_path, alpha, beta, build_trie != 0)) {
    delete s;
    return nullptr;
  }
  return s;
}

void os2s_scorer_destroy(void* scorer) {
  delete static_cast<Scorer*>(scorer);
}

// hard dictionary constraint (reference FSTMATCH mode)
void os2s_scorer_set_dict(void* scorer, int enabled) {
  static_cast<Scorer*>(scorer)->set_dictionary_mode(enabled != 0);
}

// Convert a text ARPA LM to the mmap-able binary format. Returns 0 on
// success (KenLM-binary analogue: reference generate_trie.cpp).
int os2s_lm_binarize(const char* arpa_path, const char* out_path) {
  Scorer s;
  if (!s.Load(arpa_path, 0.0, 0.0, /*build_trie=*/false)) return -1;
  return s.SaveBinary(out_path) ? 0 : -2;
}

// Raw log10 P(word | context); context is space-separated words
// (may be empty). Verification probe for LM-format parity tests.
double os2s_lm_logcond(void* scorer, const char* context,
                       const char* word) {
  std::vector<std::string> ctx;
  const char* p = context;
  while (p && *p) {
    const char* sp = std::strchr(p, ' ');
    if (sp == nullptr) {
      ctx.emplace_back(p);
      break;
    }
    if (sp != p) ctx.emplace_back(p, sp - p);
    p = sp + 1;
  }
  return static_cast<Scorer*>(scorer)->LogCond(ctx, word);
}

// Decode one utterance. Returns length of text written to out (or -1).
int os2s_decode(const float* probs, int T, int V, const char* alphabet,
                int beam_size, double cutoff_prob, int cutoff_top_n,
                int blank_id, void* scorer, char* out, int out_cap,
                double* out_score, int* out_times, int times_cap) {
  DecodeOptions opts;
  opts.beam_size = beam_size;
  opts.cutoff_prob = cutoff_prob;
  opts.cutoff_top_n = cutoff_top_n;
  opts.blank_id = blank_id;
  auto results = os2s::BeamSearch(probs, T, V, alphabet, opts,
                                  static_cast<Scorer*>(scorer));
  if (results.empty()) return -1;
  const BeamResult& best = results[0];
  int n = (int)best.text.size();
  if (n + 1 > out_cap) n = out_cap - 1;
  std::memcpy(out, best.text.data(), n);
  out[n] = '\0';
  if (out_score) *out_score = best.score;
  if (out_times && times_cap > 0) {
    int m = std::min((int)best.times.size(), times_cap);
    std::memcpy(out_times, best.times.data(), m * sizeof(int));
    for (int i = m; i < times_cap; ++i) out_times[i] = -1;
  }
  return n;
}

// Decode one utterance into its top-n hypotheses. outs is an
// (nbest, out_stride) char grid; scores has nbest slots. Returns the
// number of hypotheses written (<= nbest), or -1 on error.
int os2s_decode_nbest(const float* probs, int T, int V,
                      const char* alphabet, int beam_size,
                      double cutoff_prob, int cutoff_top_n, int blank_id,
                      void* scorer, int nbest, char* outs, int out_stride,
                      double* out_scores) {
  DecodeOptions opts;
  opts.beam_size = beam_size;
  opts.cutoff_prob = cutoff_prob;
  opts.cutoff_top_n = cutoff_top_n;
  opts.blank_id = blank_id;
  auto results = os2s::BeamSearch(probs, T, V, alphabet, opts,
                                  static_cast<Scorer*>(scorer), nbest);
  int n = std::min((int)results.size(), nbest);
  for (int i = 0; i < n; ++i) {
    const std::string& text = results[i].text;
    int m = std::min((int)text.size(), out_stride - 1);
    std::memcpy(outs + (size_t)i * out_stride, text.data(), m);
    outs[(size_t)i * out_stride + m] = '\0';
    if (out_scores) out_scores[i] = results[i].score;
  }
  return n;
}

// Batch decode with worker threads. outs is (B, out_stride) char grid.
int os2s_decode_batch(const float* probs, const int* seq_lens, int B,
                      int Tmax, int V, const char* alphabet,
                      int beam_size, double cutoff_prob,
                      int cutoff_top_n, int blank_id, void* scorer,
                      int num_threads, char* outs, int out_stride,
                      double* out_scores) {
  DecodeOptions opts;
  opts.beam_size = beam_size;
  opts.cutoff_prob = cutoff_prob;
  opts.cutoff_top_n = cutoff_top_n;
  opts.blank_id = blank_id;
  auto results = os2s::BeamSearchBatch(
      probs, seq_lens, B, Tmax, V, alphabet, opts,
      static_cast<Scorer*>(scorer), num_threads);
  for (int i = 0; i < B; ++i) {
    const std::string& text =
        results[i].empty() ? std::string() : results[i][0].text;
    int n = std::min((int)text.size(), out_stride - 1);
    std::memcpy(outs + (size_t)i * out_stride, text.data(), n);
    outs[(size_t)i * out_stride + n] = '\0';
    if (out_scores)
      out_scores[i] = results[i].empty() ? -1e300 : results[i][0].score;
  }
  return 0;
}

// ---- streaming decoder -------------------------------------------------
void* os2s_stream_create(const char* alphabet, int beam_size,
                         double cutoff_prob, int cutoff_top_n,
                         int blank_id, void* scorer) {
  DecodeOptions opts;
  opts.beam_size = beam_size;
  opts.cutoff_prob = cutoff_prob;
  opts.cutoff_top_n = cutoff_top_n;
  opts.blank_id = blank_id;
  return new StreamingDecoder(alphabet, opts,
                              static_cast<Scorer*>(scorer));
}

void os2s_stream_destroy(void* dec) {
  delete static_cast<StreamingDecoder*>(dec);
}

void os2s_stream_reset(void* dec) {
  static_cast<StreamingDecoder*>(dec)->Reset();
}

int os2s_stream_decode(void* dec, const float* probs, int T, int V,
                       char* out, int out_cap, int* out_times,
                       int times_cap) {
  auto* d = static_cast<StreamingDecoder*>(dec);
  d->Decode(probs, T, V);
  BeamResult best = d->Best();
  int n = (int)best.text.size();
  if (n + 1 > out_cap) n = out_cap - 1;
  std::memcpy(out, best.text.data(), n);
  out[n] = '\0';
  if (out_times && times_cap > 0) {
    int m = std::min((int)best.times.size(), times_cap);
    std::memcpy(out_times, best.times.data(), m * sizeof(int));
    for (int i = m; i < times_cap; ++i) out_times[i] = -1;
  }
  return n;
}

}  // extern "C"
