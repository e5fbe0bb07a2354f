#include "ngram_lm.h"

#include <cstring>
#include <fstream>
#include <sstream>

namespace os2s {

std::string NGramLM::Key(const std::vector<int>& ids) {
  std::string out(ids.size() * sizeof(int), '\0');
  std::memcpy(&out[0], ids.data(), ids.size() * sizeof(int));
  return out;
}

bool NGramLM::Load(const std::string& arpa_path) {
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

double NGramLM::Lookup(std::vector<int> ctx, int word) const {
  // direct hit on (ctx, word)?
  std::vector<int> full = ctx;
  full.push_back(word);
  if ((int)full.size() <= order_) {
    auto& table = tables_[full.size() - 1];
    auto it = table.find(Key(full));
    if (it != table.end()) return it->second.prob;
  }
  if (ctx.empty()) {
    auto& uni = tables_[0];
    auto it = uni.find(Key({word}));
    if (it != uni.end()) return it->second.prob;
    auto unk = vocab_.find("<unk>");
    if (unk != vocab_.end()) {
      auto u = uni.find(Key({unk->second}));
      if (u != uni.end()) return u->second.prob;
    }
    return -99.0;
  }
  // back off: weight of ctx + recurse on shorter context
  double bo = 0.0;
  if ((int)ctx.size() <= order_) {
    auto& table = tables_[ctx.size() - 1];
    auto it = table.find(Key(ctx));
    if (it != table.end()) bo = it->second.backoff;
  }
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
