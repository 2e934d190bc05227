#include "maxflow.h"

#include <algorithm>
#include <limits>

namespace omvs {

namespace {
constexpr double kEps = 1e-12;  // capacities below this count as saturated
}

MaxFlow::MaxFlow(int64_t n_nodes) : n_(n_nodes) {
  tr_cap_.assign(n_, 0.0);
  out_.resize(n_);
  level_.assign(n_, -1);
  cur_.assign(n_, 0);
}

void MaxFlow::add_terminal(int64_t node, double cap_s, double cap_t) {
  // antagonistic terminal capacities cancel; only the difference matters for
  // the cut (the cancelled part is immediate flow)
  flow_ += std::min(cap_s, cap_t);
  tr_cap_[node] += cap_s - cap_t;
}

void MaxFlow::add_edge(int64_t a, int64_t b, double cap_ab, double cap_ba) {
  int64_t ia = (int64_t)arcs_.size();
  arcs_.push_back({b, cap_ab});
  arcs_.push_back({a, cap_ba});
  out_[a].push_back(ia);
  out_[b].push_back(ia + 1);
}

// BFS from all source-attached nodes; returns true if any sink-attached node
// is reachable in the residual graph.
bool MaxFlow::bfs() {
  std::fill(level_.begin(), level_.end(), -1);
  std::vector<int64_t> q;
  q.reserve(1024);
  for (int64_t i = 0; i < n_; ++i) {
    if (tr_cap_[i] > kEps) {
      level_[i] = 0;
      q.push_back(i);
    }
  }
  bool reached = false;
  for (size_t h = 0; h < q.size(); ++h) {
    int64_t v = q[h];
    if (tr_cap_[v] < -kEps) reached = true;
    for (int64_t a : out_[v]) {
      if (arcs_[a].r_cap <= kEps) continue;
      int64_t w = arcs_[a].head;
      if (level_[w] >= 0) continue;
      level_[w] = level_[v] + 1;
      q.push_back(w);
    }
  }
  return reached;
}

// DFS blocking flow: push up to `pushed` units from v toward any sink node.
double MaxFlow::dfs(int64_t v, double pushed) {
  if (tr_cap_[v] < -kEps) {
    double d = std::min(pushed, -tr_cap_[v]);
    tr_cap_[v] += d;
    return d;
  }
  for (int32_t& ci = cur_[v]; ci < (int32_t)out_[v].size(); ++ci) {
    int64_t a = out_[v][ci];
    Arc& arc = arcs_[a];
    if (arc.r_cap <= kEps) continue;
    int64_t w = arc.head;
    if (level_[w] != level_[v] + 1) continue;
    double d = dfs(w, std::min(pushed, arc.r_cap));
    if (d > 0) {
      arc.r_cap -= d;
      arcs_[a ^ 1].r_cap += d;
      return d;
    }
  }
  level_[v] = -1;  // dead end: prune
  return 0;
}

double MaxFlow::compute() {
  while (bfs()) {
    std::fill(cur_.begin(), cur_.end(), 0);
    for (int64_t i = 0; i < n_; ++i) {
      if (tr_cap_[i] <= kEps || level_[i] != 0) continue;
      while (tr_cap_[i] > kEps) {
        double d = dfs(i, tr_cap_[i]);
        if (d <= 0) break;
        tr_cap_[i] -= d;
        flow_ += d;
      }
    }
  }
  // final reachability defines the cut: source side = reachable from a
  // source-attached node in the residual graph
  bfs();
  return flow_;
}

bool MaxFlow::is_source_side(int64_t node) const { return level_[node] >= 0; }

}  // namespace omvs
