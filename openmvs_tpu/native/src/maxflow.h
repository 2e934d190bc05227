// s-t max-flow / min-cut for graph-cut surface extraction.  Role equivalent
// of the reference's IBFS solver (libs/Math/IBFS/IBFS.h, used by
// SceneReconstruct.cpp:58-108).  Implemented as Dinic's algorithm (level-graph
// BFS + blocking-flow DFS with current-arc): terminates in at most V phases
// regardless of capacity values, which matters with float weights, and the
// level graphs are shallow for visibility graphs (source and sink regions are
// separated by a thin surface band).
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace omvs {

class MaxFlow {
 public:
  explicit MaxFlow(int64_t n_nodes);

  // terminal capacities: source edge cap_s, sink edge cap_t
  void add_terminal(int64_t node, double cap_s, double cap_t);
  // bidirectional edge with independent capacities
  void add_edge(int64_t a, int64_t b, double cap_ab, double cap_ba);

  double compute();                         // returns max flow value
  bool is_source_side(int64_t node) const;  // after compute()

 private:
  struct Arc {
    int64_t head;   // target node
    double r_cap;   // residual capacity
  };

  int64_t n_;
  // terminal residuals: tr_cap > 0 source->node, < 0 node->sink
  std::vector<double> tr_cap_;
  std::vector<Arc> arcs_;                  // sister of arc a is a^1
  std::vector<std::vector<int64_t>> out_;  // per-node arc indices
  std::vector<int32_t> level_;
  std::vector<int32_t> cur_;
  double flow_ = 0;

  bool bfs();
  double dfs(int64_t v, double pushed);
};

}  // namespace omvs
