// Boykov-Kolmogorov style s-t max-flow / min-cut for graph-cut surface
// extraction.  Role equivalent of the reference's IBFS solver
// (libs/Math/IBFS/IBFS.h, used by SceneReconstruct.cpp:58-108); independent
// implementation of the classic BK augmenting-path algorithm with search
// trees and orphan adoption.
#pragma once

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

  double compute();                       // returns max flow value
  bool is_source_side(int64_t node) const;  // after compute()

 private:
  struct Arc {
    int64_t head;     // target node
    int64_t next;     // next arc out of the same node
    int64_t sister;   // reverse arc index
    double r_cap;     // residual capacity
  };
  struct Node {
    int64_t first_arc = -1;
    int64_t parent_arc = -1;  // arc to parent in search tree (-1 root/free)
    int64_t next_active = -1;
    uint32_t timestamp = 0;
    uint32_t dist = 0;
    int8_t tree = 0;          // 0 free, +1 source tree, -1 sink tree
    bool in_active = false;
    double tr_cap = 0;        // >0: residual source->node, <0: node->sink
  };

  std::vector<Node> nodes_;
  std::vector<Arc> arcs_;
  std::vector<int64_t> active_;  // FIFO queue
  size_t active_head_ = 0;
  std::vector<int64_t> orphans_;
  uint32_t time_ = 0;
  double flow_ = 0;

  void set_active(int64_t i);
  int64_t next_active();
  void augment(int64_t middle_arc);
  void adopt(int64_t node);
};

}  // namespace omvs
