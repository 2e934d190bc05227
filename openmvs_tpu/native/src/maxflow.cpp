#include "maxflow.h"

#include <algorithm>
#include <cassert>
#include <limits>

namespace omvs {

namespace {
constexpr int64_t kTerminal = -2;  // parent_arc sentinel: parent is terminal
constexpr int64_t kOrphan = -3;
}  // namespace

MaxFlow::MaxFlow(int64_t n_nodes) { nodes_.resize(n_nodes); }

void MaxFlow::add_terminal(int64_t node, double cap_s, double cap_t) {
  Node& n = nodes_[node];
  // antagonistic terminal capacities cancel; only the difference matters for
  // the cut (the cancelled part is immediate flow)
  flow_ += std::min(cap_s, cap_t);
  n.tr_cap += cap_s - cap_t;
}

void MaxFlow::add_edge(int64_t a, int64_t b, double cap_ab, double cap_ba) {
  int64_t ia = (int64_t)arcs_.size();
  arcs_.push_back({b, nodes_[a].first_arc, ia + 1, cap_ab});
  nodes_[a].first_arc = ia;
  arcs_.push_back({a, nodes_[b].first_arc, ia, cap_ba});
  nodes_[b].first_arc = ia + 1;
}

void MaxFlow::set_active(int64_t i) {
  if (!nodes_[i].in_active) {
    nodes_[i].in_active = true;
    active_.push_back(i);
  }
}

int64_t MaxFlow::next_active() {
  while (active_head_ < active_.size()) {
    int64_t i = active_[active_head_];
    nodes_[i].in_active = false;
    ++active_head_;
    if (nodes_[i].tree != 0) return i;
  }
  // compact the queue storage occasionally
  active_.clear();
  active_head_ = 0;
  return -1;
}

double MaxFlow::compute() {
  // init: all nodes with tr_cap != 0 become roots of S/T trees
  for (int64_t i = 0; i < (int64_t)nodes_.size(); ++i) {
    Node& n = nodes_[i];
    if (n.tr_cap > 0) {
      n.tree = 1;
      n.parent_arc = kTerminal;
      n.dist = 1;
      n.timestamp = 0;
      set_active(i);
    } else if (n.tr_cap < 0) {
      n.tree = -1;
      n.parent_arc = kTerminal;
      n.dist = 1;
      n.timestamp = 0;
      set_active(i);
    }
  }

  int64_t current = -1;
  while (true) {
    // ---- grow phase
    int64_t middle = -1;
    if (current >= 0 && nodes_[current].tree == 0) current = -1;
    while (middle < 0) {
      if (current < 0) {
        current = next_active();
        if (current < 0) break;
      }
      Node& n = nodes_[current];
      int8_t tree = n.tree;
      int64_t a = n.first_arc;
      for (; a >= 0; a = arcs_[a].next) {
        const Arc& arc = arcs_[a];
        double rc = tree > 0 ? arc.r_cap : arcs_[arc.sister].r_cap;
        if (rc <= 0) continue;
        int64_t h = arc.head;
        Node& hn = nodes_[h];
        if (hn.tree == 0) {
          hn.tree = tree;
          hn.parent_arc = arc.sister;
          hn.timestamp = n.timestamp;
          hn.dist = n.dist + 1;
          set_active(h);
        } else if (hn.tree != tree) {
          middle = tree > 0 ? a : arc.sister;
          break;
        } else if (hn.timestamp <= time_ && hn.dist > n.dist + 1) {
          // heuristic: shorter path found
          hn.parent_arc = arc.sister;
          hn.timestamp = n.timestamp;
          hn.dist = n.dist + 1;
        }
      }
      if (middle < 0) {
        current = -1;  // node fully processed
      } else {
        set_active(current);  // revisit later
      }
    }
    if (middle < 0) break;  // no augmenting path: done
    ++time_;

    // ---- augment phase
    augment(middle);

    // ---- adopt phase
    while (!orphans_.empty()) {
      int64_t o = orphans_.back();
      orphans_.pop_back();
      adopt(o);
    }
  }
  return flow_;
}

void MaxFlow::augment(int64_t middle_arc) {
  // find bottleneck along source path, middle arc, sink path
  double bottleneck = arcs_[middle_arc].r_cap;
  int64_t i = arcs_[arcs_[middle_arc].sister].head;  // source-side endpoint
  while (true) {
    Node& n = nodes_[i];
    if (n.parent_arc == kTerminal) {
      bottleneck = std::min(bottleneck, n.tr_cap);
      break;
    }
    const Arc& pa = arcs_[n.parent_arc];  // arc from n toward its parent
    bottleneck = std::min(bottleneck, arcs_[pa.sister].r_cap);
    i = pa.head;
  }
  i = arcs_[middle_arc].head;  // sink-side endpoint
  while (true) {
    Node& n = nodes_[i];
    if (n.parent_arc == kTerminal) {
      bottleneck = std::min(bottleneck, -n.tr_cap);
      break;
    }
    const Arc& pa = arcs_[n.parent_arc];
    bottleneck = std::min(bottleneck, pa.r_cap);
    i = pa.head;
  }

  // push
  arcs_[arcs_[middle_arc].sister].r_cap += bottleneck;
  arcs_[middle_arc].r_cap -= bottleneck;
  // source side
  i = arcs_[arcs_[middle_arc].sister].head;
  while (true) {
    Node& n = nodes_[i];
    if (n.parent_arc == kTerminal) {
      n.tr_cap -= bottleneck;
      if (n.tr_cap <= 0) {
        n.parent_arc = kOrphan;
        orphans_.push_back(i);
      }
      break;
    }
    Arc& pa = arcs_[n.parent_arc];
    pa.r_cap += bottleneck;
    arcs_[pa.sister].r_cap -= bottleneck;
    if (arcs_[pa.sister].r_cap <= 0) {
      n.parent_arc = kOrphan;
      orphans_.push_back(i);
    }
    i = pa.head;
  }
  // sink side
  i = arcs_[middle_arc].head;
  while (true) {
    Node& n = nodes_[i];
    if (n.parent_arc == kTerminal) {
      n.tr_cap += bottleneck;
      if (n.tr_cap >= 0) {
        n.parent_arc = kOrphan;
        orphans_.push_back(i);
      }
      break;
    }
    Arc& pa = arcs_[n.parent_arc];
    arcs_[pa.sister].r_cap += bottleneck;
    pa.r_cap -= bottleneck;
    if (pa.r_cap <= 0) {
      n.parent_arc = kOrphan;
      orphans_.push_back(i);
    }
    i = pa.head;
  }
  flow_ += bottleneck;
}

void MaxFlow::adopt(int64_t o) {
  Node& n = nodes_[o];
  int8_t tree = n.tree;
  // look for a new valid parent (rooted in a terminal) through a residual arc
  int64_t best_arc = -1;
  uint32_t best_dist = std::numeric_limits<uint32_t>::max();
  for (int64_t a = n.first_arc; a >= 0; a = arcs_[a].next) {
    const Arc& arc = arcs_[a];
    double rc = tree > 0 ? arcs_[arc.sister].r_cap : arc.r_cap;
    if (rc <= 0) continue;
    int64_t h = arc.head;
    Node& hn = nodes_[h];
    if (hn.tree != tree) continue;
    // check that h's path reaches a terminal (with path compression via timestamps)
    uint32_t d = 0;
    int64_t j = h;
    bool ok = false;
    while (true) {
      Node& jn = nodes_[j];
      if (jn.timestamp == time_) {
        d += jn.dist;
        ok = true;
        break;
      }
      ++d;
      if (jn.parent_arc == kTerminal) {
        jn.timestamp = time_;
        jn.dist = 1;
        ok = true;
        break;
      }
      if (jn.parent_arc == kOrphan || jn.parent_arc < 0) {
        ok = false;
        break;
      }
      j = arcs_[jn.parent_arc].head;
    }
    if (!ok) continue;
    // mark path distances
    j = h;
    uint32_t dd = d;
    while (nodes_[j].timestamp != time_) {
      Node& jn = nodes_[j];
      jn.timestamp = time_;
      jn.dist = dd--;
      j = arcs_[jn.parent_arc].head;
    }
    if (d < best_dist) {
      best_dist = d;
      best_arc = a;
      if (d == 1) break;
    }
  }

  if (best_arc >= 0) {
    n.parent_arc = best_arc;
    n.timestamp = time_;
    n.dist = best_dist + 1;
    return;
  }

  // no parent: node becomes free; process neighbors
  n.tree = 0;
  for (int64_t a = n.first_arc; a >= 0; a = arcs_[a].next) {
    const Arc& arc = arcs_[a];
    int64_t h = arc.head;
    Node& hn = nodes_[h];
    if (hn.tree != tree) continue;
    double rc = tree > 0 ? arcs_[arc.sister].r_cap : arc.r_cap;
    if (rc > 0) set_active(h);
    if (hn.parent_arc >= 0 && arcs_[hn.parent_arc].head == o) {
      hn.parent_arc = kOrphan;
      orphans_.push_back(h);
    }
  }
}

bool MaxFlow::is_source_side(int64_t node) const { return nodes_[node].tree > 0; }

}  // namespace omvs
