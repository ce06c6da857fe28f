// Native host-side graph construction kernels.
//
// The reference delegates its host-side graph work to external native
// libraries (scipy cKDTree, torch sparse — SURVEY.md §2.3); this is the
// first-party equivalent for the input pipeline's hot loops: mesh
// tessellation -> edge lists, k-hop expansion, and ELL grouping. Exposed via
// a C ABI consumed with ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC graph_native.cpp -o libgraphnative.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Triangles [F,3] -> deduplicated undirected edge list (both directions,
// self-loops dropped, sorted by (sender, receiver)). Returns count written.
// out_s/out_r capacity must be >= 6*nfaces.
int64_t gn_face_to_edge(const int64_t* faces, int64_t nfaces, int64_t num_nodes,
                        int64_t* out_s, int64_t* out_r) {
  std::vector<uint64_t> keys;
  keys.reserve(nfaces * 6);
  const uint64_t n = (uint64_t)num_nodes;
  for (int64_t f = 0; f < nfaces; ++f) {
    const int64_t a = faces[3 * f], b = faces[3 * f + 1], c = faces[3 * f + 2];
    const int64_t pairs[6][2] = {{a, b}, {b, a}, {b, c}, {c, b}, {a, c}, {c, a}};
    for (auto& p : pairs) {
      if (p[0] != p[1]) keys.push_back((uint64_t)p[0] * n + (uint64_t)p[1]);
    }
  }
  std::sort(keys.begin(), keys.end());
  keys.erase(std::unique(keys.begin(), keys.end()), keys.end());
  for (size_t i = 0; i < keys.size(); ++i) {
    out_s[i] = (int64_t)(keys[i] / n);
    out_r[i] = (int64_t)(keys[i] % n);
  }
  return (int64_t)keys.size();
}

// K-hop expansion of a symmetric edge list: all pairs (u, v), u != v,
// reachable within k hops. BFS per node over a CSR built internally.
// Returns count written, or -1 if out capacity (cap) insufficient.
int64_t gn_k_hop(const int64_t* senders, const int64_t* receivers,
                 int64_t num_edges, int64_t num_nodes, int64_t k,
                 int64_t* out_s, int64_t* out_r, int64_t cap) {
  // CSR by sender
  std::vector<int64_t> deg(num_nodes + 1, 0);
  for (int64_t e = 0; e < num_edges; ++e) deg[senders[e] + 1]++;
  for (int64_t i = 0; i < num_nodes; ++i) deg[i + 1] += deg[i];
  std::vector<int64_t> adj(num_edges);
  std::vector<int64_t> fill(deg.begin(), deg.end() - 1);
  for (int64_t e = 0; e < num_edges; ++e) adj[fill[senders[e]]++] = receivers[e];

  std::vector<int64_t> seen(num_nodes, -1);  // per-source stamp, no resets
  std::vector<int64_t> frontier, next;
  int64_t cnt = 0;
  for (int64_t u = 0; u < num_nodes; ++u) {
    seen[u] = u;
    frontier.clear();
    frontier.push_back(u);
    for (int64_t hop = 0; hop < k; ++hop) {
      next.clear();
      for (int64_t v : frontier) {
        for (int64_t t = deg[v]; t < deg[v + 1]; ++t) {
          const int64_t w = adj[t];
          if (w == u || seen[w] == u) continue;
          seen[w] = u;
          next.push_back(w);
          if (cnt >= cap) return -1;
          out_s[cnt] = u;
          out_r[cnt] = w;
          ++cnt;
        }
      }
      frontier.swap(next);
    }
  }
  return cnt;
}

// ELL grouping of a receiver-sorted-or-not symmetric edge list.
// Outputs (all length num_nodes*degree): senders_ell (owner for padding),
// mask (0/1), edge_perm (original edge index, 0 for padding), twin_perm.
// Returns 0 on success, -1 if a node's in-degree exceeds `degree`,
// -2 if the list is not symmetric.
int64_t gn_build_ell(const int64_t* senders, const int64_t* receivers,
                     int64_t num_edges, int64_t num_nodes, int64_t degree,
                     int64_t* senders_ell, uint8_t* mask, int64_t* edge_perm,
                     int64_t* twin_perm) {
  const int64_t slots = num_nodes * degree;
  std::vector<int64_t> count(num_nodes, 0);
  for (int64_t i = 0; i < slots; ++i) {
    senders_ell[i] = i / degree;
    mask[i] = 0;
    edge_perm[i] = 0;
    twin_perm[i] = i;
  }
  // slot assignment in input order (stable like np.argsort(kind=stable))
  std::vector<int64_t> slot_of_edge(num_edges);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int64_t r = receivers[e];
    if (count[r] >= degree) return -1;
    const int64_t s = r * degree + count[r]++;
    slot_of_edge[e] = s;
    senders_ell[s] = senders[e];
    mask[s] = 1;
    edge_perm[s] = e;
  }
  // twin: sort (sender, receiver) keys of real slots, binary-search reverses
  std::vector<std::pair<uint64_t, int64_t>> keyed;
  keyed.reserve(num_edges);
  const uint64_t n = (uint64_t)num_nodes;
  for (int64_t e = 0; e < num_edges; ++e) {
    keyed.push_back({(uint64_t)receivers[e] * n + (uint64_t)senders[e],
                     slot_of_edge[e]});
  }
  std::sort(keyed.begin(), keyed.end());
  for (int64_t e = 0; e < num_edges; ++e) {
    const uint64_t want = (uint64_t)senders[e] * n + (uint64_t)receivers[e];
    auto it = std::lower_bound(
        keyed.begin(), keyed.end(), std::make_pair(want, (int64_t)-1));
    if (it == keyed.end() || it->first != want) return -2;
    twin_perm[slot_of_edge[e]] = it->second;
  }
  return 0;
}

}  // extern "C"
