// pytc_ops: native post-processing kernels for the TPU connectomics
// framework. Host-side C++ replacing the reference's third-party extension
// stack (SURVEY §2.6): cc3d (connected components), fastremap (remap/dust),
// mahotas (seeded watershed), waterz (hierarchical mean-affinity
// agglomeration), affogato (mutex watershed).
//
// C ABI only — loaded from Python via ctypes. All volumes are C-contiguous
// [z][y][x]; affinities are [c][z][y][x] with channel order x,y,z — the
// standard offset list [(0,0,1),(0,1,0),(1,0,0)], high-end deepem
// convention: aff[0] = x-edges, aff[1] = y, aff[2] = z.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <thread>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

struct UnionFind {
  std::vector<uint32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = (uint32_t)i;
  }
  uint32_t find(uint32_t a) {
    uint32_t root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
      uint32_t next = parent[a];
      parent[a] = root;
      a = next;
    }
    return root;
  }
  void unite(uint32_t a, uint32_t b) {
    a = find(a); b = find(b);
    if (a != b) parent[std::max(a, b)] = std::min(a, b);
  }
  // caller chooses the surviving root (e.g. the endpoint with the larger
  // adjacency list); both args must already be roots
  void unite_keep(uint32_t keep, uint32_t gone) { parent[gone] = keep; }
};

inline int64_t idx3(int64_t z, int64_t y, int64_t x, int64_t Y, int64_t X) {
  return (z * Y + y) * X + x;
}

// RAG edge statistics for mean-affinity agglomeration: (sum, count) of the
// affinities on the boundary between two fragments.
struct RagEdge {
  double sum = 0;
  int64_t cnt = 0;
};

inline uint64_t rag_key(uint32_t a, uint32_t b) {
  if (a > b) std::swap(a, b);
  return ((uint64_t)a << 32) | b;
}

// Shared hierarchical merge loop (waterz mean-edge scorer): pops edges in
// descending mean order with lazy re-scoring, folds adjacency on merge, and
// calls snapshot(t) as the frontier crosses below each threshold
// (thresholds sorted DESCENDING). Used by both the volume-level
// agglomerate_mean and the RAG-level agglomerate_rag so chunked decodes
// replay the exact same merge sequence as whole-volume ones.
template <typename SnapshotFn>
void agglomerate_merge_core(std::unordered_map<uint64_t, RagEdge>& rag,
                            uint32_t max_label, const float* thresholds,
                            int64_t T, UnionFind& uf, SnapshotFn snapshot) {
  const float min_thr = thresholds[T - 1];
  using QE = std::tuple<float, uint32_t, uint32_t>;
  std::priority_queue<QE> pq;  // max-heap by mean affinity
  // adjacency lists (may hold stale neighbor ids; rag lookup under current
  // roots is the source of truth) so a merge touches only the smaller
  // endpoint's neighbors instead of scanning the whole RAG
  std::vector<std::vector<uint32_t>> adj(max_label + 1);
  for (auto& kv : rag) {
    uint32_t a = (uint32_t)(kv.first >> 32), b = (uint32_t)kv.first;
    adj[a].push_back(b);
    adj[b].push_back(a);
    float mean = (float)(kv.second.sum / kv.second.cnt);
    if (mean > min_thr) pq.emplace(mean, a, b);
  }
  int64_t t = 0;
  while (!pq.empty() && t < T) {
    auto [score, a, b] = pq.top();
    pq.pop();
    uint32_t ra = uf.find(a), rb = uf.find(b);
    if (ra == rb) continue;
    auto it = rag.find(rag_key(ra, rb));
    if (it == rag.end()) continue;  // stale edge
    float mean = (float)(it->second.sum / it->second.cnt);
    if (std::abs(mean - score) > 1e-6f) {  // stale score: re-push
      if (mean > min_thr) pq.emplace(mean, ra, rb);
      continue;
    }
    // fresh top edge: every remaining edge scores <= mean, so thresholds
    // above it are final — snapshot them before merging across
    while (t < T && mean <= thresholds[t]) {
      snapshot(t);
      ++t;
    }
    if (t >= T) break;
    // merge the endpoint with the smaller adjacency list into the larger
    // (bounds total fold work at O(E log E) over the whole run)
    uint32_t keep = ra, gone = rb;
    if (adj[gone].size() > adj[keep].size()) std::swap(keep, gone);
    uf.unite_keep(keep, gone);
    rag.erase(rag_key(keep, gone));
    for (uint32_t other_raw : adj[gone]) {
      uint32_t other = uf.find(other_raw);
      if (other == keep || other == gone) continue;  // merged edge / self
      auto it2 = rag.find(rag_key(gone, other));
      if (it2 == rag.end()) continue;  // already folded or stale entry
      RagEdge moved_e = it2->second;
      rag.erase(it2);
      RagEdge& e = rag[rag_key(keep, other)];
      const bool existed = e.cnt != 0;
      e.sum += moved_e.sum;
      e.cnt += moved_e.cnt;
      float m2 = (float)(e.sum / e.cnt);
      if (m2 > min_thr) pq.emplace(m2, keep, other);
      if (!existed) {
        adj[keep].push_back(other);
        adj[other].push_back(keep);
      }
    }
    std::vector<uint32_t>().swap(adj[gone]);
  }
  // queue exhausted: remaining thresholds all see the final merge state
  while (t < T) {
    snapshot(t);
    ++t;
  }
}

}  // namespace

extern "C" {

// Connected components on a foreground mask. connectivity: 6, 18, or 26.
// Returns the number of components; labels 1..K written to out.
//
// Run-based (cc3d-style): each maximal x-run of foreground is ONE
// union-find node; runs in adjacent rows connect by interval overlap
// (with per-connectivity x-slack). Union-find work scales with #runs,
// not #voxels, and labeling is a fill per run.
int64_t ccl3d(const uint8_t* fg, int64_t Z, int64_t Y, int64_t X,
              int connectivity, uint32_t* out) {
  struct Run { int32_t x0, x1; uint32_t node; };  // [x0, x1] inclusive
  const int64_t n_rows = Z * Y;
  std::vector<std::vector<Run>> rows((size_t)n_rows);
  uint32_t n_runs = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* row = fg + r * X;
    auto& rr = rows[r];
    int64_t x = 0;
    while (x < X) {
      if (!row[x]) { ++x; continue; }
      int64_t x0 = x;
      while (x < X && row[x]) ++x;
      rr.push_back({(int32_t)x0, (int32_t)(x - 1), n_runs++});
    }
  }
  UnionFind uf(n_runs);
  // previous-row connections and their x-slack per connectivity:
  //   A=(0,-1)  B=(-1,-1)  C=(-1,0)  D=(-1,+1)
  //   6-conn : A/0, C/0      18-conn: A/1, C/1, B/0, D/0
  //   26-conn: all four at slack 1
  struct Nb { int dz, dy, slack; };
  std::vector<Nb> nbs;
  if (connectivity == 6) {
    nbs = {{0, -1, 0}, {-1, 0, 0}};
  } else if (connectivity == 18) {
    nbs = {{0, -1, 1}, {-1, 0, 1}, {-1, -1, 0}, {-1, 1, 0}};
  } else {
    nbs = {{0, -1, 1}, {-1, 0, 1}, {-1, -1, 1}, {-1, 1, 1}};
  }
  for (int64_t z = 0; z < Z; ++z)
    for (int64_t y = 0; y < Y; ++y) {
      auto& cur = rows[z * Y + y];
      if (cur.empty()) continue;
      for (const auto& nb : nbs) {
        const int64_t zz = z + nb.dz, yy = y + nb.dy;
        if (zz < 0 || yy < 0 || yy >= Y) continue;
        const auto& prev = rows[zz * Y + yy];
        if (prev.empty()) continue;
        // two-pointer sweep over the sorted run lists
        size_t a = 0, b = 0;
        const int32_t s = nb.slack;
        while (a < cur.size() && b < prev.size()) {
          const Run& ra = cur[a];
          const Run& rb = prev[b];
          if (ra.x0 <= rb.x1 + s && rb.x0 <= ra.x1 + s)
            uf.unite(ra.node, rb.node);
          // advance the run that ends first: with inter-run gaps >= 1 and
          // slack <= 1, it cannot overlap anything later in the other list
          if (ra.x1 <= rb.x1) ++a;
          else ++b;
        }
      }
    }
  // relabel roots to 1..K and fill
  std::vector<uint32_t> root2label(n_runs, 0);
  uint32_t next = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    uint32_t* orow = out + r * X;
    int64_t x = 0;
    for (const Run& run : rows[r]) {
      for (; x < run.x0; ++x) orow[x] = 0;
      uint32_t root = uf.find(run.node);
      if (!root2label[root]) root2label[root] = ++next;
      const uint32_t lbl = root2label[root];
      for (; x <= run.x1; ++x) orow[x] = lbl;
    }
    for (; x < X; ++x) orow[x] = 0;
  }
  return (int64_t)next;
}

// O(n) label remap through a key->value table (fastremap equivalent).
void remap_u32(uint32_t* labels, int64_t n, const uint32_t* keys,
               const uint32_t* vals, int64_t k) {
  std::unordered_map<uint32_t, uint32_t> table;
  table.reserve((size_t)k * 2);
  for (int64_t i = 0; i < k; ++i) table[keys[i]] = vals[i];
  for (int64_t i = 0; i < n; ++i) {
    auto it = table.find(labels[i]);
    if (it != table.end()) labels[i] = it->second;
  }
}

// Renumber labels to contiguous 1..K preserving first-appearance order.
int64_t renumber_u32(uint32_t* labels, int64_t n) {
  std::unordered_map<uint32_t, uint32_t> table;
  table.reserve(1024);
  table[0] = 0;
  uint32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    auto it = table.find(labels[i]);
    if (it == table.end()) {
      table.emplace(labels[i], ++next);
      labels[i] = next;
    } else {
      labels[i] = it->second;
    }
  }
  return (int64_t)next;
}

// Remove instances smaller than min_size (cc3d.dust / remove_small_instances).
// Returns number of remaining instances.
int64_t dust_u32(uint32_t* labels, int64_t n, int64_t min_size) {
  std::unordered_map<uint32_t, int64_t> counts;
  counts.reserve(1024);
  for (int64_t i = 0; i < n; ++i)
    if (labels[i]) ++counts[labels[i]];
  int64_t kept = 0;
  for (auto& kv : counts)
    if (kv.second >= min_size) ++kept;
  for (int64_t i = 0; i < n; ++i)
    if (labels[i] && counts[labels[i]] < min_size) labels[i] = 0;
  return kept;
}

// Seeded watershed: priority-flood ascending energy from seeds within mask
// (mahotas cwatershed equivalent; 6-connectivity).
void watershed_seeded(const float* energy, const uint32_t* seeds,
                      const uint8_t* mask, int64_t Z, int64_t Y, int64_t X,
                      uint32_t* out) {
  // Priority-flood with a 65536-level bucket queue instead of a float
  // binary heap: O(n) instead of O(n log n) and cache-friendly FIFOs.
  // Energies are quantized to 16 bits over their observed range — for
  // affinity-derived energies this is far below the noise floor, and
  // region growth stays monotone (a neighbor enqueues at
  // max(current level, its own level), as in the heap formulation).
  const int64_t n = Z * Y * X;
  std::memcpy(out, seeds, n * sizeof(uint32_t));
  float lo = std::numeric_limits<float>::max();
  float hi = -std::numeric_limits<float>::max();
  for (int64_t i = 0; i < n; ++i) {
    if (mask && !mask[i]) continue;
    lo = std::min(lo, energy[i]);
    hi = std::max(hi, energy[i]);
  }
  if (!(hi > lo)) hi = lo + 1.0f;
  constexpr int NB = 1 << 16;
  const float scale = (float)(NB - 1) / (hi - lo);
  auto level = [&](int64_t i) {
    int q = (int)((energy[i] - lo) * scale);
    return q < 0 ? 0 : (q >= NB ? NB - 1 : q);
  };
  std::vector<std::vector<int64_t>> buckets(NB);
  for (int64_t i = 0; i < n; ++i)
    if (seeds[i] && (!mask || mask[i])) buckets[level(i)].push_back(i);
  const int dz[6] = {-1, 1, 0, 0, 0, 0};
  const int dy[6] = {0, 0, -1, 1, 0, 0};
  const int dx[6] = {0, 0, 0, 0, -1, 1};
  const int64_t doff[6] = {-Y * X, Y * X, -X, X, -1, 1};
  for (int b = 0; b < NB; ++b) {
    auto& q = buckets[b];
    // index loop: the bucket may grow while we drain it (same-level pushes)
    for (size_t qi = 0; qi < q.size(); ++qi) {
      const int64_t i = q[qi];
      const int64_t z = i / (Y * X), y = (i / X) % Y, x = i % X;
      const bool interior =
          z > 0 && z < Z - 1 && y > 0 && y < Y - 1 && x > 0 && x < X - 1;
      if (interior) {
        // fast path: no per-neighbor bounds checks (~90% of voxels)
        for (int d = 0; d < 6; ++d) {
          const int64_t j = i + doff[d];
          if (out[j] || (mask && !mask[j])) continue;
          out[j] = out[i];
          buckets[std::max(b, level(j))].push_back(j);
        }
        continue;
      }
      for (int d = 0; d < 6; ++d) {
        const int64_t zz = z + dz[d], yy = y + dy[d], xx = x + dx[d];
        if (zz < 0 || zz >= Z || yy < 0 || yy >= Y || xx < 0 || xx >= X) continue;
        const int64_t j = idx3(zz, yy, xx, Y, X);
        if (out[j] || (mask && !mask[j])) continue;
        out[j] = out[i];
        const int bj = std::max(b, level(j));
        buckets[bj].push_back(j);
      }
    }
    std::vector<int64_t>().swap(q);  // free drained buckets as we go
  }
}

// Affinity-threshold connected components (BANIS decode_affinity_cc /
// numba kernel equivalent): voxels i and i+offset merge when the affinity
// channel value at the "high" endpoint exceeds threshold. Channels are the
// three cardinal offsets at distance 1, order x,y,z: aff[0]=x, aff[1]=y,
// aff[2]=z (deepem high-end convention).
int64_t affinity_cc(const float* aff, int64_t Z, int64_t Y, int64_t X,
                    float threshold, uint32_t* out) {
  // Run-based: consecutive x voxels joined by supra-threshold x-edges form
  // one union-find node; y/z supra-threshold edges unite run nodes. A run
  // is foreground iff it touches any supra-threshold edge (single-voxel
  // runs with no edges stay background), matching the per-voxel semantics.
  const int64_t n = Z * Y * X;
  // channel order follows the standard offset list [(0,0,1),(0,1,0),(1,0,0)]:
  // aff[0] = x-edges, aff[1] = y-edges, aff[2] = z-edges (deepem high-end).
  const float* ax = aff;
  const float* ay = aff + n;
  const float* az = aff + 2 * n;
  std::vector<uint32_t> run_id(n);
  std::vector<uint8_t> fg_run;
  fg_run.reserve(1024);
  uint32_t n_runs = 0;
  for (int64_t r = 0; r < Z * Y; ++r) {
    const int64_t base = r * X;
    for (int64_t x = 0; x < X; ++x) {
      const int64_t i = base + x;
      if (x == 0 || !(ax[i] > threshold)) {
        run_id[i] = n_runs++;
        fg_run.push_back(0);
      } else {
        run_id[i] = n_runs - 1;
        fg_run[n_runs - 1] = 1;  // an internal x-edge makes the run fg
      }
    }
  }
  UnionFind uf(n_runs);
  for (int64_t z = 0; z < Z; ++z)
    for (int64_t y = 0; y < Y; ++y) {
      const int64_t base = (z * Y + y) * X;
      if (y > 0)
        for (int64_t x = 0; x < X; ++x) {
          const int64_t i = base + x;
          if (ay[i] > threshold) {
            uf.unite(run_id[i], run_id[i - X]);
            fg_run[run_id[i]] = 1;
            fg_run[run_id[i - X]] = 1;
          }
        }
      if (z > 0)
        for (int64_t x = 0; x < X; ++x) {
          const int64_t i = base + x;
          if (az[i] > threshold) {
            uf.unite(run_id[i], run_id[i - Y * X]);
            fg_run[run_id[i]] = 1;
            fg_run[run_id[i - Y * X]] = 1;
          }
        }
    }
  // per-run labels (one find per run), then an array lookup per voxel
  std::vector<uint32_t> run_label(n_runs, 0);
  uint32_t next = 0;
  std::vector<uint32_t> root_label(n_runs, 0);
  for (uint32_t rn = 0; rn < n_runs; ++rn) {
    if (!fg_run[rn]) continue;
    const uint32_t root = uf.find(rn);
    if (!root_label[root]) root_label[root] = ++next;
    run_label[rn] = root_label[root];
  }
  for (int64_t i = 0; i < n; ++i) out[i] = run_label[run_id[i]];
  return (int64_t)next;
}

// waterz-style hierarchical agglomeration: given fragments and 3-channel
// cardinal affinities, build a region adjacency graph scored by mean
// boundary affinity and merge edges above each threshold in descending
// score order, recomputing means lazily on merge (waterz mean-edge scorer).
//
// Multi-threshold form (waterz batch semantics, reference
// ``decoding/tuning/optuna_tuner.py:1155``): the merge sequence at a lower
// threshold extends the sequence at a higher one, so one watershed + one
// RAG serves all thresholds. `thresholds` must be sorted DESCENDING;
// out[t*n .. (t+1)*n) receives the segmentation at thresholds[t] and
// counts[t] its segment count.
static int64_t agglomerate_mean_impl(const uint32_t* fragments,
                                     const float* aff, int64_t Z, int64_t Y,
                                     int64_t X, const float* thresholds,
                                     int64_t T, uint32_t* out,
                                     int64_t* counts) {
  const int64_t n = Z * Y * X;
  uint32_t max_label = 0;
  for (int64_t i = 0; i < n; ++i) max_label = std::max(max_label, fragments[i]);
  // RAG accumulation: edge (a<b) -> (sum, count)
  std::unordered_map<uint64_t, RagEdge> rag;
  rag.reserve(4096);
  auto add_edge = [&](uint32_t a, uint32_t b, float v) {
    if (!a || !b || a == b) return;
    RagEdge& e = rag[rag_key(a, b)];
    e.sum += v; e.cnt += 1;
  };
  // channel order follows the standard offset list [(0,0,1),(0,1,0),(1,0,0)]:
  // aff[0] = x-edges, aff[1] = y-edges, aff[2] = z-edges (deepem high-end).
  const float* ax = aff;
  const float* ay = aff + n;
  const float* az = aff + 2 * n;
  for (int64_t z = 0; z < Z; ++z)
    for (int64_t y = 0; y < Y; ++y)
      for (int64_t x = 0; x < X; ++x) {
        const int64_t i = idx3(z, y, x, Y, X);
        if (z > 0) add_edge(fragments[i], fragments[i - Y * X], az[i]);
        if (y > 0) add_edge(fragments[i], fragments[i - X], ay[i]);
        if (x > 0) add_edge(fragments[i], fragments[i - 1], ax[i]);
      }
  // hierarchical merging with lazy re-evaluation: a popped edge whose
  // endpoints were merged since scoring is re-scored against current roots.
  UnionFind uf(max_label + 1);
  auto snapshot = [&](int64_t t) {
    uint32_t* dst = out + t * n;
    std::unordered_map<uint32_t, uint32_t> root2label;
    uint32_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (!fragments[i]) { dst[i] = 0; continue; }
      uint32_t r = uf.find(fragments[i]);
      auto it = root2label.find(r);
      if (it == root2label.end()) { root2label.emplace(r, ++next); dst[i] = next; }
      else dst[i] = it->second;
    }
    counts[t] = (int64_t)next;
  };
  agglomerate_merge_core(rag, max_label, thresholds, T, uf, snapshot);
  return counts[T - 1];
}

int64_t agglomerate_mean(const uint32_t* fragments, const float* aff,
                         int64_t Z, int64_t Y, int64_t X, float threshold,
                         uint32_t* out) {
  int64_t count = 0;
  return agglomerate_mean_impl(fragments, aff, Z, Y, X, &threshold, 1, out,
                               &count);
}

// Batch agglomeration over many thresholds (sorted descending) in one
// RAG + merge pass. out: [T][z][y][x]; counts: [T].
int64_t agglomerate_mean_multi(const uint32_t* fragments, const float* aff,
                               int64_t Z, int64_t Y, int64_t X,
                               const float* thresholds, int64_t T,
                               uint32_t* out, int64_t* counts) {
  return agglomerate_mean_impl(fragments, aff, Z, Y, X, thresholds, T, out,
                               counts);
}

// RAG extraction for chunked agglomeration: labels [Z][Y][X] (globally
// consistent fragment ids), aff [3][Z][Y][X] for the same region. Each
// affinity edge is owned by its HIGH-end voxel (deepem convention), so a
// chunk grid partitions the global edge set exactly. The optional low-side
// neighbor label planes lz [Y*X], ly [Z*X], lx [Z*Y] (pass NULL at volume
// boundaries) supply the labels across the chunk's low faces so seam edges
// are owned — and counted exactly once — by the high-side chunk.
// Writes up to max_edges (a, b, sum, count) rows; returns the edge count,
// or -(needed) if max_edges is too small (caller retries with that size).
int64_t rag_mean_edges(const uint32_t* labels, const float* aff, int64_t Z,
                       int64_t Y, int64_t X, const uint32_t* lz,
                       const uint32_t* ly, const uint32_t* lx, uint32_t* ea,
                       uint32_t* eb, double* esum, int64_t* ecnt,
                       int64_t max_edges) {
  const int64_t n = Z * Y * X;
  std::unordered_map<uint64_t, RagEdge> rag;
  rag.reserve(4096);
  auto add_edge = [&](uint32_t a, uint32_t b, float v) {
    if (!a || !b || a == b) return;
    RagEdge& e = rag[rag_key(a, b)];
    e.sum += v; e.cnt += 1;
  };
  const float* ax = aff;
  const float* ay = aff + n;
  const float* az = aff + 2 * n;
  for (int64_t z = 0; z < Z; ++z)
    for (int64_t y = 0; y < Y; ++y)
      for (int64_t x = 0; x < X; ++x) {
        const int64_t i = idx3(z, y, x, Y, X);
        const uint32_t li = labels[i];
        if (z > 0) add_edge(li, labels[i - Y * X], az[i]);
        else if (lz) add_edge(li, lz[y * X + x], az[i]);
        if (y > 0) add_edge(li, labels[i - X], ay[i]);
        else if (ly) add_edge(li, ly[z * X + x], ay[i]);
        if (x > 0) add_edge(li, labels[i - 1], ax[i]);
        else if (lx) add_edge(li, lx[z * Y + y], ax[i]);
      }
  if ((int64_t)rag.size() > max_edges) return -(int64_t)rag.size();
  int64_t k = 0;
  for (auto& kv : rag) {
    ea[k] = (uint32_t)(kv.first >> 32);
    eb[k] = (uint32_t)kv.first;
    esum[k] = kv.second.sum;
    ecnt[k] = kv.second.cnt;
    ++k;
  }
  return k;
}

// RAG-level mean-affinity agglomeration: same merge policy (and therefore
// the same merge sequence) as agglomerate_mean, applied to a prebuilt edge
// list — duplicate (a,b) rows are combined additively, so per-chunk RAGs
// can be concatenated directly. mapping[0..max_label] receives the
// surviving root id per fragment (mapping[0] = 0). Returns the number of
// distinct roots among 1..max_label.
int64_t agglomerate_rag(const uint32_t* ea, const uint32_t* eb,
                        const double* esum, const int64_t* ecnt, int64_t E,
                        uint32_t max_label, float threshold,
                        uint32_t* mapping) {
  std::unordered_map<uint64_t, RagEdge> rag;
  rag.reserve((size_t)E * 2);
  for (int64_t i = 0; i < E; ++i) {
    uint32_t a = ea[i], b = eb[i];
    if (!a || !b || a == b || a > max_label || b > max_label) continue;
    RagEdge& e = rag[rag_key(a, b)];
    e.sum += esum[i];
    e.cnt += ecnt[i];
  }
  UnionFind uf(max_label + 1);
  agglomerate_merge_core(rag, max_label, &threshold, 1, uf, [](int64_t) {});
  int64_t roots = 0;
  mapping[0] = 0;
  for (uint32_t i = 1; i <= max_label; ++i) {
    mapping[i] = uf.find(i);
    if (mapping[i] == i) ++roots;
  }
  return roots;
}

// Mutex watershed (Wolf et al.): attractive cardinal short-range edges +
// repulsive long-range edges processed in descending weight order with
// mutex constraints (affogato equivalent).
// offsets: [k][3] ints; attractive if |offset| sum == 1 (cardinal unit).
// aff: [k][z][y][x]; higher = stronger edge (both kinds).
int64_t mutex_watershed(const float* aff, const int32_t* offsets, int64_t K,
                        int64_t Z, int64_t Y, int64_t X, uint32_t* out) {
  const int64_t n = Z * Y * X;
  // Edges are NOT materialized as structs: an edge is identified by
  // (channel k, high-end voxel i) packed as id = k*n + i, and ordered by a
  // 16-bit quantized weight via counting sort — O(E) instead of a
  // comparison sort of ~K*n 24-byte structs (the former bottleneck).
  // deepem high-end convention: aff[k][p] is the edge between voxel p and
  // voxel p - offset_k (matches seg_to_affinity / affinity_cc).
  constexpr int NBQ = 1 << 16;
  auto edge_weight = [&](int64_t k, int64_t i, bool attract) {
    const float w = aff[k * n + i];
    return attract ? w : 1.0f - w;  // repulsive edges act with (1 - aff)
  };
  auto qkey = [&](float w) {
    // descending order: strongest edges land in bucket 0
    int q = (int)((1.0f - w) * (NBQ - 1));
    return q < 0 ? 0 : (q >= NBQ ? NBQ - 1 : q);
  };
  std::vector<uint8_t> attract_k(K);
  for (int64_t k = 0; k < K; ++k)
    attract_k[k] =
        (std::abs(offsets[k * 3]) + std::abs(offsets[k * 3 + 1]) +
         std::abs(offsets[k * 3 + 2])) == 1;
  auto for_each_edge = [&](auto&& fn) {
    for (int64_t k = 0; k < K; ++k) {
      const int oz = offsets[k * 3], oy = offsets[k * 3 + 1], ox = offsets[k * 3 + 2];
      for (int64_t z = 0; z < Z; ++z) {
        const int64_t zz = z - oz;
        if (zz < 0 || zz >= Z) continue;
        const int64_t y0 = std::max<int64_t>(0, oy), y1 = std::min(Y, Y + oy);
        const int64_t x0 = std::max<int64_t>(0, ox), x1 = std::min(X, X + ox);
        for (int64_t y = y0; y < y1; ++y)
          for (int64_t x = x0; x < x1; ++x)
            fn(k, idx3(z, y, x, Y, X));
      }
    }
  };
  std::vector<int64_t> hist(NBQ + 1, 0);
  for_each_edge([&](int64_t k, int64_t i) {
    ++hist[qkey(edge_weight(k, i, attract_k[k])) + 1];
  });
  for (int b = 0; b < NBQ; ++b) hist[b + 1] += hist[b];
  std::vector<int64_t> order(hist[NBQ]);
  {
    std::vector<int64_t> cursor(hist.begin(), hist.end() - 1);
    for_each_edge([&](int64_t k, int64_t i) {
      order[cursor[qkey(edge_weight(k, i, attract_k[k]))]++] = k * n + i;
    });
  }
  UnionFind uf(n);
  // mutex sets per root: store as adjacency of forbidden root pairs
  std::unordered_map<uint64_t, uint8_t> mutex;
  mutex.reserve(order.size() / 8);
  auto mkey = [](uint32_t a, uint32_t b) {
    if (a > b) std::swap(a, b);
    return ((uint64_t)a << 32) | b;
  };
  std::unordered_map<uint32_t, std::vector<uint32_t>> mutex_adj;
  auto is_mutex = [&](uint32_t ra, uint32_t rb) {
    return mutex.count(mkey(ra, rb)) > 0;
  };
  auto add_mutex = [&](uint32_t ra, uint32_t rb) {
    mutex[mkey(ra, rb)] = 1;
    mutex_adj[ra].push_back(rb);
    mutex_adj[rb].push_back(ra);
  };
  for (int64_t id : order) {
    const int64_t k = id / n, i = id % n;
    const int64_t z = i / (Y * X), y = (i / X) % Y, x = i % X;
    const int64_t j = idx3(z - offsets[k * 3], y - offsets[k * 3 + 1],
                           x - offsets[k * 3 + 2], Y, X);
    const bool attractive = attract_k[k];
    uint32_t ra = uf.find((uint32_t)i), rb = uf.find((uint32_t)j);
    if (ra == rb) continue;
    if (attractive) {
      if (is_mutex(ra, rb)) continue;
      uf.unite(ra, rb);
      uint32_t keep = uf.find(ra);
      uint32_t gone = (keep == ra) ? rb : ra;
      // migrate mutex constraints
      auto it = mutex_adj.find(gone);
      if (it != mutex_adj.end()) {
        for (uint32_t other : it->second) {
          mutex.erase(mkey(gone, other));
          if (uf.find(other) != keep) add_mutex(keep, uf.find(other));
        }
        mutex_adj.erase(gone);
      }
    } else {
      if (!is_mutex(ra, rb)) add_mutex(ra, rb);
    }
  }
  std::unordered_map<uint32_t, uint32_t> root2label;
  uint32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint32_t r = uf.find((uint32_t)i);
    auto it = root2label.find(r);
    if (it == root2label.end()) { root2label.emplace(r, ++next); out[i] = next; }
    else out[i] = it->second;
  }
  return (int64_t)next;
}

// Binary morphology: 6-connected erosion/dilation, `iters` iterations.
void binary_morph(const uint8_t* in, int64_t Z, int64_t Y, int64_t X,
                  int iters, int dilate, uint8_t* out) {
  const int64_t n = Z * Y * X;
  std::vector<uint8_t> cur(in, in + n), nxt(n);
  const int dz[6] = {-1, 1, 0, 0, 0, 0};
  const int dy[6] = {0, 0, -1, 1, 0, 0};
  const int dx[6] = {0, 0, 0, 0, -1, 1};
  for (int it = 0; it < iters; ++it) {
    for (int64_t z = 0; z < Z; ++z)
      for (int64_t y = 0; y < Y; ++y)
        for (int64_t x = 0; x < X; ++x) {
          const int64_t i = idx3(z, y, x, Y, X);
          uint8_t v = cur[i];
          for (int d = 0; d < 6; ++d) {
            int64_t zz = z + dz[d], yy = y + dy[d], xx = x + dx[d];
            uint8_t nb = (zz < 0 || zz >= Z || yy < 0 || yy >= Y || xx < 0 || xx >= X)
                             ? 0
                             : cur[idx3(zz, yy, xx, Y, X)];
            if (dilate) v = std::max(v, nb);
            else v = std::min(v, nb);
          }
          nxt[i] = v;
        }
    cur.swap(nxt);
  }
  std::memcpy(out, cur.data(), n);
}

// Multi-label euclidean distance transform (seung-lab `edt` equivalent):
// per-voxel distance to the nearest voxel of a DIFFERENT label. Felzenszwalb
// 1-D lower-envelope passes per axis; label changes insert zero-parabola
// "walls" at the run boundaries (positions -1 / m). Volume edges are open
// (black_border=false semantics, matching scipy on interior instances).
void edt_multilabel(const uint32_t* labels, int64_t Z, int64_t Y, int64_t X,
                    float az, float ay, float ax, float* out) {
  const int64_t n = Z * Y * X;
  const float INF = 1e20f;
  std::vector<float> d(n);
  for (int64_t i = 0; i < n; ++i) d[i] = labels[i] ? INF : 0.0f;

  // Per-thread scratch for the 1-D envelope passes: rows are independent,
  // so axis passes parallelize across std::thread workers (the seung-lab
  // `edt` package is threaded the same way).
  struct Scratch {
    std::vector<float> gbuf, posbuf, zenv;
    std::vector<int> v;
  };

  // One 1-D envelope over positions [0, m) with optional walls at -1 / m.
  // g: squared values at integer positions (data term); spacing scales
  // geometric distance. Results written back via setter.
  auto envelope = [INF](Scratch& sc, int64_t m, bool wall_lo, bool wall_hi,
                        float spacing, auto get, auto set) {
    auto& gbuf = sc.gbuf;
    auto& posbuf = sc.posbuf;
    auto& zenv = sc.zenv;
    auto& v = sc.v;
    const int64_t total = m + (wall_lo ? 1 : 0) + (wall_hi ? 1 : 0);
    gbuf.resize(total);
    posbuf.resize(total);
    int64_t t = 0;
    if (wall_lo) { gbuf[t] = 0.0f; posbuf[t] = -1.0f; ++t; }
    for (int64_t p = 0; p < m; ++p) { gbuf[t] = get(p); posbuf[t] = (float)p; ++t; }
    if (wall_hi) { gbuf[t] = 0.0f; posbuf[t] = (float)m; ++t; }
    v.resize(total);
    zenv.resize(total + 1);
    int k = 0;
    v[0] = 0;
    zenv[0] = -INF;
    zenv[1] = INF;
    const float s2 = spacing * spacing;
    for (int64_t q = 1; q < total; ++q) {
      if (gbuf[q] >= INF) continue;  // skip infinite parabolas
      float fq = gbuf[q], xq = posbuf[q];
      float s;
      while (true) {
        int p = v[k];
        float fp = gbuf[p], xp = posbuf[p];
        s = ((fq + xq * xq * s2) - (fp + xp * xp * s2)) / (2.0f * s2 * (xq - xp));
        if (s <= zenv[k]) {
          if (k == 0) { v[0] = (int)q; zenv[0] = -INF; zenv[1] = INF; s = -INF; break; }
          --k;
        } else break;
      }
      if (s == -INF) continue;
      ++k;
      v[k] = (int)q;
      zenv[k] = s;
      zenv[k + 1] = INF;
    }
    k = 0;
    for (int64_t p = 0; p < m; ++p) {
      while (zenv[k + 1] < (float)p) ++k;
      float diff = ((float)p - posbuf[v[k]]) * spacing;
      set(p, gbuf[v[k]] + diff * diff);
    }
  };

  auto axis_pass = [&](int64_t len, int64_t count, auto index_of, float spacing) {
    auto rows = [&](int64_t c0, int64_t c1) {
      Scratch sc;
      for (int64_t c = c0; c < c1; ++c) {
        int64_t start = 0;
        while (start < len) {
          uint32_t lab = labels[index_of(c, start)];
          int64_t end = start;
          while (end < len && labels[index_of(c, end)] == lab) ++end;
          if (lab != 0) {
            const int64_t m = end - start;
            bool wall_lo = (start > 0);   // different label before the run
            bool wall_hi = (end < len);   // different label after the run
            envelope(
                sc, m, wall_lo, wall_hi, spacing,
                [&](int64_t p) { return d[index_of(c, start + p)]; },
                [&](int64_t p, float val) { d[index_of(c, start + p)] = val; });
          }
          start = end;
        }
      }
    };
    const int64_t hw = (int64_t)std::thread::hardware_concurrency();
    const int64_t nt = std::max<int64_t>(1, std::min<int64_t>({hw, count, 8}));
    if (nt == 1) {
      rows(0, count);
      return;
    }
    std::vector<std::thread> pool;
    const int64_t step = (count + nt - 1) / nt;
    for (int64_t t = 0; t < nt; ++t)
      pool.emplace_back(rows, t * step, std::min(count, (t + 1) * step));
    for (auto& th : pool) th.join();
  };

  // x, then y, then z (order is arbitrary for correctness)
  axis_pass(X, Z * Y, [&](int64_t c, int64_t p) { return c * X + p; }, ax);
  axis_pass(Y, Z * X,
            [&](int64_t c, int64_t p) {
              int64_t z = c / X, x = c % X;
              return (z * Y + p) * X + x;
            },
            ay);
  axis_pass(Z, Y * X, [&](int64_t c, int64_t p) { return p * Y * X + c; }, az);

  for (int64_t i = 0; i < n; ++i)
    out[i] = labels[i] ? std::sqrt(d[i]) : 0.0f;
}


// Constrained MALIS edge weights (Turaga/Funke): Kruskal maximin counting.
// For each cardinal affinity edge, counts the voxel pairs whose maximin path
// runs through it: pos_counts = same-GT-segment pairs (computed on the
// positive-constrained graph min(aff, gt)), neg_counts = different-segment
// pairs (negative pass max(aff, gt)). The caller applies the constrained
// affinities itself and calls this twice with `count_pos` toggled.
// aff: [3][z][y][x] channel order x,y,z (high-end convention);
// seg: GT labels; out: per-edge pair counts (same layout as aff).
void malis_counts(const float* aff, const uint32_t* seg, int64_t Z, int64_t Y,
                  int64_t X, int count_pos, float* out) {
  const int64_t n = Z * Y * X;
  // Edges ordered by a 16-bit counting sort over packed ids (id = the
  // per-edge output index c*n + i) instead of sorting 24-byte structs —
  // the dominant cost at training-crop sizes. Affinities here are
  // constrained to [0, 1] (min/max against 0/1 GT edges); quantization at
  // 1/65535 is far below network-output noise, and within-bucket order is
  // generation order (the float sort's equal-key order was likewise
  // unspecified).
  constexpr int NBQ = 1 << 16;
  const int64_t strides[3] = {1, X, Y * X};
  auto for_each_edge = [&](auto&& fn) {
    for (int64_t c = 0; c < 3; ++c) {
      const float* a = aff + c * n;
      for (int64_t z = 0; z < Z; ++z)
        for (int64_t y = 0; y < Y; ++y)
          for (int64_t x = 0; x < X; ++x) {
            const int64_t coord = c == 0 ? x : (c == 1 ? y : z);
            if (coord == 0) continue;
            const int64_t i = idx3(z, y, x, Y, X);
            fn(c, i, a[i]);
          }
    }
  };
  auto qkey = [&](float w) {
    int q = (int)((1.0f - w) * (NBQ - 1));  // descending: strong edges first
    return q < 0 ? 0 : (q >= NBQ ? NBQ - 1 : q);
  };
  std::vector<int64_t> histq(NBQ + 1, 0);
  for_each_edge([&](int64_t, int64_t, float w) { ++histq[qkey(w) + 1]; });
  for (int b = 0; b < NBQ; ++b) histq[b + 1] += histq[b];
  std::vector<int64_t> order(histq[NBQ]);
  {
    std::vector<int64_t> cursor(histq.begin(), histq.end() - 1);
    for_each_edge([&](int64_t c, int64_t i, float w) {
      order[cursor[qkey(w)]++] = c * n + i;
    });
  }
  UnionFind uf(n);
  // per-root histogram of GT labels (small-to-large merging)
  std::vector<std::unordered_map<uint32_t, int64_t>*> hist(n, nullptr);
  auto get_hist = [&](uint32_t root) -> std::unordered_map<uint32_t, int64_t>* {
    if (!hist[root]) {
      hist[root] = new std::unordered_map<uint32_t, int64_t>();
      (*hist[root])[seg[root]] = 1;
    }
    return hist[root];
  };
  std::memset(out, 0, 3 * n * sizeof(float));
  for (int64_t id : order) {
    const int64_t c = id / n, i = id % n;
    const int64_t j = i - strides[c];
    uint32_t ra = uf.find((uint32_t)i), rb = uf.find((uint32_t)j);
    if (ra == rb) continue;
    auto* ha = get_hist(ra);
    auto* hb = get_hist(rb);
    // count pairs across the two components
    double pairs = 0.0;
    if (count_pos) {
      for (auto& kv : *ha) {
        if (kv.first == 0) continue;
        auto it = hb->find(kv.first);
        if (it != hb->end()) pairs += (double)kv.second * it->second;
      }
    } else {
      int64_t ta = 0, tb = 0;
      for (auto& kv : *ha) if (kv.first) ta += kv.second;
      for (auto& kv : *hb) if (kv.first) tb += kv.second;
      double same = 0.0;
      for (auto& kv : *ha) {
        if (kv.first == 0) continue;
        auto it = hb->find(kv.first);
        if (it != hb->end()) same += (double)kv.second * it->second;
      }
      pairs = (double)ta * tb - same;
    }
    out[id] = (float)pairs;
    // merge histograms small-to-large, then keep exactly one map alive
    uf.unite(ra, rb);
    uint32_t keep = uf.find(ra);
    auto* hk = ha;
    auto* hg = hb;
    if (hg->size() > hk->size()) std::swap(hk, hg);
    for (auto& kv : *hg) (*hk)[kv.first] += kv.second;
    delete hg;
    hist[ra] = nullptr;
    hist[rb] = nullptr;
    hist[keep] = hk;
  }
  for (auto* h : hist) delete h;
}

// TEASAR skeletonization (Sato et al. 2000; kimimaro-style parameters) of a
// single binary instance mask.
//
// Algorithm: multi-source Dijkstra over the 26-connected foreground graph
// with boundary-penalized edge weights
//   w(u, v) = dist(u, v) * (1 + penalty_scale * (1 - DBF(v)/maxDBF)^16)
// Starting from the root (the geodesic-farthest voxel from an arbitrary
// seed), repeatedly: find the farthest non-invalidated voxel, trace the
// shortest path back to the existing skeleton, append it, and invalidate
// every voxel within `scale * DBF(p) + const_r` (anisotropy-scaled) of each
// path node (the TEASAR rolling ball). Stops when everything is invalidated
// or max_paths is reached.
//
// mask: [z][y][x] uint8; dbf: anisotropy-aware distance-to-boundary
// (computed host-side); nodes_out: (node_cap, 3) doubles (z, y, x);
// edges_out: (edge_cap, 2) int64. Returns node count (or -1 on overflow).
int64_t teasar_skeleton(const uint8_t* mask, const float* dbf, int64_t Z,
                        int64_t Y, int64_t X, double az, double ay, double ax,
                        double scale, double const_r, double penalty_scale,
                        int64_t max_paths, double* nodes_out,
                        int64_t* edges_out, int64_t node_cap,
                        int64_t edge_cap, int64_t* n_edges_out) {
  const int64_t n = Z * Y * X;
  *n_edges_out = 0;
  float max_dbf = 0.f;
  int64_t first = -1;
  for (int64_t i = 0; i < n; ++i)
    if (mask[i]) {
      if (first < 0) first = i;
      max_dbf = std::max(max_dbf, dbf[i]);
    }
  if (first < 0) return 0;
  if (max_dbf <= 0.f) max_dbf = 1.f;

  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> dist(n, INF);
  std::vector<int64_t> parent(n, -1);
  std::vector<uint8_t> state(n, 0);  // 0 free, 1 invalidated, 2 skeleton
  std::vector<int64_t> node_id(n, -1);

  // 26-neighborhood with anisotropic step lengths
  struct Step { int dz, dy, dx; double len; };
  std::vector<Step> steps;
  for (int dz = -1; dz <= 1; ++dz)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dx = -1; dx <= 1; ++dx) {
        if (!dz && !dy && !dx) continue;
        steps.push_back({dz, dy, dx,
                         std::sqrt(dz * az * dz * az + dy * ay * dy * ay +
                                   dx * ax * dx * ax)});
      }
  auto penalty = [&](int64_t v) {
    double r = 1.0 - (double)dbf[v] / max_dbf;
    double p = r * r;      // r^2
    p = p * p;             // r^4
    p = p * p;             // r^8
    p = p * p;             // r^16
    return 1.0 + penalty_scale * p;
  };
  using QE = std::pair<double, int64_t>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;

  auto dijkstra = [&](const std::vector<int64_t>& sources) {
    std::fill(dist.begin(), dist.end(), INF);
    std::fill(parent.begin(), parent.end(), -1);
    while (!pq.empty()) pq.pop();
    for (int64_t s : sources) {
      dist[s] = 0.0;
      pq.emplace(0.0, s);
    }
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      if (d > dist[u]) continue;
      const int64_t uz = u / (Y * X), uy = (u / X) % Y, ux = u % X;
      for (const auto& st : steps) {
        const int64_t vz = uz + st.dz, vy = uy + st.dy, vx = ux + st.dx;
        if (vz < 0 || vz >= Z || vy < 0 || vy >= Y || vx < 0 || vx >= X)
          continue;
        const int64_t v = idx3(vz, vy, vx, Y, X);
        if (!mask[v]) continue;
        const double nd = d + st.len * penalty(v);
        if (nd < dist[v]) {
          dist[v] = nd;
          parent[v] = u;
          pq.emplace(nd, v);
        }
      }
    }
  };

  auto farthest_free = [&]() {
    int64_t best = -1;
    double bd = -1.0;
    for (int64_t i = 0; i < n; ++i)
      if (mask[i] && state[i] == 0 && dist[i] < INF && dist[i] > bd) {
        bd = dist[i];
        best = i;
      }
    return best;
  };

  // root: geodesic-farthest voxel from an arbitrary seed
  dijkstra({first});
  int64_t root = farthest_free();
  if (root < 0) root = first;

  int64_t n_nodes = 0, n_edges = 0;
  auto add_node = [&](int64_t v) -> int64_t {
    if (node_id[v] >= 0) return node_id[v];
    if (n_nodes >= node_cap) return -1;
    nodes_out[n_nodes * 3 + 0] = (double)(v / (Y * X));
    nodes_out[n_nodes * 3 + 1] = (double)((v / X) % Y);
    nodes_out[n_nodes * 3 + 2] = (double)(v % X);
    node_id[v] = n_nodes;
    return n_nodes++;
  };

  auto invalidate_around = [&](int64_t v) {
    const double r = scale * (double)dbf[v] + const_r;
    const int64_t vz = v / (Y * X), vy = (v / X) % Y, vx = v % X;
    const int64_t rz = (int64_t)std::ceil(r / std::max(az, 1e-9));
    const int64_t ry = (int64_t)std::ceil(r / std::max(ay, 1e-9));
    const int64_t rx = (int64_t)std::ceil(r / std::max(ax, 1e-9));
    for (int64_t z = std::max<int64_t>(0, vz - rz); z <= std::min(Z - 1, vz + rz); ++z)
      for (int64_t y = std::max<int64_t>(0, vy - ry); y <= std::min(Y - 1, vy + ry); ++y)
        for (int64_t x = std::max<int64_t>(0, vx - rx); x <= std::min(X - 1, vx + rx); ++x) {
          const double dz = (z - vz) * az, dy = (y - vy) * ay, dx = (x - vx) * ax;
          if (dz * dz + dy * dy + dx * dx > r * r) continue;
          const int64_t i = idx3(z, y, x, Y, X);
          if (mask[i] && state[i] == 0) state[i] = 1;
        }
  };

  state[root] = 2;
  if (add_node(root) < 0) return -1;
  invalidate_around(root);
  std::vector<int64_t> skeleton_voxels{root};

  for (int64_t path = 0; path < max_paths; ++path) {
    dijkstra(skeleton_voxels);
    int64_t target = farthest_free();
    if (target < 0) break;
    // trace back to the existing skeleton, collecting the branch
    std::vector<int64_t> branch;
    for (int64_t v = target; v >= 0 && state[v] != 2; v = parent[v])
      branch.push_back(v);
    // connection voxel (first skeleton voxel on the path, if any)
    int64_t attach = branch.empty() ? root : parent[branch.back()];
    std::reverse(branch.begin(), branch.end());
    int64_t prev_id = attach >= 0 ? node_id[attach] : node_id[root];
    for (int64_t v : branch) {
      const int64_t nid = add_node(v);
      if (nid < 0) return -1;
      if (prev_id >= 0 && prev_id != nid) {
        if (n_edges >= edge_cap) return -1;
        edges_out[n_edges * 2 + 0] = prev_id;
        edges_out[n_edges * 2 + 1] = nid;
        ++n_edges;
      }
      prev_id = nid;
      state[v] = 2;
      skeleton_voxels.push_back(v);
      invalidate_around(v);
    }
  }
  *n_edges_out = n_edges;
  return n_nodes;
}

}  // extern "C"
