// Native LBVH builder (Karras 2012 binary-radix hierarchy).
//
// The runtime around the TPU compute path is native where the reference's
// is (the reference builds its BVH in Rust, src/accelerators/bvh.rs:153):
// the vectorized numpy build takes ~190s at 4.3M primitives; this C++
// builder does the same construction in seconds.  Exposed through ctypes
// (see rs_pbrt_tpu/ops/bvh_native.py); emits the same flat SoA node arrays
// the traversal kernels consume.
//
// Build: make -C native  (g++ -O3 -shared -fPIC [-fopenmp])

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

inline uint32_t expand_bits_10(uint32_t v) {
  v = (v | (v << 16)) & 0x030000FFu;
  v = (v | (v << 8)) & 0x0300F00Fu;
  v = (v | (v << 4)) & 0x030C30C3u;
  v = (v | (v << 2)) & 0x09249249u;
  return v;
}

inline uint32_t morton3(uint32_t x, uint32_t y, uint32_t z) {
  return (expand_bits_10(x) << 2) | (expand_bits_10(y) << 1) | expand_bits_10(z);
}

inline int clz64(uint64_t x) { return x ? __builtin_clzll(x) : 64; }

struct Builder {
  int n;
  std::vector<uint64_t> keys;   // sorted (morton << 32 | index)
  std::vector<int> prim_ids;    // sorted order
  const float* bmin;
  const float* bmax;

  inline int delta(int i, int j) const {
    if (j < 0 || j >= n) return -1;
    return clz64(keys[i] ^ keys[j]);
  }
};

}  // namespace

extern "C" int lbvh_build(const float* bmin, const float* bmax, int n,
                          int* child_l, int* child_r, float* bmin_l,
                          float* bmax_l, float* bmin_r, float* bmax_r,
                          int* prim_ids_out) {
  if (n < 1) return -1;
  if (n == 1) {
    child_l[0] = ~0;
    child_r[0] = ~0;
    for (int c = 0; c < 3; ++c) {
      bmin_l[c] = bmin_r[c] = bmin[c];
      bmax_l[c] = bmax_r[c] = bmax[c];
    }
    prim_ids_out[0] = 0;
    return 0;
  }

  // ---- morton keys over centroid bounds ----
  float clo[3] = {1e30f, 1e30f, 1e30f}, chi[3] = {-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < n; ++i) {
    for (int c = 0; c < 3; ++c) {
      float v = 0.5f * (bmin[i * 3 + c] + bmax[i * 3 + c]);
      if (v < clo[c]) clo[c] = v;
      if (v > chi[c]) chi[c] = v;
    }
  }
  float inv[3];
  for (int c = 0; c < 3; ++c) {
    float ext = chi[c] - clo[c];
    inv[c] = ext > 1e-12f ? 1023.0f / ext : 0.0f;
  }

  Builder B;
  B.n = n;
  B.bmin = bmin;
  B.bmax = bmax;
  B.keys.resize(n);
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    uint32_t q[3];
    for (int c = 0; c < 3; ++c) {
      float v = (0.5f * (bmin[i * 3 + c] + bmax[i * 3 + c]) - clo[c]) * inv[c];
      int iv = (int)v;
      q[c] = (uint32_t)(iv < 0 ? 0 : (iv > 1023 ? 1023 : iv));
    }
    B.keys[i] = ((uint64_t)morton3(q[0], q[1], q[2]) << 32) | (uint32_t)i;
  }
  std::sort(B.keys.begin(), B.keys.end());
  B.prim_ids.resize(n);
#pragma omp parallel for
  for (int i = 0; i < n; ++i) {
    B.prim_ids[i] = (int)(B.keys[i] & 0xFFFFFFFFu);
    prim_ids_out[i] = B.prim_ids[i];
  }

  // ---- Karras hierarchy: ranges + splits ----
  std::vector<int> lo(n - 1), hi(n - 1);
  std::vector<int> parent(2 * n - 1, -1);  // internal 0..n-2, leaves n-1..2n-2
#pragma omp parallel for
  for (int i = 0; i < n - 1; ++i) {
    int d = (B.delta(i, i + 1) - B.delta(i, i - 1)) > 0 ? 1 : -1;
    int dmin = B.delta(i, i - d);
    int lmax = 2;
    while (B.delta(i, i + lmax * d) > dmin) lmax <<= 1;
    int l = 0;
    for (int t = lmax >> 1; t >= 1; t >>= 1)
      if (B.delta(i, i + (l + t) * d) > dmin) l += t;
    int j = i + l * d;
    int dnode = B.delta(i, j);
    int s = 0;
    for (int div = 2, t = (l + div - 1) / div;; div <<= 1, t = (l + div - 1) / div) {
      if (t < 1) t = 1;
      if (B.delta(i, i + (s + t) * d) > dnode) s += t;
      if (t == 1) break;
    }
    int gamma = i + s * d + (d < 0 ? -1 : 0);
    int a = i < j ? i : j;
    int b = i > j ? i : j;
    lo[i] = a;
    hi[i] = b;
    int cl = (a == gamma) ? ~gamma : gamma;          // leaf encoded as ~idx
    int cr = (b == gamma + 1) ? ~(gamma + 1) : gamma + 1;
    child_l[i] = cl;
    child_r[i] = cr;
    parent[cl < 0 ? (n - 1) + ~cl : cl] = i;
    parent[cr < 0 ? (n - 1) + ~cr : cr] = i;
  }

  // ---- bottom-up AABBs with visit counters ----
  std::vector<float> nb_min(3 * (n - 1), 1e30f), nb_max(3 * (n - 1), -1e30f);
  std::vector<int> visits(n - 1, 0);
  // sequential bottom-up (2-core host; the sort dominates anyway)
  for (int leaf = 0; leaf < n; ++leaf) {
    int prim = B.prim_ids[leaf];
    float lmin[3], lmax2[3];
    for (int c = 0; c < 3; ++c) {
      lmin[c] = bmin[prim * 3 + c];
      lmax2[c] = bmax[prim * 3 + c];
    }
    int node = parent[(n - 1) + leaf];
    bool is_leaf_child = true;
    int child_id = ~leaf;
    while (node >= 0) {
      int arrived = ++visits[node];
      // merge this subtree's bounds into the node
      for (int c = 0; c < 3; ++c) {
        if (lmin[c] < nb_min[node * 3 + c]) nb_min[node * 3 + c] = lmin[c];
        if (lmax2[c] > nb_max[node * 3 + c]) nb_max[node * 3 + c] = lmax2[c];
      }
      if (arrived < 2) break;  // second child will finish this node
      for (int c = 0; c < 3; ++c) {
        lmin[c] = nb_min[node * 3 + c];
        lmax2[c] = nb_max[node * 3 + c];
      }
      child_id = node;
      node = parent[node];
      (void)is_leaf_child;
    }
  }

  // ---- per-child bounds arrays (traversal layout) ----
#pragma omp parallel for
  for (int i = 0; i < n - 1; ++i) {
    int cl = child_l[i], cr = child_r[i];
    for (int c = 0; c < 3; ++c) {
      if (cl < 0) {
        int prim = B.prim_ids[~cl];
        bmin_l[i * 3 + c] = bmin[prim * 3 + c];
        bmax_l[i * 3 + c] = bmax[prim * 3 + c];
      } else {
        bmin_l[i * 3 + c] = nb_min[cl * 3 + c];
        bmax_l[i * 3 + c] = nb_max[cl * 3 + c];
      }
      if (cr < 0) {
        int prim = B.prim_ids[~cr];
        bmin_r[i * 3 + c] = bmin[prim * 3 + c];
        bmax_r[i * 3 + c] = bmax[prim * 3 + c];
      } else {
        bmin_r[i * 3 + c] = nb_min[cr * 3 + c];
        bmax_r[i * 3 + c] = nb_max[cr * 3 + c];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Binned SAH builder (reference src/accelerators/bvh.rs recursive_build
// :178-357: SAH, 12 buckets).  Same output interface as lbvh_build: binary
// tree with single-primitive leaves (exactly n-1 internal nodes), child
// refs encode leaves as ~position-in-leaf-order, prim_ids_out maps leaf
// position -> original primitive.  Morton-LBVH trees measure ~3x more
// traversal visits per ray than SAH on mixed-scale scenes; the reference
// uses SAH by default (api.rs:528), so we do too.
// ---------------------------------------------------------------------------

namespace {

struct SahNode {
  float bmin[3], bmax[3];
};

struct SahBuilder {
  int n;
  const float* bmin;
  const float* bmax;
  std::vector<float> cent;     // (n,3) centroids
  std::vector<int> perm;       // primitive permutation (leaf order)
  int* child_l;
  int* child_r;
  float* bmin_l;
  float* bmax_l;
  float* bmin_r;
  float* bmax_r;
  int next_node = 0;

  void prim_bounds(int prim, float* mn, float* mx) const {
    for (int c = 0; c < 3; ++c) {
      mn[c] = bmin[prim * 3 + c];
      mx[c] = bmax[prim * 3 + c];
    }
  }

  // build over perm[lo..hi) -> returns child ref (internal id or ~leafpos)
  int build(int lo, int hi, float* out_min, float* out_max) {
    // bounds of range
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    float cmn[3] = {1e30f, 1e30f, 1e30f}, cmx[3] = {-1e30f, -1e30f, -1e30f};
    for (int i = lo; i < hi; ++i) {
      int p = perm[i];
      for (int c = 0; c < 3; ++c) {
        float a = bmin[p * 3 + c], b = bmax[p * 3 + c], ce = cent[p * 3 + c];
        if (a < mn[c]) mn[c] = a;
        if (b > mx[c]) mx[c] = b;
        if (ce < cmn[c]) cmn[c] = ce;
        if (ce > cmx[c]) cmx[c] = ce;
      }
    }
    for (int c = 0; c < 3; ++c) {
      out_min[c] = mn[c];
      out_max[c] = mx[c];
    }
    if (hi - lo == 1) return ~lo;  // leaf at position lo

    // split axis = max centroid extent
    int axis = 0;
    float ext[3];
    for (int c = 0; c < 3; ++c) ext[c] = cmx[c] - cmn[c];
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;

    int mid;
    if (ext[axis] <= 1e-12f) {
      mid = (lo + hi) / 2;  // equal-counts fallback (degenerate centroids)
    } else if (hi - lo <= 4) {
      // tiny ranges: median split on the axis
      mid = (lo + hi) / 2;
      std::nth_element(perm.begin() + lo, perm.begin() + mid,
                       perm.begin() + hi, [&](int a, int b) {
                         return cent[a * 3 + axis] < cent[b * 3 + axis];
                       });
    } else {
      // 12-bucket binned SAH (bvh.rs:249 n_buckets = 12)
      constexpr int NB = 12;
      int cnt[NB] = {0};
      float bmn[NB][3], bmx[NB][3];
      for (int b = 0; b < NB; ++b)
        for (int c = 0; c < 3; ++c) {
          bmn[b][c] = 1e30f;
          bmx[b][c] = -1e30f;
        }
      float inv = NB / ext[axis];
      for (int i = lo; i < hi; ++i) {
        int p = perm[i];
        int b = (int)((cent[p * 3 + axis] - cmn[axis]) * inv);
        if (b < 0) b = 0;
        if (b >= NB) b = NB - 1;
        ++cnt[b];
        for (int c = 0; c < 3; ++c) {
          float a = bmin[p * 3 + c], q = bmax[p * 3 + c];
          if (a < bmn[b][c]) bmn[b][c] = a;
          if (q > bmx[b][c]) bmx[b][c] = q;
        }
      }
      auto area = [](const float* a, const float* b) {
        float d0 = b[0] - a[0], d1 = b[1] - a[1], d2 = b[2] - a[2];
        return 2.0f * (d0 * d1 + d0 * d2 + d1 * d2);
      };
      // sweep: cost(i) = left of bucket i+1 vs right
      float lmn[NB][3], lmx[NB][3], rmn[NB][3], rmx[NB][3];
      int lcnt[NB], rcnt[NB];
      float curmn[3] = {1e30f, 1e30f, 1e30f}, curmx[3] = {-1e30f, -1e30f, -1e30f};
      int curc = 0;
      for (int b = 0; b < NB; ++b) {
        curc += cnt[b];
        for (int c = 0; c < 3; ++c) {
          if (bmn[b][c] < curmn[c]) curmn[c] = bmn[b][c];
          if (bmx[b][c] > curmx[c]) curmx[c] = bmx[b][c];
          lmn[b][c] = curmn[c];
          lmx[b][c] = curmx[c];
        }
        lcnt[b] = curc;
      }
      for (int c = 0; c < 3; ++c) {
        curmn[c] = 1e30f;
        curmx[c] = -1e30f;
      }
      curc = 0;
      for (int b = NB - 1; b >= 0; --b) {
        curc += cnt[b];
        for (int c = 0; c < 3; ++c) {
          if (bmn[b][c] < curmn[c]) curmn[c] = bmn[b][c];
          if (bmx[b][c] > curmx[c]) curmx[c] = bmx[b][c];
          rmn[b][c] = curmn[c];
          rmx[b][c] = curmx[c];
        }
        rcnt[b] = curc;
      }
      int best = -1;
      float best_cost = 1e30f;
      for (int b = 0; b < NB - 1; ++b) {
        if (!lcnt[b] || !rcnt[b + 1]) continue;
        float cost = lcnt[b] * area(lmn[b], lmx[b]) +
                     rcnt[b + 1] * area(rmn[b + 1], rmx[b + 1]);
        if (cost < best_cost) {
          best_cost = cost;
          best = b;
        }
      }
      if (best < 0) {
        mid = (lo + hi) / 2;
        std::nth_element(perm.begin() + lo, perm.begin() + mid,
                         perm.begin() + hi, [&](int a, int b) {
                           return cent[a * 3 + axis] < cent[b * 3 + axis];
                         });
      } else {
        float split = cmn[axis] + (best + 1) * ext[axis] / NB;
        int* first = perm.data() + lo;
        int* last = perm.data() + hi;
        int* pmid = std::partition(first, last, [&](int p) {
          return cent[p * 3 + axis] < split;
        });
        mid = lo + (int)(pmid - first);
        if (mid == lo || mid == hi) mid = (lo + hi) / 2;
      }
    }

    int node = next_node++;
    float lmn2[3], lmx2[3], rmn2[3], rmx2[3];
    int cl = build(lo, mid, lmn2, lmx2);
    int cr = build(mid, hi, rmn2, rmx2);
    child_l[node] = cl;
    child_r[node] = cr;
    for (int c = 0; c < 3; ++c) {
      bmin_l[node * 3 + c] = lmn2[c];
      bmax_l[node * 3 + c] = lmx2[c];
      bmin_r[node * 3 + c] = rmn2[c];
      bmax_r[node * 3 + c] = rmx2[c];
    }
    return node;
  }
};

}  // namespace

extern "C" int sah_build(const float* bmin, const float* bmax, int n,
                         int* child_l, int* child_r, float* bmin_l,
                         float* bmax_l, float* bmin_r, float* bmax_r,
                         int* prim_ids_out) {
  if (n < 1) return -1;
  if (n == 1) {
    child_l[0] = ~0;
    child_r[0] = ~0;
    for (int c = 0; c < 3; ++c) {
      bmin_l[c] = bmin_r[c] = bmin[c];
      bmax_l[c] = bmax_r[c] = bmax[c];
    }
    prim_ids_out[0] = 0;
    return 0;
  }
  SahBuilder S;
  S.n = n;
  S.bmin = bmin;
  S.bmax = bmax;
  S.cent.resize(3 * n);
  for (int i = 0; i < 3 * n; ++i) S.cent[i] = 0.5f * (bmin[i] + bmax[i]);
  S.perm.resize(n);
  for (int i = 0; i < n; ++i) S.perm[i] = i;
  S.child_l = child_l;
  S.child_r = child_r;
  S.bmin_l = bmin_l;
  S.bmax_l = bmax_l;
  S.bmin_r = bmin_r;
  S.bmax_r = bmax_r;
  float mn[3], mx[3];
  int root = S.build(0, n, mn, mx);
  // allocation is pre-order (node id assigned before recursing children),
  // so the root is id 0 and traversal can start there directly
  if (root != 0 || S.next_node != n - 1) return -2;
  for (int i = 0; i < n; ++i) prim_ids_out[i] = S.perm[i];
  return 0;
}

// ---------------------------------------------------------------------------
// 4-wide collapse: binary tree (child_l/child_r arrays from lbvh_build or
// sah_build) -> unified 64-f32 row array for the TPU wide traversal.
//
// Row layout (64 f32 cols, 256B — ONE gather fetches a whole node or a
// whole 4-triangle leaf; the XLA gather unit is row-rate-bound, so wide
// rows quarter the traversal's gather count vs binary 64B rows):
//   internal: [bmin_x(0:4), bmin_y(4:8), bmin_z(8:12),
//              bmax_x(12:16), bmax_y(16:20), bmax_z(20:24),
//              child_group_base(24), child_count(25), ..., type(63)=0]
//     child i (i < child_count) occupies row base+i.
//   leaf:     [p0s(0:12), p1s(12:24), p2s(24:36) (xyz per tri, tri-major),
//              prim_ids(36:40), tri_count(40), ..., type(63)=1]
//     empty child-box slots get inverted boxes (+inf/-inf: never hit).
// All ids stored as float VALUES (exact < 2^24; row count asserted).
// Children of a node are CONSECUTIVE rows so a traversal stack entry is
// one packed u32: (group_base/1)<<4 | pending-hit mask.
// ---------------------------------------------------------------------------

namespace {

struct Wide4 {
  const int* child_l;
  const int* child_r;
  const float* bmin_l;
  const float* bmax_l;
  const float* bmin_r;
  const float* bmax_r;
  const int* prim_ids;  // leaf position -> original prim
  const float* p0;
  const float* p1;
  const float* p2;  // (T,3) original order
  std::vector<float> rows;
  int n_rows = 0;
  int max_depth = 0;

  int alloc(int k) {
    int base = n_rows;
    n_rows += k;
    rows.resize((size_t)n_rows * 64, 0.0f);
    return base;
  }

  // collect up to 4 "wide children" of binary ref c: returns list of
  // binary refs (internal id or ~leafpos) + their bounds
  void wide_children(int node, int* refs, float* bs, int* count) const {
    // children of binary internal `node` with bounds; expand internal
    // children once more if room (classic BVH2->BVH4 collapse)
    struct Item { int ref; float b[6]; };
    Item stack[8];
    int ns = 0;
    auto child_bounds = [&](int node, bool left, float* b) {
      const float* mn = left ? bmin_l : bmin_r;
      const float* mx = left ? bmax_l : bmax_r;
      for (int c = 0; c < 3; ++c) {
        b[c] = mn[node * 3 + c];
        b[3 + c] = mx[node * 3 + c];
      }
    };
    Item init[2];
    init[0].ref = child_l[node];
    child_bounds(node, true, init[0].b);
    init[1].ref = child_r[node];
    child_bounds(node, false, init[1].b);
    // expand: repeatedly split the internal item with largest area until
    // 4 items or none internal
    Item items[4];
    int ni = 0;
    items[ni++] = init[0];
    items[ni++] = init[1];
    (void)stack;
    (void)ns;
    while (ni < 4) {
      int pick = -1;
      float best_area = -1.0f;
      for (int i = 0; i < ni; ++i) {
        if (items[i].ref < 0) continue;
        float d0 = items[i].b[3] - items[i].b[0];
        float d1 = items[i].b[4] - items[i].b[1];
        float d2 = items[i].b[5] - items[i].b[2];
        float a = d0 * d1 + d0 * d2 + d1 * d2;
        if (a > best_area) {
          best_area = a;
          pick = i;
        }
      }
      if (pick < 0) break;
      int in = items[pick].ref;
      Item l, r;
      l.ref = child_l[in];
      child_bounds(in, true, l.b);
      r.ref = child_r[in];
      child_bounds(in, false, r.b);
      items[pick] = l;
      items[ni++] = r;
    }
    *count = ni;
    for (int i = 0; i < ni; ++i) {
      refs[i] = items[i].ref;
      for (int c = 0; c < 6; ++c) bs[i * 6 + c] = items[i].b[c];
    }
  }

  // gather consecutive leaf positions reachable from ref when it is a
  // small subtree of leaves; we only pack SINGLE leaves (~leafpos) plus
  // merge runs below via subtree flattening when subtree has <= 4 leaves
  // capped count: stops descending once the running total reaches cap,
  // keeping the whole collapse O(n) (an uncapped count would rescan whole
  // subtrees from every level)
  int count_leaves(int ref, int cap = 5) const {
    if (ref < 0) return 1;
    int a = count_leaves(child_l[ref], cap);
    if (a >= cap) return a;
    return a + count_leaves(child_r[ref], cap - a);
  }

  void collect_leaves(int ref, int* out, int* k) const {
    if (ref < 0) {
      out[(*k)++] = ~ref;
      return;
    }
    collect_leaves(child_l[ref], out, k);
    collect_leaves(child_r[ref], out, k);
  }

  void fill_leaf_row(int row, const int* leafpos, int k) {
    float* r = &rows[(size_t)row * 64];
    for (int i = 0; i < 4; ++i) {
      int prim = i < k ? prim_ids[leafpos[i]] : prim_ids[leafpos[0]];
      // duplicate tri 0 into empty slots (idempotent extra test)
      for (int c = 0; c < 3; ++c) {
        r[0 + i * 3 + c] = p0[prim * 3 + c];
        r[12 + i * 3 + c] = p1[prim * 3 + c];
        r[24 + i * 3 + c] = p2[prim * 3 + c];
      }
      r[36 + i] = (float)prim;
    }
    r[40] = (float)k;
    r[63] = 1.0f;
  }

  // emit subtree of binary ref into row `row`; returns nothing
  void emit(int ref, int row, const float* fallback_bounds, int depth) {
    if (depth > max_depth) max_depth = depth;
    // leaf subtree (<= 4 leaves)?
    int nl = count_leaves(ref);
    if (nl <= 4) {
      int leaves[8];
      int k = 0;
      collect_leaves(ref, leaves, &k);
      fill_leaf_row(row, leaves, k);
      return;
    }
    // internal: wide children
    int refs[4];
    float bs[24];
    int count;
    wide_children(ref, refs, bs, &count);
    int base = alloc(count);
    float* r = &rows[(size_t)row * 64];
    for (int i = 0; i < 4; ++i) {
      bool live = i < count;
      r[0 + i] = live ? bs[i * 6 + 0] : 1e30f;
      r[4 + i] = live ? bs[i * 6 + 1] : 1e30f;
      r[8 + i] = live ? bs[i * 6 + 2] : 1e30f;
      r[12 + i] = live ? bs[i * 6 + 3] : -1e30f;
      r[16 + i] = live ? bs[i * 6 + 4] : -1e30f;
      r[20 + i] = live ? bs[i * 6 + 5] : -1e30f;
    }
    r[24] = (float)base;
    r[25] = (float)count;
    r[63] = 0.0f;
    for (int i = 0; i < count; ++i)
      emit(refs[i], base + i, &bs[i * 6], depth + 1);
    (void)fallback_bounds;
  }
};

}  // namespace

// Returns number of rows written (capacity passed in), or -needed if the
// caller's buffer is too small, or 0 on error.  First call with
// rows=nullptr, cap=0 to query the size.  depth_out[0] = max stack depth.
extern "C" long wide4_build(const int* child_l, const int* child_r,
                            const float* bmin_l, const float* bmax_l,
                            const float* bmin_r, const float* bmax_r,
                            const int* prim_ids, const float* p0,
                            const float* p1, const float* p2, int n,
                            float* rows_out, long cap, int* depth_out) {
  if (n < 1) return 0;
  Wide4 W;
  W.child_l = child_l;
  W.child_r = child_r;
  W.bmin_l = bmin_l;
  W.bmax_l = bmax_l;
  W.bmin_r = bmin_r;
  W.bmax_r = bmax_r;
  W.prim_ids = prim_ids;
  W.p0 = p0;
  W.p1 = p1;
  W.p2 = p2;
  if (n == 1) {
    W.alloc(1);
    int leaves[1] = {0};
    W.fill_leaf_row(0, leaves, 1);
  } else {
    // root group: single row 0 emitted from binary root 0
    W.alloc(1);
    W.emit(0, 0, nullptr, 1);
  }
  if (depth_out) *depth_out = W.max_depth;
  if ((long)W.n_rows * 64 > cap) return -((long)W.n_rows);
  std::memcpy(rows_out, W.rows.data(), (size_t)W.n_rows * 64 * sizeof(float));
  return W.n_rows;
}

// ---------------------------------------------------------------------------
// 12-wide collapse with 128-col (512B) rows.
//
// Round-4 chip measurement (tools/tpu_probe8.py): the XLA gather unit
// fetches 512B rows at the SAME ~82M rows/s as 256B rows, and gathers do
// not overlap (no ILP) — so traversal cost is purely row count, and the
// widest row that holds a full child set is the right arity.  12 child
// AABBs (72 cols) or 12 packed triangles (108 cols) fit 128 cols; vs the
// 4-wide tree this cuts interior levels ~1.8x (log2 12 / log2 4) and leaf
// rows ~3x at the same fetch rate.
//
// Row layout (128 f32 cols), discriminated by col 127 (0=internal 1=leaf):
//   internal: bmin_x[0:12] bmin_y[12:24] bmin_z[24:36]
//             bmax_x[36:48] bmax_y[48:60] bmax_z[60:72]
//             child_base[72] count[73]
//   leaf:     p0[0:36] p1[36:72] p2[72:108] prim_id[108:120] count[120]
// Empty internal slots carry inverted boxes (+1e30/-1e30, never hit);
// empty leaf slots duplicate triangle 0 (idempotent extra test).
// ---------------------------------------------------------------------------

namespace {

template <int AA, int LL, int RWW>
struct WideN {
  static constexpr int A = AA;    // arity (child slots per internal row)
  static constexpr int L = LL;    // leaf capacity (triangles per leaf row)
  static constexpr int RW = RWW;  // row width in f32 cols
  const int* child_l;
  const int* child_r;
  const float* bmin_l;
  const float* bmax_l;
  const float* bmin_r;
  const float* bmax_r;
  const int* prim_ids;
  const float* p0;
  const float* p1;
  const float* p2;
  std::vector<float> rows;
  long n_rows = 0;
  int max_depth = 0;

  long alloc(int k) {
    long base = n_rows;
    n_rows += k;
    rows.resize((size_t)n_rows * RW, 0.0f);
    return base;
  }

  void child_bounds(int node, bool left, float* b) const {
    const float* mn = left ? bmin_l : bmin_r;
    const float* mx = left ? bmax_l : bmax_r;
    for (int c = 0; c < 3; ++c) {
      b[c] = mn[node * 3 + c];
      b[3 + c] = mx[node * 3 + c];
    }
  }

  // collapse binary ref `node`'s children into up to A wide children by
  // repeatedly splitting the largest-area internal item (same policy as
  // Wide4::wide_children); an item whose subtree fits a leaf row (<= L
  // leaves) is left unsplit so it packs into ONE leaf row
  void wide_children(int node, int* refs, float* bs, int* count) const {
    struct Item { int ref; float b[6]; };
    Item items[A];
    int ni = 0;
    items[ni].ref = child_l[node];
    child_bounds(node, true, items[ni++].b);
    items[ni].ref = child_r[node];
    child_bounds(node, false, items[ni++].b);
    while (ni < A) {
      int pick = -1;
      float best_area = -1.0f;
      for (int i = 0; i < ni; ++i) {
        if (items[i].ref < 0) continue;
        if (count_leaves(items[i].ref, L + 1) <= L) continue;  // stays a leaf row
        float d0 = items[i].b[3] - items[i].b[0];
        float d1 = items[i].b[4] - items[i].b[1];
        float d2 = items[i].b[5] - items[i].b[2];
        float a = d0 * d1 + d0 * d2 + d1 * d2;
        if (a > best_area) { best_area = a; pick = i; }
      }
      if (pick < 0) break;
      int in = items[pick].ref;
      Item l, r;
      l.ref = child_l[in];
      child_bounds(in, true, l.b);
      r.ref = child_r[in];
      child_bounds(in, false, r.b);
      items[pick] = l;
      items[ni++] = r;
    }
    *count = ni;
    for (int i = 0; i < ni; ++i) {
      refs[i] = items[i].ref;
      for (int c = 0; c < 6; ++c) bs[i * 6 + c] = items[i].b[c];
    }
  }

  int count_leaves(int ref, int cap) const {
    if (ref < 0) return 1;
    int a = count_leaves(child_l[ref], cap);
    if (a >= cap) return a;
    return a + count_leaves(child_r[ref], cap - a);
  }

  void collect_leaves(int ref, int* out, int* k) const {
    if (ref < 0) { out[(*k)++] = ~ref; return; }
    collect_leaves(child_l[ref], out, k);
    collect_leaves(child_r[ref], out, k);
  }

  // leaf rows are SoA BY COMPONENT (p0x[0:12] p0y[12:24] p0z[24:36]
  // p1x[36:48] ... p2z[96:108]): the traversal's watertight test then
  // runs entirely on (lanes, 12) slices of the gathered row — interleaved
  // (x,y,z) triplets forced minor-dim-3 relayouts that cost more than the
  // row gather itself (round-4 chip bisect)
  void fill_leaf_row(long row, const int* leafpos, int k) {
    float* r = &rows[(size_t)row * RW];
    for (int i = 0; i < L; ++i) {
      int prim = i < k ? prim_ids[leafpos[i]] : prim_ids[leafpos[0]];
      for (int c = 0; c < 3; ++c) {
        r[0 + c * L + i] = p0[prim * 3 + c];
        r[3 * L + c * L + i] = p1[prim * 3 + c];
        r[6 * L + c * L + i] = p2[prim * 3 + c];
      }
      r[9 * L + i] = (float)prim;
    }
    r[10 * L] = (float)k;
    r[RW - 1] = 1.0f;
  }

  void emit(int ref, long row, int depth) {
    if (depth > max_depth) max_depth = depth;
    int nl = count_leaves(ref, L + 1);
    if (nl <= L) {
      int leaves[L + 2];
      int k = 0;
      collect_leaves(ref, leaves, &k);
      fill_leaf_row(row, leaves, k);
      return;
    }
    int refs[A];
    float bs[6 * A];
    int count;
    wide_children(ref, refs, bs, &count);
    long base = alloc(count);
    float* r = &rows[(size_t)row * RW];
    for (int i = 0; i < A; ++i) {
      bool live = i < count;
      r[0 * A + i] = live ? bs[i * 6 + 0] : 1e30f;
      r[1 * A + i] = live ? bs[i * 6 + 1] : 1e30f;
      r[2 * A + i] = live ? bs[i * 6 + 2] : 1e30f;
      r[3 * A + i] = live ? bs[i * 6 + 3] : -1e30f;
      r[4 * A + i] = live ? bs[i * 6 + 4] : -1e30f;
      r[5 * A + i] = live ? bs[i * 6 + 5] : -1e30f;
    }
    r[6 * A] = (float)base;
    r[6 * A + 1] = (float)count;
    r[RW - 1] = 0.0f;
    for (int i = 0; i < count; ++i) emit(refs[i], base + i, depth + 1);
  }
};

template <int AA, int LL, int RWW>
long widen_build_impl(const int* child_l, const int* child_r,
                      const float* bmin_l, const float* bmax_l,
                      const float* bmin_r, const float* bmax_r,
                      const int* prim_ids, const float* p0, const float* p1,
                      const float* p2, int n, float* rows_out, long cap,
                      int* depth_out) {
  if (n < 1) return 0;
  WideN<AA, LL, RWW> W;
  W.child_l = child_l;
  W.child_r = child_r;
  W.bmin_l = bmin_l;
  W.bmax_l = bmax_l;
  W.bmin_r = bmin_r;
  W.bmax_r = bmax_r;
  W.prim_ids = prim_ids;
  W.p0 = p0;
  W.p1 = p1;
  W.p2 = p2;
  if (n == 1) {
    W.alloc(1);
    int leaves[1] = {0};
    W.fill_leaf_row(0, leaves, 1);
  } else {
    W.alloc(1);
    W.emit(0, 0, 1);
  }
  if (depth_out) *depth_out = W.max_depth;
  if (W.n_rows * (long)RWW > cap) return -W.n_rows;
  std::memcpy(rows_out, W.rows.data(), (size_t)W.n_rows * RWW * sizeof(float));
  return W.n_rows;
}

}  // namespace

extern "C" long wide12_build(const int* child_l, const int* child_r,
                             const float* bmin_l, const float* bmax_l,
                             const float* bmin_r, const float* bmax_r,
                             const int* prim_ids, const float* p0,
                             const float* p1, const float* p2, int n,
                             float* rows_out, long cap, int* depth_out) {
  return widen_build_impl<12, 12, 128>(child_l, child_r, bmin_l, bmax_l,
                                       bmin_r, bmax_r, prim_ids, p0, p1, p2,
                                       n, rows_out, cap, depth_out);
}

// 24-wide collapse with 256-col (1024B) rows: same layout family as
// wide12 (all offsets are multiples of the arity) — 24 child AABBs use
// cols [0:144], base/count at 144/145; leaves pack 24 triangles
// ([0:216] SoA components, prim ids [216:240], count 240); col 255 is
// the leaf flag.
extern "C" long wide24_build(const int* child_l, const int* child_r,
                             const float* bmin_l, const float* bmax_l,
                             const float* bmin_r, const float* bmax_r,
                             const int* prim_ids, const float* p0,
                             const float* p1, const float* p2, int n,
                             float* rows_out, long cap, int* depth_out) {
  return widen_build_impl<24, 24, 256>(child_l, child_r, bmin_l, bmax_l,
                                       bmin_r, bmax_r, prim_ids, p0, p1, p2,
                                       n, rows_out, cap, depth_out);
}
