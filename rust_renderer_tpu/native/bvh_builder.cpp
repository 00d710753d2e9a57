// Native BVH builder: binned-SAH, emitting the threaded (skip-pointer)
// layout consumed by ops/bvh.py.
//
// This is the TPU framework's analog of the reference's driver-side
// acceleration-structure build (utopian/src/raytracing.rs:113-398 hands BLAS
// construction to the Vulkan driver's native implementation). Host geometry
// processing belongs in native code: a 300k-triangle binned-SAH build runs in
// tens of milliseconds here vs seconds in Python.
//
// Layout contract (must match ops/bvh.py::BVH):
//   nodes in DFS pre-order; internal node's first child is node+1 and
//   node_miss[i] = index just past i's subtree (-1 at the end);
//   node_leaf[i] = -1 for internal nodes, else a row into leaf_tris;
//   leaf rows hold exactly `leaf_size` original triangle ids, -1 padded.
//
// C ABI: see bvh_build_sah below. Compiled with:
//   g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o libbvh_builder.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(Vec3 a, Vec3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(Vec3 a, Vec3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Aabb {
  Vec3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  Vec3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const Aabb& o) {
    lo = vmin(lo, o.lo);
    hi = vmax(hi, o.hi);
  }
  void grow(Vec3 p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  float half_area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }
};

struct BuildContext {
  const float* positions;  // (V, 3)
  const int32_t* indices;  // (T, 3)
  std::vector<Aabb> tri_box;
  std::vector<Vec3> centroid;
  std::vector<int32_t> order;  // permutation being partitioned

  // outputs
  float* node_min;
  float* node_max;
  int32_t* node_miss;
  int32_t* node_leaf;
  int32_t* leaf_tris;
  int32_t leaf_size;
  int32_t num_nodes = 0;
  int32_t num_leaves = 0;
  int32_t max_nodes;
  int32_t max_leaves;
};

constexpr int kBins = 16;

// Emits the subtree over order[start:end); returns index past the subtree.
// Pre-order emission; fills miss pointers on the way out.
static int32_t build_range(BuildContext& ctx, int32_t start, int32_t end,
                           const Aabb& bounds) {
  const int32_t node = ctx.num_nodes++;
  if (node >= ctx.max_nodes) return node;  // capacity guard (callers size 2T)
  ctx.node_min[node * 3 + 0] = bounds.lo.x;
  ctx.node_min[node * 3 + 1] = bounds.lo.y;
  ctx.node_min[node * 3 + 2] = bounds.lo.z;
  ctx.node_max[node * 3 + 0] = bounds.hi.x;
  ctx.node_max[node * 3 + 1] = bounds.hi.y;
  ctx.node_max[node * 3 + 2] = bounds.hi.z;

  const int32_t count = end - start;
  if (count <= ctx.leaf_size) {
    const int32_t row = ctx.num_leaves++;
    ctx.node_leaf[node] = row;
    for (int32_t i = 0; i < ctx.leaf_size; ++i)
      ctx.leaf_tris[row * ctx.leaf_size + i] =
          (i < count) ? ctx.order[start + i] : -1;
    return node + 1;
  }
  ctx.node_leaf[node] = -1;

  // Centroid bounds for binning.
  Aabb cb;
  for (int32_t i = start; i < end; ++i) cb.grow(ctx.centroid[ctx.order[i]]);

  int best_axis = -1;
  int best_bin = -1;
  float best_cost = FLT_MAX;
  Aabb best_left_box, best_right_box;
  int32_t best_left_n = 0;

  for (int axis = 0; axis < 3; ++axis) {
    const float lo = axis == 0 ? cb.lo.x : (axis == 1 ? cb.lo.y : cb.lo.z);
    const float hi = axis == 0 ? cb.hi.x : (axis == 1 ? cb.hi.y : cb.hi.z);
    const float extent = hi - lo;
    if (extent <= 1e-12f) continue;
    const float scale = kBins / extent;

    Aabb bin_box[kBins];
    int32_t bin_n[kBins] = {0};
    for (int32_t i = start; i < end; ++i) {
      const int32_t t = ctx.order[i];
      const Vec3 c = ctx.centroid[t];
      const float v = axis == 0 ? c.x : (axis == 1 ? c.y : c.z);
      int b = (int)((v - lo) * scale);
      b = std::min(std::max(b, 0), kBins - 1);
      bin_box[b].grow(ctx.tri_box[t]);
      bin_n[b]++;
    }

    // Sweep: suffix boxes then prefix scan evaluating SAH at each split.
    Aabb suffix[kBins];
    Aabb acc;
    for (int b = kBins - 1; b >= 0; --b) {
      acc.grow(bin_box[b]);
      suffix[b] = acc;
    }
    Aabb left;
    int32_t left_n = 0;
    for (int b = 0; b < kBins - 1; ++b) {
      left.grow(bin_box[b]);
      left_n += bin_n[b];
      const int32_t right_n = count - left_n;
      if (left_n == 0 || right_n == 0) continue;
      const float cost =
          left.half_area() * left_n + suffix[b + 1].half_area() * right_n;
      if (cost < best_cost) {
        best_cost = cost;
        best_axis = axis;
        best_bin = b;
        best_left_box = left;
        best_right_box = suffix[b + 1];
        best_left_n = left_n;
      }
    }
  }

  int32_t mid;
  Aabb left_box, right_box;
  if (best_axis < 0) {
    // Degenerate centroids: median split in current order.
    mid = start + count / 2;
    for (int32_t i = start; i < mid; ++i) left_box.grow(ctx.tri_box[ctx.order[i]]);
    for (int32_t i = mid; i < end; ++i) right_box.grow(ctx.tri_box[ctx.order[i]]);
  } else {
    const float lo = best_axis == 0 ? cb.lo.x
                                    : (best_axis == 1 ? cb.lo.y : cb.lo.z);
    const float hi = best_axis == 0 ? cb.hi.x
                                    : (best_axis == 1 ? cb.hi.y : cb.hi.z);
    const float scale = kBins / (hi - lo);
    auto bin_of = [&](int32_t t) {
      const Vec3 c = ctx.centroid[t];
      const float v = best_axis == 0 ? c.x : (best_axis == 1 ? c.y : c.z);
      int b = (int)((v - lo) * scale);
      return std::min(std::max(b, 0), kBins - 1);
    };
    int32_t* first = ctx.order.data() + start;
    int32_t* last = ctx.order.data() + end;
    int32_t* split = std::partition(
        first, last, [&](int32_t t) { return bin_of(t) <= best_bin; });
    mid = (int32_t)(split - ctx.order.data());
    if (mid == start || mid == end) mid = start + count / 2;  // safety
    left_box = best_left_box;
    right_box = best_right_box;
    if (mid != start + best_left_n) {
      // safety path recompute
      left_box = Aabb();
      right_box = Aabb();
      for (int32_t i = start; i < mid; ++i) left_box.grow(ctx.tri_box[ctx.order[i]]);
      for (int32_t i = mid; i < end; ++i) right_box.grow(ctx.tri_box[ctx.order[i]]);
    }
  }

  int32_t after_left = build_range(ctx, start, mid, left_box);
  // Left subtree's last emitted node count is num_nodes; fill left miss chain
  // via the convention below (done after right subtree, see parent fixup).
  int32_t after_right = build_range(ctx, mid, end, right_box);
  (void)after_left;
  return after_right;
}

}  // namespace

extern "C" {

// Returns 0 on success. Caller allocates:
//   node_min/node_max: 2T * 3 floats; node_miss/node_leaf: 2T ints;
//   leaf_tris: (T + pad) rows? -> allocate ceil(2T/1)*leaf_size ints
//   (num_leaves <= number of nodes).
// out_counts: [num_nodes, num_leaves].
int bvh_build_sah(const float* positions, int32_t num_vertices,
                  const int32_t* indices, int32_t num_triangles,
                  int32_t leaf_size, float* node_min, float* node_max,
                  int32_t* node_miss, int32_t* node_leaf, int32_t* leaf_tris,
                  int32_t* out_counts) {
  (void)num_vertices;
  if (num_triangles <= 0) return 1;
  BuildContext ctx;
  ctx.positions = positions;
  ctx.indices = indices;
  ctx.leaf_size = leaf_size;
  ctx.node_min = node_min;
  ctx.node_max = node_max;
  ctx.node_miss = node_miss;
  ctx.node_leaf = node_leaf;
  ctx.leaf_tris = leaf_tris;
  ctx.max_nodes = 2 * num_triangles;
  ctx.max_leaves = 2 * num_triangles;

  ctx.tri_box.resize(num_triangles);
  ctx.centroid.resize(num_triangles);
  ctx.order.resize(num_triangles);
  Aabb root;
  for (int32_t t = 0; t < num_triangles; ++t) {
    Aabb b;
    for (int k = 0; k < 3; ++k) {
      const int32_t v = indices[t * 3 + k];
      const Vec3 p{positions[v * 3], positions[v * 3 + 1], positions[v * 3 + 2]};
      b.grow(p);
    }
    ctx.tri_box[t] = b;
    ctx.centroid[t] = {(b.lo.x + b.hi.x) * 0.5f, (b.lo.y + b.hi.y) * 0.5f,
                       (b.lo.z + b.hi.z) * 0.5f};
    ctx.order[t] = t;
    root.grow(b);
  }

  build_range(ctx, 0, num_triangles, root);

  // Miss pointers: recompute subtree extents from leaf flags via a reverse
  // sweep using an explicit stack of "open" internal nodes.
  {
    const int32_t n = ctx.num_nodes;
    std::vector<int32_t> extent(n);
    std::vector<int32_t> stack;  // indices of internal nodes awaiting children
    std::vector<int8_t> seen(n, 0);
    // Pre-order with first-child-next property: reconstruct extents by a
    // reverse scan: extent[i] = i+1 for leaves; for internal nodes, the
    // right child's extent. Track via stack in forward order instead:
    // children of an internal node are i+1 (left) and extent[left] (right).
    // Compute recursively without recursion: reverse iteration works because
    // extent of an internal node equals extent of its second child, and both
    // children lie after it.
    std::vector<int32_t> pending_children(n, 0);
    for (int32_t i = n - 1; i >= 0; --i) {
      if (ctx.node_leaf[i] >= 0) {
        extent[i] = i + 1;
      } else {
        const int32_t left = i + 1;
        const int32_t right = extent[left];
        extent[i] = extent[right];
      }
    }
    for (int32_t i = 0; i < n; ++i)
      ctx.node_miss[i] = (extent[i] >= n) ? -1 : extent[i];
    ctx.node_miss[0] = -1;
    (void)seen;
    (void)pending_children;
  }

  out_counts[0] = ctx.num_nodes;
  out_counts[1] = ctx.num_leaves;
  return 0;
}
}
