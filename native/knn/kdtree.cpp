// Exact k-nearest-neighbor queries over 3D point clouds.
//
// Native replacement for the reference's Open3D KDTreeFlann usage
// (shared.py:45-61): the reference builds a KD-tree and loops per-point
// queries from Python; here the build is a single iterative median-split
// construction and the all-points self-query fans out across hardware
// threads.  Exposed through a C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsplatpu_knn.so kdtree.cpp -lpthread

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

namespace {

struct Node {
  int32_t left = -1;
  int32_t right = -1;
  int32_t begin = 0;   // leaf: range into indices
  int32_t end = 0;
  int8_t axis = -1;    // -1 => leaf
  float split = 0.f;
};

struct KdTree {
  const float* pts;  // (n, 3) row-major
  int32_t n;
  std::vector<int32_t> indices;
  std::vector<Node> nodes;
  static constexpr int kLeafSize = 16;

  explicit KdTree(const float* p, int32_t count) : pts(p), n(count) {
    indices.resize(n);
    for (int32_t i = 0; i < n; ++i) indices[i] = i;
    nodes.reserve(2 * n / kLeafSize + 4);
    build(0, n);
  }

  int32_t build(int32_t begin, int32_t end) {
    int32_t id = static_cast<int32_t>(nodes.size());
    nodes.emplace_back();
    if (end - begin <= kLeafSize) {
      nodes[id].begin = begin;
      nodes[id].end = end;
      return id;
    }
    // Pick the axis with the largest extent.
    float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
    for (int32_t i = begin; i < end; ++i) {
      const float* p = pts + 3 * indices[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > hi[axis] - lo[axis]) axis = a;
    int32_t mid = (begin + end) / 2;
    std::nth_element(
        indices.begin() + begin, indices.begin() + mid, indices.begin() + end,
        [&](int32_t x, int32_t y) { return pts[3 * x + axis] < pts[3 * y + axis]; });
    float split = pts[3 * indices[mid] + axis];
    nodes[id].axis = static_cast<int8_t>(axis);
    nodes[id].split = split;
    int32_t l = build(begin, mid);
    int32_t r = build(mid, end);
    nodes[id].left = l;
    nodes[id].right = r;
    return id;
  }

  // k nearest neighbors of `query`, excluding index `self` (pass -1 to keep all).
  void query(const float* q, int32_t self, int k, int32_t* out_idx,
             float* out_d2) const {
    // Max-heap of (d2, idx) keeping the k best.
    using Entry = std::pair<float, int32_t>;
    std::priority_queue<Entry> heap;
    search(0, q, self, k, heap);
    int count = static_cast<int>(heap.size());
    for (int i = count - 1; i >= 0; --i) {
      out_idx[i] = heap.top().second;
      out_d2[i] = heap.top().first;
      heap.pop();
    }
    for (int i = count; i < k; ++i) {  // fewer than k points available
      out_idx[i] = -1;
      out_d2[i] = INFINITY;
    }
  }

 private:
  void search(int32_t node_id, const float* q, int32_t self, int k,
              std::priority_queue<std::pair<float, int32_t>>& heap) const {
    const Node& node = nodes[node_id];
    if (node.axis < 0) {
      for (int32_t i = node.begin; i < node.end; ++i) {
        int32_t idx = indices[i];
        if (idx == self) continue;
        const float* p = pts + 3 * idx;
        float dx = p[0] - q[0], dy = p[1] - q[1], dz = p[2] - q[2];
        float d2 = dx * dx + dy * dy + dz * dz;
        if (static_cast<int>(heap.size()) < k) {
          heap.emplace(d2, idx);
        } else if (d2 < heap.top().first) {
          heap.pop();
          heap.emplace(d2, idx);
        }
      }
      return;
    }
    float delta = q[node.axis] - node.split;
    int32_t near = delta <= 0 ? node.left : node.right;
    int32_t far = delta <= 0 ? node.right : node.left;
    search(near, q, self, k, heap);
    if (static_cast<int>(heap.size()) < k || delta * delta < heap.top().first) {
      search(far, q, self, k, heap);
    }
  }
};

}  // namespace

extern "C" {

// All-points self-kNN: for each of the n points, the k nearest OTHER points,
// ascending by distance. out_idx/out_d2 are (n, k) row-major.
void splatpu_knn(const float* pts, int32_t n, int32_t k, int32_t* out_idx,
                 float* out_d2, int32_t num_threads) {
  KdTree tree(pts, n);
  if (num_threads <= 0)
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
  num_threads = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> workers;
  int32_t chunk = (n + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    int32_t begin = t * chunk;
    int32_t end = std::min(n, begin + chunk);
    if (begin >= end) break;
    workers.emplace_back([&, begin, end]() {
      for (int32_t i = begin; i < end; ++i) {
        tree.query(pts + 3 * i, i, k, out_idx + static_cast<int64_t>(i) * k,
                   out_d2 + static_cast<int64_t>(i) * k);
      }
    });
  }
  for (auto& w : workers) w.join();
}

// Query kNN of m external query points against the cloud (no self-exclusion).
void splatpu_knn_query(const float* pts, int32_t n, const float* queries,
                       int32_t m, int32_t k, int32_t* out_idx, float* out_d2,
                       int32_t num_threads) {
  KdTree tree(pts, n);
  if (num_threads <= 0)
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
  num_threads = std::max(1, std::min(num_threads, m));
  std::vector<std::thread> workers;
  int32_t chunk = (m + num_threads - 1) / num_threads;
  for (int32_t t = 0; t < num_threads; ++t) {
    int32_t begin = t * chunk;
    int32_t end = std::min(m, begin + chunk);
    if (begin >= end) break;
    workers.emplace_back([&, begin, end]() {
      for (int32_t i = begin; i < end; ++i) {
        tree.query(queries + 3 * i, -1, k,
                   out_idx + static_cast<int64_t>(i) * k,
                   out_d2 + static_cast<int64_t>(i) * k);
      }
    });
  }
  for (auto& w : workers) w.join();
}

}  // extern "C"
