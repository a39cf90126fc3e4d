// raytpu native runtime — host-side C++ components.
//
// The reference's native surface is its C++ host layer (device management,
// scene construction — CSVersion/DxCSApp.cpp); the TPU framework's host
// runtime is JAX, but the host-side *build* work that sits in front of the
// device (BVH construction over large scenes) is implemented natively here
// and exposed through a C ABI consumed via ctypes (raytpu/native.py).
//
// The algorithm intentionally mirrors raytpu/bvh.py::build_bvh exactly
// (median split on the longest centroid axis, stable ordering, preorder
// flatten with skip pointers, float64 box accumulation) so the two
// builders are interchangeable and cross-checked bit-for-bit in tests.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Builder {
  const double* centers;  // (n, 3)
  const double* radii;    // (n,)
  int leaf_size;
  double pad;
  // outputs
  float* nodes;     // (max_nodes, 9): lo3, hi3, start, count, skip
  float* perm;      // (n,)
  int n_nodes = 0;
  int n_order = 0;

  void build(std::vector<int>& idx, int lo, int hi) {
    const int my = n_nodes++;
    float* nd = nodes + my * 9;

    double blo[3] = {1e300, 1e300, 1e300};
    double bhi[3] = {-1e300, -1e300, -1e300};
    for (int k = lo; k < hi; ++k) {
      const int i = idx[k];
      const double r = std::fabs(radii[i]);
      for (int a = 0; a < 3; ++a) {
        blo[a] = std::min(blo[a], centers[i * 3 + a] - r);
        bhi[a] = std::max(bhi[a], centers[i * 3 + a] + r);
      }
    }
    for (int a = 0; a < 3; ++a) {
      nd[a] = static_cast<float>(blo[a] - pad);
      nd[3 + a] = static_cast<float>(bhi[a] + pad);
    }

    const int count = hi - lo;
    if (count <= leaf_size) {
      nd[6] = static_cast<float>(n_order);
      nd[7] = static_cast<float>(count);
      for (int k = lo; k < hi; ++k) perm[n_order++] = static_cast<float>(idx[k]);
    } else {
      double clo[3] = {1e300, 1e300, 1e300};
      double chi[3] = {-1e300, -1e300, -1e300};
      for (int k = lo; k < hi; ++k) {
        const int i = idx[k];
        for (int a = 0; a < 3; ++a) {
          clo[a] = std::min(clo[a], centers[i * 3 + a]);
          chi[a] = std::max(chi[a], centers[i * 3 + a]);
        }
      }
      int axis = 0;
      double best = chi[0] - clo[0];
      for (int a = 1; a < 3; ++a) {  // strict >: first max wins (np.argmax)
        if (chi[a] - clo[a] > best) { best = chi[a] - clo[a]; axis = a; }
      }
      std::stable_sort(idx.begin() + lo, idx.begin() + hi,
                       [&](int a_, int b_) {
                         return centers[a_ * 3 + axis] < centers[b_ * 3 + axis];
                       });
      nd[6] = 0.0f;
      nd[7] = 0.0f;
      const int half = count / 2;
      build(idx, lo, lo + half);
      build(idx, lo + half, hi);
    }
    nodes[my * 9 + 8] = static_cast<float>(n_nodes);  // skip = after subtree
  }
};

}  // namespace

extern "C" {

// Returns the number of nodes written, or -1 on error.
// nodes_out must hold at least (2*n - 1) * 9 floats; perm_out n floats.
int rt_build_bvh(const double* centers, const double* radii, int n,
                 int leaf_size, double pad, float* nodes_out,
                 float* perm_out) {
  if (n <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.centers = centers;
  b.radii = radii;
  b.leaf_size = leaf_size;
  b.pad = pad;
  b.nodes = nodes_out;
  b.perm = perm_out;
  std::vector<int> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  b.build(idx, 0, n);
  if (b.n_order != n) return -1;
  return b.n_nodes;
}

int rt_native_abi_version() { return 1; }

}  // extern "C"
