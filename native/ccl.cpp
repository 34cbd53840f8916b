// Connected-components labeling (union-find, 8-connectivity —
// matching cv2.connectedComponentsWithStats(_, 8) in the reference's
// remove_small_regions, sam2/utils/amg.py:269-293).
//
// TPU-native rebuild of the reference's single CUDA kernel
// (src/mon_extra/vision/segment/sam2/sam2/csrc/connected_components.cu:
// GPU union-find CCL used to remove small holes/sprinkles in SAM2 mask
// post-processing, sam2/utils/misc.py:47-63). On a TPU system the masks
// come back to the host for IO anyway, so the rebuild is a fast host-side
// two-pass union-find with path compression, exposed over a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC ccl.cpp -o libenhax_ccl.so)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
      x = parent[x];
    }
    return x;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (a < b) parent[b] = a; else parent[a] = b;
  }
};

}  // namespace

extern "C" {

// Label 8-connected foreground components of a binary mask.
// mask: h*w uint8 (0 = background); labels_out: h*w int32, 0 = background,
// components numbered 1..n_components (row-major discovery order).
// Returns the number of components.
int32_t enhax_ccl_label(const uint8_t* mask, int32_t h, int32_t w,
                        int32_t* labels_out) {
  const int64_t n = static_cast<int64_t>(h) * w;
  UnionFind uf(n);

  // pass 1: union with left, top, top-left, top-right (8-connectivity)
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int64_t i = static_cast<int64_t>(y) * w + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) uf.unite(static_cast<int32_t>(i), static_cast<int32_t>(i - 1));
      if (y > 0) {
        if (mask[i - w]) uf.unite(static_cast<int32_t>(i), static_cast<int32_t>(i - w));
        if (x > 0 && mask[i - w - 1]) uf.unite(static_cast<int32_t>(i), static_cast<int32_t>(i - w - 1));
        if (x + 1 < w && mask[i - w + 1]) uf.unite(static_cast<int32_t>(i), static_cast<int32_t>(i - w + 1));
      }
    }
  }

  // pass 2: compress + renumber
  std::vector<int32_t> remap(n, 0);
  int32_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!mask[i]) { labels_out[i] = 0; continue; }
    int32_t root = uf.find(static_cast<int32_t>(i));
    if (remap[root] == 0) remap[root] = ++next;
    labels_out[i] = remap[root];
  }
  return next;
}

// Compute per-component pixel areas. areas_out must hold n_components+1
// entries (index 0 = background count).
void enhax_ccl_areas(const int32_t* labels, int32_t h, int32_t w,
                     int32_t n_components, int32_t* areas_out) {
  std::memset(areas_out, 0, sizeof(int32_t) * (n_components + 1));
  const int64_t n = static_cast<int64_t>(h) * w;
  for (int64_t i = 0; i < n; ++i) areas_out[labels[i]]++;
}

// Remove connected regions smaller than area_thresh. mode 0 = remove
// foreground islands (set to 0); mode 1 = fill background holes (set to 1).
// Mask is modified in place. Returns number of removed regions.
int32_t enhax_remove_small_regions(uint8_t* mask, int32_t h, int32_t w,
                                   int32_t area_thresh, int32_t mode) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<uint8_t> work(n);
  if (mode == 0) {
    std::memcpy(work.data(), mask, n);
  } else {
    for (int64_t i = 0; i < n; ++i) work[i] = mask[i] ? 0 : 1;  // holes
  }
  std::vector<int32_t> labels(n);
  int32_t n_comp = enhax_ccl_label(work.data(), h, w, labels.data());
  if (n_comp == 0) return 0;
  std::vector<int32_t> areas(n_comp + 1);
  enhax_ccl_areas(labels.data(), h, w, n_comp, areas.data());

  std::vector<uint8_t> small(n_comp + 1, 0);
  int32_t removed = 0;
  for (int32_t c = 1; c <= n_comp; ++c) {
    if (areas[c] < area_thresh) { small[c] = 1; ++removed; }
  }
  if (mode == 0 && removed == n_comp && n_comp > 0) {
    // islands: if every region is below threshold, keep the largest
    // (reference amg.py:289-291) instead of erasing the whole mask
    int32_t largest = 1;
    for (int32_t c = 2; c <= n_comp; ++c) {
      if (areas[c] > areas[largest]) largest = c;
    }
    small[largest] = 0;
    --removed;
  }
  for (int64_t i = 0; i < n; ++i) {
    if (labels[i] && small[labels[i]]) mask[i] = (mode == 0) ? 0 : 1;
  }
  return removed;
}

}  // extern "C"
