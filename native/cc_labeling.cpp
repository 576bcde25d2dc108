// Connected-component labeling for binary masks (union-find, 4-connectivity)
// + small-component removal / hole filling.
//
// TPU-native equivalent of the reference's only SAM2 CUDA kernel
// (segment-anything-2-main/sam2/csrc/connected_components.cu, used via
// sam2/utils/misc.py:47-63 to fill holes and drop specks in predicted
// masks). Mask post-processing is a host-side step in our pipeline, so the
// right tool is a fast native CPU kernel, not a device kernel.
//
// Exposed via a C ABI for ctypes (see mimo_tpu/ops/connected_components.py).
//
// Build: make -C native   (produces libcc_labeling.so)

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
    if (a != b) parent[b] = a;
  }
};

}  // namespace

extern "C" {

// Label 4-connected components of a binary mask.
// mask: H*W uint8 (0/1); labels_out: H*W int32 (0 = background, components
// numbered from 1 in scan order); areas_out: optional (may be null) int32
// buffer of size max_labels receiving per-label pixel counts.
// Returns the number of components.
int32_t cc_label(const uint8_t* mask, int32_t height, int32_t width,
                 int32_t* labels_out, int32_t* areas_out,
                 int32_t max_labels) {
  const size_t n = static_cast<size_t>(height) * width;
  UnionFind uf(n);
  // union pass
  for (int32_t y = 0; y < height; ++y) {
    for (int32_t x = 0; x < width; ++x) {
      const size_t i = static_cast<size_t>(y) * width + x;
      if (!mask[i]) continue;
      if (x > 0 && mask[i - 1]) uf.unite(static_cast<int32_t>(i - 1),
                                         static_cast<int32_t>(i));
      if (y > 0 && mask[i - width]) uf.unite(static_cast<int32_t>(i - width),
                                             static_cast<int32_t>(i));
    }
  }
  // relabel pass
  std::vector<int32_t> remap(n, 0);
  int32_t next = 0;
  for (size_t i = 0; i < n; ++i) {
    if (!mask[i]) {
      labels_out[i] = 0;
      continue;
    }
    const int32_t root = uf.find(static_cast<int32_t>(i));
    if (remap[root] == 0) {
      remap[root] = ++next;  // max_labels only bounds areas_out writes
    }
    labels_out[i] = remap[root];
    if (areas_out && labels_out[i] >= 1 && labels_out[i] <= max_labels) {
      ++areas_out[labels_out[i] - 1];
    }
  }
  return next;
}

// Remove foreground components smaller than min_area and (optionally) fill
// background holes smaller than min_area. In-place on mask (uint8 0/1).
void cc_clean(uint8_t* mask, int32_t height, int32_t width,
              int32_t min_area, int32_t fill_holes) {
  const size_t n = static_cast<size_t>(height) * width;
  std::vector<int32_t> labels(n);
  const int32_t kMax = 1 << 20;
  std::vector<int32_t> areas(kMax, 0);

  // pass 1: drop small foreground specks
  cc_label(mask, height, width, labels.data(), areas.data(), kMax);
  for (size_t i = 0; i < n; ++i) {
    if (mask[i] && areas[labels[i] - 1] < min_area) mask[i] = 0;
  }

  if (!fill_holes) return;

  // pass 2: fill small background holes (background components not touching
  // the border)
  std::vector<uint8_t> inv(n);
  for (size_t i = 0; i < n; ++i) inv[i] = mask[i] ? 0 : 1;
  std::fill(areas.begin(), areas.end(), 0);
  cc_label(inv.data(), height, width, labels.data(), areas.data(), kMax);
  // find border-touching background labels
  std::vector<uint8_t> touches(kMax, 0);
  for (int32_t x = 0; x < width; ++x) {
    if (labels[x]) touches[labels[x] - 1] = 1;
    const size_t last = static_cast<size_t>(height - 1) * width + x;
    if (labels[last]) touches[labels[last] - 1] = 1;
  }
  for (int32_t y = 0; y < height; ++y) {
    const size_t l = static_cast<size_t>(y) * width;
    const size_t r = l + width - 1;
    if (labels[l]) touches[labels[l] - 1] = 1;
    if (labels[r]) touches[labels[r] - 1] = 1;
  }
  for (size_t i = 0; i < n; ++i) {
    if (!mask[i] && labels[i]) {
      const int32_t lab = labels[i] - 1;
      if (!touches[lab] && areas[lab] < min_area) mask[i] = 1;
    }
  }
}

}  // extern "C"
