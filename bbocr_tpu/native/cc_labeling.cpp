// Connected-component labeling with per-component statistics.
//
// Native replacement for the contour/labeling steps the reference delegates
// to OpenCV C++ (cv2.findContours / boundingRect in
// pipeline_demo/extractor/enhanced_extractor.py:282-297, and the
// connectedComponents pass EasyOCR's CRAFT postprocessing performs inside
// libtorch/cv2). Score maps are produced on the TPU; this host step is tiny
// compared to the conv nets (SURVEY.md §7 "Hard parts") but sits on the
// latency path, so it is C++ rather than Python.
//
// Two-pass union-find labeling, 4- or 8-connectivity.
// Per component (1-based labels; 0 = background), emits 11 doubles:
//   [x0, y0, x1, y1, count, sx, sy, sxx, syy, sxy, max_score]
// where (x1, y1) are inclusive, count is the pixel population, s* are raw
// moment sums for centroid/PCA-based rotated boxes, and max_score is the
// max of the optional float32 score image over the component (0 if null).

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(size_t n) : parent(n) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
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

// Returns the number of components (capped at max_comps).
// labels_out: int32[h*w], 0 background, 1..n component ids.
// stats_out: double[max_comps * 11].
int32_t bbocr_label_components(const uint8_t* mask, const float* score,
                               int32_t h, int32_t w, int32_t connectivity,
                               int32_t* labels_out, double* stats_out,
                               int32_t max_comps) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int32_t> raw(n, 0);
  // Provisional labels, 1-based; union-find over provisional ids.
  UnionFind uf(1);
  uf.parent.reserve(1 << 16);
  int32_t next = 1;
  const bool diag = connectivity == 8;

  for (int32_t y = 0; y < h; ++y) {
    const uint8_t* row = mask + static_cast<int64_t>(y) * w;
    int32_t* lrow = raw.data() + static_cast<int64_t>(y) * w;
    const int32_t* lup = y > 0 ? raw.data() + static_cast<int64_t>(y - 1) * w : nullptr;
    for (int32_t x = 0; x < w; ++x) {
      if (!row[x]) continue;
      int32_t label = 0;
      const int32_t left = x > 0 ? lrow[x - 1] : 0;
      const int32_t up = lup ? lup[x] : 0;
      const int32_t upleft = (diag && lup && x > 0) ? lup[x - 1] : 0;
      const int32_t upright = (diag && lup && x + 1 < w) ? lup[x + 1] : 0;
      for (int32_t nb : {left, up, upleft, upright}) {
        if (!nb) continue;
        if (!label) {
          label = nb;
        } else if (nb != label) {
          uf.unite(label, nb);
        }
      }
      if (!label) {
        label = next++;
        uf.parent.push_back(label);
      }
      lrow[x] = label;
    }
  }

  // Resolve roots -> compact 1-based ids.
  std::vector<int32_t> remap(next, 0);
  int32_t n_comp = 0;
  for (int32_t i = 1; i < next; ++i) {
    const int32_t root = uf.find(i);
    if (!remap[root]) {
      if (n_comp >= max_comps) { remap[root] = -1; continue; }
      remap[root] = ++n_comp;
    }
  }

  // Init stats.
  for (int32_t c = 0; c < n_comp; ++c) {
    double* s = stats_out + static_cast<int64_t>(c) * 11;
    s[0] = w; s[1] = h; s[2] = -1; s[3] = -1;
    for (int k = 4; k < 11; ++k) s[k] = 0.0;
  }

  for (int32_t y = 0; y < h; ++y) {
    int32_t* lrow = raw.data() + static_cast<int64_t>(y) * w;
    const float* srow = score ? score + static_cast<int64_t>(y) * w : nullptr;
    for (int32_t x = 0; x < w; ++x) {
      if (!lrow[x]) { labels_out[static_cast<int64_t>(y) * w + x] = 0; continue; }
      int32_t id = remap[uf.find(lrow[x])];
      if (id <= 0) { labels_out[static_cast<int64_t>(y) * w + x] = 0; continue; }
      labels_out[static_cast<int64_t>(y) * w + x] = id;
      double* s = stats_out + static_cast<int64_t>(id - 1) * 11;
      if (x < s[0]) s[0] = x;
      if (y < s[1]) s[1] = y;
      if (x > s[2]) s[2] = x;
      if (y > s[3]) s[3] = y;
      s[4] += 1.0;
      s[5] += x;
      s[6] += y;
      s[7] += static_cast<double>(x) * x;
      s[8] += static_cast<double>(y) * y;
      s[9] += static_cast<double>(x) * y;
      if (srow && srow[x] > s[10]) s[10] = srow[x];
    }
  }
  return n_comp;
}

}  // extern "C"
