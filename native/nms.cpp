// Greedy non-maximum suppression over xyxy+score detections.
//
// Native runtime component for the detection path (enhax/models/detect):
// the reference delegates NMS to ultralytics/torchvision CUDA ops; enhax
// keeps it on the host (detections are tiny and already host-side for the
// tracker) with a C++ kernel over a C ABI for ctypes.
//
// Build: make -C native   (part of libenhax_ccl.so's sibling libenhax_nms.so)

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// dets: n rows of [x1, y1, x2, y2, score] (row-major float32), assumed any
// order. keep_out: caller-allocated n int32; returns number kept. Boxes are
// processed in descending score; a box is kept if IoU with every kept box
// is < iou_thresh.
int32_t enhax_nms(const float* dets, int32_t n, float iou_thresh,
                  float score_thresh, int32_t max_keep, int32_t* keep_out) {
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });

  auto area = [&](int32_t i) {
    const float* d = dets + i * 5;
    return std::max(0.f, d[2] - d[0]) * std::max(0.f, d[3] - d[1]);
  };

  std::vector<int32_t> kept;
  kept.reserve(std::min<int32_t>(n, max_keep));
  for (int32_t oi = 0; oi < n; ++oi) {
    int32_t i = order[oi];
    const float* di = dets + i * 5;
    if (di[4] < score_thresh) break;  // sorted: rest are lower
    bool ok = true;
    for (int32_t j : kept) {
      const float* dj = dets + j * 5;
      float xx1 = std::max(di[0], dj[0]);
      float yy1 = std::max(di[1], dj[1]);
      float xx2 = std::min(di[2], dj[2]);
      float yy2 = std::min(di[3], dj[3]);
      float inter = std::max(0.f, xx2 - xx1) * std::max(0.f, yy2 - yy1);
      float uni = area(i) + area(j) - inter;
      if (uni > 0.f && inter / uni >= iou_thresh) { ok = false; break; }
    }
    if (ok) {
      kept.push_back(i);
      if (static_cast<int32_t>(kept.size()) >= max_keep) break;
    }
  }
  std::copy(kept.begin(), kept.end(), keep_out);
  return static_cast<int32_t>(kept.size());
}

}  // extern "C"
