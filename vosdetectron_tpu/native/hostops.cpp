// Native host-side ops for the TPU VOS framework.
//
// C++ replacement for the reference's Cython host components
// (reference: lib/utils/cython_nms.pyx ~250 LoC incl. soft_nms,
// lib/utils/cython_bbox.pyx ~60 LoC bbox_overlaps) plus the COCO
// mask utilities the reference gets from pycocotools (RLE encode/decode,
// mask IoU) — pycocotools is not available in this image, so the COCO
// dataset/eval path binds to these instead.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in the image).
// All box arrays are float32 xyxy; masks are uint8 row-major H*W.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Pairwise IoU: boxes1 (n,4), boxes2 (m,4) -> out (n*m)
// ---------------------------------------------------------------------------
void bbox_overlaps(const float* b1, int64_t n, const float* b2, int64_t m,
                   float* out, int legacy_plus1) {
  const float off = legacy_plus1 ? 1.0f : 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    const float x1 = b1[i * 4], y1 = b1[i * 4 + 1];
    const float x2 = b1[i * 4 + 2], y2 = b1[i * 4 + 3];
    const float a1 = std::max(x2 - x1 + off, 0.0f) *
                     std::max(y2 - y1 + off, 0.0f);
    for (int64_t j = 0; j < m; ++j) {
      const float u1 = b2[j * 4], v1 = b2[j * 4 + 1];
      const float u2 = b2[j * 4 + 2], v2 = b2[j * 4 + 3];
      const float iw = std::min(x2, u2) - std::max(x1, u1) + off;
      const float ih = std::min(y2, v2) - std::max(y1, v1) + off;
      float iou = 0.0f;
      if (iw > 0 && ih > 0) {
        const float a2 = std::max(u2 - u1 + off, 0.0f) *
                         std::max(v2 - v1 + off, 0.0f);
        const float inter = iw * ih;
        const float uni = a1 + a2 - inter;
        iou = uni > 0 ? inter / uni : 0.0f;
      }
      out[i * m + j] = iou;
    }
  }
}

// ---------------------------------------------------------------------------
// Greedy NMS over score-sorted-or-not boxes. Returns number kept; keep_out
// receives indices in score-descending order.
// ---------------------------------------------------------------------------
int64_t nms_greedy(const float* boxes, const float* scores, int64_t n,
                   float thresh, int64_t* keep_out, int legacy_plus1) {
  const float off = legacy_plus1 ? 1.0f : 0.0f;
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return scores[a] > scores[b];
  });
  std::vector<char> suppressed(n, 0);
  std::vector<float> area(n);
  for (int64_t i = 0; i < n; ++i) {
    area[i] = std::max(boxes[i * 4 + 2] - boxes[i * 4] + off, 0.0f) *
              std::max(boxes[i * 4 + 3] - boxes[i * 4 + 1] + off, 0.0f);
  }
  int64_t n_keep = 0;
  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep_out[n_keep++] = i;
    const float x1 = boxes[i * 4], y1 = boxes[i * 4 + 1];
    const float x2 = boxes[i * 4 + 2], y2 = boxes[i * 4 + 3];
    for (int64_t oj = oi + 1; oj < n; ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float iw = std::min(x2, boxes[j * 4 + 2]) -
                       std::max(x1, boxes[j * 4]) + off;
      const float ih = std::min(y2, boxes[j * 4 + 3]) -
                       std::max(y1, boxes[j * 4 + 1]) + off;
      if (iw <= 0 || ih <= 0) continue;
      const float inter = iw * ih;
      const float uni = area[i] + area[j] - inter;
      if (uni > 0 && inter / uni > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// ---------------------------------------------------------------------------
// Soft-NMS (method: 0 = linear, 1 = gaussian). In-place score decay;
// returns number of boxes with final score > score_thresh; keep_out holds
// their indices in decayed-score order.
// ---------------------------------------------------------------------------
int64_t soft_nms(const float* boxes, float* scores, int64_t n,
                 float iou_thresh, float sigma, float score_thresh,
                 int method, int64_t* keep_out) {
  std::vector<char> taken(n, 0);
  std::vector<float> area(n);
  for (int64_t i = 0; i < n; ++i) {
    area[i] = std::max(boxes[i * 4 + 2] - boxes[i * 4], 0.0f) *
              std::max(boxes[i * 4 + 3] - boxes[i * 4 + 1], 0.0f);
  }
  int64_t n_keep = 0;
  for (int64_t step = 0; step < n; ++step) {
    int64_t best = -1;
    float best_s = score_thresh;
    for (int64_t i = 0; i < n; ++i) {
      if (!taken[i] && scores[i] > best_s) { best = i; best_s = scores[i]; }
    }
    if (best < 0) break;
    taken[best] = 1;
    keep_out[n_keep++] = best;
    const float x1 = boxes[best * 4], y1 = boxes[best * 4 + 1];
    const float x2 = boxes[best * 4 + 2], y2 = boxes[best * 4 + 3];
    for (int64_t j = 0; j < n; ++j) {
      if (taken[j]) continue;
      const float iw = std::min(x2, boxes[j * 4 + 2]) -
                       std::max(x1, boxes[j * 4]) ;
      const float ih = std::min(y2, boxes[j * 4 + 3]) -
                       std::max(y1, boxes[j * 4 + 1]);
      if (iw <= 0 || ih <= 0) continue;
      const float inter = iw * ih;
      const float uni = area[best] + area[j] - inter;
      const float ov = uni > 0 ? inter / uni : 0.0f;
      if (method == 1) {
        scores[j] *= std::exp(-(ov * ov) / sigma);
      } else if (ov > iou_thresh) {
        scores[j] *= (1.0f - ov);
      }
    }
  }
  return n_keep;
}

// ---------------------------------------------------------------------------
// COCO-style RLE (column-major, alternating 0/1 run lengths starting with 0).
// rle_encode: mask (h*w uint8, row-major) -> counts (int32), returns length.
// ---------------------------------------------------------------------------
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                   int32_t* counts, int64_t max_len) {
  int64_t k = 0;
  int64_t run = 0;
  uint8_t cur = 0;  // RLE starts counting zeros
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y) {
      const uint8_t v = mask[y * w + x] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (k >= max_len) return -1;
        counts[k++] = static_cast<int32_t>(run);
        cur = v;
        run = 1;
      }
    }
  }
  if (k >= max_len) return -1;
  counts[k++] = static_cast<int32_t>(run);
  return k;
}

void rle_decode(const int32_t* counts, int64_t k, int64_t h, int64_t w,
                uint8_t* mask) {
  std::memset(mask, 0, h * w);
  int64_t pos = 0;
  uint8_t cur = 0;
  for (int64_t i = 0; i < k; ++i) {
    for (int32_t r = 0; r < counts[i]; ++r) {
      if (cur) {
        const int64_t x = pos / h;
        const int64_t y = pos % h;
        mask[y * w + x] = 1;
      }
      ++pos;
    }
    cur ^= 1;
  }
}

// Pairwise mask IoU on RLE-free dense masks: a (n,h*w), b (m,h*w).
void mask_iou(const uint8_t* a, int64_t n, const uint8_t* b, int64_t m,
              int64_t hw, float* out, int iscrowd) {
  std::vector<int64_t> area_a(n, 0), area_b(m, 0);
  for (int64_t i = 0; i < n; ++i)
    for (int64_t p = 0; p < hw; ++p) area_a[i] += a[i * hw + p] ? 1 : 0;
  for (int64_t j = 0; j < m; ++j)
    for (int64_t p = 0; p < hw; ++p) area_b[j] += b[j * hw + p] ? 1 : 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < m; ++j) {
      int64_t inter = 0;
      const uint8_t* pa = a + i * hw;
      const uint8_t* pb = b + j * hw;
      for (int64_t p = 0; p < hw; ++p) inter += (pa[p] && pb[p]) ? 1 : 0;
      // iscrowd (COCO): union is the detection's area only.
      const int64_t uni = iscrowd ? area_a[i]
                                  : area_a[i] + area_b[j] - inter;
      out[i * m + j] = uni > 0 ? static_cast<float>(inter) / uni : 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Polygon rasterization (COCO segmentation polygons -> binary mask).
// Even-odd scanline fill, polygon points as (x0, y0, x1, y1, ...).
// ---------------------------------------------------------------------------
void fill_poly(const double* pts, int64_t npts, int64_t h, int64_t w,
               uint8_t* mask) {
  if (npts < 3) return;
  for (int64_t y = 0; y < h; ++y) {
    const double cy = y + 0.5;
    std::vector<double> xs;
    for (int64_t i = 0; i < npts; ++i) {
      const double x0 = pts[2 * i], y0 = pts[2 * i + 1];
      const int64_t i1 = (i + 1) % npts;
      const double x1 = pts[2 * i1], y1 = pts[2 * i1 + 1];
      if ((y0 <= cy && y1 > cy) || (y1 <= cy && y0 > cy)) {
        xs.push_back(x0 + (cy - y0) / (y1 - y0) * (x1 - x0));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t i = 0; i + 1 < xs.size(); i += 2) {
      int64_t xa = static_cast<int64_t>(std::ceil(xs[i] - 0.5));
      int64_t xb = static_cast<int64_t>(std::floor(xs[i + 1] - 0.5));
      xa = std::max<int64_t>(xa, 0);
      xb = std::min<int64_t>(xb, w - 1);
      for (int64_t x = xa; x <= xb; ++x) mask[y * w + x] = 1;
    }
  }
}

}  // extern "C"
