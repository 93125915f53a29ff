// COCO bbox-eval greedy matcher — the hot loop of eval/coco.py in C++.
//
// The reference delegated this to pycocotools' C extension
// (reference retinanet/eval/coco_evaluator.py:136-157); this is the
// first-party equivalent. One call evaluates every (image, category)
// group for every IoU threshold and area range:
//
//   * IoU matrices are computed ONCE per group and reused across the 4
//     area ranges (the pure-Python path recomputed them per range).
//   * The T x D x G greedy matching recurrence — inherently sequential
//     over detections in score order — runs as tight scalar loops.
//
// Semantics mirror eval/coco.py::COCOEval._evaluate_img exactly (which
// itself follows the published COCO protocol): gts stably sorted
// non-ignored-first per area range, crowd gts matched by IoA and
// re-matchable, the running-best update `iou >= best` (later ties win),
// and the early break once a non-ignored match exists and the scan
// reaches the ignored tail.
//
// Inputs are flat arrays over groups; detections arrive already sorted
// by descending score (stable) and truncated to max(MAX_DETS).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline double box_iou(const double* d, const double* g, bool crowd) {
  const double dx1 = d[0], dy1 = d[1], dx2 = d[0] + d[2], dy2 = d[1] + d[3];
  const double gx1 = g[0], gy1 = g[1], gx2 = g[0] + g[2], gy2 = g[1] + g[3];
  double ix = (dx2 < gx2 ? dx2 : gx2) - (dx1 > gx1 ? dx1 : gx1);
  double iy = (dy2 < gy2 ? dy2 : gy2) - (dy1 > gy1 ? dy1 : gy1);
  if (ix < 0) ix = 0;
  if (iy < 0) iy = 0;
  const double inter = ix * iy;
  const double d_area = d[2] * d[3];
  const double g_area = g[2] * g[3];
  const double uni = crowd ? d_area : d_area + g_area - inter;
  if (uni <= 0) return 0.0;
  // Clamp the denominator exactly as the Python spec does
  // (eval/coco.py: inter / np.maximum(union, 1e-10)) so degenerate
  // sub-1e-10-area boxes stay bit-for-bit equivalent across lanes.
  return inter / (uni > 1e-10 ? uni : 1e-10);
}

}  // namespace

extern "C" int coco_match_groups(
    int64_t n_groups,
    const int64_t* dt_off,        // [n_groups+1] offsets into dt arrays
    const int64_t* gt_off,        // [n_groups+1] offsets into gt arrays
    const double* dt_boxes,       // [sumD*4] xywh, score-desc within group
    const double* gt_boxes,       // [sumG*4] xywh
    const double* gt_areas,       // [sumG] annotation 'area' field
    const uint8_t* gt_iscrowd,    // [sumG]
    const uint8_t* gt_ignore_base,// [sumG] iscrowd || ignore flag
    int32_t n_area,
    const double* area_lo,        // [n_area]
    const double* area_hi,        // [n_area]
    int32_t n_thr,
    const double* thrs,           // [n_thr]
    uint8_t* dt_matched,          // out [n_area, n_thr, sumD]
    uint8_t* dt_ignore,           // out [n_area, n_thr, sumD]
    int32_t* num_gt) {            // out [n_area, n_groups]
  const int64_t sum_d = dt_off[n_groups];

  std::vector<double> iou;        // D x G scratch, reused across groups
  std::vector<int32_t> order;     // sorted gt indices (non-ignored first)
  std::vector<uint8_t> ig_s;      // gt_ignore in sorted space
  std::vector<uint8_t> crowd_s;   // iscrowd in sorted space
  std::vector<uint8_t> claimed;   // per-threshold claim flags

  for (int64_t grp = 0; grp < n_groups; ++grp) {
    const int64_t d0 = dt_off[grp], g0 = gt_off[grp];
    const int64_t D = dt_off[grp + 1] - d0;
    const int64_t G = gt_off[grp + 1] - g0;

    // IoU once per group (original gt order), reused for every area range.
    iou.resize(static_cast<size_t>(D * G));
    for (int64_t d = 0; d < D; ++d) {
      const double* db = dt_boxes + (d0 + d) * 4;
      for (int64_t g = 0; g < G; ++g) {
        iou[d * G + g] =
            box_iou(db, gt_boxes + (g0 + g) * 4, gt_iscrowd[g0 + g] != 0);
      }
    }

    order.resize(static_cast<size_t>(G));
    ig_s.resize(static_cast<size_t>(G));
    crowd_s.resize(static_cast<size_t>(G));
    claimed.resize(static_cast<size_t>(G));

    for (int32_t a = 0; a < n_area; ++a) {
      const double lo = area_lo[a], hi = area_hi[a];

      // gt_ignore for this range; stable sort non-ignored first.
      int32_t n_keep = 0;
      for (int64_t g = 0; g < G; ++g) {
        const bool ig = gt_ignore_base[g0 + g] ||
                        gt_areas[g0 + g] < lo || gt_areas[g0 + g] > hi;
        if (!ig) order[n_keep++] = static_cast<int32_t>(g);
      }
      num_gt[a * n_groups + grp] = n_keep;
      {
        int32_t tail = n_keep;
        for (int64_t g = 0; g < G; ++g) {
          const bool ig = gt_ignore_base[g0 + g] ||
                          gt_areas[g0 + g] < lo || gt_areas[g0 + g] > hi;
          if (ig) order[tail++] = static_cast<int32_t>(g);
        }
      }
      for (int64_t gi = 0; gi < G; ++gi) {
        ig_s[gi] = gi >= n_keep;  // sorted: non-ignored block then ignored
        crowd_s[gi] = gt_iscrowd[g0 + order[gi]];
      }

      for (int32_t t = 0; t < n_thr; ++t) {
        uint8_t* m_out = dt_matched + (static_cast<int64_t>(a) * n_thr + t)
                         * sum_d + d0;
        uint8_t* i_out = dt_ignore + (static_cast<int64_t>(a) * n_thr + t)
                         * sum_d + d0;
        std::memset(claimed.data(), 0, claimed.size());
        const double thr0 = thrs[t] < 1 - 1e-10 ? thrs[t] : 1 - 1e-10;
        for (int64_t d = 0; d < D; ++d) {
          double best = thr0;
          int64_t m = -1;
          const double* iou_row = iou.data() + d * G;
          for (int64_t gi = 0; gi < G; ++gi) {
            if (claimed[gi] && !crowd_s[gi]) continue;
            if (m > -1 && !ig_s[m] && ig_s[gi]) break;
            const double v = iou_row[order[gi]];
            if (v < best) continue;
            best = v;
            m = gi;
          }
          if (m >= 0) {
            claimed[m] = 1;
            m_out[d] = 1;
            i_out[d] = ig_s[m];
          } else {
            const double d_area =
                dt_boxes[(d0 + d) * 4 + 2] * dt_boxes[(d0 + d) * 4 + 3];
            m_out[d] = 0;
            i_out[d] = (d_area < lo || d_area > hi) ? 1 : 0;
          }
        }
      }
    }
  }
  return 0;
}
