// Native BVH builder for yocto-tpu.
//
// Host-side builder with the same split semantics as ops/bvh.py (and the
// reference yocto_bvh.cpp:108-302 behavior): binary BVH over primitive
// bboxes, middle split on the largest centroid axis (default) or 16-bin
// SAH (highquality), <= max_prims per leaf, children allocated
// contiguously. Exposed through a plain C ABI consumed via ctypes; the
// Python builder remains as the portable fallback and oracle.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}
inline float comp(const Vec3& v, int axis) {
  return axis == 0 ? v.x : (axis == 1 ? v.y : v.z);
}

struct Builder {
  const Vec3* bmin;  // strided [P] (interleaved min,max handled by caller)
  const Vec3* bmax;
  std::vector<Vec3> centers;
  int32_t* primitives;
  int nprims;
  bool highquality;
  int max_prims;

  float* node_bmin;
  float* node_bmax;
  int32_t* node_start;
  int32_t* node_num;
  int32_t* node_axis;
  uint8_t* node_internal;
  int n_nodes = 0;

  static float bbox_area(const Vec3& lo, const Vec3& hi) {
    float sx = hi.x - lo.x, sy = hi.y - lo.y, sz = hi.z - lo.z;
    return 1e-12f + 2 * (sx * sy + sx * sz + sy * sz);
  }

  // returns (middle, axis)
  std::pair<int, int> split_middle(int start, int end) {
    Vec3 cmin = centers[primitives[start]], cmax = cmin;
    for (int i = start + 1; i < end; i++) {
      cmin = vmin(cmin, centers[primitives[i]]);
      cmax = vmax(cmax, centers[primitives[i]]);
    }
    Vec3 csize = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    if (csize.x == 0 && csize.y == 0 && csize.z == 0)
      return {(start + end) / 2, 0};
    int axis = 0;
    if (csize.x >= csize.y && csize.x >= csize.z) axis = 0;
    if (csize.y >= csize.x && csize.y >= csize.z) axis = 1;
    if (csize.z >= csize.x && csize.z >= csize.y) axis = 2;
    float split = (comp(cmin, axis) + comp(cmax, axis)) / 2;
    auto* beg = primitives + start;
    auto* end_p = primitives + end;
    auto* mid_p = std::stable_partition(beg, end_p, [&](int32_t prim) {
      return comp(centers[prim], axis) < split;
    });
    int middle = int(mid_p - primitives);
    if (middle == start || middle == end) return {(start + end) / 2, axis};
    return {middle, axis};
  }

  std::pair<int, int> split_sah(int start, int end) {
    Vec3 cmin = centers[primitives[start]], cmax = cmin;
    Vec3 tbmin = bmin[primitives[start]], tbmax = bmax[primitives[start]];
    for (int i = start + 1; i < end; i++) {
      cmin = vmin(cmin, centers[primitives[i]]);
      cmax = vmax(cmax, centers[primitives[i]]);
      tbmin = vmin(tbmin, bmin[primitives[i]]);
      tbmax = vmax(tbmax, bmax[primitives[i]]);
    }
    Vec3 csize = {cmax.x - cmin.x, cmax.y - cmin.y, cmax.z - cmin.z};
    if (csize.x == 0 && csize.y == 0 && csize.z == 0)
      return {(start + end) / 2, 0};
    const int nbins = 16;
    float cb_area = bbox_area(tbmin, tbmax);
    float min_cost = std::numeric_limits<float>::max();
    int axis = 0;
    float split = 0.0f;
    for (int saxis = 0; saxis < 3; saxis++) {
      if (comp(csize, saxis) == 0) continue;
      for (int b = 1; b < nbins; b++) {
        float bsplit = comp(cmin, saxis) + b * comp(csize, saxis) / nbins;
        Vec3 lmin = {0, 0, 0}, lmax = {0, 0, 0}, rmin = {0, 0, 0},
             rmax = {0, 0, 0};
        int nl = 0, nr = 0;
        for (int i = start; i < end; i++) {
          int32_t prim = primitives[i];
          if (comp(centers[prim], saxis) < bsplit) {
            if (nl == 0) {
              lmin = bmin[prim];
              lmax = bmax[prim];
            } else {
              lmin = vmin(lmin, bmin[prim]);
              lmax = vmax(lmax, bmax[prim]);
            }
            nl++;
          } else {
            if (nr == 0) {
              rmin = bmin[prim];
              rmax = bmax[prim];
            } else {
              rmin = vmin(rmin, bmin[prim]);
              rmax = vmax(rmax, bmax[prim]);
            }
            nr++;
          }
        }
        float la = nl ? bbox_area(lmin, lmax) : 1e-12f;
        float ra = nr ? bbox_area(rmin, rmax) : 1e-12f;
        float cost = 1 + nl * la / cb_area + nr * ra / cb_area;
        if (cost < min_cost) {
          min_cost = cost;
          axis = saxis;
          split = bsplit;
        }
      }
    }
    auto* mid_p = std::stable_partition(
        primitives + start, primitives + end, [&](int32_t prim) {
          return comp(centers[prim], axis) < split;
        });
    int middle = int(mid_p - primitives);
    if (middle == start || middle == end) return {(start + end) / 2, axis};
    return {middle, axis};
  }

  int build() {
    if (nprims == 0) return 0;
    centers.resize(nprims);
    for (int i = 0; i < nprims; i++) {
      centers[i] = {(bmin[i].x + bmax[i].x) / 2, (bmin[i].y + bmax[i].y) / 2,
                    (bmin[i].z + bmax[i].z) / 2};
      primitives[i] = i;
    }
    struct Item {
      int nodeid, start, end;
    };
    std::vector<Item> stack;
    stack.push_back({0, 0, nprims});
    n_nodes = 1;
    while (!stack.empty()) {
      auto [nodeid, start, end] = stack.back();
      stack.pop_back();
      Vec3 lo = bmin[primitives[start]], hi = bmax[primitives[start]];
      for (int i = start + 1; i < end; i++) {
        lo = vmin(lo, bmin[primitives[i]]);
        hi = vmax(hi, bmax[primitives[i]]);
      }
      std::memcpy(node_bmin + nodeid * 3, &lo, 12);
      std::memcpy(node_bmax + nodeid * 3, &hi, 12);
      if (end - start > max_prims) {
        auto [mid, axis] =
            highquality ? split_sah(start, end) : split_middle(start, end);
        int child = n_nodes;
        n_nodes += 2;
        node_internal[nodeid] = 1;
        node_axis[nodeid] = axis;
        node_num[nodeid] = 2;
        node_start[nodeid] = child;
        stack.push_back({child, start, mid});
        stack.push_back({child + 1, mid, end});
      } else {
        node_internal[nodeid] = 0;
        node_axis[nodeid] = 0;
        node_num[nodeid] = end - start;
        node_start[nodeid] = start;
      }
    }
    return n_nodes;
  }
};

}  // namespace

extern "C" {

// bboxes: [nprims, 2, 3] float32 (min, max interleaved). Outputs must be
// preallocated with capacity 2*nprims (nodes) and nprims (primitives).
// Returns node count, or -1 on error.
int ytpu_build_bvh(const float* bboxes, int nprims, int highquality,
                   int max_prims, float* node_bmin, float* node_bmax,
                   int32_t* node_start, int32_t* node_num, int32_t* node_axis,
                   uint8_t* node_internal, int32_t* primitives) {
  if (nprims <= 0) return 0;
  // deinterleave into separate min/max views
  static thread_local std::vector<Vec3> mins, maxs;
  mins.resize(nprims);
  maxs.resize(nprims);
  for (int i = 0; i < nprims; i++) {
    std::memcpy(&mins[i], bboxes + i * 6, 12);
    std::memcpy(&maxs[i], bboxes + i * 6 + 3, 12);
  }
  Builder b;
  b.bmin = mins.data();
  b.bmax = maxs.data();
  b.primitives = primitives;
  b.nprims = nprims;
  b.highquality = highquality != 0;
  b.max_prims = max_prims;
  b.node_bmin = node_bmin;
  b.node_bmax = node_bmax;
  b.node_start = node_start;
  b.node_num = node_num;
  b.node_axis = node_axis;
  b.node_internal = node_internal;
  return b.build();
}
}
