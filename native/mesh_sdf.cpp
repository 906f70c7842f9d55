// mesh_sdf — BVH-accelerated triangle-mesh → signed-distance-grid baking.
//
// Native counterpart of the habitat-sim fork's CGAL closest-point machinery
// (the reason the reference requires CGAL, SURVEY §2.1): imported GLB/OBJ
// scenes are preprocessed ONCE on the host into the dense SDF grids consumed
// by the TPU grid backend (visfly_tpu/scene/scene.py). Exposed through a
// plain C ABI for ctypes.
//
//   * BVH: binary median-split over triangle centroids, flattened arrays.
//   * distance: exact point-to-triangle distance with branch-and-bound BVH
//     traversal (explicit stack).
//   * sign: ray-crossing parity along +x (robust for closed meshes; open
//     meshes fall back to unsigned distance).
//
// Build:  g++ -O3 -march=native -shared -fPIC -fopenmp mesh_sdf.cpp -o libmesh_sdf.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline Vec3 minv(Vec3 a, Vec3 b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 maxv(Vec3 a, Vec3 b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

// squared distance point → triangle (Ericson, Real-Time Collision Detection)
float tri_dist_sq(Vec3 p, Vec3 a, Vec3 b, Vec3 c) {
  Vec3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { Vec3 d = sub(p, a); return dot(d, d); }
  Vec3 bp = sub(p, b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { Vec3 d = sub(p, b); return dot(d, d); }
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    Vec3 q = {a.x + v * ab.x, a.y + v * ab.y, a.z + v * ab.z};
    Vec3 d = sub(p, q);
    return dot(d, d);
  }
  Vec3 cp = sub(p, c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { Vec3 d = sub(p, c); return dot(d, d); }
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    Vec3 q = {a.x + w * ac.x, a.y + w * ac.y, a.z + w * ac.z};
    Vec3 d = sub(p, q);
    return dot(d, d);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    Vec3 bc = sub(c, b);
    Vec3 q = {b.x + w * bc.x, b.y + w * bc.y, b.z + w * bc.z};
    Vec3 d = sub(p, q);
    return dot(d, d);
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  Vec3 q = {a.x + v * ab.x + w * ac.x, a.y + v * ab.y + w * ac.y,
            a.z + v * ab.z + w * ac.z};
  Vec3 d = sub(p, q);
  return dot(d, d);
}

struct BVHNode {
  Vec3 bmin, bmax;
  int left;   // child index or first-triangle index when leaf
  int count;  // 0 = inner node; >0 leaf triangle count
};

struct BVH {
  std::vector<BVHNode> nodes;
  std::vector<int> tri_order;
  const float* verts;
  const int* tris;

  Vec3 v(int tri, int corner) const {
    int idx = tris[tri * 3 + corner];
    return {verts[idx * 3], verts[idx * 3 + 1], verts[idx * 3 + 2]};
  }

  void build(const float* verts_, int, const int* tris_, int n_tris) {
    verts = verts_;
    tris = tris_;
    tri_order.resize(n_tris);
    std::iota(tri_order.begin(), tri_order.end(), 0);
    std::vector<Vec3> centroids(n_tris);
    for (int t = 0; t < n_tris; ++t) {
      Vec3 a = v(t, 0), b = v(t, 1), c = v(t, 2);
      centroids[t] = {(a.x + b.x + c.x) / 3, (a.y + b.y + c.y) / 3,
                      (a.z + b.z + c.z) / 3};
    }
    nodes.reserve(2 * n_tris);
    build_node(0, n_tris, centroids);
  }

  int build_node(int begin, int end, const std::vector<Vec3>& centroids) {
    int node_idx = (int)nodes.size();
    nodes.push_back({});
    Vec3 bmin = {FLT_MAX, FLT_MAX, FLT_MAX}, bmax = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
    for (int i = begin; i < end; ++i) {
      int t = tri_order[i];
      for (int c = 0; c < 3; ++c) {
        bmin = minv(bmin, v(t, c));
        bmax = maxv(bmax, v(t, c));
      }
    }
    BVHNode& node = nodes[node_idx];
    node.bmin = bmin;
    node.bmax = bmax;
    int n = end - begin;
    if (n <= 4) {
      node.left = begin;
      node.count = n;
      return node_idx;
    }
    Vec3 ext = sub(bmax, bmin);
    int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
    int mid = (begin + end) / 2;
    std::nth_element(
        tri_order.begin() + begin, tri_order.begin() + mid,
        tri_order.begin() + end, [&](int ta, int tb) {
          const Vec3& ca = centroids[ta];
          const Vec3& cb = centroids[tb];
          return axis == 0 ? ca.x < cb.x : (axis == 1 ? ca.y < cb.y : ca.z < cb.z);
        });
    int li = build_node(begin, mid, centroids);
    int ri = build_node(mid, end, centroids);
    nodes[node_idx].left = li;
    nodes[node_idx].count = 0;
    (void)ri;  // right child is always left+subtree; store explicitly:
    nodes[node_idx].bmin = bmin;  // re-fetch (vector may have reallocated)
    nodes[node_idx].bmax = bmax;
    right_child.resize(nodes.size(), -1);
    right_child[node_idx] = ri;
    return node_idx;
  }

  std::vector<int> right_child;

  float box_dist_sq(Vec3 p, const BVHNode& n) const {
    float dx = std::max({n.bmin.x - p.x, 0.0f, p.x - n.bmax.x});
    float dy = std::max({n.bmin.y - p.y, 0.0f, p.y - n.bmax.y});
    float dz = std::max({n.bmin.z - p.z, 0.0f, p.z - n.bmax.z});
    return dx * dx + dy * dy + dz * dz;
  }

  float closest_dist(Vec3 p) const {
    float best = FLT_MAX;
    int stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (box_dist_sq(p, n) >= best) continue;
      if (n.count > 0) {
        for (int i = 0; i < n.count; ++i) {
          int t = tri_order[n.left + i];
          best = std::min(best, tri_dist_sq(p, v(t, 0), v(t, 1), v(t, 2)));
        }
      } else {
        int l = n.left, r = right_child[ni];
        float dl = box_dist_sq(p, nodes[l]);
        float dr = box_dist_sq(p, nodes[r]);
        // near child last (popped first)
        if (dl < dr) {
          if (dr < best && sp < 127) stack[sp++] = r;
          if (dl < best && sp < 127) stack[sp++] = l;
        } else {
          if (dl < best && sp < 127) stack[sp++] = l;
          if (dr < best && sp < 127) stack[sp++] = r;
        }
      }
    }
    return std::sqrt(best);
  }

  // parity of +x ray crossings (watertight-ish sign test)
  int crossings_x(Vec3 p) const {
    int count = 0;
    int stack[128];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int ni = stack[--sp];
      const BVHNode& n = nodes[ni];
      if (p.x > n.bmax.x || p.y < n.bmin.y || p.y > n.bmax.y ||
          p.z < n.bmin.z || p.z > n.bmax.z)
        continue;
      if (n.count > 0) {
        for (int i = 0; i < n.count; ++i) {
          int t = tri_order[n.left + i];
          Vec3 a = v(t, 0), b = v(t, 1), c = v(t, 2);
          // Möller–Trumbore with dir = +x
          Vec3 e1 = sub(b, a), e2 = sub(c, a);
          Vec3 dirv = {1.0f, 0.0f, 0.0f};
          Vec3 hh = cross(dirv, e2);
          float a_det = dot(e1, hh);
          if (std::fabs(a_det) < 1e-12f) continue;
          float f = 1.0f / a_det;
          Vec3 s = sub(p, a);
          float u = f * dot(s, hh);
          if (u < 0 || u > 1) continue;
          Vec3 q = cross(s, e1);
          float vv = f * dot(dirv, q);
          if (vv < 0 || u + vv > 1) continue;
          float tt = f * dot(e2, q);
          if (tt > 1e-7f) ++count;
        }
      } else {
        if (sp < 126) {
          stack[sp++] = n.left;
          stack[sp++] = right_child[ni];
        }
      }
    }
    return count;
  }
};

}  // namespace

extern "C" {

// Bake a signed distance grid. dims = [nx, ny, nz]; out has nx*ny*nz floats
// (x-major, matching the (X, Y, Z) device layout). signed_mode: 0 unsigned,
// 1 ray-parity sign.
int mesh_to_sdf(const float* verts, int n_verts, const int* tris, int n_tris,
                const float* origin, float spacing, const int* dims,
                int signed_mode, float* out) {
  if (n_tris <= 0 || n_verts <= 0) return -1;
  BVH bvh;
  bvh.build(verts, n_verts, tris, n_tris);
  int nx = dims[0], ny = dims[1], nz = dims[2];
#pragma omp parallel for collapse(2) schedule(dynamic, 4)
  for (int ix = 0; ix < nx; ++ix) {
    for (int iy = 0; iy < ny; ++iy) {
      for (int iz = 0; iz < nz; ++iz) {
        Vec3 p = {origin[0] + ix * spacing, origin[1] + iy * spacing,
                  origin[2] + iz * spacing};
        float d = bvh.closest_dist(p);
        if (signed_mode) {
          // jitter the parity ray off exact grid alignment so it cannot run
          // through shared triangle edges/vertices (double counting)
          Vec3 pj = {p.x, p.y + 7.3e-5f * spacing, p.z + 3.1e-5f * spacing};
          if (bvh.crossings_x(pj) & 1) d = -d;
        }
        out[((int64_t)ix * ny + iy) * nz + iz] = d;
      }
    }
  }
  return 0;
}

// Batched closest-distance queries (host-side spawn checks / debugging).
int mesh_closest_dists(const float* verts, int n_verts, const int* tris,
                       int n_tris, const float* points, int n_points,
                       float* out) {
  if (n_tris <= 0) return -1;
  BVH bvh;
  bvh.build(verts, n_verts, tris, n_tris);
#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < n_points; ++i) {
    Vec3 p = {points[i * 3], points[i * 3 + 1], points[i * 3 + 2]};
    out[i] = bvh.closest_dist(p);
  }
  return 0;
}
}
