// Host-side triangle BVH: signed distance + ray casting.
//
// Native-runtime equivalent of the reference's cubvh CUDA extension
// (reference tropical/stanford/dataset.py:77,92 and
// tropical/utils/chamfer_distance.py:192-195).  The TPU brute-force kernels in
// tropical/ops/mesh_queries.py are the on-device path; this library serves
// hosts without an accelerator and doubles as an independent oracle in tests.
//
// Build: make -C tropical/csrc   (g++ -O2 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline V3 add(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline V3 mul(V3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}

struct AABB {
  V3 lo{1e30f, 1e30f, 1e30f};
  V3 hi{-1e30f, -1e30f, -1e30f};
  void grow(V3 p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
  float dist2(V3 p) const {
    float dx = std::max({lo.x - p.x, 0.0f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.0f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.0f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
  // slab test; returns entry t or +inf
  float ray_hit(V3 o, V3 inv_d, float tmax) const {
    float t0 = (lo.x - o.x) * inv_d.x, t1 = (hi.x - o.x) * inv_d.x;
    float tmin_ = std::min(t0, t1), tmax_ = std::max(t0, t1);
    t0 = (lo.y - o.y) * inv_d.y; t1 = (hi.y - o.y) * inv_d.y;
    tmin_ = std::max(tmin_, std::min(t0, t1));
    tmax_ = std::min(tmax_, std::max(t0, t1));
    t0 = (lo.z - o.z) * inv_d.z; t1 = (hi.z - o.z) * inv_d.z;
    tmin_ = std::max(tmin_, std::min(t0, t1));
    tmax_ = std::min(tmax_, std::max(t0, t1));
    if (tmax_ < std::max(tmin_, 0.0f) || tmin_ > tmax) return 1e30f;
    return std::max(tmin_, 0.0f);
  }
};

struct Node {
  AABB box;
  int left = -1, right = -1;  // internal children
  int start = 0, count = 0;   // leaf triangle range
};

struct BVH {
  std::vector<V3> v0, e1, e2;  // per-tri vertex + edges (traversal layout)
  std::vector<int> tri_ids;    // original face id per (reordered) triangle
  std::vector<Node> nodes;

  float closest2(V3 p) const;
  bool trace(V3 o, V3 d, float& t_out, int& id_out) const;
  int count_hits(V3 o, V3 d) const;
};

static float tri_dist2(V3 p, V3 a, V3 b, V3 c) {
  // Ericson 5.1.5 closest point on triangle
  V3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
  float d1 = dot(ab, ap), d2 = dot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { V3 d = sub(p, a); return dot(d, d); }
  V3 bp = sub(p, b);
  float d3 = dot(ab, bp), d4 = dot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { V3 d = sub(p, b); return dot(d, d); }
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    V3 q = add(a, mul(ab, v)); V3 d = sub(p, q); return dot(d, d);
  }
  V3 cp = sub(p, c);
  float d5 = dot(ab, cp), d6 = dot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { V3 d = sub(p, c); return dot(d, d); }
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    V3 q = add(a, mul(ac, w)); V3 d = sub(p, q); return dot(d, d);
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    V3 q = add(b, mul(sub(c, b), w)); V3 d = sub(p, q); return dot(d, d);
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  V3 q = add(a, add(mul(ab, v), mul(ac, w)));
  V3 d = sub(p, q); return dot(d, d);
}

float BVH::closest2(V3 p) const {
  float best = 1e30f;
  int stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = nodes[stack[--sp]];
    if (n.box.dist2(p) >= best) continue;
    if (n.left < 0) {  // leaf by child sentinel: a 0-tri mesh has an
                       // empty-leaf root, and `count` can't tell it apart
                       // from an internal node
      for (int i = n.start; i < n.start + n.count; ++i) {
        V3 a = v0[i];
        best = std::min(best, tri_dist2(p, a, add(a, e1[i]), add(a, e2[i])));
      }
    } else {
      // visit nearer child first
      float dl = nodes[n.left].box.dist2(p);
      float dr = nodes[n.right].box.dist2(p);
      if (dl < dr) { stack[sp++] = n.right; stack[sp++] = n.left; }
      else { stack[sp++] = n.left; stack[sp++] = n.right; }
    }
  }
  return best;
}

static inline bool mt_ray(V3 o, V3 d, V3 a, V3 e1v, V3 e2v, float& t,
                          float eps = 1e-9f) {
  V3 h = cross(d, e2v);
  float det = dot(e1v, h);
  if (std::fabs(det) < eps) return false;
  float inv = 1.0f / det;
  V3 s = sub(o, a);
  float u = dot(s, h) * inv;
  if (u < 0 || u > 1) return false;
  V3 q = cross(s, e1v);
  float v = dot(d, q) * inv;
  if (v < 0 || u + v > 1) return false;
  t = dot(e2v, q) * inv;
  return t > 1e-6f;
}

bool BVH::trace(V3 o, V3 d, float& t_out, int& id_out) const {
  V3 inv{1.0f / d.x, 1.0f / d.y, 1.0f / d.z};
  float best = 1e30f;
  int best_id = -1;
  int stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = nodes[stack[--sp]];
    if (n.box.ray_hit(o, inv, best) >= best) continue;
    if (n.left < 0) {  // leaf (see closest2: count==0 root)
      for (int i = n.start; i < n.start + n.count; ++i) {
        float t;
        if (mt_ray(o, d, v0[i], e1[i], e2[i], t) && t < best) {
          best = t;
          best_id = tri_ids[i];
        }
      }
    } else {
      stack[sp++] = n.left;
      stack[sp++] = n.right;
    }
  }
  t_out = best;
  id_out = best_id;
  return best_id >= 0;
}

int BVH::count_hits(V3 o, V3 d) const {
  V3 inv{1.0f / d.x, 1.0f / d.y, 1.0f / d.z};
  int hits = 0;
  int stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    const Node& n = nodes[stack[--sp]];
    if (n.box.ray_hit(o, inv, 1e30f) >= 1e30f) continue;
    if (n.left < 0) {  // leaf (see closest2: count==0 root)
      for (int i = n.start; i < n.start + n.count; ++i) {
        float t;
        if (mt_ray(o, d, v0[i], e1[i], e2[i], t)) ++hits;
      }
    } else {
      stack[sp++] = n.left;
      stack[sp++] = n.right;
    }
  }
  return hits;
}

struct BuildTri {
  AABB box;
  V3 centroid;
  int id;
};

static int build_node(BVH& bvh, std::vector<BuildTri>& tris,
                      std::vector<V3>& va, std::vector<V3>& vb,
                      std::vector<V3>& vc, int lo, int hi) {
  int idx = (int)bvh.nodes.size();
  bvh.nodes.emplace_back();
  AABB box;
  for (int i = lo; i < hi; ++i) box.grow(tris[i].box);
  bvh.nodes[idx].box = box;

  int count = hi - lo;
  if (count <= 4) {
    bvh.nodes[idx].start = (int)bvh.v0.size();
    bvh.nodes[idx].count = count;
    for (int i = lo; i < hi; ++i) {
      int id = tris[i].id;
      bvh.v0.push_back(va[id]);
      bvh.e1.push_back(sub(vb[id], va[id]));
      bvh.e2.push_back(sub(vc[id], va[id]));
      bvh.tri_ids.push_back(id);
    }
    return idx;
  }

  // split on the widest centroid axis at the median
  AABB cb;
  for (int i = lo; i < hi; ++i) cb.grow(tris[i].centroid);
  V3 ext = sub(cb.hi, cb.lo);
  int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
  int mid = (lo + hi) / 2;
  std::nth_element(tris.begin() + lo, tris.begin() + mid, tris.begin() + hi,
                   [axis](const BuildTri& a, const BuildTri& b) {
                     const float* pa = &a.centroid.x;
                     const float* pb = &b.centroid.x;
                     return pa[axis] < pb[axis];
                   });
  int l = build_node(bvh, tris, va, vb, vc, lo, mid);
  int r = build_node(bvh, tris, va, vb, vc, mid, hi);
  bvh.nodes[idx].left = l;
  bvh.nodes[idx].right = r;
  return idx;
}

}  // namespace

extern "C" {

void* bvh_build(const float* verts, int nv, const int* faces, int nf) {
  (void)nv;
  auto* bvh = new BVH();
  std::vector<V3> va(nf), vb(nf), vc(nf);
  std::vector<BuildTri> tris(nf);
  for (int i = 0; i < nf; ++i) {
    const int* f = faces + 3 * i;
    va[i] = {verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    vb[i] = {verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    vc[i] = {verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
    tris[i].box.grow(va[i]);
    tris[i].box.grow(vb[i]);
    tris[i].box.grow(vc[i]);
    tris[i].centroid = mul(add(add(va[i], vb[i]), vc[i]), 1.0f / 3.0f);
    tris[i].id = i;
  }
  bvh->v0.reserve(nf);
  bvh->e1.reserve(nf);
  bvh->e2.reserve(nf);
  bvh->tri_ids.reserve(nf);
  build_node(*bvh, tris, va, vb, vc, 0, nf);
  return bvh;
}

void bvh_free(void* h) { delete static_cast<BVH*>(h); }

void bvh_unsigned_distance(void* h, const float* pts, int n, float* out) {
  auto* bvh = static_cast<BVH*>(h);
  for (int i = 0; i < n; ++i) {
    V3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    out[i] = std::sqrt(bvh->closest2(p));
  }
}

// signed distance, positive inside (parity of crossings along a fixed
// irrational-ish direction; cubvh label convention per reference dataset.py:96)
void bvh_signed_distance(void* h, const float* pts, int n, float* out) {
  auto* bvh = static_cast<BVH*>(h);
  V3 dir{0.57123f, 0.68921f, 0.44537f};
  float nl = std::sqrt(dot(dir, dir));
  dir = mul(dir, 1.0f / nl);
  for (int i = 0; i < n; ++i) {
    V3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    float d = std::sqrt(bvh->closest2(p));
    int hits = bvh->count_hits(p, dir);
    out[i] = (hits % 2 == 1) ? d : -d;
  }
}

void bvh_ray_trace(void* h, const float* o, const float* d, int n, float* pos,
                   int* fid, float* t) {
  auto* bvh = static_cast<BVH*>(h);
  for (int i = 0; i < n; ++i) {
    V3 ro{o[3 * i], o[3 * i + 1], o[3 * i + 2]};
    V3 rd{d[3 * i], d[3 * i + 1], d[3 * i + 2]};
    float ti;
    int id;
    if (bvh->trace(ro, rd, ti, id)) {
      fid[i] = id;
      t[i] = ti;
      V3 p = add(ro, mul(rd, ti));
      pos[3 * i] = p.x; pos[3 * i + 1] = p.y; pos[3 * i + 2] = p.z;
    } else {
      fid[i] = -1;
      t[i] = 0;
      pos[3 * i] = ro.x; pos[3 * i + 1] = ro.y; pos[3 * i + 2] = ro.z;
    }
  }
}

}  // extern "C"
