// Native host-side mesh kernels.
//
// reference behavior: src/colmap/mvs/mesh_simplification.{h,cc} wraps CGAL's
// Surface_mesh_simplification edge-collapse with a stop ratio. Re-built here
// as a standalone Garland–Heckbert quadric edge-collapse (no CGAL
// dependency), exposed via a C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libmesh_ops.so mesh_ops.cpp

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <queue>
#include <set>
#include <vector>

namespace {

struct Quadric {
  // Symmetric 4x4: a2 ab ac ad; b2 bc bd; c2 cd; d2.
  double q[10] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0};

  void AddPlane(double a, double b, double c, double d, double w) {
    q[0] += w * a * a;
    q[1] += w * a * b;
    q[2] += w * a * c;
    q[3] += w * a * d;
    q[4] += w * b * b;
    q[5] += w * b * c;
    q[6] += w * b * d;
    q[7] += w * c * c;
    q[8] += w * c * d;
    q[9] += w * d * d;
  }

  void Add(const Quadric& o) {
    for (int i = 0; i < 10; ++i) q[i] += o.q[i];
  }

  double Eval(double x, double y, double z) const {
    return q[0] * x * x + 2 * q[1] * x * y + 2 * q[2] * x * z +
           2 * q[3] * x + q[4] * y * y + 2 * q[5] * y * z + 2 * q[6] * y +
           q[7] * z * z + 2 * q[8] * z + q[9];
  }

  // Solve for the minimizing position; returns false if near-singular.
  bool Optimum(double* x, double* y, double* z) const {
    const double a11 = q[0], a12 = q[1], a13 = q[2];
    const double a22 = q[4], a23 = q[5], a33 = q[7];
    const double det = a11 * (a22 * a33 - a23 * a23) -
                       a12 * (a12 * a33 - a23 * a13) +
                       a13 * (a12 * a23 - a22 * a13);
    if (std::fabs(det) < 1e-12) return false;
    const double b1 = -q[3], b2 = -q[6], b3 = -q[8];
    const double inv = 1.0 / det;
    *x = inv * (b1 * (a22 * a33 - a23 * a23) + b2 * (a13 * a23 - a12 * a33) +
                b3 * (a12 * a23 - a13 * a22));
    *y = inv * (b1 * (a23 * a13 - a12 * a33) + b2 * (a11 * a33 - a13 * a13) +
                b3 * (a12 * a13 - a11 * a23));
    *z = inv * (b1 * (a12 * a23 - a22 * a13) + b2 * (a12 * a13 - a11 * a23) +
                b3 * (a11 * a22 - a12 * a12));
    return true;
  }
};

struct HeapEntry {
  double cost;
  int64_t v1, v2;
  uint64_t stamp;  // max of version stamps at push time
  bool operator>(const HeapEntry& o) const { return cost > o.cost; }
};

}  // namespace

extern "C" {

// Quadric edge-collapse simplification to ~target_num_faces.
// verts: nv x 3 float64 (in); faces: nf x 3 int64 (in).
// out buffers sized for the input; returns actual counts via out params.
void simplify_mesh(const double* verts, int64_t nv, const int64_t* faces,
                   int64_t nf, int64_t target_num_faces, double* out_verts,
                   int64_t* out_nv, int64_t* out_faces, int64_t* out_nf) {
  std::vector<double> px(nv), py(nv), pz(nv);
  for (int64_t i = 0; i < nv; ++i) {
    px[i] = verts[3 * i];
    py[i] = verts[3 * i + 1];
    pz[i] = verts[3 * i + 2];
  }
  std::vector<Quadric> Q(nv);
  std::vector<std::set<int64_t>> vfaces(nv);  // incident face ids
  std::vector<std::array<int64_t, 3>> F(nf);
  std::vector<bool> face_alive(nf, true);

  auto face_plane = [&](int64_t f, double* a, double* b, double* c,
                        double* d, double* area) {
    const int64_t i = F[f][0], j = F[f][1], k = F[f][2];
    const double ux = px[j] - px[i], uy = py[j] - py[i], uz = pz[j] - pz[i];
    const double vx = px[k] - px[i], vy = py[k] - py[i], vz = pz[k] - pz[i];
    double nx = uy * vz - uz * vy;
    double ny = uz * vx - ux * vz;
    double nz = ux * vy - uy * vx;
    const double len = std::sqrt(nx * nx + ny * ny + nz * nz);
    *area = 0.5 * len;
    if (len < 1e-30) {
      *a = *b = *c = *d = 0;
      return;
    }
    nx /= len;
    ny /= len;
    nz /= len;
    *a = nx;
    *b = ny;
    *c = nz;
    *d = -(nx * px[i] + ny * py[i] + nz * pz[i]);
  };

  for (int64_t f = 0; f < nf; ++f) {
    F[f] = {faces[3 * f], faces[3 * f + 1], faces[3 * f + 2]};
    double a, b, c, d, area;
    face_plane(f, &a, &b, &c, &d, &area);
    for (int v = 0; v < 3; ++v) {
      Q[F[f][v]].AddPlane(a, b, c, d, area);
      vfaces[F[f][v]].insert(f);
    }
  }

  std::vector<uint64_t> version(nv, 0);
  std::priority_queue<HeapEntry, std::vector<HeapEntry>,
                      std::greater<HeapEntry>> heap;

  auto push_edge = [&](int64_t v1, int64_t v2) {
    if (v1 == v2) return;
    if (v1 > v2) std::swap(v1, v2);
    Quadric q = Q[v1];
    q.Add(Q[v2]);
    double x, y, z;
    if (!q.Optimum(&x, &y, &z)) {
      x = 0.5 * (px[v1] + px[v2]);
      y = 0.5 * (py[v1] + py[v2]);
      z = 0.5 * (pz[v1] + pz[v2]);
    }
    heap.push({q.Eval(x, y, z), v1, v2, version[v1] + version[v2]});
  };

  std::set<std::pair<int64_t, int64_t>> edges;
  for (int64_t f = 0; f < nf; ++f) {
    for (int e = 0; e < 3; ++e) {
      int64_t a = F[f][e], b = F[f][(e + 1) % 3];
      if (a > b) std::swap(a, b);
      edges.insert({a, b});
    }
  }
  for (const auto& e : edges) push_edge(e.first, e.second);

  std::vector<int64_t> remap(nv);
  for (int64_t i = 0; i < nv; ++i) remap[i] = i;
  auto find = [&](int64_t v) {
    while (remap[v] != v) {
      remap[v] = remap[remap[v]];
      v = remap[v];
    }
    return v;
  };

  int64_t alive_faces = nf;
  while (alive_faces > target_num_faces && !heap.empty()) {
    HeapEntry top = heap.top();
    heap.pop();
    int64_t v1 = find(top.v1), v2 = find(top.v2);
    if (v1 == v2) continue;
    if (top.stamp != version[top.v1] + version[top.v2]) continue;  // stale

    // Collapse v2 -> v1 at the optimal position.
    Quadric q = Q[v1];
    q.Add(Q[v2]);
    double x, y, z;
    if (!q.Optimum(&x, &y, &z)) {
      x = 0.5 * (px[v1] + px[v2]);
      y = 0.5 * (py[v1] + py[v2]);
      z = 0.5 * (pz[v1] + pz[v2]);
    }
    px[v1] = x;
    py[v1] = y;
    pz[v1] = z;
    Q[v1] = q;
    remap[v2] = v1;
    version[v1]++;
    version[v2]++;

    // Merge incident faces; kill degenerate ones.
    std::set<int64_t> nbr_verts;
    for (int64_t f : vfaces[v2]) vfaces[v1].insert(f);
    vfaces[v2].clear();
    std::vector<int64_t> dead;
    for (int64_t f : vfaces[v1]) {
      if (!face_alive[f]) {
        dead.push_back(f);
        continue;
      }
      for (int v = 0; v < 3; ++v) F[f][v] = find(F[f][v]);
      if (F[f][0] == F[f][1] || F[f][1] == F[f][2] || F[f][0] == F[f][2]) {
        face_alive[f] = false;
        --alive_faces;
        dead.push_back(f);
      } else {
        for (int v = 0; v < 3; ++v)
          if (F[f][v] != v1) nbr_verts.insert(F[f][v]);
      }
    }
    for (int64_t f : dead) vfaces[v1].erase(f);
    for (int64_t v : nbr_verts) push_edge(v1, v);
  }

  // Compact output.
  std::vector<int64_t> new_id(nv, -1);
  int64_t vcount = 0;
  int64_t fcount = 0;
  for (int64_t f = 0; f < nf; ++f) {
    if (!face_alive[f]) continue;
    int64_t ids[3];
    bool ok = true;
    for (int v = 0; v < 3; ++v) {
      ids[v] = find(F[f][v]);
    }
    if (ids[0] == ids[1] || ids[1] == ids[2] || ids[0] == ids[2]) ok = false;
    if (!ok) continue;
    for (int v = 0; v < 3; ++v) {
      if (new_id[ids[v]] < 0) {
        new_id[ids[v]] = vcount;
        out_verts[3 * vcount] = px[ids[v]];
        out_verts[3 * vcount + 1] = py[ids[v]];
        out_verts[3 * vcount + 2] = pz[ids[v]];
        ++vcount;
      }
      out_faces[3 * fcount + v] = new_id[ids[v]];
    }
    ++fcount;
  }
  *out_nv = vcount;
  *out_nf = fcount;
}

}  // extern "C"
