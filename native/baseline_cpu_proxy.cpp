// Measured CPU baseline proxy for BASELINE.md.
//
// The reference framework (ngsxfem on NGSolve) is not installable in this
// environment, so the benchmark baseline was an ESTIMATE (2e4 cut 3D P1
// elements/s/core).  This program replaces the guess with a MEASUREMENT:
// a straightforward single-threaded C++ implementation — written from
// scratch, not copied — of the reference's per-element algorithm
// (cutint/straightcutrule.cpp semantics: vertex-sign classification,
// sub-simplex decomposition of the NEG part, quadrature-loop element
// stiffness, sparse scatter) on the same workload as bench.py
// (structured tet mesh, sphere level set, P1 fictitious-domain stiffness).
//
// It measures STRICTLY LESS work per element than the reference pipeline
// (no ghost penalty, no Nitsche interface terms, no solve, no NGSolve
// abstraction layers), so its elements/s is an UPPER bound on what the
// reference's full per-core pipeline rate could be on this host — i.e. a
// conservative (large) denominator for vs_baseline.
//
// Build + run (tools/baseline_cpu.py drives this):
//   g++ -O3 -march=native -std=c++17 baseline_cpu_proxy.cpp -o baseline_proxy
//   ./baseline_proxy <nx>
// Prints one JSON line: ne, ncut, neg_volume (validated against the
// analytic sphere volume by the driver), assemble_seconds, elts_per_sec.
#include <cstdio>
#include <cstdlib>
#include <cmath>
#include <cstring>
#include <chrono>
#include <vector>
#include <algorithm>

struct V3 { double x, y, z; };
static inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline double det3(V3 a, V3 b, V3 c) {
  return a.x * (b.y * c.z - b.z * c.y)
       - a.y * (b.x * c.z - b.z * c.x)
       + a.z * (b.x * c.y - b.y * c.x);
}
static inline V3 lerp(V3 a, V3 b, double t) {
  return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)};
}

// 4-point order-2 rule on the reference tetrahedron (barycentric a,b,b,b)
static const double QA = 0.5854101966249685, QB = 0.1381966011250105;
static const double QP[4][4] = {
  {QA, QB, QB, QB}, {QB, QA, QB, QB}, {QB, QB, QA, QB}, {QB, QB, QB, QA}};

int main(int argc, char **argv) {
  const int nx = argc > 1 ? atoi(argv[1]) : 48;
  const int nv1 = nx + 1;
  const double h = 1.0 / nx;
  const double cx = 0.5, cy = 0.5, cz = 0.5, R = 0.3;

  // vertex lattice + level set (sphere), matching bench.py's workload shape
  const long nvert = (long)nv1 * nv1 * nv1;
  std::vector<V3> vert(nvert);
  std::vector<double> phi(nvert);
  for (int k = 0; k < nv1; ++k)
    for (int j = 0; j < nv1; ++j)
      for (int i = 0; i < nv1; ++i) {
        long id = (long)k * nv1 * nv1 + (long)j * nv1 + i;
        V3 p = {i * h, j * h, k * h};
        vert[id] = p;
        phi[id] = std::sqrt((p.x - cx) * (p.x - cx) + (p.y - cy) * (p.y - cy)
                            + (p.z - cz) * (p.z - cz)) - R;
      }

  // 6 tets per cube (Kuhn split), same connectivity family as
  // ngsxfem_tpu/mesh/structured.py
  static const int KUHN[6][4][3] = {
    {{0,0,0},{1,0,0},{1,1,0},{1,1,1}}, {{0,0,0},{1,0,0},{1,0,1},{1,1,1}},
    {{0,0,0},{0,1,0},{1,1,0},{1,1,1}}, {{0,0,0},{0,1,0},{0,1,1},{1,1,1}},
    {{0,0,0},{0,0,1},{1,0,1},{1,1,1}}, {{0,0,0},{0,0,1},{0,1,1},{1,1,1}}};
  const long ne = 6L * nx * nx * nx;
  std::vector<int> elem((size_t)ne * 4);
  {
    long e = 0;
    for (int k = 0; k < nx; ++k)
      for (int j = 0; j < nx; ++j)
        for (int i = 0; i < nx; ++i)
          for (int t = 0; t < 6; ++t, ++e)
            for (int c = 0; c < 4; ++c) {
              int ii = i + KUHN[t][c][0], jj = j + KUHN[t][c][1],
                  kk = k + KUHN[t][c][2];
              elem[e * 4 + c] =
                  (int)((long)kk * nv1 * nv1 + (long)jj * nv1 + ii);
            }
  }

  // CSR graph (prebuilt, untimed — the reference prebuilds its sparse
  // graph too; only numeric assembly below is timed)
  std::vector<std::vector<int>> adj(nvert);
  for (long e = 0; e < ne; ++e)
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        adj[elem[e * 4 + a]].push_back(elem[e * 4 + b]);
  std::vector<long> rowptr(nvert + 1, 0);
  std::vector<int> colind;
  colind.reserve(27 * nvert);
  for (long r = 0; r < nvert; ++r) {
    auto &v = adj[r];
    std::sort(v.begin(), v.end());
    v.erase(std::unique(v.begin(), v.end()), v.end());
    rowptr[r + 1] = rowptr[r] + (long)v.size();
    colind.insert(colind.end(), v.begin(), v.end());
    std::vector<int>().swap(v);
  }
  std::vector<double> vals(rowptr[nvert], 0.0);

  // --- timed section: classification + cut rule + elmat + scatter ------
  auto t0 = std::chrono::steady_clock::now();
  const double EPS = 1e-14;
  long ncut = 0;
  double neg_volume = 0.0;
  for (long e = 0; e < ne; ++e) {
    const int *vid = &elem[e * 4];
    V3 p[4];
    double f[4];
    double scale = 0.0;
    for (int c = 0; c < 4; ++c) {
      p[c] = vert[vid[c]];
      f[c] = phi[vid[c]];
      scale = std::max(scale, std::fabs(f[c]));
    }
    // relative zero guard (straightcutrule.cpp convention)
    const double thr = EPS * scale;
    for (int c = 0; c < 4; ++c)
      if (std::fabs(f[c]) < thr) f[c] = f[c] >= 0 ? thr : -thr;
    int nneg = 0;
    for (int c = 0; c < 4; ++c) nneg += f[c] < 0;
    if (nneg == 0) continue;  // fictitious domain: POS elements inactive

    // constant P1 gradients from the inverse Jacobian
    V3 e1 = sub(p[1], p[0]), e2 = sub(p[2], p[0]), e3 = sub(p[3], p[0]);
    const double dj = det3(e1, e2, e3);
    // rows of J^{-1} are cross products / det
    V3 g1 = {(e2.y * e3.z - e2.z * e3.y) / dj, (e2.z * e3.x - e2.x * e3.z) / dj,
             (e2.x * e3.y - e2.y * e3.x) / dj};
    V3 g2 = {(e3.y * e1.z - e3.z * e1.y) / dj, (e3.z * e1.x - e3.x * e1.z) / dj,
             (e3.x * e1.y - e3.y * e1.x) / dj};
    V3 g3 = {(e1.y * e2.z - e1.z * e2.y) / dj, (e1.z * e2.x - e1.x * e2.z) / dj,
             (e1.x * e2.y - e1.y * e2.x) / dj};
    V3 grad[4] = {{-g1.x - g2.x - g3.x, -g1.y - g2.y - g3.y,
                   -g1.z - g2.z - g3.z}, g1, g2, g3};

    // NEG-part decomposition into sub-tets (per-element heap vectors, the
    // reference's rule objects allocate the same way)
    std::vector<V3> sub_tets;  // groups of 4 points
    sub_tets.reserve(12);
    int negi[4], posi[4], nn = 0, np = 0;
    for (int c = 0; c < 4; ++c) (f[c] < 0 ? negi[nn++] : posi[np++]) = c;
    auto cutpt = [&](int a, int b) {
      const double t = f[a] / (f[a] - f[b]);
      return lerp(p[a], p[b], t);
    };
    if (nneg == 4) {
      for (int c = 0; c < 4; ++c) sub_tets.push_back(p[c]);
    } else {
      ++ncut;
      if (nneg == 1) {
        const int a = negi[0];
        sub_tets.push_back(p[a]);
        for (int c = 0; c < 3; ++c) sub_tets.push_back(cutpt(a, posi[c]));
      } else if (nneg == 3) {
        // complement of the single-POS corner tet: prism over the neg face
        const int q = posi[0];
        V3 c0 = cutpt(negi[0], q), c1 = cutpt(negi[1], q),
           c2 = cutpt(negi[2], q);
        V3 n0 = p[negi[0]], n1 = p[negi[1]], n2 = p[negi[2]];
        V3 t1[4] = {n0, n1, n2, c0}, t2[4] = {n1, n2, c0, c1},
           t3[4] = {n2, c0, c1, c2};
        for (auto &t : {t1, t2, t3})
          for (int c = 0; c < 4; ++c) sub_tets.push_back(t[c]);
      } else {  // nneg == 2: wedge {A,B, P_AC,P_AD,P_BC,P_BD}, pulled from A
        const int A = negi[0], B = negi[1], C = posi[0], D = posi[1];
        V3 pac = cutpt(A, C), pad = cutpt(A, D), pbc = cutpt(B, C),
           pbd = cutpt(B, D);
        V3 t1[4] = {p[A], p[B], pbc, pbd}, t2[4] = {p[A], pac, pbd, pbc},
           t3[4] = {p[A], pac, pad, pbd};
        for (auto &t : {t1, t2, t3})
          for (int c = 0; c < 4; ++c) sub_tets.push_back(t[c]);
      }
    }

    // quadrature-loop element stiffness over the NEG sub-tets
    double ke[4][4];
    std::memset(ke, 0, sizeof ke);
    for (size_t s = 0; s + 3 < sub_tets.size(); s += 4) {
      V3 q0 = sub_tets[s], q1 = sub_tets[s + 1], q2 = sub_tets[s + 2],
         q3 = sub_tets[s + 3];
      const double vol =
          std::fabs(det3(sub(q1, q0), sub(q2, q0), sub(q3, q0))) / 6.0;
      neg_volume += vol;
      for (int qp = 0; qp < 4; ++qp) {
        const double w = 0.25 * vol;  // equal weights, order-2 rule
        (void)QP[qp];  // (P1 gradients are constant; points cost-model only)
        for (int a = 0; a < 4; ++a)
          for (int b = 0; b < 4; ++b)
            ke[a][b] += w * (grad[a].x * grad[b].x + grad[a].y * grad[b].y
                             + grad[a].z * grad[b].z);
      }
    }

    // scatter: binary-search column position in the CSR row
    for (int a = 0; a < 4; ++a) {
      const int ra = vid[a];
      const int *cb = &colind[rowptr[ra]];
      const int *ce = &colind[rowptr[ra + 1]];
      for (int b = 0; b < 4; ++b) {
        const int *it = std::lower_bound(cb, ce, vid[b]);
        vals[rowptr[ra] + (it - cb)] += ke[a][b];
      }
    }
  }
  auto t1 = std::chrono::steady_clock::now();
  const double secs = std::chrono::duration<double>(t1 - t0).count();

  // 50-iteration Jacobi-PCG on the assembled CSR (bench.py's
  // round-2-comparable fixed-budget solve stage), same single thread.
  // Inactive rows (no NEG support) get identity diagonals.
  std::vector<double> diag(nvert, 0.0), b(nvert, 1.0), x(nvert, 0.0);
  std::vector<char> active(nvert, 0);
  for (long r = 0; r < nvert; ++r)
    for (long k = rowptr[r]; k < rowptr[r + 1]; ++k)
      if (colind[k] == r && vals[k] != 0.0) { diag[r] = vals[k]; active[r] = 1; }
  for (long r = 0; r < nvert; ++r) if (!active[r]) diag[r] = 1.0;
  auto t2 = std::chrono::steady_clock::now();
  {
    std::vector<double> rres(b), z(nvert), pv(nvert), Ap(nvert);
    for (long r = 0; r < nvert; ++r) z[r] = rres[r] / diag[r];
    pv = z;
    double rz = 0;
    for (long r = 0; r < nvert; ++r) rz += rres[r] * z[r];
    for (int it = 0; it < 50; ++it) {
      for (long r = 0; r < nvert; ++r) {
        if (!active[r]) { Ap[r] = pv[r]; continue; }  // identity row
        double s = 0;
        for (long k = rowptr[r]; k < rowptr[r + 1]; ++k)
          s += vals[k] * pv[colind[k]];
        Ap[r] = s;
      }
      double pAp = 0;
      for (long r = 0; r < nvert; ++r) pAp += pv[r] * Ap[r];
      const double alpha = rz / pAp;
      for (long r = 0; r < nvert; ++r) { x[r] += alpha * pv[r]; rres[r] -= alpha * Ap[r]; }
      double rz2 = 0;
      for (long r = 0; r < nvert; ++r) { z[r] = rres[r] / diag[r]; rz2 += rres[r] * z[r]; }
      const double beta = rz2 / rz; rz = rz2;
      for (long r = 0; r < nvert; ++r) pv[r] = z[r] + beta * pv[r];
    }
  }
  auto t3 = std::chrono::steady_clock::now();
  const double solve_secs = std::chrono::duration<double>(t3 - t2).count();

  printf("{\"nx\": %d, \"ne\": %ld, \"ncut\": %ld, \"neg_volume\": %.10f, "
         "\"assemble_seconds\": %.6f, \"elts_per_sec\": %.1f, "
         "\"cg50_seconds\": %.6f, \"pipeline_elts_per_sec\": %.1f, "
         "\"csr_checksum\": %.6e}\n",
         nx, ne, ncut, neg_volume, secs, ne / secs, solve_secs,
         ne / (secs + solve_secs),
         [&]{ double s = 0; for (double v : vals) s += std::fabs(v); return s; }());
  return 0;
}
