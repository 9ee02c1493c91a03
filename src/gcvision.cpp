// Native visual feature extraction (C ABI, loaded via ctypes).
//
// TPU-native equivalent of the reference's C++ visual_feature_node
// (src/visual_feature_node.cpp): fixed-budget corner features with grid
// spatial spread, robust median3 depth sampling, MAD-reweighted quadratic
// local depth fit (curvature + residual variance), camera-depth natural
// parameters and a closed-form backprojection covariance. Runs host-side at
// bag-staging time (SURVEY.md section 2.5: feature extraction is frontend
// preprocessing); the fixed-size outputs feed the device pipeline's camera
// slice.
//
// Detector: FAST-9 segment test with a |diff|-sum response and 3x3 non-max
// suppression — the same detector family ORB builds on; the downstream
// contract (budget, spread, depth statistics) is what the pipeline depends
// on, not the exact corner ranking.
//
// Build: ./build_native.sh  ->  fl_slam_tpu/camera/libgcvision.so
// (the binary is NOT committed; tests and staging build it on demand)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// FAST-9 circle offsets (radius 3 Bresenham circle, 16 points).
const int CIRC[16][2] = {
    {0, -3}, {1, -3}, {2, -2}, {3, -1}, {3, 0},  {3, 1},  {2, 2},  {1, 3},
    {0, 3},  {-1, 3}, {-2, 2}, {-3, 1}, {-3, 0}, {-3, -1}, {-2, -2}, {-1, -3}};

struct Corner {
  float u, v, resp;
};

inline bool fast9(const uint8_t* g, int64_t w, int64_t x, int64_t y, int thr,
                  float* resp) {
  int c = g[y * w + x];
  // Compass pretest: any 9 consecutive circle pixels contain >= 2 of the 4
  // compass points (indices 0, 4, 8, 12 — gaps of 4, a 9-run spans >= 2).
  // Flat pixels reject after 4 samples instead of 32 (detection pass was
  // ~19 ms/frame at 424x240 without it; standard FAST speed test).
  {
    int pb = 0, pd = 0;
    for (int k = 0; k < 16; k += 4) {
      int d = int(g[(y + CIRC[k][1]) * w + (x + CIRC[k][0])]) - c;
      pb += (d > thr);
      pd += (d < -thr);
    }
    if (pb < 2 && pd < 2) return false;
  }
  int bright = 0, dark = 0, bright_run = 0, dark_run = 0;
  int best_bright = 0, best_dark = 0;
  float score = 0.0f;
  // two passes around the circle to handle wrap-around runs
  for (int k = 0; k < 32; ++k) {
    int p = g[(y + CIRC[k & 15][1]) * w + (x + CIRC[k & 15][0])];
    int d = p - c;
    if (d > thr) {
      bright_run++;
      dark_run = 0;
    } else if (d < -thr) {
      dark_run++;
      bright_run = 0;
    } else {
      bright_run = 0;
      dark_run = 0;
    }
    best_bright = std::max(best_bright, bright_run);
    best_dark = std::max(best_dark, dark_run);
    if (k < 16) {
      score += static_cast<float>(std::abs(d));
      bright += (d > thr);
      dark += (d < -thr);
    }
  }
  if (best_bright >= 9 || best_dark >= 9) {
    *resp = score;
    return true;
  }
  return false;
}

// Solve the 6x6 normal equations A x = b in place (Gaussian elimination with
// partial pivoting); returns false on (near-)singularity.
bool solve6(double A[6][6], double b[6], double x[6]) {
  int piv[6];
  for (int i = 0; i < 6; ++i) piv[i] = i;
  for (int col = 0; col < 6; ++col) {
    int best = col;
    for (int r = col + 1; r < 6; ++r)
      if (std::abs(A[r][col]) > std::abs(A[best][col])) best = r;
    if (std::abs(A[best][col]) < 1e-12) return false;
    std::swap(A[col], A[best]);
    std::swap(b[col], b[best]);
    (void)piv;
    for (int r = col + 1; r < 6; ++r) {
      double f = A[r][col] / A[col][col];
      for (int c2 = col; c2 < 6; ++c2) A[r][c2] -= f * A[col][c2];
      b[r] -= f * b[col];
    }
  }
  for (int r = 5; r >= 0; --r) {
    double s = b[r];
    for (int c2 = r + 1; c2 < 6; ++c2) s -= A[r][c2] * x[c2];
    x[r] = s / A[r][r];
  }
  return true;
}

double median_of(std::vector<double>& v) {
  if (v.empty()) return 0.0;
  size_t mid = v.size() / 2;
  std::nth_element(v.begin(), v.begin() + mid, v.end());
  double m = v[mid];
  if (v.size() % 2 == 0) {
    double lo = *std::max_element(v.begin(), v.begin() + mid);
    m = 0.5 * (m + lo);
  }
  return m;
}

// Robust quadratic depth fit around (u, v): z(x, y) ~ c0 + c1 x + c2 y +
// 0.5 c3 x^2 + c4 x y + 0.5 c5 y^2, one MAD reweight pass.
bool quad_fit(const float* depth, int64_t h, int64_t w, int64_t u, int64_t v,
              int rad, double* z0, double* curv, double* res_var,
              double* gx = nullptr, double* gy = nullptr) {
  int64_t u0 = std::max<int64_t>(u - rad, 0), u1 = std::min<int64_t>(u + rad + 1, w);
  int64_t v0 = std::max<int64_t>(v - rad, 0), v1 = std::min<int64_t>(v + rad + 1, h);
  std::vector<double> xs, ys, zs;
  for (int64_t yy = v0; yy < v1; ++yy)
    for (int64_t xx = u0; xx < u1; ++xx) {
      float z = depth[yy * w + xx];
      if (std::isfinite(z) && z > 1e-3f) {
        xs.push_back(double(xx - u));
        ys.push_back(double(yy - v));
        zs.push_back(double(z));
      }
    }
  size_t n = zs.size();
  if (n < 8) return false;

  auto fit = [&](const std::vector<double>& wgt, double coef[6]) -> bool {
    double A[6][6] = {{0}}, b[6] = {0};
    for (size_t i = 0; i < n; ++i) {
      double x = xs[i], y = ys[i];
      double row[6] = {1.0, x, y, 0.5 * x * x, x * y, 0.5 * y * y};
      double wi = wgt.empty() ? 1.0 : wgt[i];
      for (int r = 0; r < 6; ++r) {
        for (int c = 0; c < 6; ++c) A[r][c] += wi * row[r] * row[c];
        b[r] += wi * row[r] * zs[i];
      }
    }
    double x6[6];
    if (!solve6(A, b, x6)) return false;
    std::memcpy(coef, x6, sizeof(x6));
    return true;
  };

  double coef[6];
  if (!fit({}, coef)) return false;
  std::vector<double> r(n), wgt(n);
  for (size_t i = 0; i < n; ++i) {
    double x = xs[i], y = ys[i];
    r[i] = zs[i] - (coef[0] + coef[1] * x + coef[2] * y + 0.5 * coef[3] * x * x
                    + coef[4] * x * y + 0.5 * coef[5] * y * y);
  }
  std::vector<double> ar(r);
  for (auto& q : ar) q = std::abs(q);
  double med = median_of(ar);
  double mad = med / 0.6745 + 1e-6;
  for (size_t i = 0; i < n; ++i) {
    double t = r[i] / (3.0 * mad);
    wgt[i] = 1.0 / (1.0 + t * t);   // Student-t-like robust weight
  }
  if (!fit(wgt, coef)) return false;
  double sw = 0.0, swr2 = 0.0;
  for (size_t i = 0; i < n; ++i) {
    double x = xs[i], y = ys[i];
    double ri = zs[i] - (coef[0] + coef[1] * x + coef[2] * y
                         + 0.5 * coef[3] * x * x + coef[4] * x * y
                         + 0.5 * coef[5] * y * y);
    sw += wgt[i];
    swr2 += wgt[i] * ri * ri;
  }
  *z0 = coef[0];
  *curv = std::sqrt(coef[3] * coef[3] + 2.0 * coef[4] * coef[4]
                    + coef[5] * coef[5]);
  *res_var = std::max(swr2 / std::max(sw, 1e-9), 1e-8);
  if (gx) *gx = coef[1];   // robust local depth gradient (m/px) at center
  if (gy) *gy = coef[2];
  return true;
}

}  // namespace

extern "C" {

// gray (h, w) uint8; depth (h, w) float32 meters; rgb (h, w, 3) uint8.
// Outputs are fixed-size n_feat arrays (zero-filled by the caller):
//   uv (N,2) f64, z (N) f64, depth_lambda (N) f64, depth_theta (N) f64,
//   xyz (N,3) f64, cov (N,9) f64, kappa (N) f64, color (N,3) f64,
//   weight (N) f64, valid (N) u8.
// Returns the number of valid features.
int64_t gcv_extract_features(
    const uint8_t* gray, const float* depth, const uint8_t* rgb, int64_t h,
    int64_t w, double fx, double fy, double cx, double cy, int64_t n_feat,
    int fast_thr, double sigma_px, double* uv, double* z_out,
    double* depth_lambda, double* depth_theta, double* xyz, double* cov,
    double* kappa, double* color, double* weight, uint8_t* valid,
    double* grad) {
  // grad (N, 2): robust local depth gradient (m/px) from the SAME
  // Student-t quadratic fit that produces z0/curv — feeds the closed-form
  // surface normal host-side (features.surface_normal_from_grad), replacing
  // the image-wide median+central-difference pass (~20 ms/frame).
  // --- FAST-9 detection + 3x3 non-max suppression ------------------------
  std::vector<float> resp_img(size_t(h) * size_t(w), 0.0f);
  for (int64_t y = 3; y < h - 3; ++y)
    for (int64_t x = 3; x < w - 3; ++x) {
      float r;
      if (fast9(gray, w, x, y, fast_thr, &r)) resp_img[y * w + x] = r;
    }
  std::vector<Corner> corners;
  corners.reserve(4096);
  for (int64_t y = 4; y < h - 4; ++y)
    for (int64_t x = 4; x < w - 4; ++x) {
      float r = resp_img[y * w + x];
      if (r <= 0.0f) continue;
      bool is_max = true;
      for (int dy = -1; dy <= 1 && is_max; ++dy)
        for (int dx = -1; dx <= 1; ++dx)
          if (resp_img[(y + dy) * w + (x + dx)] > r) {
            is_max = false;
            break;
          }
      if (is_max) corners.push_back({float(x), float(y), r});
    }
  if (corners.empty()) return 0;

  // --- grid spatial spread (strongest-per-cell round-robin) ---------------
  const int G = 16;
  std::vector<std::vector<int>> cells(G * G);
  {
    std::vector<int> order(corners.size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = int(i);
    std::sort(order.begin(), order.end(), [&](int a, int b) {
      return corners[a].resp > corners[b].resp;
    });
    for (int i : order) {
      int gx = std::min<int>(G - 1, int(corners[i].u / double(w) * G));
      int gy = std::min<int>(G - 1, int(corners[i].v / double(h) * G));
      cells[gy * G + gx].push_back(i);
    }
  }
  std::vector<int> keep;
  keep.reserve(3 * size_t(n_feat));
  size_t rounds = 0;
  for (auto& c : cells) rounds = std::max(rounds, c.size());
  for (size_t r = 0; r < rounds && keep.size() < 3 * size_t(n_feat); ++r)
    for (auto& c : cells)
      if (r < c.size() && keep.size() < 3 * size_t(n_feat))
        keep.push_back(c[r]);

  float resp_max = 1e-9f;
  for (auto& c : corners) resp_max = std::max(resp_max, c.resp);

  // --- per-feature depth statistics + outputs -----------------------------
  int64_t j = 0;
  for (int i : keep) {
    if (j >= n_feat) break;
    double u = corners[i].u, v = corners[i].v;
    int64_t ui = int64_t(std::lround(u)), vi = int64_t(std::lround(v));

    // median of the finite 3x3 depth patch
    std::vector<double> patch;
    for (int64_t yy = std::max<int64_t>(vi - 1, 0);
         yy < std::min<int64_t>(vi + 2, h); ++yy)
      for (int64_t xx = std::max<int64_t>(ui - 1, 0);
           xx < std::min<int64_t>(ui + 2, w); ++xx) {
        float z = depth[yy * w + xx];
        if (std::isfinite(z) && z > 1e-3f) patch.push_back(double(z));
      }
    if (patch.empty()) continue;
    double z_med = median_of(patch);
    if (z_med <= 1e-3) continue;

    double z0 = 0.0, curv = 0.0, res_var = 1.0;
    double gx_f = 0.0, gy_f = 0.0;
    bool okq = quad_fit(depth, h, w, ui, vi, 3, &z0, &curv, &res_var,
                        &gx_f, &gy_f);
    double z_use = (okq && z0 > 1e-3) ? 0.5 * (z_med + z0) : z_med;
    double lam_d = 1.0 / (res_var + (0.002 * z_use) * (0.002 * z_use));
    double sig_z = 1.0 / std::sqrt(lam_d);

    double x = (u - cx) * z_use / fx;
    double y = (v - cy) * z_use / fy;
    // J = d backproject / d(u, v, z); cov = J diag(s_px^2, s_px^2, s_z^2) J^T
    double Jm[3][3] = {{z_use / fx, 0.0, (u - cx) / fx},
                       {0.0, z_use / fy, (v - cy) / fy},
                       {0.0, 0.0, 1.0}};
    double Sd[3] = {sigma_px * sigma_px, sigma_px * sigma_px, sig_z * sig_z};
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 3; ++c) {
        double s = 0.0;
        for (int k = 0; k < 3; ++k) s += Jm[r][k] * Sd[k] * Jm[c][k];
        cov[(j * 3 + r) * 3 + c] = s;
      }

    uv[j * 2 + 0] = u;
    uv[j * 2 + 1] = v;
    z_out[j] = z_use;
    depth_lambda[j] = lam_d;
    depth_theta[j] = lam_d * z_use;
    xyz[j * 3 + 0] = x;
    xyz[j * 3 + 1] = y;
    xyz[j * 3 + 2] = z_use;
    kappa[j] = std::min(100.0, std::max(0.5, 10.0 / (1.0 + 50.0 * curv)));
    int64_t ci = std::min(vi, h - 1) * w + std::min(ui, w - 1);
    color[j * 3 + 0] = rgb[ci * 3 + 0] / 255.0;
    color[j * 3 + 1] = rgb[ci * 3 + 1] / 255.0;
    color[j * 3 + 2] = rgb[ci * 3 + 2] / 255.0;
    weight[j] = corners[i].resp / resp_max;
    grad[j * 2 + 0] = okq ? gx_f : 0.0;
    grad[j * 2 + 1] = okq ? gy_f : 0.0;
    valid[j] = 1;
    ++j;
  }
  return j;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Per-scan lidar->camera depth evidence (Routes A/B) — the native twin of
// camera/depth_fusion.lidar_depth_evidence (the authoritative Python
// implementation, parity-tested against this). Per scan the Python loop ran
// ~4 ms at production budgets (512 features x 8k points, numpy per-feature
// masks); grid-binned candidate lookup + closed-form 3x3 eigensolve runs it
// in ~0.3 ms. Reference chain: frontend/sensors/lidar_camera_depth_fusion.py
// Routes A and B (:389-442).
// ---------------------------------------------------------------------------

namespace {

// Smallest eigenpair of a symmetric 3x3 (trigonometric closed form +
// cross-product eigenvector; ~1e-12 relative vs LAPACK on plane-fit
// scatters, which is tolerance-level for the continuous lam_b/z_b outputs).
void eig3_smallest(const double A[3][3], double* eval_out, double evec[3]) {
  double a00 = A[0][0], a11 = A[1][1], a22 = A[2][2];
  double a01 = A[0][1], a02 = A[0][2], a12 = A[1][2];
  double p1 = a01 * a01 + a02 * a02 + a12 * a12;
  double lmin;
  if (p1 < 1e-300) {
    lmin = std::min(a00, std::min(a11, a22));
    evec[0] = (a00 == lmin) ? 1.0 : 0.0;
    evec[1] = (a00 != lmin && a11 == lmin) ? 1.0 : 0.0;
    evec[2] = (a00 != lmin && a11 != lmin) ? 1.0 : 0.0;
    *eval_out = lmin;
    return;
  }
  double q = (a00 + a11 + a22) / 3.0;
  double p2 = (a00 - q) * (a00 - q) + (a11 - q) * (a11 - q)
              + (a22 - q) * (a22 - q) + 2.0 * p1;
  double p = std::sqrt(p2 / 6.0);
  double b00 = (a00 - q) / p, b11 = (a11 - q) / p, b22 = (a22 - q) / p;
  double b01 = a01 / p, b02 = a02 / p, b12 = a12 / p;
  double detB = b00 * (b11 * b22 - b12 * b12) - b01 * (b01 * b22 - b12 * b02)
                + b02 * (b01 * b12 - b11 * b02);
  double r = detB / 2.0;
  r = r < -1.0 ? -1.0 : (r > 1.0 ? 1.0 : r);
  double phi = std::acos(r) / 3.0;
  lmin = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);
  *eval_out = lmin;
  // eigenvector: largest cross product of rows of (A - lmin I)
  double R0[3] = {a00 - lmin, a01, a02};
  double R1[3] = {a01, a11 - lmin, a12};
  double R2[3] = {a02, a12, a22 - lmin};
  double c[3][3] = {
      {R0[1] * R1[2] - R0[2] * R1[1], R0[2] * R1[0] - R0[0] * R1[2],
       R0[0] * R1[1] - R0[1] * R1[0]},
      {R0[1] * R2[2] - R0[2] * R2[1], R0[2] * R2[0] - R0[0] * R2[2],
       R0[0] * R2[1] - R0[1] * R2[0]},
      {R1[1] * R2[2] - R1[2] * R2[1], R1[2] * R2[0] - R1[0] * R2[2],
       R1[0] * R2[1] - R1[1] * R2[0]}};
  int best = 0;
  double bn = -1.0;
  for (int i = 0; i < 3; ++i) {
    double n2 = c[i][0] * c[i][0] + c[i][1] * c[i][1] + c[i][2] * c[i][2];
    if (n2 > bn) { bn = n2; best = i; }
  }
  double nn = std::sqrt(bn);
  if (nn < 1e-300) { evec[0] = 1.0; evec[1] = 0.0; evec[2] = 0.0; return; }
  evec[0] = c[best][0] / nn;
  evec[1] = c[best][1] / nn;
  evec[2] = c[best][2] / nn;
}

// np.median on a scratch copy: sort ascending, middle (odd) or mean of the
// two middles (even).
double np_median(std::vector<double>& v) {
  size_t k = v.size();
  std::sort(v.begin(), v.end());
  if (k % 2) return v[k / 2];
  return 0.5 * (v[k / 2 - 1] + v[k / 2]);
}

}  // namespace

namespace {

template <typename PT>
int64_t lde_impl(
    const double* feat_uv, const uint8_t* feat_valid, int64_t n_feat,
    const PT* points_cam, int64_t n_pts, double fx, double fy, double cx,
    double cy, int64_t width, int64_t height, double radius_px,
    int64_t min_support, double sigma_lidar, double* lam_out,
    double* the_out, int64_t* sup_out) {
  for (int64_t i = 0; i < n_feat; ++i) {
    lam_out[i] = 0.0;
    the_out[i] = 0.0;
    sup_out[i] = 0;
  }
  // project lidar points; keep front-of-camera, in-image
  std::vector<double> pu, pv, px, py, pz;
  pu.reserve(n_pts);
  for (int64_t m = 0; m < n_pts; ++m) {
    double x = points_cam[3 * m], y = points_cam[3 * m + 1],
           z = points_cam[3 * m + 2];
    if (!(z > 0.05)) continue;
    double u = fx * x / z + cx;
    double v = fy * y / z + cy;
    if (!(u >= 0.0 && u < double(width) && v >= 0.0 && v < double(height)))
      continue;
    pu.push_back(u); pv.push_back(v);
    px.push_back(x); py.push_back(y); pz.push_back(z);
  }
  int64_t M = int64_t(pu.size());
  if (M == 0) return 0;

  // grid binning (cell 16 px) for candidate lookup; the predicate below is
  // the exact du^2+dv^2 < r^2 of the Python loop, so the candidate SET is
  // identical to the brute-force mask (bins are a superset filter).
  const int64_t CS = 16;
  int64_t ncx = (width + CS - 1) / CS, ncy = (height + CS - 1) / CS;
  std::vector<int32_t> cnt(ncx * ncy + 1, 0);
  for (int64_t m = 0; m < M; ++m)
    cnt[int64_t(pv[m] / CS) * ncx + int64_t(pu[m] / CS) + 1]++;
  for (size_t c = 1; c < cnt.size(); ++c) cnt[c] += cnt[c - 1];
  std::vector<int32_t> order(M);
  {
    std::vector<int32_t> cur(cnt.begin(), cnt.end() - 1);
    for (int64_t m = 0; m < M; ++m) {
      int64_t c = int64_t(pv[m] / CS) * ncx + int64_t(pu[m] / CS);
      order[cur[c]++] = int32_t(m);
    }
  }

  const double r2 = radius_px * radius_px;
  const double inv_2s2 = 0.5 / (0.5 * radius_px * 0.5 * radius_px);
  std::vector<int32_t> cand;
  std::vector<double> zv, d2v, wv;
  int64_t n_supported = 0;
  for (int64_t i = 0; i < n_feat; ++i) {
    if (!feat_valid[i]) continue;
    double fu = feat_uv[2 * i], fv = feat_uv[2 * i + 1];
    cand.clear(); zv.clear(); d2v.clear(); wv.clear();
    int64_t cx0 = std::max<int64_t>(0, int64_t((fu - radius_px) / CS));
    int64_t cx1 = std::min<int64_t>(ncx - 1, int64_t((fu + radius_px) / CS));
    int64_t cy0 = std::max<int64_t>(0, int64_t((fv - radius_px) / CS));
    int64_t cy1 = std::min<int64_t>(ncy - 1, int64_t((fv + radius_px) / CS));
    for (int64_t gy = cy0; gy <= cy1; ++gy)
      for (int64_t gx = cx0; gx <= cx1; ++gx) {
        int64_t c = gy * ncx + gx;
        for (int32_t t = cnt[c]; t < cnt[c + 1]; ++t) {
          int32_t m = order[t];
          double du = pu[m] - fu, dv = pv[m] - fv;
          double d2 = du * du + dv * dv;
          if (d2 < r2) {
            cand.push_back(m);
            d2v.push_back(d2);
            zv.push_back(pz[m]);
          }
        }
      }
    int64_t k = int64_t(cand.size());
    sup_out[i] = k;
    if (k < min_support) continue;
    ++n_supported;

    // Route A: median depth + MAD precision
    std::vector<double> zs(zv);
    double z_a = np_median(zs);
    std::vector<double> ad(zv);
    for (auto& q : ad) q = std::fabs(q - z_a);
    double mad = np_median(ad) / 0.6745 + sigma_lidar;
    double lam_a = 1.0 / (mad * mad);

    // Route B: weighted plane fit + ray-plane intersection
    double lam_b = 0.0, z_b = 0.0;
    if (k >= 4) {
      wv.resize(k);
      double sw = 0.0;
      for (int64_t t = 0; t < k; ++t) {
        wv[t] = std::exp(-d2v[t] * inv_2s2);
        sw += wv[t];
      }
      double c0 = 0.0, c1 = 0.0, c2 = 0.0;
      for (int64_t t = 0; t < k; ++t) {
        int32_t m = cand[t];
        c0 += wv[t] * px[m]; c1 += wv[t] * py[m]; c2 += wv[t] * pz[m];
      }
      c0 /= sw; c1 /= sw; c2 /= sw;          // np.average (weights sum > 0)
      double C[3][3] = {{0, 0, 0}, {0, 0, 0}, {0, 0, 0}};
      for (int64_t t = 0; t < k; ++t) {
        int32_t m = cand[t];
        double qx = px[m] - c0, qy = py[m] - c1, qz = pz[m] - c2;
        double w = wv[t];
        C[0][0] += w * qx * qx; C[0][1] += w * qx * qy;
        C[0][2] += w * qx * qz; C[1][1] += w * qy * qy;
        C[1][2] += w * qy * qz; C[2][2] += w * qz * qz;
      }
      double denom_w = sw > 1e-9 ? sw : 1e-9;
      C[0][0] /= denom_w; C[0][1] /= denom_w; C[0][2] /= denom_w;
      C[1][1] /= denom_w; C[1][2] /= denom_w; C[2][2] /= denom_w;
      C[1][0] = C[0][1]; C[2][0] = C[0][2]; C[2][1] = C[1][2];
      double ev, n[3];
      eig3_smallest(C, &ev, n);
      double ray0 = (fu - cx) / fx, ray1 = (fv - cy) / fy;
      double den = ray0 * n[0] + ray1 * n[1] + n[2];
      if (std::fabs(den) > 1e-3) {
        double t = (c0 * n[0] + c1 * n[1] + c2 * n[2]) / den;
        if (t > 0.05) {
          z_b = t;
          double perp = std::max(ev, sigma_lidar * sigma_lidar);
          lam_b = den * den / perp;
        }
      }
    }
    lam_out[i] = lam_a + lam_b;
    the_out[i] = lam_a * z_a + lam_b * z_b;
  }
  return n_supported;
}

}  // namespace

extern "C" {

int64_t gcv_lidar_depth_evidence(
    const double* feat_uv, const uint8_t* feat_valid, int64_t n_feat,
    const double* points_cam, int64_t n_pts, double fx, double fy, double cx,
    double cy, int64_t width, int64_t height, double radius_px,
    int64_t min_support, double sigma_lidar, double* lam_out,
    double* the_out, int64_t* sup_out) {
  return lde_impl<double>(feat_uv, feat_valid, n_feat, points_cam, n_pts,
                          fx, fy, cx, cy, width, height, radius_px,
                          min_support, sigma_lidar, lam_out, the_out,
                          sup_out);
}

// f32-point twin: the staged point cloud is float32 on the production
// config; converting 8192x3 to f64 host-side for every scan cost
// ~0.1 ms/scan of the camera staging budget. The evidence math itself
// stays f64 (values convert on load).
int64_t gcv_lidar_depth_evidence_f32(
    const double* feat_uv, const uint8_t* feat_valid, int64_t n_feat,
    const float* points_cam, int64_t n_pts, double fx, double fy, double cx,
    double cy, int64_t width, int64_t height, double radius_px,
    int64_t min_support, double sigma_lidar, double* lam_out,
    double* the_out, int64_t* sup_out) {
  return lde_impl<float>(feat_uv, feat_valid, n_feat, points_cam, n_pts,
                         fx, fy, cx, cy, width, height, radius_px,
                         min_support, sigma_lidar, lam_out, the_out,
                         sup_out);
}

}  // extern "C"
