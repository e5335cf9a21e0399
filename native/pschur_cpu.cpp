// Native CPU reference implementation of the real periodic Schur
// decomposition: periodic Hessenberg reduction (MB03VD shape, reference
// /root/reference/src/PeriodicSchurDecompositions.jl:213-259) followed by the
// Francis double-shift periodic QR iteration (MB03WD shape, reference
// :322-1096).  Scalar sequential C++ — the honest "what a good CPU
// implementation of the reference's algorithm does" baseline that bench.py
// times against the TPU pipeline, and a fast exact float64 host backend.
//
// This is an independent rewrite of the same algorithm the JAX cores in
// ../periodicschurdecompositions_jl_tpu/ops/{hessenberg,pqr_real}.py
// implement (no code from /root/reference is copied); the scalar control
// flow (shrinking windows, early exits) is the natural CPU formulation that
// the TPU cores replace with masked static-shape sweeps.
//
// Layout: row-major n x n matrices, p of them contiguous: A[f][r][c] =
// A[(size_t)f*n*n + (size_t)r*n + c].
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpschur_cpu.so pschur_cpu.cpp

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

using std::fabs;
using std::sqrt;

inline double* mat(double* base, int f, int n) {
  return base + (size_t)f * n * n;
}

// ---------------------------------------------------------------------------
// Householder reflector (xLARFG semantics): given x[0..q-1], find w (w[0]=1),
// tau, beta with (I - tau w w^T) x = beta e1.
inline void larfg(int q, const double* x, double* w, double& tau,
                  double& beta) {
  double alpha = x[0];
  double xn2 = 0.0;
  for (int t = 1; t < q; ++t) xn2 += x[t] * x[t];
  w[0] = 1.0;
  if (xn2 == 0.0) {
    tau = 0.0;
    beta = alpha;
    for (int t = 1; t < q; ++t) w[t] = 0.0;
    return;
  }
  double b = -copysign(std::hypot(alpha, sqrt(xn2)), alpha);
  tau = (b - alpha) / b;
  double inv = 1.0 / (alpha - b);
  for (int t = 1; t < q; ++t) w[t] = x[t] * inv;
  beta = b;
}

// Apply (I - tau w w^T) from the LEFT to rows r0..r0+q-1, cols [c0, c1).
inline void refl_left(double* M, int n, int r0, int q, int c0, int c1,
                      const double* w, double tau) {
  if (tau == 0.0 || c0 >= c1) return;
  // s[c] = sum_t w[t] * M[r0+t][c]
  static thread_local std::vector<double> s;
  s.assign(c1 - c0, 0.0);
  for (int t = 0; t < q; ++t) {
    const double wt = w[t];
    const double* row = M + (size_t)(r0 + t) * n + c0;
    double* sp = s.data();
    for (int c = 0; c < c1 - c0; ++c) sp[c] += wt * row[c];
  }
  for (int t = 0; t < q; ++t) {
    const double wt_tau = tau * w[t];
    double* row = M + (size_t)(r0 + t) * n + c0;
    const double* sp = s.data();
    for (int c = 0; c < c1 - c0; ++c) row[c] -= wt_tau * sp[c];
  }
}

// Apply (I - tau w w^T) from the RIGHT to cols c0..c0+q-1, rows [r0, r1).
inline void refl_right(double* M, int n, int c0, int q, int r0, int r1,
                       const double* w, double tau) {
  if (tau == 0.0 || r0 >= r1) return;
  for (int r = r0; r < r1; ++r) {
    double* row = M + (size_t)r * n + c0;
    double s = 0.0;
    for (int t = 0; t < q; ++t) s += w[t] * row[t];
    s *= tau;
    for (int t = 0; t < q; ++t) row[t] -= s * w[t];
  }
}

// Apply a small q x q matrix G from the LEFT to rows r0.., cols [c0, c1):
// rows <- G * rows.
inline void mat_left(double* M, int n, int r0, int q, int c0, int c1,
                     const double* G) {
  if (c0 >= c1) return;
  double tmp[3];
  for (int c = c0; c < c1; ++c) {
    for (int a = 0; a < q; ++a) {
      double s = 0.0;
      for (int t = 0; t < q; ++t) s += G[a * q + t] * M[(size_t)(r0 + t) * n + c];
      tmp[a] = s;
    }
    for (int a = 0; a < q; ++a) M[(size_t)(r0 + a) * n + c] = tmp[a];
  }
}

// Apply a small q x q matrix G from the RIGHT to cols c0.., rows [r0, r1):
// cols <- cols * G.
inline void mat_right(double* M, int n, int c0, int q, int r0, int r1,
                      const double* G) {
  double tmp[3];
  for (int r = r0; r < r1; ++r) {
    double* row = M + (size_t)r * n + c0;
    for (int a = 0; a < q; ++a) {
      double s = 0.0;
      for (int t = 0; t < q; ++t) s += row[t] * G[t * q + a];
      tmp[a] = s;
    }
    for (int a = 0; a < q; ++a) row[a] = tmp[a];
  }
}

// G = I - tau w w^T (q x q, symmetric).
inline void refl_to_mat(int q, const double* w, double tau, double* G) {
  for (int a = 0; a < q; ++a)
    for (int b = 0; b < q; ++b)
      G[a * q + b] = (a == b ? 1.0 : 0.0) - tau * w[a] * w[b];
}

// ---------------------------------------------------------------------------
// dlanv2 semantics (standardize a real 2x2; reference src/rschur2x2.jl:9-96
// contract).  Returns the rotation (cs, sn) and eigenvalue pairs.
void lanv2(double& a, double& b, double& c, double& d, double& cs, double& sn,
           double& w1r, double& w1i, double& w2r, double& w2i) {
  const double eps = 2.220446049250313e-16;
  if (c == 0.0) {
    cs = 1.0; sn = 0.0;
  } else if (b == 0.0) {
    cs = 0.0; sn = 1.0;
    double t = d; d = a; a = t;
    b = -c; c = 0.0;
  } else if ((a - d) == 0.0 && ((b < 0) != (c < 0))) {
    cs = 1.0; sn = 0.0;
  } else {
    double temp = a - d;
    double pp = 0.5 * temp;
    double bcmax = std::max(fabs(b), fabs(c));
    double bcmis = std::min(fabs(b), fabs(c)) *
                   (b >= 0 ? 1.0 : -1.0) * (c >= 0 ? 1.0 : -1.0);
    double scale = std::max(fabs(pp), bcmax);
    double z = (pp / scale) * pp + (bcmax / scale) * bcmis;
    if (z >= 4.0 * eps) {
      // real eigenvalues
      double zz = pp + copysign(sqrt(scale) * sqrt(z), pp);
      a = d + zz;
      d -= (bcmax / zz) * bcmis;
      double tau = std::hypot(c, zz);
      cs = zz / tau;
      sn = c / tau;
      b -= c;
      c = 0.0;
    } else {
      // complex or almost-equal real eigenvalues
      double sigma = b + c;
      double tau = std::hypot(sigma, temp);
      cs = sqrt(0.5 * (1.0 + fabs(sigma) / tau));
      sn = -(pp / (tau * cs)) * (sigma >= 0 ? 1.0 : -1.0);
      double aa = a * cs + b * sn, bb = -a * sn + b * cs;
      double cc = c * cs + d * sn, dd = -c * sn + d * cs;
      a = aa * cs + cc * sn;
      b = bb * cs + dd * sn;
      c = -aa * sn + cc * cs;
      d = -bb * sn + dd * cs;
      double mid = 0.5 * (a + d);
      a = mid; d = mid;
      if (c != 0.0) {
        if (b != 0.0) {
          if ((b < 0) == (c < 0)) {
            double sab = sqrt(fabs(b)), sac = sqrt(fabs(c));
            double p2 = copysign(sab * sac, c);
            double t2 = 1.0 / sqrt(fabs(b + c));
            a = mid + p2; d = mid - p2;
            b -= c; c = 0.0;
            double cs1 = sab * t2, sn1 = sac * t2;
            double csr = cs * cs1 - sn * sn1, snr = cs * sn1 + sn * cs1;
            cs = csr; sn = snr;
          }
        } else {
          b = -c; c = 0.0;
          double t = cs; cs = -sn; sn = t;
        }
      }
    }
  }
  w1r = a; w2r = d;
  if (c == 0.0) {
    w1i = 0.0; w2i = 0.0;
  } else {
    w1i = sqrt(fabs(b)) * sqrt(fabs(c));
    w2i = -w1i;
  }
}

// Givens rotation zeroing y against x: c x + s y = r.
inline void givens(double x, double y, double& c, double& s) {
  if (y == 0.0) { c = 1.0; s = 0.0; return; }
  double r = std::hypot(x, y);
  c = x / r;
  s = y / r;
}

// ---------------------------------------------------------------------------
// Periodic Hessenberg reduction (column sweep), Q accumulated.
// Convention: Q[l]^T A[l] Q[(l+1)%p] = H[l], H[0] Hessenberg, H[1:] upper tri.
void phessenberg(int p, int n, double* A, double* Q, int want_q) {
  std::vector<double> w(n), x(n);
  if (want_q) {
    for (int f = 0; f < p; ++f) {
      double* Qf = mat(Q, f, n);
      std::memset(Qf, 0, sizeof(double) * n * n);
      for (int r = 0; r < n; ++r) Qf[(size_t)r * n + r] = 1.0;
    }
  }
  for (int i = 0; i < n - 1; ++i) {
    // factors p-1 .. 1: triangularize column i (annihilate rows i+1..)
    for (int f = p - 1; f >= 1; --f) {
      double* Af = mat(A, f, n);
      int q = n - i;
      for (int t = 0; t < q; ++t) x[t] = Af[(size_t)(i + t) * n + i];
      double tau, beta;
      larfg(q, x.data(), w.data(), tau, beta);
      refl_left(Af, n, i, q, i, n, w.data(), tau);
      // exact column image
      Af[(size_t)i * n + i] = beta;
      for (int t = 1; t < q; ++t) Af[(size_t)(i + t) * n + i] = 0.0;
      refl_right(mat(A, f - 1, n), n, i, q, 0, n, w.data(), tau);
      if (want_q) refl_right(mat(Q, f, n), n, i, q, 0, n, w.data(), tau);
    }
    // factor 0: Hessenberg column i (annihilate rows i+2..)
    if (i + 2 < n) {
      double* A0 = mat(A, 0, n);
      int q = n - i - 1;
      for (int t = 0; t < q; ++t) x[t] = A0[(size_t)(i + 1 + t) * n + i];
      double tau, beta;
      larfg(q, x.data(), w.data(), tau, beta);
      refl_left(A0, n, i + 1, q, i, n, w.data(), tau);
      A0[(size_t)(i + 1) * n + i] = beta;
      for (int t = 1; t < q; ++t) A0[(size_t)(i + 1 + t) * n + i] = 0.0;
      int fr = (p > 1) ? p - 1 : 0;
      refl_right(mat(A, fr, n), n, i + 1, q, 0, n, w.data(), tau);
      if (want_q) refl_right(mat(Q, 0, n), n, i + 1, q, 0, n, w.data(), tau);
    }
  }
  // scrub structural zeros
  for (int f = 1; f < p; ++f) {
    double* Af = mat(A, f, n);
    for (int r = 1; r < n; ++r)
      for (int c = 0; c < r; ++c) Af[(size_t)r * n + c] = 0.0;
  }
  double* A0 = mat(A, 0, n);
  for (int r = 2; r < n; ++r)
    for (int c = 0; c < r - 1; ++c) A0[(size_t)r * n + c] = 0.0;
}

// ---------------------------------------------------------------------------
// Band entries of the product  ℍ = H[0] H[1] ... H[p-1]  over rows [l, i]:
// hdiag[r] = ℍ[r,r], hsub[r] = ℍ[r,r-1], hsup[r] = ℍ[r,r+1]
// (same recurrence as ops/pqr_real._band_products; reference :477-528).
void band_products(int p, int n, const double* H, int l, int i,
                   double* hdiag, double* hsub, double* hsup,
                   std::vector<double>& P1, std::vector<double>& P2,
                   std::vector<double>& P3) {
  int lo = std::max(l - 1, 0), hi = std::min(i + 2, n - 1);
  P1.assign(n, 1.0);
  P2.assign(n, 0.0);
  P3.assign(n, 0.0);
  for (int f = 1; f < p; ++f) {
    const double* Hf = mat(const_cast<double*>(H), f, n);
    for (int r = lo; r <= hi; ++r) {
      double D = Hf[(size_t)r * n + r];
      double U = (r + 1 < n) ? Hf[(size_t)r * n + r + 1] : 0.0;
      double V = (r + 2 < n) ? Hf[(size_t)r * n + r + 2] : 0.0;
      double D1 = (r + 1 < n) ? Hf[(size_t)(r + 1) * n + r + 1] : 0.0;
      double U1 = (r + 2 < n) ? Hf[(size_t)(r + 1) * n + r + 2] : 0.0;
      double D2 = (r + 2 < n) ? Hf[(size_t)(r + 2) * n + r + 2] : 0.0;
      P3[r] = P1[r] * V + P2[r] * U1 + P3[r] * D2;
      P2[r] = P1[r] * U + P2[r] * D1;
      P1[r] = P1[r] * D;
    }
  }
  const double* H0 = H;
  for (int r = lo; r <= hi; ++r) {
    double d0 = H0[(size_t)r * n + r];
    double u0 = (r + 1 < n) ? H0[(size_t)r * n + r + 1] : 0.0;
    double s0 = (r >= 1) ? H0[(size_t)r * n + r - 1] : 0.0;
    double P1m = (r >= 1) ? P1[r - 1] : 1.0;
    double P2m = (r >= 1) ? P2[r - 1] : 0.0;
    double P3m = (r >= 1) ? P3[r - 1] : 0.0;
    hsub[r] = s0 * P1m;
    hdiag[r] = s0 * P2m + d0 * P1[r];
    hsup[r] = s0 * P3m + d0 * P2[r] + (r + 1 < n ? u0 * P1[r + 1] : 0.0);
  }
}

// ---------------------------------------------------------------------------
// Real periodic QR iteration on (H, Z); returns 0 on convergence.
int pqr_real(int p, int n, double* H, double* Z, double* wr, double* wi,
             int maxitfac, int want_z) {
  const double ulp = 2.220446049250313e-16;
  const double unfl = 2.2250738585072014e-308;
  const double smlnum = unfl * (n / ulp);
  const double ulpx = pow(ulp, 1.0 + 4.0 / 16.0);  // Ahues-Tisseur tightened
  const double dat1 = 0.75, dat2 = -0.4375;
  const int maxit = maxitfac * n;

  if (n == 1) {
    double lam = 1.0;
    for (int f = 0; f < p; ++f) lam *= H[f];
    wr[0] = lam;
    wi[0] = 0.0;
    return 0;
  }

  // deflation thresholds for triangular diagonals (reference :379-388)
  std::vector<double> hnorms(p);
  for (int f = 0; f < p; ++f) {
    double mx = 0.0;
    const double* Hf = mat(H, f, n);
    for (int c = 0; c < n; ++c) {
      double s = 0.0;
      for (int r = 0; r < n; ++r) s += fabs(Hf[(size_t)r * n + c]);
      mx = std::max(mx, s);
    }
    hnorms[f] = ulp * n * mx;
  }

  std::vector<double> hdiag(n), hsub(n), hsup(n), P1, P2, P3;
  double w3[3], G3[9], G2[4], x3[3];

  int i = n - 1, l = 0, its = 1, jiter = 0;
  while (i >= 0) {
    if (jiter++ >= maxit) return 1;
    band_products(p, n, H, l, i, hdiag.data(), hsub.data(), hsup.data(),
                  P1, P2, P3);

    // ---- deflation scan: bottom-most negligible ℍ[k, k-1], k in [l+1, i]
    int lnew = l;
    if (i > l) {
      for (int k = i; k >= l + 1; --k) {
        double hh11 = hdiag[k - 1], hh12 = hsup[k - 1];
        double hh21 = hsub[k], hh22 = hdiag[k];
        double tst1 = fabs(hh11) + fabs(hh22);
        if (fabs(hh21) <= smlnum) { lnew = k; break; }
        if (fabs(hh21) <= ulp * tst1) {
          double ab = std::max(fabs(hh21), fabs(hh12));
          double ba = std::min(fabs(hh21), fabs(hh12));
          double aa = std::max(fabs(hh22), fabs(hh11 - hh22));
          double bb = std::min(fabs(hh22), fabs(hh11 - hh22));
          double s = aa + ab;
          if (ba * (ab / s) <= std::max(smlnum, ulpx * (bb * (aa / s)))) {
            lnew = k;
            break;
          }
        }
      }
    } else {
      lnew = i;
    }

    // ---- subdiagonal repair (reference :589-665): ℍ[lnew, lnew-1] is
    // negligible but H0's subdiagonal entry is not -> RQ-type chain.
    if (lnew > 0 && p > 1) {
      double* H0 = mat(H, 0, n);
      double t1r = fabs(H0[(size_t)(lnew - 1) * n + lnew - 1]) +
                   fabs(H0[(size_t)lnew * n + lnew]);
      if (fabs(H0[(size_t)lnew * n + lnew - 1]) >
          std::max(ulp * t1r, smlnum)) {
        for (int k = i; k >= lnew; --k) {
          for (int f = 0; f < p - 1; ++f) {
            double* Hf = mat(H, f, n);
            double x0 = Hf[(size_t)k * n + k];
            double x1 = Hf[(size_t)k * n + k - 1];
            double xv[2] = {x0, x1};
            double w2v[2], tau, beta;
            larfg(2, xv, w2v, tau, beta);
            double wv[2] = {w2v[1], 1.0};
            // columns (k-1, k), rows [0, k): right-reflector on the pair
            double M2[4] = {1.0 - tau * wv[0] * wv[0], -tau * wv[0] * wv[1],
                            -tau * wv[1] * wv[0], 1.0 - tau * wv[1] * wv[1]};
            Hf[(size_t)k * n + k - 1] = 0.0;
            Hf[(size_t)k * n + k] = beta;
            mat_right(Hf, n, k - 1, 2, 0, k, M2);
            mat_left(mat(H, f + 1, n), n, k - 1, 2, k - 1, n, M2);
            if (want_z) mat_right(mat(Z, f + 1, n), n, k - 1, 2, 0, n, M2);
          }
          if (k < i) {
            double* Hl = mat(H, p - 1, n);
            double x0 = Hl[(size_t)(k + 1) * n + k + 1];
            double x1 = Hl[(size_t)(k + 1) * n + k];
            double xv[2] = {x0, x1};
            double w2v[2], tau, beta;
            larfg(2, xv, w2v, tau, beta);
            double wv[2] = {w2v[1], 1.0};
            double M2[4] = {1.0 - tau * wv[0] * wv[0], -tau * wv[0] * wv[1],
                            -tau * wv[1] * wv[0], 1.0 - tau * wv[1] * wv[1]};
            Hl[(size_t)(k + 1) * n + k] = 0.0;
            Hl[(size_t)(k + 1) * n + k + 1] = beta;
            mat_right(Hl, n, k, 2, 0, k + 1, M2);
            mat_left(mat(H, 0, n), n, k, 2, k, n, M2);
            if (want_z) mat_right(mat(Z, 0, n), n, k, 2, 0, n, M2);
          }
        }
        mat(H, p - 1, n)[(size_t)lnew * n + lnew - 1] = 0.0;
      }
    }
    if (lnew > 0) mat(H, 0, n)[(size_t)lnew * n + lnew - 1] = 0.0;

    if (lnew >= i - 1) {
      // ======================= deflate 1 or 2 ==========================
      if (lnew == i) {
        wr[i] = hdiag[i];
        wi[i] = 0.0;
      } else {
        // explicit 2x2 product block
        double hp11 = 1.0, hp12 = 0.0, hp22 = 1.0;
        for (int f = 1; f < p; ++f) {
          const double* Hf = mat(H, f, n);
          double d1 = Hf[(size_t)(i - 1) * n + i - 1];
          double d2 = Hf[(size_t)i * n + i];
          double u = Hf[(size_t)(i - 1) * n + i];
          hp12 = hp11 * u + hp12 * d2;
          hp11 *= d1;
          hp22 *= d2;
        }
        double* H0 = mat(H, 0, n);
        double a11 = H0[(size_t)(i - 1) * n + i - 1];
        double a12 = H0[(size_t)(i - 1) * n + i];
        double a21 = H0[(size_t)i * n + i - 1];
        double a22 = H0[(size_t)i * n + i];
        double bh11 = a11 * hp11, bh12 = a11 * hp12 + a12 * hp22;
        double bh21 = a21 * hp11, bh22 = a21 * hp12 + a22 * hp22;
        double aa = bh11, bb = bh12, cc = bh21, dd = bh22, cs0, sn0;
        double w1r, w1i, w2r, w2i;
        lanv2(aa, bb, cc, dd, cs0, sn0, w1r, w1i, w2r, w2i);
        bool lam_real = (cc == 0.0);
        wr[i - 1] = w1r; wi[i - 1] = w1i;
        wr[i] = w2r; wi[i] = w2i;

        // negligible-diagonal detection in the triangular factors
        int jmin = -1, jmax = -1;
        for (int f = 1; f < p; ++f) {
          const double* Hf = mat(H, f, n);
          if (fabs(Hf[(size_t)(i - 1) * n + i - 1]) <= hnorms[f] && jmin < 0)
            jmin = f;
          if (fabs(Hf[(size_t)i * n + i]) <= hnorms[f]) jmax = f;
        }
        if (jmin >= 0 && jmax >= 0) {
          if (jmin <= p - jmax) jmax = -1; else jmin = -1;
        }

        if (jmin >= 1) {
          // chain A (reference :959-977)
          for (int f = 0; f <= jmin - 2; ++f) {
            double* Hf = mat(H, f, n);
            double xv[2] = {Hf[(size_t)i * n + i], Hf[(size_t)i * n + i - 1]};
            double w2v[2], tau, beta;
            larfg(2, xv, w2v, tau, beta);
            double wv[2] = {w2v[1], 1.0};
            double M2[4] = {1.0 - tau * wv[0] * wv[0], -tau * wv[0] * wv[1],
                            -tau * wv[1] * wv[0], 1.0 - tau * wv[1] * wv[1]};
            Hf[(size_t)i * n + i - 1] = 0.0;
            Hf[(size_t)i * n + i] = beta;
            mat_right(Hf, n, i - 1, 2, 0, i, M2);
            mat_left(mat(H, f + 1, n), n, i - 1, 2, i - 1, n, M2);
            if (want_z) mat_right(mat(Z, f + 1, n), n, i - 1, 2, 0, n, M2);
          }
        } else {
          // chain B: rotation + retriangularization (<=20 iterations)
          double aA1 = std::hypot(w1r, w1i), aA2 = std::hypot(w2r, w2i);
          double amx = std::max(aA1, aA2), amn = std::min(aA1, aA2);
          bool prod0 = (w1r == 0 && w1i == 0) || (w2r == 0 && w2i == 0);
          bool replaceG = ((jmax >= 1) && lam_real) || prod0 ||
                          (!prod0 && lam_real && amn < ulp * amx);
          for (int t = 0; t < 20; ++t) {
            double c, s;
            if (replaceG) {
              givens(H0[(size_t)(i - 1) * n + i - 1],
                     H0[(size_t)i * n + i - 1], c, s);
            } else {
              c = cs0; s = sn0;
            }
            // rows (i-1, i) of H0 from the left by [[c, s], [-s, c]]
            double L2[4] = {c, s, -s, c};
            mat_left(H0, n, i - 1, 2, i - 1, n, L2);
            // cols (i-1, i) of H[p-1] (or H0 if p == 1) by the adjoint
            double R2[4] = {c, -s, s, c};
            mat_right(mat(H, p > 1 ? p - 1 : 0, n), n, i - 1, 2, 0, i + 1, R2);
            if (want_z) mat_right(mat(Z, 0, n), n, i - 1, 2, 0, n, R2);
            for (int f = p - 1; f >= 1; --f) {
              if (f < jmax + 1) continue;
              double* Hf = mat(H, f, n);
              double xv[2] = {Hf[(size_t)(i - 1) * n + i - 1],
                              Hf[(size_t)i * n + i - 1]};
              double w2v[2], tau, beta;
              larfg(2, xv, w2v, tau, beta);
              refl_to_mat(2, w2v, tau, G2);
              Hf[(size_t)(i - 1) * n + i - 1] = beta;
              Hf[(size_t)i * n + i - 1] = 0.0;
              mat_left(Hf, n, i - 1, 2, i, n, G2);
              mat_right(mat(H, f - 1, n), n, i - 1, 2, 0, i + 1, G2);
              if (want_z) mat_right(mat(Z, f, n), n, i - 1, 2, 0, n, G2);
            }
            double sub = fabs(H0[(size_t)i * n + i - 1]);
            if (!replaceG || sub < std::max(smlnum, ulp * amx)) break;
            replaceG = true;
          }
          if (jmax >= 0 || bh21 == 0.0) H0[(size_t)i * n + i - 1] = 0.0;
          if (jmax >= 1) mat(H, jmax, n)[(size_t)i * n + i - 1] = 0.0;
        }

        // eigenvalue-order check after replacement rotations
        double l1 = mat(H, 0, n)[(size_t)(i - 1) * n + i - 1];
        double l2v = mat(H, 0, n)[(size_t)i * n + i];
        for (int f = 1; f < p; ++f) {
          l1 *= mat(H, f, n)[(size_t)(i - 1) * n + i - 1];
          l2v *= mat(H, f, n)[(size_t)i * n + i];
        }
        if (lam_real && fabs(l1 - w1r) > fabs(l1 - w2r)) {
          std::swap(wr[i - 1], wr[i]);
        }
      }
      i = lnew - 1;
      l = 0;
      its = 1;
      continue;
    }

    // ========================= bulge chase =============================
    l = lnew;
    bool exc1 = (its == 10);
    bool exc2 = (its % 10 == 0) && !exc1;
    bool exc = exc1 || exc2;
    double rt1r, rt1i, rt2r, rt2i;
    double h44E = 0, h33E = 0, h43h34E = 0;
    if (exc) {
      double sE = exc1 ? fabs(hsub[std::min(l + 1, n - 1)]) +
                             fabs(hsub[std::min(l + 2, n - 1)])
                       : fabs(hsub[i]) + fabs(hsub[i - 1]);
      h44E = dat1 * sE + (exc1 ? hdiag[l] : hdiag[i]);
      h33E = h44E;
      h43h34E = dat2 * sE * sE;
    }
    {
      double h44 = hdiag[i], h33 = hdiag[i - 1];
      double h43 = hsub[i], h34 = hsup[i - 1];
      double ssh = fabs(h33) + fabs(h34) + fabs(h43) + fabs(h44);
      if (ssh == 0.0) {
        rt1r = rt1i = rt2r = rt2i = 0.0;
      } else {
        double h33n = h33 / ssh, h44n = h44 / ssh;
        double h34n = h34 / ssh, h43n = h43 / ssh;
        double trc = (h33n + h44n) * 0.5;
        double disc = (h33n - trc) * (h44n - trc) - h34n * h43n;
        double rtdisc = sqrt(fabs(disc));
        if (disc >= 0) {
          rt1r = trc * ssh;
          rt1i = rtdisc * ssh;
          rt2r = rt1r;
          rt2i = -rt1i;
        } else {
          double r1 = trc + rtdisc, r2 = trc - rtdisc;
          double pick = (fabs(r1 - h44n) <= fabs(r2 - h44n)) ? r1 : r2;
          rt1r = rt2r = pick * ssh;
          rt1i = rt2i = 0.0;
        }
      }
    }
    int m = l;
    double v0[3];
    {
      double h11 = hdiag[m], h12 = hsup[m];
      double h21 = hsub[std::min(m + 1, n - 1)];
      double h22 = hdiag[std::min(m + 1, n - 1)];
      double hsub_m2 = hsub[std::min(m + 2, n - 1)];
      double v1, v2, v3;
      if (exc) {
        double h44s = h44E - h11, h33s = h33E - h11;
        double h21s = (h21 == 0.0) ? 1.0 : h21;
        v1 = (h33s * h44s - h43h34E) / h21s + h12;
        v2 = h22 - h11 - h33s - h44s;
        v3 = hsub_m2;
      } else {
        double sv = fabs(h11 - rt2r) + fabs(rt2i) + fabs(h21);
        if (sv == 0.0) sv = 1.0;
        double h21s = h21 / sv;
        v1 = h21s * h12 + (h11 - rt1r) * ((h11 - rt2r) / sv) -
             rt1i * (rt2i / sv);
        v2 = h21s * (h11 + h22 - rt1r - rt2r);
        v3 = h21s * hsub_m2;
      }
      double snorm = fabs(v1) + fabs(v2) + fabs(v3);
      if (snorm == 0.0) snorm = 1.0;
      v0[0] = v1 / snorm;
      v0[1] = v2 / snorm;
      v0[2] = v3 / snorm;
    }

    for (int k = m; k <= i - 1; ++k) {
      int nr = std::min(3, i - k + 1);
      int hi_r = std::min(k + 3, i) + 1;
      double* H0 = mat(H, 0, n);
      if (k > m) {
        for (int t = 0; t < nr; ++t) x3[t] = H0[(size_t)(k + t) * n + k - 1];
      } else {
        for (int t = 0; t < nr; ++t) x3[t] = v0[t];
      }
      double tau, beta;
      larfg(nr, x3, w3, tau, beta);
      refl_to_mat(nr, w3, tau, G3);
      if (k > m) {
        H0[(size_t)k * n + k - 1] = beta;
        for (int t = 1; t < nr; ++t) H0[(size_t)(k + t) * n + k - 1] = 0.0;
      }
      mat_left(H0, n, k, nr, k, n, G3);
      mat_right(mat(H, p > 1 ? p - 1 : 0, n), n, k, nr, 0, hi_r, G3);
      if (want_z) mat_right(mat(Z, 0, n), n, k, nr, 0, n, G3);
      for (int f = p - 1; f >= 1; --f) {
        double* Hf = mat(H, f, n);
        for (int t = 0; t < nr; ++t) x3[t] = Hf[(size_t)(k + t) * n + k];
        larfg(nr, x3, w3, tau, beta);
        refl_to_mat(nr, w3, tau, G3);
        Hf[(size_t)k * n + k] = beta;
        for (int t = 1; t < nr; ++t) Hf[(size_t)(k + t) * n + k] = 0.0;
        mat_left(Hf, n, k, nr, k + 1, n, G3);
        mat_right(mat(H, f - 1, n), n, k, nr, 0, hi_r, G3);
        if (want_z) mat_right(mat(Z, f, n), n, k, nr, 0, n, G3);
        if (nr == 3) {
          // second (2-element) re-triangularization
          double xv[2] = {Hf[(size_t)(k + 1) * n + k + 1],
                          Hf[(size_t)(k + 2) * n + k + 1]};
          double w2v[2], tau2, beta2;
          larfg(2, xv, w2v, tau2, beta2);
          refl_to_mat(2, w2v, tau2, G2);
          Hf[(size_t)(k + 1) * n + k + 1] = beta2;
          Hf[(size_t)(k + 2) * n + k + 1] = 0.0;
          mat_left(Hf, n, k + 1, 2, k + 2, n, G2);
          mat_right(mat(H, f - 1, n), n, k + 1, 2, 0, hi_r, G2);
          if (want_z) mat_right(mat(Z, f, n), n, k + 1, 2, 0, n, G2);
        }
      }
    }
    its += 1;
  }

  // scrub: subdiagonals of real eigenvalues, triangular lower parts
  double* H0 = mat(H, 0, n);
  for (int r = 1; r < n; ++r)
    if (wi[r - 1] == 0.0) H0[(size_t)r * n + r - 1] = 0.0;
  for (int f = 1; f < p; ++f) {
    double* Hf = mat(H, f, n);
    for (int r = 1; r < n; ++r)
      for (int c = 0; c < r; ++c) Hf[(size_t)r * n + c] = 0.0;
  }
  return 0;
}

}  // namespace

// ===========================================================================
// Complex single-shift periodic QZ (MB03BZ shape) for NONSINGULAR windows.
//
// Independent C++ rewrite of the algorithm the JAX core
// ../periodicschurdecompositions_jl_tpu/ops/pqz_complex.py implements
// (reference behavior: /root/reference/src/generalized.jl:166-931) for the
// AED window analyses (ops/aed.py): input H[0] upper Hessenberg,
// H[1..p-1] upper triangular, signature S[l] in {+1,-1}, S[0] = +1.
// SCOPE: the common nonsingular fast path only — a negligible diagonal in
// any triangular factor (the deflate_pos/neg + controlled-zero-shift
// machinery) returns rc=2 and the caller falls back to the jitted exact
// core; non-convergence returns rc=1.  Eigenvalues in the decomposed
// (alpha, beta in {0,1} -- always 1 here, 2^scale) form.

#include <complex>

namespace pqzcx {

using cd = std::complex<double>;

inline cd* cmat(cd* H, int f, int n) { return H + (size_t)f * n * n; }

// Complex Givens with real c >= 0: [c s; -conj(s) c] [f; g] = [r; 0].
// g == 0 -> (1, 0, f); f == 0 -> (0, conj(g)/|g|, |g|).
inline void zgivens(cd f, cd g, double& c, cd& s, cd& r) {
  if (g == cd(0.0, 0.0)) { c = 1.0; s = cd(0.0, 0.0); r = f; return; }
  if (f == cd(0.0, 0.0)) {
    double ag = std::abs(g);
    c = 0.0; s = std::conj(g) / ag; r = cd(ag, 0.0); return;
  }
  double sc = std::max(std::max(fabs(f.real()), fabs(f.imag())),
                       std::max(fabs(g.real()), fabs(g.imag())));
  cd fs = f / sc, gs = g / sc;
  double d2 = std::norm(fs) + std::norm(gs);
  double d = sqrt(d2), af = std::abs(fs);
  c = af / d;
  cd fsign = fs / af;
  r = fsign * d * sc;
  s = fsign * std::conj(gs) / d;
}

// rows k, k+1 of Hf, columns [lo, hi): left rotation [c s; -conj(s) c]
inline void zrowrot(cd* Hf, int n, int k, double c, cd s, int lo, int hi) {
  cd* r0 = Hf + (size_t)k * n;
  cd* r1 = Hf + (size_t)(k + 1) * n;
  for (int j = lo; j < hi; ++j) {
    cd a = r0[j], b = r1[j];
    r0[j] = c * a + s * b;
    r1[j] = -std::conj(s) * a + c * b;
  }
}

// cols k, k+1 of Hf, rows [lo, hi): right multiply by rmat_adj(c, s) =
// [[c, -s], [conj(s), c]]  (new_c0 = c*c0 + conj(s)*c1; new_c1 = -s*c0 + c*c1)
inline void zcolrot(cd* Hf, int n, int k, double c, cd s, int lo, int hi) {
  for (int i = lo; i < hi; ++i) {
    cd* row = Hf + (size_t)i * n;
    cd a = row[k], b = row[k + 1];
    row[k] = c * a + std::conj(s) * b;
    row[k + 1] = -s * a + c * b;
  }
}

inline void renorm(cd& alpha, int& scale) {
  double mag = std::abs(alpha);
  if (mag == 0.0) { scale = 0; return; }
  int e;
  std::frexp(mag, &e);           // mag = m * 2^e, m in [0.5, 1)
  alpha = std::ldexp(1.0, 1 - e) * alpha;
  scale += e - 1;
}

// tiny deterministic PRNG for the exceptional shifts
inline double xrand(unsigned long long& st) {
  st ^= st << 13; st ^= st >> 7; st ^= st << 17;
  return (double)(st % 2000001) / 1000000.0 - 1.0;
}

int pqz_complex(int p, int n, cd* H, const int* S, cd* Z, cd* alpha,
                double* beta, int* scal, int maxitfac, int want_z) {
  const double ulp = 2.220446049250313e-16;
  const double unfl = 2.2250738585072014e-308;
  const double smlnum = unfl * ((double)n / ulp);
  const double safmin = unfl;
  const long maxit = (long)maxitfac * n;
  unsigned long long rng = 0x9E3779B97F4A7C15ull;

  int ilast = n - 1;
  long iiter = 0;
  for (long jiter = 0; jiter < maxit && ilast >= 0; ++jiter) {
    cd* H0 = cmat(H, 0, n);
    // ---- test 1: bottom-most negligible Hessenberg subdiagonal --------
    int jlo = 0;
    for (int j = ilast; j >= 1; --j) {
      double tol = std::max(ulp * (std::abs(H0[(size_t)(j - 1) * n + j - 1])
                                   + std::abs(H0[(size_t)j * n + j])),
                            smlnum);
      if (std::abs(H0[(size_t)j * n + j - 1]) <= tol) {
        H0[(size_t)j * n + j - 1] = cd(0.0, 0.0);
        jlo = j;
        break;                    // largest such j (scan from ilast down)
      }
    }
    if (ilast == 0 || jlo == ilast) {
      // ---- split a 1x1 at ilast (safeprod over the cycle diagonal) ----
      cd a(1.0, 0.0); double b = 1.0; int sc = 0;
      for (int l = 0; l < p; ++l) {
        cd d = cmat(H, l, n)[(size_t)ilast * n + ilast];
        if (S[l] > 0) a *= d;
        else {
          if (d == cd(0.0, 0.0)) { b = 0.0; }
          else a /= d;
        }
        renorm(a, sc);
      }
      alpha[ilast] = a; beta[ilast] = b; scal[ilast] = sc;
      --ilast; iiter = 0;
      continue;
    }
    // ---- tests 2/3: negligible triangular diagonal -> fall back -------
    for (int l = 1; l < p; ++l) {
      cd* Hl = cmat(H, l, n);
      for (int j = jlo; j <= ilast; ++j) {
        double t;
        if (j == ilast) t = std::abs(Hl[(size_t)(j - 1) * n + j]);
        else if (j == jlo) t = std::abs(Hl[(size_t)j * n + j + 1]);
        else t = std::abs(Hl[(size_t)(j - 1) * n + j])
               + std::abs(Hl[(size_t)j * n + j + 1]);
        if (std::abs(Hl[(size_t)j * n + j]) <= std::max(ulp * t, smlnum))
          return 2;               // singular-factor machinery: jitted path
      }
    }
    // ---- single-shift QZ sweep ---------------------------------------
    ++iiter;
    int ifirst = jlo;
    double c; cd s, r;
    if (iiter % 10 == 0) {        // exceptional: random rotation
      cd f(xrand(rng), xrand(rng)), g(xrand(rng), xrand(rng));
      zgivens(f, g, c, s, r);
    } else {
      zgivens(cd(1.0, 0.0), cd(1.0, 0.0), c, s, r);
      for (int l = p - 1; l >= 1; --l) {
        cd hf = cmat(H, l, n)[(size_t)ifirst * n + ifirst];
        cd hl = cmat(H, l, n)[(size_t)ilast * n + ilast];
        if (S[l] > 0) zgivens(hf * c, hl * std::conj(s), c, s, r);
        else { zgivens(hl * c, -hf * std::conj(s), c, s, r); s = -s; }
      }
      cd h0f = H0[(size_t)ifirst * n + ifirst];
      cd h0l = H0[(size_t)ilast * n + ilast];
      cd h0sub = H0[(size_t)(ifirst + 1) * n + ifirst];
      zgivens(h0f * c - h0l * std::conj(s), h0sub * c, c, s, r);
    }
    for (int k = ifirst; k <= ilast - 1; ++k) {
      if (k > ifirst) {
        cd f = H0[(size_t)k * n + k - 1];
        cd g = H0[(size_t)(k + 1) * n + k - 1];
        zgivens(f, g, c, s, r);
        H0[(size_t)k * n + k - 1] = r;
        H0[(size_t)(k + 1) * n + k - 1] = cd(0.0, 0.0);
      }
      zrowrot(H0, n, k, c, s, k, n);
      if (want_z) zcolrot(cmat(Z, 0, n), n, k, c, s, 0, n);
      for (int l = p - 1; l >= 1; --l) {
        cd* Hl = cmat(H, l, n);
        if (S[l] > 0) {
          zcolrot(Hl, n, k, c, s, 0, k + 2);
          cd f = Hl[(size_t)k * n + k], g = Hl[(size_t)(k + 1) * n + k];
          double cn; cd sn;
          zgivens(f, g, cn, sn, r);
          Hl[(size_t)k * n + k] = r;
          Hl[(size_t)(k + 1) * n + k] = cd(0.0, 0.0);
          zrowrot(Hl, n, k, cn, sn, k + 1, n);
          c = cn; s = sn;
        } else {
          zrowrot(Hl, n, k, c, s, k, n);
          // annihilate Hl[k+1][k] from the RIGHT: rotation from the row
          // pair (Hl[k+1][k+1], Hl[k+1][k]) -- python: givens(row[k+1],
          // row[k]); then columns (k, k+1) get lmat(cn, sn); sn = -sn
          cd f = Hl[(size_t)(k + 1) * n + k + 1];
          cd g = Hl[(size_t)(k + 1) * n + k];
          double cn; cd sn;
          zgivens(f, g, cn, sn, r);
          Hl[(size_t)(k + 1) * n + k + 1] = r;
          Hl[(size_t)(k + 1) * n + k] = cd(0.0, 0.0);
          // columns (k, k+1), rows [0, k+1): right-multiply by
          // lmat(cn, sn) = [[cn, sn], [-conj(sn), cn]]:
          // new_c0 = cn*c0 - conj(sn)*c1 ; new_c1 = sn*c0 + cn*c1
          for (int i = 0; i < k + 1; ++i) {
            cd* row = Hl + (size_t)i * n;
            cd a = row[k], bb = row[k + 1];
            row[k] = cn * a - std::conj(sn) * bb;
            row[k + 1] = sn * a + cn * bb;
          }
          c = cn; s = -sn;
        }
        if (want_z) zcolrot(cmat(Z, l, n), n, k, c, s, 0, n);
      }
      int hi = std::min(k + 3, n);
      zcolrot(H0, n, k, c, s, 0, hi);
    }
  }
  if (ilast >= 0) return 1;       // budget exhausted

  // ---- postprocess: real-nonnegative triangular diagonals ------------
  for (int l = p - 1; l >= 1; --l) {
    cd* Hl = cmat(H, l, n);
    cd* Hm = cmat(H, l - 1, n);
    for (int j = 0; j < n; ++j) {
      cd d = Hl[(size_t)j * n + j];
      double ad = std::abs(d);
      if (ad <= safmin) continue;
      cd z = std::conj(d) / ad;
      if (S[l] > 0) {             // scale row j of Hl by z
        for (int col = 0; col < n; ++col) Hl[(size_t)j * n + col] *= z;
      } else {                    // scale col j of Hl by z
        for (int row = 0; row < n; ++row) Hl[(size_t)row * n + j] *= z;
      }
      Hl[(size_t)j * n + j] = cd(ad, 0.0);
      cd sf = (S[l] > 0) ? z : std::conj(z);
      if (want_z) {               // Z[l] col j *= conj(sf)
        cd* Zl = cmat(Z, l, n);
        for (int row = 0; row < n; ++row)
          Zl[(size_t)row * n + j] *= std::conj(sf);
      }
      if (S[l - 1] > 0) {         // neighbor: col j *= conj(sf)
        for (int row = 0; row < n; ++row)
          Hm[(size_t)row * n + j] *= std::conj(sf);
      } else {                    // neighbor: row j *= sf
        for (int col = 0; col < n; ++col)
          Hm[(size_t)j * n + col] *= sf;
      }
    }
  }
  return 0;
}

}  // namespace pqzcx

extern "C" {

// Full real periodic Schur pipeline: reduction + iteration.
// A: (p, n, n) row-major in/out (out: quasi-triangular T stack).
// Z: (p, n, n) out (orthogonal factors; Z[l]^T A[l] Z[l+1] = T[l]).
// wr, wi: (n,) eigenvalue parts.  Returns 0 on success, 1 on
// non-convergence.
int pschur_real_cpu(int p, int n, double* A, double* Z, double* wr,
                    double* wi, int maxitfac, int want_z) {
  phessenberg(p, n, A, Z, want_z);
  return pqr_real(p, n, A, Z, wr, wi, maxitfac, want_z);
}

// Reduction only (for tests).
void phessenberg_cpu(int p, int n, double* A, double* Q, int want_q) {
  phessenberg(p, n, A, Q, want_q);
}


// Complex periodic QZ of a Hessenberg+triangular cycle (AED windows).
// H: (p, n, n) row-major complex128 (interleaved) in/out; S: (p,) int
// (+1 direct / -1 or 0 inverted); Z: (p, n, n) complex128 out (identity-
// initialized here); alpha complex128 (n,), beta double (n,), scal int (n,).
// Returns 0 ok, 1 non-convergence, 2 singular-factor case (caller falls
// back to the full-machinery path).
int pqz_complex_cpu(int p, int n, double* H, const int* S, double* Z,
                    double* alpha, double* beta, int* scal, int maxitfac,
                    int want_z) {
  using pqzcx::cd;
  cd* Hc = reinterpret_cast<cd*>(H);
  cd* Zc = reinterpret_cast<cd*>(Z);
  if (want_z) {
    for (int l = 0; l < p; ++l)
      for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j)
          Zc[(size_t)l * n * n + (size_t)i * n + j] =
              (i == j) ? cd(1.0, 0.0) : cd(0.0, 0.0);
  }
  return pqzcx::pqz_complex(p, n, Hc, S, Zc,
                            reinterpret_cast<cd*>(alpha), beta, scal,
                            maxitfac, want_z);
}

}  // extern "C"
