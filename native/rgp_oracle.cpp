// rgp_oracle: independent double-precision reference implementations of the
// framework's hot math, in plain C++ (no BLAS/LAPACK dependency).
//
// Role: the TPU-native framework's analog of the reference's trusted native
// inner loops (SURVEY.md S2.3 N1-N3: BLAS/LAPACK + GPy's Cython kernels).
// The JAX implementations are cross-checked against this library in the test
// suite (tests/test_native_oracle.py) through a ctypes boundary — a second,
// independently-written implementation of the psi-statistics (Appendix A.2)
// and the collapsed VarDTC bound (Appendix A.3).
//
// Build: make -C native    (g++ -O2 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// RBF-ARD psi statistics under q(x_t) = N(mu_t, diag(s_t)).
//   var: signal variance sf^2;  ls: lengthscales (Q,)
//   mu, s: (T, Q) row-major;  Z: (M, Q) row-major
// Outputs: psi0 (T,), psi1 (T*M,), psi2 (M*M,) — psi2 summed over t.
void rbf_psi_stats(
    const double* mu, const double* s, const double* Z, const double* ls,
    double var, int64_t T, int64_t M, int64_t Q,
    double* psi0, double* psi1, double* psi2)
{
    std::vector<double> l2(Q);
    for (int64_t q = 0; q < Q; ++q) l2[q] = ls[q] * ls[q];

    for (int64_t i = 0; i < M * M; ++i) psi2[i] = 0.0;

    for (int64_t t = 0; t < T; ++t) {
        psi0[t] = var;
        const double* mu_t = mu + t * Q;
        const double* s_t = s + t * Q;

        // Psi1[t,m]
        for (int64_t m = 0; m < M; ++m) {
            const double* z_m = Z + m * Q;
            double logv = std::log(var);
            for (int64_t q = 0; q < Q; ++q) {
                double d = mu_t[q] - z_m[q];
                logv += -0.5 * std::log1p(s_t[q] / l2[q])
                        - 0.5 * d * d / (l2[q] + s_t[q]);
            }
            psi1[t * M + m] = std::exp(logv);
        }

        // Psi2 contribution of timestep t
        for (int64_t m = 0; m < M; ++m) {
            const double* z_m = Z + m * Q;
            for (int64_t n = 0; n < M; ++n) {
                const double* z_n = Z + n * Q;
                double logv = 2.0 * std::log(var);
                for (int64_t q = 0; q < Q; ++q) {
                    double dz = z_m[q] - z_n[q];
                    double zbar = 0.5 * (z_m[q] + z_n[q]);
                    double dm = mu_t[q] - zbar;
                    logv += -0.5 * std::log1p(2.0 * s_t[q] / l2[q])
                            - dz * dz / (4.0 * l2[q])
                            - dm * dm / (l2[q] + 2.0 * s_t[q]);
                }
                psi2[m * M + n] += std::exp(logv);
            }
        }
    }
}

// In-place lower Cholesky of the symmetric PD matrix A (N, N) row-major.
// Returns 0 on success, 1 + index of the failing pivot otherwise.
int64_t cholesky(double* A, int64_t N)
{
    for (int64_t j = 0; j < N; ++j) {
        double d = A[j * N + j];
        for (int64_t k = 0; k < j; ++k) d -= A[j * N + k] * A[j * N + k];
        if (d <= 0.0) return 1 + j;
        d = std::sqrt(d);
        A[j * N + j] = d;
        for (int64_t i = j + 1; i < N; ++i) {
            double v = A[i * N + j];
            for (int64_t k = 0; k < j; ++k) v -= A[i * N + k] * A[j * N + k];
            A[i * N + j] = v / d;
        }
        for (int64_t k = j + 1; k < N; ++k) A[j * N + k] = 0.0;
    }
    return 0;
}

static void solve_lower(const double* L, double* b, int64_t N, int64_t D)
{
    // solve L x = b in place; b is (N, D) row-major
    for (int64_t i = 0; i < N; ++i) {
        for (int64_t d = 0; d < D; ++d) {
            double v = b[i * D + d];
            for (int64_t k = 0; k < i; ++k) v -= L[i * N + k] * b[k * D + d];
            b[i * D + d] = v / L[i * N + i];
        }
    }
}

static void solve_lower_t(const double* L, double* b, int64_t N, int64_t D)
{
    // solve L^T x = b in place
    for (int64_t i = N - 1; i >= 0; --i) {
        for (int64_t d = 0; d < D; ++d) {
            double v = b[i * D + d];
            for (int64_t k = i + 1; k < N; ++k) v -= L[k * N + i] * b[k * D + d];
            b[i * D + d] = v / L[i * N + i];
        }
    }
}

// Collapsed VarDTC bound F0 (Appendix A.3) with optional variational targets.
//   Kmm (M,M), psi0_sum scalar, psi1 (T,M), psi2 (M,M), Y (T,D),
//   Yvar (T,D) or nullptr, noise sigma^2, jitter added to Kmm diag.
// Returns the bound; NaN if a factorization fails.
double collapsed_bound(
    const double* Kmm_in, double psi0_sum, const double* psi1,
    const double* psi2, const double* Y, const double* Yvar,
    double noise, double jitter,
    int64_t T, int64_t M, int64_t D)
{
    const double beta = 1.0 / noise;
    std::vector<double> Lm(Kmm_in, Kmm_in + M * M);
    for (int64_t i = 0; i < M; ++i) Lm[i * M + i] += jitter;
    std::vector<double> C(M * M);
    for (int64_t i = 0; i < M * M; ++i) C[i] = Lm[i] + beta * psi2[i];
    if (cholesky(Lm.data(), M)) return NAN;
    if (cholesky(C.data(), M)) return NAN;

    double logdetK = 0.0, logdetC = 0.0;
    for (int64_t i = 0; i < M; ++i) {
        logdetK += 2.0 * std::log(Lm[i * M + i]);
        logdetC += 2.0 * std::log(C[i * M + i]);
    }
    double logB = logdetC - logdetK;

    // tr(Kmm^{-1} Psi2) = sum_ij (Kmm^{-1})_ij Psi2_ji via solves
    std::vector<double> P2(psi2, psi2 + M * M);  // columns solved in place
    solve_lower(Lm.data(), P2.data(), M, M);
    solve_lower_t(Lm.data(), P2.data(), M, M);   // now Kmm^{-1} Psi2
    double trKiP2 = 0.0;
    for (int64_t i = 0; i < M; ++i) trKiP2 += P2[i * M + i];

    // c = Lc^{-1} Psi1^T Y;  quad = ||c||^2
    std::vector<double> P1Y(M * D, 0.0);
    for (int64_t t = 0; t < T; ++t)
        for (int64_t m = 0; m < M; ++m)
            for (int64_t d = 0; d < D; ++d)
                P1Y[m * D + d] += psi1[t * M + m] * Y[t * D + d];
    solve_lower(C.data(), P1Y.data(), M, D);
    double quad = 0.0;
    for (int64_t i = 0; i < M * D; ++i) quad += P1Y[i] * P1Y[i];

    double trYY = 0.0;
    for (int64_t i = 0; i < T * D; ++i) {
        trYY += Y[i] * Y[i];
        if (Yvar) trYY += Yvar[i];
    }

    const double LOG2PI = std::log(2.0 * M_PI);
    return -0.5 * (double)(T * D) * (LOG2PI + std::log(noise))
           - 0.5 * (double)D * logB
           - 0.5 * beta * trYY
           + 0.5 * beta * beta * quad
           - 0.5 * (double)D * beta * (psi0_sum - trKiP2);
}

// Cyclic Jacobi eigendecomposition of the symmetric matrix A (N, N) row-major.
// On return: lam holds eigenvalues, V (N, N) row-major holds eigenvectors as
// COLUMNS (A = V diag(lam) V^T). Independent of LAPACK by design — this is the
// oracle's own eigensolver for cross-checking the whitened collapsed bound.
void jacobi_eigh(const double* A_in, int64_t N, double* lam, double* V)
{
    std::vector<double> A(A_in, A_in + N * N);
    // symmetrize defensively
    for (int64_t i = 0; i < N; ++i)
        for (int64_t j = 0; j < i; ++j) {
            double v = 0.5 * (A[i * N + j] + A[j * N + i]);
            A[i * N + j] = A[j * N + i] = v;
        }
    for (int64_t i = 0; i < N * N; ++i) V[i] = 0.0;
    for (int64_t i = 0; i < N; ++i) V[i * N + i] = 1.0;

    for (int sweep = 0; sweep < 100; ++sweep) {
        double off = 0.0;
        for (int64_t p = 0; p < N; ++p)
            for (int64_t q = p + 1; q < N; ++q) off += A[p * N + q] * A[p * N + q];
        if (off < 1e-30) break;
        for (int64_t p = 0; p < N; ++p) {
            for (int64_t q = p + 1; q < N; ++q) {
                double apq = A[p * N + q];
                if (std::abs(apq) < 1e-300) continue;
                double app = A[p * N + p], aqq = A[q * N + q];
                double tau = (aqq - app) / (2.0 * apq);
                double t = (tau >= 0 ? 1.0 : -1.0)
                           / (std::abs(tau) + std::sqrt(1.0 + tau * tau));
                double c = 1.0 / std::sqrt(1.0 + t * t), s = t * c;
                for (int64_t k = 0; k < N; ++k) {
                    double akp = A[k * N + p], akq = A[k * N + q];
                    A[k * N + p] = c * akp - s * akq;
                    A[k * N + q] = s * akp + c * akq;
                }
                for (int64_t k = 0; k < N; ++k) {
                    double apk = A[p * N + k], aqk = A[q * N + k];
                    A[p * N + k] = c * apk - s * aqk;
                    A[q * N + k] = s * apk + c * aqk;
                }
                for (int64_t k = 0; k < N; ++k) {
                    double vkp = V[k * N + p], vkq = V[k * N + q];
                    V[k * N + p] = c * vkp - s * vkq;
                    V[k * N + q] = s * vkp + c * vkq;
                }
            }
        }
    }
    for (int64_t i = 0; i < N; ++i) lam[i] = A[i * N + i];
}

// Collapsed bound in the spectral-whitening formulation — the independent
// oracle for rgp_tpu.inference.collapsed_vi (whitening_basis + _common):
//   lam_eff = max(lam, floor * lam_max); W = V lam_eff^{-1/2};
//   Kt = W^T Kmm W + diag(1 - max(lam,0)/lam_eff); At = beta W^T Psi2 W;
//   F0 assembled from chol(Kt), chol(Kt + At).
double collapsed_bound_whitened(
    const double* Kmm_in, double psi0_sum, const double* psi1,
    const double* psi2, const double* Y, const double* Yvar,
    double noise, double floor_rel,
    int64_t T, int64_t M, int64_t D)
{
    const double beta = 1.0 / noise;
    std::vector<double> lam(M), V(M * M);
    jacobi_eigh(Kmm_in, M, lam.data(), V.data());
    double lam_max = lam[0];
    for (int64_t i = 1; i < M; ++i) lam_max = std::max(lam_max, lam[i]);
    std::vector<double> W(M * M), topup(M);
    for (int64_t j = 0; j < M; ++j) {
        double le = std::max(lam[j], floor_rel * lam_max);
        double w = 1.0 / std::sqrt(le);
        topup[j] = 1.0 - std::max(lam[j], 0.0) / le;
        for (int64_t i = 0; i < M; ++i) W[i * M + j] = V[i * M + j] * w;
    }
    auto congr = [&](const double* S, std::vector<double>& out) {
        // out = W^T S W
        std::vector<double> SW(M * M, 0.0);
        for (int64_t i = 0; i < M; ++i)
            for (int64_t k = 0; k < M; ++k) {
                double v = S[i * M + k];
                for (int64_t j = 0; j < M; ++j) SW[i * M + j] += v * W[k * M + j];
            }
        out.assign(M * M, 0.0);
        for (int64_t i = 0; i < M; ++i)
            for (int64_t k = 0; k < M; ++k) {
                double v = W[k * M + i];
                for (int64_t j = 0; j < M; ++j) out[i * M + j] += v * SW[k * M + j];
            }
        for (int64_t i = 0; i < M; ++i)
            for (int64_t j = 0; j < i; ++j) {
                double v = 0.5 * (out[i * M + j] + out[j * M + i]);
                out[i * M + j] = out[j * M + i] = v;
            }
    };

    std::vector<double> Kt, At;
    congr(Kmm_in, Kt);
    for (int64_t i = 0; i < M; ++i) Kt[i * M + i] += topup[i];
    congr(psi2, At);
    std::vector<double> Ct(M * M);
    for (int64_t i = 0; i < M * M; ++i) { At[i] *= beta; Ct[i] = Kt[i] + At[i]; }

    std::vector<double> Lk(Kt), Lc(Ct);
    // tiny dtype-resolution jitter, matching _common's j0 for f64
    for (int64_t i = 0; i < M; ++i) {
        double jk = 0.0, jc = 0.0;
        for (int64_t d = 0; d < M; ++d) { jk += Kt[d * M + d]; jc += Ct[d * M + d]; }
        Lk[i * M + i] += 1e-12 * jk / M;
        Lc[i * M + i] += 1e-12 * jc / M;
    }
    if (cholesky(Lk.data(), M)) return NAN;
    if (cholesky(Lc.data(), M)) return NAN;

    double logB = 0.0;
    for (int64_t i = 0; i < M; ++i)
        logB += 2.0 * (std::log(Lc[i * M + i]) - std::log(Lk[i * M + i]));

    // tr(Kt^{-1} At) / beta
    std::vector<double> AtCopy(At);
    solve_lower(Lk.data(), AtCopy.data(), M, M);
    solve_lower_t(Lk.data(), AtCopy.data(), M, M);
    double trKiP2 = 0.0;
    for (int64_t i = 0; i < M; ++i) trKiP2 += AtCopy[i * M + i];
    trKiP2 /= beta;

    // c = Lc^{-1} W^T Psi1^T Y
    std::vector<double> P1Y(M * D, 0.0);
    for (int64_t t = 0; t < T; ++t)
        for (int64_t m = 0; m < M; ++m)
            for (int64_t d = 0; d < D; ++d)
                P1Y[m * D + d] += psi1[t * M + m] * Y[t * D + d];
    std::vector<double> WtP1Y(M * D, 0.0);
    for (int64_t m = 0; m < M; ++m)
        for (int64_t k = 0; k < M; ++k)
            for (int64_t d = 0; d < D; ++d)
                WtP1Y[m * D + d] += W[k * M + m] * P1Y[k * D + d];
    solve_lower(Lc.data(), WtP1Y.data(), M, D);
    double quad = 0.0;
    for (int64_t i = 0; i < M * D; ++i) quad += WtP1Y[i] * WtP1Y[i];

    double trYY = 0.0;
    for (int64_t i = 0; i < T * D; ++i) {
        trYY += Y[i] * Y[i];
        if (Yvar) trYY += Yvar[i];
    }

    const double LOG2PI = std::log(2.0 * M_PI);
    return -0.5 * (double)(T * D) * (LOG2PI + std::log(noise))
           - 0.5 * (double)D * logB
           - 0.5 * beta * trYY
           + 0.5 * beta * beta * quad
           - 0.5 * (double)D * beta * (psi0_sum - trKiP2);
}

// Systematic resampling reference (SMC), matching sample/smc.py semantics.
void systematic_resample(
    const double* log_w, double u0, int64_t N, int64_t* idx)
{
    std::vector<double> w(N);
    double mx = log_w[0];
    for (int64_t i = 1; i < N; ++i) mx = std::max(mx, log_w[i]);
    double Zs = 0.0;
    for (int64_t i = 0; i < N; ++i) { w[i] = std::exp(log_w[i] - mx); Zs += w[i]; }
    double cum = 0.0;
    int64_t i = 0;
    for (int64_t k = 0; k < N; ++k) {
        double target = (u0 + (double)k) / (double)N * Zs;
        while (cum + w[i] < target && i < N - 1) { cum += w[i]; ++i; }
        idx[k] = i;
    }
}

}  // extern "C"
