// Minimal stand-in for boost::math::digamma (used by the reference
// Mutect2Cpp_master's Dirichlet.cpp). Standard recurrence-plus-asymptotic
// evaluation: psi(x) = psi(x+1) - 1/x to push the argument above 10, then
// the Stirling series. Accurate to ~1e-12 for x > 0, which is far inside
// the tolerance of the log-odds it feeds.
#pragma once
#include <cmath>

namespace boost {
namespace math {

inline double digamma(double x) {
    double result = 0.0;
    while (x < 10.0) {
        result -= 1.0 / x;
        x += 1.0;
    }
    // Stirling/asymptotic series: ln x - 1/(2x) - sum B_{2n}/(2n x^{2n})
    const double inv = 1.0 / x;
    const double inv2 = inv * inv;
    result += std::log(x) - 0.5 * inv;
    result -= inv2 * (1.0 / 12 - inv2 * (1.0 / 120 - inv2 * (1.0 / 252 - inv2 * (1.0 / 240 - inv2 * (1.0 / 132)))));
    return result;
}

} // namespace math
} // namespace boost
