// Minimal stand-in for <boost/math/distributions.hpp> — only
// beta_distribution and quantile(), the pieces the reference
// Mutect2Cpp_master uses (SomaticClusteringModel.cpp:166-167).
#pragma once
#include "special_functions/beta.hpp"
#include "special_functions/digamma.hpp"

namespace boost {
namespace math {

template <class RealType = double>
class beta_distribution {
    RealType a_, b_;
public:
    beta_distribution(RealType a, RealType b) : a_(a), b_(b) {}
    RealType alpha() const { return a_; }
    RealType beta() const { return b_; }
};

template <class RealType, class P>
inline RealType quantile(const beta_distribution<RealType> &d, P p) {
    return static_cast<RealType>(
        ibeta_inv(static_cast<double>(d.alpha()),
                  static_cast<double>(d.beta()),
                  static_cast<double>(p)));
}

template <class RealType, class X>
inline RealType cdf(const beta_distribution<RealType> &d, X x) {
    return static_cast<RealType>(
        ibeta(static_cast<double>(d.alpha()),
              static_cast<double>(d.beta()),
              static_cast<double>(x)));
}

} // namespace math
} // namespace boost
