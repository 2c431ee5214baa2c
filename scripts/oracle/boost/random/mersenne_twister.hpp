// Minimal stand-in for boost::random::mt19937 when building the reference
// Mutect2Cpp_master as an oracle. std::mt19937 implements the identical
// MT19937 algorithm with the same single-value seeding procedure, so the
// generated sequence matches boost's for the reference's fixed seed
// (SomaticClusteringModel.cpp:15).
#pragma once
#include <random>

namespace boost {
namespace random {
using mt19937 = std::mt19937;
} // namespace random
} // namespace boost
