// Minimal stand-in for <boost/utility.hpp> used when building the
// reference Mutect2Cpp_master binary as a VCF-concordance oracle
// (see scripts/oracle/build_mutect2_oracle.sh). The reference sources
// use only the BOOST_LIKELY/BOOST_UNLIKELY branch hints from it; boost
// is not installed in this image.
#pragma once

#ifndef BOOST_LIKELY
#define BOOST_LIKELY(x) __builtin_expect(!!(x), 1)
#endif
#ifndef BOOST_UNLIKELY
#define BOOST_UNLIKELY(x) __builtin_expect(!!(x), 0)
#endif
