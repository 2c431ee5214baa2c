// Minimal stand-in for boost::dynamic_bitset<> — only the operations the
// reference Mutect2Cpp_master sources use (ReadThreadingGraph.cpp:137-230,
// ReadThreadingAssembler.cpp:171-240): construct with a bit count,
// operator<<= (bits shifted past size-1 are discarded, boost semantics),
// assignable operator[], equality, copy, and std::hash support so
// phmap::flat_hash_set<dynamic_bitset<>> works.
#pragma once
#include <cstddef>
#include <cstdint>
#include <functional>
#include <vector>

namespace boost {

template <typename Block = unsigned long,
          typename Allocator = std::allocator<Block>>
class dynamic_bitset {
    std::size_t nbits_;
    std::vector<std::uint64_t> w_;

    static std::size_t nwords(std::size_t n) { return (n + 63) / 64; }

    void trim() {
        // zero bits above nbits_-1 so block-wise == and hash are canonical
        if (nbits_ % 64 != 0 && !w_.empty())
            w_.back() &= (std::uint64_t(1) << (nbits_ % 64)) - 1;
    }

public:
    class reference {
        std::uint64_t *word_;
        std::uint64_t mask_;
    public:
        reference(std::uint64_t *w, std::uint64_t m) : word_(w), mask_(m) {}
        reference &operator=(bool v) {
            if (v) *word_ |= mask_; else *word_ &= ~mask_;
            return *this;
        }
        reference &operator=(const reference &r) { return (*this = bool(r)); }
        operator bool() const { return (*word_ & mask_) != 0; }
    };

    explicit dynamic_bitset(std::size_t n = 0) : nbits_(n), w_(nwords(n), 0) {}

    std::size_t size() const { return nbits_; }

    dynamic_bitset &operator<<=(std::size_t s) {
        if (s >= nbits_) { w_.assign(w_.size(), 0); return *this; }
        const std::size_t wshift = s / 64, bshift = s % 64;
        const std::size_t n = w_.size();
        if (bshift == 0) {
            for (std::size_t i = n; i-- > wshift;) w_[i] = w_[i - wshift];
        } else {
            for (std::size_t i = n; i-- > wshift;) {
                std::uint64_t hi = w_[i - wshift] << bshift;
                std::uint64_t lo = (i - wshift > 0)
                    ? (w_[i - wshift - 1] >> (64 - bshift)) : 0;
                w_[i] = hi | lo;
            }
        }
        for (std::size_t i = 0; i < wshift; ++i) w_[i] = 0;
        trim();
        return *this;
    }

    reference operator[](std::size_t i) {
        return reference(&w_[i / 64], std::uint64_t(1) << (i % 64));
    }
    bool operator[](std::size_t i) const {
        return (w_[i / 64] >> (i % 64)) & 1;
    }

    bool operator==(const dynamic_bitset &o) const {
        return nbits_ == o.nbits_ && w_ == o.w_;
    }
    bool operator!=(const dynamic_bitset &o) const { return !(*this == o); }

    std::size_t hash_value() const {
        std::size_t h = nbits_ * 0x9e3779b97f4a7c15ull;
        for (std::uint64_t x : w_) {
            x *= 0xff51afd7ed558ccdull;
            x ^= x >> 33;
            h ^= x + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
        }
        return h;
    }
};

} // namespace boost

namespace std {
template <typename B, typename A>
struct hash<boost::dynamic_bitset<B, A>> {
    std::size_t operator()(const boost::dynamic_bitset<B, A> &b) const {
        return b.hash_value();
    }
};
} // namespace std
