// Minimal stand-in for boost::multi_array — only what the reference
// Mutect2Cpp_master BQSR tables use (RecalibrationTables.{h,cpp},
// RecalUtils.cpp): construct from boost::extents[a][b]..., chained
// operator[] element access returning an assignable lvalue at the last
// level, and the ::index typedef.
#pragma once
#include <array>
#include <cstddef>
#include <vector>

namespace boost {

struct extents_t {
    std::vector<std::size_t> dims;
    extents_t operator[](std::size_t n) const {
        extents_t e = *this;
        e.dims.push_back(n);
        return e;
    }
};
inline const extents_t extents{};

namespace ma_detail {
template <class T, std::size_t K>
struct view {
    T *ptr;
    const std::size_t *strides;
    view<T, K - 1> operator[](long i) const {
        return {ptr + static_cast<std::size_t>(i) * strides[0], strides + 1};
    }
};
template <class T>
struct view<T, 1> {
    T *ptr;
    const std::size_t *strides; // strides[0] == 1
    T &operator[](long i) const { return ptr[i]; }
};
} // namespace ma_detail

template <class T, std::size_t N>
class multi_array {
    std::vector<T> data_;
    std::array<std::size_t, N> dims_{};
    std::array<std::size_t, N> strides_{};

public:
    typedef long index;

    multi_array() = default;
    multi_array(const extents_t &e) {
        std::size_t total = 1;
        for (std::size_t k = 0; k < N; ++k) dims_[k] = e.dims[k];
        for (std::size_t k = N; k-- > 0;) {
            strides_[k] = total;
            total *= dims_[k];
        }
        data_.assign(total, T());
    }

    ma_detail::view<T, N - 1> operator[](long i) {
        return {data_.data() + static_cast<std::size_t>(i) * strides_[0],
                strides_.data() + 1};
    }
    ma_detail::view<const T, N - 1> operator[](long i) const {
        return {data_.data() + static_cast<std::size_t>(i) * strides_[0],
                strides_.data() + 1};
    }

    const std::size_t *shape() const { return dims_.data(); }
    std::size_t num_elements() const { return data_.size(); }
};

} // namespace boost
