// Minimal stand-in for boost::dynamic_bitset<> covering exactly the
// operations the reference pairsnp.hpp uses (this image has no boost).
// Differential-test scaffolding only — NOT part of the framework.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace boost {

template <typename Block = unsigned long, typename Alloc = void>
class dynamic_bitset {
  std::vector<uint64_t> w_;
  size_t n_ = 0;

  static size_t nwords(size_t n) { return (n + 63) / 64; }
  void mask_tail() {
    if (n_ % 64 && !w_.empty()) w_.back() &= (~uint64_t(0)) >> (64 - n_ % 64);
  }

 public:
  static const size_t npos = ~size_t(0);

  dynamic_bitset() = default;
  explicit dynamic_bitset(size_t n) : w_(nwords(n), 0), n_(n) {}

  size_t size() const { return n_; }

  struct ref {
    uint64_t* w;
    uint64_t m;
    ref& operator=(bool v) {
      if (v) *w |= m; else *w &= ~m;
      return *this;
    }
    operator bool() const { return (*w & m) != 0; }
  };
  ref operator[](size_t i) { return ref{&w_[i >> 6], uint64_t(1) << (i & 63)}; }
  bool operator[](size_t i) const { return (w_[i >> 6] >> (i & 63)) & 1; }

  dynamic_bitset operator&(const dynamic_bitset& o) const {
    dynamic_bitset r(n_);
    for (size_t k = 0; k < w_.size(); ++k) r.w_[k] = w_[k] & o.w_[k];
    return r;
  }
  dynamic_bitset& operator|=(const dynamic_bitset& o) {
    for (size_t k = 0; k < w_.size(); ++k) w_[k] |= o.w_[k];
    return *this;
  }

  size_t count() const {
    size_t c = 0;
    for (uint64_t w : w_) c += __builtin_popcountll(w);
    return c;
  }

  dynamic_bitset& flip() {
    for (auto& w : w_) w = ~w;
    mask_tail();
    return *this;
  }

  size_t find_first() const {
    for (size_t k = 0; k < w_.size(); ++k)
      if (w_[k]) return k * 64 + __builtin_ctzll(w_[k]);
    return npos;
  }
  size_t find_next(size_t i) const {
    if (++i >= n_) return npos;
    size_t k = i >> 6;
    uint64_t w = w_[k] & ((~uint64_t(0)) << (i & 63));
    if (w) return k * 64 + __builtin_ctzll(w);
    for (++k; k < w_.size(); ++k)
      if (w_[k]) return k * 64 + __builtin_ctzll(w_[k]);
    return npos;
  }
};

}  // namespace boost
