// Host-side batch field codec: 256-bit integers <-> 13-bit device limbs.
//
// Native-runtime counterpart of the role GMP/libff play for the
// reference's host paths (key/IO serialization, test-vector prep —
// /root/reference/src/utils/util.h:56-96 dumps vectors through GMP
// bigints). The Python fallback converts one element at a time through
// arbitrary-precision ints; this C++ path does the same work with
// 4x64-bit Montgomery arithmetic (CIOS with __int128) over whole
// arrays, called via ctypes.
//
// All field constants are passed in from Python (computed from the
// public BN254 moduli) so the codec stays curve-generic.
//
// Build: g++ -O3 -shared -fPIC hostcodec.cpp -o libhostcodec.so

#include <cstdint>
#include <cstring>

namespace {

constexpr int W = 4;          // 4 x 64-bit words
constexpr int LIMB_BITS = 13;

struct FieldCtx {
  uint64_t p[W];        // modulus
  uint64_t rr[W];       // 2^512 mod p  (Montgomery-256 "R^2")
  uint64_t r260[W];     // 2^260 mod p  (device Montgomery factor)
  uint64_t one[W];      // 2^256 mod p
  uint64_t ninv;        // -p^{-1} mod 2^64
  int nlimbs;           // device limb count (20)
};

inline bool geq(const uint64_t* a, const uint64_t* b) {
  for (int i = W - 1; i >= 0; --i) {
    if (a[i] != b[i]) return a[i] > b[i];
  }
  return true;
}

inline void sub_p(uint64_t* a, const uint64_t* p) {
  unsigned __int128 borrow = 0;
  for (int i = 0; i < W; ++i) {
    unsigned __int128 d = (unsigned __int128)a[i] - p[i] - (uint64_t)borrow;
    a[i] = (uint64_t)d;
    borrow = (d >> 64) ? 1 : 0;
  }
}

// CIOS Montgomery multiplication: out = a * b * 2^{-256} mod p
void mont_mul(const FieldCtx& f, const uint64_t* a, const uint64_t* b,
              uint64_t* out) {
  uint64_t t[W + 2] = {0};
  for (int i = 0; i < W; ++i) {
    unsigned __int128 carry = 0;
    for (int j = 0; j < W; ++j) {
      unsigned __int128 cur =
          (unsigned __int128)a[j] * b[i] + t[j] + (uint64_t)carry;
      t[j] = (uint64_t)cur;
      carry = cur >> 64;
    }
    unsigned __int128 cur = (unsigned __int128)t[W] + (uint64_t)carry;
    t[W] = (uint64_t)cur;
    t[W + 1] = (uint64_t)(cur >> 64);

    uint64_t m = t[0] * f.ninv;
    carry = ((unsigned __int128)m * f.p[0] + t[0]) >> 64;
    for (int j = 1; j < W; ++j) {
      unsigned __int128 c2 =
          (unsigned __int128)m * f.p[j] + t[j] + (uint64_t)carry;
      t[j - 1] = (uint64_t)c2;
      carry = c2 >> 64;
    }
    cur = (unsigned __int128)t[W] + (uint64_t)carry;
    t[W - 1] = (uint64_t)cur;
    t[W] = t[W + 1] + (uint64_t)(cur >> 64);
    t[W + 1] = 0;
  }
  uint64_t res[W];
  std::memcpy(res, t, sizeof(res));
  if (t[W] || geq(res, f.p)) sub_p(res, f.p);
  std::memcpy(out, res, sizeof(res));
}

// out = a * b mod p for canonical a, b
void mul_mod(const FieldCtx& f, const uint64_t* a, const uint64_t* b,
             uint64_t* out) {
  uint64_t am[W];
  mont_mul(f, a, b, am);        // a*b*2^-256
  mont_mul(f, am, f.rr, out);   // *2^512*2^-256 = a*b mod p
}

void words_to_limbs(const uint64_t* w, int nlimbs, uint32_t* out) {
  for (int i = 0; i < nlimbs; ++i) {
    int bit = i * LIMB_BITS;
    int word = bit >> 6, off = bit & 63;
    uint64_t lo = w[word] >> off;
    uint64_t hi = (off && word + 1 < W) ? (w[word + 1] << (64 - off)) : 0;
    out[i] = (uint32_t)((lo | hi) & ((1u << LIMB_BITS) - 1));
  }
}

void limbs_to_words(const uint32_t* l, int nlimbs, uint64_t* out) {
  std::memset(out, 0, W * sizeof(uint64_t));
  for (int i = 0; i < nlimbs; ++i) {
    int bit = i * LIMB_BITS;
    int word = bit >> 6, off = bit & 63;
    if (word < W) out[word] |= (uint64_t)l[i] << off;
    if (off > 64 - LIMB_BITS && word + 1 < W)
      out[word + 1] |= (uint64_t)l[i] >> (64 - off);
  }
}

}  // namespace

extern "C" {

// Batch encode: n canonical 256-bit values (4x u64 LE words each) ->
// device Montgomery 13-bit limbs (n x nlimbs u32). If to_mont == 0 the
// values are decomposed without the 2^260 factor (canonical limbs).
void ls_encode(const uint64_t* ctx_words, const uint64_t* in, int64_t n,
               int to_mont, uint32_t* out) {
  FieldCtx f;
  std::memcpy(f.p, ctx_words + 0, sizeof(f.p));
  std::memcpy(f.rr, ctx_words + 4, sizeof(f.rr));
  std::memcpy(f.r260, ctx_words + 8, sizeof(f.r260));
  std::memcpy(f.one, ctx_words + 12, sizeof(f.one));
  f.ninv = ctx_words[16];
  f.nlimbs = (int)ctx_words[17];

  for (int64_t k = 0; k < n; ++k) {
    uint64_t v[W];
    std::memcpy(v, in + 4 * k, sizeof(v));
    if (to_mont) {
      uint64_t m[W];
      mul_mod(f, v, f.r260, m);
      std::memcpy(v, m, sizeof(v));
    }
    words_to_limbs(v, f.nlimbs, out + (int64_t)f.nlimbs * k);
  }
}

// Batch decode: device limbs -> canonical 256-bit values; if from_mont,
// divides out the 2^260 factor first (multiply by (2^260)^-1 mod p,
// passed in ctx slot r260 by the Python wrapper for decode calls).
void ls_decode(const uint64_t* ctx_words, const uint32_t* in, int64_t n,
               int from_mont, uint64_t* out) {
  FieldCtx f;
  std::memcpy(f.p, ctx_words + 0, sizeof(f.p));
  std::memcpy(f.rr, ctx_words + 4, sizeof(f.rr));
  std::memcpy(f.r260, ctx_words + 8, sizeof(f.r260));
  std::memcpy(f.one, ctx_words + 12, sizeof(f.one));
  f.ninv = ctx_words[16];
  f.nlimbs = (int)ctx_words[17];

  for (int64_t k = 0; k < n; ++k) {
    uint64_t v[W];
    limbs_to_words(in + (int64_t)f.nlimbs * k, f.nlimbs, v);
    if (from_mont) {
      uint64_t m[W];
      mul_mod(f, v, f.r260, m);   // r260 slot holds (2^260)^-1 here
      std::memcpy(v, m, sizeof(v));
    }
    std::memcpy(out + 4 * k, v, sizeof(v));
  }
}

}  // extern "C"
