// eravm: native EraVM cycle loop + witness tracer (the witness-oracle role).
//
// Role parity: the reference ecosystem's witness generation is native Rust
// (`src/main_vm/witness_oracle.rs:45-168` driven by the zk_evm host); here
// the full-ISA EraVM executes natively and fills the same dense per-cycle
// witness columns that models/vm/sim.py (the Python differential oracle)
// produces — bit for bit.  Semantics are a line-for-line port of sim.py,
// which itself cites the reference per stage (pre_state.rs, decoded_opcode.rs,
// opcodes/*.rs, call_ret_impl/*.rs, saved_context.rs).
//
// Compiled together with gl_runtime.cpp into one shared library; uses its
// Poseidon2 permutation (constants injected at init from utils/grain.py).
//
// ABI: plain-u64/pointer structs only (no padding surprises); the Python
// side mirrors them with ctypes in models/vm/native_sim.py.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

using u8 = uint8_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i64 = int64_t;
using u128 = __uint128_t;

extern "C" void gl_poseidon2_permute(u64* state);  // gl_runtime.cpp
extern "C" int gl_is_initialized();

// ---------------------------------------------------------------------------
// U256 (little-endian u64 limbs)
// ---------------------------------------------------------------------------

struct U256 {
  u64 w[4];
  bool operator==(const U256& o) const {
    return w[0] == o.w[0] && w[1] == o.w[1] && w[2] == o.w[2] && w[3] == o.w[3];
  }
};

static const U256 U256_ZERO = {{0, 0, 0, 0}};

static inline U256 u256_from_u64(u64 v) { return U256{{v, 0, 0, 0}}; }

static inline bool u256_is_zero(const U256& a) {
  return (a.w[0] | a.w[1] | a.w[2] | a.w[3]) == 0;
}

static inline int u256_cmp(const U256& a, const U256& b) {
  for (int i = 3; i >= 0; --i) {
    if (a.w[i] < b.w[i]) return -1;
    if (a.w[i] > b.w[i]) return 1;
  }
  return 0;
}

static inline U256 u256_add(const U256& a, const U256& b, u64* carry_out) {
  U256 r;
  u128 c = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.w[i] + b.w[i] + (u64)c;
    r.w[i] = (u64)s;
    c = s >> 64;
  }
  if (carry_out) *carry_out = (u64)c;
  return r;
}

static inline U256 u256_sub(const U256& a, const U256& b, u64* borrow_out) {
  U256 r;
  u64 br = 0;
  for (int i = 0; i < 4; ++i) {
    u64 d = a.w[i] - b.w[i];
    u64 b2 = a.w[i] < b.w[i];
    u64 d2 = d - br;
    b2 |= (u64)(d < br);
    r.w[i] = d2;
    br = b2;
  }
  if (borrow_out) *borrow_out = br;
  return r;
}

static inline U256 u256_and(const U256& a, const U256& b) {
  return U256{{a.w[0] & b.w[0], a.w[1] & b.w[1], a.w[2] & b.w[2], a.w[3] & b.w[3]}};
}
static inline U256 u256_or(const U256& a, const U256& b) {
  return U256{{a.w[0] | b.w[0], a.w[1] | b.w[1], a.w[2] | b.w[2], a.w[3] | b.w[3]}};
}
static inline U256 u256_xor(const U256& a, const U256& b) {
  return U256{{a.w[0] ^ b.w[0], a.w[1] ^ b.w[1], a.w[2] ^ b.w[2], a.w[3] ^ b.w[3]}};
}

// 512-bit helper for mul / shifts
struct U512 {
  u64 w[8];
};

static inline U512 u256_mul_full(const U256& a, const U256& b) {
  U512 r;
  std::memset(r.w, 0, sizeof(r.w));
  for (int i = 0; i < 4; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 cur = (u128)a.w[i] * b.w[j] + r.w[i + j] + carry;
      r.w[i + j] = (u64)cur;
      carry = (u64)(cur >> 64);
    }
    r.w[i + 4] = carry;
  }
  return r;
}

static inline U256 u512_lo(const U512& x) { return U256{{x.w[0], x.w[1], x.w[2], x.w[3]}}; }
static inline U256 u512_hi(const U512& x) { return U256{{x.w[4], x.w[5], x.w[6], x.w[7]}}; }

// shift left by k (0..511): 512-bit result
static inline U512 u256_shl_full(const U256& a, unsigned k) {
  U512 r;
  std::memset(r.w, 0, sizeof(r.w));
  unsigned limb = k / 64, bits = k % 64;
  for (int i = 3; i >= 0; --i) {
    unsigned d = i + limb;
    if (d < 8) r.w[d] |= bits ? (a.w[i] << bits) : a.w[i];
    if (bits && d + 1 < 8) r.w[d + 1] |= a.w[i] >> (64 - bits);
  }
  return r;
}

// logical right shift by k (0..256+)
static inline U256 u256_shr(const U256& a, unsigned k) {
  U256 r = U256_ZERO;
  if (k >= 256) return r;
  unsigned limb = k / 64, bits = k % 64;
  for (unsigned i = 0; i + limb < 4; ++i) {
    r.w[i] = a.w[i + limb] >> bits;
    if (bits && i + limb + 1 < 4) r.w[i] |= a.w[i + limb + 1] << (64 - bits);
  }
  return r;
}

static inline U256 u256_shl(const U256& a, unsigned k) {  // truncating
  return u512_lo(u256_shl_full(a, k >= 512 ? 511 : k));
}

// mask of the low k bits (k in 0..256)
static inline U256 u256_low_mask(unsigned k) {
  U256 r = U256_ZERO;
  for (int i = 0; i < 4; ++i) {
    unsigned lo = i * 64;
    if (k >= lo + 64) r.w[i] = ~0ULL;
    else if (k > lo) r.w[i] = (~0ULL) >> (64 - (k - lo));
  }
  return r;
}

static inline unsigned u256_bit(const U256& a, unsigned i) {
  return (a.w[i / 64] >> (i % 64)) & 1;
}

// binary long division: a / b -> (q, r); b != 0
static void u256_divmod(const U256& a, const U256& b, U256* q, U256* r) {
  U256 quo = U256_ZERO, rem = U256_ZERO;
  for (int i = 255; i >= 0; --i) {
    // rem = (rem << 1) | bit_i(a); rem < b so no overflow past 256 bits
    u64 carry = rem.w[3] >> 63;
    (void)carry;
    rem = u256_shl(rem, 1);
    rem.w[0] |= u256_bit(a, i);
    if (u256_cmp(rem, b) >= 0) {
      rem = u256_sub(rem, b, nullptr);
      quo.w[i / 64] |= 1ULL << (i % 64);
    }
  }
  *q = quo;
  *r = rem;
}

// byte j of the 32-byte little-endian view
static inline u8 u256_byte_le(const U256& a, unsigned j) {
  return (u8)(a.w[j / 8] >> (8 * (j % 8)));
}

static inline void u256_to_be_bytes(const U256& a, u8* out32) {
  for (int i = 0; i < 32; ++i) out32[i] = u256_byte_le(a, 31 - i);
}

static inline U256 u256_from_be_bytes(const u8* in32) {
  U256 r = U256_ZERO;
  for (int i = 0; i < 32; ++i)
    r.w[(31 - i) / 8] |= (u64)in32[i] << (8 * ((31 - i) % 8));
  return r;
}

static inline void u256_to_u32_limbs(const U256& a, u32* out8) {
  for (int k = 0; k < 8; ++k) out8[k] = (u32)(a.w[k / 2] >> (32 * (k % 2)));
}

static inline u32 u256_limb32(const U256& a, int k) {
  return (u32)(a.w[k / 2] >> (32 * (k % 2)));
}

struct U256Hash {
  size_t operator()(const U256& a) const {
    u64 h = 0x9E3779B97F4A7C15ULL;
    for (int i = 0; i < 4; ++i) {
      h ^= a.w[i] + 0x9E3779B97F4A7C15ULL + (h << 6) + (h >> 2);
    }
    return (size_t)h;
  }
};

// ---------------------------------------------------------------------------
// keccak256 (original 0x01 padding; ops/keccak.py keccak256_ref parity)
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808AULL,
    0x8000000080008000ULL, 0x000000000000808BULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008AULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000AULL,
    0x000000008000808BULL, 0x800000000000008BULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800AULL, 0x800000008000000AULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

static const int KECCAK_ROT[5][5] = {{0, 36, 3, 41, 18},
                                     {1, 44, 10, 45, 2},
                                     {62, 6, 43, 15, 61},
                                     {28, 55, 25, 21, 56},
                                     {27, 20, 39, 8, 14}};

static inline u64 rotl64(u64 x, int r) {
  r %= 64;
  return r ? (x << r) | (x >> (64 - r)) : x;
}

static void keccak_f1600(u64 A[25]) {
  u64 B[25], C[5], D[5];
  for (int rnd = 0; rnd < 24; ++rnd) {
    for (int x = 0; x < 5; ++x)
      C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
    for (int x = 0; x < 5; ++x)
      D[x] = C[(x + 4) % 5] ^ rotl64(C[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) {
        u64 v = A[x + 5 * y] ^ D[x];
        B[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(v, KECCAK_ROT[x][y]);
      }
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        A[x + 5 * y] =
            B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y]) & B[(x + 2) % 5 + 5 * y]);
    A[0] ^= KECCAK_RC[rnd];
  }
}

static void keccak256(const u8* data, size_t len, u8 out[32]) {
  const size_t rate = 136;
  u64 st[25];
  std::memset(st, 0, sizeof(st));
  std::vector<u8> padded(data, data + len);
  size_t pad_len = rate - (len % rate);
  if (pad_len == 1) {
    padded.push_back(0x81);
  } else {
    padded.push_back(0x01);
    padded.insert(padded.end(), pad_len - 2, 0x00);
    padded.push_back(0x80);
  }
  for (size_t off = 0; off < padded.size(); off += rate) {
    for (size_t i = 0; i < rate / 8; ++i) {
      u64 lane = 0;
      for (int b = 0; b < 8; ++b)
        lane |= (u64)padded[off + 8 * i + b] << (8 * b);
      st[i] ^= lane;
    }
    keccak_f1600(st);
  }
  for (int i = 0; i < 4; ++i)
    for (int b = 0; b < 8; ++b) out[8 * i + b] = (u8)(st[i] >> (8 * b));
}

// ---------------------------------------------------------------------------
// sha256 (ops/sha256.py compress_ref parity)
// ---------------------------------------------------------------------------

static const u32 SHA_H0[8] = {0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
                              0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19};

static const u32 SHA_K[64] = {
    0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
    0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
    0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
    0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
    0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
    0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
    0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
    0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
    0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
    0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
    0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2};

static inline u32 rotr32(u32 x, int r) { return (x >> r) | (x << (32 - r)); }

static void sha256_compress(u32 state[8], const u32 block[16]) {
  u32 w[64];
  for (int i = 0; i < 16; ++i) w[i] = block[i];
  for (int i = 16; i < 64; ++i) {
    u32 s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^ (w[i - 15] >> 3);
    u32 s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^ (w[i - 2] >> 10);
    w[i] = w[i - 16] + s0 + w[i - 7] + s1;
  }
  u32 a = state[0], b = state[1], c = state[2], d = state[3];
  u32 e = state[4], f = state[5], g = state[6], h = state[7];
  for (int i = 0; i < 64; ++i) {
    u32 S1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
    u32 ch = (e & f) ^ ((~e) & g);
    u32 t1 = h + S1 + ch + SHA_K[i] + w[i];
    u32 S0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
    u32 maj = (a & b) ^ (a & c) ^ (b & c);
    u32 t2 = S0 + maj;
    h = g; g = f; f = e; e = d + t1;
    d = c; c = b; b = a; a = t1 + t2;
  }
  state[0] += a; state[1] += b; state[2] += c; state[3] += d;
  state[4] += e; state[5] += f; state[6] += g; state[7] += h;
}

// final sha256 state -> u256 value limbs (sha256_round_function.py
// _digest_value_limbs parity: limbs[7-k] = byteswap(state[k]))
static U256 sha_digest_value(const u32 state[8]) {
  U256 v = U256_ZERO;
  for (int k = 0; k < 8; ++k) {
    u32 w = state[k];
    u32 le = ((w >> 24) & 0xFF) | (((w >> 16) & 0xFF) << 8) |
             (((w >> 8) & 0xFF) << 16) | ((w & 0xFF) << 24);
    int limb = 7 - k;
    v.w[limb / 2] |= (u64)le << (32 * (limb % 2));
  }
  return v;
}

// ---------------------------------------------------------------------------
// secp256k1 (ops/secp256k1.py parity; Jacobian internally, affine results)
// ---------------------------------------------------------------------------

static const U256 SECP_P = {{0xFFFFFFFEFFFFFC2FULL, 0xFFFFFFFFFFFFFFFFULL,
                             0xFFFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL}};
static const U256 SECP_N = {{0xBFD25E8CD0364141ULL, 0xBAAEDCE6AF48A03BULL,
                             0xFFFFFFFFFFFFFFFEULL, 0xFFFFFFFFFFFFFFFFULL}};
static const U256 SECP_GX = {{0x59F2815B16F81798ULL, 0x029BFCDB2DCE28D9ULL,
                              0x55A06295CE870B07ULL, 0x79BE667EF9DCBBACULL}};
static const U256 SECP_GY = {{0x9C47D08FFB10D4B8ULL, 0xFD17B448A6855419ULL,
                              0x5DA4FBFC0E1108A8ULL, 0x483ADA7726A3C465ULL}};

// fold-based reduction mod P: 2^256 = C (mod P) with C = 2^32 + 977
static U256 secp_mod_p(const U512& x) {
  const u64 C = 0x1000003D1ULL;  // 2^32 + 977
  // y = lo + hi * C  (hi*C fits in 256+33 bits -> track a small overflow)
  U256 lo = u512_lo(x), hi = u512_hi(x);
  U256 acc = lo;
  u64 over = 0;  // value of bits >= 2^256, < 2^34
  u64 carry = 0;
  U256 hc = U256_ZERO;
  u64 hc_over = 0;
  {
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
      u128 cur = (u128)hi.w[i] * C + (u64)c;
      hc.w[i] = (u64)cur;
      c = cur >> 64;
    }
    hc_over = (u64)c;
  }
  acc = u256_add(acc, hc, &carry);
  over = hc_over + carry;
  // fold the overflow: over * 2^256 == over * C
  while (over) {
    u128 f = (u128)over * C;
    U256 add = {{(u64)f, (u64)(f >> 64), 0, 0}};
    acc = u256_add(acc, add, &carry);
    over = carry;
  }
  while (u256_cmp(acc, SECP_P) >= 0) acc = u256_sub(acc, SECP_P, nullptr);
  return acc;
}

static inline U256 secp_mulmod_p(const U256& a, const U256& b) {
  return secp_mod_p(u256_mul_full(a, b));
}

static inline U256 secp_addmod(const U256& a, const U256& b, const U256& m) {
  u64 c;
  U256 s = u256_add(a, b, &c);
  if (c || u256_cmp(s, m) >= 0) s = u256_sub(s, m, nullptr);
  return s;
}

static inline U256 secp_submod(const U256& a, const U256& b, const U256& m) {
  u64 br;
  U256 d = u256_sub(a, b, &br);
  if (br) d = u256_add(d, m, nullptr);
  return d;
}

static U256 secp_powmod_p(const U256& base, const U256& exp) {
  U256 result = u256_from_u64(1), b = base;
  for (int i = 0; i < 256; ++i) {
    if (u256_bit(exp, i)) result = secp_mulmod_p(result, b);
    b = secp_mulmod_p(b, b);
  }
  return result;
}

static inline U256 secp_inv_p(const U256& a) {
  U256 e = u256_sub(SECP_P, u256_from_u64(2), nullptr);
  return secp_powmod_p(a, e);
}

// generic mulmod mod N (rare; binary reduction of the 512-bit product)
static U256 secp_mulmod_n(const U256& a, const U256& b) {
  U512 x = u256_mul_full(a, b);
  // long-division remainder over the 512-bit value
  U256 rem = U256_ZERO;
  for (int i = 511; i >= 0; --i) {
    u64 carry = rem.w[3] >> 63;
    rem = u256_shl(rem, 1);
    rem.w[0] |= (x.w[i / 64] >> (i % 64)) & 1;
    if (carry || u256_cmp(rem, SECP_N) >= 0) rem = u256_sub(rem, SECP_N, nullptr);
  }
  return rem;
}

static U256 secp_powmod_n(const U256& base, const U256& exp) {
  U256 result = u256_from_u64(1), b = base;
  for (int i = 0; i < 256; ++i) {
    if (u256_bit(exp, i)) result = secp_mulmod_n(result, b);
    b = secp_mulmod_n(b, b);
  }
  return result;
}

static U256 u256_mod(const U256& a, const U256& m) {
  if (u256_cmp(a, m) < 0) return a;
  U256 q, r;
  u256_divmod(a, m, &q, &r);
  return r;
}

struct JPoint {  // Jacobian; inf <=> Z == 0
  U256 X, Y, Z;
};

static const JPoint JINF = {{{0, 0, 0, 0}}, {{1, 0, 0, 0}}, {{0, 0, 0, 0}}};

static inline bool jp_is_inf(const JPoint& p) { return u256_is_zero(p.Z); }

static JPoint jp_double(const JPoint& p) {
  if (jp_is_inf(p) || u256_is_zero(p.Y)) return JINF;
  U256 A = secp_mulmod_p(p.X, p.X);
  U256 B = secp_mulmod_p(p.Y, p.Y);
  U256 Cc = secp_mulmod_p(B, B);
  U256 t = secp_addmod(p.X, B, SECP_P);
  t = secp_mulmod_p(t, t);
  t = secp_submod(t, A, SECP_P);
  t = secp_submod(t, Cc, SECP_P);
  U256 D = secp_addmod(t, t, SECP_P);
  U256 E = secp_addmod(secp_addmod(A, A, SECP_P), A, SECP_P);
  U256 F = secp_mulmod_p(E, E);
  U256 X3 = secp_submod(F, secp_addmod(D, D, SECP_P), SECP_P);
  U256 C8 = secp_addmod(Cc, Cc, SECP_P);
  C8 = secp_addmod(C8, C8, SECP_P);
  C8 = secp_addmod(C8, C8, SECP_P);
  U256 Y3 = secp_submod(secp_mulmod_p(E, secp_submod(D, X3, SECP_P)), C8, SECP_P);
  U256 Z3 = secp_mulmod_p(p.Y, p.Z);
  Z3 = secp_addmod(Z3, Z3, SECP_P);
  return JPoint{X3, Y3, Z3};
}

static JPoint jp_add(const JPoint& p, const JPoint& q) {
  if (jp_is_inf(p)) return q;
  if (jp_is_inf(q)) return p;
  U256 Z1Z1 = secp_mulmod_p(p.Z, p.Z);
  U256 Z2Z2 = secp_mulmod_p(q.Z, q.Z);
  U256 U1 = secp_mulmod_p(p.X, Z2Z2);
  U256 U2 = secp_mulmod_p(q.X, Z1Z1);
  U256 S1 = secp_mulmod_p(p.Y, secp_mulmod_p(Z2Z2, q.Z));
  U256 S2 = secp_mulmod_p(q.Y, secp_mulmod_p(Z1Z1, p.Z));
  if (U1 == U2) {
    if (!(S1 == S2)) return JINF;
    return jp_double(p);
  }
  U256 H = secp_submod(U2, U1, SECP_P);
  U256 R = secp_submod(S2, S1, SECP_P);
  U256 H2 = secp_mulmod_p(H, H);
  U256 H3 = secp_mulmod_p(H2, H);
  U256 U1H2 = secp_mulmod_p(U1, H2);
  U256 X3 = secp_mulmod_p(R, R);
  X3 = secp_submod(X3, H3, SECP_P);
  X3 = secp_submod(X3, secp_addmod(U1H2, U1H2, SECP_P), SECP_P);
  U256 Y3 = secp_mulmod_p(R, secp_submod(U1H2, X3, SECP_P));
  Y3 = secp_submod(Y3, secp_mulmod_p(S1, H3), SECP_P);
  U256 Z3 = secp_mulmod_p(secp_mulmod_p(p.Z, q.Z), H);
  return JPoint{X3, Y3, Z3};
}

struct APoint {  // affine; inf flag
  U256 x, y;
  bool inf;
};

static APoint jp_to_affine(const JPoint& p) {
  if (jp_is_inf(p)) return APoint{U256_ZERO, U256_ZERO, true};
  U256 zi = secp_inv_p(p.Z);
  U256 zi2 = secp_mulmod_p(zi, zi);
  U256 zi3 = secp_mulmod_p(zi2, zi);
  return APoint{secp_mulmod_p(p.X, zi2), secp_mulmod_p(p.Y, zi3), false};
}

static JPoint jp_from_affine(const APoint& a) {
  if (a.inf) return JINF;
  return JPoint{a.x, a.y, u256_from_u64(1)};
}

static APoint secp_scalar_mul(const U256& k_in, const APoint& pt) {
  U256 k = u256_mod(k_in, SECP_N);
  JPoint acc = JINF, base = jp_from_affine(pt);
  for (int i = 0; i < 256; ++i) {
    if (u256_bit(k, i)) acc = jp_add(acc, base);
    base = jp_double(base);
  }
  return jp_to_affine(acc);
}

static APoint secp_affine_add(const APoint& a, const APoint& b) {
  return jp_to_affine(jp_add(jp_from_affine(a), jp_from_affine(b)));
}

static U256 secp_eth_address(const APoint& Q) {
  u8 buf[64], dig[32];
  u256_to_be_bytes(Q.x, buf);
  u256_to_be_bytes(Q.y, buf + 32);
  keccak256(buf, 64, dig);
  U256 addr = U256_ZERO;
  for (int i = 12; i < 32; ++i)
    addr.w[(31 - i) / 8] |= (u64)dig[i] << (8 * ((31 - i) % 8));
  return addr;
}

// ---------------------------------------------------------------------------
// queue/record encodings (base_structures/*.py parity, bit-exact)
// ---------------------------------------------------------------------------

struct LogQuery {
  U256 address;  // < 2^160
  U256 key;
  U256 read_value;
  U256 written_value;
  u32 aux_byte;
  bool rw_flag;
  bool is_service;
  u32 shard_id;
  u32 tx_number_in_block;
  u32 timestamp;
};

// memory query -> 8 lanes (base_structures/memory_query.py:encode_memory_query_ref)
static void encode_memory_query(u32 ts, u32 page, u32 index, bool rw,
                                bool is_ptr, const U256& value, u64 out[8]) {
  u32 v[8];
  u256_to_u32_limbs(value, v);
  auto byte = [&](int limb, int j) -> u64 { return (v[limb] >> (8 * j)) & 0xFF; };
  out[0] = ts;
  out[1] = page;
  out[2] = (u64)index | ((u64)rw << 32) | ((u64)is_ptr << 33);
  out[3] = (u64)v[0] | (byte(5, 0) << 32) | (byte(5, 1) << 40) | (byte(5, 2) << 48);
  out[4] = (u64)v[1] | (byte(5, 3) << 32) | (byte(6, 0) << 40) | (byte(6, 1) << 48);
  out[5] = (u64)v[2] | (byte(6, 2) << 32) | (byte(6, 3) << 40) | (byte(7, 0) << 48);
  out[6] = (u64)v[3] | (byte(7, 1) << 32) | (byte(7, 2) << 40) | (byte(7, 3) << 48);
  out[7] = (u64)v[4];
}

// decommit query -> 8 lanes (base_structures/decommit_query.py ref)
static void encode_decommit_query(const U256& code_hash, u32 page, bool is_first,
                                  u32 ts, u64 out[8]) {
  u32 ch[8];
  u256_to_u32_limbs(code_hash, ch);
  u64 pb[4], tb[4];
  for (int j = 0; j < 4; ++j) {
    pb[j] = (page >> (8 * j)) & 0xFF;
    tb[j] = (ts >> (8 * j)) & 0xFF;
  }
  out[0] = (u64)ch[0] | (pb[0] << 32) | (pb[1] << 40) | (pb[2] << 48);
  out[1] = (u64)ch[1] | (pb[3] << 32) | (tb[0] << 40) | (tb[1] << 48);
  out[2] = (u64)ch[2] | (tb[2] << 32) | (tb[3] << 40) | ((u64)(is_first ? 1 : 0) << 48);
  for (int k = 3; k < 8; ++k) out[k] = ch[k];
}

// log query -> 20 lanes (base_structures/log_query.py:encode_log_query_ref)
static void encode_log_query(const LogQuery& q, bool rollback, u64 out[20]) {
  u32 rv[8], wv[8];
  u256_to_u32_limbs(q.read_value, rv);
  u256_to_u32_limbs(q.written_value, wv);
  u64 kb[32], ab[20];
  for (int i = 0; i < 32; ++i) kb[i] = u256_byte_le(q.key, i);
  for (int i = 0; i < 20; ++i) ab[i] = u256_byte_le(q.address, i);
  auto pack = [](u64 base, u64 b0, u64 b1, u64 b2) -> u64 {
    return base | (b0 << 32) | (b1 << 40) | (b2 << 48);
  };
  for (int k = 0; k < 8; ++k)
    out[k] = pack(rv[k], kb[3 * k], kb[3 * k + 1], kb[3 * k + 2]);
  u64 stream[24];
  for (int i = 0; i < 8; ++i) stream[i] = kb[24 + i];
  for (int i = 0; i < 16; ++i) stream[8 + i] = ab[i];
  for (int k = 0; k < 8; ++k)
    out[8 + k] = pack(wv[k], stream[3 * k], stream[3 * k + 1], stream[3 * k + 2]);
  out[16] = pack(q.timestamp, ab[16], ab[17], ab[18]);
  out[17] = pack(q.tx_number_in_block, ab[19], q.aux_byte, q.shard_id);
  out[18] = (u64)(q.rw_flag ? 1 : 0) + 2 * (u64)(q.is_service ? 1 : 0);
  out[19] = (u64)(rollback ? 1 : 0);
}

// sponge helpers (sim.py _full_absorb / _narrow_hash / callstack parity)
static void full_absorb(u64 state12[12], const u64 enc8[8]) {
  std::memcpy(state12, enc8, 8 * sizeof(u64));
  gl_poseidon2_permute(state12);
}

static void narrow_hash(const u64 tail4[4], const u64 enc20[20], u64 out4[4]) {
  u64 st[12];
  std::memset(st, 0, sizeof(st));
  std::memcpy(st + 8, tail4, 4 * sizeof(u64));
  std::memcpy(st, enc20, 8 * sizeof(u64));
  gl_poseidon2_permute(st);
  std::memcpy(st, enc20 + 8, 8 * sizeof(u64));
  gl_poseidon2_permute(st);
  std::memcpy(st, enc20 + 16, 4 * sizeof(u64));
  std::memset(st + 4, 0, 4 * sizeof(u64));
  gl_poseidon2_permute(st);
  std::memcpy(out4, st, 4 * sizeof(u64));
}

// ---------------------------------------------------------------------------
// VM structures
// ---------------------------------------------------------------------------

// rollback-tail slot: resolves to a value or aliases another ref (phase B)
struct Ref {  // kind 0 = none, 1 = push (index into push_slots), 2 = tail slot
  int kind;
  int idx;
};

struct TailSlot {
  bool has_value = false;
  u64 value[4] = {0, 0, 0, 0};
  bool has_alias = false;
  Ref alias{0, 0};
};

struct PushSlot {
  bool resolved = false;
  u64 head_after[4] = {0, 0, 0, 0};
};

struct SegEntry {
  u64 enc_rb[20];
  int push_slot;
  LogQuery q;  // the query, re-emitted (rollback=true) when the segment reverts
};

struct Context {  // ExecutionContextRecord + host bookkeeping
  U256 this_addr = U256_ZERO;
  U256 caller = U256_ZERO;
  U256 code_address = U256_ZERO;
  u32 code_page = 0, base_page = 0;
  u64 heap_upper_bound = 0, aux_heap_upper_bound = 0;
  u32 reverted_queue_segment_len = 0;
  u32 pc = 0, sp = 0, exception_handler_loc = 0;
  u64 ergs_remaining = 0;
  bool is_static_execution = false, is_kernel_mode = false, is_local_call = false;
  u32 this_shard_id = 0, caller_shard_id = 0, code_shard_id = 0;
  u32 context_u128[4] = {0, 0, 0, 0};
  // host bookkeeping (phase A/B)
  int tail_slot = -1;
  Ref head_ref{0, 0};
  std::vector<SegEntry> segment;
};

// context record -> 32 lanes with RESOLVED head/tail (state.py
// encode_context_record parity)
static void encode_context(const Context& c, const u64 head[4],
                           const u64 tail[4], u64 out[32]) {
  for (int i = 0; i < 4; ++i) out[i] = head[i];
  for (int i = 0; i < 4; ++i) out[4 + i] = tail[i];
  for (int k = 0; k < 5; ++k) out[8 + k] = u256_limb32(c.code_address, k);
  for (int k = 0; k < 5; ++k) out[13 + k] = u256_limb32(c.this_addr, k);
  for (int k = 0; k < 5; ++k) out[18 + k] = u256_limb32(c.caller, k);
  for (int k = 0; k < 4; ++k) out[23 + k] = c.context_u128[k];
  out[27] = (u64)c.code_page | ((u64)(c.pc & 0xFFFF) << 32) |
            ((u64)(c.this_shard_id & 0xFF) << 48) |
            ((u64)(c.is_static_execution ? 1 : 0) << 56);
  out[28] = (u64)c.base_page | ((u64)(c.sp & 0xFFFF) << 32) |
            ((u64)(c.caller_shard_id & 0xFF) << 48) |
            ((u64)(c.is_kernel_mode ? 1 : 0) << 56);
  out[29] = (u64)(u32)c.ergs_remaining |
            ((u64)(c.exception_handler_loc & 0xFFFF) << 32) |
            ((u64)(c.code_shard_id & 0xFF) << 48) |
            ((u64)(c.is_local_call ? 1 : 0) << 56);
  u64 ql = c.reverted_queue_segment_len;
  out[30] = (u64)(u32)c.heap_upper_bound | ((ql & 0xFF) << 32) |
            (((ql >> 8) & 0xFF) << 40);
  out[31] = (u64)(u32)c.aux_heap_upper_bound | (((ql >> 16) & 0xFF) << 32) |
            (((ql >> 24) & 0xFF) << 40);
}

static void callstack_absorb(u64 state12[12], const u64 enc32[32]) {
  for (int r = 0; r < 4; ++r) {
    std::memcpy(state12, enc32 + 8 * r, 8 * sizeof(u64));
    gl_poseidon2_permute(state12);
  }
}

struct MemCell {
  U256 value;
  bool is_ptr;
};

struct StKey {
  u64 shard;
  U256 addr, key;
  bool operator==(const StKey& o) const {
    return shard == o.shard && addr == o.addr && key == o.key;
  }
};

struct StKeyHash {
  size_t operator()(const StKey& k) const {
    U256Hash h;
    return h(k.addr) * 1000003ULL ^ h(k.key) ^ (k.shard * 0x9E3779B97F4A7C15ULL);
  }
};

// ---------------------------------------------------------------------------
// ABI structs (mirrored by ctypes in models/vm/native_sim.py — u64/pointer
// fields only, declaration order is the contract)
// ---------------------------------------------------------------------------

struct EravmParams {
  u64 limit;
  u64 n_code_words;
  u64 n_calldata;
  u64 n_heap_init;
  u64 n_storage;
  u64 n_code_store;
  u64 zkporter_available;
  u64 default_aa_code_hash[4];
  u64 boot_code_hash[4];
  u64 initial_registers[15 * 5];  // per reg: 4 value limbs + is_ptr
  // tape capacities
  u64 mem_tape_cap, log_tape_cap, dec_tape_cap, pc_calls_cap, pm_cap;
  // decode table + canonical encodings
  const u64* opcode_props;   // 2048
  const u64* opcode_prices;  // 2048
  u64 nop_encoding, panic_encoding;
  // inputs
  const u64* code_words;      // n_code_words * 4 (LE limbs)
  const u64* calldata_index;  // n_calldata
  const u64* calldata_value;  // n_calldata * 4
  const u64* heap_init_index; // n_heap_init (sorted ascending)
  const u64* heap_init_value; // n_heap_init * 4
  const u64* storage_shard;   // n_storage
  const u64* storage_addr;    // n_storage * 4
  const u64* storage_key;     // n_storage * 4
  const u64* storage_value;   // n_storage * 4
  const u64* code_store_hash; // n_code_store * 4
  const u64* code_store_off;  // n_code_store (word offsets into code_store_words)
  const u64* code_store_len;  // n_code_store
  const u64* code_store_words;// total * 4
  // system params (isa/system_params.py, passed not baked)
  u64 sp_bootloader_code_page, sp_bootloader_calldata_page, sp_bootloader_base_page;
  u64 sp_starting_timestamp, sp_vm_max_stack_depth, sp_starting_base_page;
  u64 sp_bootloader_formal_address, sp_ecrecover_addr, sp_sha256_addr, sp_keccak_addr;
  u64 sp_aux_storage, sp_aux_event, sp_aux_l1, sp_aux_precompile;
  u64 sp_vm_initial_frame_ergs, sp_initial_frame_eh, sp_bootloader_max_memory;
  u64 sp_new_frame_memory_stipend, sp_new_pages_per_far_call, sp_unmapped_page;
  u64 sp_ergs_per_code_word, sp_deployer_address;
  u64 sp_initial_storage_write_pubdata_bytes, sp_l1_message_pubdata_bytes;
  u64 sp_fwd_mode_byte_idx, sp_shard_id_byte_idx, sp_constructor_byte_idx,
      sp_system_byte_idx;
  u64 sp_forward_use_heap, sp_forward_fat_ptr, sp_forward_use_aux_heap;
  u64 sp_code_hash_version_byte, sp_code_at_rest_marker, sp_yet_constructed_marker;
  u64 sp_call_system_abi_reg_mask;  // bit i set => registers[i] in system range
  u64 sp_call_reserved_reg_mask;
  u64 sp_call_implicit_reg_idx;
};

struct EravmOut {
  // state rows, R = limit + 1
  u32* regs;            // R*15*8
  u8* regs_ptr;         // R*15
  u8* f_of; u8* f_eq; u8* f_gt;
  u32* ts; u32* page_counter; u32* tx_number; u32* prev_code_page; u32* prev_super_pc;
  u32* prev_code_word;  // R*8
  u8* pending_exc;
  u32* ergs_pp;
  u32* ctx_u128;        // R*4
  u32* cs_depth;
  u64* mem_q_state;     // R*12
  u32* mem_q_len;
  u64* dec_q_state;     // R*12
  u32* dec_q_len;
  u64* log_fwd_tail;    // R*4
  u32* log_fwd_len;
  u32* ctx_this;        // R*5
  u32* ctx_caller;      // R*5
  u32* ctx_code_address;// R*5
  u32* ctx_code_page; u32* ctx_base_page; u32* ctx_heap_bound; u32* ctx_aux_heap_bound;
  u32* ctx_pc; u32* ctx_sp; u32* ctx_eh; u32* ctx_ergs;
  u8* ctx_is_static; u8* ctx_is_kernel; u8* ctx_is_local;
  u32* ctx_shard_this; u32* ctx_shard_caller; u32* ctx_shard_code;
  u32* ctx_ctx_u128;    // R*4
  u32* ctx_rq_len;
  u64* ctx_rq_head;     // R*4
  u64* ctx_rq_tail;     // R*4
  u64* cs_sponge;       // R*12
  // trace rows, N = limit
  u32* code_word_read;  // N*8
  u8* should_read_opcode;
  u32* src0_mem_val;    // N*8
  u8* src0_mem_is_ptr;
  u32* uma_a_val; u32* uma_b_val;  // N*8
  u32* storage_read_val;           // N*8
  u32* pubdata_refund;
  u32* dec_suggested_page;
  u32* fam_res0; u32* fam_res1;    // N*8
  u32* src0_val; u8* src0_is_ptr;  // N*8, N
  u32* src1_val; u8* src1_is_ptr;
  u32* raw_opcode_lo; u32* raw_opcode_hi;
  u8* src0_did_read; u8* dst0_did_write;
  u32* dst0_page; u32* dst0_index;
  u64* rb_prev_head;    // N*4
  u64* call_rb_tail;    // N*4
  u32* ret_popped_this; u32* ret_popped_caller; u32* ret_popped_code_address; // N*5
  u32* ret_popped_code_page; u32* ret_popped_base_page;
  u32* ret_popped_heap_bound; u32* ret_popped_aux_heap_bound;
  u32* ret_popped_pc; u32* ret_popped_sp; u32* ret_popped_eh; u32* ret_popped_ergs;
  u32* ret_popped_rq_len;
  u32* ret_popped_shard_this; u32* ret_popped_shard_caller; u32* ret_popped_shard_code;
  u8* ret_popped_is_static; u8* ret_popped_is_kernel; u8* ret_popped_is_local;
  u32* ret_popped_ctx_u128;  // N*4
  u64* ret_popped_rq_head; u64* ret_popped_rq_tail;  // N*4
  u64* ret_prev_cs_sponge;   // N*12
  u64* block_rollback_tail;  // 4
  // memory tape
  u32* mt_ts; u32* mt_page; u32* mt_index; u8* mt_rw; u8* mt_is_ptr;
  u32* mt_value;  // cap*8
  u64* mem_tape_len;
  // log tape (forward order incl. appended rollbacks)
  u32* lt_address;  // cap*5
  u32* lt_key; u32* lt_read_value; u32* lt_written_value;  // cap*8
  u32* lt_aux_byte; u8* lt_rw_flag; u8* lt_rollback; u8* lt_is_service;
  u32* lt_shard_id; u32* lt_tx_number; u32* lt_timestamp;
  u64* log_tape_len;
  // decommit tape
  u32* dt_code_hash;  // cap*8
  u32* dt_page; u8* dt_is_first; u32* dt_timestamp;
  u64* dec_tape_len;
  // precompile calls: family tag + index of the call's forward log row
  u8* pc_family;      // 0 = keccak, 1 = sha256, 2 = ecrecover
  u64* pc_log_index;
  u64* pc_calls_len;
  // precompile memory snapshots
  u32* pm_page; u32* pm_word; u8* pm_value;  // cap*32 (BE bytes)
  u64* pm_len;
};

// ---------------------------------------------------------------------------
// the VM
// ---------------------------------------------------------------------------

// ISA constants (isa/opcodes.py structural data — fixed by the reference)
enum {
  OP_INVALID = 0, OP_NOP, OP_ADD, OP_SUB, OP_MUL, OP_DIV, OP_JUMP, OP_CONTEXT,
  OP_SHIFT, OP_BINOP, OP_PTR, OP_NEAR_CALL, OP_LOG, OP_FAR_CALL, OP_RET, OP_UMA,
};
enum { SRC_REG = 0, SRC_STACK_PUSH_POP, SRC_STACK_OFFSET, SRC_STACK_ABSOLUTE,
       SRC_IMM, SRC_CODE };
enum { DST_REG = 0, DST_STACK_PUSH_POP, DST_STACK_OFFSET, DST_STACK_ABSOLUTE };
enum { CTXV_THIS = 0, CTXV_CALLER, CTXV_CODE_ADDRESS, CTXV_META, CTXV_ERGS_LEFT,
       CTXV_SP, CTXV_GET_U128, CTXV_SET_U128, CTXV_SET_ERGS_PER_PUBDATA,
       CTXV_INC_TX };
enum { SHIFTV_SHL = 0, SHIFTV_SHR, SHIFTV_ROL, SHIFTV_ROR };
enum { BINOPV_AND = 0, BINOPV_OR, BINOPV_XOR };
enum { PTRV_ADD = 0, PTRV_SUB, PTRV_PACK, PTRV_SHRINK };
enum { LOGV_SREAD = 0, LOGV_SWRITE, LOGV_EVENT, LOGV_L1MSG, LOGV_PRECOMPILE };
enum { FCALLV_NORMAL = 0, FCALLV_DELEGATE, FCALLV_MIMIC };
enum { RETV_OK = 0, RETV_REVERT, RETV_PANIC };
enum { UMAV_HEAP_READ = 0, UMAV_HEAP_WRITE, UMAV_AUX_READ, UMAV_AUX_WRITE,
       UMAV_FAT_PTR_READ };

static const int SET_FLAGS_IDX = 0;
static const int SWAP_OPERANDS_IDX = 1;  // arith + ptr
static const int UMA_INCREMENT_IDX = 0;
static const int FAR_CALL_STATIC_IDX = 0;
static const int FAR_CALL_SHARD_IDX = 1;
static const int FIRST_MESSAGE_IDX = 0;
static const int RET_TO_LABEL_IDX = 0;
static const int AUX_BITS_OFFSET = 48;
static const int KERNEL_MODE_FLAG_IDX = 0;
static const int STATIC_OK_FLAG_IDX = 1;
static const int EXPLICIT_PANIC_FLAG_IDX = 2;
static const u64 U32M = 0xFFFFFFFFULL;
static const u64 U16M = 0xFFFFULL;

struct Decoded {
  u32 op_type, variant, src_mode, dst_mode, flags;
  u32 condition, src0, src1, dst0, dst1, imm0, imm1;
  u64 price, props;
};

struct Eravm {
  const EravmParams* P;
  EravmOut* O;
  u64 N;

  std::unordered_map<u64, MemCell> memory;  // (page<<32|index) -> cell
  std::unordered_map<StKey, U256, StKeyHash> storage;
  std::unordered_map<U256, std::pair<u64, u64>, U256Hash> code_store;  // hash->(off,len)
  std::unordered_map<U256, u64, U256Hash> decommitted;  // masked hash -> page

  Context ctx;
  std::vector<Context> frames;  // saved records, deepest first
  u32 cs_depth = 1;

  std::vector<TailSlot> tail_slots;
  std::vector<PushSlot> push_slots;
  int block_slot;

  struct RegVal { U256 v; bool ptr; };
  RegVal registers[15];
  bool f_of = false, f_eq = false, f_gt = false;
  u64 timestamp, page_counter;
  u32 tx_number = 0;
  u32 prev_code_page = 0, prev_super_pc = 0;
  U256 prev_code_word = U256_ZERO;
  bool pending_exception = false;
  u64 ergs_per_pubdata = 0;
  u32 context_u128[4] = {0, 0, 0, 0};

  u64 mem_q_state[12] = {0}, dec_q_state[12] = {0};
  u64 mem_q_len = 0, dec_q_len = 0;
  u64 log_fwd_tail[4] = {0};
  u64 log_fwd_len = 0;

  // per-cycle callstack events for phase B (kind 0 none, 1 push, 2 pop)
  struct CsEvent { int kind = 0; int rec = -1; };
  std::vector<CsEvent> cs_events;
  std::vector<Context> event_recs;  // frozen push/pop records

  // phase-B fixups: (array_row, ref) pairs resolved after chain resolution
  struct Fixup { u64* dst; Ref ref; };
  std::vector<Fixup> fixups;

  u64 mem_len = 0, log_len = 0, dec_len = 0, pcc_len = 0, pm_len = 0;
  bool overflow = false;
  int row = 0;  // current cycle index

  // ---- primitives ----

  MemCell mem_read(u64 page, u64 index) {
    auto it = memory.find((page << 32) | (index & U32M));
    if (it == memory.end()) return MemCell{U256_ZERO, false};
    return it->second;
  }

  void mem_write(u64 page, u64 index, const U256& v, bool is_ptr) {
    memory[(page << 32) | (index & U32M)] = MemCell{v, is_ptr};
  }

  void push_mem_query(u64 ts, u64 page, u64 index, bool rw, bool is_ptr,
                      const U256& value) {
    if (mem_len >= P->mem_tape_cap) { overflow = true; return; }
    u64 i = mem_len++;
    O->mt_ts[i] = (u32)ts;
    O->mt_page[i] = (u32)page;
    O->mt_index[i] = (u32)index;
    O->mt_rw[i] = rw;
    O->mt_is_ptr[i] = is_ptr;
    u256_to_u32_limbs(value, O->mt_value + 8 * i);
    u64 enc[8];
    encode_memory_query((u32)ts, (u32)page, (u32)index, rw, is_ptr, value, enc);
    full_absorb(mem_q_state, enc);
    mem_q_len += 1;
  }

  void tape_log(const LogQuery& q, bool rollback) {
    if (log_len >= P->log_tape_cap) { overflow = true; return; }
    u64 i = log_len++;
    for (int k = 0; k < 5; ++k) O->lt_address[5 * i + k] = u256_limb32(q.address, k);
    u256_to_u32_limbs(q.key, O->lt_key + 8 * i);
    u256_to_u32_limbs(q.read_value, O->lt_read_value + 8 * i);
    u256_to_u32_limbs(q.written_value, O->lt_written_value + 8 * i);
    O->lt_aux_byte[i] = q.aux_byte;
    O->lt_rw_flag[i] = q.rw_flag;
    O->lt_rollback[i] = rollback;
    O->lt_is_service[i] = q.is_service;
    O->lt_shard_id[i] = q.shard_id;
    O->lt_tx_number[i] = q.tx_number_in_block;
    O->lt_timestamp[i] = q.timestamp;
  }

  void push_log_forward(const LogQuery& q) {
    u64 enc[20];
    encode_log_query(q, false, enc);
    u64 nt[4];
    narrow_hash(log_fwd_tail, enc, nt);
    std::memcpy(log_fwd_tail, nt, sizeof(nt));
    log_fwd_len += 1;
    tape_log(q, false);
  }

  void push_decommit(const U256& code_hash, u64 page, bool is_first, u64 ts) {
    if (dec_len >= P->dec_tape_cap) { overflow = true; return; }
    u64 i = dec_len++;
    u256_to_u32_limbs(code_hash, O->dt_code_hash + 8 * i);
    O->dt_page[i] = (u32)page;
    O->dt_is_first[i] = is_first;
    O->dt_timestamp[i] = (u32)ts;
    u64 enc[8];
    encode_decommit_query(code_hash, (u32)page, is_first, (u32)ts, enc);
    full_absorb(dec_q_state, enc);
    dec_q_len += 1;
  }

  Ref cur_head_ref() {
    if (!ctx.segment.empty()) return Ref{1, ctx.segment.back().push_slot};
    return Ref{2, ctx.tail_slot};
  }

  // ---- decode (isa/opcodes.py decode_instruction parity) ----

  Decoded decode(u64 word) {
    Decoded d;
    u32 vi = (u32)(word & 0x7FF);
    u64 props = P->opcode_props[vi];
    d.op_type = __builtin_ctzll(props & 0xFFFF);
    d.variant = __builtin_ctzll((props >> 16) & 0x3FF);
    d.flags = (u32)((props >> 26) & 0x3);
    d.src_mode = __builtin_ctzll((props >> 28) & 0x3F);
    d.dst_mode = __builtin_ctzll((props >> 34) & 0xF);
    d.condition = (u32)((word >> 13) & 0x7);
    d.src0 = (u32)((word >> 16) & 0xF);
    d.src1 = (u32)((word >> 20) & 0xF);
    d.dst0 = (u32)((word >> 24) & 0xF);
    d.dst1 = (u32)((word >> 28) & 0xF);
    d.imm0 = (u32)((word >> 32) & 0xFFFF);
    d.imm1 = (u32)((word >> 48) & 0xFFFF);
    d.price = P->opcode_prices[vi];
    d.props = props;
    return d;
  }

  static bool condition_resolves(u32 cond, bool of, bool eq, bool gt) {
    switch (cond) {
      case 0: return true;
      case 1: return gt;
      case 2: return of;
      case 3: return eq;
      case 4: return gt || eq;
      case 5: return of || eq;
      case 6: return !eq;
      default: return gt || of;
    }
  }

  // ---- snapshot (sim.py _snapshot_state parity) ----

  void resolve_later(u64* dst4, Ref ref) { fixups.push_back(Fixup{dst4, ref}); }

  void snapshot_state(int r) {
    for (int i = 0; i < 15; ++i) {
      u256_to_u32_limbs(registers[i].v, O->regs + (r * 15 + i) * 8);
      O->regs_ptr[r * 15 + i] = registers[i].ptr;
    }
    O->f_of[r] = f_of; O->f_eq[r] = f_eq; O->f_gt[r] = f_gt;
    O->ts[r] = (u32)timestamp;
    O->page_counter[r] = (u32)page_counter;
    O->tx_number[r] = tx_number;
    O->prev_code_page[r] = prev_code_page;
    O->prev_super_pc[r] = prev_super_pc;
    u256_to_u32_limbs(prev_code_word, O->prev_code_word + r * 8);
    O->pending_exc[r] = pending_exception;
    O->ergs_pp[r] = (u32)ergs_per_pubdata;
    for (int k = 0; k < 4; ++k) O->ctx_u128[r * 4 + k] = context_u128[k];
    O->cs_depth[r] = cs_depth;
    std::memcpy(O->mem_q_state + r * 12, mem_q_state, 12 * sizeof(u64));
    O->mem_q_len[r] = (u32)mem_q_len;
    std::memcpy(O->dec_q_state + r * 12, dec_q_state, 12 * sizeof(u64));
    O->dec_q_len[r] = (u32)dec_q_len;
    std::memcpy(O->log_fwd_tail + r * 4, log_fwd_tail, 4 * sizeof(u64));
    O->log_fwd_len[r] = (u32)log_fwd_len;
    for (int k = 0; k < 5; ++k) {
      O->ctx_this[r * 5 + k] = u256_limb32(ctx.this_addr, k);
      O->ctx_caller[r * 5 + k] = u256_limb32(ctx.caller, k);
      O->ctx_code_address[r * 5 + k] = u256_limb32(ctx.code_address, k);
    }
    O->ctx_code_page[r] = ctx.code_page;
    O->ctx_base_page[r] = ctx.base_page;
    O->ctx_heap_bound[r] = (u32)ctx.heap_upper_bound;
    O->ctx_aux_heap_bound[r] = (u32)ctx.aux_heap_upper_bound;
    O->ctx_pc[r] = ctx.pc;
    O->ctx_sp[r] = ctx.sp;
    O->ctx_eh[r] = ctx.exception_handler_loc;
    O->ctx_ergs[r] = (u32)ctx.ergs_remaining;
    O->ctx_is_static[r] = ctx.is_static_execution;
    O->ctx_is_kernel[r] = ctx.is_kernel_mode;
    O->ctx_is_local[r] = ctx.is_local_call;
    O->ctx_shard_this[r] = ctx.this_shard_id;
    O->ctx_shard_caller[r] = ctx.caller_shard_id;
    O->ctx_shard_code[r] = ctx.code_shard_id;
    for (int k = 0; k < 4; ++k) O->ctx_ctx_u128[r * 4 + k] = ctx.context_u128[k];
    O->ctx_rq_len[r] = ctx.reverted_queue_segment_len;
    resolve_later(O->ctx_rq_head + r * 4, cur_head_ref());
    resolve_later(O->ctx_rq_tail + r * 4, Ref{2, ctx.tail_slot});
  }

  // ---- write-back helpers ----

  struct CycleSt {
    u64 ts;
    i64 ergs1;
    u32 pc_plus_one;
    u64 heap_page, aux_heap_page;
    u32 imm0, imm1, flags_bits, variant;
    U256 src0_val, src1_val;
    bool src0_ptr, src1_ptr;
    u32 dst0_idx, dst1_idx;
    bool dst0_did_write;
    u64 dst0_page, dst0_index;
  };

  void write_dst0(const CycleSt& st, const U256& value, bool is_ptr) {
    if (st.dst0_did_write) {
      push_mem_query(st.ts + 3, st.dst0_page, st.dst0_index, true, is_ptr, value);
      mem_write(st.dst0_page, st.dst0_index, value, is_ptr);
    } else if (st.dst0_idx != 0) {
      registers[st.dst0_idx - 1] = RegVal{value, is_ptr};
    }
  }

  void write_dst1(const CycleSt& st, const U256& value, bool is_ptr = false) {
    if (st.dst1_idx != 0) registers[st.dst1_idx - 1] = RegVal{value, is_ptr};
  }

  void set_flags_if(const CycleSt& st, bool of, bool eq, bool gt) {
    if ((st.flags_bits >> SET_FLAGS_IDX) & 1) {
      f_of = of; f_eq = eq; f_gt = gt;
    }
  }

  int new_tail_slot() {
    tail_slots.push_back(TailSlot());
    return (int)tail_slots.size() - 1;
  }

  void push_and_enter(Context& old_ctx, Context& new_ctx) {
    old_ctx.head_ref = cur_head_ref();
    frames.push_back(old_ctx);
    event_recs.push_back(old_ctx);
    cs_events[row] = CsEvent{1, (int)event_recs.size() - 1};
    cs_depth += 1;
    new_ctx.tail_slot = new_tail_slot();
    resolve_later(O->call_rb_tail + row * 4, Ref{2, new_ctx.tail_slot});
    new_ctx.segment.clear();
    new_ctx.reverted_queue_segment_len = 0;
    ctx = new_ctx;
  }

  // ---- simple opcode families ----

  void op_add_sub(u32 op, const CycleSt& st) {
    const U256 &a = st.src0_val, &b = st.src1_val;
    U256 r;
    bool of;
    if (op == OP_ADD) {
      u64 c;
      r = u256_add(a, b, &c);
      of = c != 0;
    } else {
      of = u256_cmp(a, b) < 0;
      r = u256_sub(a, b, nullptr);
    }
    write_dst0(st, r, false);
    bool eq = u256_is_zero(r);
    set_flags_if(st, of, eq, !of && !eq);
  }

  void op_mul_div(u32 op, const CycleSt& st) {
    const U256 &a = st.src0_val, &b = st.src1_val;
    bool of, eq, gt;
    if (op == OP_MUL) {
      U512 full = u256_mul_full(a, b);
      U256 lo = u512_lo(full), hi = u512_hi(full);
      u256_to_u32_limbs(lo, O->fam_res0 + row * 8);
      u256_to_u32_limbs(hi, O->fam_res1 + row * 8);
      write_dst0(st, lo, false);
      write_dst1(st, hi);
      of = !u256_is_zero(hi);
      eq = u256_is_zero(lo);
      gt = !of && !eq;
    } else {
      U256 q = U256_ZERO, r = U256_ZERO;
      if (!u256_is_zero(b)) u256_divmod(a, b, &q, &r);
      u256_to_u32_limbs(q, O->fam_res0 + row * 8);
      u256_to_u32_limbs(r, O->fam_res1 + row * 8);
      write_dst0(st, q, false);
      write_dst1(st, r);
      of = u256_is_zero(b);
      eq = !of && u256_is_zero(q);
      gt = !of && u256_is_zero(r);
    }
    set_flags_if(st, of, eq, gt);
  }

  void op_jump(const CycleSt& st) { ctx.pc = (u32)(st.src0_val.w[0] & U16M); }

  void op_context(const CycleSt& st) {
    u32 v = st.variant;
    if (v == CTXV_SET_U128) {
      for (int k = 0; k < 4; ++k) context_u128[k] = u256_limb32(st.src0_val, k);
      return;
    }
    if (v == CTXV_SET_ERGS_PER_PUBDATA) {
      ergs_per_pubdata = st.src0_val.w[0] & U32M;
      return;
    }
    if (v == CTXV_INC_TX) {
      tx_number = (u32)((tx_number + 1) & U32M);
      return;
    }
    U256 res = U256_ZERO;
    switch (v) {
      case CTXV_THIS: res = ctx.this_addr; break;
      case CTXV_CALLER: res = ctx.caller; break;
      case CTXV_CODE_ADDRESS: res = ctx.code_address; break;
      case CTXV_META:
        res.w[0] = ergs_per_pubdata;
        res.w[1] = (u32)ctx.heap_upper_bound |
                   ((u64)(u32)ctx.aux_heap_upper_bound << 32);
        res.w[3] = ((u64)(ctx.this_shard_id & 0xFF) << 32) |
                   ((u64)(ctx.caller_shard_id & 0xFF) << 40) |
                   ((u64)(ctx.code_shard_id & 0xFF) << 48);
        break;
      case CTXV_ERGS_LEFT: res = u256_from_u64((u64)st.ergs1); break;
      case CTXV_SP: res = u256_from_u64(ctx.sp); break;
      case CTXV_GET_U128:
        for (int k = 0; k < 4; ++k)
          res.w[k / 2] |= (u64)ctx.context_u128[k] << (32 * (k % 2));
        break;
    }
    write_dst0(st, res, false);
  }

  void op_shift(const CycleSt& st) {
    const U256& a = st.src0_val;
    unsigned shift = (unsigned)(st.src1_val.w[0] & 0xFF);
    u32 v = st.variant;
    bool is_cyclic = (v == SHIFTV_ROL || v == SHIFTV_ROR);
    unsigned full_shift = (v == SHIFTV_ROR && shift != 0) ? 256 - shift : shift;
    U256 result;
    if (v == SHIFTV_SHR) {
      U256 q = u256_shr(a, full_shift);
      U256 r = u256_and(a, u256_low_mask(full_shift));
      u256_to_u32_limbs(q, O->fam_res0 + row * 8);
      u256_to_u32_limbs(r, O->fam_res1 + row * 8);
      result = q;
    } else {
      U512 full = u256_shl_full(a, full_shift);
      U256 lo = u512_lo(full), hi = u512_hi(full);
      u256_to_u32_limbs(lo, O->fam_res0 + row * 8);
      u256_to_u32_limbs(hi, O->fam_res1 + row * 8);
      result = is_cyclic ? u256_or(lo, hi) : lo;
    }
    write_dst0(st, result, false);
    set_flags_if(st, false, u256_is_zero(result), false);
  }

  void op_binop(const CycleSt& st) {
    const U256 &a = st.src0_val, &b = st.src1_val;
    U256 r = st.variant == BINOPV_AND ? u256_and(a, b)
             : st.variant == BINOPV_OR ? u256_or(a, b) : u256_xor(a, b);
    write_dst0(st, r, false);
    set_flags_if(st, false, u256_is_zero(r), false);
  }

  void op_ptr(const CycleSt& st) {
    const U256 &a = st.src0_val, &b = st.src1_val;
    u32 v = st.variant;
    bool panic = !(st.src0_ptr && !st.src1_ptr);
    u64 b_lo32 = b.w[0] & U32M;
    U256 result = a;
    if (v == PTRV_ADD || v == PTRV_SUB) {
      panic = panic || !u256_is_zero(u256_shr(b, 32));
      i64 off = (i64)(a.w[0] & U32M);
      i64 noff = v == PTRV_ADD ? off + (i64)b_lo32 : off - (i64)b_lo32;
      panic = panic || noff < 0 || noff > (i64)U32M;
      result = a;
      result.w[0] = (a.w[0] & ~U32M) | ((u64)noff & U32M);
    } else if (v == PTRV_PACK) {
      panic = panic || !u256_is_zero(u256_and(b, u256_low_mask(128)));
      result = u256_or(u256_and(a, u256_low_mask(128)),
                       u256_and(b, u256_xor(u256_low_mask(256), u256_low_mask(128))));
    } else {  // PTRV_SHRINK
      i64 nlen = (i64)((a.w[1] >> 32) & U32M) - (i64)b_lo32;
      panic = panic || nlen < 0;
      result = a;
      result.w[1] = (a.w[1] & U32M) | (((u64)nlen & U32M) << 32);
    }
    if (panic) {
      pending_exception = true;
    } else {
      write_dst0(st, result, st.src0_ptr);
    }
  }

  // ---- uma (sim.py _op_uma / ref opcodes/uma.rs parity) ----

  void op_uma(const CycleSt& st_in) {
    CycleSt st = st_in;
    u32 v = st.variant;
    bool increment = (st.flags_bits >> UMA_INCREMENT_IDX) & 1;
    bool is_fpr = v == UMAV_FAT_PTR_READ;
    bool access_heap = (v == UMAV_HEAP_READ || v == UMAV_HEAP_WRITE);
    bool access_aux = (v == UMAV_AUX_READ || v == UMAV_AUX_WRITE);
    bool is_read = (v == UMAV_HEAP_READ || v == UMAV_AUX_READ || is_fpr);

    const U256& src0 = st.src0_val;
    u64 offset = src0.w[0] & U32M;
    u64 page = (src0.w[0] >> 32) & U32M;
    u64 start = src0.w[1] & U32M;
    u64 length = (src0.w[1] >> 32) & U32M;
    bool not_ptr_when_expected = is_fpr && !st.src0_ptr;

    bool offset_in_slice = offset < length;
    bool skip_if_legit_ptr = is_fpr && !offset_in_slice;
    u64 formal_start = is_fpr ? start : 0;
    u64 absolute_address = (formal_start + offset) & U32M;
    u64 incremented_offset = (offset + 32) & U32M;
    bool non_addressable = (offset + 32 > U32M) || (incremented_offset == U32M);
    bool should_set_panic = not_ptr_when_expected || non_addressable;
    bool skip_memory = not_ptr_when_expected || skip_if_legit_ptr || non_addressable;
    u64 bytes_oob = 0;
    if (!skip_memory && incremented_offset >= length)
      bytes_oob = (incremented_offset - length) % 32;

    u64 growth_cost = 0;
    if (access_heap || access_aux) {
      u64 bound = access_heap ? ctx.heap_upper_bound : ctx.aux_heap_upper_bound;
      if (incremented_offset > bound) {
        growth_cost = incremented_offset - bound;
        if (access_heap) ctx.heap_upper_bound = incremented_offset;
        else ctx.aux_heap_upper_bound = incremented_offset;
      }
      bool high_nonzero = (src0.w[0] >> 32) != 0 || src0.w[1] != 0 ||
                          src0.w[2] != 0 || src0.w[3] != 0;
      if (high_nonzero || non_addressable) {
        growth_cost = U32M;
        should_set_panic = true;
        skip_memory = true;
      }
    }

    i64 ergs2 = st.ergs1 - (i64)growth_cost;
    if (ergs2 < 0) {
      ergs2 = 0;
      should_set_panic = true;
      skip_memory = true;
    }
    ctx.ergs_remaining = (u64)ergs2;

    u64 mem_page = page;
    if (access_heap) mem_page = st.heap_page;
    else if (access_aux) mem_page = st.aux_heap_page;

    u64 cell = absolute_address >> 5;
    u64 unalign = absolute_address & 31;
    bool read_a = !skip_memory;
    bool read_b = read_a && unalign != 0;

    U256 a_val = U256_ZERO, b_val = U256_ZERO;
    if (read_a) {
      a_val = mem_read(mem_page, cell).value;
      push_mem_query(st.ts, mem_page, cell, false, false, a_val);
    }
    if (read_b) {
      b_val = mem_read(mem_page, (cell + 1) & U32M).value;
      push_mem_query(st.ts, mem_page, (cell + 1) & U32M, false, false, b_val);
    }
    u256_to_u32_limbs(a_val, O->uma_a_val + row * 8);
    u256_to_u32_limbs(b_val, O->uma_b_val + row * 8);

    u8 buf[64];
    u256_to_be_bytes(a_val, buf);
    u256_to_be_bytes(b_val, buf + 32);
    u8 selected[32];
    std::memcpy(selected, buf + unalign, 32);
    u64 cleanup = is_fpr ? bytes_oob : 0;
    for (u64 i = 32 - cleanup; i < 32; ++i) selected[i] = 0;
    U256 read_value = u256_from_be_bytes(selected);

    bool execute_write = !is_read && !skip_memory;
    if (execute_write) {
      u8 newbuf[64];
      std::memcpy(newbuf, buf, 64);
      u256_to_be_bytes(st.src1_val, newbuf + unalign);
      U256 a_new = u256_from_be_bytes(newbuf);
      U256 b_new = u256_from_be_bytes(newbuf + 32);
      mem_write(mem_page, cell, a_new, false);
      push_mem_query(st.ts + 3, mem_page, cell, true, false, a_new);
      u256_to_u32_limbs(a_new, O->fam_res0 + row * 8);
      if (unalign != 0) {
        mem_write(mem_page, (cell + 1) & U32M, b_new, false);
        push_mem_query(st.ts + 3, mem_page, (cell + 1) & U32M, true, false, b_new);
        u256_to_u32_limbs(b_new, O->fam_res1 + row * 8);
      }
    }

    if (should_set_panic) {
      pending_exception = true;
    } else {
      U256 incr_src0 = src0;
      incr_src0.w[0] = (src0.w[0] & ~U32M) | incremented_offset;
      if (is_read) {
        write_dst0(st, read_value, false);
        if (increment) write_dst1(st, incr_src0, st.src0_ptr);
      } else if (increment) {
        write_dst0(st, incr_src0, st.src0_ptr);
      }
    }
  }

  // ---- precompile host execution (sim.py _execute_precompile parity) ----

  U256 snapshot_word(u64 page, u64 index) {
    U256 val = mem_read(page, index).value;
    if (pm_len >= P->pm_cap) { overflow = true; return val; }
    u64 i = pm_len++;
    O->pm_page[i] = (u32)page;
    O->pm_word[i] = (u32)index;
    u256_to_be_bytes(val, O->pm_value + 32 * i);
    return val;
  }

  void record_precompile_call(int family) {
    if (pcc_len >= P->pc_calls_cap) { overflow = true; return; }
    u64 i = pcc_len++;
    O->pc_family[i] = (u8)family;
    O->pc_log_index[i] = log_len - 1;  // the just-pushed forward log row
  }

  void execute_precompile(const LogQuery& q) {
    const U256& addr = q.address;
    u32 kl[8];
    u256_to_u32_limbs(q.key, kl);
    u64 in_page = kl[4], out_page = kl[5];
    if (addr.w[0] == P->sp_keccak_addr && addr.w[1] == 0 && addr.w[2] == 0 &&
        addr.w[3] == 0) {
      u64 off = kl[0], length = kl[1], out_word = kl[2];
      u64 first_word = off / 32;
      u64 last_word = length ? (off + length - 1) / 32 : first_word;
      std::vector<u8> data;
      data.reserve((last_word - first_word + 1) * 32);
      for (u64 wi = first_word; wi <= last_word; ++wi) {
        u8 be[32];
        u256_to_be_bytes(snapshot_word(in_page, wi), be);
        data.insert(data.end(), be, be + 32);
      }
      u8 dig[32];
      keccak256(data.data() + (off % 32), length, dig);
      mem_write(out_page, out_word, u256_from_be_bytes(dig), false);
      record_precompile_call(0);
    } else if (addr.w[0] == P->sp_sha256_addr && addr.w[1] == 0 &&
               addr.w[2] == 0 && addr.w[3] == 0) {
      u64 in_off = kl[0], out_off = kl[2], nrounds = kl[6];
      u32 state[8];
      std::memcpy(state, SHA_H0, sizeof(state));
      for (u64 r = 0; r < nrounds; ++r) {
        u8 blk[64];
        for (int j = 0; j < 2; ++j)
          u256_to_be_bytes(snapshot_word(in_page, in_off + 2 * r + j),
                           blk + 32 * j);
        u32 words[16];
        for (int j = 0; j < 16; ++j)
          words[j] = ((u32)blk[4 * j] << 24) | ((u32)blk[4 * j + 1] << 16) |
                     ((u32)blk[4 * j + 2] << 8) | blk[4 * j + 3];
        sha256_compress(state, words);
      }
      mem_write(out_page, out_off, sha_digest_value(state), false);
      record_precompile_call(1);
    } else if (addr.w[0] == P->sp_ecrecover_addr && addr.w[1] == 0 &&
               addr.w[2] == 0 && addr.w[3] == 0) {
      u64 in_off = kl[0], out_off = kl[2];
      U256 h = snapshot_word(in_page, in_off);
      U256 vv = snapshot_word(in_page, in_off + 1);
      U256 r = snapshot_word(in_page, in_off + 2);
      U256 s = snapshot_word(in_page, in_off + 3);
      // validity analysis (models/ecrecover.py _analyze_call parity)
      u32 recid = (u32)(vv.w[0] & 0xFF);
      bool y_odd = recid & 1;
      bool x_ovf = (recid >> 1) & 1;
      U256 half_n = u256_shr(u256_sub(SECP_N, u256_from_u64(1), nullptr), 1);
      U256 r_plus_n_ovf = u256_sub(U256_ZERO, SECP_N, nullptr);  // 2^256 - N
      bool exc_s_conv = u256_cmp(s, half_n) >= 0;
      bool exc_error = x_ovf && u256_cmp(r, r_plus_n_ovf) >= 0;
      bool exc_r_zero = u256_is_zero(u256_mod(r, SECP_N));
      bool exc_s_zero = u256_is_zero(u256_mod(s, SECP_N));
      bool need_x = !exc_error;
      U256 x = U256_ZERO;
      if (need_x) {
        x = r;
        if (x_ovf) x = u256_add(x, SECP_N, nullptr);  // < 2^256 since !exc_error
      }
      bool exc_x_range = need_x && u256_cmp(x, SECP_P) >= 0;
      bool need_t = need_x && !exc_x_range;
      U256 t = U256_ZERO;
      if (need_t) {
        t = secp_mulmod_p(secp_mulmod_p(x, x), x);
        t = secp_addmod(t, u256_from_u64(7), SECP_P);
      }
      bool exc_t_zero = need_t && u256_is_zero(t);
      bool nonres = false;
      U256 ry = U256_ZERO;
      bool have_R = false;
      if (need_t && !exc_t_zero) {
        U256 e = u256_shr(u256_add(SECP_P, u256_from_u64(1), nullptr), 2);
        // (P+1)/4: P+1 overflows 1 bit; (P+1) = 2^256 - C + 1... compute via
        // known even value: P ends ...FC2F, P+1 ends ...FC30, no 2^256 carry
        U256 p1 = u256_add(SECP_P, u256_from_u64(1), nullptr);
        e = u256_shr(p1, 2);
        U256 y = secp_powmod_p(t, e);
        if (secp_mulmod_p(y, y) == t) {
          bool odd = y.w[0] & 1;
          ry = (odd == y_odd) ? y : u256_sub(SECP_P, y, nullptr);
          have_R = true;
        } else {
          nonres = true;
        }
      }
      bool pre_exc = exc_s_conv || exc_error || exc_x_range || exc_r_zero ||
                     exc_s_zero || exc_t_zero || nonres;
      bool ladder_on = !pre_exc;
      bool have_Q = false;
      APoint Q{U256_ZERO, U256_ZERO, true};
      if (ladder_on && have_R) {
        U256 rmod = u256_mod(r, SECP_N);
        U256 nm2 = u256_sub(SECP_N, u256_from_u64(2), nullptr);
        U256 r_inv = secp_powmod_n(rmod, nm2);
        U256 hmod = u256_mod(h, SECP_N);
        U256 neg_h = u256_is_zero(hmod) ? U256_ZERO
                                        : u256_sub(SECP_N, hmod, nullptr);
        U256 u1 = secp_mulmod_n(neg_h, r_inv);
        U256 u2 = secp_mulmod_n(u256_mod(s, SECP_N), r_inv);
        APoint Rpt{x, ry, false};
        APoint G{SECP_GX, SECP_GY, false};
        bool acc1_none = u256_is_zero(u1);
        APoint acc1 = acc1_none ? APoint{U256_ZERO, U256_ZERO, true}
                                : secp_scalar_mul(u1, G);
        APoint acc2 = secp_scalar_mul(u2, Rpt);
        bool exc_inf = false;
        if (!acc1.inf && !acc2.inf && acc1.x == acc2.x) {
          U256 ysum = secp_addmod(acc1.y, acc2.y, SECP_P);
          exc_inf = u256_is_zero(ysum);
        }
        if (!exc_inf) {
          APoint res = acc1.inf ? acc2 : secp_affine_add(acc1, acc2);
          if (!res.inf) {
            Q = res;
            have_Q = true;
          }
        }
      }
      if (have_Q) {
        mem_write(out_page, out_off, u256_from_u64(1), false);
        mem_write(out_page, out_off + 1, secp_eth_address(Q), false);
      } else {
        mem_write(out_page, out_off, U256_ZERO, false);
        mem_write(out_page, out_off + 1, U256_ZERO, false);
      }
      record_precompile_call(2);
    }
  }

  // ---- log (sim.py _op_log / ref opcodes/log.rs parity) ----

  void op_log(const CycleSt& st) {
    u32 v = st.variant;
    bool is_sread = v == LOGV_SREAD;
    bool is_swrite = v == LOGV_SWRITE;
    bool is_event = v == LOGV_EVENT;
    bool is_l1msg = v == LOGV_L1MSG;
    bool is_precompile = v == LOGV_PRECOMPILE;
    bool is_storage = is_sread || is_swrite;
    bool is_revertable = !(is_sread || is_precompile);

    U256 key = st.src0_val;
    U256 written_value = st.src1_val;
    if (is_precompile) {
      if (((key.w[2]) & U32M) == 0) key.w[2] |= st.heap_page;
      if (((key.w[2] >> 32) & U32M) == 0) key.w[2] |= st.heap_page << 32;
    }

    u32 shard = ctx.this_shard_id;
    u32 aux_byte = is_storage ? (u32)P->sp_aux_storage
                   : is_event ? (u32)P->sp_aux_event
                   : is_l1msg ? (u32)P->sp_aux_l1
                              : (u32)P->sp_aux_precompile;
    u64 refund = 0;
    u64 burn = 0;
    if (is_swrite && shard == 0) {
      burn = ergs_per_pubdata *
             (P->sp_initial_storage_write_pubdata_bytes - refund);
    } else if (is_l1msg) {
      burn = ergs_per_pubdata * P->sp_l1_message_pubdata_bytes;
    } else if (is_precompile) {
      burn = written_value.w[0] & U32M;
    }
    O->pubdata_refund[row] = (u32)refund;

    i64 ergs2 = st.ergs1 - (i64)burn;
    bool have_ergs = ergs2 >= 0;
    if (ergs2 < 0) ergs2 = 0;
    ctx.ergs_remaining = (u64)ergs2;
    bool execute = have_ergs;

    U256 read_value = U256_ZERO;
    if (is_storage && execute) {
      StKey sk{shard, ctx.this_addr, key};
      auto it = storage.find(sk);
      if (it != storage.end()) read_value = it->second;
    }
    u256_to_u32_limbs(read_value, O->storage_read_val + row * 8);

    LogQuery q;
    q.address = ctx.this_addr;
    q.key = key;
    q.read_value = read_value;
    q.written_value = is_revertable ? written_value : read_value;
    q.rw_flag = is_revertable;
    q.aux_byte = aux_byte;
    q.is_service = (is_event || is_l1msg)
                       ? (bool)((st.flags_bits >> FIRST_MESSAGE_IDX) & 1)
                       : false;
    q.shard_id = shard;
    q.tx_number_in_block = tx_number;
    q.timestamp = (u32)(st.ts + 1);

    if (execute) {
      push_log_forward(q);
      if (is_revertable) {
        SegEntry e;
        encode_log_query(q, true, e.enc_rb);
        push_slots.push_back(PushSlot());
        e.push_slot = (int)push_slots.size() - 1;
        e.q = q;
        ctx.segment.push_back(e);
        ctx.reverted_queue_segment_len += 1;
        resolve_later(O->rb_prev_head + row * 4, Ref{1, e.push_slot});
      }
      if (is_swrite) storage[StKey{shard, ctx.this_addr, key}] = written_value;
      if (is_precompile) execute_precompile(q);
    }

    if (is_sread) {
      write_dst0(st, read_value, false);
    } else if (is_precompile) {
      write_dst0(st, u256_from_u64(have_ergs ? 1 : 0), false);
    }
  }

  // ---- near_call ----

  void op_near_call(const CycleSt& st) {
    Context old_ctx = ctx;
    old_ctx.pc = st.pc_plus_one;
    u64 preliminary = (u64)st.ergs1;
    u64 ergs_passed = st.src0_val.w[0] & U32M;
    u64 ergs_to_pass = ergs_passed == 0 ? preliminary : ergs_passed;
    u64 remaining, passed;
    if (ergs_to_pass > preliminary) {
      remaining = 0;
      passed = preliminary;
    } else {
      remaining = preliminary - ergs_to_pass;
      passed = ergs_to_pass;
    }
    old_ctx.ergs_remaining = remaining;

    Context new_ctx = old_ctx;  // copy() semantics (keeps segment too; reset below)
    new_ctx.ergs_remaining = passed;
    new_ctx.pc = st.imm0;
    new_ctx.exception_handler_loc = st.imm1;
    new_ctx.is_local_call = true;
    push_and_enter(old_ctx, new_ctx);
    f_of = f_eq = f_gt = false;
  }

  // ---- far_call (sim.py _op_far_call / ref call_ret_impl/far_call.rs) ----

  void op_far_call(const CycleSt& st) {
    u32 v = st.variant;
    bool is_delegate = v == FCALLV_DELEGATE;
    bool is_mimic = v == FCALLV_MIMIC;
    bool is_static_call = (st.flags_bits >> FAR_CALL_STATIC_IDX) & 1;
    bool is_shard_call = (st.flags_bits >> FAR_CALL_SHARD_IDX) & 1;

    Context old_ctx = ctx;  // mutated then saved
    old_ctx.pc = st.pc_plus_one;

    const U256& abi = st.src0_val;
    u64 ergs_passed_abi = abi.w[3] & U32M;  // (abi >> 192) & U32
    u8 forwarding_byte = u256_byte_le(abi, (unsigned)P->sp_fwd_mode_byte_idx);
    u8 shard_byte = u256_byte_le(abi, (unsigned)P->sp_shard_id_byte_idx);
    u8 constructor_byte = u256_byte_le(abi, (unsigned)P->sp_constructor_byte_idx);
    u8 system_byte = u256_byte_le(abi, (unsigned)P->sp_system_byte_idx);
    bool use_aux_heap = forwarding_byte == P->sp_forward_use_aux_heap;
    bool forward_fat_ptr = forwarding_byte == P->sp_forward_fat_ptr;
    bool use_heap = !(use_aux_heap || forward_fat_ptr);

    U256 dest = u256_and(st.src1_val, u256_low_mask(160));
    u32 dest_shard = is_shard_call ? shard_byte : ctx.this_shard_id;
    bool target_is_zkporter = dest_shard != 0;
    bool target_is_kernel = u256_cmp(dest, u256_from_u64(1ULL << 16)) < 0;
    bool constructor_call = constructor_byte && ctx.is_kernel_mode;
    bool system_call = system_byte && target_is_kernel;

    u64 offset = abi.w[0] & U32M;
    u64 page = (abi.w[0] >> 32) & U32M;
    u64 start = abi.w[1] & U32M;
    u64 length = (abi.w[1] >> 32) & U32M;
    bool as_fresh = !forward_fat_ptr;
    bool nonzero_offset_fresh = (offset != 0) && as_fresh;
    u64 end_ni = start + length;
    bool slice_overflow = end_ni > U32M;
    bool invalid_slice = length < offset;
    bool ptr_invalid = nonzero_offset_fresh || slice_overflow || invalid_slice;
    if (ptr_invalid) offset = page = start = length = 0;
    u64 upper_bound = (start + length) & U32M;
    if (ptr_invalid) upper_bound = 0;

    u64 new_base_page = page_counter;
    page_counter = (page_counter + P->sp_new_pages_per_far_call) & U32M;

    // code-hash read (far_call.rs:1104-1280)
    bool can_read = !target_is_zkporter || P->zkporter_available;
    bool should_read = can_read;
    U256 raw_hash = U256_ZERO;
    if (should_read) {
      StKey sk{dest_shard, u256_from_u64(P->sp_deployer_address), dest};
      auto it = storage.find(sk);
      if (it != storage.end()) raw_hash = it->second;
    }
    u256_to_u32_limbs(raw_hash, O->storage_read_val + row * 8);
    bool needs_porter_mask = target_is_zkporter && !P->zkporter_available;
    bool bytecode_is_empty = u256_is_zero(raw_hash);
    bool mask_default_aa = should_read && bytecode_is_empty && !target_is_kernel;
    U256 default_aa = {{P->default_aa_code_hash[0], P->default_aa_code_hash[1],
                        P->default_aa_code_hash[2], P->default_aa_code_hash[3]}};
    U256 bytecode_hash = mask_default_aa ? default_aa : raw_hash;
    if (needs_porter_mask) bytecode_hash = U256_ZERO;
    if (should_read) {
      LogQuery q;
      q.address = u256_from_u64(P->sp_deployer_address);
      q.key = dest;
      q.read_value = raw_hash;
      q.written_value = raw_hash;
      q.rw_flag = false;
      q.aux_byte = (u32)P->sp_aux_storage;
      q.is_service = false;
      q.shard_id = dest_shard;
      q.tx_number_in_block = tx_number;
      q.timestamp = (u32)(st.ts + 1);
      push_log_forward(q);
    }

    u32 version_byte = (u32)(bytecode_hash.w[3] >> 56);          // >> 248
    u32 marker_byte = (u32)((bytecode_hash.w[3] >> 48) & 0xFF);  // >> 240
    bool version_ok = version_byte == P->sp_code_hash_version_byte;
    bool is_normal_marker = marker_byte == P->sp_code_at_rest_marker;
    bool is_constructed_marker = marker_byte == P->sp_yet_constructed_marker;
    bool code_format_exception =
        !version_ok || !(is_normal_marker || is_constructed_marker);
    bool can_call_code = (is_normal_marker && !constructor_call) ||
                         (is_constructed_marker && constructor_call);
    bool call_in_construction_kernel = !can_call_code && target_is_kernel;
    U256 masked_hash;
    if (can_call_code) {
      masked_hash = bytecode_hash;
      masked_hash.w[3] = (bytecode_hash.w[3] & ~(0xFFULL << 48)) |
                         ((u64)P->sp_code_at_rest_marker << 48);
    } else {
      masked_hash = target_is_kernel ? U256_ZERO : default_aa;
    }
    u64 code_len_words =
        code_format_exception ? 0 : ((masked_hash.w[3] >> 32) & U16M);  // >>224

    bool fat_ptr_expected_exception = forward_fat_ptr && !st.src0_ptr;
    bool exceptions = code_format_exception || call_in_construction_kernel ||
                      fat_ptr_expected_exception || ptr_invalid;

    // heap growth for forwarded-by-copy regions (far_call.rs:659-731)
    u64 ub = exceptions ? 0 : upper_bound;
    if (slice_overflow && !forward_fat_ptr) ub = U32M;
    u64 growth_cost = 0;
    if (use_heap || use_aux_heap) {
      u64 bound = use_heap ? old_ctx.heap_upper_bound : old_ctx.aux_heap_upper_bound;
      if (ub > bound) {
        growth_cost = ub - bound;
        if (use_heap) old_ctx.heap_upper_bound = ub;
        else old_ctx.aux_heap_upper_bound = ub;
      }
    }
    i64 ergs2 = st.ergs1 - (i64)growth_cost;
    if (ergs2 < 0) {
      ergs2 = 0;
      exceptions = true;
    }

    bool should_decommit = !exceptions;
    u64 cost = P->sp_ergs_per_code_word * code_len_words;
    if (should_decommit && (i64)cost > ergs2) {
      should_decommit = false;
      exceptions = true;
    }
    u64 ergs_after = should_decommit ? (u64)ergs2 - cost : (u64)ergs2;

    u64 code_memory_page = P->sp_unmapped_page;
    if (should_decommit) {
      u64 target_page = new_base_page;
      u64 suggested = target_page;
      auto it = decommitted.find(masked_hash);
      if (it != decommitted.end()) suggested = it->second;
      O->dec_suggested_page[row] = (u32)suggested;
      bool is_first = suggested == target_page;
      if (!is_first) ergs_after = (u64)ergs2;  // refund
      code_memory_page = suggested;
      push_decommit(masked_hash, suggested, is_first, st.ts + 1);
      if (is_first) {
        decommitted[masked_hash] = suggested;
        auto cit = code_store.find(masked_hash);
        if (cit != code_store.end()) {
          u64 off = cit->second.first, len = cit->second.second;
          for (u64 i = 0; i < len; ++i) {
            U256 w = {{P->code_store_words[(off + i) * 4],
                       P->code_store_words[(off + i) * 4 + 1],
                       P->code_store_words[(off + i) * 4 + 2],
                       P->code_store_words[(off + i) * 4 + 3]}};
            mem_write(suggested, i, w, false);
          }
        }
      }
    }

    // 63/64 rule (far_call.rs:856-890)
    u64 max_passable = (ergs_after / 64) * 63;
    u64 ergs_to_pass = ergs_passed_abi < max_passable ? ergs_passed_abi : max_passable;
    old_ctx.ergs_remaining = ergs_after - ergs_to_pass;

    U256 mimic_caller = u256_and(
        registers[P->sp_call_implicit_reg_idx].v, u256_low_mask(160));
    Context new_ctx;
    new_ctx.heap_upper_bound = P->sp_new_frame_memory_stipend;
    new_ctx.aux_heap_upper_bound = P->sp_new_frame_memory_stipend;
    new_ctx.ergs_remaining = ergs_to_pass;
    new_ctx.pc = 0;
    new_ctx.exception_handler_loc = st.imm0;
    new_ctx.is_static_execution = is_static_call || ctx.is_static_execution;
    new_ctx.is_kernel_mode = is_delegate ? ctx.is_kernel_mode : target_is_kernel;
    new_ctx.code_shard_id = dest_shard;
    new_ctx.code_address = dest;
    new_ctx.this_shard_id = is_delegate ? ctx.this_shard_id : dest_shard;
    new_ctx.this_addr = is_delegate ? ctx.this_addr : dest;
    new_ctx.caller = is_delegate ? ctx.caller : (is_mimic ? mimic_caller : ctx.this_addr);
    new_ctx.caller_shard_id = ctx.this_shard_id;
    new_ctx.code_page = (u32)code_memory_page;
    new_ctx.base_page = (u32)new_base_page;
    for (int k = 0; k < 4; ++k)
      new_ctx.context_u128[k] =
          is_delegate ? ctx.context_u128[k] : context_u128[k];
    new_ctx.is_local_call = false;

    // ABI registers (far_call.rs:1006-1071)
    u64 fp_page = 0, fp_start = 0, fp_length = 0;
    if (!exceptions) {
      if (forward_fat_ptr) {
        fp_page = page;
        fp_start = (start + offset) & U32M;
        fp_length = (length - offset) & U32M;
      } else {
        fp_page = use_heap ? st.heap_page : st.aux_heap_page;
        fp_start = start;
        fp_length = length;
      }
    }
    U256 r1 = U256_ZERO;
    r1.w[0] = fp_page << 32;
    r1.w[1] = fp_start | (fp_length << 32);
    registers[0] = RegVal{r1, true};
    registers[1] = RegVal{
        u256_from_u64((u64)(constructor_call ? 1 : 0) |
                      ((u64)(system_call ? 1 : 0) << 1)),
        false};
    for (int idx = 0; idx < 15; ++idx) {
      if ((P->sp_call_system_abi_reg_mask >> idx) & 1) {
        if (system_call) registers[idx].ptr = false;  // erase ptr markers only
        else registers[idx] = RegVal{U256_ZERO, false};
      }
      if ((P->sp_call_reserved_reg_mask >> idx) & 1)
        registers[idx] = RegVal{U256_ZERO, false};
    }
    registers[P->sp_call_implicit_reg_idx] = RegVal{U256_ZERO, false};

    push_and_enter(old_ctx, new_ctx);
    for (int k = 0; k < 4; ++k) context_u128[k] = 0;
    f_of = f_eq = f_gt = false;
    if (exceptions) pending_exception = true;
  }

  // ---- ret (sim.py _op_ret / ref call_ret_impl/ret.rs parity) ----

  void op_ret(const CycleSt& st) {
    u32 v = st.variant;
    bool is_ok = v == RETV_OK;
    (void)is_ok;
    bool is_revert = v == RETV_REVERT;
    bool is_panic = v == RETV_PANIC;
    bool is_local = ctx.is_local_call;
    bool is_far_return = !is_local;
    bool to_label = (st.flags_bits >> RET_TO_LABEL_IDX) & 1;

    U256 src0 = is_panic ? U256_ZERO : st.src0_val;
    bool src0_ptr = !is_panic && st.src0_ptr;
    u8 forwarding_byte = u256_byte_le(src0, (unsigned)P->sp_fwd_mode_byte_idx);
    bool use_aux_heap = forwarding_byte == P->sp_forward_use_aux_heap;
    bool forward_fat_ptr = forwarding_byte == P->sp_forward_fat_ptr;
    bool use_heap = !(use_aux_heap || forward_fat_ptr);

    // pop the saved record; it stays FROZEN for the sponge witness
    Context popped = frames.back();
    frames.pop_back();
    event_recs.push_back(popped);
    cs_events[row] = CsEvent{2, (int)event_recs.size() - 1};
    // popped-record witness columns (phase B resolves head/tail)
    fill_ret_popped(popped);
    cs_depth -= 1;
    Context parent = popped;  // the live continuation is a copy

    u64 preliminary = (u64)st.ergs1;
    u64 offset = src0.w[0] & U32M;
    u64 pg = (src0.w[0] >> 32) & U32M;
    u64 start = src0.w[1] & U32M;
    u64 length = (src0.w[1] >> 32) & U32M;
    bool fat_ptr_expected_exc = forward_fat_ptr && !src0_ptr && is_far_return;
    bool non_unidirectional = forward_fat_ptr && pg < ctx.base_page;
    bool as_fresh = !forward_fat_ptr;
    bool nonzero_offset_fresh = (offset != 0) && as_fresh;
    u64 end_ni = start + length;
    bool slice_overflow = end_ni > U32M;
    bool invalid_slice = length < offset;
    bool ptr_invalid = nonzero_offset_fresh || slice_overflow || invalid_slice;
    bool exceptions =
        is_panic || (is_far_return &&
                     (fat_ptr_expected_exc || non_unidirectional || ptr_invalid));

    u64 growth_cost = 0;
    if (is_far_return && !exceptions) {
      u64 ub = end_ni & U32M;
      if (slice_overflow && !forward_fat_ptr) ub = U32M;
      if (use_heap || use_aux_heap) {
        u64 bound = use_heap ? ctx.heap_upper_bound : ctx.aux_heap_upper_bound;
        if (ub > bound) growth_cost = ub - bound;
      }
    }
    i64 ergs2 = (i64)preliminary - (i64)growth_cost;
    if (ergs2 < 0) {
      ergs2 = 0;
      exceptions = true;
    }
    if (is_local) ergs2 = (i64)preliminary;

    bool non_local_panic = is_far_return && (is_panic || exceptions);
    bool perform_revert = is_revert || is_panic || non_local_panic;

    parent.ergs_remaining = (parent.ergs_remaining + (u64)ergs2) & U32M;
    if (is_local) {
      parent.heap_upper_bound = ctx.heap_upper_bound;
      parent.aux_heap_upper_bound = ctx.aux_heap_upper_bound;
    }

    u32 dst_pc;
    if (perform_revert) {
      // append this frame's rollback segment to the forward queue
      u64 h[4];
      std::memcpy(h, log_fwd_tail, sizeof(h));
      for (auto it = ctx.segment.rbegin(); it != ctx.segment.rend(); ++it) {
        std::memcpy(push_slots[it->push_slot].head_after, h, sizeof(h));
        push_slots[it->push_slot].resolved = true;
        tape_log(it->q, true);
        u64 nh[4];
        narrow_hash(h, it->enc_rb, nh);
        std::memcpy(h, nh, sizeof(h));
      }
      log_fwd_len += ctx.segment.size();
      std::memcpy(log_fwd_tail, h, sizeof(h));
      TailSlot& tslot = tail_slots[ctx.tail_slot];
      std::memcpy(tslot.value, h, sizeof(h));
      tslot.has_value = true;
      dst_pc = ctx.exception_handler_loc;
    } else {
      // ok: the child tail must equal the parent's saved head (ret.rs:368-374)
      TailSlot& tslot = tail_slots[ctx.tail_slot];
      if (!tslot.has_value && !tslot.has_alias) {
        tslot.has_alias = true;
        tslot.alias = parent.head_ref;
      }
      for (auto& e : ctx.segment) parent.segment.push_back(e);
      parent.reverted_queue_segment_len += ctx.reverted_queue_segment_len;
      dst_pc = parent.pc;
    }
    if (to_label && is_local) dst_pc = st.imm0;
    parent.pc = dst_pc;

    if (is_far_return) {
      u64 fp_page = 0, fp_start = 0, fp_length = 0;
      if (!exceptions) {
        if (forward_fat_ptr) {
          fp_page = pg;
          fp_start = (start + offset) & U32M;
          fp_length = (length - offset) & U32M;
        } else {
          fp_page = use_heap ? st.heap_page : st.aux_heap_page;
          fp_start = start;
          fp_length = length;
        }
      }
      U256 r1 = U256_ZERO;
      r1.w[0] = fp_page << 32;
      r1.w[1] = fp_start | (fp_length << 32);
      registers[0] = RegVal{r1, true};
      for (int idx = 1; idx < 15; ++idx) registers[idx] = RegVal{U256_ZERO, false};
      for (int k = 0; k < 4; ++k) context_u128[k] = 0;
    }

    ctx = parent;
    f_of = is_panic || non_local_panic;
    f_eq = false;
    f_gt = false;
  }

  void fill_ret_popped(const Context& c) {
    int r = row;
    for (int k = 0; k < 5; ++k) {
      O->ret_popped_this[r * 5 + k] = u256_limb32(c.this_addr, k);
      O->ret_popped_caller[r * 5 + k] = u256_limb32(c.caller, k);
      O->ret_popped_code_address[r * 5 + k] = u256_limb32(c.code_address, k);
    }
    O->ret_popped_code_page[r] = c.code_page;
    O->ret_popped_base_page[r] = c.base_page;
    O->ret_popped_heap_bound[r] = (u32)c.heap_upper_bound;
    O->ret_popped_aux_heap_bound[r] = (u32)c.aux_heap_upper_bound;
    O->ret_popped_pc[r] = c.pc;
    O->ret_popped_sp[r] = c.sp;
    O->ret_popped_eh[r] = c.exception_handler_loc;
    O->ret_popped_ergs[r] = (u32)c.ergs_remaining;
    O->ret_popped_rq_len[r] = c.reverted_queue_segment_len;
    O->ret_popped_shard_this[r] = c.this_shard_id;
    O->ret_popped_shard_caller[r] = c.caller_shard_id;
    O->ret_popped_shard_code[r] = c.code_shard_id;
    O->ret_popped_is_static[r] = c.is_static_execution;
    O->ret_popped_is_kernel[r] = c.is_kernel_mode;
    O->ret_popped_is_local[r] = c.is_local_call;
    for (int k = 0; k < 4; ++k)
      O->ret_popped_ctx_u128[r * 4 + k] = c.context_u128[k];
    resolve_later(O->ret_popped_rq_head + r * 4, c.head_ref);
    resolve_later(O->ret_popped_rq_tail + r * 4, Ref{2, c.tail_slot});
  }

  // ---- one cycle (sim.py _cycle parity) ----

  void cycle() {
    bool should_skip = cs_depth == 0;
    bool pending = pending_exception;
    bool execute_pending_exc = pending && !should_skip;
    if (execute_pending_exc) pending_exception = false;
    bool should_try_read = !should_skip && !pending;

    u32 current_pc = ctx.pc;
    u32 pc_plus_one = (current_pc + 1) & U16M;
    u32 super_pc = current_pc >> 2, sub_pc = current_pc & 3;
    bool should_read_for_new_pc =
        !(prev_code_page == ctx.code_page && super_pc == prev_super_pc);
    bool should_read_opcode = should_try_read && should_read_for_new_pc;

    u64 ts = timestamp;
    timestamp = should_skip ? ts : ts + 4;

    U256 code_word_val = mem_read(ctx.code_page, super_pc).value;
    U256 code_word;
    if (should_read_opcode) {
      push_mem_query(ts, ctx.code_page, super_pc, false, false, code_word_val);
      code_word = code_word_val;
    } else {
      code_word = prev_code_word;
    }
    if (should_read_opcode)
      u256_to_u32_limbs(code_word_val, O->code_word_read + row * 8);
    O->should_read_opcode[row] = should_read_opcode;

    u64 raw_opcode = code_word.w[3 - sub_pc];
    if (should_skip) raw_opcode = P->nop_encoding;
    if (execute_pending_exc) raw_opcode = P->panic_encoding;

    prev_code_word = code_word;
    prev_code_page = ctx.code_page;
    if (!should_skip) {
      ctx.pc = pc_plus_one;
      prev_super_pc = super_pc;
    }

    // ---- decode + fast exceptions ----
    Decoded d = decode(raw_opcode);
    bool cond = condition_resolves(d.condition, f_of, f_eq, f_gt);
    u64 price = should_skip ? 0 : d.price;
    u64 ergs0 = ctx.ergs_remaining;
    bool out_of_ergs = price > ergs0;
    i64 ergs1 = out_of_ergs ? 0 : (i64)(ergs0 - price);

    u64 props = d.props;
    bool kernel_only = (props >> (AUX_BITS_OFFSET + KERNEL_MODE_FLAG_IDX)) & 1;
    bool static_ok = (props >> (AUX_BITS_OFFSET + STATIC_OK_FLAG_IDX)) & 1;
    bool explicit_panic = (props >> (AUX_BITS_OFFSET + EXPLICIT_PANIC_FLAG_IDX)) & 1;
    bool kernel_exc = kernel_only && !ctx.is_kernel_mode;
    bool static_exc = ctx.is_static_execution && !static_ok;
    bool callstack_full = cs_depth == P->sp_vm_max_stack_depth;
    bool mask_panic =
        explicit_panic || out_of_ergs || kernel_exc || static_exc || callstack_full;
    bool mask_nop = !mask_panic && !cond;
    Decoded eff = d;
    if (mask_panic) eff = decode(P->panic_encoding);
    else if (mask_nop) eff = decode(P->nop_encoding);
    u32 op_type = eff.op_type, variant = eff.variant;
    u32 src_mode = eff.src_mode, dst_mode = eff.dst_mode, flags_bits = eff.flags;
    bool mask_any = mask_panic || mask_nop;
    u32 src0_idx = mask_any ? 0 : d.src0;
    u32 src1_idx = mask_any ? 0 : d.src1;
    u32 dst0_idx = mask_any ? 0 : d.dst0;
    u32 dst1_idx = mask_any ? 0 : d.dst1;
    u32 imm0 = d.imm0, imm1 = d.imm1;

    ctx.ergs_remaining = (u64)ergs1;
    O->raw_opcode_lo[row] = (u32)(raw_opcode & U32M);
    O->raw_opcode_hi[row] = (u32)(raw_opcode >> 32);

    // ---- operand resolution (utils.rs:237-384) ----
    auto reg_val = [&](u32 idx) -> RegVal {
      if (idx == 0) return RegVal{U256_ZERO, false};
      return registers[idx - 1];
    };
    RegVal draft_src0 = reg_val(src0_idx);
    RegVal src1_rv = reg_val(src1_idx);
    U256 src1_val = src1_rv.v;
    bool src1_ptr = src1_rv.ptr;
    u32 dst0_reg_low = (u32)(reg_val(dst0_idx).v.w[0] & U16M);

    u64 stack_page = (ctx.base_page + 1) & U32M;
    u64 heap_page = (ctx.base_page + 2) & U32M;
    u64 aux_heap_page = (ctx.base_page + 3) & U32M;
    u32 current_sp = ctx.sp;
    bool is_nop_op = op_type == OP_NOP;

    u32 src_reg_low = (u32)(draft_src0.v.w[0] & U16M);
    u32 idx_abs = (src_reg_low + imm0) & U16M;
    u32 idx_rel = (current_sp - idx_abs) & U16M;
    bool use_code = src_mode == SRC_CODE;
    bool use_stack_abs = src_mode == SRC_STACK_ABSOLUTE;
    bool use_stack_rel = src_mode == SRC_STACK_OFFSET;
    bool use_stack_pp = src_mode == SRC_STACK_PUSH_POP;
    bool use_stack = use_stack_abs || use_stack_rel || use_stack_pp;
    bool src0_did_read = (use_stack || use_code) && !is_nop_op;
    u64 src0_page = use_stack ? stack_page : ctx.code_page;
    u32 src0_index = (use_code || use_stack_abs) ? idx_abs : idx_rel;
    u32 new_sp = use_stack_pp ? idx_rel : current_sp;

    u32 d_idx_abs = (dst0_reg_low + imm1) & U16M;
    u32 d_idx_rel_push = (new_sp + d_idx_abs) & U16M;
    u32 d_idx_rel = (new_sp - d_idx_abs) & U16M;
    bool d_use_stack_abs = dst_mode == DST_STACK_ABSOLUTE;
    bool d_use_stack_rel = dst_mode == DST_STACK_OFFSET;
    bool d_use_stack_pp = dst_mode == DST_STACK_PUSH_POP;
    bool dst0_did_write =
        (d_use_stack_abs || d_use_stack_rel || d_use_stack_pp) && !is_nop_op;
    u32 dst0_index =
        d_use_stack_abs ? d_idx_abs : (d_use_stack_pp ? new_sp : d_idx_rel);
    new_sp = d_use_stack_pp ? d_idx_rel_push : new_sp;
    ctx.sp = new_sp;

    U256 mval = U256_ZERO;
    bool mptr = false;
    if (src0_did_read) {
      MemCell c = mem_read(src0_page, src0_index);
      mval = c.value;
      mptr = c.is_ptr;
      push_mem_query(ts, src0_page, src0_index, false, mptr, mval);
    }
    u256_to_u32_limbs(mval, O->src0_mem_val + row * 8);
    O->src0_mem_is_ptr[row] = mptr;
    O->src0_did_read[row] = src0_did_read;
    O->dst0_did_write[row] = dst0_did_write;
    O->dst0_page[row] = (u32)stack_page;
    O->dst0_index[row] = dst0_index;

    U256 src0_val;
    bool src0_ptr;
    if (src_mode == SRC_REG) {
      src0_val = draft_src0.v;
      src0_ptr = draft_src0.ptr;
    } else if (src_mode == SRC_IMM) {
      src0_val = u256_from_u64(imm0);
      src0_ptr = false;
    } else {
      src0_val = mval;
      src0_ptr = mptr;
    }

    bool is_asym = (op_type == OP_SUB || op_type == OP_DIV || op_type == OP_SHIFT);
    bool swap = (is_asym && ((flags_bits >> SWAP_OPERANDS_IDX) & 1)) ||
                (op_type == OP_PTR && ((flags_bits >> SWAP_OPERANDS_IDX) & 1));
    if (swap) {
      U256 tv = src0_val; src0_val = src1_val; src1_val = tv;
      bool tp = src0_ptr; src0_ptr = src1_ptr; src1_ptr = tp;
    }

    // fat-pointer metadata erasure (pre_state.rs:456-482)
    bool not_kernel = !ctx.is_kernel_mode;
    bool keeps_ptr = (op_type == OP_RET || op_type == OP_PTR ||
                      op_type == OP_UMA || op_type == OP_FAR_CALL);
    // erase_mask zeros u32 limbs 1..2 (bits 32..95: page/start), keeping
    // the length limb — sim.py pre_state erasure parity
    if (src0_ptr && !keeps_ptr && not_kernel) {
      src0_ptr = false;
      src0_val.w[0] &= U32M;
      src0_val.w[1] &= ~U32M;
    }
    if (src1_ptr && not_kernel) {
      src1_ptr = false;
      src1_val.w[0] &= U32M;
      src1_val.w[1] &= ~U32M;
    }

    u256_to_u32_limbs(src0_val, O->src0_val + row * 8);
    O->src0_is_ptr[row] = src0_ptr;
    u256_to_u32_limbs(src1_val, O->src1_val + row * 8);
    O->src1_is_ptr[row] = src1_ptr;

    CycleSt st;
    st.ts = ts;
    st.ergs1 = ergs1;
    st.pc_plus_one = pc_plus_one;
    st.heap_page = heap_page;
    st.aux_heap_page = aux_heap_page;
    st.imm0 = imm0;
    st.imm1 = imm1;
    st.flags_bits = flags_bits;
    st.variant = variant;
    st.src0_val = src0_val;
    st.src0_ptr = src0_ptr;
    st.src1_val = src1_val;
    st.src1_ptr = src1_ptr;
    st.dst0_idx = dst0_idx;
    st.dst1_idx = dst1_idx;
    st.dst0_did_write = dst0_did_write;
    st.dst0_page = stack_page;
    st.dst0_index = dst0_index;

    switch (op_type) {
      case OP_NOP: case OP_INVALID: break;
      case OP_ADD: case OP_SUB: op_add_sub(op_type, st); break;
      case OP_MUL: case OP_DIV: op_mul_div(op_type, st); break;
      case OP_JUMP: op_jump(st); break;
      case OP_CONTEXT: op_context(st); break;
      case OP_SHIFT: op_shift(st); break;
      case OP_BINOP: op_binop(st); break;
      case OP_PTR: op_ptr(st); break;
      case OP_NEAR_CALL: op_near_call(st); break;
      case OP_LOG: op_log(st); break;
      case OP_FAR_CALL: op_far_call(st); break;
      case OP_RET: op_ret(st); break;
      case OP_UMA: op_uma(st); break;
    }
  }

  // ---- phase B: ref resolution + callstack sponge replay ----

  void resolve_ref(const Ref& ref, u64 out[4], int depth = 0) {
    if (depth >= 4096 || ref.kind == 0) {
      std::memset(out, 0, 4 * sizeof(u64));
      return;
    }
    if (ref.kind == 1) {
      std::memcpy(out, push_slots[ref.idx].head_after, 4 * sizeof(u64));
      return;
    }
    const TailSlot& s = tail_slots[ref.idx];
    if (s.has_value) {
      std::memcpy(out, s.value, 4 * sizeof(u64));
      return;
    }
    resolve_ref(s.alias, out, depth + 1);
  }

  void phase_b() {
    // 1) resolve still-live rollback segments against the final forward tail
    u64 h[4];
    std::memcpy(h, log_fwd_tail, sizeof(h));
    std::vector<Context*> live;
    live.push_back(&ctx);
    for (auto it = frames.rbegin(); it != frames.rend(); ++it)
      live.push_back(&*it);
    for (Context* rec : live) {
      for (auto it = rec->segment.rbegin(); it != rec->segment.rend(); ++it) {
        PushSlot& ps = push_slots[it->push_slot];
        if (!ps.resolved) {
          std::memcpy(ps.head_after, h, sizeof(h));
          ps.resolved = true;
        }
        u64 nh[4];
        narrow_hash(h, it->enc_rb, nh);
        std::memcpy(h, nh, sizeof(h));
      }
      if (rec->tail_slot >= 0) {
        TailSlot& ts_ = tail_slots[rec->tail_slot];
        if (!ts_.has_value && !ts_.has_alias) {
          std::memcpy(ts_.value, h, sizeof(h));
          ts_.has_value = true;
        }
      }
    }
    TailSlot& bs = tail_slots[block_slot];
    if (!bs.has_value) {
      std::memcpy(bs.value, h, sizeof(h));
      bs.has_value = true;
    }
    std::memcpy(O->block_rollback_tail, bs.value, 4 * sizeof(u64));

    // 2) apply deferred ref fixups (state rows, rb_prev_head, call_rb_tail,
    //    ret_popped head/tail)
    for (const Fixup& f : fixups) resolve_ref(f.ref, f.dst);

    // 3) replay the callstack sponge with resolved encodings (loading.rs
    //    boot absorb + call_ret.rs push/pop)
    u64 cur[12];
    std::memset(cur, 0, sizeof(cur));
    {
      // boot empty entry: kernel mode, head = tail = block rollback tail
      Context boot_empty;
      boot_empty.is_kernel_mode = true;
      u64 enc[32];
      encode_context(boot_empty, bs.value, bs.value, enc);
      callstack_absorb(cur, enc);
    }
    std::vector<std::vector<u64>> sponge_stack;
    sponge_stack.push_back(std::vector<u64>(12, 0));
    for (u64 i = 0; i < N; ++i) {
      std::memcpy(O->cs_sponge + i * 12, cur, sizeof(cur));
      const CsEvent& ev = cs_events[i];
      if (ev.kind == 1) {
        sponge_stack.push_back(std::vector<u64>(cur, cur + 12));
        const Context& rec = event_recs[ev.rec];
        u64 head[4], tail[4], enc[32];
        resolve_ref(rec.head_ref, head);
        resolve_ref(Ref{2, rec.tail_slot}, tail);
        encode_context(rec, head, tail, enc);
        callstack_absorb(cur, enc);
      } else if (ev.kind == 2) {
        std::memcpy(O->ret_prev_cs_sponge + i * 12, sponge_stack.back().data(),
                    12 * sizeof(u64));
        std::memcpy(cur, sponge_stack.back().data(), sizeof(cur));
        sponge_stack.pop_back();
      }
    }
    std::memcpy(O->cs_sponge + N * 12, cur, sizeof(cur));
  }

  // ---- init + run ----

  int run() {
    N = P->limit;
    cs_events.resize(N);

    // block-level rollback tail slot shared by root frame + boot empty entry
    block_slot = new_tail_slot();

    // root bootloader context (state.py initial_bootloader_state parity)
    ctx = Context();
    ctx.this_addr = u256_from_u64(P->sp_bootloader_formal_address);
    ctx.code_address = u256_from_u64(P->sp_bootloader_formal_address);
    ctx.code_page = (u32)P->sp_bootloader_code_page;
    ctx.base_page = (u32)P->sp_bootloader_base_page;
    ctx.heap_upper_bound = P->sp_bootloader_max_memory;
    ctx.aux_heap_upper_bound = P->sp_bootloader_max_memory;
    ctx.pc = 0;
    ctx.exception_handler_loc = (u32)P->sp_initial_frame_eh;
    ctx.ergs_remaining = P->sp_vm_initial_frame_ergs;
    ctx.is_kernel_mode = true;
    ctx.tail_slot = block_slot;

    Context boot_empty;
    boot_empty.is_kernel_mode = true;
    boot_empty.tail_slot = block_slot;
    boot_empty.head_ref = Ref{2, block_slot};
    frames.clear();
    frames.push_back(boot_empty);
    cs_depth = 1;

    for (int i = 0; i < 15; ++i) {
      registers[i].v = U256{{P->initial_registers[i * 5], P->initial_registers[i * 5 + 1],
                             P->initial_registers[i * 5 + 2], P->initial_registers[i * 5 + 3]}};
      registers[i].ptr = P->initial_registers[i * 5 + 4] != 0;
    }
    timestamp = P->sp_starting_timestamp;
    page_counter = P->sp_starting_base_page;

    // bootloader code page
    memory.reserve(P->n_code_words + P->n_heap_init + 4 * N);
    for (u64 i = 0; i < P->n_code_words; ++i) {
      U256 w = {{P->code_words[i * 4], P->code_words[i * 4 + 1],
                 P->code_words[i * 4 + 2], P->code_words[i * 4 + 3]}};
      mem_write(P->sp_bootloader_code_page, i, w, false);
    }
    for (u64 i = 0; i < P->n_calldata; ++i) {
      U256 w = {{P->calldata_value[i * 4], P->calldata_value[i * 4 + 1],
                 P->calldata_value[i * 4 + 2], P->calldata_value[i * 4 + 3]}};
      mem_write(P->sp_bootloader_calldata_page, P->calldata_index[i], w, false);
    }
    for (u64 i = 0; i < P->n_storage; ++i) {
      StKey k;
      k.shard = P->storage_shard[i];
      k.addr = U256{{P->storage_addr[i * 4], P->storage_addr[i * 4 + 1],
                     P->storage_addr[i * 4 + 2], P->storage_addr[i * 4 + 3]}};
      k.key = U256{{P->storage_key[i * 4], P->storage_key[i * 4 + 1],
                    P->storage_key[i * 4 + 2], P->storage_key[i * 4 + 3]}};
      storage[k] = U256{{P->storage_value[i * 4], P->storage_value[i * 4 + 1],
                         P->storage_value[i * 4 + 2], P->storage_value[i * 4 + 3]}};
    }
    u64 off = 0;
    for (u64 i = 0; i < P->n_code_store; ++i) {
      U256 h = {{P->code_store_hash[i * 4], P->code_store_hash[i * 4 + 1],
                 P->code_store_hash[i * 4 + 2], P->code_store_hash[i * 4 + 3]}};
      code_store[h] = std::make_pair(P->code_store_off[i], P->code_store_len[i]);
      off += P->code_store_len[i];
    }
    (void)off;

    // ts=0 bootloader-heap writes (the VM's memory_queue_initial_state input)
    u64 boot_heap_page = P->sp_bootloader_base_page + 2;
    for (u64 i = 0; i < P->n_heap_init; ++i) {
      U256 v = {{P->heap_init_value[i * 4], P->heap_init_value[i * 4 + 1],
                 P->heap_init_value[i * 4 + 2], P->heap_init_value[i * 4 + 3]}};
      u64 idx = P->heap_init_index[i];
      mem_write(boot_heap_page, idx, v, false);
      u64 enc[8];
      encode_memory_query(0, (u32)boot_heap_page, (u32)idx, true, false, v, enc);
      full_absorb(mem_q_state, enc);
      mem_q_len += 1;
    }

    // boot decommittment push (scheduler mod.rs:152-172)
    {
      U256 bh = {{P->boot_code_hash[0], P->boot_code_hash[1],
                  P->boot_code_hash[2], P->boot_code_hash[3]}};
      u64 enc[8];
      encode_decommit_query(bh, (u32)P->sp_bootloader_code_page, true, 1, enc);
      full_absorb(dec_q_state, enc);
      dec_q_len += 1;
    }

    for (row = 0; row < (int)N; ++row) {
      snapshot_state(row);
      cycle();
      if (overflow) return 2;
    }
    snapshot_state((int)N);
    phase_b();
    *O->mem_tape_len = mem_len;
    *O->log_tape_len = log_len;
    *O->dec_tape_len = dec_len;
    *O->pc_calls_len = pcc_len;
    *O->pm_len = pm_len;
    return 0;
  }
};

extern "C" int eravm_run(const EravmParams* params, EravmOut* out) {
  if (!gl_is_initialized()) return 1;
  Eravm vm;
  vm.P = params;
  vm.O = out;
  return vm.run();
}
