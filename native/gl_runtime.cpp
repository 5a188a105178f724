// gl_runtime: native host runtime for zkevm_circuits_tpu.
//
// Role parity: the reference's witness-generation hot paths are native Rust
// (boojum's field arithmetic + the witness oracles the circuits pull from —
// SURVEY.md §2.4 item 5).  Here the intrinsically-sequential work — queue
// sponge chains — runs as scalar Goldilocks code on the host while the TPU
// does the row-parallel constraint evaluation.
//
// The Poseidon2 constants are NOT baked in: Python passes the Grain-LFSR
// tables at init so the instance stays single-sourced in utils/grain.py.
//
// Build: g++ -O3 -shared -fPIC -o libgl_runtime.so gl_runtime.cpp -fopenmp

#include <cstdint>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;

static const u64 GL_P = 0xFFFFFFFF00000001ULL;
static const u64 EPSILON = 0xFFFFFFFFULL;

static inline u64 gl_reduce128(u128 x) {
  // branchless (cmov-friendly) fast reduction: 2^64 == 2^32-1, 2^96 == -1.
  u64 lo = (u64)x;
  u64 hi = (u64)(x >> 64);
  u64 hi_hi = hi >> 32;
  u64 hi_lo = hi & EPSILON;
  u64 t0 = lo - hi_hi;
  t0 -= (lo < hi_hi) ? EPSILON : 0;
  u64 t1 = hi_lo * EPSILON;
  u64 t2 = t0 + t1;
  t2 += (t2 < t0) ? EPSILON : 0;
  t2 -= (t2 >= GL_P) ? GL_P : 0;
  return t2;
}

static inline u64 gl_mul(u64 a, u64 b) { return gl_reduce128((u128)a * b); }

static inline u64 gl_add(u64 a, u64 b) {
  u64 s = a + b;
  s -= (s < a || s >= GL_P) ? GL_P : 0;
  return s;
}

// ---------------------------------------------------------------------------
// Poseidon2 width-12 permutation (constants injected at init)
// ---------------------------------------------------------------------------

static u64 EXT_RC[8][12];
static u64 INT_RC[22];
static u64 MU_M1[12];
static int g_initialized = 0;

extern "C" void gl_poseidon2_init(const u64* ext_rc /*8*12*/,
                                  const u64* int_rc /*22*/,
                                  const u64* mu /*12*/) {
  for (int r = 0; r < 8; ++r)
    for (int i = 0; i < 12; ++i) EXT_RC[r][i] = ext_rc[r * 12 + i];
  for (int r = 0; r < 22; ++r) INT_RC[r] = int_rc[r];
  for (int i = 0; i < 12; ++i) MU_M1[i] = mu[i] >= 1 ? mu[i] - 1 : GL_P - 1 + mu[i];
  g_initialized = 1;
}

static inline u64 sbox7(u64 x) {
  u64 x2 = gl_mul(x, x);
  u64 x3 = gl_mul(x2, x);
  u64 x4 = gl_mul(x2, x2);
  return gl_mul(x3, x4);
}

static inline void m4(u64* v) {
  u64 t0 = gl_add(v[0], v[1]);
  u64 t1 = gl_add(v[2], v[3]);
  u64 t2 = gl_add(gl_add(v[1], v[1]), t1);
  u64 t3 = gl_add(gl_add(v[3], v[3]), t0);
  u64 t4 = gl_add(gl_add(gl_add(t1, t1), gl_add(t1, t1)), t3);
  u64 t5 = gl_add(gl_add(gl_add(t0, t0), gl_add(t0, t0)), t2);
  u64 t6 = gl_add(t3, t5);
  u64 t7 = gl_add(t2, t4);
  v[0] = t6;
  v[1] = t5;
  v[2] = t7;
  v[3] = t4;
}

static inline void ext_matrix(u64* s) {
  m4(s);
  m4(s + 4);
  m4(s + 8);
  for (int j = 0; j < 4; ++j) {
    u64 sum = gl_add(gl_add(s[j], s[4 + j]), s[8 + j]);
    s[j] = gl_add(s[j], sum);
    s[4 + j] = gl_add(s[4 + j], sum);
    s[8 + j] = gl_add(s[8 + j], sum);
  }
}

static inline void int_matrix(u64* s) {
  u64 total = 0;
  for (int i = 0; i < 12; ++i) total = gl_add(total, s[i]);
  for (int i = 0; i < 12; ++i) s[i] = gl_add(total, gl_mul(s[i], MU_M1[i]));
}

extern "C" void gl_poseidon2_permute(u64* state) {
  // keep the full state in locals so the compiler can register-allocate it
  u64 s[12];
  for (int i = 0; i < 12; ++i) s[i] = state[i];
  ext_matrix(s);
  for (int r = 0; r < 4; ++r) {
#pragma GCC unroll 12
    for (int i = 0; i < 12; ++i) s[i] = sbox7(gl_add(s[i], EXT_RC[r][i]));
    ext_matrix(s);
  }
  for (int r = 0; r < 22; ++r) {
    s[0] = sbox7(gl_add(s[0], INT_RC[r]));
    int_matrix(s);
  }
  for (int r = 4; r < 8; ++r) {
#pragma GCC unroll 12
    for (int i = 0; i < 12; ++i) s[i] = sbox7(gl_add(s[i], EXT_RC[r][i]));
    ext_matrix(s);
  }
  for (int i = 0; i < 12; ++i) state[i] = s[i];
}

// ---------------------------------------------------------------------------
// Queue sponge chains
// ---------------------------------------------------------------------------

// Full-state (W=12) chain: states_out has n+1 rows of 12; encodings n x 8.
extern "C" void gl_full_state_chain(u64* states_out, const u64* encodings,
                                    const uint8_t* execute, const u64* init,
                                    int64_t n) {
  u64 s[12];
  std::memcpy(s, init, sizeof(s));
  std::memcpy(states_out, s, sizeof(s));
  for (int64_t i = 0; i < n; ++i) {
    if (!execute || execute[i]) {
      std::memcpy(s, encodings + i * 8, 8 * sizeof(u64));
      gl_poseidon2_permute(s);
    }
    std::memcpy(states_out + (i + 1) * 12, s, sizeof(s));
  }
}

// Narrow (W=4) chain with encoding length L (zero-padded to rate multiples).
extern "C" void gl_narrow_chain(u64* tails_out, const u64* encodings,
                                const uint8_t* execute, const u64* init,
                                int64_t n, int64_t enc_len) {
  u64 tail[4];
  std::memcpy(tail, init, sizeof(tail));
  std::memcpy(tails_out, tail, sizeof(tail));
  int64_t chunks = (enc_len + 7) / 8;
  for (int64_t i = 0; i < n; ++i) {
    if (!execute || execute[i]) {
      u64 s[12];
      for (int j = 0; j < 8; ++j) s[j] = 0;
      std::memcpy(s + 8, tail, sizeof(tail));
      const u64* enc = encodings + i * enc_len;
      for (int64_t c = 0; c < chunks; ++c) {
        for (int j = 0; j < 8; ++j) {
          int64_t k = c * 8 + j;
          s[j] = k < enc_len ? enc[k] : 0;
        }
        gl_poseidon2_permute(s);
      }
      std::memcpy(tail, s, sizeof(tail));
    }
    std::memcpy(tails_out + (i + 1) * 4, tail, sizeof(tail));
  }
}

// K independent narrow (W=4) chains in parallel.
extern "C" void gl_narrow_chains(u64* tails_out /*K*(n+1)*4*/,
                                 const u64* encodings /*K*n*L*/,
                                 const uint8_t* execute /*K*n or null*/,
                                 const u64* init /*K*4*/, int64_t k, int64_t n,
                                 int64_t enc_len) {
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < k; ++q) {
    gl_narrow_chain(tails_out + q * (n + 1) * 4, encodings + q * n * enc_len,
                    execute ? execute + q * n : nullptr, init + q * 4, n, enc_len);
  }
}

// Batched independent permutations (for tests/benches).
extern "C" void gl_poseidon2_permute_batch(u64* states, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) gl_poseidon2_permute(states + i * 12);
}

// Strided variant: writes only every stride-th state (segment boundaries).
// states_out has n/stride + 1 rows of 12; n must be divisible by stride.
extern "C" void gl_full_state_chain_strided(u64* states_out, const u64* encodings,
                                            const uint8_t* execute, const u64* init,
                                            int64_t n, int64_t stride) {
  u64 s[12];
  std::memcpy(s, init, sizeof(s));
  std::memcpy(states_out, s, sizeof(s));
  int64_t out_idx = 1;
  for (int64_t i = 0; i < n; ++i) {
    if (!execute || execute[i]) {
      std::memcpy(s, encodings + i * 8, 8 * sizeof(u64));
      gl_poseidon2_permute(s);
    }
    if ((i + 1) % stride == 0) {
      std::memcpy(states_out + out_idx * 12, s, sizeof(s));
      ++out_idx;
    }
  }
}

// K strided chains in parallel.
extern "C" void gl_full_state_chains_strided(u64* states_out, const u64* encodings,
                                             const uint8_t* execute, const u64* init,
                                             int64_t k, int64_t n, int64_t stride) {
  int64_t rows = n / stride + 1;
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < k; ++q) {
    gl_full_state_chain_strided(states_out + q * rows * 12, encodings + q * n * 8,
                                execute ? execute + q * n : nullptr, init + q * 12,
                                n, stride);
  }
}

// K independent full-state chains in parallel (one OMP thread each).
extern "C" void gl_full_state_chains(u64* states_out /*K*(n+1)*12*/,
                                     const u64* encodings /*K*n*8*/,
                                     const uint8_t* execute /*K*n or null*/,
                                     const u64* init /*K*12*/, int64_t k,
                                     int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t q = 0; q < k; ++q) {
    gl_full_state_chain(states_out + q * (n + 1) * 12, encodings + q * n * 8,
                        execute ? execute + q * n : nullptr, init + q * 12, n);
  }
}

// ---------------------------------------------------------------------------
// Baseline measurement: the ram_permutation per-row work on ONE core
// ---------------------------------------------------------------------------
// The stand-in-Rust CPU baseline (BASELINE.md): per trace row the checker
// performs the two queue-sponge Poseidon2 permutations, the 2-repetition
// grand-product folds over the 9-term linearized encodings on both sides,
// the 96-bit (page,index,ts) sort comparison and the RW-semantics selects —
// the same per-row work the reference's check_if_satisfied does on CPU.
// Runs it sequentially over n rows; the caller times the call.
extern "C" void gl_ram_row_check_bench(const u64* encodings /*n*8*/, int64_t n,
                                       u64* out /*12*/) {
  u64 chain_u[12] = {0}, chain_s[12] = {0};
  u64 acc_u[2] = {1, 1}, acc_s[2] = {1, 1};
  u64 ch[2][9];
  for (int r = 0; r < 2; ++r)
    for (int j = 0; j < 9; ++j) ch[r][j] = 0x1234567 + 977 * r + 31 * j;
  u64 prev_key[3] = {0, 0, 0};
  u64 bad = 0;
  for (int64_t i = 0; i < n; ++i) {
    const u64* e = encodings + i * 8;
    // both queue sponges
    std::memcpy(chain_u, e, 8 * sizeof(u64));
    gl_poseidon2_permute(chain_u);
    std::memcpy(chain_s, e, 8 * sizeof(u64));
    gl_poseidon2_permute(chain_s);
    // grand-product folds, 2 repetitions x 2 sides
    for (int r = 0; r < 2; ++r) {
      u64 f = ch[r][8];
      for (int j = 0; j < 8; ++j) f = gl_add(f, gl_mul(ch[r][j], e[j]));
      acc_u[r] = gl_mul(acc_u[r], f);
      u64 g = gl_add(f, chain_s[0] & 0xFF);  // sorted-side factor differs
      acc_s[r] = gl_mul(acc_s[r], g);
    }
    // (page, index, timestamp) strict ascending comparison + RW selects
    u64 key[3] = {e[0] & 0xFFFFFFFF, (e[0] >> 32), e[1] & 0xFFFFFFFF};
    bool gt = key[0] > prev_key[0] ||
              (key[0] == prev_key[0] &&
               (key[1] > prev_key[1] ||
                (key[1] == prev_key[1] && key[2] > prev_key[2])));
    u64 same_cell = (key[0] == prev_key[0] && key[1] == prev_key[1]);
    u64 rw = (e[1] >> 32) & 1;
    bad += (!gt) & (!same_cell) & (~rw & 1);
    std::memcpy(prev_key, key, sizeof(prev_key));
  }
  for (int i = 0; i < 12; ++i)
    out[i] = gl_add(gl_add(chain_u[i], chain_s[i]),
                    gl_add(acc_u[i & 1], gl_add(acc_s[i & 1], bad)));
}

extern "C" int gl_is_initialized() { return g_initialized; }
