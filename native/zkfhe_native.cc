// Native verifier core: BN254 G1 Pippenger MSM + optimal-ate pairing.
//
// The verifier's two hot host steps (SURVEY.md §3.4 — halo2-axiom's
// verify_proof ends in one multi-scalar combination and a pairing
// check; reference wall-clock 299 ms, /root/reference/README.md:59)
// re-implemented in C++ so verification is not bounded by python int
// arithmetic. This is a LITERAL port of the in-repo python ground truth
// (zkfhe_tpu/backend/pairing.py, zkfhe_tpu/ops/curve.py host paths) —
// same tower (Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - (9+u)),
// Fq12 = Fq6[w]/(w^2 - v)), same Miller loop and final-exponentiation
// addition chain — and is cross-checked against it bit-for-bit by
// tests/test_native.py.
//
// No magic tables: everything (Montgomery parameters, Frobenius
// constants) is derived at zk_init() time from the modulus bytes the
// python side passes in.
//
// Build: g++ -O3 -shared -fPIC -o libzkfhe_native.so zkfhe_native.cc
// ABI: all field elements are 32-byte little-endian standard-form
// (non-Montgomery) integers; G1 points are x||y (64B) + infinity flag;
// G2 twist points are x0||x1||y0||y1 (128B) + infinity flag.

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef unsigned __int128 u128;

namespace {

// ---------------------------------------------------------------- Fq ----
struct Fq { u64 v[4]; };

static Fq QMOD;        // modulus limbs
static u64 N0INV;      // -Q^{-1} mod 2^64
static Fq R2;          // 2^512 mod Q (to-Montgomery factor)
static Fq ONE_M;       // Montgomery 1
static u64 QM2[4];     // Q - 2 (inversion exponent)

static inline bool fq_is_zero(const Fq &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

static inline bool fq_eq(const Fq &a, const Fq &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

static inline int fq_cmp_raw(const u64 a[4], const u64 b[4]) {
  for (int i = 3; i >= 0; i--) {
    if (a[i] < b[i]) return -1;
    if (a[i] > b[i]) return 1;
  }
  return 0;
}

static inline void raw_sub(u64 out[4], const u64 a[4], const u64 b[4]) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)a[i] - b[i] - borrow;
    out[i] = (u64)cur;
    borrow = (cur >> 64) & 1;  // two's-complement borrow
  }
}

static inline void fq_add(const Fq &a, const Fq &b, Fq &out) {
  u128 carry = 0;
  u64 t[4];
  for (int i = 0; i < 4; i++) {
    u128 cur = (u128)a.v[i] + b.v[i] + carry;
    t[i] = (u64)cur;
    carry = cur >> 64;
  }
  if (carry || fq_cmp_raw(t, QMOD.v) >= 0) raw_sub(out.v, t, QMOD.v);
  else memcpy(out.v, t, sizeof(t));
}

static inline void fq_sub(const Fq &a, const Fq &b, Fq &out) {
  if (fq_cmp_raw(a.v, b.v) >= 0) {
    raw_sub(out.v, a.v, b.v);
  } else {
    u64 t[4];
    raw_sub(t, b.v, a.v);
    raw_sub(out.v, QMOD.v, t);
  }
}

static inline void fq_neg(const Fq &a, Fq &out) {
  if (fq_is_zero(a)) { out = a; return; }
  raw_sub(out.v, QMOD.v, a.v);
}

// SOS Montgomery multiply: full 8-limb product, then 4 reduction steps.
static inline void fq_mul(const Fq &a, const Fq &b, Fq &out) {
  u64 r[8] = {0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)a.v[i] * b.v[j] + r[i + j] + carry;
      r[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    r[i + 4] = (u64)carry;
  }
  u64 extra = 0;  // carries beyond r[7]
  for (int i = 0; i < 4; i++) {
    u64 m = r[i] * N0INV;
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)m * QMOD.v[j] + r[i + j] + carry;
      r[i + j] = (u64)cur;
      carry = cur >> 64;
    }
    for (int j = i + 4; carry && j < 8; j++) {
      u128 cur = (u128)r[j] + carry;
      r[j] = (u64)cur;
      carry = cur >> 64;
    }
    extra += (u64)carry;  // only possible at j == 8
  }
  u64 t[4] = {r[4], r[5], r[6], r[7]};
  if (extra || fq_cmp_raw(t, QMOD.v) >= 0) raw_sub(out.v, t, QMOD.v);
  else memcpy(out.v, t, sizeof(t));
}

static inline void fq_sqr(const Fq &a, Fq &out) { fq_mul(a, a, out); }

static void fq_pow(const Fq &base, const u64 e[4], Fq &out) {
  Fq acc = ONE_M, b = base;
  for (int limb = 0; limb < 4; limb++) {
    u64 bits = e[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) fq_mul(acc, b, acc);
      fq_sqr(b, b);
      bits >>= 1;
    }
  }
  out = acc;
}

static inline void fq_inv(const Fq &a, Fq &out) { fq_pow(a, QM2, out); }

static void fq_from_bytes(const uint8_t *b, Fq &out) {  // standard -> mont
  Fq t;
  memcpy(t.v, b, 32);
  fq_mul(t, R2, out);
}

static void fq_to_bytes(const Fq &a, uint8_t *b) {  // mont -> standard
  Fq one_raw = {{1, 0, 0, 0}}, t;
  fq_mul(a, one_raw, t);  // Montgomery reduce
  memcpy(b, t.v, 32);
}

static Fq fq_small(u64 k) {  // small constant -> Montgomery
  Fq t = {{k, 0, 0, 0}}, out;
  fq_mul(t, R2, out);
  return out;
}

// --------------------------------------------------------------- Fq2 ----
// a0 + a1*u with u^2 = -1 (zkfhe_tpu/backend/pairing.py:26-84)
struct Fq2 { Fq a, b; };

static Fq2 F2_ZERO_, F2_ONE_;
static Fq NINE_M;

static inline void f2_add(const Fq2 &x, const Fq2 &y, Fq2 &o) {
  fq_add(x.a, y.a, o.a); fq_add(x.b, y.b, o.b);
}
static inline void f2_sub(const Fq2 &x, const Fq2 &y, Fq2 &o) {
  fq_sub(x.a, y.a, o.a); fq_sub(x.b, y.b, o.b);
}
static inline void f2_neg(const Fq2 &x, Fq2 &o) {
  fq_neg(x.a, o.a); fq_neg(x.b, o.b);
}
static inline bool f2_eq(const Fq2 &x, const Fq2 &y) {
  return fq_eq(x.a, y.a) && fq_eq(x.b, y.b);
}
static inline bool f2_is_zero(const Fq2 &x) {
  return fq_is_zero(x.a) && fq_is_zero(x.b);
}
static inline void f2_mul(const Fq2 &x, const Fq2 &y, Fq2 &o) {
  Fq t0, t1, t2, s1, s2;
  fq_mul(x.a, y.a, t0);
  fq_mul(x.b, y.b, t1);
  fq_add(x.a, x.b, s1);
  fq_add(y.a, y.b, s2);
  fq_mul(s1, s2, t2);
  fq_sub(t0, t1, o.a);
  fq_sub(t2, t0, t2);
  fq_sub(t2, t1, o.b);
}
static inline void f2_sqr(const Fq2 &x, Fq2 &o) {
  Fq t0, s, d;
  fq_mul(x.a, x.b, t0);
  fq_add(x.a, x.b, s);
  fq_sub(x.a, x.b, d);
  fq_mul(s, d, o.a);
  fq_add(t0, t0, o.b);
}
static inline void f2_conj(const Fq2 &x, Fq2 &o) {
  o.a = x.a; fq_neg(x.b, o.b);
}
static inline void f2_mul_fq(const Fq2 &x, const Fq &k, Fq2 &o) {
  fq_mul(x.a, k, o.a); fq_mul(x.b, k, o.b);
}
// a * (9 + u)
static inline void f2_mul_xi(const Fq2 &x, Fq2 &o) {
  Fq t0, t1;
  fq_mul(x.a, NINE_M, t0);
  fq_sub(t0, x.b, t0);
  fq_mul(x.b, NINE_M, t1);
  fq_add(x.a, t1, t1);
  o.a = t0; o.b = t1;
}
static inline void f2_inv(const Fq2 &x, Fq2 &o) {
  Fq n, t, ninv;
  fq_sqr(x.a, n);
  fq_sqr(x.b, t);
  fq_add(n, t, n);
  fq_inv(n, ninv);
  fq_mul(x.a, ninv, o.a);
  Fq nb;
  fq_neg(x.b, nb);
  fq_mul(nb, ninv, o.b);
}
static void f2_pow(const Fq2 &base, const u64 e[4], Fq2 &out) {
  Fq2 acc = F2_ONE_, b = base;
  for (int limb = 0; limb < 4; limb++) {
    u64 bits = e[limb];
    for (int i = 0; i < 64; i++) {
      if (bits & 1) f2_mul(acc, b, acc);
      f2_sqr(b, b);
      bits >>= 1;
    }
  }
  out = acc;
}

// --------------------------------------------------------------- Fq6 ----
// c0 + c1 v + c2 v^2, v^3 = xi (pairing.py:88-135)
struct Fq6 { Fq2 c0, c1, c2; };

static Fq6 F6_ZERO_, F6_ONE_;

static inline void f6_add(const Fq6 &x, const Fq6 &y, Fq6 &o) {
  f2_add(x.c0, y.c0, o.c0); f2_add(x.c1, y.c1, o.c1);
  f2_add(x.c2, y.c2, o.c2);
}
static inline void f6_sub(const Fq6 &x, const Fq6 &y, Fq6 &o) {
  f2_sub(x.c0, y.c0, o.c0); f2_sub(x.c1, y.c1, o.c1);
  f2_sub(x.c2, y.c2, o.c2);
}
static inline void f6_neg(const Fq6 &x, Fq6 &o) {
  f2_neg(x.c0, o.c0); f2_neg(x.c1, o.c1); f2_neg(x.c2, o.c2);
}
static inline bool f6_is_zero(const Fq6 &x) {
  return f2_is_zero(x.c0) && f2_is_zero(x.c1) && f2_is_zero(x.c2);
}
static void f6_mul(const Fq6 &x, const Fq6 &y, Fq6 &o) {
  Fq2 t0, t1, t2, s1, s2, tmp, r0, r1, r2;
  f2_mul(x.c0, y.c0, t0);
  f2_mul(x.c1, y.c1, t1);
  f2_mul(x.c2, y.c2, t2);
  // c0 = t0 + xi*((a1+a2)(b1+b2) - t1 - t2)
  f2_add(x.c1, x.c2, s1);
  f2_add(y.c1, y.c2, s2);
  f2_mul(s1, s2, tmp);
  f2_sub(tmp, t1, tmp);
  f2_sub(tmp, t2, tmp);
  f2_mul_xi(tmp, tmp);
  f2_add(t0, tmp, r0);
  // c1 = (a0+a1)(b0+b1) - t0 - t1 + xi*t2
  f2_add(x.c0, x.c1, s1);
  f2_add(y.c0, y.c1, s2);
  f2_mul(s1, s2, tmp);
  f2_sub(tmp, t0, tmp);
  f2_sub(tmp, t1, tmp);
  Fq2 xt2;
  f2_mul_xi(t2, xt2);
  f2_add(tmp, xt2, r1);
  // c2 = (a0+a2)(b0+b2) - t0 - t2 + t1
  f2_add(x.c0, x.c2, s1);
  f2_add(y.c0, y.c2, s2);
  f2_mul(s1, s2, tmp);
  f2_sub(tmp, t0, tmp);
  f2_sub(tmp, t2, tmp);
  f2_add(tmp, t1, r2);
  o.c0 = r0; o.c1 = r1; o.c2 = r2;
}
static inline void f6_sqr(const Fq6 &x, Fq6 &o) { f6_mul(x, x, o); }
static inline void f6_mul_v(const Fq6 &x, Fq6 &o) {
  Fq2 t;
  f2_mul_xi(x.c2, t);
  o.c2 = x.c1; o.c1 = x.c0; o.c0 = t;
}
static void f6_inv(const Fq6 &x, Fq6 &o) {
  Fq2 c0, c1, c2, t, tmp, tinv;
  f2_sqr(x.c0, c0);
  f2_mul(x.c1, x.c2, tmp);
  f2_mul_xi(tmp, tmp);
  f2_sub(c0, tmp, c0);
  f2_sqr(x.c2, tmp);
  f2_mul_xi(tmp, tmp);
  Fq2 t01;
  f2_mul(x.c0, x.c1, t01);
  f2_sub(tmp, t01, c1);
  f2_sqr(x.c1, tmp);
  Fq2 t02;
  f2_mul(x.c0, x.c2, t02);
  f2_sub(tmp, t02, c2);
  // t = xi*(a2*c1 + a1*c2) + a0*c0
  Fq2 u1, u2;
  f2_mul(x.c2, c1, u1);
  f2_mul(x.c1, c2, u2);
  f2_add(u1, u2, t);
  f2_mul_xi(t, t);
  f2_mul(x.c0, c0, tmp);
  f2_add(t, tmp, t);
  f2_inv(t, tinv);
  f2_mul(c0, tinv, o.c0);
  f2_mul(c1, tinv, o.c1);
  f2_mul(c2, tinv, o.c2);
}

// -------------------------------------------------------------- Fq12 ----
// a + b*w, w^2 = v (pairing.py:139-214)
struct Fq12 { Fq6 a, b; };

static Fq12 F12_ONE_;
static Fq2 G1C[6], G2C[6], G3C[6];  // Frobenius constants

static inline void f12_add(const Fq12 &x, const Fq12 &y, Fq12 &o) {
  f6_add(x.a, y.a, o.a); f6_add(x.b, y.b, o.b);
}
static inline void f12_sub(const Fq12 &x, const Fq12 &y, Fq12 &o) {
  f6_sub(x.a, y.a, o.a); f6_sub(x.b, y.b, o.b);
}
static inline bool f12_eq(const Fq12 &x, const Fq12 &y) {
  return f2_eq(x.a.c0, y.a.c0) && f2_eq(x.a.c1, y.a.c1) &&
         f2_eq(x.a.c2, y.a.c2) && f2_eq(x.b.c0, y.b.c0) &&
         f2_eq(x.b.c1, y.b.c1) && f2_eq(x.b.c2, y.b.c2);
}
static void f12_mul(const Fq12 &x, const Fq12 &y, Fq12 &o) {
  Fq6 t0, t1, s1, s2, tmp, r0, r1;
  f6_mul(x.a, y.a, t0);
  f6_mul(x.b, y.b, t1);
  f6_mul_v(t1, tmp);
  f6_add(t0, tmp, r0);
  f6_add(x.a, x.b, s1);
  f6_add(y.a, y.b, s2);
  f6_mul(s1, s2, tmp);
  f6_sub(tmp, t0, tmp);
  f6_sub(tmp, t1, r1);
  o.a = r0; o.b = r1;
}
static inline void f12_sqr(const Fq12 &x, Fq12 &o) { f12_mul(x, x, o); }
static inline void f12_conj(const Fq12 &x, Fq12 &o) {
  o.a = x.a; f6_neg(x.b, o.b);
}
static void f12_inv(const Fq12 &x, Fq12 &o) {
  Fq6 t, tmp;
  f6_sqr(x.a, t);
  f6_sqr(x.b, tmp);
  f6_mul_v(tmp, tmp);
  f6_sub(t, tmp, t);
  f6_inv(t, t);
  f6_mul(x.a, t, o.a);
  f6_mul(x.b, t, tmp);
  f6_neg(tmp, o.b);
}
static void f12_pow_u64(const Fq12 &base, u64 e, Fq12 &out) {
  Fq12 acc = F12_ONE_, b = base;
  while (e) {
    if (e & 1) f12_mul(acc, b, acc);
    f12_sqr(b, b);
    e >>= 1;
  }
  out = acc;
}
static inline void frob_f2(const Fq2 &x, int power, Fq2 &o) {
  if (power % 2 == 0) o = x;
  else f2_conj(x, o);
}
static void f12_frobenius(const Fq12 &x, int power, Fq12 &o) {
  const Fq2 *consts = power == 1 ? G1C : (power == 2 ? G2C : G3C);
  Fq2 e0, e1, e2, e3, e4, e5, t;
  frob_f2(x.a.c0, power, e0);
  frob_f2(x.a.c1, power, t); f2_mul(t, consts[2], e1);
  frob_f2(x.a.c2, power, t); f2_mul(t, consts[4], e2);
  frob_f2(x.b.c0, power, t); f2_mul(t, consts[1], e3);
  frob_f2(x.b.c1, power, t); f2_mul(t, consts[3], e4);
  frob_f2(x.b.c2, power, t); f2_mul(t, consts[5], e5);
  o.a.c0 = e0; o.a.c1 = e1; o.a.c2 = e2;
  o.b.c0 = e3; o.b.c1 = e4; o.b.c2 = e5;
}

// ------------------------------------------------------------ G1 ops ----
struct G1J { Fq X, Y, Z; };  // Z == 0 -> infinity

static inline bool g1_is_inf(const G1J &p) { return fq_is_zero(p.Z); }

static void g1_double(const G1J &p, G1J &o) {
  if (g1_is_inf(p)) { o = p; return; }
  Fq A, B, C, D, E, F_, t;
  fq_sqr(p.X, A);
  fq_sqr(p.Y, B);
  fq_sqr(B, C);
  // D = 2*((X+B)^2 - A - C)
  fq_add(p.X, B, t);
  fq_sqr(t, t);
  fq_sub(t, A, t);
  fq_sub(t, C, t);
  fq_add(t, t, D);
  // E = 3A, F = E^2
  fq_add(A, A, E);
  fq_add(E, A, E);
  fq_sqr(E, F_);
  // X3 = F - 2D
  Fq X3, Y3, Z3;
  fq_sub(F_, D, X3);
  fq_sub(X3, D, X3);
  // Y3 = E*(D - X3) - 8C
  fq_sub(D, X3, t);
  fq_mul(E, t, Y3);
  Fq c8;
  fq_add(C, C, c8); fq_add(c8, c8, c8); fq_add(c8, c8, c8);
  fq_sub(Y3, c8, Y3);
  // Z3 = 2*Y*Z
  fq_mul(p.Y, p.Z, Z3);
  fq_add(Z3, Z3, Z3);
  o.X = X3; o.Y = Y3; o.Z = Z3;
}

static void g1_add(const G1J &p, const G1J &q, G1J &o) {
  if (g1_is_inf(p)) { o = q; return; }
  if (g1_is_inf(q)) { o = p; return; }
  Fq Z1Z1, Z2Z2, U1, U2, S1, S2, t;
  fq_sqr(p.Z, Z1Z1);
  fq_sqr(q.Z, Z2Z2);
  fq_mul(p.X, Z2Z2, U1);
  fq_mul(q.X, Z1Z1, U2);
  fq_mul(q.Z, Z2Z2, t);
  fq_mul(p.Y, t, S1);
  fq_mul(p.Z, Z1Z1, t);
  fq_mul(q.Y, t, S2);
  if (fq_eq(U1, U2)) {
    if (fq_eq(S1, S2)) { g1_double(p, o); return; }
    o.X = ONE_M; o.Y = ONE_M; memset(o.Z.v, 0, 32);  // infinity
    return;
  }
  Fq H, I, J, R_, V, X3, Y3, Z3;
  fq_sub(U2, U1, H);
  fq_add(H, H, t);
  fq_sqr(t, I);
  fq_mul(H, I, J);
  fq_sub(S2, S1, R_);
  fq_add(R_, R_, R_);
  fq_mul(U1, I, V);
  // X3 = R^2 - J - 2V
  fq_sqr(R_, X3);
  fq_sub(X3, J, X3);
  fq_sub(X3, V, X3);
  fq_sub(X3, V, X3);
  // Y3 = R*(V - X3) - 2*S1*J
  fq_sub(V, X3, t);
  fq_mul(R_, t, Y3);
  Fq s1j;
  fq_mul(S1, J, s1j);
  fq_add(s1j, s1j, s1j);
  fq_sub(Y3, s1j, Y3);
  // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
  fq_add(p.Z, q.Z, t);
  fq_sqr(t, t);
  fq_sub(t, Z1Z1, t);
  fq_sub(t, Z2Z2, t);
  fq_mul(t, H, Z3);
  o.X = X3; o.Y = Y3; o.Z = Z3;
}

// ------------------------------------------------------ pairing core ----
struct G2A { Fq2 x, y; bool inf; };      // twist affine
struct E12 { Fq12 x, y; bool inf; };     // E(Fq12) affine

static const u64 BN_X_ = 4965661367192848881ull;

static void psi(const G2A &q, E12 &o) {
  // (x*w^2, y*w^3): multiplication by w^2 shifts the Fq6 "v" basis; do
  // it directly: x*w^2 = (0 + x v + 0 v^2) + 0*w ... matches python
  // f12_mul(embed(x), W2) where W2 = v. Using structure: embed(x)*v has
  // a = (0, x, 0). w^3 = v*w: embed(y)*w^3 has b = (0, y, 0).
  memset(&o.x, 0, sizeof(o.x));
  memset(&o.y, 0, sizeof(o.y));
  o.x.a.c1 = q.x;
  o.y.b.c1 = q.y;
  o.inf = q.inf;
}

static void e12_add(const E12 &p, const E12 &q, E12 &o) {
  if (p.inf) { o = q; return; }
  if (q.inf) { o = p; return; }
  Fq12 lam, t, num, den;
  if (f12_eq(p.x, q.x)) {
    f12_add(p.y, q.y, t);
    if (f6_is_zero(t.a) && f6_is_zero(t.b)) {
      o.inf = true;
      o.x = F12_ONE_; o.y = F12_ONE_;
      return;
    }
    // lam = 3 x^2 / (2 y)
    Fq12 x2;
    f12_sqr(p.x, x2);
    f12_add(x2, x2, num);
    f12_add(num, x2, num);
    f12_add(p.y, p.y, den);
    f12_inv(den, den);
    f12_mul(num, den, lam);
  } else {
    f12_sub(q.y, p.y, num);
    f12_sub(q.x, p.x, den);
    f12_inv(den, den);
    f12_mul(num, den, lam);
  }
  Fq12 x3, y3;
  f12_sqr(lam, x3);
  f12_sub(x3, p.x, x3);
  f12_sub(x3, q.x, x3);
  f12_sub(p.x, x3, t);
  f12_mul(lam, t, y3);
  f12_sub(y3, p.y, y3);
  o.x = x3; o.y = y3; o.inf = false;
}

// line through t, q evaluated at the (embedded) G1 point (xp, yp)
static void linefunc(const E12 &t, const E12 &q, const Fq12 &xp,
                     const Fq12 &yp, Fq12 &o) {
  Fq12 lam, num, den, tmp;
  if (!f12_eq(t.x, q.x)) {
    f12_sub(q.y, t.y, num);
    f12_sub(q.x, t.x, den);
    f12_inv(den, den);
    f12_mul(num, den, lam);
  } else if (f12_eq(t.y, q.y)) {
    Fq12 x2;
    f12_sqr(t.x, x2);
    f12_add(x2, x2, num);
    f12_add(num, x2, num);
    f12_add(t.y, t.y, den);
    f12_inv(den, den);
    f12_mul(num, den, lam);
  } else {
    f12_sub(xp, t.x, o);
    return;
  }
  f12_sub(xp, t.x, tmp);
  f12_mul(lam, tmp, o);
  f12_sub(yp, t.y, tmp);
  f12_sub(o, tmp, o);
}

static void miller_loop(const Fq &px, const Fq &py, bool pinf,
                        const G2A &q2, Fq12 &f) {
  f = F12_ONE_;
  if (pinf || q2.inf) return;
  Fq12 xp, yp;
  memset(&xp, 0, sizeof(xp));
  memset(&yp, 0, sizeof(yp));
  xp.a.c0.a = px;
  yp.a.c0.a = py;
  E12 Qe, T;
  psi(q2, Qe);
  T = Qe;
  // ATE_LOOP = 6x+2 (65 bits)
  u128 ate = (u128)6 * BN_X_ + 2;
  int nbits = 0;
  { u128 t = ate; while (t) { nbits++; t >>= 1; } }
  Fq12 l;
  for (int i = nbits - 2; i >= 0; i--) {
    f12_sqr(f, f);
    linefunc(T, T, xp, yp, l);
    f12_mul(f, l, f);
    e12_add(T, T, T);
    if ((ate >> i) & 1) {
      linefunc(T, Qe, xp, yp, l);
      f12_mul(f, l, f);
      e12_add(T, Qe, T);
    }
  }
  // Frobenius corrections Q1 = pi(Q), Q2 = -pi^2(Q)
  E12 Q1, Q2;
  f12_frobenius(Qe.x, 1, Q1.x);
  f12_frobenius(Qe.y, 1, Q1.y);
  Q1.inf = false;
  f12_frobenius(Q1.x, 1, Q2.x);
  Fq12 t2;
  f12_frobenius(Q1.y, 1, t2);
  Fq12 zero12;
  memset(&zero12, 0, sizeof(zero12));
  f12_sub(zero12, t2, Q2.y);
  Q2.inf = false;
  linefunc(T, Q1, xp, yp, l);
  f12_mul(f, l, f);
  e12_add(T, Q1, T);
  linefunc(T, Q2, xp, yp, l);
  f12_mul(f, l, f);
}

static void final_exponentiation(const Fq12 &f, Fq12 &out) {
  // easy part: f^((q^6-1)(q^2+1))   (pairing.py:372-377)
  Fq12 m, t;
  f12_inv(f, t);
  Fq12 c;
  f12_conj(f, c);
  f12_mul(c, t, m);
  f12_frobenius(m, 2, t);
  f12_mul(t, m, m);
  // hard part (Devegili addition chain; unitary: inv = conj)
  Fq12 fp, fp2, fp3, fu, fu2, fu3, y0, y1, y2, y3, y4, y5, y6;
  Fq12 fu2p, fu3p, t0, t1;
  f12_frobenius(m, 1, fp);
  f12_frobenius(m, 2, fp2);
  f12_frobenius(m, 3, fp3);
  f12_pow_u64(m, BN_X_, fu);
  f12_pow_u64(fu, BN_X_, fu2);
  f12_pow_u64(fu2, BN_X_, fu3);
  f12_frobenius(fu, 1, t);
  f12_conj(t, y3);
  f12_frobenius(fu2, 1, fu2p);
  f12_frobenius(fu3, 1, fu3p);
  f12_frobenius(fu2, 2, y2);
  f12_mul(fp, fp2, y0);
  f12_mul(y0, fp3, y0);
  f12_conj(m, y1);
  f12_conj(fu2, y5);
  f12_mul(fu, fu2p, t);
  f12_conj(t, y4);
  f12_mul(fu3, fu3p, t);
  f12_conj(t, y6);
  f12_sqr(y6, t0);
  f12_mul(t0, y4, t0);
  f12_mul(t0, y5, t0);
  f12_mul(y3, y5, t1);
  f12_mul(t1, t0, t1);
  f12_mul(t0, y2, t0);
  f12_sqr(t1, t1);
  f12_mul(t1, t0, t1);
  f12_sqr(t1, t1);
  f12_mul(t1, y1, t0);
  f12_mul(t1, y0, t1);
  f12_sqr(t0, t0);
  f12_mul(t1, t0, out);
}

}  // namespace

// ----------------------------------------------------------- C ABI ------
extern "C" {

// q: 32B LE modulus. Everything else is derived here.
int zk_init(const uint8_t q[32]) {
  memcpy(QMOD.v, q, 32);
  // N0INV = -Q^{-1} mod 2^64 (Newton)
  u64 inv = 1;
  for (int i = 0; i < 6; i++) inv *= 2 - QMOD.v[0] * inv;
  N0INV = (u64)0 - inv;
  // R2 = 2^512 mod Q by 512 modular doublings of 1
  Fq r = {{1, 0, 0, 0}};
  // bring 1 below Q (Q > 1 always) then double
  for (int i = 0; i < 512; i++) fq_add(r, r, r);  // add handles reduction
  R2 = r;
  ONE_M = fq_small(1);
  // Q - 2
  u64 two[4] = {2, 0, 0, 0};
  raw_sub(QM2, QMOD.v, two);
  NINE_M = fq_small(9);
  memset(&F2_ZERO_, 0, sizeof(F2_ZERO_));
  F2_ONE_.a = ONE_M;
  memset(&F2_ONE_.b, 0, 32);
  memset(&F6_ZERO_, 0, sizeof(F6_ZERO_));
  memset(&F6_ONE_, 0, sizeof(F6_ONE_));
  F6_ONE_.c0 = F2_ONE_;
  memset(&F12_ONE_, 0, sizeof(F12_ONE_));
  F12_ONE_.a = F6_ONE_;
  // Frobenius constants: G1C[i] = xi^((q-1)*i/6); G2C[i] = G1C[i] *
  // conj(G1C[i]); G3C[i] = G1C[i]*G2C[i]  (pairing.py:191-193)
  // exponent e = (q-1)/6 (exact for BN254), then e*i
  u64 qm1[4];
  u64 one[4] = {1, 0, 0, 0};
  raw_sub(qm1, QMOD.v, one);
  // divide by 6 (schoolbook, top down)
  u64 e6[4];
  {
    u128 rem = 0;
    for (int i = 3; i >= 0; i--) {
      u128 cur = (rem << 64) | qm1[i];
      e6[i] = (u64)(cur / 6);
      rem = cur % 6;
    }
    if (rem != 0) return -1;  // q != 1 mod 6: not a BN modulus
  }
  Fq2 xi;
  xi.a = NINE_M;
  xi.b = ONE_M;
  for (int i = 0; i < 6; i++) {
    // exponent e6 * i (i < 6; product < q fits 4 limbs + tiny carry)
    u64 ei[4] = {0, 0, 0, 0};
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 cur = (u128)e6[j] * i + carry;
      ei[j] = (u64)cur;
      carry = cur >> 64;
    }
    if (carry) return -2;
    f2_pow(xi, ei, G1C[i]);
    Fq2 cj;
    f2_conj(G1C[i], cj);
    f2_mul(G1C[i], cj, G2C[i]);
    f2_mul(G1C[i], G2C[i], G3C[i]);
  }
  return 0;
}

// MSM: pts = n*(x||y) 64B standard LE; infs = n flags; scalars = n*32B LE
// (already reduced mod r). out = x||y (64B standard LE) + inf flag byte.
int zk_msm(const uint8_t *pts, const uint8_t *infs, const uint8_t *scalars,
           u64 n, uint8_t out[65]) {
  // window size: balance buckets (2^c) vs windows (256/c)
  int c = n < 8 ? 3 : (n < 64 ? 5 : (n < 1024 ? 7 : 9));
  int windows = (256 + c - 1) / c;
  int nbuckets = 1 << c;
  G1J *buckets = new G1J[nbuckets];
  G1J res;
  res.X = ONE_M; res.Y = ONE_M; memset(res.Z.v, 0, 32);
  // convert points once
  G1J *P = new G1J[n];
  for (u64 i = 0; i < n; i++) {
    if (infs[i]) {
      P[i].X = ONE_M; P[i].Y = ONE_M; memset(P[i].Z.v, 0, 32);
    } else {
      fq_from_bytes(pts + 64 * i, P[i].X);
      fq_from_bytes(pts + 64 * i + 32, P[i].Y);
      P[i].Z = ONE_M;
    }
  }
  for (int w = windows - 1; w >= 0; w--) {
    for (int d = 0; d < c; d++) g1_double(res, res);
    for (int b = 0; b < nbuckets; b++) {
      buckets[b].X = ONE_M; buckets[b].Y = ONE_M;
      memset(buckets[b].Z.v, 0, 32);
    }
    int bit0 = w * c;
    for (u64 i = 0; i < n; i++) {
      // extract bits [bit0, bit0+c) of scalar i (LE bytes)
      u64 digit = 0;
      for (int b = 0; b < c; b++) {
        int bit = bit0 + b;
        if (bit >= 256) break;
        digit |= (u64)((scalars[32 * i + bit / 8] >> (bit % 8)) & 1) << b;
      }
      if (digit) g1_add(buckets[digit], P[i], buckets[digit]);
    }
    G1J acc = buckets[0], S = buckets[0];
    memset(acc.Z.v, 0, 32); acc.X = ONE_M; acc.Y = ONE_M;
    memset(S.Z.v, 0, 32); S.X = ONE_M; S.Y = ONE_M;
    for (int b = nbuckets - 1; b >= 1; b--) {
      g1_add(acc, buckets[b], acc);
      g1_add(S, acc, S);
    }
    g1_add(res, S, res);
  }
  delete[] buckets;
  delete[] P;
  if (g1_is_inf(res)) {
    memset(out, 0, 64);
    out[64] = 1;
    return 0;
  }
  // to affine: x = X/Z^2, y = Y/Z^3
  Fq zinv, zi2, zi3, ax, ay;
  fq_inv(res.Z, zinv);
  fq_sqr(zinv, zi2);
  fq_mul(zi2, zinv, zi3);
  fq_mul(res.X, zi2, ax);
  fq_mul(res.Y, zi3, ay);
  fq_to_bytes(ax, out);
  fq_to_bytes(ay, out + 32);
  out[64] = 0;
  return 0;
}

// prod_i e(P_i, Q_i) == 1 ?  g1: k*(x||y), g2: k*(x0||x1||y0||y1).
int zk_pairing_check(const uint8_t *g1, const uint8_t *g1inf,
                     const uint8_t *g2, const uint8_t *g2inf, u64 k) {
  Fq12 acc = F12_ONE_, f;
  for (u64 i = 0; i < k; i++) {
    Fq px, py;
    bool pinf = g1inf[i] != 0;
    if (!pinf) {
      fq_from_bytes(g1 + 64 * i, px);
      fq_from_bytes(g1 + 64 * i + 32, py);
    } else {
      px = ONE_M; py = ONE_M;
    }
    G2A q;
    q.inf = g2inf[i] != 0;
    if (!q.inf) {
      fq_from_bytes(g2 + 128 * i, q.x.a);
      fq_from_bytes(g2 + 128 * i + 32, q.x.b);
      fq_from_bytes(g2 + 128 * i + 64, q.y.a);
      fq_from_bytes(g2 + 128 * i + 96, q.y.b);
    }
    miller_loop(px, py, pinf, q, f);
    f12_mul(acc, f, acc);
  }
  Fq12 out;
  final_exponentiation(acc, out);
  return f12_eq(out, F12_ONE_) ? 1 : 0;
}

}  // extern "C"
