/* BN254 G1 host arithmetic: Montgomery Fq, Jacobian points, Pippenger MSM.
 *
 * Native backend for quill_tpu/ec/curve.py's host paths (verifier batch
 * MSMs, CRS trusted setup, batch normalization) -- the role arkworks'
 * compiled field/curve code plays for the reference
 * (/root/reference/pcs/src/kzg.rs:61-73).  Device (TPU) MSMs live in
 * quill_tpu/ec/msm3.py; this file is the HOST-side substrate only.
 *
 * ABI (all buffers little-endian 4x uint64 canonical, NOT Montgomery):
 *   quill_g1_msm(pts[8n], inf[n], n, scalars[4n], out[12])
 *   quill_g1_batch_normalize(jacs[12n], n, out[8n], out_inf[n])
 *   quill_g1_scalar_mul_many(base[8], base_inf, scalars[4n], n, out[12n])
 *   quill_g1_msm_jac(jacs[12n], n, scalars[4n], out[12])
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef unsigned __int128 u128;

typedef struct { uint64_t v[4]; } fq;

static const fq FQ_P = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const uint64_t FQ_INV = 0x87d20782e4866389ULL; /* -p^-1 mod 2^64 */
static const fq FQ_R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                          0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const fq FQ_ONE_M = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                             0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};

static int fq_is_zero(const fq *a) {
  return (a->v[0] | a->v[1] | a->v[2] | a->v[3]) == 0;
}

static int fq_geq_p(const fq *a) {
  for (int i = 3; i >= 0; i--) {
    if (a->v[i] > FQ_P.v[i]) return 1;
    if (a->v[i] < FQ_P.v[i]) return 0;
  }
  return 1;
}

static void fq_sub_p(fq *a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a->v[i] - FQ_P.v[i] - borrow;
    a->v[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
}

static void fq_add(fq *r, const fq *a, const fq *b) {
  u128 carry = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a->v[i] + b->v[i] + carry;
    r->v[i] = (uint64_t)s;
    carry = s >> 64;
  }
  if (carry || fq_geq_p(r)) fq_sub_p(r);
}

static void fq_sub(fq *r, const fq *a, const fq *b) {
  u128 borrow = 0;
  fq t;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a->v[i] - b->v[i] - borrow;
    t.v[i] = (uint64_t)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
      u128 s = (u128)t.v[i] + FQ_P.v[i] + carry;
      t.v[i] = (uint64_t)s;
      carry = s >> 64;
    }
  }
  *r = t;
}

/* CIOS Montgomery multiplication. */
static void fq_mul(fq *r, const fq *a, const fq *b) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 carry = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)t[j] + (u128)a->v[i] * b->v[j] + carry;
      t[j] = (uint64_t)s;
      carry = s >> 64;
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (uint64_t)s;
    t[5] = (uint64_t)(s >> 64);

    uint64_t m = t[0] * FQ_INV;
    carry = ((u128)t[0] + (u128)m * FQ_P.v[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 s2 = (u128)t[j] + (u128)m * FQ_P.v[j] + carry;
      t[j - 1] = (uint64_t)s2;
      carry = s2 >> 64;
    }
    s = (u128)t[4] + carry;
    t[3] = (uint64_t)s;
    t[4] = t[5] + (uint64_t)(s >> 64);
  }
  memcpy(r->v, t, 32);
  if (t[4] || fq_geq_p(r)) fq_sub_p(r);
}

static void fq_sqr(fq *r, const fq *a) { fq_mul(r, a, a); }

static void fq_to_mont(fq *r, const fq *a) { fq_mul(r, a, &FQ_R2); }

static void fq_from_mont(fq *r, const fq *a) {
  fq one = {{1, 0, 0, 0}};
  fq_mul(r, a, &one);
}

/* a^(p-2) in Montgomery form (Fermat inversion). */
static void fq_inv(fq *r, const fq *a) {
  static const fq PM2 = {{0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                          0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
  fq result = FQ_ONE_M, base = *a;
  for (int w = 0; w < 4; w++) {
    uint64_t e = PM2.v[w];
    for (int b = 0; b < 64; b++) {
      if (e & 1) fq_mul(&result, &result, &base);
      fq_sqr(&base, &base);
      e >>= 1;
    }
  }
  *r = result;
}

/* ---- G1 Jacobian (Montgomery coordinates; Z == 0 means identity) ---- */

typedef struct { fq X, Y, Z; } g1;

static void g1_set_identity(g1 *p) {
  p->X = FQ_ONE_M;
  p->Y = FQ_ONE_M;
  memset(p->Z.v, 0, 32);
}

static int g1_is_identity(const g1 *p) { return fq_is_zero(&p->Z); }

/* dbl-2009-l, matching curve.py Jacobian.double. */
static void g1_double(g1 *r, const g1 *p) {
  if (g1_is_identity(p)) { *r = *p; return; }
  fq A, B, C, D, E, F, t, X3, Y3, Z3;
  fq_sqr(&A, &p->X);
  fq_sqr(&B, &p->Y);
  fq_sqr(&C, &B);
  fq_add(&t, &p->X, &B);
  fq_sqr(&t, &t);
  fq_sub(&t, &t, &A);
  fq_sub(&t, &t, &C);
  fq_add(&D, &t, &t);
  fq_add(&E, &A, &A);
  fq_add(&E, &E, &A);
  fq_sqr(&F, &E);
  fq_add(&t, &D, &D);
  fq_sub(&X3, &F, &t);
  fq_sub(&t, &D, &X3);
  fq_mul(&Y3, &E, &t);
  fq_add(&C, &C, &C); fq_add(&C, &C, &C); fq_add(&C, &C, &C);
  fq_sub(&Y3, &Y3, &C);
  fq_mul(&Z3, &p->Y, &p->Z);
  fq_add(&Z3, &Z3, &Z3);
  r->X = X3; r->Y = Y3; r->Z = Z3;
}

static void g1_add(g1 *r, const g1 *p, const g1 *q) {
  if (g1_is_identity(p)) { *r = *q; return; }
  if (g1_is_identity(q)) { *r = *p; return; }
  fq Z1Z1, Z2Z2, U1, U2, S1, S2, H, I, J, rr, V, t, X3, Y3, Z3;
  fq_sqr(&Z1Z1, &p->Z);
  fq_sqr(&Z2Z2, &q->Z);
  fq_mul(&U1, &p->X, &Z2Z2);
  fq_mul(&U2, &q->X, &Z1Z1);
  fq_mul(&t, &p->Y, &q->Z);
  fq_mul(&S1, &t, &Z2Z2);
  fq_mul(&t, &q->Y, &p->Z);
  fq_mul(&S2, &t, &Z1Z1);
  if (memcmp(U1.v, U2.v, 32) == 0) {
    if (memcmp(S1.v, S2.v, 32) == 0) { g1_double(r, p); return; }
    g1_set_identity(r);
    return;
  }
  fq_sub(&H, &U2, &U1);
  fq_add(&I, &H, &H);
  fq_sqr(&I, &I);
  fq_mul(&J, &H, &I);
  fq_sub(&rr, &S2, &S1);
  fq_add(&rr, &rr, &rr);
  fq_mul(&V, &U1, &I);
  fq_sqr(&X3, &rr);
  fq_sub(&X3, &X3, &J);
  fq_add(&t, &V, &V);
  fq_sub(&X3, &X3, &t);
  fq_sub(&t, &V, &X3);
  fq_mul(&Y3, &rr, &t);
  fq_mul(&t, &S1, &J);
  fq_add(&t, &t, &t);
  fq_sub(&Y3, &Y3, &t);
  fq_add(&Z3, &p->Z, &q->Z);
  fq_sqr(&Z3, &Z3);
  fq_sub(&Z3, &Z3, &Z1Z1);
  fq_sub(&Z3, &Z3, &Z2Z2);
  fq_mul(&Z3, &Z3, &H);
  r->X = X3; r->Y = Y3; r->Z = Z3;
}

/* Mixed addition, q affine (Montgomery coords), madd-2007-bl. */
static void g1_add_affine(g1 *r, const g1 *p, const fq *qx, const fq *qy) {
  if (g1_is_identity(p)) {
    r->X = *qx; r->Y = *qy; r->Z = FQ_ONE_M;
    return;
  }
  fq Z1Z1, U2, S2, H, HH, I, J, rr, V, t, X3, Y3, Z3;
  fq_sqr(&Z1Z1, &p->Z);
  fq_mul(&U2, qx, &Z1Z1);
  fq_mul(&t, qy, &p->Z);
  fq_mul(&S2, &t, &Z1Z1);
  if (memcmp(p->X.v, U2.v, 32) == 0) {
    if (memcmp(p->Y.v, S2.v, 32) == 0) { g1_double(r, p); return; }
    g1_set_identity(r);
    return;
  }
  fq_sub(&H, &U2, &p->X);
  fq_sqr(&HH, &H);
  fq_add(&I, &HH, &HH);
  fq_add(&I, &I, &I);
  fq_mul(&J, &H, &I);
  fq_sub(&rr, &S2, &p->Y);
  fq_add(&rr, &rr, &rr);
  fq_mul(&V, &p->X, &I);
  fq_sqr(&X3, &rr);
  fq_sub(&X3, &X3, &J);
  fq_add(&t, &V, &V);
  fq_sub(&X3, &X3, &t);
  fq_sub(&t, &V, &X3);
  fq_mul(&Y3, &rr, &t);
  fq_mul(&t, &p->Y, &J);
  fq_add(&t, &t, &t);
  fq_sub(&Y3, &Y3, &t);
  fq_add(&Z3, &p->Z, &H);
  fq_sqr(&Z3, &Z3);
  fq_sub(&Z3, &Z3, &Z1Z1);
  fq_sub(&Z3, &Z3, &HH);
  r->X = X3; r->Y = Y3; r->Z = Z3;
}

/* double-and-add over a 256-bit scalar (canonical LE words). */
static void g1_scalar_mul(g1 *r, const g1 *p, const uint64_t s[4]) {
  g1 acc, base = *p;
  g1_set_identity(&acc);
  int top = 3;
  while (top >= 0 && s[top] == 0) top--;
  for (int w = 0; w <= top; w++) {
    uint64_t e = s[w];
    int nbits = (w == top) ? 64 - __builtin_clzll(e | 1) : 64;
    for (int b = 0; b < nbits; b++) {
      if (e & 1) g1_add(&acc, &acc, &base);
      g1_double(&base, &base);
      e >>= 1;
    }
  }
  *r = acc;
}

/* ---- canonical <-> internal helpers ---- */

static void load_affine_mont(fq *x, fq *y, const uint64_t *pts, size_t i) {
  fq cx, cy;
  memcpy(cx.v, pts + 8 * i, 32);
  memcpy(cy.v, pts + 8 * i + 4, 32);
  fq_to_mont(x, &cx);
  fq_to_mont(y, &cy);
}

static void store_jac_canon(uint64_t *out, const g1 *p) {
  fq c;
  fq_from_mont(&c, &p->X); memcpy(out, c.v, 32);
  fq_from_mont(&c, &p->Y); memcpy(out + 4, c.v, 32);
  fq_from_mont(&c, &p->Z); memcpy(out + 8, c.v, 32);
}

static void load_jac_mont(g1 *p, const uint64_t *in) {
  fq c;
  memcpy(c.v, in, 32); fq_to_mont(&p->X, &c);
  memcpy(c.v, in + 4, 32); fq_to_mont(&p->Y, &c);
  memcpy(c.v, in + 8, 32); fq_to_mont(&p->Z, &c);
}

/* ---- exported entry points ---- */

/* Pippenger MSM over affine bases; scalars canonical 4x u64 (mod r). */
void quill_g1_msm(const uint64_t *pts, const uint8_t *inf, size_t n,
                  const uint64_t *scalars, uint64_t *out) {
  if (n == 0) { g1 id; g1_set_identity(&id); store_jac_canon(out, &id); return; }

  int lg = 0;
  { size_t m = n; while (m >>= 1) lg++; }
  int c = (n < 32) ? 3 : (int)(lg * 0.693) + 2;  /* ~ln(n)+2, arkworks-style */
  if (c > 16) c = 16;
  int num_windows = (254 + c - 1) / c;
  size_t nbuckets = ((size_t)1 << c) - 1;

  fq *mx = malloc(n * sizeof(fq));
  fq *my = malloc(n * sizeof(fq));
  g1 *buckets = malloc(nbuckets * sizeof(g1));
  g1 *windows = malloc((size_t)num_windows * sizeof(g1));
  for (size_t i = 0; i < n; i++) load_affine_mont(&mx[i], &my[i], pts, i);

  for (int w = 0; w < num_windows; w++) {
    int shift = w * c;
    for (size_t b = 0; b < nbuckets; b++) g1_set_identity(&buckets[b]);
    for (size_t i = 0; i < n; i++) {
      if (inf && inf[i]) continue;
      int word = shift / 64, off = shift % 64;
      uint64_t d = scalars[4 * i + word] >> off;
      if (off && word < 3) d |= scalars[4 * i + word + 1] << (64 - off);
      d &= (((uint64_t)1 << c) - 1);
      if (d == 0) continue;
      g1_add_affine(&buckets[d - 1], &buckets[d - 1], &mx[i], &my[i]);
    }
    g1 running, total;
    g1_set_identity(&running);
    g1_set_identity(&total);
    for (size_t b = nbuckets; b > 0; b--) {
      g1_add(&running, &running, &buckets[b - 1]);
      g1_add(&total, &total, &running);
    }
    windows[w] = total;
  }

  g1 result;
  g1_set_identity(&result);
  for (int w = num_windows - 1; w >= 0; w--) {
    for (int k = 0; k < c; k++) g1_double(&result, &result);
    g1_add(&result, &result, &windows[w]);
  }
  store_jac_canon(out, &result);
  free(mx); free(my); free(buckets); free(windows);
}

/* MSM over Jacobian (canonical) bases -- used when inputs are unnormalized. */
void quill_g1_msm_jac(const uint64_t *jacs, size_t n,
                      const uint64_t *scalars, uint64_t *out) {
  g1 result, t;
  g1_set_identity(&result);
  for (size_t i = 0; i < n; i++) {
    g1 p;
    load_jac_mont(&p, jacs + 12 * i);
    g1_scalar_mul(&t, &p, scalars + 4 * i);
    g1_add(&result, &result, &t);
  }
  store_jac_canon(out, &result);
}

/* Batch Jacobian -> affine with one shared inversion (Montgomery's trick). */
void quill_g1_batch_normalize(const uint64_t *jacs, size_t n,
                              uint64_t *out, uint8_t *out_inf) {
  if (n == 0) return;
  g1 *ps = malloc(n * sizeof(g1));
  fq *prefix = malloc(n * sizeof(fq));
  for (size_t i = 0; i < n; i++) load_jac_mont(&ps[i], jacs + 12 * i);

  fq acc = FQ_ONE_M;
  int any = 0;
  for (size_t i = 0; i < n; i++) {
    if (g1_is_identity(&ps[i])) { prefix[i] = acc; continue; }
    fq_mul(&acc, &acc, &ps[i].Z);
    prefix[i] = acc;
    any = 1;
  }
  fq acc_inv;
  if (any) fq_inv(&acc_inv, &acc); else acc_inv = FQ_ONE_M;
  for (size_t i = n; i > 0; i--) {
    size_t k = i - 1;
    if (g1_is_identity(&ps[k])) {
      memset(out + 8 * k, 0, 64);
      out_inf[k] = 1;
      continue;
    }
    out_inf[k] = 0;
    /* z_inv = acc_inv * (product of earlier non-identity Zs) */
    fq z_inv = acc_inv;
    for (size_t j = k; j > 0; j--) {
      if (!g1_is_identity(&ps[j - 1])) {
        fq_mul(&z_inv, &acc_inv, &prefix[j - 1]);
        break;
      }
    }
    fq_mul(&acc_inv, &acc_inv, &ps[k].Z);
    fq z2, z3, ax, ay, cx, cy;
    fq_sqr(&z2, &z_inv);
    fq_mul(&z3, &z2, &z_inv);
    fq_mul(&ax, &ps[k].X, &z2);
    fq_mul(&ay, &ps[k].Y, &z3);
    fq_from_mont(&cx, &ax);
    fq_from_mont(&cy, &ay);
    memcpy(out + 8 * k, cx.v, 32);
    memcpy(out + 8 * k + 4, cy.v, 32);
  }
  free(ps); free(prefix);
}

/* n affine canonical points P_i = (i+1)*G by iterated mixed addition + one
 * batch normalization.  Cheap generator of distinct points for measuring the
 * host-CPU Pippenger baseline (the arkworks-CPU stand-in denominator of the
 * headline vs_baseline ratio) without minutes of scalar muls. */
void quill_g1_gen_series(size_t n, uint64_t *out, uint8_t *out_inf) {
  if (n == 0) return;
  /* BN254 G1 generator (1, 2), Montgomery form */
  fq gx, gy, one = {{1, 0, 0, 0}}, two = {{2, 0, 0, 0}};
  fq_to_mont(&gx, &one);
  fq_to_mont(&gy, &two);
  g1 *ps = malloc(n * sizeof(g1));
  uint64_t *jbuf = malloc(n * 12 * sizeof(uint64_t));
  g1 acc;
  acc.X = gx; acc.Y = gy; acc.Z = FQ_ONE_M;
  ps[0] = acc;
  for (size_t i = 1; i < n; i++) {
    g1_add_affine(&acc, &acc, &gx, &gy);
    ps[i] = acc;
  }
  for (size_t i = 0; i < n; i++) store_jac_canon(jbuf + 12 * i, &ps[i]);
  quill_g1_batch_normalize(jbuf, n, out, out_inf);
  free(ps); free(jbuf);
}

/* out[i] = scalars[i] * base (Jacobian canonical out), e.g. tau-power CRS. */
void quill_g1_scalar_mul_many(const uint64_t *base_aff, uint8_t base_inf,
                              const uint64_t *scalars, size_t n,
                              uint64_t *out) {
  g1 base;
  if (base_inf) g1_set_identity(&base);
  else {
    load_affine_mont(&base.X, &base.Y, base_aff, 0);
    base.Z = FQ_ONE_M;
  }
  for (size_t i = 0; i < n; i++) {
    g1 r;
    g1_scalar_mul(&r, &base, scalars + 4 * i);
    store_jac_canon(out + 12 * i, &r);
  }
}
