// Native host-side BN254 G1 MSM for the prover / fixture pipeline.
//
// Role: the reference's prover-side hot loops run on native halo2curves
// arithmetic; this library is the equivalent native layer under our host
// prover (system/halo2/prover.py) and oracle (util/bn254.py) — the
// device/TPU path in ops/ is independent of it.
//
// 4x64-bit Montgomery arithmetic (CIOS with __int128), Jacobian G1,
// windowed-bucket Pippenger. Exposed via a C ABI consumed with ctypes
// (util/native_ec.py); scalars/points cross the boundary as canonical
// little-endian u64 limbs.

#include <cstdint>
#include <cstring>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Fe {
    u64 l[4];
};

// BN254 base field modulus p and Montgomery constants (R = 2^256).
static const Fe P = {{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                      0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 P_N0 = 0x87d20782e4866389ULL;  // -p^-1 mod 2^64
static const Fe R2 = {{0xf32cfc5b538afa89ULL, 0xb5e71911d44501fbULL,
                       0x47ab1eff0a417ff6ULL, 0x06d89f71cab8351fULL}};
static const Fe ONE_M = {{0xd35d438dc58f0d9dULL, 0x0a78eb28f5c70b3dULL,
                          0x666ea36f7879462cULL, 0x0e0a77c19a07df2fULL}};  // R mod p

inline bool fe_is_zero(const Fe &a) {
    return (a.l[0] | a.l[1] | a.l[2] | a.l[3]) == 0;
}

inline bool fe_gte(const Fe &a, const Fe &b) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] != b.l[i]) return a.l[i] > b.l[i];
    }
    return true;
}

inline void fe_sub_inner(Fe &out, const Fe &a, const Fe &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        out.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline void fe_add(Fe &out, const Fe &a, const Fe &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        out.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fe_gte(out, P)) fe_sub_inner(out, out, P);
}

inline void fe_sub(Fe &out, const Fe &a, const Fe &b) {
    if (fe_gte(a, b)) {
        fe_sub_inner(out, a, b);
    } else {
        Fe t;
        fe_sub_inner(t, b, a);
        fe_sub_inner(out, P, t);
    }
}

inline void fe_dbl(Fe &out, const Fe &a) { fe_add(out, a, a); }

// CIOS Montgomery multiplication.
inline void fe_mul(Fe &out, const Fe &a, const Fe &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * P_N0;
        carry = ((u128)t[0] + (u128)m * P.l[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * P.l[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[4] + carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    Fe r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fe_gte(r, P)) fe_sub_inner(r, r, P);
    out = r;
}

inline void fe_sqr(Fe &out, const Fe &a) { fe_mul(out, a, a); }

struct G1 {
    Fe x, y, z;  // Jacobian, Montgomery form; z == 0 => identity
};

inline bool g1_is_identity(const G1 &p) { return fe_is_zero(p.z); }

static void g1_double(G1 &out, const G1 &p) {
    if (g1_is_identity(p)) {
        out = p;
        return;
    }
    Fe a, b, c, d, e, f, t;
    fe_sqr(a, p.x);
    fe_sqr(b, p.y);
    fe_sqr(c, b);
    fe_add(t, p.x, b);
    fe_sqr(t, t);
    fe_sub(t, t, a);
    fe_sub(t, t, c);
    fe_dbl(d, t);
    fe_dbl(e, a);
    fe_add(e, e, a);
    fe_sqr(f, e);
    Fe x3, y3, z3;
    fe_dbl(t, d);
    fe_sub(x3, f, t);
    fe_sub(t, d, x3);
    fe_mul(t, e, t);
    Fe c8;
    fe_dbl(c8, c);
    fe_dbl(c8, c8);
    fe_dbl(c8, c8);
    fe_sub(y3, t, c8);
    fe_mul(z3, p.y, p.z);
    fe_dbl(z3, z3);
    out.x = x3;
    out.y = y3;
    out.z = z3;
}

static void g1_add(G1 &out, const G1 &p, const G1 &q) {
    if (g1_is_identity(p)) {
        out = q;
        return;
    }
    if (g1_is_identity(q)) {
        out = p;
        return;
    }
    Fe z1z1, z2z2, u1, u2, s1, s2, t;
    fe_sqr(z1z1, p.z);
    fe_sqr(z2z2, q.z);
    fe_mul(u1, p.x, z2z2);
    fe_mul(u2, q.x, z1z1);
    fe_mul(t, q.z, z2z2);
    fe_mul(s1, p.y, t);
    fe_mul(t, p.z, z1z1);
    fe_mul(s2, q.y, t);
    Fe h, r;
    fe_sub(h, u2, u1);
    fe_sub(r, s2, s1);
    if (fe_is_zero(h)) {
        if (fe_is_zero(r)) {
            g1_double(out, p);
        } else {
            out.x = ONE_M;
            out.y = ONE_M;
            out.z = {{0, 0, 0, 0}};
        }
        return;
    }
    Fe i, j, v;
    fe_dbl(t, h);
    fe_sqr(i, t);
    fe_mul(j, h, i);
    fe_dbl(r, r);
    fe_mul(v, u1, i);
    Fe x3, y3, z3;
    fe_sqr(x3, r);
    fe_sub(x3, x3, j);
    fe_sub(x3, x3, v);
    fe_sub(x3, x3, v);
    fe_sub(t, v, x3);
    fe_mul(t, r, t);
    Fe s1j;
    fe_mul(s1j, s1, j);
    fe_dbl(s1j, s1j);
    fe_sub(y3, t, s1j);
    fe_add(t, p.z, q.z);
    fe_sqr(t, t);
    fe_sub(t, t, z1z1);
    fe_sub(t, t, z2z2);
    fe_mul(z3, t, h);
    out.x = x3;
    out.y = y3;
    out.z = z3;
}

}  // namespace

extern "C" {

// scalars: n * 4 u64 canonical LE limbs; points: n * 8 u64 canonical affine
// (x, y) — identity encoded as x == y == 0.  out: 12 u64 canonical Jacobian.
void bn254_msm(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
    const int W = 8;
    const int NBUCKET = 1 << W;
    const int NWIN = (256 + W - 1) / W;

    // load points into Montgomery form
    std::vector<G1> pts(n);
    for (size_t i = 0; i < n; ++i) {
        Fe x, y;
        std::memcpy(x.l, points + 8 * i, 32);
        std::memcpy(y.l, points + 8 * i + 4, 32);
        if (fe_is_zero(x) && fe_is_zero(y)) {
            pts[i].x = ONE_M;
            pts[i].y = ONE_M;
            pts[i].z = {{0, 0, 0, 0}};
        } else {
            fe_mul(pts[i].x, x, R2);
            fe_mul(pts[i].y, y, R2);
            pts[i].z = ONE_M;
        }
    }

    G1 acc = {ONE_M, ONE_M, {{0, 0, 0, 0}}};
    std::vector<G1> buckets(NBUCKET);
    for (int w = NWIN - 1; w >= 0; --w) {
        for (int k = 0; k < W; ++k) g1_double(acc, acc);
        for (auto &b : buckets) b = G1{ONE_M, ONE_M, {{0, 0, 0, 0}}};
        for (size_t i = 0; i < n; ++i) {
            int bit = w * W;
            int limb = bit / 64;
            int shift = bit % 64;
            u64 d = scalars[4 * i + limb] >> shift;
            if (shift + W > 64 && limb + 1 < 4)
                d |= scalars[4 * i + limb + 1] << (64 - shift);
            d &= (NBUCKET - 1);
            if (d) g1_add(buckets[d], buckets[d], pts[i]);
        }
        G1 running = {ONE_M, ONE_M, {{0, 0, 0, 0}}};
        G1 sum = running;
        for (int b = NBUCKET - 1; b >= 1; --b) {
            g1_add(running, running, buckets[b]);
            g1_add(sum, sum, running);
        }
        g1_add(acc, acc, sum);
    }

    // back to canonical form
    Fe one = {{1, 0, 0, 0}};
    Fe xc, yc, zc;
    fe_mul(xc, acc.x, one);
    fe_mul(yc, acc.y, one);
    fe_mul(zc, acc.z, one);
    std::memcpy(out, xc.l, 32);
    std::memcpy(out + 4, yc.l, 32);
    std::memcpy(out + 8, zc.l, 32);
}
}

// ---------------------------------------------------------------------------
// Scalar field Fr + radix-2 NTT: the host prover's FFT hot loop
// (util/poly.py ntt/intt/coset_eval/coset_interp route here when available).
// Same CIOS Montgomery core as Fe above, with Fr constants.
// ---------------------------------------------------------------------------

namespace {

static const Fe FR_P = {{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const u64 FR_N0 = 0xc2e1f593efffffffULL;  // -r^-1 mod 2^64
static const Fe FR_R2 = {{0x1bb8e645ae216da7ULL, 0x53fe3ab1e35c59e3ULL,
                          0x8c49833d53bb8085ULL, 0x0216d0b17f4e44a5ULL}};
static const Fe FR_ONE_M = {{0xac96341c4ffffffbULL, 0x36fc76959f60cd29ULL,
                             0x666ea36f7879462eULL, 0x0e0a77c19a07df2fULL}};

inline void fr_sub_inner(Fe &out, const Fe &a, const Fe &b) {
    u128 borrow = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.l[i] - b.l[i] - borrow;
        out.l[i] = (u64)d;
        borrow = (d >> 64) ? 1 : 0;
    }
}

inline bool fr_gte(const Fe &a, const Fe &b) {
    for (int i = 3; i >= 0; --i) {
        if (a.l[i] != b.l[i]) return a.l[i] > b.l[i];
    }
    return true;
}

inline void fr_add(Fe &out, const Fe &a, const Fe &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.l[i] + b.l[i] + carry;
        out.l[i] = (u64)s;
        carry = s >> 64;
    }
    if (carry || fr_gte(out, FR_P)) fr_sub_inner(out, out, FR_P);
}

inline void fr_sub(Fe &out, const Fe &a, const Fe &b) {
    if (fr_gte(a, b)) {
        fr_sub_inner(out, a, b);
    } else {
        Fe t;
        fr_sub_inner(t, b, a);
        fr_sub_inner(out, FR_P, t);
    }
}

inline void fr_mul(Fe &out, const Fe &a, const Fe &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 carry = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)t[j] + (u128)a.l[i] * b.l[j] + carry;
            t[j] = (u64)s;
            carry = s >> 64;
        }
        u128 s = (u128)t[4] + carry;
        t[4] = (u64)s;
        t[5] = (u64)(s >> 64);

        u64 m = t[0] * FR_N0;
        carry = ((u128)t[0] + (u128)m * FR_P.l[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s2 = (u128)t[j] + (u128)m * FR_P.l[j] + carry;
            t[j - 1] = (u64)s2;
            carry = s2 >> 64;
        }
        s = (u128)t[4] + carry;
        t[3] = (u64)s;
        t[4] = t[5] + (u64)(s >> 64);
        t[5] = 0;
    }
    Fe r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || fr_gte(r, FR_P)) fr_sub_inner(r, r, FR_P);
    out = r;
}

}  // namespace

extern "C" {

// In-place NTT of size 2^logn over Fr.  vals: n*4 canonical LE u64 limbs.
// omega: canonical primitive 2^logn-th root (caller passes omega^-1 for the
// inverse transform); scale: canonical factor applied to every output
// (n^-1 for the inverse transform, 1 otherwise).
void bn254_fr_ntt(u64 *vals, u64 logn, const u64 *omega_can,
                  const u64 *scale_can) {
    const size_t n = (size_t)1 << logn;
    std::vector<Fe> v(n);
    for (size_t i = 0; i < n; ++i) {
        Fe raw = {{vals[4 * i], vals[4 * i + 1], vals[4 * i + 2], vals[4 * i + 3]}};
        fr_mul(v[i], raw, FR_R2);  // to Montgomery
    }

    // bit-reversal permutation
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) { Fe t = v[i]; v[i] = v[j]; v[j] = t; }
    }

    // precomputed twiddle table tw[j] = omega^j, j < n/2; stage s indexes it
    // with stride n/2^s (halves the muls vs updating w inside the loop)
    Fe omega_m;
    {
        Fe raw = {{omega_can[0], omega_can[1], omega_can[2], omega_can[3]}};
        fr_mul(omega_m, raw, FR_R2);
    }
    const size_t halfn = n >> 1;
    std::vector<Fe> tw(halfn ? halfn : 1);
    tw[0] = FR_ONE_M;
    for (size_t j = 1; j < halfn; ++j) fr_mul(tw[j], tw[j - 1], omega_m);

    for (size_t s = 1; s <= logn; ++s) {
        const size_t len = (size_t)1 << s;
        const size_t half = len >> 1;
        const size_t stride = n >> s;
        for (size_t i = 0; i < n; i += len) {
            for (size_t j = 0; j < half; ++j) {
                Fe u = v[i + j], t;
                fr_mul(t, v[i + j + half], tw[j * stride]);
                fr_add(v[i + j], u, t);
                fr_sub(v[i + j + half], u, t);
            }
        }
    }

    Fe scale_m;
    {
        Fe raw = {{scale_can[0], scale_can[1], scale_can[2], scale_can[3]}};
        fr_mul(scale_m, raw, FR_R2);
    }
    const Fe one_raw = {{1, 0, 0, 0}};
    for (size_t i = 0; i < n; ++i) {
        fr_mul(v[i], v[i], scale_m);
        Fe out_c;
        fr_mul(out_c, v[i], one_raw);  // out of Montgomery
        vals[4 * i] = out_c.l[0];
        vals[4 * i + 1] = out_c.l[1];
        vals[4 * i + 2] = out_c.l[2];
        vals[4 * i + 3] = out_c.l[3];
    }
}

// Element-wise vals[i] *= base^i (canonical in/out) — the coset scaling in
// coset_eval/coset_interp (util/poly.py:61-86).
void bn254_fr_powmul(u64 *vals, u64 n, const u64 *base_can) {
    Fe base_m;
    {
        Fe raw = {{base_can[0], base_can[1], base_can[2], base_can[3]}};
        fr_mul(base_m, raw, FR_R2);
    }
    Fe acc = FR_ONE_M;
    const Fe one_raw = {{1, 0, 0, 0}};
    for (u64 i = 0; i < n; ++i) {
        Fe raw = {{vals[4 * i], vals[4 * i + 1], vals[4 * i + 2], vals[4 * i + 3]}};
        Fe vm;
        fr_mul(vm, raw, FR_R2);
        fr_mul(vm, vm, acc);
        Fe out_c;
        fr_mul(out_c, vm, one_raw);
        vals[4 * i] = out_c.l[0];
        vals[4 * i + 1] = out_c.l[1];
        vals[4 * i + 2] = out_c.l[2];
        vals[4 * i + 3] = out_c.l[3];
        fr_mul(acc, acc, base_m);
    }
}

}  // extern "C"
