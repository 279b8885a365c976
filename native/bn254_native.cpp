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

// ===========================================================================
// v2: threaded kernels for the at-scale host prover (k>=20 aggregation
// circuits).  Everything below operates on numpy-owned buffers:
//   - Fr vectors: (n,4) u64 LE limbs, MONTGOMERY form unless noted _can
//   - G1 affine:  (n,8) u64 LE limbs (x,y), MONTGOMERY form; (0,0) = identity
// Counterpart of the prover-side arithmetic the reference gets natively from
// halo2curves + halo2's rayon parallelize (util.rs:14-50); here the
// parallelism is std::thread over element ranges.
// ===========================================================================

#include <thread>
#include <functional>
#include <algorithm>

namespace {

inline unsigned hw_threads() {
    unsigned t = std::thread::hardware_concurrency();
    return t ? t : 1;
}

// Split [0,n) into near-equal chunks, one thread per chunk.
static void parallel_for(size_t n, const std::function<void(size_t, size_t)> &fn) {
    unsigned nt = hw_threads();
    if (n < 4096 || nt <= 1) {
        fn(0, n);
        return;
    }
    if ((size_t)nt > n) nt = (unsigned)n;
    std::vector<std::thread> ts;
    ts.reserve(nt);
    size_t chunk = (n + nt - 1) / nt;
    for (unsigned t = 0; t < nt; ++t) {
        size_t lo = (size_t)t * chunk;
        size_t hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto &th : ts) th.join();
}

inline Fe fe_at(const u64 *p, size_t i) {
    Fe r = {{p[4 * i], p[4 * i + 1], p[4 * i + 2], p[4 * i + 3]}};
    return r;
}

inline void fe_store(u64 *p, size_t i, const Fe &v) {
    p[4 * i] = v.l[0];
    p[4 * i + 1] = v.l[1];
    p[4 * i + 2] = v.l[2];
    p[4 * i + 3] = v.l[3];
}

// Fr inversion by Fermat (r-2); input/output Montgomery.
static void fr_inv(Fe &out, const Fe &a) {
    // r - 2
    static const u64 EXP[4] = {0x43e1f593efffffffULL, 0x2833e84879b97091ULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};
    Fe result = FR_ONE_M;
    Fe base = a;
    for (int limb = 0; limb < 4; ++limb) {
        u64 e = EXP[limb];
        for (int bit = 0; bit < 64; ++bit) {
            if (e & 1) fr_mul(result, result, base);
            fr_mul(base, base, base);
            e >>= 1;
        }
    }
    out = result;
}

// Fq inversion by Fermat (p-2); input/output Montgomery.
static void fq_inv(Fe &out, const Fe &a) {
    static const u64 EXP[4] = {0x3c208c16d87cfd45ULL, 0x97816a916871ca8dULL,
                               0xb85045b68181585dULL, 0x30644e72e131a029ULL};
    Fe result = ONE_M;
    Fe base = a;
    for (int limb = 0; limb < 4; ++limb) {
        u64 e = EXP[limb];
        for (int bit = 0; bit < 64; ++bit) {
            if (e & 1) fe_mul(result, result, base);
            fe_mul(base, base, base);
            e >>= 1;
        }
    }
    out = result;
}

}  // namespace

extern "C" {

// ---- Fr vector ops (Montgomery in/out) ------------------------------------

void fr_vec_to_mont(u64 *out, const u64 *in, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_mul(v, fe_at(in, i), FR_R2);
            fe_store(out, i, v);
        }
    });
}

void fr_vec_from_mont(u64 *out, const u64 *in, size_t n) {
    const Fe one_raw = {{1, 0, 0, 0}};
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_mul(v, fe_at(in, i), one_raw);
            fe_store(out, i, v);
        }
    });
}

void fr_vec_add(u64 *out, const u64 *a, const u64 *b, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_add(v, fe_at(a, i), fe_at(b, i));
            fe_store(out, i, v);
        }
    });
}

void fr_vec_sub(u64 *out, const u64 *a, const u64 *b, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_sub(v, fe_at(a, i), fe_at(b, i));
            fe_store(out, i, v);
        }
    });
}

void fr_vec_mul(u64 *out, const u64 *a, const u64 *b, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_mul(v, fe_at(a, i), fe_at(b, i));
            fe_store(out, i, v);
        }
    });
}

// out = a * c  (c a single Montgomery scalar)
void fr_vec_scale(u64 *out, const u64 *a, const u64 *c_mont, size_t n) {
    Fe c = fe_at(c_mont, 0);
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_mul(v, fe_at(a, i), c);
            fe_store(out, i, v);
        }
    });
}

// out = a + c * b  (fused: the expression-AST accumulate step)
void fr_vec_add_scaled(u64 *out, const u64 *a, const u64 *b, const u64 *c_mont,
                       size_t n) {
    Fe c = fe_at(c_mont, 0);
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe v;
            fr_mul(v, fe_at(b, i), c);
            fr_add(v, v, fe_at(a, i));
            fe_store(out, i, v);
        }
    });
}

// Batch inversion (Montgomery trick), zeros map to zero.  Chunked per
// thread: each chunk pays one Fermat inversion.
void fr_vec_inv(u64 *out, const u64 *a, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        size_t m = hi - lo;
        std::vector<Fe> prefix(m);
        Fe acc = FR_ONE_M;
        for (size_t i = 0; i < m; ++i) {
            prefix[i] = acc;
            Fe v = fe_at(a, lo + i);
            if (!fe_is_zero(v)) fr_mul(acc, acc, v);
        }
        Fe inv;
        fr_inv(inv, acc);
        for (size_t i = m; i-- > 0;) {
            Fe v = fe_at(a, lo + i);
            if (fe_is_zero(v)) {
                fe_store(out, lo + i, v);
            } else {
                Fe r;
                fr_mul(r, inv, prefix[i]);
                fr_mul(inv, inv, v);
                fe_store(out, lo + i, r);
            }
        }
    });
}

// out[i] = prod_{j<=i} a[j]  (inclusive running product; sequential scan)
void fr_vec_prefix_prod(u64 *out, const u64 *a, size_t n) {
    Fe acc = FR_ONE_M;
    for (size_t i = 0; i < n; ++i) {
        fr_mul(acc, acc, fe_at(a, i));
        fe_store(out, i, acc);
    }
}

// out[i] = base^i (Montgomery in/out)
void fr_vec_pow_series(u64 *out, const u64 *base_mont, size_t n) {
    Fe base = fe_at(base_mont, 0);
    // fill chunk starts by pow, then run sequentially inside each chunk
    unsigned nt = hw_threads();
    size_t chunk = (n + nt - 1) / nt;
    parallel_for(n, [&](size_t lo, size_t hi) {
        (void)chunk;
        // base^lo by square-and-multiply
        Fe acc = FR_ONE_M;
        Fe b = base;
        size_t e = lo;
        while (e) {
            if (e & 1) fr_mul(acc, acc, b);
            fr_mul(b, b, b);
            e >>= 1;
        }
        for (size_t i = lo; i < hi; ++i) {
            fe_store(out, i, acc);
            fr_mul(acc, acc, base);
        }
    });
}

// In-place NTT over Fr, MONTGOMERY form in/out, threaded.
// omega/scale are Montgomery scalars.
void bn254_fr_ntt_mont(u64 *vals, u64 logn, const u64 *omega_mont,
                       const u64 *scale_mont) {
    const size_t n = (size_t)1 << logn;
    Fe omega = fe_at(omega_mont, 0);
    Fe scale = fe_at(scale_mont, 0);

    // bit-reversal (parallel; swaps touch disjoint pairs)
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            // reverse logn bits of i
            size_t j = 0, x = i;
            for (u64 b = 0; b < logn; ++b) {
                j = (j << 1) | (x & 1);
                x >>= 1;
            }
            if (i < j) {
                Fe t = fe_at(vals, i);
                fe_store(vals, i, fe_at(vals, j));
                // and store t at j
                Fe u = t;
                fe_store(vals, j, u);
            }
        }
    });

    // twiddle table tw[j] = omega^j for j < n/2, built in parallel segments
    const size_t halfn = n >> 1;
    std::vector<Fe> tw(halfn ? halfn : 1);
    tw[0] = FR_ONE_M;
    parallel_for(halfn, [&](size_t lo, size_t hi) {
        Fe acc = FR_ONE_M;
        Fe b = omega;
        size_t e = lo;
        while (e) {
            if (e & 1) fr_mul(acc, acc, b);
            fr_mul(b, b, b);
            e >>= 1;
        }
        for (size_t j = lo; j < hi; ++j) {
            tw[j] = acc;
            fr_mul(acc, acc, omega);
        }
    });

    for (u64 s = 1; s <= logn; ++s) {
        const size_t len = (size_t)1 << s;
        const size_t half = len >> 1;
        const size_t stride = n >> s;
        // n/2 butterflies per stage, indexed flat
        parallel_for(halfn, [&](size_t lo, size_t hi) {
            for (size_t t = lo; t < hi; ++t) {
                size_t block = t / half;
                size_t j = t % half;
                size_t i = block * len + j;
                Fe u = fe_at(vals, i);
                Fe v;
                fr_mul(v, fe_at(vals, i + half), tw[j * stride]);
                Fe a, b;
                fr_add(a, u, v);
                fr_sub(b, u, v);
                fe_store(vals, i, a);
                fe_store(vals, i + half, b);
            }
        });
    }

    bool scale_is_one = std::memcmp(scale.l, FR_ONE_M.l, 32) == 0;
    if (!scale_is_one) {
        parallel_for(n, [&](size_t lo, size_t hi) {
            for (size_t i = lo; i < hi; ++i) {
                Fe v;
                fr_mul(v, fe_at(vals, i), scale);
                fe_store(vals, i, v);
            }
        });
    }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// v2 MSM: signed-digit windowed Pippenger over Montgomery affine points,
// threaded over windows.  Mixed (Jacobian += affine) bucket adds.
// ---------------------------------------------------------------------------

namespace {

struct AffM {
    Fe x, y;  // Montgomery; (0,0) = identity
};

inline bool aff_is_identity(const AffM &p) {
    return fe_is_zero(p.x) && fe_is_zero(p.y);
}

// Jacobian += affine (madd-2007-bl); handles identity/doubling edge cases.
static void g1_add_mixed(G1 &acc, const Fe &x2, const Fe &y2) {
    if (g1_is_identity(acc)) {
        acc.x = x2;
        acc.y = y2;
        acc.z = ONE_M;
        return;
    }
    Fe z1z1, u2, s2, t;
    fe_sqr(z1z1, acc.z);
    fe_mul(u2, x2, z1z1);
    fe_mul(t, acc.z, z1z1);
    fe_mul(s2, y2, t);
    Fe h, r;
    fe_sub(h, u2, acc.x);
    fe_sub(r, s2, acc.y);
    if (fe_is_zero(h)) {
        if (fe_is_zero(r)) {
            g1_double(acc, acc);
        } else {
            acc.x = ONE_M;
            acc.y = ONE_M;
            acc.z = {{0, 0, 0, 0}};
        }
        return;
    }
    Fe hh, i, j, v;
    fe_sqr(hh, h);
    fe_dbl(i, hh);
    fe_dbl(i, i);           // I = 4*HH
    fe_mul(j, h, i);        // J = H*I
    fe_dbl(r, r);           // r = 2*(S2-Y1)
    fe_mul(v, acc.x, i);    // V = X1*I
    Fe x3, y3, z3;
    fe_sqr(x3, r);
    fe_sub(x3, x3, j);
    fe_sub(x3, x3, v);
    fe_sub(x3, x3, v);
    fe_sub(t, v, x3);
    fe_mul(t, r, t);
    Fe yj;
    fe_mul(yj, acc.y, j);
    fe_dbl(yj, yj);
    fe_sub(y3, t, yj);
    fe_add(z3, acc.z, h);
    fe_sqr(z3, z3);
    fe_sub(z3, z3, z1z1);
    fe_sub(z3, z3, hh);
    acc.x = x3;
    acc.y = y3;
    acc.z = z3;
}

}  // namespace

extern "C" {

// Convert canonical affine points (n,8) to Montgomery affine (n,8).
void bn254_g1_to_mont_affine(u64 *out, const u64 *in, size_t n) {
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe x = fe_at(in, 2 * i), y = fe_at(in, 2 * i + 1);
            if (!(fe_is_zero(x) && fe_is_zero(y))) {
                fe_mul(x, x, R2);
                fe_mul(y, y, R2);
            }
            fe_store(out, 2 * i, x);
            fe_store(out, 2 * i + 1, y);
        }
    });
}

void bn254_g1_from_mont_affine(u64 *out, const u64 *in, size_t n) {
    const Fe one_raw = {{1, 0, 0, 0}};
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            Fe x = fe_at(in, 2 * i), y = fe_at(in, 2 * i + 1);
            if (!(fe_is_zero(x) && fe_is_zero(y))) {
                fe_mul(x, x, one_raw);
                fe_mul(y, y, one_raw);
            }
            fe_store(out, 2 * i, x);
            fe_store(out, 2 * i + 1, y);
        }
    });
}

// MSM: scalars canonical (n,4); points Montgomery affine (n,8);
// out: canonical Jacobian (12 u64).  Threaded over scalar windows.
void bn254_msm2(const u64 *scalars, const u64 *points, size_t n, u64 *out) {
    int W;
    if (n >= (1u << 16)) W = 16;
    else if (n >= (1u << 11)) W = 12;
    else W = 8;
    const int NWIN = (254 + W) / W + ((254 % W) ? 0 : 1);  // headroom for carry
    const int HALF = 1 << (W - 1);

    // signed-digit recode: digits[i*NWIN + w] in [-2^(W-1), 2^(W-1)]
    std::vector<int32_t> digits((size_t)n * NWIN);
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            const u64 *s = scalars + 4 * i;
            int carry = 0;
            for (int w = 0; w < NWIN; ++w) {
                int bit = w * W;
                int limb = bit / 64;
                int shift = bit % 64;
                u64 d = 0;
                if (limb < 4) {
                    d = s[limb] >> shift;
                    if (shift + W > 64 && limb + 1 < 4)
                        d |= s[limb + 1] << (64 - shift);
                }
                d &= ((u64)1 << W) - 1;
                int v = (int)d + carry;
                if (v > HALF) {
                    v -= (1 << W);
                    carry = 1;
                } else {
                    carry = 0;
                }
                digits[(size_t)i * NWIN + w] = v;
            }
        }
    });

    std::vector<G1> window_sums(NWIN, G1{ONE_M, ONE_M, {{0, 0, 0, 0}}});
    unsigned nt = std::min<unsigned>(hw_threads(), NWIN);
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nt; ++t) {
        ts.emplace_back([&, t]() {
            std::vector<G1> buckets(HALF + 1);
            for (int w = t; w < NWIN; w += nt) {
                for (auto &b : buckets) b = G1{ONE_M, ONE_M, {{0, 0, 0, 0}}};
                for (size_t i = 0; i < n; ++i) {
                    int d = digits[(size_t)i * NWIN + w];
                    if (!d) continue;
                    const Fe x = fe_at(points, 2 * i);
                    const Fe y = fe_at(points, 2 * i + 1);
                    if (fe_is_zero(x) && fe_is_zero(y)) continue;
                    if (d > 0) {
                        g1_add_mixed(buckets[d], x, y);
                    } else {
                        Fe ny;
                        fe_sub(ny, P, y);  // y != 0 for on-curve bn254 points
                        g1_add_mixed(buckets[-d], x, ny);
                    }
                }
                G1 running = {ONE_M, ONE_M, {{0, 0, 0, 0}}};
                G1 sum = running;
                for (int b = HALF; b >= 1; --b) {
                    g1_add(running, running, buckets[b]);
                    g1_add(sum, sum, running);
                }
                window_sums[w] = sum;
            }
        });
    }
    for (auto &th : ts) th.join();

    G1 acc = {ONE_M, ONE_M, {{0, 0, 0, 0}}};
    for (int w = NWIN - 1; w >= 0; --w) {
        for (int k = 0; k < W; ++k) g1_double(acc, acc);
        g1_add(acc, acc, window_sums[w]);
    }

    const Fe one_raw = {{1, 0, 0, 0}};
    Fe xc, yc, zc;
    fe_mul(xc, acc.x, one_raw);
    fe_mul(yc, acc.y, one_raw);
    fe_mul(zc, acc.z, one_raw);
    std::memcpy(out, xc.l, 32);
    std::memcpy(out + 4, yc.l, 32);
    std::memcpy(out + 8, zc.l, 32);
}

// SRS generation: out[i] = tau^i * G, Montgomery affine (n,8).
// Fixed-base 16-bit window table + batch normalization.
void bn254_srs_gen(const u64 *tau_can, size_t n, u64 *out) {
    // tau in Fr Montgomery
    Fe tau;
    fr_mul(tau, fe_at(tau_can, 0), FR_R2);

    // scalar powers tau^i, canonical
    std::vector<u64> scal(4 * n);
    {
        Fe acc = FR_ONE_M;
        const Fe one_raw = {{1, 0, 0, 0}};
        for (size_t i = 0; i < n; ++i) {
            Fe c;
            fr_mul(c, acc, one_raw);
            fe_store(scal.data(), i, c);
            fr_mul(acc, acc, tau);
        }
    }

    // G1 generator (1, 2) in Montgomery
    Fe gx = {{1, 0, 0, 0}}, gy = {{2, 0, 0, 0}};
    fe_mul(gx, gx, R2);
    fe_mul(gy, gy, R2);

    // table[w][d] = (d << 16w) * G for w < 16, d < 2^16, affine Montgomery
    const int TW = 16;
    const size_t TD = 1 << 16;
    static std::vector<AffM> table;  // cached across calls
    if (table.empty()) {
        std::vector<G1> jac(TW * TD);
        G1 base = {gx, gy, ONE_M};
        for (int w = 0; w < TW; ++w) {
            G1 *row = jac.data() + (size_t)w * TD;
            row[0] = G1{ONE_M, ONE_M, {{0, 0, 0, 0}}};
            row[1] = base;
            for (size_t d = 2; d < TD; ++d) {
                row[d] = row[d - 1];
                g1_add_mixed(row[d], base.x, base.y);  // base is affine (z=1)
            }
            if (w + 1 < TW) {
                // base <<= 16
                G1 b = row[TD - 1];
                g1_add_mixed(b, base.x, base.y);  // = (2^16) * base
                // normalize b to affine for the next row's mixed adds
                Fe zinv, zi2, zi3;
                fq_inv(zinv, b.z);
                fe_sqr(zi2, zinv);
                fe_mul(zi3, zi2, zinv);
                fe_mul(base.x, b.x, zi2);
                fe_mul(base.y, b.y, zi3);
                base.z = ONE_M;
            }
        }
        // batch-normalize the whole table to affine
        table.resize(TW * TD);
        parallel_for(TW * TD, [&](size_t lo, size_t hi) {
            size_t m = hi - lo;
            std::vector<Fe> prefix(m);
            Fe acc = ONE_M;
            for (size_t i = 0; i < m; ++i) {
                prefix[i] = acc;
                if (!g1_is_identity(jac[lo + i])) fe_mul(acc, acc, jac[lo + i].z);
            }
            Fe inv;
            fq_inv(inv, acc);
            for (size_t i = m; i-- > 0;) {
                G1 &p = jac[lo + i];
                if (g1_is_identity(p)) {
                    table[lo + i].x = {{0, 0, 0, 0}};
                    table[lo + i].y = {{0, 0, 0, 0}};
                } else {
                    Fe zinv, zi2, zi3;
                    fe_mul(zinv, inv, prefix[i]);
                    fe_mul(inv, inv, p.z);
                    fe_sqr(zi2, zinv);
                    fe_mul(zi3, zi2, zinv);
                    fe_mul(table[lo + i].x, p.x, zi2);
                    fe_mul(table[lo + i].y, p.y, zi3);
                }
            }
        });
    }

    // per-scalar fixed-base multiply + batch normalization
    std::vector<G1> pts(n);
    parallel_for(n, [&](size_t lo, size_t hi) {
        for (size_t i = lo; i < hi; ++i) {
            const u64 *s = scal.data() + 4 * i;
            G1 acc = {ONE_M, ONE_M, {{0, 0, 0, 0}}};
            for (int w = 0; w < TW; ++w) {
                u64 d = (s[w / 4] >> ((w % 4) * 16)) & 0xFFFF;
                if (!d) continue;
                const AffM &e = table[(size_t)w * TD + d];
                if (!aff_is_identity(e)) g1_add_mixed(acc, e.x, e.y);
            }
            pts[i] = acc;
        }
    });
    parallel_for(n, [&](size_t lo, size_t hi) {
        size_t m = hi - lo;
        std::vector<Fe> prefix(m);
        Fe acc = ONE_M;
        for (size_t i = 0; i < m; ++i) {
            prefix[i] = acc;
            if (!g1_is_identity(pts[lo + i])) fe_mul(acc, acc, pts[lo + i].z);
        }
        Fe inv;
        fq_inv(inv, acc);
        for (size_t i = m; i-- > 0;) {
            G1 &p = pts[lo + i];
            if (g1_is_identity(p)) {
                fe_store(out, 2 * (lo + i), {{0, 0, 0, 0}});
                fe_store(out, 2 * (lo + i) + 1, {{0, 0, 0, 0}});
            } else {
                Fe zinv, zi2, zi3, xa, ya;
                fe_mul(zinv, inv, prefix[i]);
                fe_mul(inv, inv, p.z);
                fe_sqr(zi2, zinv);
                fe_mul(zi3, zi2, zinv);
                fe_mul(xa, p.x, zi2);
                fe_mul(ya, p.y, zi3);
                fe_store(out, 2 * (lo + i), xa);
                fe_store(out, 2 * (lo + i) + 1, ya);
            }
        }
    });
}

}  // extern "C"

extern "C" {

// Horner evaluation: out = sum coeffs[i] * x^i (Montgomery in/out).
void fr_vec_horner(u64 *out, const u64 *coeffs, size_t n, const u64 *x_mont) {
    Fe x = fe_at(x_mont, 0);
    Fe acc = {{0, 0, 0, 0}};
    for (size_t i = n; i-- > 0;) {
        fr_mul(acc, acc, x);
        fr_add(acc, acc, fe_at(coeffs, i));
    }
    fe_store(out, 0, acc);
}

// Synthetic division by (X - a): q has n-1 coeffs, rem 1 (Montgomery).
void fr_vec_div_linear(u64 *q, u64 *rem, const u64 *coeffs, size_t n,
                       const u64 *a_mont) {
    Fe a = fe_at(a_mont, 0);
    Fe acc = {{0, 0, 0, 0}};
    for (size_t i = n; i-- > 1;) {
        Fe c;
        fr_mul(c, acc, a);
        fr_add(acc, c, fe_at(coeffs, i));
        fe_store(q, i - 1, acc);
    }
    Fe c;
    fr_mul(c, acc, a);
    fr_add(c, c, fe_at(coeffs, 0));
    fe_store(rem, 0, c);
}

}  // extern "C"
