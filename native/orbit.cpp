// High-precision reference-orbit computation for deep zoom.
//
// TPU-native replacement for the reference's MPFR orbit loop
// (deep_zoom_system.cpp:262-361 high-precision path, :363-448 double path):
// iterate z <- z^2 + c in fixed-point arbitrary precision, storing each z as
// a double pair, trimmed at escape.  This is the framework's host-side
// native hot loop (10k-1M bigint iterations), called from Python via ctypes
// (see fractalrenderer_tpu/deepzoom/orbit.py, which also has a pure-Python
// fallback).
//
// Representation: sign-magnitude fixed point, little-endian u64 limbs,
// value = sign * magnitude / 2^frac_bits.  Schoolbook multiplication with
// unsigned __int128 accumulation — precision is <= 4096 bits (64 limbs), so
// schoolbook beats anything fancier.
//
// Build: make -C native (produces liborbit.so).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;

namespace {

struct Big {
    int sign = 0;                 // -1, 0, +1
    std::vector<u64> m;           // magnitude, little-endian

    explicit Big(size_t limbs = 0) : m(limbs, 0) {}
};

int cmp_mag(const std::vector<u64>& a, const std::vector<u64>& b) {
    size_t n = a.size() > b.size() ? a.size() : b.size();
    for (size_t i = n; i-- > 0;) {
        u64 av = i < a.size() ? a[i] : 0;
        u64 bv = i < b.size() ? b[i] : 0;
        if (av != bv) return av < bv ? -1 : 1;
    }
    return 0;
}

void add_mag(const std::vector<u64>& a, const std::vector<u64>& b,
             std::vector<u64>& out) {
    size_t n = a.size() > b.size() ? a.size() : b.size();
    out.assign(n + 1, 0);
    u128 carry = 0;
    for (size_t i = 0; i < n; ++i) {
        u128 s = carry;
        if (i < a.size()) s += a[i];
        if (i < b.size()) s += b[i];
        out[i] = (u64)s;
        carry = s >> 64;
    }
    out[n] = (u64)carry;
    while (out.size() > 1 && out.back() == 0) out.pop_back();
}

// |a| >= |b| required
void sub_mag(const std::vector<u64>& a, const std::vector<u64>& b,
             std::vector<u64>& out) {
    out.assign(a.size(), 0);
    __int128 borrow = 0;
    for (size_t i = 0; i < a.size(); ++i) {
        __int128 d = (__int128)a[i] - (i < b.size() ? b[i] : 0) - borrow;
        borrow = 0;
        if (d < 0) { d += ((__int128)1 << 64); borrow = 1; }
        out[i] = (u64)d;
    }
    while (out.size() > 1 && out.back() == 0) out.pop_back();
}

void add_signed(const Big& a, const Big& b, Big& out) {
    if (a.sign == 0) { out = b; return; }
    if (b.sign == 0) { out = a; return; }
    if (a.sign == b.sign) {
        out.sign = a.sign;
        add_mag(a.m, b.m, out.m);
        return;
    }
    int c = cmp_mag(a.m, b.m);
    if (c == 0) { out.sign = 0; out.m.assign(1, 0); return; }
    if (c > 0) { out.sign = a.sign; sub_mag(a.m, b.m, out.m); }
    else       { out.sign = b.sign; sub_mag(b.m, a.m, out.m); }
}

// out = (a * b) >> frac_bits (signed); schoolbook
void mul_shift(const Big& a, const Big& b, int frac_bits, Big& out) {
    if (a.sign == 0 || b.sign == 0) {
        out.sign = 0;
        out.m.assign(1, 0);
        return;
    }
    size_t na = a.m.size(), nb = b.m.size();
    std::vector<u64> prod(na + nb, 0);
    for (size_t i = 0; i < na; ++i) {
        u128 carry = 0;
        u64 ai = a.m[i];
        if (ai == 0) continue;
        for (size_t j = 0; j < nb; ++j) {
            u128 cur = (u128)ai * b.m[j] + prod[i + j] + carry;
            prod[i + j] = (u64)cur;
            carry = cur >> 64;
        }
        size_t k = i + nb;
        while (carry) {
            u128 cur = (u128)prod[k] + carry;
            prod[k] = (u64)cur;
            carry = cur >> 64;
            ++k;
        }
    }
    // shift right by frac_bits
    int limb_shift = frac_bits / 64;
    int bit_shift = frac_bits % 64;
    size_t np = prod.size();
    std::vector<u64> shifted;
    shifted.reserve(np);
    for (size_t i = limb_shift; i < np; ++i) {
        u64 lo = prod[i] >> bit_shift;
        u64 hi = (bit_shift && i + 1 < np) ? (prod[i + 1] << (64 - bit_shift))
                                           : 0;
        shifted.push_back(lo | hi);
    }
    if (shifted.empty()) shifted.push_back(0);
    while (shifted.size() > 1 && shifted.back() == 0) shifted.pop_back();
    out.m = std::move(shifted);
    out.sign = (out.m.size() == 1 && out.m[0] == 0)
                   ? 0 : a.sign * b.sign;
}

double to_double(const Big& a, int frac_bits) {
    if (a.sign == 0) return 0.0;
    // The top three limbs carry >= 128 significant bits — more than enough
    // for a correctly-rounded-to-within-1ulp double.
    size_t n = a.m.size();
    int exp_of_msl = (int)(n - 1) * 64 - frac_bits;
    double d = std::ldexp((double)a.m[n - 1], exp_of_msl);
    if (n >= 2) d += std::ldexp((double)a.m[n - 2], exp_of_msl - 64);
    if (n >= 3) d += std::ldexp((double)a.m[n - 3], exp_of_msl - 128);
    return a.sign < 0 ? -d : d;
}

// Floatexp conversion: value = mantissa * 2^exp with |mantissa| in
// [0.5, 1) (np.frexp convention).  The exponent is returned separately so
// magnitudes far outside f64's range (drift entries at zooms beyond
// ~1e-308) keep their full 53-bit relative precision — to_double would
// flush them to subnormals or 0.  Identical rounding to to_double in the
// representable range: the three-limb ldexp sum rounds at the same
// value-relative position, only the binary exponent is factored out.
double to_double_fx(const Big& a, int frac_bits, int32_t* exp_out) {
    if (a.sign == 0) { *exp_out = 0; return 0.0; }
    size_t n = a.m.size();
    int top_bits = 64 - __builtin_clzll(a.m[n - 1]);
    long magbits = (long)(n - 1) * 64 + top_bits;
    int32_t e = (int32_t)(magbits - frac_bits);
    double d = std::ldexp((double)a.m[n - 1], -top_bits);
    if (n >= 2) d += std::ldexp((double)a.m[n - 2], -top_bits - 64);
    if (n >= 3) d += std::ldexp((double)a.m[n - 3], -top_bits - 128);
    if (d == 1.0) { d = 0.5; ++e; }  // top 54+ bits all ones round up
    *exp_out = e;
    return a.sign < 0 ? -d : d;
}

}  // namespace

namespace {

Big big_from(const u64* limbs, int sign, int n_limbs) {
    Big v;
    v.m.assign(limbs, limbs + n_limbs);
    while (v.m.size() > 1 && v.m.back() == 0) v.m.pop_back();
    v.sign = (v.m.size() == 1 && v.m[0] == 0) ? 0 : sign;
    return v;
}

// Shared orbit loop.  out_exp_re/out_exp_im non-null selects floatexp
// emission: each stored entry is a frexp-style mantissa in out_re/out_im
// plus a binary exponent in the int32 streams (value = m * 2^e), so drift
// magnitudes beyond f64's range survive (see to_double_fx).  Null
// pointers keep the plain-double emission.
// Optional host progress hook (deep_zoom_system.cpp:313-318 prints orbit
// progress every 5%; the Python side registers a ctypes callback here so
// long high-precision orbits report from inside the native loop too).
typedef void (*orbit_progress_fn)(long done, long total);
static orbit_progress_fn g_progress = nullptr;

extern "C" void orbit_set_progress(orbit_progress_fn fn) {
    g_progress = fn;
}

long orbit_impl(const u64* cx_limbs, int sign_x,
                const u64* cy_limbs, int sign_y,
                const u64* z0x_limbs, int sign_z0x,
                const u64* z0y_limbs, int sign_z0y,
                const u64* pp_limbs, int sign_pp,
                const u64* rr_limbs, int sign_rr,
                int n_limbs, int frac_bits,
                long max_iter, double escape_mag_sq,
                double* out_re, double* out_im,
                int32_t* out_exp_re, int32_t* out_exp_im,
                int emit_rel, int fractal_kind) {
    Big cx = big_from(cx_limbs, sign_x, n_limbs);
    Big cy = big_from(cy_limbs, sign_y, n_limbs);
    Big zr = big_from(z0x_limbs, sign_z0x, n_limbs);
    Big zi = big_from(z0y_limbs, sign_z0y, n_limbs);
    Big z0r = zr, z0i = zi;
    z0r.sign = -z0r.sign;
    z0i.sign = -z0i.sign;
    Big pp, rr, przr, przi;
    bool phoenix = fractal_kind == 2;
    if (phoenix) {
        pp = big_from(pp_limbs, sign_pp, n_limbs);
        rr = big_from(rr_limbs, sign_rr, n_limbs);
        przr = Big(1);  // z_{n-1} = 0
        przi = Big(1);
    }
    Big t1, t2, t3, nr, ni;

    long stored = 0;
    for (long i = 0; i < max_iter; ++i) {
        double dre = to_double(zr, frac_bits);
        double dim = to_double(zi, frac_bits);
        if (emit_rel) {
            add_signed(zr, z0r, t1);  // z - z0 (exact fixed point)
            add_signed(zi, z0i, t2);
            if (out_exp_re) {
                out_re[i] = to_double_fx(t1, frac_bits, &out_exp_re[i]);
                out_im[i] = to_double_fx(t2, frac_bits, &out_exp_im[i]);
            } else {
                out_re[i] = to_double(t1, frac_bits);
                out_im[i] = to_double(t2, frac_bits);
            }
        } else if (out_exp_re) {
            out_re[i] = to_double_fx(zr, frac_bits, &out_exp_re[i]);
            out_im[i] = to_double_fx(zi, frac_bits, &out_exp_im[i]);
        } else {
            out_re[i] = dre;
            out_im[i] = dim;
        }
        stored = i + 1;
        if (g_progress && (i & 8191) == 8191) g_progress(i + 1, max_iter);
        double mag2 = dre * dre + dim * dim;
        if (mag2 > escape_mag_sq || !std::isfinite(mag2)) break;

        // z = z^2 + c
        mul_shift(zr, zr, frac_bits, t1);   // zr^2
        mul_shift(zi, zi, frac_bits, t2);   // zi^2
        t2.sign = -t2.sign;
        add_signed(t1, t2, t3);             // zr^2 - zi^2
        add_signed(t3, cx, nr);             // + cx

        mul_shift(zr, zi, frac_bits, t1);   // zr*zi
        if (fractal_kind == 1 && t1.sign != 0) t1.sign = 1;  // |zr*zi|
        // *2 == shift left by 1
        {
            u64 carry = 0;
            for (size_t k = 0; k < t1.m.size(); ++k) {
                u64 nv = (t1.m[k] << 1) | carry;
                carry = t1.m[k] >> 63;
                t1.m[k] = nv;
            }
            if (carry) t1.m.push_back(carry);
        }
        add_signed(t1, cy, ni);             // + cy

        if (phoenix) {
            // + p*z_n + r*z_{n-1}; mul_shift truncates toward zero
            // exactly like the Python fallback's tm()
            mul_shift(pp, zr, frac_bits, t1);
            add_signed(nr, t1, t2);
            mul_shift(rr, przr, frac_bits, t1);
            add_signed(t2, t1, nr);
            mul_shift(pp, zi, frac_bits, t1);
            add_signed(ni, t1, t2);
            mul_shift(rr, przi, frac_bits, t1);
            add_signed(t2, t1, ni);
            przr = zr;
            przi = zi;
        }

        zr = nr;
        zi = ni;
    }
    return stored;
}

}  // namespace

extern "C" {

// Compute the orbit z <- z^2 + c from an arbitrary start z0 (Julia
// references start at the view center; Mandelbrot's critical orbit passes
// z0 = 0), storing z (as doubles) BEFORE each update and stopping when
// |z|^2 > escape_mag_sq (the escaped z is the last stored entry), exactly
// like deep_zoom_system.cpp:294-323/391-419.
//
// All coordinates are fixed-point magnitudes (little-endian u64 limbs,
// n_limbs each) with separate signs; value = sign * limbs / 2^frac_bits.
// Returns the stored orbit length (<= max_iter).
// emit_rel=1 writes out the DRIFT from the start point, D_i = z_i - z0,
// instead of z_i — computed in fixed point, so tiny drifts near a
// periodic start keep full relative precision in the f64 outputs (the
// julia perturbation kernel reconstructs Z = Z0 + D in double-double).
// fractal_kind: 0 = z^2 + c (Mandelbrot/Julia); 1 = Burning Ship
// ((|x|+i|y|)^2 + c, i.e. x' = x^2 - y^2 + cx, y' = 2|x*y| + cy);
// 2 = Phoenix (z^2 + c + p*z_n + r*z_{n-1}, carried z_{n-1} starts at 0).
// p/r arrive as fixed-point limbs (pp_limbs/rr_limbs; ignored for kinds
// 0/1, may be null there) so the host does the one exact float→fixed
// conversion and both engines share it bit-for-bit.
long orbit_compute_kind2(const u64* cx_limbs, int sign_x,
                         const u64* cy_limbs, int sign_y,
                         const u64* z0x_limbs, int sign_z0x,
                         const u64* z0y_limbs, int sign_z0y,
                         const u64* pp_limbs, int sign_pp,
                         const u64* rr_limbs, int sign_rr,
                         int n_limbs, int frac_bits,
                         long max_iter, double escape_mag_sq,
                         double* out_re, double* out_im, int emit_rel,
                         int fractal_kind) {
    return orbit_impl(cx_limbs, sign_x, cy_limbs, sign_y,
                      z0x_limbs, sign_z0x, z0y_limbs, sign_z0y,
                      pp_limbs, sign_pp, rr_limbs, sign_rr,
                      n_limbs, frac_bits, max_iter, escape_mag_sq,
                      out_re, out_im, nullptr, nullptr,
                      emit_rel, fractal_kind);
}

// Floatexp emission: like orbit_compute_kind2, but every stored entry is
// a frexp-style mantissa (|m| in [0.5, 1), written to out_re/out_im) plus
// a binary exponent (out_exp_re/out_exp_im, int32) with value = m * 2^e.
// With emit_rel=1 this keeps drift entries exact at ANY zoom depth — the
// plain-double emission flushes drifts below ~1e-308 to subnormals/zero,
// which floored the deep-zoom julia tier at ~1e-290.
long orbit_compute_kind2_fx(const u64* cx_limbs, int sign_x,
                            const u64* cy_limbs, int sign_y,
                            const u64* z0x_limbs, int sign_z0x,
                            const u64* z0y_limbs, int sign_z0y,
                            const u64* pp_limbs, int sign_pp,
                            const u64* rr_limbs, int sign_rr,
                            int n_limbs, int frac_bits,
                            long max_iter, double escape_mag_sq,
                            double* out_re, double* out_im,
                            int32_t* out_exp_re, int32_t* out_exp_im,
                            int emit_rel, int fractal_kind) {
    return orbit_impl(cx_limbs, sign_x, cy_limbs, sign_y,
                      z0x_limbs, sign_z0x, z0y_limbs, sign_z0y,
                      pp_limbs, sign_pp, rr_limbs, sign_rr,
                      n_limbs, frac_bits, max_iter, escape_mag_sq,
                      out_re, out_im, out_exp_re, out_exp_im,
                      emit_rel, fractal_kind);
}

// Backward-compatible entry without Phoenix coefficients (kinds 0/1).
// Phoenix (kind 2) needs the p/r limbs this signature cannot carry, so
// requesting it here is a caller error: fail loudly (negative length)
// rather than silently computing a z^2+c orbit.
long orbit_compute_kind(const u64* cx_limbs, int sign_x,
                        const u64* cy_limbs, int sign_y,
                        const u64* z0x_limbs, int sign_z0x,
                        const u64* z0y_limbs, int sign_z0y,
                        int n_limbs, int frac_bits,
                        long max_iter, double escape_mag_sq,
                        double* out_re, double* out_im, int emit_rel,
                        int fractal_kind) {
    if (fractal_kind == 2) return -1;
    return orbit_compute_kind2(cx_limbs, sign_x, cy_limbs, sign_y,
                               z0x_limbs, sign_z0x, z0y_limbs, sign_z0y,
                               nullptr, 0, nullptr, 0,
                               n_limbs, frac_bits, max_iter, escape_mag_sq,
                               out_re, out_im, emit_rel, fractal_kind);
}

// Backward-compatible entry: the Mandelbrot critical orbit (z0 = 0).
long orbit_compute(const u64* cx_limbs, int sign_x,
                   const u64* cy_limbs, int sign_y,
                   int n_limbs, int frac_bits,
                   long max_iter, double escape_mag_sq,
                   double* out_re, double* out_im) {
    std::vector<u64> zero(n_limbs, 0);
    return orbit_compute_kind(cx_limbs, sign_x, cy_limbs, sign_y,
                              zero.data(), 0, zero.data(), 0,
                              n_limbs, frac_bits, max_iter, escape_mag_sq,
                              out_re, out_im, 0, 0);
}

// Backward-compatible z0 entry (kind 0).
long orbit_compute_z0(const u64* cx_limbs, int sign_x,
                      const u64* cy_limbs, int sign_y,
                      const u64* z0x_limbs, int sign_z0x,
                      const u64* z0y_limbs, int sign_z0y,
                      int n_limbs, int frac_bits,
                      long max_iter, double escape_mag_sq,
                      double* out_re, double* out_im, int emit_rel) {
    return orbit_compute_kind(cx_limbs, sign_x, cy_limbs, sign_y,
                              z0x_limbs, sign_z0x, z0y_limbs, sign_z0y,
                              n_limbs, frac_bits, max_iter, escape_mag_sq,
                              out_re, out_im, emit_rel, 0);
}

}  // extern "C"
