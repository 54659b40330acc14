// Independent golden-model implementation of the library's core arithmetic:
// 128-bit-exact modular ops, the negacyclic NTT (same CT/GS schedule and
// bit-reversed tables as ops/ntt.py and the Rust reference ntt.rs), and
// exact negacyclic products over Z, Z_q and the mod-2^64 torus.
//
// Role: native runtime oracle — tests cross-check every JAX arithmetic path
// against this library (ctypes; see fhe_study_tpu/runtime/native.py), and
// host-side tooling (key generation, parameter search) can call it directly.
// It shares no code or tables with the JAX implementation.

#include <cstdint>
#include <vector>

using u64 = uint64_t;
using u128 = unsigned __int128;
using i128 = __int128;

extern "C" {

u64 golden_mulmod(u64 a, u64 b, u64 q) {
    return (u64)(((u128)a * (u128)b) % q);
}

u64 golden_powmod(u64 x, u64 k, u64 q) {
    u128 r = 1, base = x % q;
    while (k) {
        if (k & 1) r = (r * base) % q;
        base = (base * base) % q;
        k >>= 1;
    }
    return (u64)r;
}

u64 golden_invmod(u64 x, u64 q) {  // q prime
    return golden_powmod(x, q - 2, q);
}

static u64 bit_reverse(u64 i, int bits) {
    u64 r = 0;
    for (int b = 0; b < bits; b++) { r = (r << 1) | (i & 1); i >>= 1; }
    return r;
}

static u64 primitive_root_2n(u64 q, u64 m) {  // Pornin's method
    for (u64 k = 1; k < q; k++) {
        u64 w = golden_powmod(k, (q - 1) / m, q);
        if (golden_powmod(w, m / 2, q) != 1) return w;
    }
    return 0;
}

// in-place negacyclic NTT (inverse=0: CT forward; inverse=1: GS + n^-1)
void golden_ntt(u64* data, u64 n, u64 q, int inverse) {
    int logn = 0;
    while ((1ull << logn) < n) logn++;
    u64 w = primitive_root_2n(q, 2 * n);
    std::vector<u64> roots(n), roots_inv(n);
    for (u64 i = 0; i < n; i++) {
        roots[i] = golden_powmod(w, bit_reverse(i, logn), q);
        roots_inv[i] = golden_invmod(roots[i], q);
    }
    if (!inverse) {
        for (u64 t = n / 2, m = 1; m < n; t >>= 1, m <<= 1) {
            u64 k = 0;
            for (u64 i = 0; i < m; i++) {
                u64 S = roots[m + i];
                for (u64 j = k; j < k + t; j++) {
                    u64 U = data[j];
                    u64 V = golden_mulmod(data[j + t], S, q);
                    data[j] = (U + V) % q;
                    data[j + t] = (U >= V) ? U - V : q - V + U;
                }
                k += 2 * t;
            }
        }
    } else {
        for (u64 t = 1, m = n / 2; m > 0; t <<= 1, m >>= 1) {
            u64 k = 0;
            for (u64 i = 0; i < m; i++) {
                u64 S = roots_inv[m + i];
                for (u64 j = k; j < k + t; j++) {
                    u64 U = data[j], V = data[j + t];
                    data[j] = (U + V) % q;
                    u64 d = (U >= V) ? U - V : q - V + U;
                    data[j + t] = golden_mulmod(d, S, q);
                }
                k += 2 * t;
            }
        }
        u64 ninv = golden_invmod(n % q, q);
        for (u64 i = 0; i < n; i++) data[i] = golden_mulmod(data[i], ninv, q);
    }
}

// exact negacyclic product over Z_q (i128 accumulation, like the reference's
// schoolbook but reduced)
void golden_polymul_mod(const u64* a, const u64* b, u64* out, u64 n, u64 q) {
    std::vector<u128> acc(2 * n, 0);
    for (u64 i = 0; i < n; i++)
        for (u64 j = 0; j < n; j++) {
            acc[i + j] += (u128)a[i] * b[j];
            if (acc[i + j] >> 120) acc[i + j] %= q;  // prevent overflow
        }
    for (u64 k = 0; k < n; k++) {
        u128 lo = acc[k] % q, hi = acc[k + n] % q;
        out[k] = (u64)((lo + q - hi) % q);
    }
}

// exact negacyclic product mod 2^64 (wrapping torus)
void golden_polymul_torus(const u64* a, const u64* b, u64* out, u64 n) {
    std::vector<u64> acc(2 * n, 0);
    for (u64 i = 0; i < n; i++)
        for (u64 j = 0; j < n; j++)
            acc[i + j] += a[i] * b[j];     // wrapping: low 64 bits exact
    for (u64 k = 0; k < n; k++) out[k] = acc[k] - acc[k + n];
}

// exact signed negacyclic product over Z into int64 (caller guarantees range)
void golden_polymul_i64(const int64_t* a, const int64_t* b, int64_t* out, u64 n) {
    std::vector<i128> acc(2 * n, 0);
    for (u64 i = 0; i < n; i++)
        for (u64 j = 0; j < n; j++)
            acc[i + j] += (i128)a[i] * b[j];
    for (u64 k = 0; k < n; k++) out[k] = (int64_t)(acc[k] - acc[k + n]);
}

}  // extern "C"
