"""NTT-friendly prime generation (host-side, deterministic)."""

from functools import lru_cache


def _is_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@lru_cache(maxsize=None)
def ntt_primes(count: int, bits: int = 30, order: int = 1 << 16,
               skip: int = 0) -> tuple:
    """`count` distinct primes p ≈ 2^bits with p ≡ 1 (mod order), descending.
    `skip` skips the first few (to build disjoint bases)."""
    out = []
    k = (1 << bits) // order
    while len(out) < count + skip:
        p = k * order + 1
        if p.bit_length() <= bits + 1 and _is_prime(p):
            out.append(p)
        k -= 1
        if k <= 0:
            raise ValueError("ran out of candidates")
    return tuple(out[skip:skip + count])
