"""NTT-friendly prime generation and root-of-unity tables (host side).

Generates chains of distinct primes q = k*2N + 1 close to a target bit size so
that Z_q contains a primitive 2N-th root of unity (negacyclic NTT support).
Pure python ints — runs once at context construction.
"""

import random

_MR_BASES = (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37)


def is_prime(n: int) -> bool:
    if n < 2:
        return False
    for p in _MR_BASES:
        if n % p == 0:
            return n == p
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in _MR_BASES:
        x = pow(a, d, n)
        if x == 1 or x == n - 1:
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def gen_ntt_primes(n_ring: int, count: int, bits: int, skip=()) -> list:
    """`count` distinct primes ≡ 1 (mod 2*n_ring), descending from 2**bits.

    All primes must stay below 2**31 for the u32 arithmetic in modmath.py.
    """
    assert bits <= 31, "primes must fit u32 Montgomery arithmetic (q < 2^31)"
    two_n = 2 * n_ring
    out = []
    skipset = set(skip)
    q = (1 << bits) + 1 - two_n  # largest candidate < 2^bits with q ≡ 1 mod 2N
    while ((1 << bits) - q) % two_n != ((1 << bits) - 1) % two_n:
        q -= 1  # unreachable; kept for clarity
    # align: find largest q < 2^bits with q % two_n == 1
    q = (1 << bits) - 1
    q -= (q - 1) % two_n
    while len(out) < count:
        if q < (1 << (bits - 1)):
            raise RuntimeError("ran out of primes in the requested bit range")
        if q not in skipset and is_prime(q):
            out.append(q)
        q -= two_n
    return out


def primitive_root_2n(q: int, n_ring: int) -> int:
    """A primitive 2N-th root of unity psi mod q (psi^N = -1)."""
    two_n = 2 * n_ring
    assert (q - 1) % two_n == 0
    rng = random.Random(q)  # deterministic per prime
    while True:
        x = rng.randrange(2, q - 1)
        psi = pow(x, (q - 1) // two_n, q)
        if pow(psi, n_ring, q) == q - 1:
            return psi


def bit_reverse(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r
