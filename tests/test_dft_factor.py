"""FFT factorization of the bootstrap slot transform vs the dense matrix.

Checks, for small rings, that the sparse-diagonal stage/level products
reproduce A @ P_brv (SlotToCoeff direction) and its inverse (CoeffToSlot),
for several merge radices — the correctness basis for the factored
CoeffToSlot/SlotToCoeff in crypto/bootstrap_native.py.
"""

import numpy as np
import pytest

from dacapo_tpu.crypto.dft_factor import (
    build_levels, dense_from_diags, dense_reference, _brv_perm,
    forward_stage_diags, inverse_stage_diags, diag_mul,
)


def _compose(levels, s):
    m = np.eye(s, dtype=np.complex128)
    for lv in levels:  # application order: left-multiply
        m = dense_from_diags(lv, s) @ m
    return m


@pytest.mark.parametrize("n", [16, 64, 256])
@pytest.mark.parametrize("radix", [1, 2, 3, 5])
def test_forward_levels_match_dense(n, radix):
    s = n // 2
    A, brv = dense_reference(n)
    want = A[:, brv]           # A @ P_brv  (P[j, brv[j]] = 1)
    got = _compose(build_levels(n, radix, inverse=False), s)
    assert np.max(np.abs(got - want)) < 1e-9


@pytest.mark.parametrize("n", [16, 64, 256])
@pytest.mark.parametrize("radix", [1, 2, 3, 5])
def test_inverse_levels_match_dense(n, radix):
    s = n // 2
    A, brv = dense_reference(n)
    want = np.linalg.inv(A[:, brv])
    got = _compose(build_levels(n, radix, inverse=True), s)
    assert np.max(np.abs(got - want)) < 1e-9


def test_stage_inverse_consistency():
    n, s = 64, 32
    for i in range(1, 6):
        f = dense_from_diags(forward_stage_diags(n, i), s)
        inv = dense_from_diags(inverse_stage_diags(n, i), s)
        assert np.max(np.abs(inv @ f - np.eye(s))) < 1e-10


def test_diag_mul_matches_dense():
    rng = np.random.default_rng(0)
    s = 16
    a = {0: rng.normal(size=s) + 0j, 3: rng.normal(size=s) + 0j}
    b = {1: rng.normal(size=s) + 0j, 13: rng.normal(size=s) + 0j}
    got = dense_from_diags(diag_mul(a, b, s), s)
    want = dense_from_diags(a, s) @ dense_from_diags(b, s)
    assert np.max(np.abs(got - want)) < 1e-12


def test_diag_counts():
    """Level merged from r stages has at most 2^(r+1)-1 diagonals."""
    n = 256
    for radix in (1, 2, 4):
        for lv in build_levels(n, radix, inverse=True):
            assert len(lv) <= 2 ** (radix + 1) - 1


def test_roundtrip_on_vectors():
    n, s = 128, 64
    rng = np.random.default_rng(1)
    u = rng.normal(size=s) + 1j * rng.normal(size=s)
    A, brv = dense_reference(n)
    fwd = _compose(build_levels(n, 3, inverse=False), s)
    inv = _compose(build_levels(n, 3, inverse=True), s)
    z = A[:, brv] @ u
    assert np.max(np.abs(fwd @ u - z)) < 1e-9
    assert np.max(np.abs(inv @ z - u)) < 1e-9
