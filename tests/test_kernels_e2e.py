"""End-to-end encrypted runs of the non-CNN benchmarks vs their goldens.

Each reference benchmark graph (SURVEY.md §2.2: SobelFilter, HarrisCorner,
LinearRegression, PolynomialRegression, Multivariate) traced, compiled with
--pars, executed over the JAX crypto layer, decrypted, RMS-checked — the
`hc-test` flow at unit-test scale.
"""

import numpy as np
import pytest

import dacapo_tpu as hc
from dacapo_tpu.crypto.params import COMPILER_PROFILES
from dacapo_tpu.crypto.scheme import Scheme
from dacapo_tpu.ir import trace as trace_mod
from dacapo_tpu.ir.config import load_profile
from dacapo_tpu.passes.rewrite import (
    cse, canonicalize, elide_constants, privatize_constants,
)
from dacapo_tpu.passes.pipeline import compile_function
from dacapo_tpu.vm.executor import HEVMExecutor
from dacapo_tpu.models import kernels as K

PROFILE = "test_boot"      # 14-level chain: fits the 2-epoch GD traces


@pytest.fixture(scope="module")
def scheme():
    load_profile(COMPILER_PROFILES[PROFILE])   # compiler tables
    s = Scheme(PROFILE)
    s.generate_keys()
    return s


def _run_body(scheme, body, n_args, args, waterline=25):
    trace_mod._module.reset()
    fn = hc.func(",".join(["c"] * n_args))(body).eval()
    cse(fn)
    canonicalize(fn)
    payloads = elide_constants(fn)
    privatize_constants(fn)
    canonicalize(fn)
    prog = compile_function(fn, "pars", waterline)
    ex = HEVMExecutor(scheme, prog, payloads)
    ex.preprocess()
    return ex.run(args, jit=False)


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


def test_sobel(scheme):
    n = scheme.ctx.config.n_slots
    w = 16
    img = np.random.default_rng(0).uniform(0, 1, n) * 0.5
    out = _run_body(scheme, lambda x: K.sobel_body(x, w=w), 1, [img])
    want = K.sobel_golden(img, w=w)
    assert rms(out[0], want) < 5e-3, rms(out[0], want)


def test_harris(scheme):
    n = scheme.ctx.config.n_slots
    w = 16
    img = np.random.default_rng(1).uniform(0, 1, n) * 0.5
    out = _run_body(scheme, lambda x: K.harris_body(x, w=w), 1, [img])
    want = K.harris_golden(img, w=w)
    assert rms(out[0], want) < 5e-3, rms(out[0], want)


def test_linear_regression(scheme):
    n = scheme.ctx.config.n_slots
    log_n = int(np.log2(n))
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, n)
    y = 2.0 * x + 1.0 + rng.uniform(-0.01, 0.01, n)

    out = _run_body(
        scheme,
        lambda a, b: K.linreg_body(a, b, log_n=log_n, n_mean=n), 2, [x, y])
    W, b = K.linreg_golden(x, y, n_mean=n)
    got = np.array([out[0][0], out[1][0]])
    assert rms(got, [W, b]) < 1e-3, (got, W, b)


def test_polynomial_regression(scheme):
    n = scheme.ctx.config.n_slots
    log_n = int(np.log2(n))
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, n)
    y = 0.5 + 1.5 * x - 0.7 * x * x + rng.uniform(-0.01, 0.01, n)

    out = _run_body(
        scheme,
        lambda a, b: K.polyreg_body(a, b, log_n=log_n, n_mean=n), 2, [x, y])
    W = K.polyreg_golden(x, y, n_mean=n)
    got = np.array([out[i][0] for i in range(3)])
    assert rms(got, W) < 1e-3, (got, W)


def test_multivariate(scheme):
    n = scheme.ctx.config.n_slots
    log_n = int(np.log2(n))
    rng = np.random.default_rng(4)
    X = [rng.uniform(-1, 1, n) for _ in range(3)]
    Y = [X[0] + 0.5 * X[1] - X[2] + rng.uniform(-0.01, 0.01, n)
         for _ in range(3)]

    out = _run_body(
        scheme,
        lambda *a: K.multivariate_body(*a, log_n=log_n, n_mean=n),
        6, X + Y)
    W = K.multivariate_golden(X, Y, n_mean=n)
    got = np.array([out[k][0] for k in range(9)]).reshape(3, 3)
    assert rms(got, W) < 1e-3, (got, W)
