"""PolynomialRegression golden test (reference examples/tests/
PolynomialRegression.py)."""

import numpy as np

from dacapo_tpu.models.kernels import polyreg_golden
from examples.common import run_test
from examples.benchmarks.PolynomialRegression import trace


def run(pipeline="pars", waterline=40, profile=None, nt=4096):
    # deeper than tpu_n14's 7 levels (PARS "failed to infer modswitch" =
    # chain exhausted); the reference runs the basic list at SEAL N=2^15,
    # 13 levels (profiled_SEAL_CPU.json) — use the parity profile
    profile = profile or "tpu_n15"
    rng = np.random.default_rng(100)
    x = rng.uniform(-1, 1, nt)
    y = 0.5 + 1.5 * x - 0.7 * x * x + rng.uniform(-0.01, 0.01, nt)
    trace(nt=nt)
    W = polyreg_golden(x, y, n_mean=nt // 2)
    return run_test("PolynomialRegression", pipeline, waterline, profile,
                    [x, y], W,
                    postprocess=lambda res: [res[i][0] for i in range(3)])


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
