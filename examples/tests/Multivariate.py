"""Multivariate golden test (reference examples/tests/Multivariate.py)."""

import numpy as np

from dacapo_tpu.models.kernels import multivariate_golden
from examples.common import run_test
from examples.benchmarks.Multivariate import trace


def run(pipeline="pars", waterline=40, profile=None, nt=4096):
    profile = profile or "tpu_n14"
    rng = np.random.default_rng(100)
    X = [rng.uniform(-1, 1, nt) for _ in range(3)]
    Y = [X[0] + 0.5 * X[1] - X[2] + rng.uniform(-0.01, 0.01, nt)
         for _ in range(3)]
    trace(nt=nt)
    W = multivariate_golden(X, Y, n_mean=nt // 2)
    return run_test("Multivariate", pipeline, waterline, profile,
                    X + Y, W.ravel(),
                    postprocess=lambda res: [res[k][0] for k in range(9)])


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
