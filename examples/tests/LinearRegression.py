"""LinearRegression golden test (reference examples/tests/
LinearRegression.py): 2-epoch GD; compare learned (W, b)."""

import numpy as np

from dacapo_tpu.models.kernels import linreg_golden
from examples.common import run_test
from examples.benchmarks.LinearRegression import trace


def run(pipeline="pars", waterline=40, profile=None, nt=4096):
    profile = profile or "tpu_n14"
    rng = np.random.default_rng(100)
    x = rng.uniform(-1, 1, nt)
    y = 2.0 * x + 1.0 + rng.uniform(-0.01, 0.01, nt)
    trace(nt=nt)
    W, b = linreg_golden(x, y, n_mean=nt // 2)
    return run_test("LinearRegression", pipeline, waterline, profile,
                    [x, y], [W, b],
                    postprocess=lambda res: [res[0][0], res[1][0]])


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
