"""ResNet20 golden test (reference examples/tests/ResNet.py:85-118):
encrypted CIFAR-10 forward pass vs the torch model, RMS over the 10 logits."""

import numpy as np
import torch

from dacapo_tpu.models.cnn_he import resnet_pack_input, resnet_postprocess
from examples.common import run_test
from examples.benchmarks.ResNet import trace, get_model


def run(pipeline="dacapo", waterline=40, profile=None, nt=2 ** 14, **kw):
    profile = profile or "tpu_n15"
    model = get_model()
    x = torch.randn(1, 3, 32, 32, dtype=torch.double,
                    generator=torch.Generator().manual_seed(100))
    trace(nt=nt, model=model)
    with torch.no_grad():
        want = model(x).numpy().ravel()
    packed = resnet_pack_input(x.numpy(), model, nt=nt)
    return run_test("ResNet", pipeline, waterline, profile,
                    [packed], want,
                    postprocess=lambda res: resnet_postprocess(res[0]), **kw)


if __name__ == "__main__":
    import sys
    run(*(sys.argv[1:] or []))
