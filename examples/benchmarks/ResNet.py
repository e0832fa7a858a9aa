"""ResNet20 benchmark: CIFAR-10 ResNet with SiLU activations under MPCB
packing, bootstrapped between blocks (reference examples/benchmarks/
ResNet.py:39-136). The reference loads resnet20.silu.model; weights here are
deterministic-random with calibrated BN (models/resnet.randomize)."""

import torch

from dacapo_tpu.models.resnet import resnet20, randomize
from dacapo_tpu.models.cnn_he import resnet_he_forward
from examples.common import trace_and_save


def get_model(seed=0):
    return randomize(resnet20(), seed=seed).double()


def trace(dirs="traced", cst_dirs=None, nt=2 ** 14, model=None):
    model = model or get_model()
    return trace_and_save(
        "ResNet", "c",
        lambda x: resnet_he_forward(x, model, nt=nt), dirs, cst_dirs)


if __name__ == "__main__":
    print(trace())
