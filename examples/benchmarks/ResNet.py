"""ResNet20 benchmark: CIFAR-10 ResNet with SiLU activations under MPCB
packing, bootstrapped between blocks (reference examples/benchmarks/
ResNet.py:39-136). Weights: the reference's trained checkpoint
(examples/data/resnet20.silu.model — the model behind the published
RMS 9.5152e-4); deterministic-random fallback when absent."""

import os

import torch

from dacapo_tpu.models.resnet import resnet20, randomize
from dacapo_tpu.models.cnn_he import resnet_he_forward
from examples.common import trace_and_save

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "data", "resnet20.silu.model")


def get_model(seed=0, pretrained=True):
    if pretrained and os.path.exists(CKPT):
        m = resnet20()
        sd = torch.load(CKPT, map_location="cpu")["state_dict"]
        sd = {k.removeprefix("module."): v for k, v in sd.items()}
        m.load_state_dict(sd)
        return m.double().eval()
    return randomize(resnet20(), seed=seed).double()


def trace(dirs="traced", cst_dirs=None, nt=2 ** 14, model=None):
    model = model or get_model()
    return trace_and_save(
        "ResNet", "c",
        lambda x: resnet_he_forward(x, model, nt=nt), dirs, cst_dirs)


if __name__ == "__main__":
    print(trace())
