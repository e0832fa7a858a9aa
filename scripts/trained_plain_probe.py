"""Probe the trained-checkpoint RMS collapse WITHOUT crypto: run the MPCB
packing algebra on plain numpy with the reference's trained resnet20
checkpoint and compare against torch. If this already fails, the 2.608 RMS
(VERDICT r4 #2) is a graph/approximation-domain problem, not crypto noise.

Also prints the max |pre-activation| seen at each HE_SiLU call site — the
sign/sigmoid polynomial is fitted on [-1,1] (slot domain, model runs on
x/bb); any site with |x|>1 diverges hard (degree-95 Chebyshev outside its
domain).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import torch

from examples.benchmarks.ResNet import get_model
from dacapo_tpu.models.cnn_he import (
    resnet_he_forward, resnet_pack_input, resnet_postprocess)
from dacapo_tpu.poly import hefunc


def rms(a, b):
    d = np.asarray(a, np.float64).ravel() - np.asarray(b, np.float64).ravel()
    return float(np.sqrt(np.mean(d * d)))


model = get_model(pretrained=True)
print("pretrained:", os.path.exists(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "data", "resnet20.silu.model")))

torch.manual_seed(42)
x = torch.randn(1, 3, 32, 32, dtype=torch.double)

# instrument HE_SiLU input range
orig_silu = hefunc.HE_SiLU
site = [0]


def probing_silu(v):
    mx = max(float(np.max(np.abs(np.asarray(c, np.float64)))) for c in v.ravel())
    flag = "  <-- OUT OF DOMAIN" if mx > 1.0 else ""
    print(f"silu[{site[0]:2d}] max|x| = {mx:.4f}{flag}", flush=True)
    site[0] += 1
    return orig_silu(v)


hefunc.HE_SiLU = probing_silu

nt, bb = 2 ** 14, 32
packed = resnet_pack_input(x.numpy(), model, nt=nt, bb=bb)
out = resnet_he_forward(packed, model, nt=nt, bb=bb, act=probing_silu,
                        use_bootstrap=False)
got = resnet_postprocess(out, out_dim=10, bb=bb)
with torch.no_grad():
    want = model(x).numpy().ravel()
print("torch logits:", np.round(want, 4))
print("mpcb  logits:", np.round(got, 4))
print("rms:", rms(got, want))
