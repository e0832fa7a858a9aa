import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import dacapo_tpu as hc
from examples.common import trace_and_save, compile_traced
from dacapo_tpu.runtime.runner import HEVM
import tempfile
d = tempfile.mkdtemp()
rng = np.random.default_rng(7)
n = 1024
w = rng.normal(0, 0.5, n)
def body(x):
    a = (x * hc.Plain(w)) * x
    b = x.rotate(1) + x
    c = a + b * hc.Plain(w)
    return c * c
trace_and_save("Comp", "c", body, dirs=d)
hv = compile_traced("Comp", "pars", 40, "test_n11c", traced_dir=d, out_dir=d)
from dacapo_tpu.vm.hevm import HEVMProgram
prog = HEVMProgram.load(hv)
print("init_level", prog.init_level, "arg_level", prog.arg_level)
print(prog.dump())

hevm = HEVM(profile="test_n11c", keyset_dir=tempfile.mkdtemp(), jit=False)
import os
hevm.load(os.path.join(d, "_hecate_Comp.cst"), hv)
x = rng.uniform(-1, 1, n)
hevm.setInput(0, x)
import traceback
os.environ["JAX_TRACEBACK_FILTERING"] = "off"
try:
    hevm.run()
except Exception:
    traceback.print_exc()
