"""A/B the full grid-mode train step with native vs packed filter grads.

Chained-scan timing per the NOTES.md measurement rule. The microbench
(diag_dw.py) showed the isolated dw reformulation is a wash; this measures
it in the real step where fusion/scheduling context differs.
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

import cellulus_tpu

cellulus_tpu.enable_compilation_cache()

from cellulus_tpu.datasets.sampling import PairSampler
from cellulus_tpu.models import UNetSpec, init_params, model_flops
from cellulus_tpu.train import make_multi_step, make_optimizer, make_train_step_grid

print("device:", jax.devices()[0].device_kind, flush=True)
PEAK = 197e12
B, SIZE, K_STEPS = 8, 252, 20

spec = UNetSpec(1, 2, 64, 3, 64, ((2, 2),), 2)
params = init_params(jax.random.PRNGKey(0), spec)
optimizer = make_optimizer(4e-5)
sampler = PairSampler((SIZE - 16, SIZE - 16), density=0.1, kappa=10.0)
rng = np.random.default_rng(0)
raw_K = jnp.asarray(rng.random((K_STEPS, B, SIZE, SIZE, 1), np.float32))
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(7), i))(
    jnp.arange(K_STEPS)
)
step_flops = 3 * model_flops(spec, (SIZE, SIZE)) * B

for packed in (False, True):
    step = make_train_step_grid(
        spec, optimizer, 10.0, 1e-5, sampler, B, jnp.bfloat16, packed_dw=packed
    )
    multi = jax.jit(make_multi_step(step))
    opt_state = optimizer.init(params)
    out = multi(params, opt_state, raw_K, keys)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = multi(params, opt_state, raw_K, keys)
    jax.block_until_ready(out)
    t = (time.perf_counter() - t0) / K_STEPS
    print(
        f"packed_dw={packed}: {1e3 * t:.2f} ms/step  "
        f"MFU {100 * step_flops / t / PEAK:.1f}%  "
        f"({B / t:.1f} samples/s)",
        flush=True,
    )
