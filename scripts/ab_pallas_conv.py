"""A/B the fused Pallas conv pass vs XLA convs on the TTA inference path.

Runs the bench-shape TTA tile function (32 noise passes, 252^2 tiles,
64 fmaps) chained in a scan so the tunneled runtime cannot elide work
(NOTES.md measurement rule), with and without the fused kernel. Also
verifies numerical agreement on one batch.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax import lax

import cellulus_tpu

cellulus_tpu.enable_compilation_cache()
from cellulus_tpu.models import UNetSpec, init_params, model_flops, tta_embeddings

spec = UNetSpec(1, 2, 64, 3, 64, ((2, 2),), 2)
params = init_params(jax.random.PRNGKey(0), spec)
rng = np.random.default_rng(0)
TILES = int(os.environ.get("AB_TILES", "4"))
tiles = jnp.asarray(rng.random((TILES, 252, 252, 1), np.float32))
keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(
    jnp.arange(TILES)
)
N_ITER = int(os.environ.get("AB_ITERS", "8"))


def make_loop(fused):
    def tta_batch(ts):
        def one(tile, key):
            return tta_embeddings(
                spec, params, tile, key, 0.01, 16, jnp.bfloat16,
                fused_conv_pass=fused,
            )

        return jax.vmap(one)(ts, keys)

    @jax.jit
    def loop(ts):
        def body(i, t):
            out = tta_batch(t)
            # chain: feed a scalar of the output back so work can't be elided
            bump = jnp.mean(out).astype(t.dtype) * 1e-12
            return t + bump

        return lax.fori_loop(0, N_ITER, body, ts)

    return loop


def timed(loop):
    out = loop(tiles)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = loop(tiles)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N_ITER


flops = 32 * TILES * model_flops(spec, (252, 252))
for fused in (False, True):
    t = timed(make_loop(fused))
    print(
        f"fused={fused}: {1e3 * t:.2f} ms per {TILES}-tile TTA batch "
        f"({flops / t / 1e12:.1f} TFLOPs, MFU {100 * flops / t / 197e12:.1f}%)",
        flush=True,
    )

# numerical agreement on one batch
def tta(fused):
    return jax.jit(
        lambda ts: jax.vmap(
            lambda tile, key: tta_embeddings(
                spec, params, tile, key, 0.01, 16, jnp.bfloat16,
                fused_conv_pass=fused,
            )
        )(ts, keys)
    )(tiles)


a = np.asarray(tta(False), np.float32)
b = np.asarray(tta(True), np.float32)
rel = np.abs(a - b) / (np.abs(a) + 1e-3)
print(f"agreement: max abs diff {np.abs(a - b).max():.4f}, "
      f"max rel {rel.max():.4f} (bf16 noise expected)", flush=True)
