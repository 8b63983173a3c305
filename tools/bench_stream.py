"""Quick throughput check of run_stream vs run_batch on the real chip."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport.kernel import run_batch, run_stream
from artes_tpu.transport.tables import build_tables

dtype = jnp.float32
atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig()
cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
prep = build_tables(atm, cfg, det, 0, dtype=dtype)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
width = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 17

out = run_stream(prep.tables, static, n, 0, width)
_ = float(jnp.sum(out["detector"]))  # compile + fence
t0 = time.perf_counter()
out = run_stream(prep.tables, static, n, 1, width)
_ = float(jnp.sum(out["detector"]))
dt = time.perf_counter() - t0
print(f"run_stream: {n / dt:.0f} photons/s  ({dt:.2f}s, n={n}, width={width}, "
      f"n_error={int(out['n_error'])}, n_rounds={int(out['n_rounds'])}, "
      f"n_cap={int(out['n_alive_at_cap'])})")
