"""Quantify the max_scatter truncation bias (writes the TRUNCATION.md table).

Runs BASELINE config #1 through the Pallas kernel at several caps and prints
detector-I drift + capped-photon fractions. Requires a TPU (or edit to use
run_stream on CPU at a smaller photon count).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport import pallas_stream as P
from artes_tpu.transport.tables import build_tables

atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig()
cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
prep = build_tables(atm, cfg, det, 0, dtype=jnp.float32)
n, W = 1 << 26, 8192
base = None
for cap in (64, 128, 256, 512, 1024):
    static = dataclasses.replace(_kernel_static(cfg, det, atm, False),
                                 max_scatter=cap)
    out = P.run_stream_pallas(prep.tables, static, n, 13, W)
    d = np.asarray(out["detector"], np.float64)
    I = d[0, 0, 0]
    ncap = int(out["n_alive_at_cap"])
    mc_rel = 1.0 / np.sqrt(d[0, 0, 2])
    if base is None:
        base = I
    print(f"cap={cap:5d}: I={I:.8e} drift={(I - base) / base:+.3e} "
          f"capped={ncap} ({ncap / n:.2e}) mc_rel={mc_rel:.1e}", flush=True)
