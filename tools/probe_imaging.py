"""Measure imaging throughput vs detector size on the current kernel.

Usage: python tools/probe_imaging.py [npix ...]   (default 1 2 25 45 101)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static, PALLAS_WIDTH
from artes_tpu.transport import pallas_stream
from artes_tpu.transport.tables import build_tables

dtype = jnp.float32
atm = presets.rayleigh_single_layer(tau=5.0)


def setup(npix):
    cfg = ArtesConfig()
    cfg.mode = "imaging_mono" if npix > 1 else "spectrum"
    cfg.npix = npix
    det = detector_setup(cfg, float(atm.rfront[-1]))
    static = _kernel_static(cfg, det, atm, False)
    prep = build_tables(atm, cfg, det, 0, dtype=dtype)
    return static, prep


def measure(npix, n, reps=3):
    static, prep = setup(npix)
    assert pallas_stream.supports(prep.tables, static)
    kern = pallas_stream.run_stream_pallas
    out = kern(prep.tables, static, n, 11, PALLAS_WIDTH)
    _ = float(jnp.sum(jnp.asarray(out["detector"])))  # compile fence
    best = None
    for _r in range(reps):
        t0 = time.perf_counter()
        out = kern(prep.tables, static, n, 12, PALLAS_WIDTH)
        _ = float(jnp.sum(jnp.asarray(out["detector"])))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return n / best


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 25, 45, 101]
    for s in sizes:
        n = 1 << 25 if s <= 45 else 1 << 23
        tp = measure(s, n)
        print(f"npix={s}x{s}: {tp/1e6:.1f} M photons/s  (n=2^{int(np.log2(n))})",
              flush=True)
