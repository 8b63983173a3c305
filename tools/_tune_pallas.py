import time, sys
import jax.numpy as jnp
from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport import pallas_stream as P
from artes_tpu.transport.tables import build_tables

atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig(); cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
prep = build_tables(atm, cfg, det, 0, dtype=jnp.float32)

for W in (16384, 24576, 30720):
    try:
        out = P.run_stream_pallas(prep.tables, static, W, 1, W)
        _ = float(jnp.sum(out["detector"]))
        n = 1 << 24
        t0 = time.perf_counter()
        out = P.run_stream_pallas(prep.tables, static, n, 13, W)
        s = (float(jnp.sum(out["detector"])), int(out["n_error"]), int(out["n_rounds"]))
        dt = time.perf_counter() - t0
        print(f"W={W}: {n/dt/1e6:.2f}M photons/s (dt={dt:.2f}s) err={s[1]} rounds={s[2]}", flush=True)
    except Exception as e:
        print(f"W={W}: FAILED {str(e)[:160]}", flush=True)
