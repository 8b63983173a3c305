import time, sys
import sys; sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])
import jax, jax.numpy as jnp, numpy as np
from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport import pallas_stream as P
from artes_tpu.transport.kernel import run_stream
from artes_tpu.transport.tables import build_tables

atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig(); cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
prep = build_tables(atm, cfg, det, 0, dtype=jnp.float32)
print("supports:", P.supports(prep.tables, static), flush=True)

W = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
t0 = time.perf_counter()
out = P.run_stream_pallas(prep.tables, static, W, 11, W)
s = float(jnp.sum(out["detector"]))  # host fetch = fence
print(f"compile+first run: {time.perf_counter()-t0:.1f}s det_sum={s:.4f} "
      f"n_err={int(out['n_error'])} n_emitted={int(out['n_emitted'])}", flush=True)

for n in (1<<21, 1<<23):
    t0 = time.perf_counter()
    out = P.run_stream_pallas(prep.tables, static, n, 13, W)
    stats = (float(jnp.sum(out["detector"])), int(out["n_error"]),
             int(out["n_alive_at_cap"]), int(out["n_emitted"]), int(out["n_rounds"]))
    dt = time.perf_counter() - t0
    print(f"n={n} W={W}: {n/dt/1e6:.2f}M photons/s  (dt={dt:.2f}s) "
          f"det={stats[0]:.2f} err={stats[1]} cap={stats[2]} emitted={stats[3]} rounds={stats[4]}", flush=True)

# cross-check vs XLA kernel on device, small n
ref = run_stream(prep.tables, static, 1<<16, 13, 1<<16)
outp = P.run_stream_pallas(prep.tables, static, 1<<16, 13, W)
dr = np.asarray(ref["detector"], np.float64); dp = np.asarray(outp["detector"], np.float64)
print("counts equal:", np.array_equal(dr[...,2], dp[...,2]),
      " I rel diff:", abs(dp[0,0,0]-dr[0,0,0])/abs(dr[0,0,0]))
