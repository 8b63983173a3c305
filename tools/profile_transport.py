"""Fetch-synchronized timing of the real transport kernel."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time
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
cfg = ArtesConfig(); cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
prep = build_tables(atm, cfg, det, 0, dtype=dtype)
t = prep.tables

RTT = None

def fetch_time(thunk, n=1):
    """Run thunk n times, then fetch a scalar; returns total wall seconds."""
    t0 = time.perf_counter()
    s = 0.0
    for i in range(n):
        out = thunk(i)
    s = float(jnp.sum(out["detector"])) if isinstance(out, dict) else float(jnp.sum(out))
    return time.perf_counter() - t0

# measure RTT with a trivial fetch
x = jnp.ones((8,), dtype)
f = jax.jit(lambda x: x + 1)
_ = float(jnp.sum(f(x)))
t0 = time.perf_counter()
for _ in range(5):
    _ = float(jnp.sum(f(x)))
RTT = (time.perf_counter() - t0) / 5
print("fetch RTT %.1f ms" % (1e3 * RTT))

for B in (65536, 262144, 1048576):
    ids = jnp.arange(B, dtype=jnp.uint32)
    thunk = lambda i: run_batch(t, static, ids + jnp.uint32(i * B), jnp.uint32(i))
    _ = fetch_time(thunk, 1)  # warm/compile
    for n in (1, 4):
        dt = fetch_time(thunk, n)
        eff = dt - RTT
        print("run_batch  B=%-8d n=%d  wall=%7.1f ms  eff=%7.1f ms  -> %.3g photons/s"
              % (B, n, 1e3 * dt, 1e3 * eff, n * B / eff))

for W in (131072, 262144):
    for N in (1 << 20,):
        thunk = lambda i: run_stream(t, static, N, jnp.uint32(100 + i), W)
        _ = fetch_time(thunk, 1)  # warm/compile
        dt = fetch_time(thunk, 1)
        eff = dt - RTT
        print("run_stream W=%-8d N=%d  wall=%7.1f ms  eff=%7.1f ms  -> %.3g photons/s"
              % (W, N, 1e3 * dt, 1e3 * eff, N / eff))
