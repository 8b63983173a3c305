"""Benchmark: photon-transport throughput on the flagship config.

Runs BASELINE config #1 (homogeneous Rayleigh layer, reflected-light Stokes
spectrum) on the available accelerator and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "photons/s", "vs_baseline": N}

``vs_baseline`` is measured against the BASELINE.json north star of 1e8
photon packets/s per chip.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 1.0e8  # photons/s/chip (BASELINE.md)


def main():
    from artes_tpu import presets
    from artes_tpu.config import ArtesConfig, detector_setup
    from artes_tpu.runner import _kernel_static
    from artes_tpu.transport.kernel import run_batch
    from artes_tpu.transport.tables import build_tables

    dtype = jnp.float32
    atm = presets.rayleigh_single_layer(tau=5.0)
    cfg = ArtesConfig()
    cfg.mode = "spectrum"
    det = detector_setup(cfg, float(atm.rfront[-1]))
    static = _kernel_static(cfg, det, atm, False)
    prep = build_tables(atm, cfg, det, 0, dtype=dtype)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 19
    ids = jnp.arange(batch, dtype=jnp.uint32)

    # compile + warmup
    out = run_batch(prep.tables, static, ids, 0)
    jax.block_until_ready(out)

    # timed: several batches with distinct photon ids
    n_rep = 5
    t0 = time.perf_counter()
    for i in range(n_rep):
        out = run_batch(prep.tables, static, ids + jnp.uint32(i * batch), jnp.uint32(i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    throughput = n_rep * batch / dt
    det_i = float(np.asarray(out["detector"], np.float64)[:, 0, 0].sum())
    result = {
        "metric": "photon packets/s/chip (Rayleigh tau=5 reflected-light, full Stokes peel)",
        "value": throughput,
        "unit": "photons/s",
        "vs_baseline": throughput / NORTH_STAR,
        "batch": batch,
        "detector_I_raw": det_i,
        "device": str(jax.devices()[0]),
        "n_error": int(out["n_error"]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
