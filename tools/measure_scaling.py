"""Scaling measurement (BASELINE.md: >90% efficiency at 1 chip / 1 host / N
hosts) — produces SCALING.json.

Three measured components, honestly labelled for this machine (ONE real TPU
chip, 2 CPU cores):

A. **Sharded-program overhead sweep** (virtual 8-device CPU mesh): per-step
   wall time of the full jitted shard_map transport step at 1/2/4/8 devices
   with fixed photons per device. The host has 2 physical cores, so wall
   time necessarily grows with device count — the quantity this sweep pins
   is the SHARDING OVERHEAD: t_N / (N * t_1) <= 1 + overhead on a
   compute-starved host, and the psum payload is constant per step.

B. **Communication-to-compute model from measured quantities**: the psum
   payload per 2^30-photon chunk (detector + tallies, measured bytes) over
   the measured single-chip chunk time, against TPU v5e ICI all-reduce
   bandwidth (45 GB/s per link, public spec). Monte-Carlo transport is
   embarrassingly parallel — photons never interact and the atmosphere is
   replicated — so cross-chip traffic is ONE all-reduce of the detector per
   chunk, independent of photon count.

C. **Real multi-process execution**: tests/test_multihost.py runs 2
   jax.distributed processes with block-cyclic wavelength ownership and
   bit-identical merged results (zero inter-host communication by design).

Run: python tools/measure_scaling.py  (writes SCALING.json at the repo root)
"""

import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport.kernel import run_batch
from artes_tpu.transport.tables import build_tables

PER_DEVICE = 256
ICI_ALLREDUCE_GBPS = 45.0         # TPU v5e per-link ICI (public spec)
SINGLE_CHIP_RATE = 85.7e6          # photons/s, Pallas kernel, this round's probe


def step_time(n_dev, tables, static):
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices), ("photons",))
    ids = jnp.arange(PER_DEVICE * n_dev, dtype=jnp.uint32)

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("photons"), P()),
             out_specs=P(), check_vma=False)
    def step(tab, ids, seed):
        out = run_batch(tab, static, ids, seed[0])
        return jax.tree.map(lambda x: jax.lax.psum(x, "photons"), out)

    seed = jnp.zeros((1,), jnp.uint32)
    out = step(tables, ids, seed)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = step(tables, ids, seed)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    atm = presets.rayleigh_single_layer(tau=5.0)
    cfg = ArtesConfig()
    cfg.mode = "spectrum"
    det = detector_setup(cfg, float(atm.rfront[-1]))
    static = _kernel_static(cfg, det, atm, False)
    prep = build_tables(atm, cfg, det, 0, dtype=jnp.float32)

    sweep = {}
    payload_bytes = None
    for n_dev in (1, 2, 4, 8):
        t, out = step_time(n_dev, prep.tables, static)
        if payload_bytes is None:
            payload_bytes = int(sum(np.asarray(v).nbytes
                                    for v in jax.tree.leaves(out)))
        sweep[n_dev] = t
    t1 = sweep[1]
    overhead = {n: sweep[n] / (n * t1) for n in sweep}

    # communication model per 2^30-photon chunk at the measured chip rate
    chunk_photons = 1 << 30
    t_compute = chunk_photons / SINGLE_CHIP_RATE
    t_comm = payload_bytes / (ICI_ALLREDUCE_GBPS * 1e9)
    eff_model = t_compute / (t_compute + t_comm)

    result = {
        "weak_scaling_virtual_mesh": {
            "photons_per_device": PER_DEVICE,
            "physical_cores": os.cpu_count(),
            "step_seconds": sweep,
            "normalized_time_per_unit_work": overhead,
            "note": "8 virtual XLA CPU devices on 2 physical cores: wall "
                    "time growth reflects core starvation; the sharded "
                    "program itself adds the payload below per step only",
        },
        "communication_model": {
            "psum_payload_bytes_per_chunk": payload_bytes,
            "chunk_photons": chunk_photons,
            "single_chip_rate_photons_s": SINGLE_CHIP_RATE,
            "chunk_compute_seconds": t_compute,
            "ici_allreduce_gbps": ICI_ALLREDUCE_GBPS,
            "allreduce_seconds": t_comm,
            "projected_photon_axis_efficiency": eff_model,
        },
        "multi_process": {
            "mechanism": "jax.distributed + block-cyclic wavelength ownership"
                         " (artes_tpu.parallel.multihost)",
            "validated_by": "tests/test_multihost.py (2 processes, merged "
                            "spectrum == unsharded at rtol 1e-12)",
            "inter_host_traffic": "none during transport (per-wavelength "
                                  "outputs are process-local)",
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result["communication_model"], indent=1))
    print("written:", out_path)


if __name__ == "__main__":
    main()
