"""Benchmark: photon-transport throughput on the flagship config.

Runs BASELINE config #1 (homogeneous Rayleigh layer, reflected-light Stokes
spectrum) through the production kernel path — the fused Pallas pool kernel
(``pallas_stream.run_stream_pallas``, what ``runner.run_wavelength``
dispatches by default on supported configs) — and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "photons/s", "vs_baseline": N}

``vs_baseline`` measures against the BASELINE.json north star of 1e8 photon
packets/s per chip. ``n_alive_at_cap`` reports photons truncated at the
max_scatter cap (an accuracy knob; bias quantified in TRUNCATION.md);
``imaging_throughput`` exercises the 25x25-pixel detector splat path so the
flagship number is not flattered by the 1-pixel spectrum fast path.
``xla_throughput`` is the XLA regeneration-kernel fallback on the same config,
and ``pallas_vs_xla_I_rel`` the relative detector-I agreement between the two
kernels at matched photon count (MC-noise-level by construction: same photon
streams, f32 trajectory divergence only).

The tunneled TPU on this machine can wedge (device errors leave the runtime
hung); the measurement therefore runs in a watchdogged subprocess with
geometrically smaller loads on retry and a CPU fallback, so the driver
always gets a JSON line.
"""

import json
import os
import subprocess
import sys

NORTH_STAR = 1.0e8  # photons/s/chip (BASELINE.md)

_WORKER = r"""
import json, sys, time
import jax
import jax.numpy as jnp
import numpy as np

platform = sys.argv[1]
n_photons = int(sys.argv[2])
width = int(sys.argv[3])
if platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static, PALLAS_WIDTH
from artes_tpu.transport import pallas_stream
from artes_tpu.transport.kernel import run_stream
from artes_tpu.transport.tables import build_tables

dtype = jnp.float32
atm = presets.rayleigh_single_layer(tau=5.0)

def setup(mode, npix=25):
    cfg = ArtesConfig()
    cfg.mode = mode
    cfg.npix = npix
    det = detector_setup(cfg, float(atm.rfront[-1]))
    static = _kernel_static(cfg, det, atm, False)
    prep = build_tables(atm, cfg, det, 0, dtype=dtype)
    return static, prep

# NOTE: jax.block_until_ready does NOT synchronize on the tunneled axon
# platform (measured: a 4096^3 matmul "completes" in 69 us). Fetching a
# scalar to the host is the only reliable fence, so every timing below ends
# with a float() fetch.

def measure(kern, static, prep, n, seed0, w, reps=4):
    out = kern(prep.tables, static, n, seed0, w)
    _ = float(jnp.sum(out["detector"]))  # warm-up + compile fence
    best = None
    for r in range(reps):     # best-of-reps: the tunneled device's clock
        t0 = time.perf_counter()  # varies ~20% run-to-run
        out = kern(prep.tables, static, n, seed0 + 1, w)
        stat = [float(jnp.sum(out["detector"])), int(out["n_error"]),
                int(out["n_alive_at_cap"])]  # host fetch = completion fence
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return n / best, out, stat

static_s, prep_s = setup("spectrum")
use_pallas = pallas_stream.supports(prep_s.tables, static_s) and platform != "cpu"
if use_pallas:
    kern_s = pallas_stream.run_stream_pallas
    w_s = PALLAS_WIDTH
else:
    kern_s = run_stream
    w_s = width
tp_spec, out, (det_sum, n_err, n_cap) = measure(kern_s, static_s, prep_s,
                                                n_photons, 11, w_s)

# XLA-kernel reference point + kernel agreement at matched photon count
n_x = min(n_photons, 1 << 22)
tp_xla, out_x, (_, n_err_x, _) = measure(run_stream, static_s, prep_s,
                                         n_x, 11, min(width, 1 << 16))
if use_pallas:
    out_p = pallas_stream.run_stream_pallas(prep_s.tables, static_s, n_x, 12,
                                            PALLAS_WIDTH)
    ip = float(np.asarray(out_p["detector"], np.float64)[0, 0, 0])
    ix = float(np.asarray(out_x["detector"], np.float64)[0, 0, 0])
    agree = abs(ip - ix) / abs(ix)
else:
    agree = 0.0

# hydrostatic-scale grid (VERDICT r3 item 1): 39 radial cells with an
# exponentially graded opacity profile — the shape ptprofile.isothermal()'s
# default 40-level P-T grid produces. Must run through the Pallas fast path
# (closed-form radial transport) at full speed, with splat counts bit-equal
# to the XLA kernel.
atm39 = presets.rayleigh_single_layer(tau=4.0, nr=39, shell_km=97.5)
prof = np.exp(np.linspace(2.0, -2.0, 39))[:, None, None, None]
atm39.k_sca = atm39.k_sca * prof
atm39.k_abs = atm39.k_abs * prof
atm39.refresh_derived()
cfg39 = ArtesConfig()
cfg39.mode = "spectrum"
det39 = detector_setup(cfg39, float(atm39.rfront[-1]))
static39 = _kernel_static(cfg39, det39, atm39, False)
prep39 = build_tables(atm39, cfg39, det39, 0, dtype=dtype)
use_pallas39 = pallas_stream.supports(prep39.tables, static39) and platform != "cpu"
if use_pallas39:
    n39 = min(n_photons, 1 << 26)
    tp39, out39, (_, n_err39, _) = measure(
        pallas_stream.run_stream_pallas, static39, prep39, n39, 31, PALLAS_WIDTH)
    # cross-kernel agreement at matched photon count. Bit-equal counts are
    # only guaranteed when both kernels compile through the SAME compiler
    # (the CPU interpret parity suite); on TPU, XLA vs Mosaic make different
    # f32 FMA choices, and on km-thin shells the chord-root cancellation
    # turns those ulps into rare trajectory flips — so the hardware check is
    # statistical: a handful of flipped counts and MC-noise-level I drift.
    n_small = 1 << 16
    o_p = pallas_stream.run_stream_pallas(prep39.tables, static39, n_small, 7,
                                          PALLAS_WIDTH)
    o_x = run_stream(prep39.tables, static39, n_small, 7, 1 << 14)
    c_p = np.asarray(o_p["detector"], np.float64)[..., 2]
    c_x = np.asarray(o_x["detector"], np.float64)[..., 2]
    counts_maxdiff = int(np.abs(c_p - c_x).max())
    i_p = float(np.asarray(o_p["detector"], np.float64)[0, 0, 0])
    i_x = float(np.asarray(o_x["detector"], np.float64)[0, 0, 0])
    agree39 = abs(i_p - i_x) / abs(i_x)
else:
    tp39, n_err39, counts_maxdiff, agree39 = 0.0, -1, -1, -1.0

# flow diagnostics on the nr=39 grid through the fused kernel (r5:
# closed-form per-shell booking, radial.py flow hook; previously flow
# forced the ~5M/s XLA marching fallback)
cfg39f = ArtesConfig()
cfg39f.mode = "spectrum"
cfg39f.flow_global = True
cfg39f.flow_theta = True
det39f = detector_setup(cfg39f, float(atm39.rfront[-1]))
static39f = _kernel_static(cfg39f, det39f, atm39, False)
prep39f = build_tables(atm39, cfg39f, det39f, 0, dtype=dtype)
if pallas_stream.supports(prep39f.tables, static39f) and platform != "cpu":
    tp_flow, _, (_, n_err_f, _) = measure(
        pallas_stream.run_stream_pallas, static39f, prep39f,
        min(n_photons, 1 << 25), 37, PALLAS_WIDTH)
else:
    tp_flow = 0.0

# BASELINE #4-class 3-D grid at reference-like resolution (VERDICT r4 item
# 2): 39 x 8 x 8 = 2,496 cells, patchy theta/phi cloud zones confined to an
# 8-shell deck over a clear column — the shape the reference's zone painter
# produces (ARTES.f90:2800-3470). Runs the 3-D jump-walk fast path
# (transport/jumps.py) at its preferred pool width.
th3 = tuple(np.linspace(0.0, 180.0, 9))
ph3 = tuple(np.linspace(0.0, 360.0, 9)[:-1])
atm3 = presets.patchy_3d(tau_clear=0.2, tau_cloud=3.0, nr=39,
                         theta_deg=th3, phi_deg=ph3)
_k3 = atm3.k_sca.copy()
_clear3 = _k3.min(axis=(1, 2), keepdims=True)
_deck = np.zeros(39, bool)
_deck[20:28] = True
atm3.k_sca = np.where(_deck[:, None, None, None], _k3, _clear3)
atm3.refresh_derived()
cfg3 = ArtesConfig()
cfg3.mode = "spectrum"
det3 = detector_setup(cfg3, float(atm3.rfront[-1]))
static3 = _kernel_static(cfg3, det3, atm3, False)
prep3 = build_tables(atm3, cfg3, det3, 0, dtype=dtype)
if pallas_stream.supports(prep3.tables, static3) and platform != "cpu":
    w3 = pallas_stream.preferred_width(prep3.tables, static3) or PALLAS_WIDTH
    tp3, out3, (_, n_err3, _) = measure(
        pallas_stream.run_stream_pallas, static3, prep3,
        min(n_photons, 1 << 25), 29, w3)
    # statistical cross-kernel check (same caveats as hydrostatic39)
    o3p = pallas_stream.run_stream_pallas(prep3.tables, static3, 1 << 16,
                                          19, w3)
    o3x = run_stream(prep3.tables, static3, 1 << 16, 19, 1 << 14)
    c3p = np.asarray(o3p["detector"], np.float64)[..., 2]
    c3x = np.asarray(o3x["detector"], np.float64)[..., 2]
    grid3_counts_maxdiff = int(np.abs(c3p - c3x).max())
    i3p = float(np.asarray(o3p["detector"], np.float64)[0, 0, 0])
    i3x = float(np.asarray(o3x["detector"], np.float64)[0, 0, 0])
    agree3 = abs(i3p - i3x) / abs(i3x)
else:
    tp3, n_err3, grid3_counts_maxdiff, agree3 = 0.0, -1, -1, -1.0

# thermal source (BASELINE #3 kernel class): emissivity-CDF emission,
# birth peel, flux bookkeeping
atm_t = presets.thermal_shell(tau_abs=0.8, nr=4)
cfg_t = ArtesConfig()
cfg_t.mode = "spectrum"
cfg_t.photon_source = "planet"
det_t = detector_setup(cfg_t, float(atm_t.rfront[-1]))
static_t = _kernel_static(cfg_t, det_t, atm_t, False)
prep_t = build_tables(atm_t, cfg_t, det_t, 0, dtype=dtype)
if pallas_stream.supports(prep_t.tables, static_t) and platform != "cpu":
    tp_th, _, (_, n_err_t, _) = measure(pallas_stream.run_stream_pallas,
                                        static_t, prep_t,
                                        min(n_photons, 1 << 27), 17,
                                        PALLAS_WIDTH)
else:
    tp_th, n_err_t = 0.0, -1

static_i, prep_i = setup("imaging_mono", npix=25)
use_pallas_i = pallas_stream.supports(prep_i.tables, static_i) and platform != "cpu"
if use_pallas_i:
    kern_i, w_i = pallas_stream.run_stream_pallas, PALLAS_WIDTH
    n_img = max(min(n_photons // 2, 1 << 26), w_i)
else:
    kern_i, w_i = run_stream, width
    n_img = max(min(n_photons // 16, 1 << 23), width)
tp_img, out_i, (det_sum_i, n_err_i, n_cap_i) = measure(
    kern_i, static_i, prep_i, n_img, 23, w_i)

# 101x101 detector (VERDICT r4 item 3): the in-kernel MXU one-hot splat
# must hold >=25M photons/s even at 10201 pixels
static_i2, prep_i2 = setup("imaging_mono", npix=101)
if pallas_stream.supports(prep_i2.tables, static_i2) and platform != "cpu":
    tp_img101, _, _ = measure(pallas_stream.run_stream_pallas, static_i2,
                              prep_i2, max(min(n_photons // 8, 1 << 24),
                                           PALLAS_WIDTH), 41, PALLAS_WIDTH)
else:
    tp_img101 = 0.0

print(json.dumps({
    "throughput": tp_spec,
    "kernel": "pallas" if use_pallas else "xla",
    "xla_throughput": tp_xla,
    "pallas_vs_xla_I_rel": agree,
    "imaging_throughput": tp_img,
    "imaging_throughput_101px": tp_img101,
    "hydrostatic39_throughput": tp39,
    "hydrostatic39_counts_maxdiff": counts_maxdiff,
    "hydrostatic39_I_rel_vs_xla": agree39,
    "hydrostatic39_n_error": n_err39,
    "grid3d_2496_throughput": tp3,
    "grid3d_2496_counts_maxdiff": grid3_counts_maxdiff,
    "grid3d_2496_I_rel_vs_xla": agree3,
    "grid3d_2496_n_error": n_err3,
    "flow_throughput": tp_flow,
    "thermal_throughput": tp_th,
    "thermal_n_error": n_err_t,
    "detector_I_raw": float(np.asarray(out["detector"], np.float64)[:, 0, 0].sum()),
    "device": str(jax.devices()[0]),
    "n_error": n_err,
    "n_alive_at_cap": n_cap,
    "n_error_imaging": n_err_i,
}))
"""


def _attempt(platform, n, width, timeout_s):
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _WORKER, platform, str(n), str(width)],
            capture_output=True, timeout=timeout_s, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    return None


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 27
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 16
    plans = [("tpu", n, width, 1500), ("tpu", n // 16, width // 4, 600),
             ("cpu", 1 << 16, 1 << 14, 900)]
    result = None
    used = None
    for platform, np_, w, timeout_s in plans:
        result = _attempt(platform, np_, w, timeout_s)
        if result is not None:
            used = (platform, np_, w)
            break
    if result is None:
        print(json.dumps({
            "metric": "photon packets/s/chip (Rayleigh tau=5 reflected-light)",
            "value": 0.0, "unit": "photons/s", "vs_baseline": 0.0,
            "error": "all benchmark attempts timed out (device unavailable)",
        }))
        return
    throughput = result["throughput"]
    print(json.dumps({
        "metric": "photon packets/s/chip (Rayleigh tau=5 reflected-light, full Stokes peel)",
        "value": throughput,
        "unit": "photons/s",
        "vs_baseline": throughput / NORTH_STAR,
        "n_photons": used[1],
        "platform": used[0],
        "kernel": result["kernel"],
        "xla_throughput": result["xla_throughput"],
        "pallas_vs_xla_I_rel": result["pallas_vs_xla_I_rel"],
        "imaging_throughput_25px": result["imaging_throughput"],
        "imaging_throughput_101px": result.get("imaging_throughput_101px", 0.0),
        "hydrostatic39_throughput": result.get("hydrostatic39_throughput", 0.0),
        "hydrostatic39_counts_maxdiff": result.get("hydrostatic39_counts_maxdiff"),
        "hydrostatic39_I_rel_vs_xla": result.get("hydrostatic39_I_rel_vs_xla"),
        "hydrostatic39_n_error": result.get("hydrostatic39_n_error"),
        "grid3d_2496_throughput": result.get("grid3d_2496_throughput", 0.0),
        "grid3d_2496_counts_maxdiff": result.get("grid3d_2496_counts_maxdiff"),
        "grid3d_2496_I_rel_vs_xla": result.get("grid3d_2496_I_rel_vs_xla"),
        "grid3d_2496_n_error": result.get("grid3d_2496_n_error"),
        "flow_throughput": result.get("flow_throughput", 0.0),
        "thermal_throughput": result.get("thermal_throughput", 0.0),
        "detector_I_raw": result["detector_I_raw"],
        "device": result["device"],
        "n_error": result["n_error"],
        "n_alive_at_cap": result["n_alive_at_cap"],
        "n_error_imaging": result["n_error_imaging"],
    }))


if __name__ == "__main__":
    main()
