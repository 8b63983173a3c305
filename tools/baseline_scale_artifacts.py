"""BASELINE #2 and #5-scale artifacts -> BASELINE_RUNS.json.

* #2: the 73-angle polarized phase curve (2.5-degree steps, the reference's
  hard-coded detector sweep, ARTES.f90:213-250) on the HG cloud deck —
  forward-scattering peak + polarization fraction vs phase angle, one
  compiled kernel for all angles (detector direction is a runtime scalar).
* #5 scale: 1e10 photon packages through the flagship reflected-light
  config on ONE chip — the reference's upper practical range (integer(16)
  counter, typical runs 1e6-1e10, ARTES.f90:26) in minutes, with the
  64-bit chunked id space exercised end-to-end (ten 2^30 chunks).

Run on the TPU: python tools/baseline_scale_artifacts.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artes_tpu import presets
    from artes_tpu.config import ArtesConfig, detector_setup
    from artes_tpu.runner import PHASE_ANGLES_DEG, run_phase_curve, run_wavelength

    result = {"device": str(jax.devices()[0])}

    # ---- BASELINE #2: HG cloud deck phase curve, 73 angles ----
    atm = presets.hg_cloud_deck(tau=6.0, g=0.6, p_linear=0.4)
    cfg = ArtesConfig()
    cfg.mode = "phase"
    n_per_angle = 10_000_000
    # warm both kernel variants (plain + crescent disk sampling at >=170
    # deg) so the sweep timing is transport, not the two one-time compiles
    det_w = detector_setup(cfg, float(atm.rfront[-1]), det_phi=0.5)
    run_wavelength(atm, cfg, det_w, 0, 1 << 13, dtype=jnp.float32)
    det_w = detector_setup(cfg, float(atm.rfront[-1]),
                           det_phi=178.0 * 3.14159265 / 180.0)
    run_wavelength(atm, cfg, det_w, 0, 1 << 13, dtype=jnp.float32,
                   crescent=True)
    t0 = time.perf_counter()
    rows = run_phase_curve(atm, cfg, n_per_angle, seed=3, dtype=jnp.float32)
    dt = time.perf_counter() - t0
    curve = []
    for ang, det, res in rows:
        p = res.photometry
        curve.append({"phase_deg": ang, "I": p[0], "Q": p[2], "U": p[4],
                      "pol_frac": float(p[9])})
    i_vals = np.asarray([c["I"] for c in curve])
    result["baseline2_phase_curve"] = {
        "config": "triple-HG cloud deck tau=6 g=0.6 p_linear=0.4",
        "angles": len(curve),
        "photons_per_angle": n_per_angle,
        "wall_seconds": dt,
        "photons_per_s": len(curve) * n_per_angle / dt,
        "forward_over_back_I": float(i_vals[0] / i_vals[-1]),
        "max_pol_frac": float(max(c["pol_frac"] for c in curve)),
        "max_pol_angle_deg": float(max(curve, key=lambda c: c["pol_frac"])
                                   ["phase_deg"]),
        "curve": curve,
    }
    print(f"#2 phase curve: {len(curve)} angles x {n_per_angle:.0e} in "
          f"{dt:.1f}s ({len(curve)*n_per_angle/dt/1e6:.1f}M photons/s); "
          f"forward/back I = {result['baseline2_phase_curve']['forward_over_back_I']:.1f}, "
          f"max pol {result['baseline2_phase_curve']['max_pol_frac']:.3f} at "
          f"{result['baseline2_phase_curve']['max_pol_angle_deg']:.0f} deg",
          flush=True)

    # ---- BASELINE #5 scale: 1e10 photons, full Stokes, one chip ----
    atm5 = presets.rayleigh_single_layer(tau=5.0)
    cfg5 = ArtesConfig()
    cfg5.mode = "spectrum"
    det5 = detector_setup(cfg5, float(atm5.rfront[-1]))
    n = 10_000_000_000
    t0 = time.perf_counter()
    res = run_wavelength(atm5, cfg5, det5, 0, n, seed=5, dtype=jnp.float32)
    dt = time.perf_counter() - t0
    p = res.photometry
    result["baseline5_scale_run"] = {
        "config": "Rayleigh tau=5 reflected-light, full Stokes spectrum",
        "photons": n,
        "wall_seconds": dt,
        "photons_per_s": n / dt,
        "stokes_IQUV_W_m2_um": [p[0] * 1e-6, p[2] * 1e-6,
                                p[4] * 1e-6, p[6] * 1e-6],
        "pol_frac": float(p[9]),
        "pol_frac_mc_err": float(p[10]),
        "n_error": res.n_error,
        "n_alive_at_cap": res.n_alive_at_cap,
        "chunks": "ten 2^30-photon chunks over the 64-bit id space",
    }
    print(f"#5 scale: 1e10 photons in {dt:.1f}s ({n/dt/1e6:.1f}M photons/s), "
          f"-Q/I = {-p[2]/p[0]:.4f} +/- {p[10]:.1e}, "
          f"errors {res.n_error}", flush=True)

    out = os.path.join(ROOT, "BASELINE_RUNS.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print("written:", out)


if __name__ == "__main__":
    main()
