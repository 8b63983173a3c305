"""BASELINE #4 end-to-end artifact -> BASELINE4.json.

The full config-#4 pipeline (BASELINE.md: "3-D patchy-cloud atmosphere
(theta/phi zones) with Mie scattering matrices, detector images"):

1. native Mie/DHS solver (artes_tpu/native/mie, the ComputePart
   equivalent) computes a power-law size-distribution cloud table from a
   refractive-index file — kappa_ext/abs/sca + the normalised 16-element
   scattering matrix per degree;
2. a 39 x 8 x 8 spherical grid gets a clear Rayleigh background column and
   an 8-shell patchy cloud deck (alternating theta/phi zones, the
   reference's zone painter shape, atmosphere.py:349-379) whose cells
   carry the MIE matrix — two scattering mixtures for the per-MIXTURE
   dedup (pallas_stream.MixTables);
3. a 25x25 reflected-light Stokes image runs through the production Pallas
   kernel (3-D jump-sum tau walks + the in-kernel MXU one-hot splat), with
   a statistical cross-kernel check against the XLA kernel.

Run on the TPU: python tools/baseline4_artifact.py
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_atmosphere():
    import numpy as np

    from artes_tpu import presets
    from artes_tpu.opacity import mie, rayleigh

    wl = 0.7
    with tempfile.TemporaryDirectory() as td:
        ri = os.path.join(td, "cloud.dat")
        with open(ri, "w") as fh:
            # forsterite-like visible-band refractive index
            for w in (0.1, 0.5, 1.0, 10.0):
                fh.write(f"{w} 1.65 0.003\n")
        mie_tab = mie.generate(ri, [wl], nr=30, nf=5, amin=0.1, amax=5.0,
                               apow=3.5, fmax=0.0)
    ray_tab = rayleigh.generate([wl])

    # clear Rayleigh background, tau ~ 0.2 over 39 shells
    atm = presets.rayleigh_single_layer(tau=0.2, nr=39, shell_km=97.5,
                                        wavelengths=(wl,),
                                        theta_deg=tuple(np.linspace(0., 180., 9)),
                                        phi_deg=tuple(np.linspace(0., 360., 9)[:-1]))
    # patchy Mie cloud deck: shells 20-28, alternating (theta, phi) zones
    # (ARTES.f90 zone painting; reference atmosphere.py:349-379)
    shell_m = float(atm.rfront[1] - atm.rfront[0])
    deck = np.zeros(39, bool)
    deck[20:28] = True
    tau_cloud = 3.0
    k_cloud = tau_cloud / (deck.sum() * shell_m)     # [1/m]
    mie_sca = np.asarray(mie_tab.scatter).transpose(2, 0, 1)[0]  # (180, 16)
    albedo = float(mie_tab.scattering[0] / mie_tab.extinction[0])
    for it in range(atm.ntheta):
        for ip in range(atm.nphi):
            if (it + ip) % 2 == 0:
                continue
            atm.k_sca[deck, it, ip, 0] = k_cloud * albedo
            atm.k_abs[deck, it, ip, 0] = k_cloud * (1.0 - albedo)
            atm.scatter[deck, it, ip, 0] = mie_sca
    atm.refresh_derived()
    return atm, albedo


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from artes_tpu.config import ArtesConfig, detector_setup
    from artes_tpu.runner import _kernel_static
    from artes_tpu.transport import pallas_stream
    from artes_tpu.transport.kernel import run_stream
    from artes_tpu.transport.tables import build_tables

    atm, albedo = build_atmosphere()
    cfg = ArtesConfig()
    cfg.mode = "imaging_mono"
    cfg.npix = 25
    det = detector_setup(cfg, float(atm.rfront[-1]))
    static = _kernel_static(cfg, det, atm, False)
    prep = build_tables(atm, cfg, det, 0, dtype=jnp.float32)
    assert pallas_stream.supports(prep.tables, static), \
        "config #4 must run the production kernel"
    spec, mt = pallas_stream.make_spec(prep.tables, static)
    w = pallas_stream.preferred_width(prep.tables, static) or 8192

    n = 1 << 24
    t0 = time.time()
    out = pallas_stream.run_stream_pallas(prep.tables, static, n, 41, w)
    img = np.asarray(out["detector"], np.float64)
    compile_s = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = pallas_stream.run_stream_pallas(prep.tables, static, n, 42, w)
        img = np.asarray(out["detector"], np.float64)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    # statistical cross-kernel check (XLA-TPU vs Mosaic compile the shared
    # arithmetic independently; counts agree up to rare f32 trajectory
    # flips, image I at MC-noise level)
    n_small = 1 << 16
    o_p = pallas_stream.run_stream_pallas(prep.tables, static, n_small, 7, w)
    o_x = run_stream(prep.tables, static, n_small, 7, 1 << 14)
    c_p = np.asarray(o_p["detector"], np.float64)[..., 2]
    c_x = np.asarray(o_x["detector"], np.float64)[..., 2]
    i_p = np.asarray(o_p["detector"], np.float64)[..., 0].sum()
    i_x = np.asarray(o_x["detector"], np.float64)[..., 0].sum()

    I = img[:, 0, 0].reshape(25, 25)
    result = {
        "config": "BASELINE #4: 3-D patchy Mie clouds, detector image",
        "backend": jax.default_backend(),
        "pipeline": {
            "mie_solver": "native C++ Bohren-Huffman (artes_tpu/native/mie)",
            "size_distribution": "power-law a^-3.5, 0.1-5 um",
            "single_scattering_albedo": albedo,
            "grid": "39 x 8 x 8 = 2,496 cells, 8-shell alternating-zone deck",
            "n_mixtures": int(mt.alpha_prefix.shape[0]),
            "detector": "25 x 25 Stokes image (in-kernel MXU splat)",
        },
        "photons": n,
        "pool_width": w,
        "compile_seconds": compile_s,
        "throughput_photons_per_s": n / best,
        "image": {
            "lit_pixels": int((I != 0).sum()),
            "stokes_I_total": float(I.sum()),
            "max_minus_Q_over_I": float(
                (-img[:, 1, 0] / np.maximum(img[:, 0, 0], 1e-300)).max()),
        },
        "n_error": int(out["n_error"]),
        "cross_kernel": {
            "counts_maxdiff": int(np.abs(c_p - c_x).max()),
            "image_I_rel": float(abs(i_p - i_x) / abs(i_x)),
            "photons": n_small,
        },
    }
    path = os.path.join(ROOT, "BASELINE4.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"#4: {n / best / 1e6:.1f}M photons/s, lit {result['image']['lit_pixels']}"
          f"/625 px, n_mix {result['pipeline']['n_mixtures']}, "
          f"errors {result['n_error']}, counts maxdiff "
          f"{result['cross_kernel']['counts_maxdiff']}")
    print(f"written: {path}")


if __name__ == "__main__":
    main()
