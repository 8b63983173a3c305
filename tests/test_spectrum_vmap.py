import numpy as np

from artes_tpu import presets, runner
from artes_tpu.config import ArtesConfig


def test_vmapped_spectrum_matches_serial():
    atm = presets.rayleigh_single_layer(tau=2.0, wavelengths=(0.5, 0.7, 0.9))
    cfg = ArtesConfig()
    cfg.mode = "spectrum"
    _, serial = runner.run_spectrum(atm, cfg, 2000, seed=5,
                                    wavelength_batch=False, batch_size=2000)
    _, vmapped = runner.run_spectrum(atm, cfg, 2000, seed=5,
                                     wavelength_batch=True, batch_size=6000)
    assert len(vmapped) == 3
    for wl in range(3):
        # identical photon streams; only XLA reassociation differs (~1e-14)
        np.testing.assert_allclose(serial[wl].detector, vmapped[wl].detector,
                                   rtol=1e-12, atol=0)
        assert serial[wl].cell_depth == vmapped[wl].cell_depth
