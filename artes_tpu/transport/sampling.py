"""Stokes-weighted scattering-angle sampling and matrix interpolation.

The reference builds a 180-bin CDF per scattering event with a serial loop and
inverts it by linear scan (``scattering_angle_sampling`` ARTES.f90:1534-1661).
Here the CDFs are closed-form combinations of *precomputed prefix-sum tables*
(per cell for the scattering angle, global trig tables for the azimuth), so a
batched event needs only a handful of gathers and a fixed 8-step binary
search — no per-event cumsum, no scan (the transformation called for in
SURVEY.md section 7.2).

Conventions follow the reference exactly: 180 one-degree bins, bin-averaged
``sinbeta``/``cos2beta``/``sin2beta`` weights (ARTES.f90:404-420), inverse-CDF
linear interpolation inside the bin, the beta half-plane flip, and the
half-degree-centred matrix interpolation of ``scatter_photon``
(ARTES.f90:1448-1530).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from artes_tpu.atmosphere import COS2BETA, SIN2BETA, SINBETA

N_ANGLE = 180
_DEG = np.pi / 180.0

# Global prefix tables (181,): index i holds sum over bins 1..i.
C2B_PREFIX = np.concatenate([[0.0], np.cumsum(COS2BETA)])
S2B_PREFIX = np.concatenate([[0.0], np.cumsum(SIN2BETA)])


def build_alpha_prefix(scatter_cell):
    """Per-cell prefix tables for the scattering-angle CDF.

    ``scatter_cell``: (..., 180, 16) normalised matrices. Returns
    (..., 4, 181): prefix sums over bins of P1k(i) * sinbeta(i) * pi/180
    (the weights of ARTES.f90:1610-1623).
    """
    w = SINBETA * _DEG  # (180,)
    weighted = scatter_cell[..., :4] * w[..., :, None]      # (..., 180, 4)
    prefix = np.cumsum(weighted, axis=-2)                    # (..., 180, 4)
    zeros = np.zeros_like(prefix[..., :1, :])
    return np.concatenate([zeros, prefix], axis=-2).swapaxes(-1, -2)  # (...,4,181)


def _invert_materialized(cum, target):
    """Invert a batched monotone CDF given at all 181 edges.

    ``cum``: (B, 181) with cum[:, 0] = 0. Finds the first k in [1, 180] with
    cum(k) >= target (the reference's linear scan, ARTES.f90:1565-1587) using
    a vectorized count + two masked reductions — no gathers, so it maps to
    pure VPU work on TPU.
    Returns (k, cum_lo, cum_hi).
    """
    below = (cum[..., 1:-1] < target[..., None])
    k = 1 + jnp.sum(below, axis=-1).astype(jnp.int32)
    edges = jax.lax.broadcasted_iota(jnp.int32, cum.shape, len(cum.shape) - 1)
    sel_lo = edges == (k - 1)[..., None]
    sel_hi = edges == k[..., None]
    cum_lo = jnp.sum(jnp.where(sel_lo, cum, 0.0), axis=-1)
    cum_hi = jnp.sum(jnp.where(sel_hi, cum, 0.0), axis=-1)
    return k, cum_lo, cum_hi


def sample_beta(p_int, stokes, u1, u2):
    """Azimuthal scattering angle from the P11..P14 integral CDF
    (ARTES.f90:1545-1593).

    ``p_int``: (B, 4) gathered per-cell [P11,P12,P13,P14] angular integrals.
    Returns beta in (0, 2 pi).
    """
    dt = stokes.dtype
    i, q, u, v = stokes[..., 0], stokes[..., 1], stokes[..., 2], stokes[..., 3]
    p11, p12, p13, p14 = p_int[..., 0], p_int[..., 1], p_int[..., 2], p_int[..., 3]
    # intensity(j) = a + b*cos2beta_j + c*sin2beta_j
    a = p11 * i + p14 * v
    b = p12 * q + p13 * u
    c = p12 * u - p13 * q
    c2b = jnp.asarray(C2B_PREFIX, dt)
    s2b = jnp.asarray(S2B_PREFIX, dt)
    j = jnp.arange(N_ANGLE + 1, dtype=dt)
    cum = a[..., None] * j + b[..., None] * c2b + c[..., None] * s2b  # (B, 181)

    target = u1 * cum[..., -1]
    k, cum_lo, cum_hi = _invert_materialized(cum, target)
    dcum = cum_hi - cum_lo
    frac = (target - cum_lo) / jnp.where(dcum == 0.0, 1.0, dcum)
    beta_deg = (k - 1).astype(dt) + jnp.where(dcum == 0.0, 0.5, frac)
    beta = beta_deg * _DEG
    # mirror to the other half-plane with probability 1/2 (:1589-1590)
    beta = jnp.where(u2 > 0.5, beta + jnp.pi, beta)
    two_pi = 2.0 * jnp.pi
    beta = jnp.where(beta >= two_pi, two_pi - 1.0e-10, beta)
    beta = jnp.where(beta <= 0.0, 1.0e-10, beta)
    return beta


def gather_alpha_prefix(alpha_prefix_all, cell_flat, onehot_limit=256):
    """Per-lane (4, 181) prefix rows from the (ncell, 4, 181) table.

    Small grids go through an exact one-hot MXU contraction (per-lane scalar
    gathers cost ~1 ms per op at 128k lanes on TPU); large grids fall back to
    a row gather.
    """
    ncell = alpha_prefix_all.shape[0]
    if ncell <= onehot_limit:
        oh = jax.nn.one_hot(cell_flat, ncell, dtype=alpha_prefix_all.dtype)
        flat = alpha_prefix_all.reshape(ncell, -1)
        rows = jnp.einsum("bc,ck->bk", oh, flat,
                          preferred_element_type=alpha_prefix_all.dtype)
        return rows.reshape(cell_flat.shape + (4, N_ANGLE + 1))
    return alpha_prefix_all[cell_flat]


def alpha_weights(stokes, beta):
    """Stokes/azimuth weights of the conditional alpha CDF: the coefficient
    of each matrix-row prefix (ARTES.f90:1612-1617). Returns (B, 4)."""
    i, q, u, v = stokes[..., 0], stokes[..., 1], stokes[..., 2], stokes[..., 3]
    c2b = jnp.cos(2.0 * beta)
    s2b = jnp.sin(2.0 * beta)
    return jnp.stack([i, c2b * q + s2b * u, -s2b * q + c2b * u, v], axis=-1)


# With one-hot cell selection folded into the weights, the per-lane CDF is a
# single (B, 4*ncell) @ (4*ncell, 181) MXU matmul — no (B, 4, 181) per-lane
# prefix rows ever hit HBM (at 256k lanes those cost ~760 MB per round).
ALPHA_FUSED_NCELL_LIMIT = 32


def alpha_cum(alpha_prefix_all, cell_flat, w):
    """Per-lane conditional CDF at all 181 edges: (B, 181).

    ``alpha_prefix_all``: (ncell, 4, 181); ``w``: (B, 4) from
    :func:`alpha_weights`.
    """
    ncell = alpha_prefix_all.shape[0]
    dt = alpha_prefix_all.dtype
    if ncell <= ALPHA_FUSED_NCELL_LIMIT:
        oh = jax.nn.one_hot(cell_flat, ncell, dtype=dt)
        w2 = (oh[..., None] * w[..., None, :]).reshape(w.shape[0], ncell * 4)
        flat = alpha_prefix_all.reshape(ncell * 4, N_ANGLE + 1)
        return jnp.einsum("bk,kj->bj", w2, flat, preferred_element_type=dt)
    rows = gather_alpha_prefix(alpha_prefix_all, cell_flat)
    return jnp.einsum("...k,...kj->...j", w, rows)


def invert_alpha_cum(cum, u3):
    """Invert the (B, 181) conditional CDF -> alpha = cos(scattering angle),
    clipped to (-1, 1) (the scan at ARTES.f90:1625-1659)."""
    dt = cum.dtype
    target = u3 * cum[..., -1]
    k, cum_lo, cum_hi = _invert_materialized(cum, target)
    dcum = cum_hi - cum_lo
    frac = (target - cum_lo) / jnp.where(dcum == 0.0, 1.0, dcum)
    alpha_deg = (k - 1).astype(dt) + jnp.where(dcum == 0.0, 0.5, frac)
    alpha = jnp.cos(alpha_deg * _DEG)
    eps = 1.0e-10
    return jnp.clip(alpha, -1.0 + eps, 1.0 - eps)


def sample_alpha(alpha_prefix, stokes, beta, u3):
    """Scattering-angle cosine from the conditional CDF (ARTES.f90:1597-1659).

    ``alpha_prefix``: (B, 4, 181) per-lane prefix tables (see
    :func:`gather_alpha_prefix`). Returns alpha = cos(scattering angle),
    clipped to (-1, 1).
    """
    w = alpha_weights(stokes, beta)
    cum = jnp.einsum("...k,...kj->...j", w, alpha_prefix)  # (B, 181)
    return invert_alpha_cum(cum, u3)


def sample_alpha_fused(alpha_prefix_all, cell_flat, stokes, beta, u3):
    """sample_alpha without materializing per-lane prefix rows."""
    w = alpha_weights(stokes, beta)
    return invert_alpha_cum(alpha_cum(alpha_prefix_all, cell_flat, w), u3)


def matrix_at_angle(scatter_rows, cell_flat, acos_alpha):
    """Interpolate the 16-element matrix at a scattering angle.

    ``scatter_rows``: (ncell * 180, 16) flattened per-cell matrices;
    ``cell_flat``: (B,) flat cell indices; ``acos_alpha``: (B,) angle [rad].
    Bins are centred at (i - 0.5) degrees (ARTES.f90:1506-1509): linear
    interpolation between adjacent rows, clamped at the first/last bin.
    """
    dt = acos_alpha.dtype
    ad = acos_alpha / _DEG  # degrees
    t = ad - 0.5
    r0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, N_ANGLE - 2)
    frac = jnp.clip(t - r0.astype(dt), 0.0, 1.0)
    base = cell_flat * N_ANGLE
    row0 = scatter_rows[base + r0]          # (B, 16)
    row1 = scatter_rows[base + r0 + 1]
    m = row0 + (row1 - row0) * frac[..., None]
    return m.reshape(m.shape[:-1] + (4, 4))
