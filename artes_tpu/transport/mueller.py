"""Stokes-vector algebra: rotations, scattering application, new directions.

Re-derivation of the reference's meridian-plane bookkeeping
(``polarization_rotation`` ARTES.f90:1663-1932, ``mueller_matrix_filler``
:1934-1960, ``direction_cosine`` :1962-2052) as branch-free batched math.
The two renormalisations — polarized-intensity conservation across each
rotation and total-intensity conservation across the scattering matrix (for
propagation, not peeling) — are kept exactly, since output parity is judged
on Stokes vectors.
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def mueller_rotate(stokes, psi):
    """Rotate (Q,U) by the 2x2 Mueller block L(psi) and renormalise.

    The reference builds c2p = cos(2 psi) and s2p = +/-sqrt(1-c2p^2) with sign
    logic that reproduces sin(2 psi) exactly (ARTES.f90:1942-1953), then
    rescales (Q,U,V) so the polarized intensity is unchanged (:1762-1781).
    """
    c2p = jnp.cos(2.0 * psi)
    s2p = jnp.sin(2.0 * psi)
    i, q, u, v = stokes[..., 0], stokes[..., 1], stokes[..., 2], stokes[..., 3]
    q_new = c2p * q + s2p * u
    u_new = -s2p * q + c2p * u
    p_in = jnp.sqrt(q * q + u * u + v * v)
    p_out = jnp.sqrt(q_new * q_new + u_new * u_new + v * v)
    norm = jnp.where(p_out > 0.0, p_in / jnp.where(p_out == 0.0, 1.0, p_out), 1.0)
    return jnp.stack([i, q_new * norm, u_new * norm, v * norm], axis=-1)


def apply_scatter(scatter, stokes):
    """(..., 4, 4) @ (..., 4)."""
    return jnp.einsum("...ij,...j->...i", scatter, stokes)


def polarization_rotation(alpha, beta, stokes, scatter, dirn, dirn_new, peeling: bool):
    """Meridian -> scattering plane -> meridian Stokes update.

    ``alpha`` is cos of the scattering angle, ``beta`` the azimuthal scattering
    angle in [0, 2 pi). ``scatter`` is the (..., 4, 4) matrix interpolated at
    the scattering angle. Assumes |alpha| < 1 (samplers clip); the reference's
    exact-forward/backward edge branches (:1856-1920) are unreachable then.
    """
    # beta2 from the spherical cosine rule (ARTES.f90:1728-1751)
    dz = dirn[..., 2]
    dzn = dirn_new[..., 2]
    salpha = jnp.sqrt(jnp.maximum(1.0 - alpha * alpha, 0.0))
    szn = jnp.sqrt(jnp.maximum(1.0 - dzn * dzn, 0.0))
    denom = salpha * szn
    num = (dz - dzn * alpha) / jnp.where(denom == 0.0, 1.0, denom)
    beta2 = jnp.arccos(jnp.clip(num, -1.0, 1.0))

    # rotate meridian -> scattering plane by beta (:1753-1781)
    stokes_rot = mueller_rotate(stokes, beta)
    # apply the 4x4 scattering matrix (:1783-1795)
    stokes_sc = apply_scatter(scatter, stokes_rot)
    if not peeling:
        # conserve Stokes I across the scattering event (:1799-1814)
        i_sc = stokes_sc[..., 0]
        norm = jnp.where(i_sc > 0.0, stokes_rot[..., 0] / jnp.where(i_sc == 0.0, 1.0, i_sc), 0.0)
        stokes_sc = stokes_sc * norm[..., None]
    # rotate back into the meridian plane; for beta in [pi, 2 pi) the second
    # rotation angle flips sign (:1816-1826)
    psi2 = jnp.where(beta < jnp.pi, beta2, -beta2)
    return mueller_rotate(stokes_sc, psi2)


def direction_cosine(alpha, beta, dirn):
    """New propagation direction from (alpha, beta) via the spherical cosine
    rule (ARTES.f90:1962-2052)."""
    dx, dy, dz = dirn[..., 0], dirn[..., 1], dirn[..., 2]
    cto = dz  # direction is unit-norm
    sto = jnp.sqrt(jnp.maximum(1.0 - cto * cto, 0.0))
    phi_old = jnp.arctan2(dy, dx)
    phi_old = jnp.where(phi_old < 0.0, phi_old + TWO_PI, phi_old)

    # cos(2 pi - beta) == cos(beta): one formula covers both branches (:1979-1985)
    salpha = jnp.sqrt(jnp.maximum(1.0 - alpha * alpha, 0.0))
    ctn = cto * alpha + sto * salpha * jnp.cos(beta)
    ctn = jnp.clip(ctn, -1.0, 1.0)
    stn = jnp.sqrt(jnp.maximum(1.0 - ctn * ctn, 0.0))

    denom = stn * sto
    num = (alpha - ctn * cto) / jnp.where(denom == 0.0, 1.0, denom)
    num = jnp.clip(num, -1.0 + 1.0e-10, 1.0 - 1.0e-10)  # (:2001-2005)
    dphi = jnp.arccos(num)
    phi_new = jnp.where(beta < jnp.pi, phi_old + dphi, phi_old - dphi)
    phi_new = jnp.mod(phi_new, TWO_PI)

    return jnp.stack([stn * jnp.cos(phi_new), stn * jnp.sin(phi_new), ctn], axis=-1)


def rotation_matrix(axis: int, angle):
    """3x3 axis rotation (ARTES.f90:1270-1326); axis in {0: x, 1: y, 2: z}."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    if axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    elif axis == 1:
        rows = [[c, zero, s], [zero, one, zero], [-s, zero, c]]
    else:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
