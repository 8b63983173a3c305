"""Fetch-timed micro-profile of the scatter-round body pieces at B lanes."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp
import numpy as np

from artes_tpu import presets
from artes_tpu.config import ArtesConfig, detector_setup
from artes_tpu.runner import _kernel_static
from artes_tpu.transport.kernel import (start_batch, flat_cell, _march,
                                        _peel_photon_prep, _splat)
from artes_tpu.transport import geometry as G
from artes_tpu.transport import mueller as M
from artes_tpu.transport import rng as R
from artes_tpu.transport import sampling as S
from artes_tpu.transport.tables import build_tables

dtype = jnp.float32
atm = presets.rayleigh_single_layer(tau=5.0)
cfg = ArtesConfig(); cfg.mode = "spectrum"
det = detector_setup(cfg, float(atm.rfront[-1]))
static = _kernel_static(cfg, det, atm, False)
prep = build_tables(atm, cfg, det, 0, dtype=dtype)
t = prep.tables

B = 262144
ids = jnp.arange(B, dtype=jnp.uint32)
state, out0 = start_batch(t, static, ids, 0)
_ = float(jnp.sum(out0["detector"]))

pos, dirn, cell, face, stokes = (state["pos"], state["dirn"], state["cell"],
                                 state["face"], state["stokes"])
alive = state["alive"]
keys = R.photon_keys(0, state["photon_ids"])
cf = flat_cell(t.grid, cell)
detector = jnp.zeros((static.nx * static.ny, 4, 3), dtype)

REPS = 8

def tf(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / REPS
    print("%-28s %8.2f ms" % (name, 1e3 * dt))
    return dt

# RNG draws (5 per round)
tf("5x uniform", jax.jit(lambda k: sum(R.uniform(k, jnp.uint32(i), dtype) for i in range(5))), keys)

# albedo gather + roulette arithmetic
def roulette(cell, stokes):
    cfl = flat_cell(t.grid, cell)
    alb = G.small_gather(t.albedo, cfl)
    gamma = jnp.where((alb < 1.0) & (alb > 0.0), alb / (1.0 - t.fstop), 1.0)
    return stokes * gamma[..., None]
tf("roulette+gather", jax.jit(roulette), cell, stokes)

# peel prep (matrix_at_angle + rotation + pixel)
tf("peel_prep", jax.jit(lambda p, d, c, s: _peel_photon_prep(t, static, p, d, c, s)),
   pos, dirn, cell, stokes)

# sampling
u1 = R.uniform(keys, jnp.uint32(1), dtype)
u2 = R.uniform(keys, jnp.uint32(2), dtype)
u3 = R.uniform(keys, jnp.uint32(3), dtype)
p_int_g = G.small_gather(t.p_int, cf)
beta = S.sample_beta(p_int_g, stokes, u1, u2)
tf("sample_beta", jax.jit(lambda p, s: S.sample_beta(p, s, u1, u2)), p_int_g, stokes)
ap = S.gather_alpha_prefix(t.alpha_prefix, cf)
tf("gather_alpha_prefix", jax.jit(lambda c: S.gather_alpha_prefix(t.alpha_prefix, c)), cf)
tf("sample_alpha", jax.jit(lambda a, s, b: S.sample_alpha(a, s, b, u3)), ap, stokes, beta)
alpha = S.sample_alpha(ap, stokes, beta, u3)

# direction + matrix + rotation
tf("direction_cosine", jax.jit(M.direction_cosine), alpha, beta, dirn)
dir_new = M.direction_cosine(alpha, beta, dirn)
tf("matrix_at_angle", jax.jit(lambda c, a: S.matrix_at_angle(t.scatter_rows, c, jnp.arccos(a))), cf, alpha)
sc = S.matrix_at_angle(t.scatter_rows, cf, jnp.arccos(alpha))
tf("polarization_rotation", jax.jit(lambda a, b, s, m, d1, d2: M.polarization_rotation(a, b, s, m, d1, d2, peeling=False)),
   alpha, beta, stokes, sc, dirn, dir_new)

# splat: scatter-add into 1 pixel
pix = jnp.zeros((B,), jnp.int32)
tf("splat(4-stokes)", jax.jit(lambda d, p, s, m: _splat(d, p, s, m)), detector, pix, stokes, alive)

# march (merged peel)
tau = -jnp.log(1.0 - u1)
ctr = jnp.full((B,), 5, jnp.uint32)
tf("march(merged)", jax.jit(lambda p, d, c, f, s, ta, a: _march(
    t, static, keys, ctr, p, d, c, f, s, ta, a,
    detector, None, None, merged_peel=True)[0]["pos"]),
   pos, dir_new, cell, face, stokes, tau, alive)

# march unmerged
tf("march(plain)", jax.jit(lambda p, d, c, f, s, ta, a: _march(
    t, static, keys, ctr, p, d, c, f, s, ta, a,
    detector)[0]["pos"]),
   pos, dir_new, cell, face, stokes, tau, alive)

# single cell_face call
tf("cell_face x1", jax.jit(lambda p, d, c, f: G.cell_face(t.grid, p, d, c, f, t.cell_depth)["distance"]),
   pos, dirn, cell, face)
