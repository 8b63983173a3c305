"""Counter-based RNG for photon transport.

The reference uses a per-thread 4-word Marsaglia-Zaman stream seeded from the
wall clock (ARTES.f90:4175-4230) — results depend on thread count and are not
reproducible. Here every photon owns a threefry key derived from its *global*
photon id, and every draw site folds in a site counter, giving bitwise
determinism independent of batch size, device count and sharding (the design
called for in SURVEY.md section 7.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def photon_keys(seed: int, photon_ids):
    """Per-photon base keys from the run seed and global photon indices."""
    master = jax.random.key(seed)
    return jax.vmap(jax.random.fold_in, in_axes=(None, 0))(master, photon_ids)


def uniform(keys, site, dtype=jnp.float64):
    """One uniform (0,1) draw per photon at draw-site ``site``.

    ``site`` may be a traced scalar (e.g. scatter-round * stride + slot) so
    that draws inside while-loops stay unique and reproducible.
    """
    sites = jnp.broadcast_to(jnp.asarray(site, jnp.uint32), keys.shape)
    folded = jax.vmap(jax.random.fold_in)(keys, sites)
    u = jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(folded)
    # the reference RNG is strictly in (0,1) (ARTES.f90:4218); 1-log draws etc.
    # assume u < 1
    return jnp.clip(u, jnp.finfo(dtype).tiny, 1.0 - jnp.finfo(dtype).epsneg)
