"""Sharded gallery matching: shard_map over the gallery axis + collective
top-K merge.

Replaces the reference's OpenMP data parallelism over gallery files
(matcher.cpp:168/:273) with SPMD over a device mesh: each device holds a
contiguous gallery shard in its HBM, scores the latent against it locally
with the single-shard engine, and the ranked candidate list is merged with a
per-shard top-k + all_gather + re-top-k (the collective cost is O(k), not
O(G)).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..matcher.engine import DeviceGallery, MatchEngine
from ..templates.packing import PackedGallery
from .mesh import GALLERY_AXIS, gallery_sharding


def shard_gallery(engine: MatchEngine, packed: PackedGallery,
                  mesh: Mesh) -> DeviceGallery:
    """Pad the gallery to (n_shards * block) and place it sharded on axis 0."""
    n_shards = mesh.shape[GALLERY_AXIS]
    B = engine.block_size
    G0 = packed.size
    quantum = n_shards * B
    G = ((G0 + quantum - 1) // quantum) * quantum

    def pad(a: np.ndarray) -> np.ndarray:
        if a.shape[0] == G:
            return a
        out = np.zeros((G,) + a.shape[1:], a.dtype)
        out[:G0] = a
        return out

    sh = gallery_sharding(mesh)
    dtype = engine.compute_dtype

    def put(a):
        return jax.device_put(a, sh)

    Gp = ((G0 + quantum - 1) // quantum) * quantum
    Rt, S = packed.tex_codes.shape[1], packed.tex_codes.shape[2]
    gal = DeviceGallery(
        minu_des=put(np.swapaxes(pad(packed.minu_des), 1, 2).astype(dtype)),
        minu_x=put(pad(packed.minu_xy)[:, :, 0].copy()),
        minu_y=put(pad(packed.minu_xy)[:, :, 1].copy()),
        minu_ori=put(pad(packed.minu_ori)),
        minu_n=put(pad(packed.minu_n)),
        tex_codes=put(pad(packed.tex_codes).reshape(Gp, Rt * S)),
        tex_sqnorm=put(pad(packed.tex_sqnorm)),
        tex_x=put(pad(packed.tex_xy)[:, :, 0].copy()),
        tex_y=put(pad(packed.tex_xy)[:, :, 1].copy()),
        tex_ori=put(pad(packed.tex_ori)),
        tex_n=put(pad(packed.tex_n)),
        names=list(packed.names),
        n_real=G0,
    )
    return engine.maybe_predecode(gal, n_subs=S)


def _sharded_match_fn(engine: MatchEngine, mesh: Mesh,
                      lat_keys: tuple, gal_keys: tuple):
    """Cached jitted shard_map match (a fresh closure per call would
    retrace on every invocation — jit caches on function identity)."""
    key = ("match_sharded", mesh, lat_keys, gal_keys)
    if key not in engine._fn_cache:
        lat_specs = {k: P() for k in lat_keys}
        gal_specs = {k: P() if k == "minu_scale" else P(GALLERY_AXIS)
                     for k in gal_keys}

        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(lat_specs, gal_specs),
                           out_specs=P(None, GALLERY_AXIS))
        def local_match(lat_, gal_):
            return engine._match_all(lat_, gal_)

        engine._fn_cache[key] = jax.jit(local_match)
    return engine._fn_cache[key]


def match_sharded(engine: MatchEngine, latent, gallery: DeviceGallery,
                  mesh: Mesh) -> jax.Array:
    """Scores [G] (or [NL, G] for a latent batch) with the gallery axis
    sharded across the mesh."""
    single = not isinstance(latent, (list, tuple))
    lats = [latent] if single else list(latent)
    lat = engine._latent_dict(lats)
    gal = engine._gallery_dict(gallery)

    fn = _sharded_match_fn(engine, mesh, tuple(sorted(lat)),
                           tuple(sorted(gal)))
    out = fn(lat, gal)
    return out[0] if single else out


@functools.lru_cache(maxsize=64)
def _topk_fn(mesh: Mesh, k: int, kk: int, local_n: int):
    """Cached jitted collective top-k for one (mesh, k, shard size)."""

    @functools.partial(shard_map, mesh=mesh, in_specs=P(GALLERY_AXIS),
                       out_specs=(P(), P()), check_vma=False)
    def local_topk(s):
        v, i = jax.lax.top_k(s, kk)
        shard = jax.lax.axis_index(GALLERY_AXIS)
        gi = i + shard * local_n
        av = jax.lax.all_gather(v, GALLERY_AXIS).reshape(-1)
        ai = jax.lax.all_gather(gi, GALLERY_AXIS).reshape(-1)
        fv, fi = jax.lax.top_k(av, min(k, av.shape[0]))
        return fv, ai[fi]

    return jax.jit(local_topk)


def topk_collective(scores: jax.Array, k: int, mesh: Mesh) -> Tuple[jax.Array, jax.Array]:
    """Global (values, indices) top-k of a gallery-sharded score vector.

    Each shard reduces to its local top-k, the k-sized partials are
    all-gathered over ICI/DCN, and the final top-k runs replicated — the
    cross-device traffic is O(n_shards * k) instead of O(G).
    """
    n_shards = mesh.shape[GALLERY_AXIS]
    G = scores.shape[0]
    local_n = G // n_shards
    kk = min(k, local_n)
    return _topk_fn(mesh, k, kk, local_n)(scores)
