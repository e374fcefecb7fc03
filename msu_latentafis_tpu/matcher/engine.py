"""Gallery-scale matching engine.

Architectural departure from the reference: the native matcher loads one
rolled ``.dat`` per gallery entry inside an OpenMP loop and matches pairs on
the CPU (/root/reference/matching/matcher.cpp:216-337). Here the entire
gallery shard lives in HBM as dense padded arrays (templates.packing) and a
latent is scored against all of it in one jitted ``lax.scan`` over gallery
blocks:

- minutiae-template scoring = one batched MXU einsum per block + vmapped
  graph filtering over (template, gallery) axes;
- texture scoring = on-the-fly PQ decode + MXU matmul (texture_match) +
  vmapped graph filtering;
- fused final score = s0 + s1 + s2 + 0.3 * s_tex (matcher.cpp:188/:293),
  -1 for empty gallery entries (skip semantics of matcher.cpp:181-186);
- ranking = ``lax.top_k`` over the score vector.

Multi-chip scale-out shards the gallery axis over a mesh
(parallel.sharding); this module is the single-shard core.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..templates.data_model import MatcherConstants as MC
from ..templates.packing import PackedGallery, PackedLatent
from .minutiae_match import minutiae_match_single
from .texture_match import decode_pq, texture_similarity, texture_match_from_simi


@dataclasses.dataclass
class DeviceGallery:
    """A PackedGallery resident on device (or as sharded global arrays)."""
    minu_des: jax.Array
    minu_xy: jax.Array
    minu_ori: jax.Array
    minu_n: jax.Array
    tex_codes: jax.Array
    tex_sqnorm: jax.Array
    tex_xy: jax.Array
    tex_ori: jax.Array
    tex_n: jax.Array
    names: List[str]
    n_real: int                      # entries before block padding

    @property
    def size(self) -> int:
        return int(self.minu_des.shape[0])


@dataclasses.dataclass
class MatchResult:
    scores: np.ndarray               # [n_real] fused scores (-1 = skipped)
    names: List[str]

    def ranked(self, k: Optional[int] = None) -> List[Tuple[str, float]]:
        order = np.argsort(-self.scores, kind="stable")
        if k is not None:
            order = order[:k]
        return [(self.names[i], float(self.scores[i])) for i in order]


def _valid_mask(n: jnp.ndarray, size: int) -> jnp.ndarray:
    return jnp.arange(size) < n[..., None] if n.ndim else jnp.arange(size) < n


class MatchEngine:
    """Scores latents against device-resident gallery shards.

    Parameters
    ----------
    codebook: float32 [n_subs, n_clusters, sub_dim] PQ codebook.
    block_size: gallery entries per scan step (bounds peak memory for the
        [B, Lt, Rt] similarity block).
    compute_dtype: matmul input dtype — float32 for bit-careful parity,
        bfloat16 for peak MXU throughput.
    """

    def __init__(self, codebook: np.ndarray, block_size: int = 64,
                 compute_dtype=jnp.float32):
        codebook = np.asarray(codebook, np.float32)
        self.codebook = codebook
        self.n_subs, self.n_clusters, self.sub_dim = codebook.shape
        self._codebook_flat = jnp.asarray(
            codebook.reshape(self.n_subs * self.n_clusters, self.sub_dim))
        self.block_size = int(block_size)
        self.compute_dtype = compute_dtype
        self._match_fn = jax.jit(self._match_all)

    # ------------------------------------------------------------------
    def load_gallery(self, packed: PackedGallery,
                     device: Optional[jax.Device] = None) -> DeviceGallery:
        """Pad the gallery axis to a block multiple and move it on device."""
        B = self.block_size
        G0 = packed.size
        G = ((G0 + B - 1) // B) * B

        def pad(a):
            if a.shape[0] == G:
                return a
            out = np.zeros((G,) + a.shape[1:], a.dtype)
            out[:G0] = a
            return out

        dtype = self.compute_dtype
        put = functools.partial(jax.device_put, device=device)
        return DeviceGallery(
            minu_des=put(pad(packed.minu_des).astype(dtype)),
            minu_xy=put(pad(packed.minu_xy)),
            minu_ori=put(pad(packed.minu_ori)),
            minu_n=put(pad(packed.minu_n)),
            tex_codes=put(pad(packed.tex_codes)),
            tex_sqnorm=put(pad(packed.tex_sqnorm)),
            tex_xy=put(pad(packed.tex_xy)),
            tex_ori=put(pad(packed.tex_ori)),
            tex_n=put(pad(packed.tex_n)),
            names=list(packed.names),
            n_real=G0,
        )

    # ------------------------------------------------------------------
    def _match_all(self, lat: dict, gal: dict) -> jnp.ndarray:
        """Jitted: one latent against the full gallery -> scores [G]."""
        B = self.block_size
        G = gal["minu_des"].shape[0]
        nb = G // B
        dtype = self.compute_dtype

        T, Lm, D = lat["minu_des"].shape
        lat_minu_valid = jnp.arange(Lm)[None, :] < lat["minu_n"][:, None]   # [T, Lm]
        Lt = lat["tex_des"].shape[0]
        lat_tex_valid = jnp.arange(Lt) < lat["tex_n"]
        lat_tex_des = lat["tex_des"].astype(dtype)
        lat_sqnorm = jnp.sum(lat["tex_des"].astype(jnp.float32) ** 2, axis=-1)
        lat_minu_des = lat["minu_des"].astype(dtype)

        # one latent template vs one rolled entry
        def pair_minu(t_des, t_xy, t_ori, t_valid, r_des, r_xy, r_ori, r_valid):
            return minutiae_match_single(t_des, t_xy, t_ori, t_valid,
                                         r_des, r_xy, r_ori, r_valid)

        over_gallery = jax.vmap(pair_minu,
                                in_axes=(None, None, None, None, 0, 0, 0, 0))
        over_templates = jax.vmap(over_gallery,
                                  in_axes=(0, 0, 0, 0, None, None, None, None))

        def pair_tex(simi, r_xy, r_ori):
            return texture_match_from_simi(simi, lat["tex_xy"], lat["tex_ori"],
                                           r_xy, r_ori)

        blocks = {k: v.reshape((nb, B) + v.shape[1:]) for k, v in gal.items()}

        def step(carry, blk):
            Rm = blk["minu_des"].shape[1]
            Rt = blk["tex_codes"].shape[1]
            rol_minu_valid = jnp.arange(Rm)[None, :] < blk["minu_n"][:, None]
            rol_tex_valid = jnp.arange(Rt)[None, :] < blk["tex_n"][:, None]

            s_minu = over_templates(
                lat_minu_des, lat["minu_xy"], lat["minu_ori"], lat_minu_valid,
                blk["minu_des"], blk["minu_xy"], blk["minu_ori"], rol_minu_valid,
            )                                                        # [T, B]

            decoded = decode_pq(blk["tex_codes"], self._codebook_flat,
                                self.n_clusters, dtype=dtype)         # [B, Rt, D]
            simi = texture_similarity(lat_tex_des, lat_sqnorm, lat_tex_valid,
                                      decoded, blk["tex_sqnorm"], rol_tex_valid)
            s_tex = jax.vmap(pair_tex)(simi, blk["tex_xy"], blk["tex_ori"])

            fused = jnp.sum(s_minu, axis=0) + MC.TEXTURE_SCORE_WEIGHT * s_tex
            nonempty = (blk["minu_n"] > 0) | (blk["tex_n"] > 0)
            return carry, jnp.where(nonempty, fused, -1.0)

        _, scores = jax.lax.scan(step, None, blocks)
        return scores.reshape(-1)

    # ------------------------------------------------------------------
    @staticmethod
    def _latent_dict(lat: PackedLatent) -> dict:
        return dict(minu_des=jnp.asarray(lat.minu_des),
                    minu_xy=jnp.asarray(lat.minu_xy),
                    minu_ori=jnp.asarray(lat.minu_ori),
                    minu_n=jnp.asarray(lat.minu_n),
                    tex_des=jnp.asarray(lat.tex_des),
                    tex_xy=jnp.asarray(lat.tex_xy),
                    tex_ori=jnp.asarray(lat.tex_ori),
                    tex_n=jnp.asarray(lat.tex_n))

    @staticmethod
    def _gallery_dict(gal: DeviceGallery) -> dict:
        return dict(minu_des=gal.minu_des, minu_xy=gal.minu_xy,
                    minu_ori=gal.minu_ori, minu_n=gal.minu_n,
                    tex_codes=gal.tex_codes, tex_sqnorm=gal.tex_sqnorm,
                    tex_xy=gal.tex_xy, tex_ori=gal.tex_ori, tex_n=gal.tex_n)

    def match_scores(self, latent: PackedLatent, gallery: DeviceGallery) -> jax.Array:
        """Raw device scores [G_padded] (async; use for benchmarking)."""
        return self._match_fn(self._latent_dict(latent), self._gallery_dict(gallery))

    def one_to_list(self, latent: PackedLatent, gallery: DeviceGallery) -> MatchResult:
        scores = np.asarray(self.match_scores(latent, gallery))[:gallery.n_real]
        return MatchResult(scores=scores, names=gallery.names)


def write_score_csv(path: str, result: MatchResult) -> None:
    """List2List-style score file: one '<name>,<score>' line per gallery
    entry, fixed 3 decimals (matcher.cpp:198-205)."""
    with open(path, "w") as f:
        for name, score in zip(result.names, result.scores):
            f.write(f"{name},{score:.3f}\n")


def write_rank_csv(path: str, result: MatchResult, top_k: int = 24) -> None:
    """One2List-style ranked candidate list (matcher.cpp:305-330)."""
    with open(path, "w") as f:
        f.write("filename,score\n")
        for rank, (name, score) in enumerate(result.ranked(top_k), start=1):
            f.write(f"{rank}{name},{score}\n")
