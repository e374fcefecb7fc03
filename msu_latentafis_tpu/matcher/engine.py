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
from ..templates.packing import PackedGallery, PackedLatent, repad_latent
from . import pallas_kernels as pk
from .graph_filter import filter_correspondences
from .minutiae_match import minutiae_match_single
from .texture_match import (block_diag_codebook, decode_pq, decode_pq_matmul,
                            texture_similarity)


@dataclasses.dataclass
class DeviceGallery:
    """A PackedGallery resident on device (or as sharded global arrays).

    Device layouts are chosen for TPU tiling (last dim = lane, padded to
    128; second-to-last = sublane, padded to 8):
    - descriptors are TRANSPOSED to [G, D, R] so the large minutiae axis is
      the lane dimension (a trailing D=96 would pad to 128);
    - coordinates are split into separate x / y planes [G, R] (a trailing
      2 would pad to 128, a 64x inflation);
    - PQ codes are stored FLAT [G, Rt*S] (a trailing S=16 would pad 8x).

    Texture descriptors live either as flat uint8 PQ codes (``tex_codes``,
    decoded on the fly per block — minimal HBM, for very large galleries)
    or pre-decoded reconstructions ``tex_dec`` [G, D, Rt] (removes the
    per-latent decode cost entirely).
    """
    minu_des: jax.Array              # [G, D, Rm] transposed
    minu_x: jax.Array                # [G, Rm]
    minu_y: jax.Array
    minu_ori: jax.Array
    minu_n: jax.Array
    tex_sqnorm: jax.Array            # [G, Rt]
    tex_x: jax.Array
    tex_y: jax.Array
    tex_ori: jax.Array
    tex_n: jax.Array
    names: List[str]
    n_real: int                      # entries before block padding
    tex_codes: Optional[jax.Array] = None   # [G, Rt*S] uint8 flat
    tex_dec: Optional[jax.Array] = None     # [G, D, Rt] transposed
    tex_codes_t: Optional[jax.Array] = None  # [G, S, Rt] uint8 planes (TPU
    #                                          codes-resident mode: decoded
    #                                          in VMEM by the Pallas kernel)
    minu_scale: Optional[jax.Array] = None   # [1] f32 dequant scale when
    #                                          minu_des is int8-stored

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

    # Pre-decode whenever the texture reconstructions fit the HBM budget:
    # the on-the-fly one-hot decode materializes a ~0.5 GB one-hot per block
    # (XLA does not fuse it into the dot) and is ~300x slower per scan. Past
    # the budget the codes-resident path still works, just slower — a Pallas
    # in-VMEM decode kernel is the planned fix for >9 GB galleries.
    PREDECODE_BUDGET_BYTES = 9_000_000_000

    def __init__(self, codebook: np.ndarray, block_size: int = 64,
                 compute_dtype=jnp.float32,
                 predecode: Optional[bool] = None,
                 tex_int8: bool = False,
                 codes_resident: Optional[bool] = None,
                 minu_int8: bool = False):
        codebook = np.asarray(codebook, np.float32)
        self.codebook = codebook
        self.n_subs, self.n_clusters, self.sub_dim = codebook.shape
        # int8 texture mode: decoded gallery values are exact codebook
        # entries, so a single global scale bounds them tightly
        self.tex_int8 = bool(tex_int8)
        self._tex_scale_g = float(np.abs(codebook).max()) / 127.0 + 1e-12
        self._codebook_flat = jnp.asarray(
            codebook.reshape(self.n_subs * self.n_clusters, self.sub_dim))
        self._decode_tensor = block_diag_codebook(codebook,
                                                  dtype=compute_dtype)
        # transposed decode tensor for the in-VMEM decode kernel
        D = self.n_subs * self.sub_dim
        self._decode_tensor_t = jnp.asarray(
            np.asarray(self._decode_tensor, np.float32)
            .reshape(self.n_subs * self.n_clusters, D).T, compute_dtype)
        self.block_size = int(block_size)
        self.compute_dtype = compute_dtype
        self.predecode = predecode
        self.codes_resident = codes_resident
        # int8 minutiae-descriptor storage: halves the dominant HBM array
        # (gallery minutiae descriptors); the dequant scale is folded into
        # the latent operand at match time like the tex_int8 path
        self.minu_int8 = bool(minu_int8)
        # None = follow jax.default_backend(); True/False = explicit override
        # (used by the CPU-side Mosaic lowering-legality tests)
        self.force_tpu_path: Optional[bool] = None
        # _match_all is natively batched over a leading latent axis: the
        # gallery (and per-block decode) is shared across the batch, the
        # texture scoring runs as one Pallas kernel over an (NL, B) grid,
        # and graph filtering vmaps over (NL, B).
        self._match_fn = jax.jit(self._match_all,
                                 static_argnames=("components",))
        # serving-path jit cache: callables built per static configuration
        # (decode chunking, mesh sharding) are cached here so repeat calls
        # hit XLA's compile cache instead of retracing a fresh closure
        self._fn_cache: dict = {}

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
        Gp, Rt, S = pad(packed.tex_codes).shape[0], packed.tex_codes.shape[1], \
            packed.tex_codes.shape[2]
        # codes-resident TPU mode: ship transposed code planes (decoded in
        # VMEM per block by the Pallas kernel) instead of flat codes
        codes_resident = self.codes_resident if self.codes_resident is not None \
            else (not self._should_predecode(Gp, Rt)
                  and jax.default_backend() != "cpu")
        codes_field = dict(
            tex_codes_t=put(np.ascontiguousarray(
                np.swapaxes(pad(packed.tex_codes), 1, 2)))
        ) if codes_resident else dict(
            tex_codes=put(pad(packed.tex_codes).reshape(Gp, Rt * S)))
        if self.minu_int8:
            mscale = float(np.abs(packed.minu_des).max()) / 127.0 + 1e-12
            minu_dev = np.clip(np.round(
                np.swapaxes(pad(packed.minu_des), 1, 2) / mscale),
                -127, 127).astype(np.int8)
            minu_scale = put(np.full((1,), mscale, np.float32))
        else:
            minu_dev = np.swapaxes(pad(packed.minu_des), 1, 2).astype(dtype)
            minu_scale = None
        gal = DeviceGallery(
            minu_des=put(minu_dev),
            minu_x=put(pad(packed.minu_xy)[:, :, 0].copy()),
            minu_y=put(pad(packed.minu_xy)[:, :, 1].copy()),
            minu_ori=put(pad(packed.minu_ori)),
            minu_n=put(pad(packed.minu_n)),
            tex_sqnorm=put(pad(packed.tex_sqnorm)),
            tex_x=put(pad(packed.tex_xy)[:, :, 0].copy()),
            tex_y=put(pad(packed.tex_xy)[:, :, 1].copy()),
            tex_ori=put(pad(packed.tex_ori)),
            tex_n=put(pad(packed.tex_n)),
            names=list(packed.names),
            n_real=G0,
            minu_scale=minu_scale,
            **codes_field,
        )
        return self.maybe_predecode(gal, n_subs=S)

    def _should_predecode(self, G: int, Rt: int) -> bool:
        if self.predecode is not None:
            return bool(self.predecode)
        D = self.n_subs * self.sub_dim
        nbytes = G * Rt * D * (1 if self.tex_int8 else 2)
        return nbytes < self.PREDECODE_BUDGET_BYTES

    def _decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Backend-appropriate decode: MXU one-hot matmul on TPU, row
        gather elsewhere."""
        if jax.default_backend() == "cpu":
            return decode_pq(codes, self._codebook_flat, self.n_clusters,
                             dtype=self.compute_dtype)
        return decode_pq_matmul(codes, self._decode_tensor)

    def maybe_predecode(self, gal: DeviceGallery,
                        n_subs: Optional[int] = None) -> DeviceGallery:
        """Decode the texture gallery to the compute dtype on device when
        the HBM budget allows; the per-latent decode cost disappears from
        the match step. Output is the transposed [G, D, Rt] layout."""
        if gal.tex_codes is None:
            return gal
        S = n_subs or self.n_subs
        G, flat = gal.tex_codes.shape
        Rt = flat // S
        D = S * self.sub_dim
        if not self._should_predecode(G, Rt):
            return gal

        chunk = max(1, min(G, (1 << 27) // max(Rt * D, 1)))
        nchunks = (G + chunk - 1) // chunk
        Gpad = nchunks * chunk
        codes = gal.tex_codes
        if Gpad != G:
            codes = jnp.concatenate(
                [codes, jnp.zeros((Gpad - G, flat), codes.dtype)])

        dec = self._decode_all_fn(nchunks, chunk, Rt, S)(codes)[:G]
        return dataclasses.replace(gal, tex_dec=dec, tex_codes=None)

    def _decode_all_fn(self, nchunks: int, chunk: int, Rt: int, S: int):
        """Cached jitted whole-gallery decoder (a fresh closure per call
        would retrace every time — jit caches on function identity)."""
        key = ("decode_all", nchunks, chunk, Rt, S)
        if key not in self._fn_cache:
            D = S * self.sub_dim
            Gpad = nchunks * chunk

            @jax.jit
            def decode_all(codes):
                blocks = codes.reshape(nchunks, chunk, Rt, S)

                def one(blk):
                    dec = self._decode(blk)
                    if self.tex_int8:
                        dec = jnp.clip(jnp.round(dec.astype(jnp.float32)
                                                 / self._tex_scale_g),
                                       -127, 127).astype(jnp.int8)
                    return jnp.swapaxes(dec, 1, 2)             # [chunk, D, Rt]
                return jax.lax.map(one, blocks).reshape(Gpad, D, Rt)

            self._fn_cache[key] = decode_all
        return self._fn_cache[key]

    # ------------------------------------------------------------------
    def _match_all(self, lat: dict, gal: dict,
                   components: bool = False) -> jnp.ndarray:
        """Jitted: NL latents against the full gallery -> scores [NL, G].

        Latent arrays carry a leading NL axis; the gallery is scanned in
        blocks of B entries shared by the whole latent batch.
        ``components=True`` returns the unfused per-stage scores
        (s_minu [NL, T, G], s_tex [NL, G]) instead of the fused vector —
        the One2One_matching_all_templates surface (matcher.cpp:339-374)
        and the per-stage diagnostics both consume this.
        """
        B = self.block_size
        G = gal["minu_des"].shape[0]
        nb = G // B
        dtype = self.compute_dtype
        # force_tpu_path=True lets the Mosaic-legality test trace/export the
        # TPU kernel path from a CPU host (jax.export platforms=['tpu'])
        on_tpu = (self.force_tpu_path if self.force_tpu_path is not None
                  else jax.default_backend() != "cpu")

        NL, T, Lm, D = lat["minu_des"].shape
        lat_minu_valid = jnp.arange(Lm)[None, None, :] \
            < lat["minu_n"][:, :, None]                      # [NL, T, Lm]
        Lt = lat["tex_des"].shape[1]
        lat_tex_valid = jnp.arange(Lt)[None, :] < lat["tex_n"][:, None]
        lat_tex_des = lat["tex_des"].astype(dtype)           # [NL, Lt, D]
        lat_sqnorm = jnp.sum(lat["tex_des"].astype(jnp.float32) ** 2, axis=-1)
        if "minu_scale" in gal:
            # int8-stored gallery descriptors: fold the dequant scale into
            # the (tiny) latent operand
            lat_minu_des = (lat["minu_des"].astype(jnp.float32)
                            * gal["minu_scale"][0]).astype(dtype)
        else:
            lat_minu_des = lat["minu_des"].astype(dtype)

        # flatten (NL, T) -> one latent-template axis for the minutiae vmap
        def flat(a):
            return a.reshape((NL * T,) + a.shape[2:])
        fl_des = flat(lat_minu_des)
        fl_xy = flat(lat["minu_xy"])
        fl_ori = flat(lat["minu_ori"])
        fl_valid = lat_minu_valid.reshape(NL * T, Lm)

        def pair_minu(t_des, t_xy, t_ori, t_valid, r_des, r_xy, r_ori, r_valid):
            return minutiae_match_single(t_des, t_xy, t_ori, t_valid,
                                         r_des, r_xy, r_ori, r_valid)

        over_gallery = jax.vmap(pair_minu,
                                in_axes=(None, None, None, None, 0, 0, 0, 0))
        over_templates = jax.vmap(over_gallery,
                                  in_axes=(0, 0, 0, 0, None, None, None, None))

        # TPU path: coordinate packs as [.., 4, P] planes, consumed directly
        # by the gather-fusing filter kernel (latent side is block-invariant
        # so it is built once outside the scan)
        lat_packT = jnp.stack(
            [fl_xy[..., 0], fl_xy[..., 1],
             jnp.cos(fl_ori), jnp.sin(fl_ori)], axis=1)      # [NT, 4, Lm]
        lat_tpackT = jnp.stack(
            [lat["tex_xy"][..., 0], lat["tex_xy"][..., 1],
             jnp.cos(lat["tex_ori"]), jnp.sin(lat["tex_ori"])],
            axis=1)                                          # [NL, 4, Lt]

        def pair_tex(val, li, ri, lxy, lori, r_xy, r_ori, tex_n):
            valid = val > pk.NEG_BIG / 2
            val = jnp.where(valid, val, 0.0)
            # spec candidate-list order (reference_impl / matcher.cpp:736-749):
            # latent-row order when <= 200 rows survive, else value-sorted —
            # the engine's top_k slots are value-ordered, so ties need the
            # row index as key in the small case (slot order already matches
            # the sorted case)
            K = val.shape[0]
            row_key = jnp.where(tex_n <= MC.TOPN_TEX_CORR,
                                -li.astype(jnp.float32),
                                -jnp.arange(K, dtype=jnp.float32))
            return filter_correspondences(
                val, li, ri, lxy[li], lori[li], r_xy[ri], r_ori[ri],
                valid, lookup=True, dist_iters=3, tie_keys=(row_key,))

        def get_block(i):
            # dynamic_slice per step: a whole-array reshape would make XLA
            # relayout-copy the entire gallery
            return {k: jax.lax.dynamic_slice_in_dim(v, i * B, B, axis=0)
                    for k, v in gal.items() if k != "minu_scale"}

        k_tex = min(MC.TOPN_TEX_CORR, Lt)

        def step(carry, i):
            blk = get_block(i)
            if not on_tpu and blk["minu_des"].dtype == jnp.int8:
                # the TPU kernels cast int8 tiles in VMEM (halving the
                # dominant HBM read); the XLA path casts here
                blk["minu_des"] = blk["minu_des"].astype(dtype)
            Rm = blk["minu_des"].shape[2]
            rol_minu_valid = jnp.arange(Rm)[None, :] < blk["minu_n"][:, None]
            Rt = blk["tex_sqnorm"].shape[1]
            rol_tex_valid = jnp.arange(Rt)[None, :] < blk["tex_n"][:, None]
            minu_xy = jnp.stack([blk["minu_x"], blk["minu_y"]], axis=-1)
            tex_xy = jnp.stack([blk["tex_x"], blk["tex_y"]], axis=-1)

            if on_tpu:
                rol_packT = jnp.stack(
                    [blk["minu_x"], blk["minu_y"],
                     jnp.cos(blk["minu_ori"]), jnp.sin(blk["minu_ori"])],
                    axis=1)                                      # [B, 4, Rm]
                # whole minutiae-template match in one kernel: similarity
                # GEMM + mutual norm + top-120 threshold selection +
                # two-stage graph filter, nothing but scores leave VMEM
                # (the XLA formulation paid ~25 ms/block in approx_max_k
                # alone and materialized the [NT, B, Lm, Rm] similarity)
                s_minu = pk.fused_minutiae_match(
                    fl_des, fl_valid.astype(jnp.float32),
                    blk["minu_des"], rol_minu_valid.astype(jnp.float32),
                    lat_packT, rol_packT, top_n=MC.TOPN_MINU_CORR,
                    lookup=False, dist_iters=5).reshape(NL, T, B)
            else:
                s_minu = over_templates(
                    fl_des, fl_xy, fl_ori, fl_valid,
                    blk["minu_des"], minu_xy, blk["minu_ori"], rol_minu_valid,
                ).reshape(NL, T, B)

            if "tex_codes_t" in blk:                         # TPU only
                # codes-resident mode: PQ decode happens inside the kernel
                decoded_t = None
                best, bestj = pk.fused_adc_rowmax_codes(
                    lat_tex_des, lat_sqnorm, blk["tex_codes_t"],
                    self._decode_tensor_t, blk["tex_sqnorm"],
                    rol_tex_valid.astype(jnp.float32),
                    n_clusters=self.n_clusters, interpret=not on_tpu)
            elif "tex_dec" in blk:
                decoded_t = blk["tex_dec"]                   # [B, D, Rt]
            else:
                codes = blk["tex_codes"].reshape(B, Rt, -1)
                decoded_t = jnp.swapaxes(self._decode(codes), 1, 2)

            if decoded_t is not None and decoded_t.dtype == jnp.int8:
                # int8 storage, bf16 compute: fold the dequant scale into
                # the (tiny) latent operand; the kernel casts per block
                x_eff = (lat_tex_des.astype(jnp.float32)
                         * self._tex_scale_g).astype(dtype)
            else:
                x_eff = lat_tex_des

            if decoded_t is None:
                pass                                         # handled above
            elif on_tpu:
                best, bestj = pk.fused_adc_rowmax(
                    x_eff, lat_sqnorm, decoded_t,
                    blk["tex_sqnorm"], rol_tex_valid.astype(jnp.float32))
            else:
                def one_simi(xd, xsq, xv):
                    dec = decoded_t
                    if dec.dtype == jnp.int8:
                        dec = dec.astype(jnp.float32)
                    return texture_similarity(xd, xsq, xv, dec,
                                              blk["tex_sqnorm"], rol_tex_valid)
                simi = jax.vmap(one_simi)(x_eff.astype(jnp.float32)
                                          if decoded_t.dtype == jnp.int8
                                          else lat_tex_des,
                                          lat_sqnorm,
                                          lat_tex_valid)     # [NL, B, Lt, Rt]
                best = jnp.max(simi, axis=-1)
                bestj = jnp.argmax(simi, axis=-1).astype(jnp.int32)
                best = jnp.where(jnp.isfinite(best), best, pk.NEG_BIG)

            if on_tpu:
                rol_tpackT = jnp.stack(
                    [blk["tex_x"], blk["tex_y"],
                     jnp.cos(blk["tex_ori"]), jnp.sin(blk["tex_ori"])],
                    axis=1)                                      # [B, 4, Rt]
                # top-200 threshold selection + graph filter in one kernel
                # (XLA's top_k(448->200) + index gather cost ~14 ms/block)
                s_tex = pk.fused_texture_match(
                    best, bestj, lat_tex_valid.astype(jnp.float32),
                    lat_tpackT, rol_tpackT, top_n=k_tex, lookup=True,
                    dist_iters=3)                                # [NL, B]
            else:
                # invalid latent rows drop out of the top-K
                best = jnp.where(lat_tex_valid[:, None, :], best, pk.NEG_BIG)
                topv, li = jax.lax.top_k(best, k_tex)        # [NL, B, k]
                ri = jnp.take_along_axis(bestj, li, axis=2)
                s_tex = jax.vmap(jax.vmap(pair_tex,
                                          in_axes=(0, 0, 0, None, None, 0, 0,
                                                   None)),
                                 in_axes=(0, 0, 0, 0, 0, None, None, 0))(
                    topv, li, ri, lat["tex_xy"], lat["tex_ori"],
                    tex_xy, blk["tex_ori"], lat["tex_n"])    # [NL, B]

            if components:
                return carry, (s_minu, s_tex)
            fused = jnp.sum(s_minu, axis=1) + MC.TEXTURE_SCORE_WEIGHT * s_tex
            nonempty = (blk["minu_n"] > 0) | (blk["tex_n"] > 0)
            return carry, jnp.where(nonempty[None, :], fused, -1.0)

        _, scores = jax.lax.scan(step, None, jnp.arange(nb))
        if components:
            s_minu, s_tex = scores                # [nb, NL, T/-, B]
            return (jnp.moveaxis(s_minu, 0, 2).reshape(NL, T, nb * B),
                    jnp.swapaxes(s_tex, 0, 1).reshape(NL, nb * B))
        # scores: [nb, NL, B] -> [NL, G]
        return jnp.swapaxes(scores, 0, 1).reshape(NL, nb * B)

    # ------------------------------------------------------------------
    def _screen_all(self, lat: dict, gal: dict, tau: float = 0.0,
                    normalize: bool = False, lt_cap: int = 0,
                    minu_t_cap: int = 0) -> jnp.ndarray:
        """Jitted screening pass: cheap MXU-only score [NL, G].

        With ``tau=0``/``normalize=False`` the result is a strict upper
        bound on the exact fused score (see fused_minu_screen /
        fused_adc_screen): the exact score sums raw similarities of
        one-to-one survivor sets, so summed row/col maxima bound each
        component. Serving runs the exact VPU-heavy path only on the top-M
        screened candidates (screen-then-rerank, docs/PERF.md).

        ``lt_cap``/``minu_t_cap`` truncate the LATENT side (first lt_cap
        texture minutiae, first minu_t_cap minutiae templates) for the
        cheap first stage of two-stage screening: cost scales linearly in
        both, and a partial-sum screen still ranks mates far above the
        impostor noise floor. Recorded evidence for truncation is
        MATE-RETRIEVAL (rank-1) agreement with dense, NOT top-24 set/order
        parity — on iid-impostor galleries the recorded top-24 set overlap
        is 1/24 (results/rank_parity_100k{,_cap}.json); use the
        untruncated rerank or dense path for top-24-fidelity claims.
        """
        if minu_t_cap or lt_cap:
            lat = dict(lat)
            if minu_t_cap and minu_t_cap < lat["minu_des"].shape[1]:
                lat["minu_des"] = lat["minu_des"][:, :minu_t_cap]
                lat["minu_n"] = lat["minu_n"][:, :minu_t_cap]
            if lt_cap and lt_cap < lat["tex_des"].shape[1]:
                lat["tex_des"] = lat["tex_des"][:, :lt_cap]
                lat["tex_n"] = jnp.minimum(lat["tex_n"], lt_cap)
        B = self.block_size
        G = gal["minu_des"].shape[0]
        nb = G // B
        dtype = self.compute_dtype
        on_tpu = (self.force_tpu_path if self.force_tpu_path is not None
                  else jax.default_backend() != "cpu")

        NL, T, Lm, D = lat["minu_des"].shape
        lat_minu_valid = (jnp.arange(Lm)[None, None, :]
                          < lat["minu_n"][:, :, None]).astype(jnp.float32)
        Lt = lat["tex_des"].shape[1]
        lat_tex_valid = (jnp.arange(Lt)[None, :]
                         < lat["tex_n"][:, None]).astype(jnp.float32)
        lat_sqnorm = jnp.sum(lat["tex_des"].astype(jnp.float32) ** 2, -1)
        if "minu_scale" in gal:
            lat_minu_des = (lat["minu_des"].astype(jnp.float32)
                            * gal["minu_scale"][0]).astype(dtype)
        else:
            lat_minu_des = lat["minu_des"].astype(dtype)
        fl_des = lat_minu_des.reshape(NL * T, Lm, D)
        fl_valid = lat_minu_valid.reshape(NL * T, Lm)

        def get_block(i):
            return {k: jax.lax.dynamic_slice_in_dim(v, i * B, B, axis=0)
                    for k, v in gal.items() if k != "minu_scale"}

        def step(carry, i):
            blk = get_block(i)
            Rm = blk["minu_des"].shape[2]
            rol_minu_valid = (jnp.arange(Rm)[None, :]
                              < blk["minu_n"][:, None]).astype(jnp.float32)
            Rt = blk["tex_sqnorm"].shape[1]
            rol_tex_valid = (jnp.arange(Rt)[None, :]
                             < blk["tex_n"][:, None]).astype(jnp.float32)

            s_minu = pk.fused_minu_screen(
                fl_des, fl_valid, blk["minu_des"], rol_minu_valid,
                normalize=normalize,
                interpret=not on_tpu).reshape(NL, T, B).sum(axis=1)

            if "tex_codes_t" in blk and on_tpu:
                # codes-resident: PQ decode in VMEM (the XLA one-hot decode
                # is ~300x slower per scan)
                s_tex = pk.fused_adc_screen_codes(
                    lat["tex_des"].astype(dtype), lat_sqnorm,
                    lat_tex_valid, blk["tex_codes_t"],
                    self._decode_tensor_t, blk["tex_sqnorm"],
                    rol_tex_valid, n_clusters=self.n_clusters, tau=tau)
            else:
                if "tex_codes_t" in blk:
                    codes = jnp.swapaxes(blk["tex_codes_t"], 1, 2)
                    decoded_t = jnp.swapaxes(self._decode(codes), 1, 2)
                elif "tex_dec" in blk:
                    decoded_t = blk["tex_dec"]
                else:
                    codes = blk["tex_codes"].reshape(B, Rt, -1)
                    decoded_t = jnp.swapaxes(self._decode(codes), 1, 2)
                if decoded_t.dtype == jnp.int8:
                    x_eff = (lat["tex_des"].astype(jnp.float32)
                             * self._tex_scale_g).astype(dtype)
                else:
                    x_eff = lat["tex_des"].astype(dtype)
                s_tex = pk.fused_adc_screen(
                    x_eff, lat_sqnorm, lat_tex_valid, decoded_t,
                    blk["tex_sqnorm"], rol_tex_valid, tau=tau,
                    interpret=not on_tpu)                    # [NL, B]

            screen = s_minu + MC.TEXTURE_SCORE_WEIGHT * s_tex
            nonempty = (blk["minu_n"] > 0) | (blk["tex_n"] > 0)
            return carry, jnp.where(nonempty[None, :], screen, -1.0)

        _, scores = jax.lax.scan(step, None, jnp.arange(nb))
        return jnp.swapaxes(scores, 0, 1).reshape(NL, nb * B)

    def _screen_fn(self, tau: float, normalize: bool):
        key = ("screen", tau, normalize)
        if key not in self._fn_cache:
            self._fn_cache[key] = jax.jit(functools.partial(
                self._screen_all, tau=tau, normalize=normalize))
        return self._fn_cache[key]

    def screen_scores_batch(self, latents: Sequence[PackedLatent],
                            gallery: "DeviceGallery", tau: float = 0.0,
                            normalize: bool = False) -> jax.Array:
        """Screening scores [NL, G_padded] for a batch of latents."""
        return self._screen_fn(tau, normalize)(
            self._latent_dict(latents), self._gallery_dict(gallery))

    # ------------------------------------------------------------------
    # Split serving (large galleries). Fusing screen + gather + exact into
    # one program makes XLA wrap the gallery operands in rematerialization
    # copies (measured at G=400K: full s8[G,96,96] + u8[G,16,448] +
    # 4x f32[G,448] "remat_uncompressed = copy(...)" HLO temps = ~11 GB —
    # the old ~250K full-serving OOM bound). Splitting the three phases
    # into separate dispatches keeps each program's temps to just the
    # gathered sub-galleries, so full serving runs at the 400K single-chip
    # residency. Costs two extra tunnel round-trips (~60 ms).

    def _screen_topk_fn(self, m_pad: int, tau: float, normalize: bool,
                        prescreen_k: int, prescreen_lt: int,
                        prescreen_t: int):
        key = ("screen_topk", m_pad, tau, normalize, prescreen_k,
               prescreen_lt, prescreen_t)
        if key not in self._fn_cache:
            @jax.jit
            def f(lat: dict, gal: dict):
                G = gal["minu_des"].shape[0]
                if prescreen_k and prescreen_k < G:
                    s = self._screen_all(lat, gal, tau=tau,
                                         normalize=normalize,
                                         lt_cap=prescreen_lt,
                                         minu_t_cap=prescreen_t)
                else:
                    s = self._screen_all(lat, gal, tau=tau,
                                         normalize=normalize)
                return jax.lax.top_k(s, min(m_pad + 1, G))
            self._fn_cache[key] = f
        return self._fn_cache[key]

    def _gather_subs_fn(self):
        key = ("gather_subs",)
        if key not in self._fn_cache:
            @jax.jit
            def g(gal: dict, idx: jax.Array):       # idx [NL, m_pad]
                nl, m = idx.shape
                flat = idx.reshape(-1)
                return {kk: jnp.take(v, flat, axis=0)
                        .reshape((nl, m) + v.shape[1:])
                        for kk, v in gal.items() if kk != "minu_scale"}
            self._fn_cache[key] = g
        return self._fn_cache[key]

    def _exact_subs_fn(self, with_scale: bool):
        key = ("exact_subs", with_scale)
        if key not in self._fn_cache:
            @jax.jit
            def e(lat: dict, subs: dict, scale):
                def one(args):
                    lat_i, sub_i = args
                    lat_1 = {kk: v[None] for kk, v in lat_i.items()}
                    if with_scale:
                        sub_i = dict(sub_i, minu_scale=scale)
                    return self._match_all(lat_1, sub_i)[0]
                return jax.lax.map(one, (dict(lat), subs))
            self._fn_cache[key] = e
        return self._fn_cache[key]

    # ------------------------------------------------------------------
    def _rerank_fn(self, m_pad: int, tau: float, normalize: bool,
                   prescreen_k: int = 0, prescreen_lt: int = 0,
                   prescreen_t: int = 0):
        """Cached jitted screen+rerank: ONE device dispatch for the whole
        batch (a Python per-latent loop would pay a tunnel round-trip per
        latent). Screen scan -> global top-k -> lax.map over latents, each
        gathering its own m_pad-row sub-gallery (whole-row gathers lower to
        large-slice DMAs, unlike the elementwise take_along_axis the layout
        rules warn about) and running the exact dense path on it.

        With ``prescreen_k`` the screen itself is TWO-STAGE: a truncated-
        latent screen (prescreen_lt texture minutiae, prescreen_t minutiae
        templates — linearly cheaper) scans the full gallery, an
        approx_max_k keeps the top prescreen_k candidates, and only those
        get the full screen before the exact rerank. The full screen over
        100K was 78% of serving time (PROFILE_r04) with its kernel already
        at its measured ceiling; truncation attacks the work itself."""
        key = ("rerank", m_pad, tau, normalize, prescreen_k, prescreen_lt,
               prescreen_t)
        if key not in self._fn_cache:
            @jax.jit
            def rerank(lat: dict, gal: dict):
                G = gal["minu_des"].shape[0]

                def gather_sub(idx_i):
                    sub = {kk: jnp.take(v, idx_i, axis=0)
                           for kk, v in gal.items() if kk != "minu_scale"}
                    if "minu_scale" in gal:
                        sub["minu_scale"] = gal["minu_scale"]
                    return sub

                if prescreen_k and prescreen_k < G:
                    k1 = max(self.block_size,
                             (prescreen_k // self.block_size)
                             * self.block_size)
                    s1 = self._screen_all(lat, gal, tau=tau,
                                          normalize=normalize,
                                          lt_cap=prescreen_lt,
                                          minu_t_cap=prescreen_t)
                    if k1 <= m_pad:
                        # single truncated screen straight into the exact
                        # rerank (the exact pass re-orders everything it
                        # keeps, so a second screen stage buys nothing
                        # when every kept candidate is reranked anyway)
                        k = min(m_pad + 1, G)
                        topv, topi = jax.lax.top_k(s1, k)
                    else:
                        _, cand = jax.lax.approx_max_k(s1, k1)  # [NL, k1]

                        def screen_one(args):
                            lat_i, idx_i = args
                            lat_1 = {kk: v[None] for kk, v in lat_i.items()}
                            return self._screen_all(
                                lat_1, gather_sub(idx_i), tau=tau,
                                normalize=normalize)[0]        # [k1]

                        s2 = jax.lax.map(screen_one, (dict(lat), cand))
                        k = min(m_pad + 1, k1)
                        topv, sel = jax.lax.top_k(s2, k)
                        topi = jnp.take_along_axis(cand, sel[:, :k], axis=1)
                else:
                    screen = self._screen_all(lat, gal, tau=tau,
                                              normalize=normalize)
                    k = min(m_pad + 1, G)
                    topv, topi = jax.lax.top_k(screen, k)

                def one(args):
                    lat_i, idx_i = args
                    lat_1 = {kk: v[None] for kk, v in lat_i.items()}
                    return self._match_all(lat_1, gather_sub(idx_i))[0]

                lat_sliced = {kk: v for kk, v in lat.items()}
                exact = jax.lax.map(one, (lat_sliced, topi[:, :m_pad]))
                return topi, topv, exact
            self._fn_cache[key] = rerank
        return self._fn_cache[key]

    def match_scores_batch_reranked(
            self, latents: Sequence[PackedLatent], gallery: "DeviceGallery",
            m: int = 512, tau: float = 0.0, normalize: bool = False,
            prescreen_k: int = 0, prescreen_lt: int = 0,
            prescreen_t: int = 0, split_serving: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Screen-then-rerank serving path.

        ``split_serving`` (auto: galleries > 150K) runs screen/top-k,
        candidate gather, and exact rerank as THREE dispatches instead of
        one fused program — the fused program's remat copies of the
        gallery operands are what bounded full serving at ~250K.

        1. screen every (latent, gallery) pair with the MXU-only kernels
           (optionally two-stage: ``prescreen_k``/``prescreen_lt``/
           ``prescreen_t`` run a truncated-latent screen over the full
           gallery first and the full screen only on its top prescreen_k —
           the formal upper-bound property does NOT survive truncation;
           the recorded dense-vs-serving top-24 parity at 100K is the
           operative evidence for this mode);
        2. take the top-``m`` screened candidates per latent;
        3. run the exact dense path (graph filters included) on just those.

        Returns (idx [NL, m], exact [NL, m], margin [NL], threshold [NL]):
        per latent the reranked candidate indices, their exact scores, the
        top-24 containment margin (exact_24th - max screen outside the
        top-m) and the certified score threshold (= that outside max).
        With ``prescreen_k`` active the screen is truncated, so neither
        quantity bounds any excluded entry's exact score — both are
        returned as NaN in that mode.

        Certification semantics with the default bound screen (tau=0,
        normalize=False, prescreen_k=0; screen >= exact everywhere):
        - every excluded entry's exact score is provably <= ``threshold``;
        - margin >= 0 additionally proves the ENTIRE exact top-24 survived
          truncation.

        Measured behavior at bench shapes (scripts/exp_screen.py, 16K
        random gallery + planted mates): the bound carries a large
        common-mode (impostor screens ~420-483 vs impostor exact ~5-7;
        mate screen ~905 vs mate exact ~429), so both proofs are loose at
        scale — margin < 0 is normal, and threshold (~434) sits above even
        the mate's exact score. What screening DOES deliver, with a wide
        empirical margin, is mate retrieval: the mate ranked 1st in the
        screen ordering for 8/8 latents, separated from the best impostor
        screen by ~8x the impostor spread. The exact top-24's ranks 2-24
        are noise-level impostors whose relative order no sub-exact
        statistic can predict; rerank reports exact scores for everything
        it keeps and honest margins for what certification would need.
        """
        B = self.block_size
        lat_d = self._latent_dict(latents)
        gal_d = self._gallery_dict(gallery)
        NL = lat_d["minu_des"].shape[0]
        G = gal_d["minu_des"].shape[0]
        m_eff = min(m, G)
        m_pad = ((m_eff + B - 1) // B) * B
        m_pad = min(m_pad, G)

        k1 = (max(B, (prescreen_k // B) * B) if prescreen_k else 0)
        if split_serving is None:
            # fused single-dispatch serving wraps the gallery operands in
            # remat copies (see the split-serving comment above); beyond
            # ~150K templates those temps dominate HBM, so auto-split
            split_serving = G > 150_000
        if split_serving and (not prescreen_k or k1 <= m_pad):
            topv, topi = self._screen_topk_fn(
                m_pad, tau, normalize, prescreen_k, prescreen_lt,
                prescreen_t)(lat_d, gal_d)
            subs = self._gather_subs_fn()(gal_d, topi[:, :m_pad])
            exact = self._exact_subs_fn("minu_scale" in gal_d)(
                lat_d, subs, gal_d.get("minu_scale"))
        else:
            topi, topv, exact = self._rerank_fn(
                m_pad, tau, normalize, prescreen_k=prescreen_k,
                prescreen_lt=prescreen_lt,
                prescreen_t=prescreen_t)(lat_d, gal_d)
        topi_np = np.asarray(topi)
        exact = np.asarray(exact)
        if prescreen_k:
            # truncated screen: the outside-max no longer upper-bounds any
            # excluded entry's exact score, so certification quantities are
            # undefined (ADVICE r4) — report NaN rather than a false bound.
            nan = np.full((NL,), np.nan, np.float32)
            return topi_np[:, :m_pad], exact, nan, nan
        # max screen value OUTSIDE the rerank set (certification threshold;
        # only meaningful for the untruncated bound screen, see docstring)
        outside = (np.asarray(topv[:, m_pad]) if m_pad < G
                   else np.full((NL,), -np.inf, np.float32))
        order = np.argsort(-exact, axis=1, kind="stable")
        k24 = min(24, m_pad) - 1
        margin = exact[np.arange(NL), order[:, k24]] - outside
        return topi_np[:, :m_pad], exact, margin, outside

    def one_to_list_reranked(self, latent: PackedLatent,
                             gallery: "DeviceGallery", m: int = 512,
                             **kw) -> "MatchResult":
        """1:N with screen-then-rerank: exact scores for the top-m screened
        candidates, -1.0 (the reference's skip marker) elsewhere — the
        top-24 rank list equals the dense path's whenever the certification
        margin is >= 0."""
        idx, exact, _, _ = self.match_scores_batch_reranked(
            [latent], gallery, m=m, **kw)
        scores = np.full((len(gallery.names),), -1.0, np.float32)
        keep = idx[0] < gallery.n_real
        scores[idx[0][keep]] = exact[0][keep]
        return MatchResult(scores=scores, names=gallery.names)

    # ------------------------------------------------------------------
    @staticmethod
    def _latent_dict(lats: Sequence[PackedLatent]) -> dict:
        """Stack a batch of same-shape latents with a leading NL axis."""
        f = lambda attr: jnp.stack([jnp.asarray(getattr(l, attr))
                                    for l in lats])
        return dict(minu_des=f("minu_des"), minu_xy=f("minu_xy"),
                    minu_ori=f("minu_ori"), minu_n=f("minu_n"),
                    tex_des=f("tex_des"), tex_xy=f("tex_xy"),
                    tex_ori=f("tex_ori"), tex_n=f("tex_n"))

    @staticmethod
    def _gallery_dict(gal: DeviceGallery) -> dict:
        d = dict(minu_des=gal.minu_des, minu_x=gal.minu_x, minu_y=gal.minu_y,
                 minu_ori=gal.minu_ori, minu_n=gal.minu_n,
                 tex_sqnorm=gal.tex_sqnorm, tex_x=gal.tex_x, tex_y=gal.tex_y,
                 tex_ori=gal.tex_ori, tex_n=gal.tex_n)
        if gal.tex_dec is not None:
            d["tex_dec"] = gal.tex_dec
        elif gal.tex_codes_t is not None:
            d["tex_codes_t"] = gal.tex_codes_t
        else:
            d["tex_codes"] = gal.tex_codes
        if gal.minu_scale is not None:
            d["minu_scale"] = gal.minu_scale
        return d

    def match_scores(self, latent: PackedLatent, gallery: DeviceGallery) -> jax.Array:
        """Raw device scores [G_padded] for one latent."""
        return self._match_fn(self._latent_dict([latent]),
                              self._gallery_dict(gallery))[0]

    def match_scores_batch(self, latents: Sequence[PackedLatent],
                           gallery: DeviceGallery) -> jax.Array:
        """Scores [NL, G_padded] for a batch of same-shape latents."""
        return self._match_fn(self._latent_dict(latents),
                              self._gallery_dict(gallery))

    def one_to_one_all_templates(self, latent, rolled,
                                 quantize_tex_xy: bool = False) -> np.ndarray:
        """Unfused score vector for ONE latent/rolled Template pair: every
        latent minutiae template vs rolled minutiae template 0, followed by
        every latent texture template vs rolled texture template 0
        (One2One_matching_all_templates, matcher.cpp:339-374; NumPy spec:
        reference_impl.one2one_all_templates_scores)."""
        import copy

        from ..templates.packing import pack_gallery, pack_latent
        n_minu = len(latent.minu_template)
        n_tex = len(latent.texture_template)
        out = np.zeros((n_minu + n_tex,), np.float32)
        if (n_minu <= 0 and n_tex <= 0) or (
                not rolled.minu_template and not rolled.texture_template):
            return out
        gal = self.load_gallery(pack_gallery([rolled], self.codebook,
                                             names=["rolled"]))
        for ti in range(max(n_tex, 1)):
            lt = latent
            if ti > 0:
                lt = copy.copy(latent)
                lt.texture_template = latent.texture_template[ti:ti + 1]
            packed = pack_latent(lt, selected=tuple(range(max(n_minu, 1))),
                                 quantize_tex_xy=quantize_tex_xy)
            s_minu, s_tex = self._match_fn(
                self._latent_dict([packed]), self._gallery_dict(gal),
                components=True)
            if ti == 0 and n_minu and rolled.minu_template:
                out[:n_minu] = np.asarray(s_minu)[0, :n_minu, 0]
            if n_tex and rolled.texture_template:
                out[n_minu + ti] = float(np.asarray(s_tex)[0, 0])
        return out

    def one_to_list(self, latent: PackedLatent, gallery: DeviceGallery) -> MatchResult:
        scores = np.asarray(self.match_scores(latent, gallery))[:gallery.n_real]
        return MatchResult(scores=scores, names=gallery.names)

    def list_to_list(self, latents: Sequence[PackedLatent],
                     gallery: DeviceGallery,
                     lm_bucket: int = 32, lt_bucket: int = 128,
                     max_batch: int = 8) -> List[MatchResult]:
        """Batch (-ldir) mode: every latent against the whole gallery.

        Real latent directories are heterogeneous (ragged minutiae counts
        per image — List2List_matching, matcher.cpp:96-214). Padding every
        latent to the global max would waste compute; compiling per exact
        shape would retrace per latent. Instead latents are padded up to
        (lm_bucket, lt_bucket) multiples and matched bucket by bucket, so
        the engine compiles O(#buckets) variants. Results come back in
        input order.
        """
        buckets: dict = {}
        for i, lat in enumerate(latents):
            blm = -(-max(int(lat.minu_n.max()), 1) // lm_bucket) * lm_bucket
            blt = -(-max(int(lat.tex_n), 1) // lt_bucket) * lt_bucket
            key = (lat.minu_des.shape[0], blm, blt, lat.minu_des.shape[2])
            buckets.setdefault(key, []).append(
                (i, repad_latent(lat, blm, blt)))

        out: List[Optional[MatchResult]] = [None] * len(latents)
        for (_, _, _, _), group in sorted(buckets.items()):
            for start in range(0, len(group), max_batch):
                chunk = group[start:start + max_batch]
                idxs = [i for i, _ in chunk]
                scores = np.asarray(self.match_scores_batch(
                    [l for _, l in chunk], gallery))
                for i, s in zip(idxs, scores):
                    out[i] = MatchResult(scores=s[:gallery.n_real],
                                         names=gallery.names)
        return out  # type: ignore[return-value]


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


def write_corr_files(latent, rolled, codebook: np.ndarray, prefix: str) -> List[str]:
    """Write the surviving minutiae correspondences for one latent/rolled
    pair as ``<prefix>_<i>.csv`` (one per selected latent minutiae template,
    rows ``lx,ly,rx,ry``) — the reference's save_corr output for the top-24
    candidates (matcher.cpp:305-330, :405-406, :497-506).

    ``latent``/``rolled`` are in-memory Templates (templates.data_model);
    returns the list of files written."""
    from .reference_impl import one2one_selected_scores
    out = one2one_selected_scores(latent, rolled, codebook, return_corr=True)
    written: List[str] = []
    if out is None:
        return written
    _, corrs = out
    for i, corr in enumerate(corrs):
        path = f"{prefix}_{i}.csv"
        with open(path, "w") as f:
            for lx, ly, rx, ry in corr:
                f.write(f"{lx:g},{ly:g},{rx:g},{ry:g}\n")
        written.append(path)
    return written
