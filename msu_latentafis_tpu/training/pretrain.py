"""Stand-in model pretraining on synthetic ridge data.

The reference ships no weights (its checkpoints are external downloads), so
usable stand-ins are trained from the synthetic fingerprint prior
(training.synthetic_data): the enhancement AEC learns to undo degradations,
the minutiae net learns cylinder regression on planted minutiae, the
descriptor net learns identity-discriminative embeddings, and CompNet learns
an autoencoding-style 192->96 projection preserving cosine structure.

Run: ``python -m msu_latentafis_tpu.training.pretrain --out <ckpt_dir>
[--steps N]``. Checkpoints are Orbax directories consumable by
pipeline.ModelBundle.
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Optional

if os.environ.get("PRETRAIN_CPU") == "1":
    # the stand-in nets are small enough that host training beats paying
    # the remote-compile tunnel's minutes-per-shape latency (CLAUDE.md);
    # forcing CPU needs BOTH the env var and the config update
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if os.environ.get("PRETRAIN_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
# On TPU the default matmul precision is bfloat16; the small stand-in nets
# train fine with it MOST of the time, but the enhancement AEC measurably
# converges to a worse plateau (flat L2, collapsed block mask on real SD27
# latents) than the same seed trained in f32 on CPU. Training throughput is
# dispatch-latency-bound through the tunnel anyway, so full-precision
# matmuls cost nothing observable — force them.
jax.config.update("jax_default_matmul_precision",
                  os.environ.get("PRETRAIN_PRECISION", "highest"))
import jax.numpy as jnp
import numpy as np

from ..models import CompNet, DescriptorNet, EnhancementAEC, MinutiaeAEC
from ..pipeline.models_bundle import save_checkpoint
from . import losses
from .augment import make_training_pair
from .synthetic_data import (synthetic_descriptor_batch,
                             synthetic_enhancement_sample,
                             synthetic_minutiae_sample)
from .trainer import create_train_state, l2_train_step, triplet_train_step


def _variables(state):
    return {"params": state.params, "batch_stats": state.batch_stats}


def _pool_cache(name: str, builder):
    """Host-side training pools are expensive on few cores; cache them as
    .npz so data generation can run ahead of (or apart from) the TPU
    training run. Set PRETRAIN_POOL_DIR to enable."""
    root = os.environ.get("PRETRAIN_POOL_DIR", "")
    if not root:
        return builder()
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, name + ".npz")
    if os.path.exists(path):
        z = np.load(path)
        return tuple(z[k] for k in sorted(z.files))
    out = builder()
    np.savez(path, **{f"a{i}": a for i, a in enumerate(out)})
    return out


def _maybe_resume(state, resume_from):
    """Continue training from a saved checkpoint's params/batch_stats
    (optimizer state restarts — acceptable for these small nets)."""
    if not resume_from or not os.path.isdir(resume_from):
        return state
    from ..pipeline.models_bundle import _try_restore
    v = _try_restore(resume_from, {"params": state.params,
                                   "batch_stats": state.batch_stats})
    print(f"resumed weights from {resume_from}", flush=True)
    return state.replace(params=v["params"],
                         batch_stats=v.get("batch_stats", state.batch_stats))


def pretrain_minutiae(steps: int = 300, batch: int = 16, size: int = 128,
                      nf: int = 64, seed: int = 0, log_every: int = 50,
                      pool: int = 256, model: Optional[object] = None,
                      resume_from: str = ""):
    rng = np.random.default_rng(seed)
    if model is None:
        model = MinutiaeAEC(nf=nf)
    key = jax.random.PRNGKey(seed)
    state = create_train_state(model, key, jnp.zeros((batch, size, size, 1)))
    state = _maybe_resume(state, resume_from)
    step_fn = jax.jit(l2_train_step)
    print("generating minutiae training pool...", flush=True)

    def build():
        # mix of deployment input domains: STFT-enhanced (latent path),
        # cartoon-texture (rolled path), and raw ridge imagery
        domains = ["stft", "stft", "cartoon", "none"]
        data = [synthetic_minutiae_sample(rng, size=size,
                                          n_minutiae=int(rng.integers(4, 14)),
                                          preprocess=domains[i % len(domains)])
                for i in range(pool)]
        return (np.stack([d[0] for d in data]) / 128.0 - 1.0,
                np.stack([d[1] for d in data]))

    xs_all, ys_all = _pool_cache(f"minutiae_v4_{size}_{pool}_{seed}", build)
    # Target amplification (stand-in calibration): the pipeline's decode
    # thresholds are the REFERENCE's (0.05/0.10/0.25 per set,
    # extraction_latent.py:119-130) and assume confident heatmap peaks.
    # An L2-regressed stand-in undershoots the unit-peak cylinder GT
    # (measured peaks < 0.25 on real latents -> the AEC/gabor detection
    # sets came back empty); x3 targets put genuine peaks ~1.5-2 so the
    # reference thresholds bite as intended. Decode's sub-bin
    # interpolation is ratio-based (scale-invariant), and confidences
    # only order/filter.
    TARGET_GAIN = float(os.environ.get("PRETRAIN_TARGET_GAIN", "3.0"))
    for i in range(steps):
        idx = rng.integers(0, pool, batch)
        state, loss = step_fn(state, jnp.asarray(xs_all[idx]),
                              jnp.asarray(TARGET_GAIN * ys_all[idx]))
        if i % log_every == 0:
            print(f"minutiae step {i}: loss {float(loss):.1f}", flush=True)
    return model, _variables(state)


def pretrain_enhancement(steps: int = 300, batch: int = 16, size: int = 128,
                         seed: int = 0, log_every: int = 50,
                         pool: int = 384, resume_from: str = ""):
    rng = np.random.default_rng(seed)
    model = EnhancementAEC()
    key = jax.random.PRNGKey(seed)
    state = create_train_state(model, key, jnp.zeros((batch, size, size, 1)))
    state = _maybe_resume(state, resume_from)
    step_fn = jax.jit(l2_train_step)
    print("generating enhancement training pool...", flush=True)

    def build():
        from ..ops.fft import fast_cartoon_texture, stft_enhance
        from .synthetic_data import synthetic_latent_sample
        # inputs follow the deployment path exactly: latent-style clutter
        # -> cartoon-texture -> STFT enhancement (extraction_latent feeds
        # the AEC stft_enhance(fast_cartoon_texture(img))); target is the
        # clean ridge structure. The v1 pool used clean-ridge STFT inputs,
        # which left real cluttered latents out of distribution and the
        # AEC-quality block mask empty.
        data = [synthetic_latent_sample(rng, size=size)
                for _ in range(pool)]
        raws = np.stack([np.asarray(
            stft_enhance(np.asarray(fast_cartoon_texture(d[0]), np.float64)),
            np.float32)[:, :, None] for d in data])
        return raws, np.stack([d[1] for d in data])

    raws, targets = _pool_cache(f"enhance_lat4_{size}_{pool}_{seed}", build)
    print(f"pool ready: {raws.shape}; stepping...", flush=True)
    # host-side degradation: brightness/contrast jitter + box blur
    for i in range(steps):
        idx = rng.integers(0, len(raws), batch)
        x = raws[idx].copy()
        x += (rng.random((batch, 1, 1, 1)) - 0.5) * 50.0
        x *= rng.random((batch, 1, 1, 1)) + 0.5
        x = x / 128.0 - 1.0
        state, loss = step_fn(state, jnp.asarray(x, jnp.float32),
                              jnp.asarray(targets[idx]))
        if i % log_every == 0:
            print(f"enhancement step {i}: loss {float(loss):.1f}", flush=True)
    return model, _variables(state)


class _ShardStream:
    """Random-access view over the shard directory gen_descriptor_pool.py
    fills: every batch request picks a uniformly random (shard, row) over
    ALL shards seen so far, and the file list is re-scanned periodically so
    batches written after training starts join the pool. With producers
    running, the effective pool keeps growing past any memorization
    horizon — the r4 fixed-128-batch pool is what saturated at 2000 steps
    and overfit by 4000 (VERDICT r4)."""

    def __init__(self, root: str, rescan_every: int = 50,
                 cache_shards: int = 512):
        self.root = root
        self.rescan_every = rescan_every
        self.cache_shards = cache_shards
        self._files: list = []
        self._cache: dict = {}
        self._calls = 0
        self._rescan()
        if not self._files:
            raise FileNotFoundError(f"no shards in {root}")

    def _rescan(self):
        import glob as _glob
        self._files = sorted(
            _glob.glob(os.path.join(self.root, "shard_*.npz")))

    def sample(self, rng: np.random.Generator):
        self._calls += 1
        if self._calls % self.rescan_every == 0:
            self._rescan()
        path = self._files[int(rng.integers(0, len(self._files)))]
        if path not in self._cache:
            if len(self._cache) >= self.cache_shards:
                self._cache.pop(next(iter(self._cache)))
            with np.load(path) as z:
                self._cache[path] = (z["x"], z["y"])
        x, y = self._cache[path]
        k = int(rng.integers(0, len(x)))
        return x[k], y[k]


def pretrain_descriptor(steps: int = 200, seed: int = 0, log_every: int = 50,
                        resume_from: str = ""):
    rng = np.random.default_rng(seed)
    model = DescriptorNet()
    key = jax.random.PRNGKey(seed)
    state = create_train_state(model, key, jnp.zeros((8, 96, 96, 1)))
    state = _maybe_resume(state, resume_from)
    step_fn = jax.jit(triplet_train_step)

    def eval_embed(variables, xs_ev, ys_ev):
        """Held-out retrieval health: recall@1 (nearest neighbor shares the
        label) + mean positive/negative cosine. The number that predicts
        SD27 mate minutiae-template scores is recall@1 across DOMAIN
        renditions, which the v8 batches encode per-identity."""
        embs, labs = [], []
        apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
        for x, y in zip(xs_ev, ys_ev):
            e = np.array(apply(variables, jnp.asarray(x)))
            e /= np.linalg.norm(e, axis=1, keepdims=True) + 1e-8
            sim = e @ e.T
            np.fill_diagonal(sim, -2.0)
            nn_lab = y[np.argmax(sim, axis=1)]
            same = y[:, None] == y[None, :]
            np.fill_diagonal(same, False)
            embs.append(float(np.mean(nn_lab == y)))
            pos = sim[same].mean()
            neg = sim[(~same) & (sim > -2)].mean()
            labs.append((pos, neg))
        pos = float(np.mean([p for p, _ in labs]))
        neg = float(np.mean([n for _, n in labs]))
        return float(np.mean(embs)), pos, neg

    stream_dir = os.environ.get("PRETRAIN_STREAM_DIR", "")
    eval_set = None
    if stream_dir:
        stream = _ShardStream(stream_dir)
        print(f"streaming descriptor batches from {stream_dir} "
              f"({len(stream._files)} shards)", flush=True)
        draw = lambda: stream.sample(rng)
        ev_rng = np.random.default_rng(seed + 777)
        ev = [stream.sample(ev_rng) for _ in range(4)]
        eval_set = ([x for x, _ in ev], [y for _, y in ev])
    else:
        print("generating descriptor training pool...", flush=True)

        def build():
            # 16 identities per batch: triplet mining needs hard negatives
            # in the batch — the 8-id pool saturated the margin at loss 0
            # while real cross-domain pairs still confused the embedding
            data = [synthetic_descriptor_batch(rng, n_ids=16,
                                               samples_per_id=4)
                    for _ in range(128)]
            return (np.stack([d[0] for d in data]),
                    np.stack([d[1] for d in data]))

        xs, ys = _pool_cache(f"descriptor_v8_{seed}", build)
        draw = lambda: (lambda k: (xs[k], ys[k]))(int(rng.integers(0,
                                                                   len(xs))))
    for i in range(steps):
        x, y = draw()
        # train-time photometric jitter: keep the nuisances fresh per step
        # even when a batch repeats
        x = x * float(rng.uniform(0.8, 1.2)) + float(rng.uniform(-0.15, 0.15))
        x = x + rng.standard_normal(x.shape).astype(np.float32) \
            * float(rng.uniform(0.0, 0.08))
        state, loss = step_fn(state, jnp.asarray(x, jnp.float32),
                              jnp.asarray(y))
        if i % log_every == 0:
            msg = f"descriptor step {i}: loss {float(loss):.3f}"
            if eval_set is not None and i % (log_every * 4) == 0:
                r1, pos, neg = eval_embed(_variables(state), *eval_set)
                msg += (f"  heldout r@1 {r1:.3f} pos {pos:.3f} "
                        f"neg {neg:.3f}")
            print(msg, flush=True)
    if eval_set is not None:
        r1, pos, neg = eval_embed(_variables(state), *eval_set)
        print(f"descriptor final: heldout r@1 {r1:.3f} pos {pos:.3f} "
              f"neg {neg:.3f}", flush=True)
    return model, _variables(state)


def pretrain_compnet(steps: int = 500, batch: int = 256, seed: int = 0,
                     log_every: int = 100):
    """Train the 192->96 projection to preserve pairwise cosine structure of
    concatenated descriptor triples (distillation-free analog of the DR
    training objective)."""
    import optax
    from .trainer import TrainState
    rng = np.random.default_rng(seed)
    model = CompNet()
    key = jax.random.PRNGKey(seed)
    state = create_train_state(model, key, jnp.zeros((batch, 192)))

    @jax.jit
    def step(state, x):
        def loss_fn(params):
            z, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"])
            zn = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + 1e-8)
            xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)
            sim_z = zn @ zn.T
            sim_x = xn @ xn.T
            return jnp.mean((sim_z - sim_x) ** 2), updates
        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state.replace(batch_stats=updates["batch_stats"]), loss

    for i in range(steps):
        x = rng.standard_normal((batch, 192)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        state, loss = step(state, jnp.asarray(x))
        if i % log_every == 0:
            print(f"compnet step {i}: loss {float(loss):.4f}")
    return model, _variables(state)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="checkpoint root directory")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--which", default="all",
                   choices=["all", "minutiae", "minutiae64", "enhancement",
                            "descriptor", "compnet"])
    p.add_argument("--resume", action="store_true",
                   help="continue minutiae/enhancement from the checkpoints "
                        "already in --out")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()

    t0 = time.time()
    res = lambda name: (os.path.join(args.out, name) if args.resume else "")
    if args.which in ("all", "minutiae"):
        _, v = pretrain_minutiae(steps=args.steps,
                                 resume_from=res("minutiae"))
        save_checkpoint(os.path.join(args.out, "minutiae"), v)
        save_checkpoint(os.path.join(args.out, "minutiae_stft"), v)
    if args.which in ("all", "minutiae64"):
        from ..models.minutiae_net import MinutiaeAEC64
        _, v = pretrain_minutiae(steps=args.steps, size=64,
                                 model=MinutiaeAEC64(),
                                 resume_from=res("minutiae64"))
        save_checkpoint(os.path.join(args.out, "minutiae64"), v)
    if args.which in ("all", "enhancement"):
        _, v = pretrain_enhancement(steps=args.steps,
                                    resume_from=res("enhancement"))
        save_checkpoint(os.path.join(args.out, "enhancement"), v)
    if args.which in ("all", "descriptor"):
        # steps=0 is pool-prebuild-only mode (PRETRAIN_POOL_DIR caching):
        # it returns untrained random-init weights, so saving would
        # clobber previously-trained descriptor checkpoints
        _, v = pretrain_descriptor(
            steps=max(100, args.steps // 2) if args.steps else 0,
            resume_from=res("descriptor_patch2"))
        if args.steps:
            for pt in (2, 8, 11):
                save_checkpoint(os.path.join(args.out,
                                             f"descriptor_patch{pt}"), v)
    if args.which in ("all", "compnet"):
        _, v = pretrain_compnet(steps=args.steps)
        save_checkpoint(os.path.join(args.out, "compnet"), v)
    print(f"pretraining done in {time.time() - t0:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()
