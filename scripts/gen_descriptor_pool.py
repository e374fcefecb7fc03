"""Background descriptor-pool generator (streamed-training producer).

Round 4's descriptor recipe trained from a FIXED pregenerated pool (128
batches); it saturated at ~2000 steps and overfit by 4000 (commit 0354406),
leaving the cross-domain embedding too weak to score bad_latent's mate
minutiae templates above 0.0 (results/sd27/diagnostics.json, VERDICT r4
item 1). The fix is streaming: this script runs on host cores writing
fresh `synthetic_descriptor_batch` shards to a directory while
training.pretrain consumes them (PRETRAIN_STREAM_DIR), so the trainer
never revisits a memorized patch set at the old cadence.

Usage (run one per free core, nice'd):
    nice -n 10 python scripts/gen_descriptor_pool.py --out /tmp/despool \
        --worker 0 [--batches-per-shard 8] [--max-shards 4000]

Shards are `.npz` files with arrays x [B*? , 96, 96, 1] float32 in [-1, 1]
and y int32 labels (relabeled unique per batch row), written atomically
(tmp + rename) so the consumer never sees a partial file.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

# the shell env pins JAX_PLATFORMS=axon (tunneled TPU); data
# generation must never touch the tunnel (CLAUDE.md: two JAX
# processes contending on it hang) — force CPU BOTH ways
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--worker", type=int, default=0)
    p.add_argument("--batches-per-shard", type=int, default=8)
    p.add_argument("--max-shards", type=int, default=100000,
                   help="stop after this many shards from THIS worker")
    p.add_argument("--n-ids", type=int, default=16)
    p.add_argument("--samples-per-id", type=int, default=4)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from msu_latentafis_tpu.training.synthetic_data import (
        synthetic_descriptor_batch)

    os.makedirs(args.out, exist_ok=True)
    # distinct seed stream per worker; time-salted so restarts don't repeat
    seed = (args.worker + 1) * 1_000_003 + (int(time.time()) % 86400)
    rng = np.random.default_rng(seed)
    t_start = time.time()
    for shard_i in range(args.max_shards):
        xs, ys = [], []
        for b in range(args.batches_per_shard):
            x, y = synthetic_descriptor_batch(
                rng, n_ids=args.n_ids, samples_per_id=args.samples_per_id)
            xs.append(x)
            ys.append(y)
        x = np.stack(xs)                       # [S, B, 96, 96, 1]
        y = np.stack(ys)                       # [S, B]
        name = f"shard_w{args.worker}_{shard_i:06d}"
        tmp = os.path.join(args.out, "." + name + ".tmp.npz")
        np.savez(tmp, x=x, y=y)
        os.replace(tmp, os.path.join(args.out, name + ".npz"))
        if shard_i % 5 == 0:
            dt = time.time() - t_start
            print(f"w{args.worker}: {shard_i + 1} shards "
                  f"({(shard_i + 1) * args.batches_per_shard} batches) "
                  f"in {dt:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
