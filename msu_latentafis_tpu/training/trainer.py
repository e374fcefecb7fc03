"""Train states and (sharded) train steps.

Optimizer parity with the reference trainers: Adam(lr=1e-4, b1=0.5, b2=0.9)
(/root/reference/extraction/minutiae_AEC.py:276-279,
enhancement_AEC.py:314-317); L2 cylinder/reconstruction objective.

Multi-chip training uses a (data, model) mesh: the batch shards over the
``data`` axis, and parameter tensors shard their output-channel axis over
``model`` (tensor parallelism) — XLA GSPMD inserts the all-reduces over
ICI. This replaces the reference's single-GPU tensorpack/torch loops.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import losses


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_train_state(model, rng, sample_input, learning_rate: float = 1e-4,
                       b1: float = 0.5, b2: float = 0.9) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(learning_rate, b1=b1, b2=b2)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=batch_stats)


def l2_train_step(state: TrainState, x: jnp.ndarray, y: jnp.ndarray):
    """One AEC step: L2 loss between prediction and target."""
    def loss_fn(params):
        out, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"])
        return losses.l2_reconstruction(out, y), updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=updates["batch_stats"])
    return state, loss


def triplet_train_step(state: TrainState, x: jnp.ndarray, labels: jnp.ndarray,
                       margin: float = 0.3):
    """One descriptor step: batch-hard triplet on L2-normalized embeddings."""
    def loss_fn(params):
        emb, updates = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"])
        emb = emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-8)
        return losses.batch_hard_triplet(emb, labels, margin), updates

    (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=updates["batch_stats"])
    return state, loss


# ---------------------------------------------------------------------------
# Sharded training
# ---------------------------------------------------------------------------

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_train_mesh(n_data: Optional[int] = None, n_model: int = 1,
                    devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _param_spec(path, leaf, n_model: int) -> P:
    """Tensor-parallel rule: shard the output-channel (last) axis over the
    model axis when divisible; biases/scales stay replicated."""
    if leaf.ndim >= 2 and leaf.shape[-1] % n_model == 0 and leaf.shape[-1] >= n_model * 8:
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def make_sharded_train_step(model, mesh: Mesh, sample_input: np.ndarray,
                            step_kind: str = "l2",
                            learning_rate: float = 1e-4):
    """Build (sharded_state, jitted_step) over a (data, model) mesh.

    The returned step has batch inputs sharded over ``data`` and parameters
    sharded per the TP rule; invoke as ``state, loss = step(state, x, y)``.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, jnp.asarray(sample_input),
                               learning_rate=learning_rate)

    def spec_tree(tree):
        flat = jax.tree_util.tree_map_with_path(
            lambda p, l: NamedSharding(mesh, _param_spec(p, l, n_model)), tree)
        return flat

    state_shardings = TrainState(
        step=NamedSharding(mesh, P()),
        apply_fn=state.apply_fn,
        params=spec_tree(state.params),
        tx=state.tx,
        opt_state=jax.tree.map(
            lambda l: NamedSharding(mesh, P()) if not hasattr(l, "ndim")
            else NamedSharding(mesh, P()), state.opt_state,
            is_leaf=lambda x: hasattr(x, "ndim")),
        batch_stats=spec_tree(state.batch_stats),
    )
    # opt_state mirrors params' sharding for the moment tensors
    mu_like = spec_tree(state.params)
    opt_shardings = (optax.ScaleByAdamState(
        count=NamedSharding(mesh, P()), mu=mu_like, nu=mu_like),
        optax.EmptyState())
    state_shardings = state_shardings.replace(opt_state=opt_shardings)

    state = jax.device_put(state, state_shardings)

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    step_fn = l2_train_step if step_kind == "l2" else triplet_train_step

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_shardings, batch_sharding, batch_sharding),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=(0,),
    )
    return state, jitted
