"""Model forward shapes + single/sharded train steps on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msu_latentafis_tpu.models import (CompNet, DescriptorNet, EnhancementAEC,
                                       MinutiaeAEC, MinutiaeUNet)
from msu_latentafis_tpu.training import (create_train_state, l2_train_step,
                                         triplet_train_step,
                                         make_sharded_train_step)
from msu_latentafis_tpu.training.trainer import make_train_mesh


def test_model_output_shapes():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 1))
    for cls, ch in [(MinutiaeAEC, 12), (MinutiaeUNet, 12)]:
        m = cls(nf=8)
        v = m.init(rng, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (2, 64, 64, ch)
        assert (np.asarray(out) >= 0).all()    # relu head

    from msu_latentafis_tpu.models import MinutiaeAEC64
    m = MinutiaeAEC64(nf=8)           # rolled-path 64-patch variant:
    v = m.init(rng, x, train=False)   # downsample factor 16, identity head
    x48 = jnp.zeros((2, 48, 48, 1))   # any multiple of 16, not only 64
    assert m.apply(v, x48, train=False).shape == (2, 48, 48, 12)

    m = EnhancementAEC(nf=8)
    v = m.init(rng, x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 64, 64, 1)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh head

    m = DescriptorNet(embedding_size=64, widths=(8, 16))
    xp = jnp.zeros((3, 96, 96, 1))
    v = m.init(rng, xp, train=False)
    assert m.apply(v, xp, train=False).shape == (3, 64)

    m = CompNet()
    xd = jnp.zeros((5, 192))
    v = m.init(rng, xd, train=False)
    assert m.apply(v, xd, train=False).shape == (5, 96)


def test_l2_train_step_reduces_loss():
    rng = jax.random.PRNGKey(1)
    model = MinutiaeAEC(nf=4)
    x = jax.random.normal(rng, (4, 64, 64, 1))
    y = jax.nn.relu(jax.random.normal(rng, (4, 64, 64, 12)))
    state = create_train_state(model, rng, x)
    step = jax.jit(l2_train_step)
    _, loss0 = step(state, x, y)
    for _ in range(5):
        state, loss = step(state, x, y)
    assert float(loss) < float(loss0)


def test_triplet_train_step_runs():
    rng = jax.random.PRNGKey(2)
    model = DescriptorNet(embedding_size=16, widths=(4, 8))
    x = jax.random.normal(rng, (8, 96, 96, 1))
    labels = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    state = create_train_state(model, rng, x)
    state, loss = jax.jit(triplet_train_step)(state, x, labels)
    assert np.isfinite(float(loss))


def test_sharded_train_step_dp_tp():
    """Full train step jitted over a 4x2 (data, model) mesh."""
    mesh = make_train_mesh(n_data=4, n_model=2)
    model = MinutiaeAEC(nf=16)
    sample = np.zeros((8, 64, 64, 1), np.float32)
    state, step = make_sharded_train_step(model, mesh, sample)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((8, 64, 64, 1)),
                    jnp.float32)
    y = jnp.abs(jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 64, 64, 12)), jnp.float32))
    state, loss = step(state, x, y)
    state, loss2 = step(state, x, y)
    assert np.isfinite(float(loss)) and float(loss2) < float(loss)
