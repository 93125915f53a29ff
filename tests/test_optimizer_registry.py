"""Generic optimizer registry: any optax factory by name, mirroring the
reference's tf.optimizers.get passthrough (reference
optimizers/builder.py:33-38)."""

import jax.numpy as jnp
import numpy as np
import pytest

from retinanet_tpu.core import config as cfg
from retinanet_tpu.optimizers.builder import build_optimizer


def _opt(name, **extra):
    return cfg.ConfigDict({
        "name": name,
        "lr_params": {"schedule_type": "piecewise_constant_decay",
                      "warmup_learning_rate": 0.001, "warmup_steps": 1,
                      "values": [0.01], "boundaries": []},
        **extra})


@pytest.mark.parametrize("name", ["rmsprop", "adagrad", "lion", "lamb"])
def test_generic_optax_optimizer_by_name(name):
    tx, _ = build_optimizer(_opt(name), train_steps=10)
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    grads = {"w": jnp.full((3,), 0.5)}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_extra_config_kwargs_forwarded():
    tx, _ = build_optimizer(_opt("rmsprop", decay=0.95, eps=1e-6),
                            train_steps=10)
    params = {"w": jnp.ones((2,))}
    updates, _ = tx.update({"w": jnp.ones((2,))}, tx.init(params), params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_unknown_name_still_raises():
    with pytest.raises(ValueError, match="Unsupported optimizer"):
        build_optimizer(_opt("definitely_not_an_optimizer"), train_steps=10)
