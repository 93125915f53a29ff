"""keras_sgd (the reference's SGD semantics) vs the EXECUTED tf_keras SGD.

Keras folds the learning rate into the velocity buffer (v = m*v - lr*g);
optax.sgd scales a raw-gradient trace by the CURRENT lr. Identical under a
constant schedule, different optimizers under warmup/decay — the reference
trained its published mAP with Keras semantics, so build_optimizer's 'sgd'
must match tf_keras exactly, including across LR changes."""

import numpy as np
import jax.numpy as jnp
import pytest

from retinanet_tpu.optimizers.builder import keras_sgd

import optax


def _lr_schedule(step):
    # deliberately non-constant: warmup-ish ramp then a 10x drop
    return jnp.where(step < 3, 0.1 * (step + 1).astype(jnp.float32) / 3.0,
                     jnp.where(step < 6, 0.1, 0.01))


def _tf_reference_trajectory(grads, w0, momentum, nesterov):
    import tensorflow as tf
    import tf_keras

    class Sched(tf_keras.optimizers.schedules.LearningRateSchedule):
        def __call__(self, step):
            step = tf.cast(step, tf.float32)
            return tf.where(step < 3, 0.1 * (step + 1) / 3.0,
                            tf.where(step < 6, 0.1, 0.01))

        def get_config(self):
            return {}

    opt = tf_keras.optimizers.SGD(learning_rate=Sched(),
                                  momentum=momentum, nesterov=nesterov)
    var = tf.Variable(w0.astype(np.float32))
    traj = []
    for g in grads:
        opt.apply_gradients([(tf.constant(g.astype(np.float32)), var)])
        traj.append(var.numpy().copy())
    return traj


@pytest.mark.parametrize("momentum,nesterov", [(0.9, False), (0.9, True),
                                               (0.0, False)])
def test_keras_sgd_matches_executed_tf_keras(momentum, nesterov):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(8)]

    tf_traj = _tf_reference_trajectory(grads, w0, momentum, nesterov)

    tx = keras_sgd(_lr_schedule, momentum=momentum, nesterov=nesterov)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g, expected in zip(grads, tf_traj):
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params), expected,
                                   rtol=1e-6, atol=1e-7)


def test_keras_sgd_momentum_zero_allocates_no_velocity():
    """momentum=0.0 must not carry a params-sized velocity buffer in HBM
    — the update is -lr*g regardless of history."""
    tx = keras_sgd(_lr_schedule, momentum=0.0)
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    state = tx.init(params)
    assert state.velocity is None
    # only the scalar schedule counter survives in the state tree
    import jax
    leaves = jax.tree_util.tree_leaves(state)
    assert sum(x.size for x in leaves) == 1, leaves


def test_keras_sgd_differs_from_optax_sgd_under_varying_lr():
    """Documents WHY keras_sgd exists: after an LR change the two
    formulations produce different updates."""
    g = jnp.ones((3,))
    p0 = jnp.zeros((3,))

    def run(tx):
        params, state = p0, tx.init(p0)
        for _ in range(6):
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        return np.asarray(params)

    a = run(keras_sgd(_lr_schedule, momentum=0.9))
    b = run(optax.sgd(_lr_schedule, momentum=0.9))
    assert not np.allclose(a, b)
