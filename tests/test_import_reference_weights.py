"""Reference-checkpoint migration: TF checkpoint -> Flax params.msgpack.

The reference published trained TF checkpoints (fetched by its
google_cloud/download_weights.py); tools/import_reference_weights.py lets
reference users bring those weights into this framework. Verified by a
full roundtrip: save a reference Keras model's weights as a TF checkpoint,
import through the tool (which restores them into a FRESH reference build,
so load_weights must genuinely restore), and require the Flax model's
outputs to match the original reference model to fp32 tolerance.
"""

import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
pytest.importorskip("tf_keras")


def test_checkpoint_import_roundtrip(tmp_path):
    import flax.serialization
    import jax
    from tools.transplant import FLAGSHIP_CONFIG, build_reference_model
    from tools.import_reference_weights import import_weights
    from retinanet_tpu.core.config import from_dict
    from retinanet_tpu.models.retinanet import build_model

    size = 128
    with open(FLAGSHIP_CONFIG) as f:
        ref_cfg = json.load(f)
    ref_cfg["floatx"]["precision"] = "float32"

    original = build_reference_model(ref_cfg, size)
    ckpt = str(tmp_path / "ref_ckpt")
    original.save_weights(ckpt)
    ref_out = original(
        np.random.default_rng(3).normal(
            0, 1, (1, size, size, 3)).astype(np.float32), training=False)

    out_path = str(tmp_path / "weights" / "params.msgpack")
    import_weights(FLAGSHIP_CONFIG, ckpt, out_path, input_size=size)

    # load the msgpack like the Executor / export CLI would
    with open(out_path, "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())

    cfg = json.loads(json.dumps(ref_cfg))
    cfg["input"]["input_shape"] = [size, size]
    cfg["architecture"]["backbone"]["checkpoint"] = ""
    model = build_model(from_dict(cfg))
    images = np.random.default_rng(3).normal(
        0, 1, (1, size, size, 3)).astype(np.float32)
    flax_out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, images)

    for lvl in ("3", "5", "7"):
        np.testing.assert_allclose(
            np.asarray(ref_out["class-predictions"][lvl]),
            np.asarray(flax_out["class-predictions"][lvl]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(ref_out["box-predictions"][lvl]),
            np.asarray(flax_out["box-predictions"][lvl]), atol=1e-4)
