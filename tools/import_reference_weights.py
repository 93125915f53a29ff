"""Import reference (TF/Keras) RetinaNet weights into this framework.

Migration path for reference users (the reference published trained
checkpoints via google_cloud/download_weights.py): load a reference
TF checkpoint into the reference Keras graph (executed in-process, exactly
like tools/generate_goldens.py — no reference code is copied), then
transplant every weight into the Flax model via tools/transplant.py's
deterministic name mapping and write a `params.msgpack` this framework's
Executor / export CLI consume directly.

Usage:
  python tools/import_reference_weights.py \
      --config /root/reference/configs/v3-32/mscoco-retinanet-resnet50-640x640-30x-256.json \
      --checkpoint /path/to/reference/ckpt_dir_or_prefix \
      --out weights/params.msgpack
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import json
import os


def import_weights(config_path: str, checkpoint: str, out_path: str,
                   input_size: int = 640) -> dict:
    import flax.serialization
    import jax
    from tools.transplant import (build_reference_model, keras_weight_dict,
                                  transplant)
    from retinanet_tpu.core.config import from_dict

    with open(config_path) as f:
        ref_cfg = json.load(f)
    ref_cfg["floatx"]["precision"] = "float32"

    ref_model = build_reference_model(ref_cfg, input_size)
    if checkpoint:
        import tensorflow as tf
        path = tf.train.latest_checkpoint(checkpoint) \
            if os.path.isdir(checkpoint) else checkpoint
        # the reference saved via model.save_weights (TF checkpoint format,
        # reference executor.py save path); restore by object graph
        ref_model.load_weights(path)

    weights = keras_weight_dict(ref_model)
    cfg = json.loads(json.dumps(ref_cfg))
    cfg["input"]["input_shape"] = [input_size, input_size]
    cfg["architecture"]["backbone"]["checkpoint"] = ""
    params_cfg = from_dict(cfg)
    _, variables = transplant(params_cfg, weights, input_size)

    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(flax.serialization.to_bytes(
            jax.device_get(variables)))
    return variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True,
                    help="Reference experiment config JSON")
    ap.add_argument("--checkpoint", default="",
                    help="Reference TF checkpoint (dir or prefix); empty ="
                         " random init (for testing)")
    ap.add_argument("--out", required=True, help="Output params.msgpack")
    ap.add_argument("--input_size", type=int, default=640)
    args = ap.parse_args()
    import_weights(args.config, args.checkpoint, args.out, args.input_size)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
