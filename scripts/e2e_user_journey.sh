#!/usr/bin/env bash
# Full user journey on synthetic data, exercising every shipped CLI in the
# order a real user would: dataset -> train (train_val run mode) ->
# standalone eval -> export (StableHLO + int8) -> artifact evaluation ->
# rendered demo image.
#
# JOURNEY_PLATFORM=cpu requests CPU (honored on standard installs; a
# TPU plugin that overrides JAX_PLATFORMS will still grab the chip).
# Takes ~30-40 min on a 1-core host (conv compiles dominate). 250 steps
# over 32 synthetic scenes reaches AP@0.5 ~0.3 — enough for real
# detections in the demo render; raise train_steps to overfit further.
#
# Usage: scripts/e2e_user_journey.sh [workdir]
set -euo pipefail

WORKDIR="${1:-$(mktemp -d /tmp/journey_XXXX)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
export JAX_PLATFORMS="${JOURNEY_PLATFORM:-cpu}"
mkdir -p "$WORKDIR"
echo "== workdir: $WORKDIR (platform: $JAX_PLATFORMS)"

echo "== 1. synthetic dataset (tfrecords + COCO annotations + image files)"
python - "$WORKDIR" <<'EOF'
import glob, os, sys
import jax
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
from retinanet_tpu.data import tfrecord
from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
workdir = sys.argv[1]
data = os.path.join(workdir, "data")
pattern, ann = write_synthetic_tfrecords(
    data, "train", num_shards=2, samples_per_shard=16, num_classes=6,
    write_annotations=True)
# dump each example's JPEG for the artifact evaluator / demo (the
# tfrecords are read back with the repo's own pure-Python codec)
img_dir = os.path.join(data, "images")
os.makedirs(img_dir, exist_ok=True)
for path in sorted(glob.glob(pattern)):
    for rec in tfrecord.read_records(path, verify_crc=True):
        ex = tfrecord.parse_detection_example(rec)
        with open(os.path.join(img_dir, f"{ex['image_id']}.jpg"), "wb") as f:
            f.write(ex["image"])
print("dataset:", pattern, ann, len(os.listdir(img_dir)), "images")
EOF

echo "== 2. experiment config (reference JSON schema)"
python - "$WORKDIR" <<'EOF'
import glob, json, os, sys
workdir = sys.argv[1]
ann = glob.glob(os.path.join(workdir, "data", "annotations_*.json"))[0]
pattern = os.path.join(workdir, "data", "train-*")
cfg = {
    "experiment": {"name": "journey", "run_mode": "train_val",
                   "model_dir": os.path.join(workdir, "models"),
                   "tensorboard_dir": os.path.join(workdir, "tb")},
    "input": {"input_shape": [128, 128], "channels": 3},
    "floatx": {"precision": "float32"},
    "architecture": {
        "backbone": {"type": "resnet", "depth": 18},
        "feature_fusion": {"type": "fpn", "filters": 64, "min_level": 3,
                           "max_level": 6, "backbone_max_level": 5},
        "head": {"num_convs": 2, "filters": 64, "num_classes": 6,
                 "num_anchors": 9},
    },
    "anchor_params": {
        "areas": [1024.0, 4096.0, 16384.0, 65536.0],
        "aspect_ratios": [0.5, 1.0, 2.0],
        "scales": [1.0, 2 ** (1 / 3), 2 ** (2 / 3)]},
    "loss": {"box_loss_weight": 50.0},
    "training": {
        "train_steps": 250, "save_every": 125,
        "validation_freq": 125, "validation_samples": 32,
        "steps_per_execution": 10,
        "batch_size": {"train": 8, "val": 8},
        "annotation_file_path": ann,
        "remap_class_ids": False,
        "use_weight_decay": True, "weight_decay_alpha": 1e-4,
        "optimizer": {
            "name": "sgd", "momentum": 0.9, "clipnorm": 10.0,
            "lr_params": {"schedule_type": "cosine_decay",
                          "initial_learning_rate": 0.08,
                          "warmup_learning_rate": 0.004,
                          "warmup_steps": 30}},
    },
    "dataloader_params": {
        "tfrecords": {"train": pattern, "val": pattern},
        "augmentations": {"use_augmentation": False,
                          "horizontal_flip": False},
        "shuffle_buffer_size": 16},
    "inference": {"mode": "PerClassHardNMS", "score_threshold": 0.3,
                  "pre_nms_top_k": 256, "max_detections": 25},
}
path = os.path.join(workdir, "config.json")
json.dump(cfg, open(path, "w"), indent=1)
print(path)
EOF

echo "== 3. train + in-loop eval (python -m retinanet_tpu)"
python -m retinanet_tpu --config_path "$WORKDIR/config.json" 2>&1 | tail -4

echo "== 4. standalone evaluation (--run_evaluation)"
python -m retinanet_tpu --config_path "$WORKDIR/config.json" \
  --run_evaluation 2>&1 | tail -3

echo "== 5. export artifact (StableHLO + int8 weights + int8 activations)"
python -m retinanet_tpu.export --config_path "$WORKDIR/config.json" \
  --export_dir "$WORKDIR/export" --int8 --int8_activations \
  --calibration_batches 2 2>&1 | tail -4
ls "$WORKDIR/export"

echo "== 6. evaluate the artifact against the annotations"
python -m retinanet_tpu.export.evaluate_artifact \
  --artifact_dir "$WORKDIR/export" \
  --image_dir "$WORKDIR/data/images" \
  --annotation_file "$WORKDIR"/data/annotations_*.json \
  --remap_class_ids=false --use_stablehlo 2>&1 | tail -6

echo "== 7. demo render"
FIRST_IMG=$(ls "$WORKDIR"/data/images/* | head -1)
python "$REPO/examples/inference_demo.py" --artifact_dir "$WORKDIR/export" \
  --input "$FIRST_IMG" --output "$WORKDIR/demo_out.jpg" 2>&1 | tail -2
test -f "$WORKDIR/demo_out.jpg" && echo "rendered $WORKDIR/demo_out.jpg"

echo "== JOURNEY COMPLETE ($WORKDIR)"
