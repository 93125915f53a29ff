#!/usr/bin/env bash
# Download COCO2017 and build tfrecords.
# Equivalent of the reference's prepare_coco_dataset.sh, targeting the
# native tfrecord tooling (python -m retinanet_tpu.tools.create_coco_tfrecords).
set -euo pipefail

DATA_DIR="${1:-datasets/coco}"
OUT_DIR="${2:-datasets/coco_tfrecords}"

mkdir -p "$DATA_DIR"
cd "$DATA_DIR"

for f in train2017.zip val2017.zip annotations_trainval2017.zip; do
  if [ ! -f "$f" ]; then
    wget -q "http://images.cocodataset.org/zips/$f" \
      || wget -q "http://images.cocodataset.org/annotations/$f"
  fi
  unzip -qn "$f"
done
cd - >/dev/null

python -m retinanet_tpu.tools.create_coco_tfrecords \
  --download_path "$DATA_DIR" \
  --output_dir "$OUT_DIR" \
  --num_shards 256 \
  --remap_class_ids

echo "tfrecords written to $OUT_DIR"
