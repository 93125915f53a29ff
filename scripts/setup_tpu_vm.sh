#!/usr/bin/env bash
# TPU-VM setup (the JAX analog of reference google_cloud/setup_tpu_vm_alpha.sh
# + setup_vm.sh): swap, deps, COCO annotations, TPU-enabled JAX.
#
# Run on every host of the pod slice:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#       --command="bash -s" < scripts/setup_tpu_vm.sh
set -euo pipefail

# swap (the reference provisioned 15G for the host-side data pipeline)
if ! swapon --show | grep -q /swapfile; then
  sudo fallocate -l 15G /swapfile
  sudo chmod 600 /swapfile
  sudo mkswap /swapfile
  sudo swapon /swapfile
fi

sudo apt-get update -qq
sudo apt-get install -y -qq htop tree python3-opencv

# TPU-enabled JAX + framework deps
pip3 install -q -U "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip3 install -q flax optax orbax-checkpoint einops absl-py

# COCO annotations for in-loop evaluation (reference setup did the same)
if [ ! -f instances_val2017.json ]; then
  wget -q http://images.cocodataset.org/annotations/annotations_trainval2017.zip
  unzip -q annotations_trainval2017.zip
  cp annotations/instances_val2017.json .
  rm -rf annotations_trainval2017.zip annotations
fi

# warm the native TFRecord codec build (retinanet_tpu/data/native.py
# compiles the shared library on first use; this front-loads the ~2 s g++)
python3 -c "from retinanet_tpu.data import native; native.available()" \
  2>/dev/null || true

echo "TPU VM ready. Launch multi-host training with:"
echo "  python -m retinanet_tpu --config_path <cfg> --is_multi_host"
