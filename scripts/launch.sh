#!/usr/bin/env bash
# Launch training (optionally under a detached tmux session, the analog of
# the reference's screen-wrapped launch.sh for TPU pods).
#
# Usage: scripts/launch.sh configs/v3-8/mscoco-retinanet-resnet50-640x640-30x-64.json [--detach]
set -euo pipefail

CONFIG="${1:?usage: launch.sh <config.json> [--detach]}"
shift || true

CMD=(python -m retinanet_tpu --config_path "$CONFIG" --is_multi_host "$@")

if [[ "${1:-}" == "--detach" ]]; then
  SESSION="retinanet-$(basename "$CONFIG" .json)"
  tmux new-session -d -s "$SESSION" "${CMD[@]}"
  echo "launched in tmux session: $SESSION"
else
  exec "${CMD[@]}"
fi
