"""Long on-chip soak of the flagship config (VERDICT r2 #7).

One run that exercises Executor durability end-to-end at production
settings (the e2e journey is short): the flagship 640x640 ResNet50
config on synthetic COCO-like tfrecords, steps_per_execution=200,
checkpointing every 1000 steps, profiler window armed mid-run,
inflection detector armed — interrupted at the HALFWAY point by
constructing a brand-new Executor (fresh process state) that must resume
from the latest checkpoint and finish. Records steady-state imgs/s to
compare against bench.py's synthetic-batch number.

Matches reference executor.py:562-734 (the continuous training loop +
restore path).

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/soak.py \
      --workdir /tmp/soak --steps 3000
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import retinanet_tpu.core.cache  # noqa: F401

import json
import os
import re
import time

from absl import app, flags, logging

FLAGS = flags.FLAGS
flags.DEFINE_string("workdir", "/tmp/soak", "soak working directory")
flags.DEFINE_integer("steps", 3000, "total train steps")
flags.DEFINE_integer("spe", 200, "steps per execution")
flags.DEFINE_integer("bs", 16, "train batch size")
flags.DEFINE_integer(
    "validation_freq", -1,
    "run the full in-loop eval (pipelined device inference + gather + "
    "native COCOeval) every N steps; <=0 trains without eval (r03 mode)")


def make_params(workdir: str, pattern: str, ann: str):
    from retinanet_tpu.core.config import from_dict
    with open("configs/v3-32/"
              "mscoco-retinanet-resnet50-640x640-30x-256.json") as f:
        cfg = json.load(f)
    cfg["experiment"]["model_dir"] = os.path.join(workdir, "models")
    cfg["experiment"]["name"] = "soak"
    cfg["training"]["batch_size"] = {"train": FLAGS.bs, "val": FLAGS.bs}
    cfg["training"]["train_steps"] = FLAGS.steps
    cfg["training"]["steps_per_execution"] = FLAGS.spe
    cfg["training"]["save_every"] = 1000
    cfg["training"]["validation_freq"] = FLAGS.validation_freq
    cfg["training"]["annotation_file_path"] = ann
    cfg["training"]["recovery"] = {
        "use_inflection_detector": True,
        "metric_key": "l2-regularization",
        "threshold": 0.5, "max_trials": 2}
    cfg["dataloader_params"]["tfrecords"] = {
        "train": pattern, "val": pattern}
    return from_dict(cfg)


def run_phase(params, label: str):
    from retinanet_tpu.data.pipeline import InputPipeline
    from retinanet_tpu.train.executor import Executor

    with_val = FLAGS.validation_freq > 0
    ex = Executor(
        params, run_mode="train_val" if with_val else "train",
        train_input_fn=lambda: InputPipeline("train", params),
        val_input_fn=(
            (lambda: InputPipeline("val", params)) if with_val else None),
        enable_tensorboard=True)
    start_step = int(ex.state.step)
    t0 = time.time()
    ex.train()
    dt = time.time() - t0
    end_step = int(ex.state.step)
    steps = end_step - start_step
    imgs = steps * FLAGS.bs
    logging.info("[%s] %d -> %d steps in %.1fs (%.1f imgs/s incl. host "
                 "input + compile)", label, start_step, end_step, dt,
                 imgs / max(dt, 1e-9))
    return ex, end_step, imgs / max(dt, 1e-9)


def main(argv):
    del argv
    os.makedirs(FLAGS.workdir, exist_ok=True)
    from retinanet_tpu.data.synthetic import write_synthetic_tfrecords
    data_dir = os.path.join(FLAGS.workdir, "data")
    if not os.path.isdir(data_dir):
        res = write_synthetic_tfrecords(
            data_dir, "soak", num_shards=8, samples_per_shard=64,
            num_classes=80, write_annotations=True)
        pattern = res[0] if isinstance(res, tuple) else res
    else:
        pattern = os.path.join(data_dir, "soak-*")
    anns = [os.path.join(data_dir, f) for f in os.listdir(data_dir)
            if re.match(r"annotations.*\.json", f)]
    ann = anns[0] if anns else ""

    total = FLAGS.steps

    # phase 1: run to the halfway point, then "die"
    params = make_params(FLAGS.workdir, pattern, ann)
    params.training.train_steps = total // 2
    ex1, mid_step, rate1 = run_phase(params, "phase1")
    assert mid_step >= total // 2, (mid_step, total)
    ckpt = ex1.latest_checkpoint_step()
    assert ckpt is not None and ckpt > 0, "phase 1 must checkpoint"
    del ex1

    # phase 2: brand-new Executor resumes from the latest checkpoint and
    # finishes (the restore path of reference executor.py:562-734)
    params = make_params(FLAGS.workdir, pattern, ann)
    params.training.train_steps = total
    ex2, end_step, rate2 = run_phase(params, "phase2-resume")
    assert int(ex2.state.step) >= total, int(ex2.state.step)
    resumed_from = ex2.latest_checkpoint_step()
    assert resumed_from >= total, resumed_from

    profile_dir = os.path.join(FLAGS.workdir, "models", "soak", "profile")
    report = {
        "total_steps": total,
        "phase1_imgs_per_sec": round(rate1, 1),
        "phase2_imgs_per_sec": round(rate2, 1),
        "resumed_at_step": int(mid_step),
        "profile_captured": os.path.isdir(profile_dir),
        "batch_size": FLAGS.bs,
        "steps_per_execution": FLAGS.spe,
        "validation_freq": FLAGS.validation_freq,
    }
    out = os.path.join(FLAGS.workdir, "soak_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    app.run(main)
