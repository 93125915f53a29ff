"""The shipped config corpus: loads, validates, builds, and matches the
reference corpus' hyperparameters (paths localized, everything else
identical)."""

import glob
import json
import os

import pytest

from retinanet_tpu.core.config import Config

OURS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "configs", "*", "*.json")))

_PATH_KEYS = {"model_dir", "tensorboard_dir", "annotation_file_path",
              "tfrecords", "checkpoint", "pretrained_checkpoint"}


def _strip_paths(tree):
    if isinstance(tree, dict):
        return {k: _strip_paths(v) for k, v in tree.items()
                if k not in _PATH_KEYS}
    if isinstance(tree, list):
        return [_strip_paths(v) for v in tree]
    return tree


@pytest.mark.parametrize("path", OURS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_config_loads_and_validates(path):
    params = Config(path).params
    assert params.architecture.head.num_classes == 80


@pytest.mark.parametrize("path", OURS, ids=lambda p: "/".join(p.split("/")[-2:]))
def test_config_matches_reference_hyperparams(path):
    rel = "/".join(path.split("/")[-2:])
    ref_path = os.path.join("/root/reference/configs", rel)
    if not os.path.exists(ref_path):
        pytest.skip("no matching reference config")
    with open(path) as f:
        ours = json.load(f)
    with open(ref_path) as f:
        ref = json.load(f)
    assert _strip_paths(ours) == _strip_paths(ref)


def test_corpus_complete():
    ref = sorted(os.path.basename(p) for p in
                 glob.glob("/root/reference/configs/*/*.json"))
    mine = sorted(os.path.basename(p) for p in OURS)
    assert mine == ref
