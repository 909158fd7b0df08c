"""Every shipped YAML config must load and validate (reference: the
configs/baselines model zoo loading through merge_cfg_from_file)."""

import glob
import os

import pytest

from vosdetectron_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
YAMLS = sorted(glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                         recursive=True))


@pytest.mark.parametrize("path", YAMLS, ids=[os.path.basename(p)
                                             for p in YAMLS])
def test_config_loads_and_validates(path):
    cfg = load_config(path)
    assert cfg.model.num_classes >= 2


def test_zoo_covers_architectures():
    names = [os.path.basename(p) for p in YAMLS]
    assert any("R-50-C4" in n for n in names)
    assert any("R-50-FPN" in n for n in names)
    assert any("R-101" in n for n in names)
    assert any("X-101" in n for n in names)  # ResNeXt baseline
    assert any(n.startswith("vos_") for n in names)


def test_resnext_config_builds_grouped_trunk():
    cfg = load_config(os.path.join(
        REPO, "configs", "baselines", "e2e_mask_rcnn_X-101-32x4d-FPN_1x.yaml"))
    assert cfg.resnets.num_groups == 32
    assert cfg.resnets.width_per_group == 4
