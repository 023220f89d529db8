"""Every reference launch script has a deco_tpu equivalent bound to an
existing config (SURVEY §2.1 launch-script row, 13/13)."""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

# reference script -> deco_tpu script (train.sh keeps its c2i name)
NAME_MAP = {"train.sh": "train_c2i.sh"}


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
def test_every_reference_launch_script_has_an_equivalent():
    ref_scripts = sorted(
        f for f in os.listdir(REF) if f.endswith(".sh"))
    assert ref_scripts, "reference layout changed"
    for ref in ref_scripts:
        ours = os.path.join(REPO, "scripts", NAME_MAP.get(ref, ref))
        assert os.path.exists(ours), f"no equivalent for {ref}"
        text = open(ours).read()
        m = re.search(r"CONFIG=\$\{1:-([^\}]+)\}", text)
        assert m, f"{ours} has no default config"
        assert os.path.exists(os.path.join(REPO, m.group(1))), \
            f"{ours} default config {m.group(1)} missing"
        assert "deco_tpu.cli" in text


def test_scripts_are_executable():
    for f in os.listdir(os.path.join(REPO, "scripts")):
        if f.endswith(".sh"):
            assert os.access(os.path.join(REPO, "scripts", f), os.X_OK), f
