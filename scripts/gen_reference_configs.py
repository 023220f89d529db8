"""Generate the full reference config surface (SURVEY §5, VERDICT item 3).

Translates every YAML under /root/reference/configs*/ into the repo's config
dirs with the SAME filename and the SAME model/trainer/sampler
hyperparameters. The reference class paths resolve at load time through
deco_tpu.config.registry; this script only normalizes environment-specific
paths (cluster dataset roots, model dirs, the uniflow config.json location)
and prepends a provenance header. Files that already exist in the repo
(hand-translated in round 1) are left untouched.

Usage: python scripts/gen_reference_configs.py [--force]
"""

# runnable as `python scripts/<name>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


from __future__ import annotations

import os
import re
import sys

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# environment-specific path normalization (placeholders a user points at
# their own data; hyperparameters are untouched)
REPLACEMENTS = [
    ("/apdcephfs/share_300000800/datamultimodal/zhenpeng_data/imagenet-1k",
     "/data/datasets/imagenet-1k"),
    ("/apdcephfs/share_300000800/datamultimodal/zhenpeng_data/cache/webdataset",
     "/data/cache/webdataset"),
    ("/apdcephfs/share_300000800/datamultimodal/zhenpeng_data/BLIP-3o",
     "/data/datasets/BLIP-3o"),
    ("/apdcephfs/share_300000800/datamultimodal/models/",
     "/data/models/"),
    ("src/models/uniflow/config.json",
     "deco_tpu/models/uniflow/config.json"),
]
# any leftover cluster prefix
GENERIC = re.compile(r"/apdcephfs[\w./-]*/([\w.-]+)")

HEADER = """\
# Translated from the reference {rel} (hhhhzp/DeCo): same model / trainer /
# sampler / data hyperparameters. Reference class paths resolve through
# deco_tpu.config.registry (see PARITY.md); cluster-specific dataset and
# model paths are normalized to /data/... placeholders.
"""


def translate(src: str, rel: str) -> str:
    with open(src) as f:
        text = f.read()
    for a, b in REPLACEMENTS:
        text = text.replace(a, b)
    text = GENERIC.sub(r"/data/models/\1", text)
    return HEADER.format(rel=rel) + text


def main(force: bool = False):
    written, skipped = [], []
    for sub in ("configs", "configs_c2i", "configs_flow", "configs_t2i"):
        src_dir = os.path.join(REF, sub)
        dst_dir = os.path.join(REPO, sub)
        os.makedirs(dst_dir, exist_ok=True)
        for name in sorted(os.listdir(src_dir)):
            if not name.endswith(".yaml"):
                continue
            dst = os.path.join(dst_dir, name)
            if os.path.exists(dst) and not force:
                skipped.append(f"{sub}/{name}")
                continue
            with open(dst, "w") as f:
                f.write(translate(os.path.join(src_dir, name),
                                  f"{sub}/{name}"))
            written.append(f"{sub}/{name}")
    print(f"wrote {len(written)} configs, kept {len(skipped)} existing:")
    for w in written:
        print("  +", w)
    for s in skipped:
        print("  =", s)


if __name__ == "__main__":
    main(force="--force" in sys.argv)
