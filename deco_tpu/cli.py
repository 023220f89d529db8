"""deco_tpu command line: fit / validate / predict, reference-config compatible.

Equivalent of the reference's LightningCLI entry (``main.py:41-122`` of
hhhhzp/DeCo): subcommands ``fit``/``validate``/``predict``, ``-c`` YAML config
(the reference's configs_c2i/configs_t2i files work through the translation
registry), ``--ckpt_path`` resume, and ``--key=value`` dot-overrides
(train.sh:30 style).

Usage:
    python -m deco_tpu.cli fit -c configs_c2i/DeCo_XL.yaml
    python -m deco_tpu.cli predict -c ... --ckpt_path=.../checkpoints
    python -m deco_tpu.cli fit -c ... --model.denoiser.init_args.num_blocks=8
"""

from __future__ import annotations

import argparse
import sys
from typing import Optional

from deco_tpu.config import registry


def _parse_value(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("null", "none"):
        return None
    return v


def build_parser():
    p = argparse.ArgumentParser(prog="deco_tpu")
    p.add_argument("subcommand", choices=["fit", "validate", "predict"])
    p.add_argument("-c", "--config", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_batches", type=int, default=None)
    return p


def main(argv: Optional[list] = None):
    argv = argv if argv is not None else sys.argv[1:]
    known, unknown = build_parser().parse_known_args(argv)
    overrides = {}
    for tok in unknown:
        if tok.startswith("--") and "=" in tok:
            k, v = tok[2:].split("=", 1)
            overrides[k] = _parse_value(v)
        else:
            raise SystemExit(f"unrecognized argument: {tok}")

    config = registry.load_yaml(known.config)
    registry.apply_overrides(config, overrides)

    # one CLI, config selects the workload (fixes the reference snapshot's
    # swapped-entry-point hack, SURVEY caveat 1)
    from deco_tpu.train import workloads

    kind = workloads.detect_workload(config)
    if kind in ("uniflow", "vae_gan", "dcae_eval"):
        run = {"uniflow": workloads.run_uniflow,
               "vae_gan": workloads.run_vae_gan,
               "dcae_eval": workloads.run_dcae_eval}[kind]
        sub = "fit" if known.subcommand == "fit" and kind != "dcae_eval" \
            else "validate"
        if kind == "dcae_eval":
            run(config, max_batches=known.max_batches,
                workdir=known.workdir or "./workdirs_dcae")
        else:
            run(config, max_steps=known.max_steps,
                workdir=known.workdir, ckpt_path=known.ckpt_path,
                subcommand=sub, max_batches=known.max_batches)
        return

    from deco_tpu.train.loop import Experiment

    resume = known.resume or known.ckpt_path is not None
    exp = Experiment(config, workdir=known.workdir, resume=resume)
    if known.subcommand == "fit":
        exp.fit(ckpt_path=known.ckpt_path, max_steps=known.max_steps)
    elif known.subcommand == "validate":
        exp.predict(ckpt_path=known.ckpt_path, max_batches=known.max_batches,
                    dataset_key="eval_dataset")
    else:
        exp.predict(ckpt_path=known.ckpt_path, max_batches=known.max_batches)


if __name__ == "__main__":
    main()
