"""Hyperparameter fidelity of the shipped configs vs the reference YAMLs.

SURVEY §5 / BASELINE: "the reference's config surface drives identical
workloads". This deep-compares every shipped YAML against its
``/root/reference`` counterpart after normalizing environment-specific paths.
41 of 45 files are verbatim translations and must match EXACTLY; the four
hand-written round-1 configs (DeCo_XL, DeCo_XL_512, sft_res512,
vae_training) carry documented intentional deltas (per-chip batch sizes
tuned on v5e, Lightning-machinery keys that have no JAX meaning), each
enumerated in ALLOWED below — any drift outside the allowlist fails.
"""

import glob
import os

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree unavailable")

# keys whose values are environment paths (normalized by the generator)
def _norm(v):
    if isinstance(v, dict):
        return {k: _norm(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_norm(x) for x in v]
    if isinstance(v, str) and ("/apdcephfs" in v or v.startswith("/data/")
                               or "config.json" in v):
        return "<PATH>"
    return v


def _diff(repo_v, ref_v, path=""):
    out = []
    if isinstance(repo_v, dict) and isinstance(ref_v, dict):
        for k in sorted(set(repo_v) | set(ref_v)):
            if k not in repo_v:
                out.append(f"{path}.{k}: missing (in reference)")
            elif k not in ref_v:
                out.append(f"{path}.{k}: extra (not in reference)")
            else:
                out += _diff(repo_v[k], ref_v[k], f"{path}.{k}")
    elif isinstance(repo_v, list) and isinstance(ref_v, list):
        if len(repo_v) != len(ref_v):
            out.append(f"{path}: list length {len(repo_v)} vs ref {len(ref_v)}")
        else:
            for i, (a, b) in enumerate(zip(repo_v, ref_v)):
                out += _diff(a, b, f"{path}[{i}]")
    elif repo_v != ref_v:
        out.append(f"{path}: {repo_v!r} vs ref {ref_v!r}")
    return out


# Intentional deltas for the four hand-written configs. Substring match
# against the diff line; every remaining line is a fidelity failure.
_LIGHTNING_MACHINERY = [
    # torch/Lightning runtime keys with no JAX equivalent (the JAX runtime
    # reads max_steps/clip/callbacks; devices/strategy/plugins/precision are
    # supplied by the mesh + dtype policy)
    ".huggingface_cache_dir", ".torch_hub_dir", ".trainer.accelerator",
    ".trainer.strategy", ".trainer.devices", ".trainer.num_nodes",
    ".trainer.precision", ".trainer.logger", ".trainer.plugins",
    ".trainer.num_sanity_val_steps", ".trainer.val_check_interval",
    ".trainer.check_val_every_n_epoch", ".trainer.deterministic",
    ".trainer.inference_mode", ".trainer.use_distributed_sampler",
    ".trainer.gradient_clip_algorithm", ".trainer.accumulate_grad_batches",
    ".trainer.log_every_n_steps", ".trainer.enable_progress_bar",
    ".trainer.limit_val_batches", ".trainer.benchmark", ".trainer.barebones",
    ".trainer.max_epochs", ".trainer.min_epochs", ".trainer.min_steps",
    ".trainer.max_time", ".trainer.limit_train_batches",
    ".trainer.limit_test_batches", ".trainer.limit_predict_batches",
    ".trainer.overfit_batches", ".trainer.fast_dev_run",
    ".trainer.enable_checkpointing", ".trainer.enable_model_summary",
    ".trainer.gradient_clip_val", ".trainer.callbacks",
    ".trainer.default_root_dir", ".ckpt_path", ".seed_everything",
    ".trainer.reload_dataloaders_every_n_epochs", ".trainer.profiler",
    ".trainer.detect_anomaly", ".trainer.sync_batchnorm",
]
_TRAINER_REPA_DEAD_ARGS = [
    ".model.diffusion_trainer.init_args.feat_loss_weight",
    # the reference DeCo trainer's REPA args are dead code upstream (the
    # cosine loss is commented out, training_repa_DeCo.py:247-286); the
    # hand-written configs drop them, the generated ones keep them
    ".model.diffusion_trainer.init_args.encoder",
    ".model.diffusion_trainer.init_args.align_layer",
    ".model.diffusion_trainer.init_args.proj_denoiser_dim",
    ".model.diffusion_trainer.init_args.proj_hidden_dim",
    ".model.diffusion_trainer.init_args.proj_encoder_dim",
    # freq-loss knobs: the paper's headline loss, exposed here (shipped
    # disabled like the reference snapshot)
    ".model.diffusion_trainer.init_args.enable_freq_loss",
    ".model.diffusion_trainer.init_args.freq_loss_weight",
    ".model.diffusion_trainer.init_args.freq_mode",
    ".model.diffusion_trainer.init_args.freq_quality",
    ".model.denoiser.init_args.grad_checkpointing",
]
ALLOWED = {
    "configs_c2i/DeCo_XL.yaml": _LIGHTNING_MACHINERY + _TRAINER_REPA_DEAD_ARGS
    + [".data.pred_batch_size",   # 20 measured optimal on v5e-1 (CLAUDE.md)
       ".model.diffusion_batch_mul"],  # explicit 1, documented in-file
    "configs_c2i/DeCo_XL_512.yaml": _LIGHTNING_MACHINERY
    + _TRAINER_REPA_DEAD_ARGS
    + [".data.pred_batch_size",   # 6 measured optimal on v5e-1
       ".model.diffusion_batch_mul",
       ".trainer.callbacks",
       # chunked pixel decoder: lifts the 512px batch envelope 8 -> 16
       # (documented in-file; bit-equivalent to unchunked, test_models.py)
       ".model.denoiser.init_args.decoder_chunks"],
    "configs_t2i/sft_res512.yaml": _LIGHTNING_MACHINERY
    + _TRAINER_REPA_DEAD_ARGS
    + [".data.pred_batch_size", ".data.train_batch_size",
       ".model.denoiser.init_args.use_flash_attn",
       # explicit 1: the 4x latent replication of the reference default does
       # not fit a single 16G chip at the tuned batch (documented in-file)
       ".model.diffusion_batch_mul",
       # same value as the reference base-trainer default (0.1), stated
       ".model.diffusion_trainer.init_args.null_condition_p"],
}

FILES = sorted(
    os.path.relpath(p, REF)
    for sub in ("configs", "configs_c2i", "configs_flow", "configs_t2i")
    for p in glob.glob(os.path.join(REF, sub, "*.yaml"))
)


@pytest.mark.parametrize("rel", FILES)
def test_config_matches_reference(rel):
    repo_path = os.path.join(REPO, rel)
    assert os.path.exists(repo_path), f"{rel} not shipped"
    repo_cfg = _norm(yaml.safe_load(open(repo_path)))
    ref_cfg = _norm(yaml.safe_load(open(os.path.join(REF, rel))))
    allowed = ALLOWED.get(rel, [])
    diffs = [
        d for d in _diff(repo_cfg, ref_cfg)
        if not any(d.startswith(a) or a in d.split(":")[0] for a in allowed)
    ]
    assert not diffs, f"{rel} drifted from reference:\n" + "\n".join(diffs)
