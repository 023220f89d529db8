"""Shared builders for synthesized tiny HF checkpoints (offline tests).

transformers ships model code locally, so RANDOM-weight checkpoints built on
disk let tests drive the real HF code paths (tokenizers, forward, generate)
without any network or published weights.
"""

import json
import os


def build_tiny_qwen3(d: str, hidden_size: int = 32) -> str:
    """Tiny random-weight Qwen3 + from-scratch BPE tokenizer in ``d``."""
    import torch
    from transformers import Qwen2Tokenizer, Qwen3Config, Qwen3Model

    vocab = {tok: i for i, tok in enumerate(
        list("abcdefghijklmnopqrstuvwxyz")
        + ["Ġ", "ca", "cat", "Ġc", "Ġca", "Ġcat",
           "do", "dog", "<|endoftext|>", "<|im_start|>", "<|im_end|>"]
    )}
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\nc a\nca t\nĠ c\nĠc a\nĠca t\n"
                "d o\ndo g\n")
    tok = Qwen2Tokenizer(os.path.join(d, "vocab.json"),
                         os.path.join(d, "merges.txt"),
                         pad_token="<|endoftext|>", eos_token="<|endoftext|>")
    tok.save_pretrained(d)
    cfg = Qwen3Config(hidden_size=hidden_size, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=len(vocab),
                      max_position_embeddings=64, head_dim=8)
    torch.manual_seed(0)
    Qwen3Model(cfg).save_pretrained(d)
    return d
