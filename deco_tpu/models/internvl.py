"""InternVL surface: feature extraction (JAX), conversation templates, chat.

Parity with reference ``src/models/transformer/modeling_internvl_chat.py:35-428``
and ``conversation.py:39-391`` (hhhhzp/DeCo), which vendor InternVL so the
trained VAE/UniFlow checkpoints stay HF-loadable. In deco_tpu:

- :func:`extract_feature` — the TPU-relevant path (frozen vision teacher for
  VAE distillation / ReCo conditioning): InternViT encoder (``uniflow.vit``)
  -> pixel-shuffle x0.5 connector -> mlp1, pure JAX.
- :class:`Conversation` / :func:`get_conv_template` — prompt assembly for the
  chat templates the reference registers (Hermes-2, internlm2-chat,
  phi3-chat, internvl2_5).
- :class:`InternVLChat.chat`/``batch_chat`` — LLM generation is host-side HF
  (torch CPU), gated on transformers weights being available; it is an
  offline utility, not a TPU compute path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models.uniflow.components import resample_tokens
from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel


# ---------------------------------------------------------------------------
# Conversation templates
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Conversation:
    """Chat prompt template (reference conversation.py:39-318, compacted to
    the separator style every registered template actually uses)."""

    name: str
    system_template: str = "<|im_start|>system\n{system_message}"
    system_message: str = ""
    roles: Tuple[str, str] = ("<|im_start|>user\n", "<|im_start|>assistant\n")
    sep: str = "<|im_end|>"
    messages: Optional[List[Tuple[str, Optional[str]]]] = None

    def __post_init__(self):
        self.messages = list(self.messages or [])

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append((role, message))

    def get_prompt(self) -> str:
        system = self.system_template.format(system_message=self.system_message)
        ret = system + self.sep + "\n"
        for role, message in self.messages:
            if message is not None:
                ret += role + message + self.sep + "\n"
            else:
                ret += role
        return ret

    def copy(self) -> "Conversation":
        return Conversation(
            name=self.name, system_template=self.system_template,
            system_message=self.system_message, roles=self.roles, sep=self.sep,
            messages=list(self.messages),
        )


_TEMPLATES = {}


def register_conv_template(t: Conversation, override: bool = False):
    if not override and t.name in _TEMPLATES:
        raise ValueError(f"template {t.name} already registered")
    _TEMPLATES[t.name] = t


def get_conv_template(name: str) -> Conversation:
    return _TEMPLATES[name].copy()


register_conv_template(Conversation(
    name="Hermes-2",
    system_message="你是书生·万象... (InternVL assistant system prompt)",
))
register_conv_template(Conversation(
    name="internlm2-chat",
    system_message="You are an AI assistant whose name is InternLM (书生·浦语).",
))
register_conv_template(Conversation(
    name="phi3-chat",
    system_template="<|system|>\n{system_message}",
    roles=("<|user|>\n", "<|assistant|>\n"),
    sep="<|end|>",
))
register_conv_template(Conversation(
    name="internvl2_5",
    system_message=(
        "你是书生·万象，英文名是InternVL，是由上海人工智能实验室、清华大学及多家合作单位"
        "联合开发的多模态大语言模型。"
    ),
))


# ---------------------------------------------------------------------------
# Vision feature extraction (JAX)
# ---------------------------------------------------------------------------


class InternVLVision(nn.Module):
    """InternViT + pixel-shuffle connector + mlp1 (extract_feature path).

    ``select_layer`` truncates the encoder (InternVL semantics: hidden state
    of that layer; -1 = last). ``downsample_ratio=0.5`` quadruples channels.
    """

    vit: ViTConfig = ViTConfig(qk_normalization=True, norm_type="rms_norm",
                               initializer_factor=0.1)
    llm_hidden_size: int = 1536
    select_layer: int = -1
    downsample_ratio: float = 0.5
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values):
        select = (
            0 if self.select_layer in (-1, self.vit.num_layers)
            else self.select_layer
        )
        hidden, tapped = VisionModel(
            self.vit, dtype=self.dtype, select_layer=select, name="vision_model"
        )(pixel_values)
        embeds = tapped if select else hidden
        embeds = embeds[:, 1:]
        embeds = resample_tokens(embeds, self.downsample_ratio)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp1_norm")(embeds)
        h = nn.Dense(self.llm_hidden_size, dtype=self.dtype, name="mlp1_fc1")(h)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.llm_hidden_size, dtype=self.dtype, name="mlp1_fc2")(h)


class InternVLChat:
    """Chat surface; generation runs host-side through HF transformers.

    The reference's chat/batch_chat (modeling_internvl_chat.py:231-428) embeds
    ``<img>`` context tokens into the prompt and calls Qwen2 generate with
    vision embeds spliced at IMG_CONTEXT positions. Here the prompt assembly
    and template handling are native; generation requires a local HF
    checkpoint (``weight_path``) and raises a clear error without one
    (zero-egress environment).
    """

    IMG_START, IMG_END, IMG_CONTEXT = "<img>", "</img>", "<IMG_CONTEXT>"

    def __init__(self, weight_path: Optional[str] = None,
                 template: str = "internvl2_5", num_image_token: int = 256):
        self.template = template
        self.num_image_token = num_image_token
        self._model = None
        self._tokenizer = None
        if weight_path is not None:
            import torch
            from transformers import AutoModelForCausalLM, AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(
                weight_path, trust_remote_code=True
            )
            self._model = AutoModelForCausalLM.from_pretrained(
                weight_path, torch_dtype=torch.bfloat16, trust_remote_code=True
            ).eval()

    def build_query(self, question: str, num_patches_list=None,
                    system_message: Optional[str] = None,
                    history=None) -> str:
        """Prompt assembly (modeling_internvl_chat.py:325-359): template turns
        (+history) rendered, then each ``<image>`` replaced by
        IMG_START + IMG_CONTEXT*num_image_token*num_patches + IMG_END.
        Image tokens are inserted only for provided patch counts — a
        text-only chat carries none."""
        conv = get_conv_template(self.template)
        if system_message is not None:
            conv.system_message = system_message
        for old_q, old_a in (history or []):
            conv.append_message(conv.roles[0], old_q)
            conv.append_message(conv.roles[1], old_a)
        conv.append_message(conv.roles[0], question)
        conv.append_message(conv.roles[1], None)
        query = conv.get_prompt()
        for num_patches in (num_patches_list or []):
            image_tokens = (
                self.IMG_START
                + self.IMG_CONTEXT * self.num_image_token * num_patches
                + self.IMG_END
            )
            query = query.replace("<image>", image_tokens, 1)
        return query

    def chat(self, question: str, pixel_values=None, history=None,
             return_history: bool = False, num_patches_list=None,
             **generation_config):
        """Reference chat protocol (modeling_internvl_chat.py:310-384):
        prepend ``<image>`` for a fresh image turn, register the IMG_CONTEXT
        token id on the model, stop at the template separator."""
        if self._model is None:
            raise RuntimeError(
                "InternVLChat.chat needs a local HF checkpoint (weight_path); "
                "none available in this environment"
            )
        import torch

        if history is None and pixel_values is not None \
                and "<image>" not in question:
            question = "<image>\n" + question
        if num_patches_list is None:
            num_patches_list = ([pixel_values.shape[0]]
                                if pixel_values is not None else [])
        self._model.img_context_token_id = \
            self._tokenizer.convert_tokens_to_ids(self.IMG_CONTEXT)
        conv = get_conv_template(self.template)
        eos_token_id = self._tokenizer.convert_tokens_to_ids(conv.sep.strip())
        query = self.build_query(question, num_patches_list=num_patches_list,
                                 history=history)
        inputs = self._tokenizer(query, return_tensors="pt")
        if pixel_values is not None:
            if not torch.is_tensor(pixel_values):
                pixel_values = torch.as_tensor(np.asarray(pixel_values))
            pixel_values = pixel_values.to(self._model.dtype)
        out = self._model.generate(
            pixel_values=pixel_values, input_ids=inputs.input_ids,
            attention_mask=inputs.attention_mask,
            eos_token_id=eos_token_id, **generation_config)
        text = self._tokenizer.batch_decode(out, skip_special_tokens=True)[0]
        response = text.split(conv.sep.strip())[0].strip()
        if return_history:
            return response, (history or []) + [(question, response)]
        return response

    def batch_chat(self, questions, pixel_values=None, num_patches_list=None,
                   **generation_config):
        """Batched single-turn chat (modeling_internvl_chat.py:241-308):
        per-question prompt assembly, LEFT-padded batch tokenization so
        generation continues from the prompt tail, one generate call."""
        if self._model is None:
            raise RuntimeError(
                "InternVLChat.batch_chat needs a local HF checkpoint "
                "(weight_path); none available in this environment"
            )
        import torch

        if num_patches_list is None:
            num_patches_list = ([1] * len(questions)
                                if pixel_values is not None
                                else [0] * len(questions))
        self._model.img_context_token_id = \
            self._tokenizer.convert_tokens_to_ids(self.IMG_CONTEXT)
        queries = []
        for question, num_patches in zip(questions, num_patches_list):
            if pixel_values is not None and "<image>" not in question:
                question = "<image>\n" + question
            queries.append(self.build_query(
                question,
                num_patches_list=[num_patches] if num_patches else []))
        conv = get_conv_template(self.template)
        self._tokenizer.padding_side = "left"
        inputs = self._tokenizer(queries, return_tensors="pt", padding=True)
        if pixel_values is not None:
            if not torch.is_tensor(pixel_values):
                pixel_values = torch.as_tensor(np.asarray(pixel_values))
            pixel_values = pixel_values.to(self._model.dtype)
        out = self._model.generate(
            pixel_values=pixel_values, input_ids=inputs.input_ids,
            attention_mask=inputs.attention_mask,
            eos_token_id=self._tokenizer.convert_tokens_to_ids(
                conv.sep.strip()),
            **generation_config)
        texts = self._tokenizer.batch_decode(out, skip_special_tokens=True)
        return [t.split(conv.sep.strip())[0].strip() for t in texts]
