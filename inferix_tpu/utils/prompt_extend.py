"""Prompt extension: LLM-based prompt expansion before generation.

Parity with `inferix/models/wan_base/utils/prompt_extend.py` (`QwenPromptExpander`
:300, `DashScopePromptExpander` :157): an expander interface with the Wan
system prompts, a local-LLM implementation (any HF causal LM, Qwen by
default) and an API-backed implementation — both optional; the passthrough
expander keeps pipelines dependency-free.
"""
from __future__ import annotations

import abc
import dataclasses
from typing import Optional

# The Wan English system prompt (condensed from the reference's template —
# same instructions: enrich short user prompts with detailed, fluent visual
# descriptions for video generation without changing intent).
SYSTEM_PROMPT = (
    "You are a prompt engineer for a text-to-video model. Rewrite the user's "
    "prompt into a detailed, fluent description: elaborate subjects, scene, "
    "lighting, camera movement and style; keep the original intent, quantity "
    "and attributes; output only the rewritten prompt, 80-120 words."
)


@dataclasses.dataclass
class PromptExpansion:
    prompt: str
    system_prompt: str = SYSTEM_PROMPT
    seed: int = -1


class PromptExpander(abc.ABC):
    @abc.abstractmethod
    def __call__(self, prompt: str, seed: int = -1) -> str:
        ...


class PassthroughPromptExpander(PromptExpander):
    """No-op expander (default when no LLM is configured)."""

    def __call__(self, prompt: str, seed: int = -1) -> str:
        return prompt


class QwenPromptExpander(PromptExpander):
    """Local HF causal LM expansion (reference QwenPromptExpander)."""

    def __init__(self, model_name: str = "Qwen/Qwen2.5-3B-Instruct",
                 device: str = "cpu", max_new_tokens: int = 256):
        try:
            from transformers import AutoModelForCausalLM, AutoTokenizer
        except ImportError as e:
            raise RuntimeError("transformers is required for Qwen prompt "
                               "extension") from e
        self.tokenizer = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForCausalLM.from_pretrained(model_name).to(device)
        self.device = device
        self.max_new_tokens = max_new_tokens

    def __call__(self, prompt: str, seed: int = -1) -> str:
        import torch

        if seed >= 0:
            torch.manual_seed(seed)
        messages = [
            {"role": "system", "content": SYSTEM_PROMPT},
            {"role": "user", "content": prompt},
        ]
        text = self.tokenizer.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True
        )
        inputs = self.tokenizer([text], return_tensors="pt").to(self.device)
        out = self.model.generate(**inputs,
                                  max_new_tokens=self.max_new_tokens)
        gen = out[0][inputs["input_ids"].shape[1]:]
        return self.tokenizer.decode(gen, skip_special_tokens=True).strip()


class DashScopePromptExpander(PromptExpander):
    """API-backed expansion (reference DashScopePromptExpander); requires the
    dashscope package + API key in the environment."""

    def __init__(self, model_name: str = "qwen-plus"):
        try:
            import dashscope  # noqa: F401
        except ImportError as e:
            raise RuntimeError("dashscope is required for API prompt "
                               "extension") from e
        self.model_name = model_name

    def __call__(self, prompt: str, seed: int = -1) -> str:
        import dashscope

        rsp = dashscope.Generation.call(
            model=self.model_name,
            messages=[
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": prompt},
            ],
            seed=seed if seed >= 0 else None,
            result_format="message",
        )
        return rsp.output.choices[0].message.content.strip()


def create_prompt_expander(kind: str = "none", **kwargs) -> PromptExpander:
    if kind in ("none", "passthrough"):
        return PassthroughPromptExpander()
    if kind == "qwen":
        return QwenPromptExpander(**kwargs)
    if kind == "dashscope":
        return DashScopePromptExpander(**kwargs)
    raise ValueError(f"unknown prompt expander {kind!r}")
