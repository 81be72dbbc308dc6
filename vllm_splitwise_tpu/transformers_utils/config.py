"""HF model-config loading (reference role: vllm/transformers_utils/config.py)."""
from __future__ import annotations

from typing import Optional

from transformers import AutoConfig, PretrainedConfig


def get_hf_config(
    model: str,
    trust_remote_code: bool = False,
    revision: Optional[str] = None,
    code_revision: Optional[str] = None,
) -> PretrainedConfig:
    try:
        config = AutoConfig.from_pretrained(
            model,
            trust_remote_code=trust_remote_code,
            revision=revision,
            code_revision=code_revision,
        )
    except ValueError as e:
        # Checkpoints with custom config code (chatglm, old falcon):
        # fall back to our bundled config classes (reference role:
        # vllm/transformers_utils/configs/) before demanding
        # trust_remote_code.
        fallback = _try_fallback_config(model, revision)
        if fallback is not None:
            return fallback
        if (not trust_remote_code
                and "requires you to execute the configuration file" in str(e)):
            raise RuntimeError(
                "Failed to load the model config. If the model is a custom "
                "model not yet available in the HuggingFace transformers "
                "library, consider setting `trust_remote_code=True` or using "
                "the `--trust-remote-code` flag.") from e
        raise
    return config


def _try_fallback_config(model: str,
                         revision: Optional[str]) -> Optional[PretrainedConfig]:
    import json
    import os

    from vllm_splitwise_tpu.transformers_utils.configs import \
        FALLBACK_CONFIGS

    cfg_path = os.path.join(model, "config.json")
    if not os.path.isfile(cfg_path):
        return None
    with open(cfg_path) as f:
        raw = json.load(f)
    cls = FALLBACK_CONFIGS.get(raw.get("model_type", ""))
    if cls is None:
        return None
    return cls.from_pretrained(model, revision=revision)
