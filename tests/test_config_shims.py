"""Config fallback shims (reference role: vllm/transformers_utils/configs/)."""
import json
import os

from vllm_splitwise_tpu.transformers_utils.config import get_hf_config


def test_chatglm_fallback_config(tmp_path):
    json.dump(
        {"model_type": "chatglm", "num_layers": 2, "hidden_size": 64,
         "num_attention_heads": 4, "padded_vocab_size": 128,
         "ffn_hidden_size": 96, "kv_channels": 16,
         "architectures": ["ChatGLMModel"]},
        open(os.path.join(tmp_path, "config.json"), "w"))
    c = get_hf_config(str(tmp_path))
    assert c.num_layers == 2 and c.num_hidden_layers == 2
    assert c.architectures == ["ChatGLMModel"]


def test_falcon_rw_fallback_config(tmp_path):
    json.dump(
        {"model_type": "RefinedWeb", "n_layer": 2, "n_embed": 64,
         "n_head": 4, "vocab_size": 128, "alibi": False,
         "architectures": ["RWForCausalLM"]},
        open(os.path.join(tmp_path, "config.json"), "w"))
    c = get_hf_config(str(tmp_path))
    assert c.num_hidden_layers == 2
    assert c.hidden_size == 64
