"""Fallback config classes for checkpoints whose configs are not (or were
not historically) in the transformers library (reference role:
vllm/transformers_utils/configs/{chatglm,falcon,mpt}.py).  Used by
``get_hf_config`` when ``AutoConfig`` raises for a known model_type, so
these checkpoints load without ``trust_remote_code``."""
from __future__ import annotations

from transformers import PretrainedConfig


class ChatGLMConfig(PretrainedConfig):
    model_type = "chatglm"
    attribute_map = {
        "num_hidden_layers": "num_layers",
        "n_head_kv": "multi_query_group_num",
    }

    def __init__(self, num_layers=28, padded_vocab_size=65024,
                 hidden_size=4096, ffn_hidden_size=13696, kv_channels=128,
                 num_attention_heads=32, seq_length=2048,
                 hidden_dropout=0.0, attention_dropout=0.0,
                 layernorm_epsilon=1e-5, rmsnorm=True,
                 apply_residual_connection_post_layernorm=False,
                 post_layer_norm=True, add_bias_linear=False,
                 add_qkv_bias=False, interleaved_qkv=False,
                 bias_dropout_fusion=True, multi_query_attention=False,
                 multi_query_group_num=1, apply_query_key_layer_scaling=True,
                 attention_softmax_in_fp32=True, fp32_residual_connection=False,
                 quantization_bit=0, pre_seq_len=None, prefix_projection=False,
                 **kwargs):
        self.num_layers = num_layers
        self.vocab_size = padded_vocab_size
        self.padded_vocab_size = padded_vocab_size
        self.hidden_size = hidden_size
        self.ffn_hidden_size = ffn_hidden_size
        self.kv_channels = kv_channels
        self.num_attention_heads = num_attention_heads
        self.seq_length = seq_length
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        self.layernorm_epsilon = layernorm_epsilon
        self.rmsnorm = rmsnorm
        self.apply_residual_connection_post_layernorm = \
            apply_residual_connection_post_layernorm
        self.post_layer_norm = post_layer_norm
        self.add_bias_linear = add_bias_linear
        self.add_qkv_bias = add_qkv_bias
        self.interleaved_qkv = interleaved_qkv
        self.bias_dropout_fusion = bias_dropout_fusion
        self.multi_query_attention = multi_query_attention
        self.multi_query_group_num = multi_query_group_num
        self.apply_query_key_layer_scaling = apply_query_key_layer_scaling
        self.attention_softmax_in_fp32 = attention_softmax_in_fp32
        self.fp32_residual_connection = fp32_residual_connection
        self.quantization_bit = quantization_bit
        self.pre_seq_len = pre_seq_len
        self.prefix_projection = prefix_projection
        super().__init__(**kwargs)


class RWConfig(PretrainedConfig):
    """Early tiiuae/falcon-* checkpoints ("RefinedWeb")."""
    model_type = "RefinedWeb"
    attribute_map = {
        "num_hidden_layers": "n_layer",
        "num_attention_heads": "n_head",
        "hidden_size": "n_embed",
    }

    def __init__(self, vocab_size=250880, hidden_size=64, n_layer=2,
                 n_head=8, layer_norm_epsilon=1e-5, initializer_range=0.02,
                 use_cache=True, bos_token_id=1, eos_token_id=2,
                 hidden_dropout=0.0, attention_dropout=0.0,
                 multi_query=True, n_head_kv=None, alibi=False,
                 bias=False, parallel_attn=False, new_decoder_architecture=False,
                 **kwargs):
        self.vocab_size = vocab_size
        self.n_embed = kwargs.pop("n_embed", hidden_size)
        self.n_layer = n_layer
        self.n_head = n_head
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        self.multi_query = multi_query
        self.n_head_kv = n_head_kv
        self.alibi = alibi
        self.bias = bias
        self.parallel_attn = parallel_attn
        self.new_decoder_architecture = new_decoder_architecture
        super().__init__(bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class QWenConfig(PretrainedConfig):
    """Qwen first generation (model_type "qwen", QWenLMHeadModel)."""
    model_type = "qwen"

    def __init__(self, vocab_size=151936, hidden_size=4096,
                 num_hidden_layers=32, num_attention_heads=32,
                 emb_dropout_prob=0.0, attn_dropout_prob=0.0,
                 layer_norm_epsilon=1e-6, initializer_range=0.02,
                 max_position_embeddings=8192, scale_attn_weights=True,
                 use_cache=True, bf16=False, fp16=False, fp32=False,
                 kv_channels=128, rotary_pct=1.0, rotary_emb_base=10000,
                 use_dynamic_ntk=True, use_logn_attn=True,
                 use_flash_attn="auto", intermediate_size=22016,
                 no_bias=True, tie_word_embeddings=False, seq_length=8192,
                 **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.emb_dropout_prob = emb_dropout_prob
        self.attn_dropout_prob = attn_dropout_prob
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        self.max_position_embeddings = max_position_embeddings
        self.scale_attn_weights = scale_attn_weights
        self.use_cache = use_cache
        self.kv_channels = kv_channels
        self.rotary_pct = rotary_pct
        self.rotary_emb_base = rotary_emb_base
        self.use_dynamic_ntk = use_dynamic_ntk
        self.use_logn_attn = use_logn_attn
        self.intermediate_size = intermediate_size
        self.no_bias = no_bias
        self.seq_length = seq_length
        super().__init__(tie_word_embeddings=tie_word_embeddings, **kwargs)


# model_type -> fallback config class
FALLBACK_CONFIGS = {
    "chatglm": ChatGLMConfig,
    "RefinedWeb": RWConfig,
    "RefinedWebModel": RWConfig,
    "qwen": QWenConfig,
}
