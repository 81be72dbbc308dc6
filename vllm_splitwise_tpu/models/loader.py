"""Model instantiation + weight loading (reference role:
vllm/model_executor/model_loader.py): architecture dispatch, quantized
checkpoint grouping/conversion, dummy init."""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import numpy as np

from vllm_splitwise_tpu.config import ModelConfig
from vllm_splitwise_tpu.layers.quantization import (QuantizationConfig,
                                                    get_quantization_config)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.models import ModelRegistry
from vllm_splitwise_tpu.models.weight_utils import \
    hf_checkpoint_weights_iterator

logger = init_logger(__name__)

# Weights never quantized, whatever the method.
_NEVER_QUANTIZE = ("embed", "lm_head", "norm", "rotary")


def _get_model_architecture(model_config: ModelConfig):
    architectures = getattr(model_config.hf_config, "architectures",
                            None) or []
    for arch in architectures:
        cls = ModelRegistry.load_model_cls(arch)
        if cls is not None:
            return cls
    raise ValueError(
        f"Model architectures {architectures} are not supported for now. "
        f"Supported architectures: {ModelRegistry.get_supported_archs()}")


def get_quant_config(
        model_config: ModelConfig) -> Optional[QuantizationConfig]:
    if model_config.quantization is None:
        return None
    cls = get_quantization_config(model_config.quantization)
    hf_quant = getattr(model_config.hf_config, "quantization_config", None)
    if hf_quant is not None:
        return cls.from_config(dict(hf_quant))
    return cls.from_config({})


def _should_quantize(name: str, w) -> bool:
    return (getattr(w, "ndim", 0) == 2
            and not any(s in name for s in _NEVER_QUANTIZE))


def quant_grouping_iterator(
    weights: Iterable[Tuple[str, np.ndarray]],
    quant_config: QuantizationConfig,
) -> Iterable[Tuple[str, Any]]:
    """Groups per-linear serialized tensors (qweight/qzeros/scales/g_idx)
    and yields them converted to the internal layout under the dense
    '<prefix>.weight' name, so model load_weights stays format-agnostic.

    For on-the-fly methods (tensor_names == ['weight'], e.g. int8) dense
    linear weights are transposed to [in, out] and quantized directly.
    """
    on_the_fly = quant_config.tensor_names == ["weight"]
    pending: Dict[str, Dict[str, np.ndarray]] = {}
    aux_names = set(quant_config.tensor_names) | {"g_idx"}

    for name, w in weights:
        part = name.rsplit(".", 1)[-1]
        if on_the_fly:
            if part == "weight" and _should_quantize(name, w):
                yield name, quant_config.convert(
                    {"weight": np.asarray(w, dtype=np.float32).T})
            else:
                yield name, w
            continue
        if part in aux_names and part != "weight":
            prefix = name[:-(len(part) + 1)]
            parts = pending.setdefault(prefix, {})
            parts[part] = np.asarray(w)
            if quant_config.is_complete(parts):
                yield prefix + ".weight", quant_config.convert(
                    pending.pop(prefix))
        else:
            yield name, w
    for prefix, parts in pending.items():
        logger.warning("Incomplete quantized tensors for %s: %s", prefix,
                       sorted(parts))


def quantize_dummy_params(params, quant_config: QuantizationConfig,
                          seed: int) -> None:
    """Replace 2D projection weights of a dense dummy pytree with random
    quantized param dicts (load_format='dummy' under quantization)."""
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)

    def walk(node, path=""):
        if isinstance(node, list):
            for i, item in enumerate(node):
                walk(item, path)
            return
        if not isinstance(node, dict):
            return
        for key, val in list(node.items()):
            if isinstance(val, (dict, list)):
                walk(val, f"{path}.{key}")
            elif _should_quantize(f"{path}.{key}", val):
                kin, kout = val.shape
                group = _fit_group(kin, getattr(quant_config, "group_size",
                                                128))
                if group is None:
                    continue  # too small to group-quantize; stay dense
                made = quant_config.make_dummy(rng, kin, kout,
                                               group_size=group)
                node[key] = {k: jnp.asarray(v) for k, v in made.items()}
            elif (getattr(val, "ndim", 0) == 3
                  and not any(s in f"{path}.{key}"
                              for s in _NEVER_QUANTIZE)):
                # Stacked layer params [L, in, out] (scan models): one
                # quantized dict per layer, components stacked back.
                num_l, kin, kout = val.shape
                group = _fit_group(kin, getattr(quant_config, "group_size",
                                                128))
                if group is None:
                    continue
                made = [
                    quant_config.make_dummy(rng, kin, kout,
                                            group_size=group)
                    for _ in range(num_l)
                ]
                node[key] = {
                    k: jnp.stack([jnp.asarray(m[k]) for m in made])
                    for k in made[0]
                }

    walk(params)


def _fit_group(k: int, preferred: int) -> Optional[int]:
    preferred = preferred if preferred and preferred > 0 else 128
    g = min(preferred, k // 2)
    while g >= 16:
        if k % (2 * g) == 0:
            return g
        g //= 2
    return None


def get_model(model_config: ModelConfig) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, host-resident params).  The caller (worker) places
    params onto the mesh with the model's param_specs."""
    model_cls = _get_model_architecture(model_config)
    model = model_cls(model_config.hf_config, dtype=model_config.dtype)
    quant_config = get_quant_config(model_config)

    if model_config.load_format == "dummy":
        params = model.init_params(jax.random.PRNGKey(model_config.seed))
        if quant_config is not None:
            quantize_dummy_params(params, quant_config, model_config.seed)
    else:
        logger.info("Loading weights from %s (quantization=%s)",
                    model_config.model, model_config.quantization)
        weights = hf_checkpoint_weights_iterator(model_config.model,
                                                 model_config.load_format)
        if quant_config is not None:
            weights = quant_grouping_iterator(weights, quant_config)
        params = model.load_weights(weights)
    if (getattr(model_config, "quantize_lm_head", None) == "int8"
            and isinstance(params, dict) and "lm_head" in params
            and not isinstance(params["lm_head"], dict)):
        params["lm_head"] = _quantize_lm_head_int8(params["lm_head"])
        logger.info("LM head quantized to int8 (per-channel W8A16)")
    return model, params


def _quantize_lm_head_int8(w) -> Dict[str, Any]:
    """Per-output-channel symmetric int8 (consumed by
    ops/quant_matmul.quant_matmul_int8 with f32 out)."""
    import numpy as np
    wf = np.asarray(w, dtype=np.float32)          # [H, Vp]
    s = np.max(np.abs(wf), axis=0, keepdims=True) / 127.0
    s = np.maximum(s, 1e-8)
    q = np.clip(np.round(wf / s), -127, 127).astype(np.int8)
    return {"qweight": q, "scales": s.astype(np.float32)}
