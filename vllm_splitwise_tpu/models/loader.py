"""Model instantiation + weight loading (reference role:
vllm/model_executor/model_loader.py)."""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from vllm_splitwise_tpu.config import ModelConfig
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.models import ModelRegistry
from vllm_splitwise_tpu.models.weight_utils import \
    hf_checkpoint_weights_iterator

logger = init_logger(__name__)


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


def get_model(model_config: ModelConfig) -> Tuple[Any, Dict[str, Any]]:
    """Returns (model, host-resident params).  The caller (worker) places
    params onto the mesh with the model's param_specs."""
    model_cls = _get_model_architecture(model_config)
    model = model_cls(model_config.hf_config, dtype=model_config.dtype)

    if model_config.load_format == "dummy":
        params = model.init_params(jax.random.PRNGKey(model_config.seed))
    else:
        logger.info("Loading weights from %s", model_config.model)
        params = model.load_weights(
            hf_checkpoint_weights_iterator(model_config.model,
                                           model_config.load_format))
    return model, params
