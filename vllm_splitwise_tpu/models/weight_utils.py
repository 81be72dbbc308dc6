"""Checkpoint streaming (reference role: vllm/model_executor/weight_utils.py).

Streams (name, numpy array) pairs from a local HF-format checkpoint
directory — safetensors preferred, torch .bin fallback — without
materializing the whole checkpoint (safetensors tensors are mmapped).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Iterator, Tuple

import numpy as np

from vllm_splitwise_tpu.logger import init_logger

logger = init_logger(__name__)


def _iterate_safetensors(files) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open
    for path in files:
        with safe_open(path, framework="np") as f:
            for name in f.keys():
                yield name, f.get_tensor(name)


def _iterate_torch_bins(files) -> Iterator[Tuple[str, np.ndarray]]:
    import torch
    for path in files:
        state = torch.load(path, map_location="cpu", weights_only=True)
        for name, tensor in state.items():
            if tensor.dtype == torch.bfloat16:
                tensor = tensor.float()
            yield name, tensor.numpy()
        del state


def hf_checkpoint_weights_iterator(
    model_dir: str,
    load_format: str = "auto",
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield every weight of a local HF checkpoint directory."""
    if not os.path.isdir(model_dir):
        raise ValueError(
            f"{model_dir} is not a local directory. This build has no "
            "network access to the HuggingFace Hub; download checkpoints "
            "out-of-band and pass the local path.")

    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    bin_files = sorted(glob.glob(os.path.join(model_dir, "*.bin")))
    pt_files = sorted(glob.glob(os.path.join(model_dir, "*.pt")))

    if load_format in ("auto", "safetensors") and st_files:
        # Respect the index if present (ordering irrelevant, all listed).
        yield from _iterate_safetensors(st_files)
    elif load_format in ("auto", "pt") and (bin_files or pt_files):
        yield from _iterate_torch_bins(bin_files + pt_files)
    else:
        raise ValueError(
            f"No checkpoint files found in {model_dir} for load_format="
            f"{load_format} (looked for *.safetensors, *.bin, *.pt).")


def get_quant_config_from_dir(model_dir: str) -> dict:
    path = os.path.join(model_dir, "quantize_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}
