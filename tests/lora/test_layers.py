"""LoRA layer-level numerics + per-LoRA tokenizer tests (reference
patterns: tests/lora/test_layers.py dense-delta oracle and
tests/lora/test_tokenizer.py TokenizerGroup behavior)."""
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.lora.layers import lora_apply


def _random_stacks(rng, slots, h, r, out):
    a = rng.standard_normal((slots, h, r)).astype(np.float32) * 0.1
    b = rng.standard_normal((slots, r, out)).astype(np.float32) * 0.1
    return jnp.asarray(a), jnp.asarray(b)


def test_lora_apply_matches_dense_delta():
    rng = np.random.RandomState(0)
    slots, h, r, out = 4, 32, 8, 48
    a, b = _random_stacks(rng, slots, h, r, out)
    x = jnp.asarray(rng.standard_normal((3, 5, h)).astype(np.float32))
    slot_idx = jnp.asarray([2, 0, 3], dtype=jnp.int32)

    delta = lora_apply(x, a, b, slot_idx)
    assert delta.shape == (3, 5, out)
    for i, s in enumerate([2, 0, 3]):
        want = np.asarray(x[i]) @ np.asarray(a[s]) @ np.asarray(b[s])
        np.testing.assert_allclose(np.asarray(delta[i]), want, rtol=2e-4,
                                   atol=2e-4)


def test_lora_apply_2d_input_squeezes():
    rng = np.random.RandomState(1)
    slots, h, r, out = 2, 16, 4, 24
    a, b = _random_stacks(rng, slots, h, r, out)
    x = jnp.asarray(rng.standard_normal((1, 6, h)).astype(np.float32))
    d3 = lora_apply(x, a, b, jnp.asarray([1], jnp.int32))
    d2 = lora_apply(x[0], a, b, jnp.asarray([1], jnp.int32))
    np.testing.assert_allclose(np.asarray(d3[0]), np.asarray(d2),
                               rtol=1e-6)


def test_lora_zero_slot_isolation():
    """Rows mapped to a zeroed slot get a zero delta even when other
    slots hold adapters (mixed-batch correctness)."""
    rng = np.random.RandomState(2)
    slots, h, r, out = 3, 16, 4, 16
    a, b = _random_stacks(rng, slots, h, r, out)
    a = a.at[0].set(0.0)
    b = b.at[0].set(0.0)
    x = jnp.asarray(rng.standard_normal((2, 4, h)).astype(np.float32))
    delta = lora_apply(x, a, b, jnp.asarray([0, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(delta[0]), 0.0, atol=1e-7)
    assert float(jnp.abs(delta[1]).max()) > 0


class FakeLoRARequest:
    def __init__(self, lora_int_id, path):
        self.lora_int_id = lora_int_id
        self.lora_local_path = path


def test_tokenizer_group_lora_fallback(tmp_path):
    from ..models.utils import save_tiny_tokenizer
    from vllm_splitwise_tpu.transformers_utils.tokenizer import \
        TokenizerGroup
    d = str(tmp_path / "base")
    save_tiny_tokenizer(d, 64)
    group = TokenizerGroup(d, enable_lora=True, max_num_seqs=4)

    # No lora request -> base tokenizer.
    assert group.get_lora_tokenizer(None) is group.tokenizer
    # Adapter dir without tokenizer files -> base tokenizer, cached.
    empty = tmp_path / "adapter"
    empty.mkdir()
    req = FakeLoRARequest(1, str(empty))
    assert group.get_lora_tokenizer(req) is group.tokenizer
    assert group.lora_tokenizers.get(1) is group.tokenizer

    # Adapter with its own tokenizer -> distinct instance.
    own = str(tmp_path / "adapter2")
    save_tiny_tokenizer(own, 64)
    req2 = FakeLoRARequest(2, own)
    tok2 = group.get_lora_tokenizer(req2)
    assert tok2 is not group.tokenizer
    ids = group.encode("t3 t4", lora_request=req2)
    assert ids == [3, 4]
