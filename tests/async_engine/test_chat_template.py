"""Chat-template loading/rendering tests (reference pattern:
tests/async_engine/test_chat_template.py — file template, literal
template, and rendered conversation output)."""
import pathlib

import pytest

CHATML = pathlib.Path(__file__).parent.parent.parent / \
    "examples/template_chatml.jinja"

TEST_MESSAGES = [
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there!"},
    {"role": "user", "content": "What is the capital of"},
]


class MockTokenizer:
    chat_template = None

    def apply_chat_template(self, conversation, tokenize=False,
                            add_generation_prompt=False):
        # Delegate to the real jinja renderer via transformers' mixin.
        from transformers import PreTrainedTokenizerBase
        return PreTrainedTokenizerBase.apply_chat_template(
            self, conversation=conversation, tokenize=tokenize,
            add_generation_prompt=add_generation_prompt)


class MockServingChat:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer


def _load(template):
    from vllm_splitwise_tpu.entrypoints.openai.serving_chat import \
        OpenAIServingChat
    serving = MockServingChat(MockTokenizer())
    OpenAIServingChat._install_chat_template(serving, template)
    return serving.tokenizer.chat_template


def test_load_chat_template_from_file():
    assert CHATML.exists()
    content = _load(str(CHATML))
    assert content is not None
    assert "<|im_start|>" in content
    assert content.count("{% for message in messages %}") == 1


def test_load_literal_template_string():
    # A non-path argument is treated as a literal jinja template with
    # escaped newlines decoded.
    content = _load("{{ messages[0]['content'] }}\\n")
    assert content == "{{ messages[0]['content'] }}\n"


@pytest.mark.parametrize("add_generation_prompt", [True, False])
def test_chatml_rendering(add_generation_prompt):
    import jinja2
    tpl = jinja2.Template(CHATML.read_text())
    out = tpl.render(messages=TEST_MESSAGES,
                     add_generation_prompt=add_generation_prompt)
    assert out.startswith("<|im_start|>user\nHello<|im_end|>")
    assert "<|im_start|>assistant\nHi there!<|im_end|>" in out
    if add_generation_prompt:
        assert out.rstrip().endswith("<|im_start|>assistant")
    else:
        assert out.rstrip().endswith("What is the capital of")
