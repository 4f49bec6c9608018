"""Tokenizer unit tests: golden ids, batch layout, and (when the reference
tree is present) byte-exact parity with the reference BPE implementation."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from debiasing_multi_modal_tpu.templates import CELEBA, WATERBIRDS
from debiasing_multi_modal_tpu.tokenizer import (
    CONTEXT_LENGTH,
    default_tokenizer,
    tokenize,
)
from debiasing_multi_modal_tpu.tokenizer.bpe import EOT_TOKEN, SOT_TOKEN, VOCAB_SIZE

REFERENCE_TOKENIZER = "/root/reference/clip/simple_tokenizer.py"

# Known-good CLIP token ids (stable public vocabulary).
GOLDEN = {
    "a photo of a cat": [SOT_TOKEN, 320, 1125, 539, 320, 2368, EOT_TOKEN],
}


def test_vocab_size_and_specials():
    tok = default_tokenizer()
    assert len(tok.token_to_id) == VOCAB_SIZE
    assert tok.token_to_id["<|startoftext|>"] == SOT_TOKEN
    assert tok.token_to_id["<|endoftext|>"] == EOT_TOKEN


def test_golden_ids():
    for text, ids in GOLDEN.items():
        row = tokenize(text)[0]
        assert row[: len(ids)].tolist() == ids
        assert (row[len(ids) :] == 0).all()


def test_batch_layout_and_padding():
    prompts = WATERBIRDS.prompts("group") + CELEBA.prompts("class")
    out = tokenize(prompts)
    assert out.shape == (len(prompts), CONTEXT_LENGTH)
    assert out.dtype == np.int32
    for row in out:
        assert row[0] == SOT_TOKEN
        nz = row[row != 0]
        assert nz[-1] == EOT_TOKEN
        # EOT is the max id in each sequence -> argmax gather is valid
        assert row.argmax() == len(nz) - 1


def test_roundtrip_decode():
    tok = default_tokenizer()
    text = "a photo of a waterbird."
    assert tok.decode(tok.encode(text)).strip() == "a photo of a waterbird ."


def test_truncation():
    long_text = "bird " * 200
    with pytest.raises(ValueError):
        tokenize(long_text)
    out = tokenize(long_text, truncate=True)[0]
    assert out.shape == (CONTEXT_LENGTH,)
    assert out[-1] == EOT_TOKEN


@pytest.mark.skipif(
    not os.path.isfile(REFERENCE_TOKENIZER), reason="reference tree not mounted"
)
def test_parity_with_reference_bpe():
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: t  # identity on the ASCII parity corpus
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_tok", REFERENCE_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.SimpleTokenizer()
    mine = default_tokenizer()

    corpus = (
        [t for d in (WATERBIRDS, CELEBA) for k in ("class", "spurious", "group") for t in d.prompts(k)]
        + [
            "Hello, World!!  multiple   spaces",
            "it's a don't can't 1234 numbers 5",
            "CLIP zero-shot classification works?!",
            "café naïve résumé",
            "snake_case and CamelCase and kebab-case",
            "supercalifragilisticexpialidocious",
            # literal special tokens map to their single ids (the reference
            # pre-seeds its BPE cache, simple_tokenizer.py:69-70)
            "a photo of a <|endoftext|> bird.",
            "<|startoftext|>hello",
            "",
        ]
    )
    for text in corpus:
        assert ref.encode(text) == mine.encode(text), text


@pytest.mark.skipif(
    not os.path.isfile(REFERENCE_TOKENIZER), reason="reference tree not mounted"
)
def test_property_parity_random_strings():
    """Byte-exact parity with the reference BPE on 300 random strings drawn
    from a mixed alphabet (ASCII words, digits, punctuation, unicode)."""
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: t
        sys.modules["ftfy"] = stub
    spec = importlib.util.spec_from_file_location("ref_tok_prop", REFERENCE_TOKENIZER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref = mod.SimpleTokenizer()
    mine = default_tokenizer()

    rng = np.random.default_rng(0)
    words = [
        "bird", "water", "the", "photo", "of", "a", "background", "land",
        "supercalifragilistic", "x", "don't", "it's", "123", "7", "!!", "?!",
        ",", ".", "-", "_", "café", "naïve", "(parens)", "[brackets]",
        "MixedCase", "UPPER", "email@example.com", "http://a.b/c",
    ]
    for _ in range(300):
        n = int(rng.integers(1, 12))
        text = " ".join(rng.choice(words, n))
        if rng.random() < 0.3:
            text = text.replace(" ", "  ", 1)  # irregular whitespace
        assert ref.encode(text) == mine.encode(text), repr(text)
