"""CLIP BPE tokenizer tests with a synthetic vocab/merges pair."""

import json

import numpy as np
import pytest

from freefine_tpu.models.tokenizer import (
    CLIPTokenizer,
    HashTokenizer,
    bytes_to_unicode,
    load_tokenizer,
)


def _mini_tokenizer(tmp_path):
    # byte-level singles + a couple of merges, CLIP-style vocab layout
    byte_vocab = list(bytes_to_unicode().values())
    tokens = byte_vocab + [v + "</w>" for v in byte_vocab]
    merges = [("c", "a"), ("ca", "t</w>"), ("d", "o"), ("do", "g</w>")]
    tokens += ["".join(m) for m in merges]
    tokens += ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(" ".join(m) for m in merges)
    )
    return vocab


def test_bpe_merges_apply(tmp_path):
    vocab = _mini_tokenizer(tmp_path)
    tok = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=12)
    ids = tok.encode("cat dog")
    assert ids[0] == vocab["<|startoftext|>"]
    assert ids[1] == vocab["cat</w>"]
    assert ids[2] == vocab["dog</w>"]
    assert ids[3] == vocab["<|endoftext|>"]
    # eos padding to max_length
    assert (ids[4:] == vocab["<|endoftext|>"]).all()
    assert ids.shape == (12,)


def test_unmerged_word_falls_to_bytes(tmp_path):
    vocab = _mini_tokenizer(tmp_path)
    tok = CLIPTokenizer.from_pretrained(str(tmp_path), max_length=16)
    ids = tok.encode("ct")
    # 'c' + 't</w>' (no merge rule for ct)
    assert ids[1] == vocab["c"] and ids[2] == vocab["t</w>"]


def test_load_tokenizer_fallback(tmp_path):
    t = load_tokenizer(str(tmp_path / "missing"))
    assert isinstance(t, HashTokenizer)
    a = t.encode("hello world")
    b = t.encode("hello world")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (77,)
    t2 = load_tokenizer(None)
    assert isinstance(t2, HashTokenizer)


def test_load_real_when_files_exist(tmp_path):
    _mini_tokenizer(tmp_path)
    t = load_tokenizer(str(tmp_path))
    assert isinstance(t, CLIPTokenizer)
