"""CLIP BPE tokenizer tests: algorithm parity against transformers'
CLIPTokenizer on a synthetic (complete byte-level) vocabulary, and
equivalence of the two file-format constructors."""
import gzip
import json
import os

import numpy as np
import pytest

from asva_tpu.models.clip_bpe import ClipBPETokenizer, _bytes_to_unicode

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"),
          ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
          ("d", "o"), ("g</w>", ""), ("do", "g</w>"),
          ("1", "2"),
          ("b", "a"), ("r", "k"), ("ba", "rk"), ("i", "n"),
          ("in", "g</w>"), ("bark", "ing</w>")]
MERGES = [m for m in MERGES if "" not in m]


def canonical_vocab(merges):
    """[bytes, bytes</w>, merged..., SOT, EOT] — OpenAI CLIP ordering."""
    vocab = list(_bytes_to_unicode().values())
    vocab += [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    return {tok: i for i, tok in enumerate(vocab)}


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    with open(d / "vocab.json", "w") as f:
        json.dump(canonical_vocab(MERGES), f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in MERGES))
    # ImageBind-style gz: first line header, then merges
    with gzip.open(d / "bpe_simple_vocab_16e6.txt.gz", "wt") as f:
        f.write("header\n")
        f.write("\n".join(" ".join(m) for m in MERGES))
    return str(d)


TEXTS = ["hello world", "Dog Barking", "hello, world!!",
         "a   dog  barking 123", "unmergedxyz", "it's a dog's world"]


def test_matches_transformers_cliptokenizer(tok_dir):
    transformers = pytest.importorskip("transformers")
    hf = transformers.CLIPTokenizer(
        os.path.join(tok_dir, "vocab.json"),
        os.path.join(tok_dir, "merges.txt"))
    ours = ClipBPETokenizer.from_pretrained(tok_dir)
    for text in TEXTS:
        ref = hf(text)["input_ids"]
        got = ours([text], context_length=77)[0]
        assert got[:len(ref)].tolist() == ref, (text, ref)
        # SD path: eot padding must equal transformers' max_length padding
        ref_pad = hf(text, padding="max_length", max_length=77,
                     truncation=True)["input_ids"]
        got_pad = ours([text], context_length=77, pad="eot")[0]
        assert got_pad.tolist() == ref_pad, (text,)


def test_gz_constructor_equivalent(tok_dir):
    a = ClipBPETokenizer.from_pretrained(tok_dir)          # vocab+merges
    b = ClipBPETokenizer.from_clip_bpe_gz(
        os.path.join(tok_dir, "bpe_simple_vocab_16e6.txt.gz"))
    for text in TEXTS:
        np.testing.assert_array_equal(a([text]), b([text]))


def test_padding_truncation_and_eos_argmax(tok_dir):
    tok = ClipBPETokenizer.from_pretrained(tok_dir)
    ids = tok(["hello world"], context_length=8)[0]
    eot = tok.encoder["<|endoftext|>"]
    sot = tok.encoder["<|startoftext|>"]
    assert ids[0] == sot
    assert eot in ids
    # zero padding after EOT; argmax lands on the (first) EOT
    assert ids[np.argmax(ids)] == eot
    tail = ids[list(ids).index(eot) + 1:]
    assert (tail == 0).all()
    # long text truncates but keeps EOT last
    long_ids = tok(["hello " * 50], context_length=10)[0]
    assert long_ids[-1] == eot and len(long_ids) == 10
