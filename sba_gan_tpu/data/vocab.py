"""Caption tokenization and vocabulary handling.

Capability parity with the reference text handling
(AttnGAN2/code/datasets.py:145-218 and datasets_bert.py:199-224):

* regex word tokenization (``\\w+`` on the lowercased caption, ascii-filtered)
  — the reference uses nltk's RegexpTokenizer(r'\\w+'), which is exactly
  ``re.findall(r'\\w+', ...)``;
* word-id vocabulary built over train+test captions with index 0 reserved
  for the ``<end>`` pad token, cached as ``captions.pickle`` in the exact
  reference pickle layout ``[train_caps, test_caps, ixtoword, wordtoix]``;
* a BERT wordpiece vocabulary variant (``captions_bert.pickle``), gated on a
  locally-available ``bert-base-uncased`` tokenizer (no network egress).
"""

from __future__ import annotations

import os
import pickle
import re
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np

_WORD_RE = re.compile(r"\w+")


def tokenize_caption(cap: str) -> List[str]:
    """Lowercase, split on word characters, drop non-ascii residue
    (reference load_captions, datasets.py:152-171)."""
    cap = cap.replace("��", " ")
    tokens = _WORD_RE.findall(cap.lower())
    out = []
    for t in tokens:
        t = t.encode("ascii", "ignore").decode("ascii")
        if t:
            out.append(t)
    return out


def build_dictionary(
    train_captions: Sequence[List[str]], test_captions: Sequence[List[str]]
) -> Tuple[List[List[int]], List[List[int]], Dict[int, str], Dict[str, int]]:
    """Word-id vocab over train+test (reference build_dictionary,
    datasets.py:180-218).  Preserves first-seen order; index 0 = '<end>'."""
    word_counts: Dict[str, float] = defaultdict(float)
    for sent in list(train_captions) + list(test_captions):
        for w in sent:
            word_counts[w] += 1

    ixtoword = {0: "<end>"}
    wordtoix = {"<end>": 0}
    for ix, w in enumerate(word_counts, start=1):
        wordtoix[w] = ix
        ixtoword[ix] = w

    def encode(caps):
        return [[wordtoix[w] for w in sent if w in wordtoix] for sent in caps]

    return encode(train_captions), encode(test_captions), ixtoword, wordtoix


def load_or_build_captions(
    data_dir: str,
    train_names: Sequence[str],
    test_names: Sequence[str],
    captions_per_image: int,
    cache_name: str = "captions.pickle",
):
    """Build or load the caption cache (reference load_text_data,
    datasets.py:220-250).  Cache layout matches the reference pickle so
    existing caches interoperate."""
    filepath = os.path.join(data_dir, cache_name)
    if os.path.isfile(filepath):
        with open(filepath, "rb") as f:
            train_captions, test_captions, ixtoword, wordtoix = pickle.load(f)[:4]
        return train_captions, test_captions, ixtoword, wordtoix

    train_raw = load_caption_files(data_dir, train_names, captions_per_image)
    test_raw = load_caption_files(data_dir, test_names, captions_per_image)
    train_captions, test_captions, ixtoword, wordtoix = build_dictionary(
        train_raw, test_raw
    )
    with open(filepath, "wb") as f:
        pickle.dump(
            [train_captions, test_captions, ixtoword, wordtoix], f, protocol=2
        )
    return train_captions, test_captions, ixtoword, wordtoix


def load_caption_files(
    data_dir: str, filenames: Sequence[str], captions_per_image: int
) -> List[List[str]]:
    """Read ``text/{name}.txt`` caption files, `captions_per_image` captions
    each (reference load_captions, datasets.py:145-178)."""
    all_captions = []
    for name in filenames:
        cap_path = os.path.join(data_dir, "text", f"{name}.txt")
        with open(cap_path, "r") as f:
            cnt = 0
            for cap in f.read().split("\n"):
                if len(cap) == 0:
                    continue
                tokens = tokenize_caption(cap)
                if not tokens:
                    continue
                all_captions.append(tokens)
                cnt += 1
                if cnt == captions_per_image:
                    break
            if cnt < captions_per_image:
                print(f"ERROR: the captions for {name} less than {cnt}")
    return all_captions


def pad_caption(
    sent: Sequence[int], words_num: int, rng: np.random.Generator
) -> Tuple[np.ndarray, int]:
    """Zero-pad to ``words_num``; if longer, keep a sorted random subsample
    (reference get_caption, datasets.py:279-297).  Returns (ids (words_num,),
    true_len)."""
    sent = np.asarray(sent, dtype=np.int64)
    x = np.zeros((words_num,), dtype=np.int64)
    n = len(sent)
    if n <= words_num:
        x[:n] = sent
        return x, n
    ix = rng.permutation(n)[:words_num]
    ix.sort()
    x[:] = sent[ix]
    return x, words_num


def encode_free_text(
    sentences: Sequence[str], wordtoix: Dict[str, int], words_num: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize free-text sentences to padded id arrays + lengths — the
    gen_example ingest (reference main.py:34-83) minus the sort-by-length
    (masks make sorting unnecessary here)."""
    ids, lens = [], []
    for sent in sentences:
        tokens = tokenize_caption(sent)
        rev = [wordtoix[t] for t in tokens if t in wordtoix]
        rev = rev[:words_num]
        row = np.zeros((words_num,), dtype=np.int64)
        row[: len(rev)] = rev
        ids.append(row)
        lens.append(max(len(rev), 1))
    return np.stack(ids), np.asarray(lens, dtype=np.int64)


def bert_vocab_encode(sentences, words_num: int):
    """BERT wordpiece encoding (reference datasets_bert.py:199-224), gated on
    a locally cached tokenizer.  Raises RuntimeError when the tokenizer is
    unavailable offline."""
    tok = get_bert_tokenizer()
    ids, lens = [], []
    for sent in sentences:
        enc = tok(sent, truncation=True, max_length=words_num)["input_ids"]
        row = np.zeros((words_num,), dtype=np.int64)
        row[: len(enc)] = enc
        ids.append(row)
        lens.append(len(enc))
    return np.stack(ids), np.asarray(lens, dtype=np.int64)


def get_bert_tokenizer():
    """Locally-cached bert-base-uncased tokenizer or RuntimeError (zero
    egress; reference datasets_bert.py:199-201 downloads it)."""
    try:
        from transformers import BertTokenizerFast

        return BertTokenizerFast.from_pretrained(
            "bert-base-uncased", local_files_only=True
        )
    except Exception as e:
        raise RuntimeError(
            "bert-base-uncased tokenizer is not available locally; "
            "provide a cached tokenizer or use the word-id vocabulary"
        ) from e


def load_or_build_captions_bert(
    data_dir: str,
    train_names,
    test_names,
    captions_per_image: int,
    cache_name: str = "captions_bert.pickle",
):
    """BERT-wordpiece caption cache (reference datasets_bert.py:199-229:
    wordtoix is the BERT vocab, cache file captions_bert.pickle).  The pickle
    layout matches the word-id variant so downstream code is shared."""
    import pickle as _pickle

    filepath = os.path.join(data_dir, cache_name)
    if os.path.isfile(filepath):
        with open(filepath, "rb") as f:
            train_captions, test_captions, ixtoword, wordtoix = _pickle.load(f)[:4]
        return train_captions, test_captions, ixtoword, wordtoix

    tok = get_bert_tokenizer()
    wordtoix = dict(tok.get_vocab())
    ixtoword = {i: w for w, i in wordtoix.items()}

    def encode(names):
        caps = load_caption_files(data_dir, names, captions_per_image)
        # wordpiece-encode the already-tokenized words (the reference
        # tokenizes the raw sentence; joining the regex tokens first is
        # equivalent for the \w+ vocabulary)
        return [
            tok(" ".join(sent), add_special_tokens=False)["input_ids"]
            for sent in caps
        ]

    train_captions = encode(train_names)
    test_captions = encode(test_names)
    with open(filepath, "wb") as f:
        _pickle.dump(
            [train_captions, test_captions, ixtoword, wordtoix], f, protocol=2
        )
    return train_captions, test_captions, ixtoword, wordtoix
