"""CLIP BPE tokenizer — the FrozenCLIPEmbedder's text front-end.

Capability parity: the HF CLIPTokenizer the reference uses implicitly through
``ldm.modules.encoders.modules.FrozenCLIPEmbedder`` (yaml:109-110). Prompts in the
reference are three constants, so the embedding bank in models/clip_text.py covers
production; this module provides full arbitrary-prompt tokenization when a BPE vocab
asset is available (``bpe_simple_vocab_16e6.txt.gz``, the standard openai/CLIP
gzip — same algorithm: lowercase, whitespace/punct split regex, per-word BPE merge
loop with </w> end-of-word markers, byte-level unicode mapping).

No vocab asset ships in this zero-egress environment, so construction raises a
helpful error unless a path is supplied. `refresh_prompt_ids(tok.encode)` updates the
fixed-prompt bank once a real vocab is present.
"""
from __future__ import annotations

import gzip
import html
import os
import re
from functools import lru_cache
from typing import Dict, List, Tuple

SOT = 49406
EOT = 49407


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """openai/CLIP byte↔unicode table (reversible, no control chars)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(2**8):
        if b not in bs:
            bs.append(b)
            cs.append(2**8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return text.strip()


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    def __init__(self, bpe_path: str):
        if not os.path.exists(bpe_path):
            raise FileNotFoundError(
                f"CLIP BPE vocab not found at {bpe_path}. Supply the standard "
                "bpe_simple_vocab_16e6.txt.gz (ships with openai/CLIP); the fixed "
                "prompts used by MakeupDiffuse work without it via "
                "models/clip_text.py PROMPT_IDS / precompute_prompt_bank."
            )
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache: Dict[str, str] = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False  # \p classes need the regex module; fall back to ASCII classes
            else r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str, max_length: int = 77) -> List[int]:
        """→ [SOT, tokens..., EOT, EOT-padding] of length max_length (HF CLIP pads
        with EOT and truncates to 77 like FrozenCLIPEmbedder)."""
        text = whitespace_clean(basic_clean(text)).lower()
        ids: List[int] = [SOT]
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        ids = ids[: max_length - 1]
        ids.append(EOT)
        ids += [EOT] * (max_length - len(ids))
        return ids
