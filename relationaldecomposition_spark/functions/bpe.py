"""Byte-pair encoding (Sennrich et al. 2016, the public subword algorithm),
self-contained and deterministic: the merge table is learned at import time
from the embedded multilingual seed corpus (operators/text.py LATIN_SEEDS),
so every executor rebuilds the identical vocabulary from source — no model
files, no nondeterminism (ties in merge counts break lexicographically).

The reference repo has no tokenizer (beyond-reference pipeline surface);
this replaces the BPE-ish regex approximation for true subword counts.
Applied Arrow-batched via pandas UDF (operators/text.py bpe_token_counts) —
per-word encodings are memoized per executor, so the per-row cost is a dict
lookup for everything but first-seen words.
"""

from __future__ import annotations

from collections import Counter
from functools import lru_cache

END = "</w>"  # end-of-word marker (standard BPE word boundary)
N_MERGES = 256


def _word_freqs(corpus: str) -> Counter:
    return Counter(corpus.lower().split())


def train_bpe(corpus: str, n_merges: int = N_MERGES) -> list[tuple[str, str]]:
    """Learn `n_merges` merges by repeatedly joining the most frequent
    adjacent symbol pair. Deterministic: ties on count break by the pair's
    lexicographic order."""
    vocab = {tuple(w) + (END,): n for w, n in _word_freqs(corpus).items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, n in vocab.items():
            for i in range(len(word) - 1):
                pairs[word[i], word[i + 1]] += n
        if not pairs:
            break
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for word, n in vocab.items():
            out, i = [], 0
            while i < len(word):
                if (i < len(word) - 1
                        and word[i] == best[0] and word[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = n
        vocab = new_vocab
    return merges


class BPEncoder:
    """Greedy rank-order merge application (the standard inference loop)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.ranks = {pair: r for r, pair in enumerate(merges)}
        self._encode_cached = lru_cache(maxsize=65536)(self._encode)
        # separate count cache: count_tokens is the hot path (o20), and
        # caching the int skips the tuple fetch + len per word — measured
        # 1.66x on the sf1 corpus (round-6; steady-state cost is one dict
        # hit per word either way, this trims the constant)
        self._count_cached = lru_cache(maxsize=1 << 17)(
            lambda w: len(self._encode_cached(w)))

    def _encode(self, word: str) -> tuple[str, ...]:
        symbols = list(word) + [END]
        while len(symbols) > 1:
            best_rank, best_i = None, None
            for i in range(len(symbols) - 1):
                r = self.ranks.get((symbols[i], symbols[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            symbols[best_i:best_i + 2] = [symbols[best_i]
                                          + symbols[best_i + 1]]
        return tuple(symbols)

    def encode(self, word: str) -> tuple[str, ...]:
        return self._encode_cached(word)

    def count_tokens(self, text: str | None) -> int:
        if not text:
            return 0
        return sum(map(self._count_cached, text.lower().split()))


def default_encoder() -> BPEncoder:
    """Encoder over the merge table learned from the LATIN_SEEDS corpus.
    Built lazily per process (executors included) and cached."""
    global _DEFAULT
    if _DEFAULT is None:
        from ..operators.text import LATIN_SEEDS
        corpus = " ".join(seed for _, seed in LATIN_SEEDS)
        _DEFAULT = BPEncoder(train_bpe(corpus, N_MERGES))
    return _DEFAULT


_DEFAULT: BPEncoder | None = None
