"""Task metrics: Levenshtein distance / WER (reference
``open_seq2seq/models/speech2text.py:51-97``), corpus BLEU
(``models/text2text.py:42-55``), classification accuracy
(``utils/metrics.py:8-25``), perplexity."""
from __future__ import annotations

import math
from typing import Iterable, List, Sequence



def levenshtein(a: Sequence, b: Sequence) -> int:
    """Edit distance between two sequences (tokens or chars)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(min(prev[j] + 1,          # deletion
                           cur[j - 1] + 1,       # insertion
                           prev[j - 1] + (ca != cb)))  # substitution
        prev = cur
    return prev[-1]


def word_error_rate(ref_words_total: int, edit_distance_total: int) -> float:
    """WER from accumulated edit distance over accumulated ref length."""
    if ref_words_total == 0:
        return float("inf") if edit_distance_total > 0 else 0.0
    return edit_distance_total / ref_words_total


def accuracy(correct: int, total: int) -> float:
    return correct / max(total, 1)


def perplexity(total_nll: float, total_tokens: int) -> float:
    return math.exp(total_nll / max(total_tokens, 1))


def _ngram_counts(tokens: List[str], n: int):
    from collections import Counter
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def corpus_bleu(references: Iterable[List[str]],
                hypotheses: Iterable[List[str]],
                max_n: int = 4,
                smooth: bool = False) -> float:
    """Corpus-level BLEU with uniform n-gram weights (the reference
    scores eval BLEU with nltk's corpus_bleu; this is a dependency-free
    equivalent with the same brevity penalty and clipping)."""
    clipped = [0] * max_n
    totals = [0] * max_n
    ref_len = 0
    hyp_len = 0
    for ref, hyp in zip(references, hypotheses):
        ref_len += len(ref)
        hyp_len += len(hyp)
        for n in range(1, max_n + 1):
            ref_counts = _ngram_counts(ref, n)
            hyp_counts = _ngram_counts(hyp, n)
            totals[n - 1] += max(len(hyp) - n + 1, 0)
            for gram, cnt in hyp_counts.items():
                clipped[n - 1] += min(cnt, ref_counts.get(gram, 0))
    if hyp_len == 0:
        return 0.0
    log_prec = 0.0
    for n in range(max_n):
        num, den = clipped[n], totals[n]
        if smooth:
            num, den = num + 1, den + 1
        if num == 0 or den == 0:
            return 0.0
        log_prec += math.log(num / den) / max_n
    bp = 1.0 if hyp_len > ref_len else math.exp(1.0 - ref_len / hyp_len)
    return bp * math.exp(log_prec)
