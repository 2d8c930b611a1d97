"""Derive the pinned DEFAULT_BPE_MERGES table for operators/text.py.

Classic BPE learning (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") over the driver
fixture's documents at sf0.01: lowercase whitespace tokens, split to
characters, repeatedly merge the most frequent adjacent symbol pair
(count ties broken lexicographically so the table is DETERMINISTIC in
the corpus).

Only alphanumeric symbols participate ([a-z0-9]): merged symbols stay
alphanumeric, so every merge rule can be applied as a LITERAL regex
pattern in both Spark (Java regex) and DuckDB (RE2) with no escaping
differences — the engine-portability contract of
operators/text.py:bpe_token_count. Punctuation characters remain
single symbols forever (counted, never merged).

Run: python tools/train_bpe.py [n_merges] — prints the Python literal
to paste as DEFAULT_BPE_MERGES. The committed table in text.py was
produced by this script at n_merges=48 on /root/testdata/sf0.01.
"""

from __future__ import annotations

import collections
import re
import sys


def train(words: collections.Counter, n_merges: int) -> list[tuple[str, str]]:
    alnum = re.compile(r"^[a-z0-9]+$")
    vocab = {tuple(w): c for w, c in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                if alnum.match(a) and alnum.match(b):
                    pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], (-len(p[0] + p[1]),), p))
        # deterministic: highest count, then shortest merged symbol,
        # then lexicographic
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    import pyarrow.parquet as pq

    table = pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["text"])
    words: collections.Counter = collections.Counter()
    for chunk in table.column("text").chunks:
        for text in chunk.to_pylist():
            if text:
                for w in text.lower().split():
                    words[w] += 1
    merges = train(words, n_merges)
    print("DEFAULT_BPE_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")


if __name__ == "__main__":
    main()
