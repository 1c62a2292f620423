#!/usr/bin/env python
"""Gazetteer scale probe (round-2 verdict items 4+8): at 10^5..10^6
aliases, measure for BOTH scan automata (hash-set window probe vs
token-trie goto walk):

- driver build time of the broadcast structures
- serialized broadcast payload bytes (pickle — what sc.broadcast ships)
- single-thread scan throughput (docs/s, tokens/s) over a synthetic
  corpus with a realistic hit rate

Pure driver-side (no Spark session): the scan closure's per-batch work
is exactly these functions, so single-thread numbers compare the
automata without sandbox scheduler noise.  Results feed the
BENCH/BASELINE.md table and the broadcast-cap defaults in
plans/broadcast_gate.py.

Usage: python scripts/probe_gazetteer_scale.py [n_aliases ...]
"""

from __future__ import annotations

import json
import os
import pickle
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_aliases(n: int, rng: random.Random) -> list[str]:
    """n distinct normalized alias names, 1-3 tokens, Zipf-ish shared
    token pool (WikiData labels share surname/place tokens heavily)."""
    pool = [f"tok{i}" for i in range(max(1000, n // 20))]
    out: set[str] = set()
    while len(out) < n:
        k = rng.choice((1, 1, 2, 2, 2, 3))
        out.add(" ".join(rng.choice(pool) for _ in range(k)))
    return sorted(out)


def synth_docs(n_docs: int, aliases: list[str], rng: random.Random):
    """Docs of ~80 tokens; ~10% alias-derived tokens so the scan sees
    realistic hit/miss traffic."""
    vocab = [f"word{i}" for i in range(5000)]
    docs = []
    for _ in range(n_docs):
        words: list[str] = []
        while len(words) < 80:
            if rng.random() < 0.10:
                words.extend(rng.choice(aliases).split(" "))
            else:
                words.append(rng.choice(vocab))
        docs.append(" ".join(words[:80]))
    return docs


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [100_000, 1_000_000]
    from netbase_spark.oracle.rules import (
        build_token_trie,
        filter_candidates,
        find_mentions,
        find_mentions_trie,
        first_token_index,
        max_alias_word_count,
        prefix2_index,
    )

    rng = random.Random(42)
    results = []
    for n in sizes:
        aliases = synth_aliases(n, rng)
        docs = synth_docs(300, aliases, rng)
        n_tokens = sum(len(d.split(" ")) for d in docs)
        blacklist: frozenset[str] = frozenset()

        # --- probe structures
        t0 = time.monotonic()
        aset = frozenset(aliases)
        ftoks = first_token_index(aset)
        maxw = max_alias_word_count(aset)
        pfx2 = prefix2_index(aset)
        probe_build = time.monotonic() - t0
        probe_bytes = len(pickle.dumps((aset, ftoks, blacklist, maxw, pfx2)))

        # --- trie structures
        t0 = time.monotonic()
        trie = build_token_trie(aliases)
        trie_build = time.monotonic() - t0
        trie_bytes = len(pickle.dumps((trie, blacklist, maxw)))

        # --- scan throughput (identical outputs asserted per doc)
        t0 = time.monotonic()
        probe_out = [
            filter_candidates(
                find_mentions(
                    d, aset, blacklist, False,
                    first_tokens=ftoks, max_span_words=maxw, prefix2=pfx2,
                )
            )
            for d in docs
        ]
        probe_scan = time.monotonic() - t0
        t0 = time.monotonic()
        trie_out = [
            filter_candidates(
                find_mentions_trie(d, trie, blacklist, False, max_span_words=maxw)
            )
            for d in docs
        ]
        trie_scan = time.monotonic() - t0
        assert probe_out == trie_out, "automata disagree"

        row = {
            "aliases": n,
            "probe": {
                "build_s": round(probe_build, 2),
                "bytes": probe_bytes,
                "docs_per_s": round(len(docs) / probe_scan, 1),
                "tokens_per_s": round(n_tokens / probe_scan, 0),
            },
            "trie": {
                "build_s": round(trie_build, 2),
                "bytes": trie_bytes,
                "docs_per_s": round(len(docs) / trie_scan, 1),
                "tokens_per_s": round(n_tokens / trie_scan, 0),
            },
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "BENCH", "gazetteer_scale_probe.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
