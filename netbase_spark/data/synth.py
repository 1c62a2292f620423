"""Deterministic interleaved text+media document corpus.

Schema per BASELINE.json ``input_hint``:

    docs(doc_id: string,
         spans: array<struct<kind:string, text:string,
                             media_ref:string, offset:int>>)

Generation is a pure function of (seed, doc_id) so the pure-Python path
(used by the oracle tests) and the distributed Spark path (used by the
pipeline and the bench) produce byte-identical documents.  The Spark
path generates inside ``mapInPandas`` over ``spark.range`` — no driver
materialization, scales linearly with partitions (no Date.now/global
RNG; every row is independently seeded).
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

from netbase_spark.data.fixtures import FILLER_WORDS, mentionable_labels

SPAN_KINDS = ("text", "image", "audio", "video")

# Skewed-corpus mode (the north rule's hub-entity stress: Q5/owl:Thing-
# style objects that appear in a large fraction of documents, plus one
# viral boilerplate sentence shared verbatim across the corpus).  The
# hub label is a fixed gazetteer surface form; the boilerplate embeds a
# second label so its entity hubs too.  Rates are per-document
# Bernoulli draws from the doc's own deterministic rng, so corpora stay
# a pure function of (seed, doc_id, skew).
SKEW_HUB_RATE = 0.30
SKEW_BOILERPLATE_RATE = 0.30


def _skew_labels(labels: list[str]) -> tuple[str, str]:
    ordered = sorted(labels)
    return ordered[0], ordered[-1]


def _doc_rng(seed: int, doc_id: int) -> random.Random:
    return random.Random((seed << 40) ^ (doc_id * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFF))


def gen_doc(
    doc_id: int, seed: int = 42, labels: list[str] | None = None,
    skew: bool = False,
) -> dict:
    """One interleaved document. spans offsets are monotone char offsets.
    ``skew=True`` appends the hub-entity span to ~30% of docs and the
    viral boilerplate sentence to ~30% (independently) — the skewed
    twin corpus for straggler/scaling stress runs."""
    if labels is None:
        labels = mentionable_labels()
    rng = _doc_rng(seed, doc_id)
    n_spans = rng.randint(3, 8)
    spans = []
    offset = 0
    for si in range(n_spans):
        is_text = si == 0 or rng.random() < 0.75
        if is_text:
            n_tok = rng.randint(6, 24)
            toks: list[str] = []
            while len(toks) < n_tok:
                if rng.random() < 0.35:
                    toks.extend(rng.choice(labels).split(" "))
                else:
                    toks.append(rng.choice(FILLER_WORDS))
            text = " ".join(toks[:n_tok])
            spans.append(
                {"kind": "text", "text": text, "media_ref": None, "offset": offset}
            )
            offset += len(text) + 1
        else:
            kind = SPAN_KINDS[1 + rng.randint(0, 2)]
            h = hashlib.md5(f"{seed}:{doc_id}:{si}".encode()).hexdigest()
            caption = rng.choice(labels) if rng.random() < 0.5 else ""
            ref = f"commons/{h[:2]}/{h}.{ {'image':'jpg','audio':'ogg','video':'webm'}[kind] }"
            spans.append(
                {"kind": kind, "text": caption, "media_ref": ref, "offset": offset}
            )
            offset += 1
    if skew:
        hub, boiler_label = _skew_labels(labels)
        if rng.random() < SKEW_HUB_RATE:
            text = f"breaking news about {hub} today"
            spans.append(
                {"kind": "text", "text": text, "media_ref": None,
                 "offset": offset}
            )
            offset += len(text) + 1
        if rng.random() < SKEW_BOILERPLATE_RATE:
            text = (
                "subscribe to our newsletter for daily updates about "
                f"{boiler_label} and more"
            )
            spans.append(
                {"kind": "text", "text": text, "media_ref": None,
                 "offset": offset}
            )
            offset += len(text) + 1
    return {"doc_id": str(doc_id), "spans": spans}


def docs_local(n_docs: int, seed: int = 42, skew: bool = False) -> list[dict]:
    labels = mentionable_labels()
    return [gen_doc(i, seed, labels, skew=skew) for i in range(n_docs)]


def docs_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None,
            skew: bool = False):
    """Distributed corpus as a DataFrame of the input_hint shape."""
    import pandas as pd

    from netbase_spark.schemas import DOCS_SCHEMA

    labels = mentionable_labels()  # small; serialized into the UDF closure

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            docs = [gen_doc(int(i), seed, labels, skew=skew) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "spans": [
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in d["spans"]
                        ]
                        for d in docs
                    ],
                }
            )

    rng_df = spark.range(n_docs)
    if partitions:
        rng_df = rng_df.repartition(partitions)
    return rng_df.mapInPandas(gen, schema=DOCS_SCHEMA)
