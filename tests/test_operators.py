"""Unit tests for sources, query ops, functions, and training-data
operators (the oracle-vs-Spark equivalence is checked separately by the
driver contract; these pin the operator semantics on tiny inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from netbase_spark.relations import INSTANCE, MEMBER, SEE, SYNONYM, TYPE


def test_n3_parse_resolution(spark):
    from netbase_spark.sources.n3 import parse_nt_lines

    lines = spark.createDataFrame(
        [
            ("<http://www.wikidata.org/entity/Q42> <http://www.wikidata.org/prop/P31> <http://www.wikidata.org/entity/Q5> .",),
            ('<http://ex.org/Berlin> <http://ex.org/label> "Berlin City"@en .',),
            ("<http://ex.org/A_B> <http://ex.org/x#isPart> <http://ex.org/C_D> .",),
            ("garbage line",),
            ('<http://ex.org/Q1> <http://www.wikidata.org/prop/P646> "/m/0x" .',),
        ],
        "value string",
    )
    rows = {tuple(r) for r in parse_nt_lines(lines).collect()}
    assert rows == {
        ("Q42", "P31", "Q5"),
        ("Berlin", "label", "Berlin City"),
        ("A B", "isPart", "C D"),
    }


def test_melt_typed(spark):
    from netbase_spark.sources.tabular import melt

    df = spark.createDataFrame([(1, "x", 2.5), (2, None, 7.0)], "id int, a string, b double")
    out = melt(df, F.concat(F.lit("R"), F.col("id")), ["a", "b"])
    rows = {(r.subj, r.pred, r.obj_text, r.obj_num) for r in out.collect()}
    assert ("R1", "a", "x", None) in rows
    assert ("R1", "b", "2.5", 2.5) in rows
    assert ("R2", "b", "7.0", 7.0) in rows
    assert len(rows) == 3  # null cell dropped


def test_import_facts_member_heuristic(spark):
    from netbase_spark.sources.tabular import import_facts

    pairs = spark.createDataFrame(
        [("hand", "left hand"), ("hand", "foot")], "s string, o string"
    )
    rows = {(r.subj, r.rel, r.obj) for r in import_facts(pairs, SEE).collect()}
    assert ("hand", MEMBER, "left hand") in rows
    assert ("hand", SEE, "foot") in rows


def test_prefix_and_category_aliases(spark):
    from netbase_spark.operators.gazetteer import (
        category_alias_rows,
        prefix_alias_rows,
    )

    labels = spark.createDataFrame(
        [("K1", "Apple iPhone 12 Pro Max"), ("K2", "Shoes")],
        "key string, label string",
    )
    pre = {(r.name_norm, r.key) for r in prefix_alias_rows(labels, k=2).collect()}
    assert pre == {("apple iphone", "K1")}  # short labels skipped
    cats = spark.createDataFrame(
        [("K3", "Electronics/Phones/Accessories")], "key string, label string"
    )
    got = {r.name_norm for r in category_alias_rows(cats).collect()}
    assert got == {"electronics", "phones", "accessories"}


def test_find_statements_inverse_and_symmetric(spark):
    from netbase_spark.operators.query_ops import find_statements

    triples = spark.createDataFrame(
        [
            ("a", INSTANCE, "animal"),
            ("plant", TYPE, "fern"),   # reverse form of (fern, Instance, plant)
            ("big", SYNONYM, "large"),
        ],
        "subj string, rel int, obj string",
    )
    inst = {tuple(r) for r in find_statements(triples, rel=INSTANCE).collect()}
    assert inst == {("a", INSTANCE, "animal"), ("fern", INSTANCE, "plant")}
    syn = {tuple(r) for r in find_statements(triples, rel=SYNONYM, subj="large").collect()}
    assert syn == {("large", SYNONYM, "big")}


def test_filter_lang(spark):
    from netbase_spark.functions.filter_lang import apply_filter

    df = spark.createDataFrame(
        [("Berlin", 3600000.0), ("kiel", 250000.0), ("Munich_X", 1500000.0)],
        "name string, population double",
    )
    assert apply_filter(df, "population>1000000").count() == 2
    assert apply_filter(df, "name=munich x").count() == 1  # case/underscore-insensitive
    assert apply_filter(df, "population~250000").count() == 1
    assert apply_filter(df, "population>1000000, not name=berlin").count() == 1
    assert apply_filter(df, "population<300000 or name=Berlin").count() == 2


def test_typed_literal_units(spark):
    from netbase_spark.functions.values import parse_typed_literal

    df = spark.createDataFrame(
        [('"4.5"^^<km>',), ('"2020-01-02"^^<http://www.w3.org/2001/XMLSchema#date>',), ('"hello"@de',), ("42",)],
        "lit string",
    )
    rows = {r.lit: r.v.asDict() for r in df.select("lit", parse_typed_literal(F.col("lit")).alias("v")).collect()}
    assert rows['"4.5"^^<km>']["num"] == 4500.0
    assert rows['"4.5"^^<km>']["unit"] == "m"
    assert rows['"2020-01-02"^^<http://www.w3.org/2001/XMLSchema#date>']["kind"] == "date"
    assert rows['"hello"@de']["lang"] == "de"
    assert rows["42"]["num"] == 42.0  # bare numeric autoparse


def test_bfs_shortest_path(spark):
    from netbase_spark.operators.query_ops import shortest_path_length

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")], "src string, dst string"
    )
    assert shortest_path_length(edges, "a", "d") == 2
    assert shortest_path_length(edges, "a", "a") == 0
    assert shortest_path_length(edges, "d", "a") is None


def test_class_of_priority(spark):
    from netbase_spark.operators.query_ops import class_of
    from netbase_spark.relations import SUPER_CLASS

    nodes = spark.createDataFrame([("x",), ("y",), ("z",)], "node string")
    triples = spark.createDataFrame(
        [("x", TYPE, "t1"), ("x", SUPER_CLASS, "s1"), ("y", TYPE, "t2")],
        "subj string, rel int, obj string",
    )
    got = dict(class_of(nodes, triples, [SUPER_CLASS, TYPE]).collect())
    assert got == {"x": "s1", "y": "t2", "z": "Entity"}


def test_simhash_similar_docs_close(spark):
    from netbase_spark.operators.dedup import simhash, simhash_candidates

    base = (
        "the quick brown fox jumps over the lazy dog near the river bank "
        "while herons wade through shallow water and swallows circle the "
        "old stone mill whose wheel turns slowly in the current grinding "
        "grain for the village bakery every single morning without fail"
    )
    docs = spark.createDataFrame(
        [
            (1, base + " today"),
            (2, base + " tonight"),
            (3, "completely different words about spark catalyst optimizer and shuffle plans"),
        ],
        "doc_id long, text string",
    )
    sigs = {
        r.doc_id: (r.simhash_hi << 32) | r.simhash_lo
        for r in simhash(docs).collect()
    }
    ham = bin(sigs[1] ^ sigs[2]).count("1")
    ham_far = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham < ham_far
    cands = {(r.a, r.b) for r in simhash_candidates(simhash(docs)).collect()}
    assert (1, 2) in cands


def test_simhash_hot_band_bucket_cap(spark):
    """Skew guard: one hot band value (many near-identical docs) is
    dropped once the bucket exceeds the cap; the remaining pairs stay."""
    from netbase_spark.operators.dedup import (
        simhash,
        simhash_candidates,
        simhash_oversized_buckets,
    )

    # 30 near-identical docs (hot buckets) + 2 similar odd ones
    rows = [
        (i, "boilerplate header the same every time on every page footer x")
        for i in range(30)
    ]
    rows += [
        (100, "rare unique snowflake document about turbine bearings alpha"),
        (101, "rare unique snowflake document about turbine bearings beta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = simhash(docs)
    uncapped = {(r.a, r.b) for r in simhash_candidates(sigs, bucket_cap=None).collect()}
    capped = {(r.a, r.b) for r in simhash_candidates(sigs, bucket_cap=10).collect()}
    # the 30-doc clique (435 pairs/band) is gone, the rare pair survives
    assert (0, 1) in uncapped and (0, 1) not in capped
    assert (100, 101) in capped
    dropped = simhash_oversized_buckets(sigs, bucket_cap=10).collect()
    assert len(dropped) >= 1 and all(r.n == 30 for r in dropped)


def test_jaccard_hot_shingle_cap(spark):
    """The n-gram-Jaccard twin of the simhash bucket cap (round-2
    verdict #3): a viral shingle shared by many docs is stopword-dropped
    from the self-join AND the set sizes; rare shingles are untouched;
    drops are reported by hot_shingles."""
    from netbase_spark.operators.dedup import cap_hot_shingles, hot_shingles

    rows = [(i, "viral quote here") for i in range(20)]
    rows += [(100, "rare one alpha"), (101, "rare one alpha")]
    sh = spark.createDataFrame(rows, "doc_id long, shingle string")
    capped = {(r.doc_id, r.shingle) for r in cap_hot_shingles(sh, 10).collect()}
    assert capped == {(100, "rare one alpha"), (101, "rare one alpha")}
    dropped = hot_shingles(sh, 10).collect()
    assert [(r.shingle, r.n) for r in dropped] == [("viral quote here", 20)]
    # cap=None / generous cap are pass-throughs
    assert cap_hot_shingles(sh, None).count() == 22
    assert cap_hot_shingles(sh, 20).count() == 22


def test_media_neardup_end_to_end(spark):
    """Media near-dup (round-2 verdict #9): phash-analog fingerprints
    feed the EXISTING simhash-band candidate machinery and CC/survivor
    selection unchanged.  Same-content items (same ref -> same fake
    decode fp) pair at hamming 0 and cluster; distinct-content items
    stay singletons."""
    from netbase_spark.operators.dedup import near_dup_clusters
    from netbase_spark.operators.media import decode_media, media_neardup_pairs

    rows = [
        ("1", "image", "commons/aa.jpg"),
        ("2", "image", "commons/aa.jpg"),  # dup of 1
        ("3", "image", "commons/aa.jpg"),  # dup of 1
        ("4", "image", "commons/bb.jpg"),
        ("5", "image", "commons/bb.jpg"),  # dup of 4
        ("6", "image", "commons/cc.jpg"),  # unique
    ]
    media = spark.createDataFrame(
        rows, "doc_id string, kind string, media_ref string"
    )
    feats = decode_media(media)
    pairs = media_neardup_pairs(feats, max_hamming=0)
    got_pairs = {(r.a, r.b) for r in pairs.collect()}
    assert got_pairs == {("1", "2"), ("1", "3"), ("2", "3"), ("4", "5")}
    assert all(r.hamming == 0 for r in pairs.collect())
    # reuse the generic survivor selection: quality = doc_id desc proxy
    docs = spark.createDataFrame(
        [(str(i), i) for i in range(1, 7)], "doc_id string, n_chars long"
    )
    clusters = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in near_dup_clusters(docs, pairs.select("a", "b")).collect()
    }
    assert clusters == {
        ("1", "1", 0), ("2", "1", 0), ("3", "1", 1),  # best quality=3
        ("4", "4", 0), ("5", "4", 1),
        ("6", "6", 1),
    }


def test_cosine_neardup_bucketed_exact_integer_reference(spark):
    """exact=True must reproduce a pure-Python integer fixed-point
    reference bit-for-bit: e4-quantized components, integer SRP sign
    bits, sim_e4 = isqrt((1e8 dot^2) div (na nb)).  No float summation
    anywhere, so no BLAS-order flake (round-2 ADVICE, medium)."""
    import math
    import random

    import pytest as _pytest

    from netbase_spark.operators.dedup import (
        _plane_weights_int,
        cosine_neardup_bucketed,
    )

    rng = random.Random(5)
    dims, n = 16, 40
    vecs = {
        i: [rng.uniform(-0.6, 0.6) for _ in range(dims)] for i in range(n)
    }
    # a couple of near-duplicate pairs + one zero vector
    vecs[100] = list(vecs[0])
    vecs[101] = [x * 1.001 for x in vecs[1]]
    vecs[102] = [0.0] * dims
    rows = [(i, [float(x) for x in v]) for i, v in sorted(vecs.items())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    w = _plane_weights_int(4, dims)
    iv = {
        i: [int(math.floor(x * 10000)) for x in v] for i, v in vecs.items()
    }
    bucket = {
        i: sum(
            (1 << j)
            if sum(iv[i][d] * int(w[d, j]) for d in range(dims)) >= 0
            else 0
            for j in range(4)
        )
        for i in iv
    }
    thr = 4500
    want = set()
    for a in sorted(iv):
        for b in sorted(iv):
            if a < b and bucket[a] == bucket[b]:
                dot = sum(x * y for x, y in zip(iv[a], iv[b]))
                na = sum(x * x for x in iv[a])
                nb = sum(x * x for x in iv[b])
                if dot > 0 and na and nb:
                    s = math.isqrt((100_000_000 * dot * dot) // (na * nb))
                    if s >= thr:
                        want.add((a, b, s))
    got = {
        (r.a, r.b, r.sim_e4)
        for r in cosine_neardup_bucketed(
            emb, threshold_e4=thr, n_planes=4, exact=True
        ).collect()
    }
    assert got == want
    assert any(s >= 9990 for (_a, _b, s) in want), "near-dup pair missing"
    # exact mode refuses a non-positive threshold (dot>0 precondition)
    with _pytest.raises(ValueError):
        cosine_neardup_bucketed(emb, threshold_e4=0, exact=True)


def test_minhash_params_and_cap(spark):
    from netbase_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    sh_rows = []
    for d in (1, 2):  # two docs sharing most shingles
        for s in ("a b c", "b c d", "c d e", "d e f"):
            sh_rows.append((d, s))
    sh_rows.append((2, "x y z"))
    sh_rows.append((3, "p q r"))  # unrelated doc
    sh = spark.createDataFrame(sh_rows, "doc_id long, shingle string")
    sigs = minhash_signatures(sh, n_hashes=8)
    assert len(sigs.columns) == 9  # doc_id + s0..s7
    pairs = {(r.a, r.b) for r in minhash_lsh_pairs(sigs, bands=2, rows_per_band=4).collect()}
    assert (1, 2) in pairs and all(3 not in p for p in pairs)


def test_cosine_tiling_equals_single_tile(spark):
    """Tiled broadcast path == single-collect path, ids stay native
    dtype (string ids exercised)."""
    from netbase_spark.operators.dedup import cosine_neardup_pairs

    import random

    rng = random.Random(7)
    rows = [
        (f"v{i:03d}", [rng.uniform(-1, 1) for _ in range(8)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    one = {
        (r.a, r.b, r.sim_e4)
        for r in cosine_neardup_pairs(emb, 6000, tile_rows=10**9).collect()
    }
    tiled = {
        (r.a, r.b, r.sim_e4)
        for r in cosine_neardup_pairs(emb, 6000, tile_rows=50).collect()
    }
    assert one == tiled and len(one) > 0


def test_ann_weight_matrix_matches_md5_reference():
    """The hoisted plane-weight matrix must equal the md5-per-element
    definition the SQL oracle uses."""
    import hashlib

    from netbase_spark.operators.dedup import _plane_weights

    w = _plane_weights(3, 5)
    for j in range(3):
        for i in range(5):
            h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:6], 16)
            assert w[i, j] == h / float(1 << 24) - 0.5


def test_media_decode_schema(spark):
    from netbase_spark.operators.media import decode_media, media_spans
    from netbase_spark.data.synth import docs_df

    docs = docs_df(spark, 40, seed=7)
    media = media_spans(docs)
    feats = decode_media(media.select("doc_id", "kind", "media_ref"))
    rows = feats.collect()
    assert len(rows) > 0
    for r in rows:
        if r.kind == "image":
            assert r.width is not None and 0 <= r.width < 4096
            assert r.duration_ms is None
        else:
            assert r.duration_ms is not None
        assert len(r.content_fp) == 32


def test_ann_bucketed_subset_of_bruteforce_order(spark):
    from netbase_spark.operators.dedup import ann_lsh_buckets

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    ).limit(100)
    b = ann_lsh_buckets(emb, n_planes=4).collect()
    assert len(b) == 100
    assert all(0 <= r.bucket < 16 for r in b)


def test_sessionize_gap(spark):
    import datetime as dt

    from netbase_spark.operators.events import sessionize

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t0, 1.0),
            (1, t0 + dt.timedelta(minutes=10), 2.0),
            (1, t0 + dt.timedelta(minutes=50), 4.0),   # > 30 min gap -> new session
            (2, t0, 8.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = sessionize(ev, gap_minutes=30).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2
    assert len(per_user[2]) == 1
    sess1 = sorted(per_user[1], key=lambda r: r.session_start)
    assert sess1[0].n_events == 2 and sess1[0].sum_value == 3.0
    assert sess1[1].n_events == 1 and sess1[1].sum_value == 4.0


def test_pagerank_hand_computed(spark):
    from netbase_spark.operators.materialize import pagerank

    # a -> c, b -> c, c -> a : hand-unrolled 2 iterations, d=85%,
    # in the SAME e12 integer fixed-point arithmetic as the operator
    # (every division floors — bit-deterministic, see pagerank's doc)
    edges = spark.createDataFrame(
        [("a", "c"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    got = {r.node: r.pr_e6 for r in pagerank(edges, iters=2).collect()}

    e12 = 10**12
    n = 3
    base = (e12 * 15 // 100) // n
    pr = {k: e12 // n for k in "abc"}
    for _ in range(2):
        nxt = {
            "a": base + 85 * (pr["c"] // 1) // 100,   # c's only edge
            "b": base,                                 # no in-edges
            "c": base + 85 * (pr["a"] // 1 + pr["b"] // 1) // 100,
        }
        pr = nxt
    assert got == {k: v // 10**6 for k, v in pr.items()}
    # salience discounts 'b' (no in-edges) below the cycle members
    assert got["a"] > got["b"] and got["c"] > got["b"]


def test_pagerank_mass_and_dangling(spark):
    from netbase_spark.operators.materialize import pagerank

    # star onto a dangling hub: hub collects, leaves tie at base rank
    edges = spark.createDataFrame(
        [(f"l{i}", "hub") for i in range(5)], "src string, dst string"
    )
    got = {r.node: r.pr_e6 for r in pagerank(edges, iters=2).collect()}
    leaves = {v for k, v in got.items() if k != "hub"}
    assert len(leaves) == 1  # all leaves identical
    assert got["hub"] > leaves.pop()


def test_nt_unicode_unescape(spark):
    from netbase_spark.sources.n3 import parse_nt_lines, u8_unescape_py

    # BMP escape, surrogate pair (astral emoji), and a clean line
    lines = spark.createDataFrame(
        [
            ('<http://x/Schloss> <http://x/label> "Schlo\\u00df"@de .',),
            ('<http://x/E> <http://x/label> "hi \\uD83D\\uDE00" .',),
            ('<http://x/A> <http://x/label> "plain" .',),
            # malformed: UNPAIRED high surrogate — must degrade to U+FFFD
            # per-row, not crash the whole Arrow batch on UTF-8 encode
            ('<http://x/Bad> <http://x/label> "x \\uD800 y" .',),
        ],
        "value string",
    )
    out = {
        r.subj: r.obj
        for r in parse_nt_lines(lines, unescape_unicode=True).collect()
    }
    assert out["Schloss"] == "Schloß"
    assert out["E"] == "hi \U0001F600"
    assert out["A"] == "plain"
    assert out["Bad"] == "x � y"
    # the pure-python twin agrees (used directly by non-Spark callers)
    assert u8_unescape_py("Schlo\\u00df") == "Schloß"
    assert u8_unescape_py("a\\uDC00b") == "a�b"
    # NT parsing must not import pandas at module load (lazy-import rule)
    import subprocess
    import sys

    probe = (
        "import sys; import netbase_spark.sources.n3; "
        "sys.exit(1 if 'pandas' in sys.modules else 0)"
    )
    assert subprocess.run([sys.executable, "-c", probe]).returncode == 0


def test_new_operators_empty_inputs(spark):
    """Empty-input schemas: every round-2-final operator returns an
    empty frame with its documented schema instead of raising."""
    from netbase_spark.operators.dedup import cosine_neardup_bucketed
    from netbase_spark.operators.materialize import pagerank
    from netbase_spark.operators.textstats import (
        pii_scrub,
        shard_pack,
        strip_boilerplate,
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert pii_scrub(docs).count() == 0
    assert strip_boilerplate(docs).count() == 0
    assert unigram_logprob(docs).count() == 0
    assert shard_pack(docs).count() == 0
    edges = spark.createDataFrame([], "src string, dst string")
    pr = pagerank(edges)
    assert pr.count() == 0 and pr.columns == ["node", "pr_e6"]
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert cosine_neardup_bucketed(emb, 9000).count() == 0


def test_caption_candidates_nearest_and_tiebreak(spark):
    from netbase_spark.operators.media import caption_candidates

    spans = spark.createDataFrame(
        [
            # doc 1: media at 50; text at 0 (gap 50) and 60 (gap 10)
            (1, "text", "far away", None, 0),
            (1, "text", "the caption", None, 60),
            (1, "image", "", "m1.jpg", 50),
            # doc 2: equidistant texts (gap 20 both) -> preceding wins
            (2, "text", "before", None, 30),
            (2, "text", "after", None, 70),
            (2, "image", "", "m2.jpg", 50),
            # doc 3: media only -> no pair (no text span)
            (3, "image", "", "m3.jpg", 10),
        ],
        "doc_id long, kind string, span_text string, media_ref string, offset int",
    )
    got = {r.media_ref: (r.caption, r.gap) for r in
           caption_candidates(spans).collect()}
    assert got["m1.jpg"] == ("the caption", 10)
    assert got["m2.jpg"] == ("before", 20)
    assert "m3.jpg" not in got


def test_pagerank_resume_warm_start(spark):
    """Incremental PageRank (round-5): warm-starting from a previous
    snapshot's ranks converges to the same fixed point in FEWER rounds
    than a cold start, and one warm round from a one-round init is
    bit-equal to two cold rounds (the oracle-able composition)."""
    from netbase_spark.operators.materialize import pagerank, pagerank_resume

    def ring_plus_star(extra):
        rows = [(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)]
        rows += [(f"l{i}", "n0") for i in range(extra)]
        return spark.createDataFrame(rows, "src string, dst string")

    empty_prev = spark.createDataFrame([], "node string, pr_e12 long")
    e0 = ring_plus_star(5)

    # composition identity: cold(2) == resume(1, init=cold-resume(1))
    r1, _ = pagerank_resume(e0, empty_prev, iters=1)
    r2, _ = pagerank_resume(e0, r1, iters=1)
    want = {r.node: r.pr_e6 for r in pagerank(e0, iters=2).collect()}
    assert {r.node: r.pr_e6 for r in r2.collect()} == want

    # converge cold on the original graph, then mutate: 3 new leaves.
    # damping 50% keeps the test fast (delta halves per round -> ~25
    # rounds to tol 1e4 vs ~95 at 85%); the contraction argument is
    # damping-independent
    kw = dict(tol_e12=10_000, max_iters=60, damping_pct=50)
    cold0, rounds_cold0 = pagerank_resume(e0, empty_prev, **kw)
    e1 = ring_plus_star(8)
    cold1, rounds_cold1 = pagerank_resume(e1, empty_prev, **kw)
    warm1, rounds_warm1 = pagerank_resume(e1, cold0, **kw)
    # same fixed point within the stopping residual: per-round delta
    # <= tol leaves each run up to ~tol*d/(1-d) from the true fixed
    # point, so the two can differ by ~10x tol; 1e6 e12-units = one
    # pr_e6 output grain
    c = {r.node: r.pr_e12 for r in cold1.collect()}
    w = {r.node: r.pr_e12 for r in warm1.collect()}
    assert set(c) == set(w)
    assert max(abs(c[k] - w[k]) for k in c) <= 1_000_000
    # the incremental win: warm restart needs fewer rounds
    assert rounds_warm1 < rounds_cold1
    # determinism: identical inputs -> identical output, bitwise
    again, _ = pagerank_resume(e1, cold0, **kw)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, warm1.collect()))
