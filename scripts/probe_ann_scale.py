#!/usr/bin/env python
"""ANN / embedding-dedup scale evidence (round-5 ask #3): the bucketed
operators (ivf_* and cosine_neardup_bucketed) are designed to never go
all-pairs, but round 4 only measured them at toy sizes.  This probe
runs both at 10M synthetic embeddings and records:

- recall vs brute force on a query sample (IVF top-k) and vs planted
  near-duplicate pairs (SRP-bucketed near-dup, two similarity tiers);
- throughput of the gemm-assign / bucket+pairs stages;
- bucket-occupancy histograms (the hot-bucket cap audit at scale: how
  much does bucket_cap actually drop?).

Synthetic corpus (deterministic): a 1000-center Gaussian mixture in
d=32 (IVF's natural regime), with planted pairs — ids (2k, 2k+1) share
a base vector; tier A (k < pairs/2) gets sigma=0.01 noise
(cos ~ 0.999), tier B sigma=0.05 (cos ~ 0.99).

SRP recall context: a SINGLE 18-plane code keeps a cos=0.999 pair with
p ~ (1 - theta/pi)^18 ~ 0.77 and a cos=0.99 pair at ~ 0.44 — the
recorded recalls are the honest single-code numbers (banding multiplies
codes for recall; the minhash_lsh operator shows that pattern).

Writes BENCH/ann_scale_probe.json.

Usage: python scripts/probe_ann_scale.py [--rows 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 32
CENTERS = 1000
PAIRS = 2000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--n-cells", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=32)
    ap.add_argument("--n-planes", type=int, default=18)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from netbase_spark.operators.dedup import (
        ann_lsh_buckets,
        cosine_neardup_bucketed,
        ivf_assign,
        ivf_centroids,
    )
    from netbase_spark.session import get_spark

    spark = get_spark(
        app="probe_ann_scale",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=64,
        driver_memory="48g",
        extra={"spark.ui.showConsoleProgress": "false"},
    )
    rec = {"rows": args.rows, "dim": DIM, "centers": CENTERS,
           "planted_pairs_per_tier": PAIRS // 2}

    # --- deterministic corpus -------------------------------------------
    d = f"/tmp/probe_ann_scale_{args.rows}"
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        def gen(batches):
            import pandas as pd

            centers = np.random.default_rng(12345).normal(size=(CENTERS, DIM))

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["id"].to_numpy()
                # pair members (2k, 2k+1) share base_id=k -> identical
                # base vector; everyone else is their own base
                base_id = np.where(ids < 2 * PAIRS, ids // 2, ids)
                base_noise = np.empty((len(ids), DIM))
                for i, b in enumerate(base_id):
                    base_noise[i] = np.random.default_rng(int(b) + 99).normal(
                        size=DIM
                    )
                vec = centers[base_id % CENTERS] + 0.3 * base_noise
                # planted tiers: the odd member of a pair gets extra
                # noise — sigma 0.01 ~ cos 0.9999 (tier A), 0.03 ~
                # cos 0.9996 (tier B); both safely above the 0.99
                # threshold, so missed pairs measure BUCKETING loss
                odd = (ids < 2 * PAIRS) & (ids % 2 == 1)
                sigma = np.where(ids < PAIRS, 0.01, 0.03)
                extra = np.random.default_rng(int(ids.min()) + 1).normal(
                    size=(len(ids), DIM)
                )
                vec = np.where(
                    odd[:, None], vec + sigma[:, None] * extra, vec
                )
                yield pd.DataFrame(
                    {"vec_id": ids,
                     "embedding": [r.astype(np.float32).tolist() for r in vec]}
                )

        spark.range(0, args.rows, 1, 64).mapInPandas(
            gen, schema="vec_id long, embedding array<float>"
        ).write.mode("overwrite").parquet(d)
    emb = spark.read.parquet(d)

    # --- IVF: fit once, assign once, histogram, recall@k ----------------
    t0 = time.monotonic()
    cent = ivf_centroids(emb, n_cells=args.n_cells, iters=2)
    rec["ivf_fit_sec"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    assigned = ivf_assign(emb, cent).persist()
    n_assigned = assigned.count()
    assign_sec = time.monotonic() - t0
    rec["ivf_assign_sec"] = round(assign_sec, 2)
    rec["ivf_assign_vecs_per_sec"] = int(n_assigned / assign_sec)
    sizes = (
        assigned.groupBy("cell").count()
        .agg(
            F.count("*").alias("cells"),
            F.min("count").alias("min"),
            F.expr("percentile_approx(count, 0.5)").alias("p50"),
            F.expr("percentile_approx(count, 0.95)").alias("p95"),
            F.max("count").alias("max"),
        )
        .collect()[0]
    )
    rec["ivf_cell_hist"] = {k: int(sizes[k]) for k in ("cells", "min", "p50", "p95", "max")}

    # recall@k on a query sample: probe nprobe cells vs exact brute
    qids = [int(q) for q in range(4 * PAIRS, 4 * PAIRS + args.queries)]
    qvecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.where(F.col("vec_id").isin(qids)).collect()
    }
    cn = np.sqrt((cent * cent).sum(axis=1))
    cn[cn == 0] = 1.0
    centu = cent / cn[:, None]

    qmat = np.stack([qvecs[q] for q in qids])
    qn = np.sqrt((qmat * qmat).sum(axis=1))
    qn[qn == 0] = 1.0
    qmatu = qmat / qn[:, None]
    qb = spark.sparkContext.broadcast(qmatu)

    def brute(batches):
        import pandas as pd

        qm = qb.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = np.sqrt((mat * mat).sum(axis=1))
            n[n == 0] = 1.0
            sims = (mat / n[:, None]) @ qm.T  # batch x Q
            out = []
            ids = pdf["vec_id"].to_numpy()
            for j in range(qm.shape[0]):
                s = sims[:, j]
                top = np.argsort(-s)[: args.k + 1]
                for i in top:
                    out.append((j, int(ids[i]), float(s[i])))
            yield pd.DataFrame(out, columns=["q", "vec_id", "sim"])

    t0 = time.monotonic()
    bt = (
        emb.mapInPandas(brute, schema="q int, vec_id long, sim double")
        .collect()
    )
    rec["brute_all_queries_sec"] = round(time.monotonic() - t0, 2)
    exact_top: dict[int, list[int]] = {}
    import collections

    per_q: dict[int, list] = collections.defaultdict(list)
    for r in bt:
        per_q[r["q"]].append((r["sim"], r["vec_id"]))
    for j, qid in enumerate(qids):
        cand = sorted(per_q[j], reverse=True)
        exact_top[qid] = [v for _, v in cand if v != qid][: args.k]

    # probe path, BATCHED: one job scores every query against the union
    # of its nprobe cells' candidates (a query only scores candidates
    # in ITS cells), per-query top-k on the driver.  A per-query loop
    # pays ~20x Spark job overhead for the same arithmetic — at real
    # scale the per-cell posting lists are partitions and the probe is
    # partition pruning, but the serving tier batches queries the same
    # way.
    t0 = time.monotonic()
    probe_cells = {}
    for j, qid in enumerate(qids):
        sims_c = centu @ qmatu[j]
        probe_cells[j] = set(
            int(c) for c in np.argsort(-sims_c)[: args.nprobe]
        )
    all_cells = sorted(set().union(*probe_cells.values()))
    cell_to_qs = {}
    for j, cells in probe_cells.items():
        for c in cells:
            cell_to_qs.setdefault(c, []).append(j)
    c2q_bc = spark.sparkContext.broadcast(cell_to_qs)

    def score_all(batches):
        import pandas as pd

        qm = qb.value
        c2q = c2q_bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = np.sqrt((mat * mat).sum(axis=1))
            n[n == 0] = 1.0
            sims = (mat / n[:, None]) @ qm.T  # batch x Q
            ids = pdf["vec_id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            out = []
            for i in range(len(ids)):
                for j in c2q.get(int(cells[i]), ()):
                    out.append((j, int(ids[i]), float(sims[i, j])))
            yield pd.DataFrame(out, columns=["q", "vec_id", "sim"])

    from pyspark.sql import Window

    scored = (
        assigned.where(F.col("cell").isin(all_cells))
        .join(emb, "vec_id")
        .select("vec_id", "cell", "embedding")
        .mapInPandas(score_all, schema="q int, vec_id long, sim double")
    )
    w = Window.partitionBy("q").orderBy(F.col("sim").desc(), F.col("vec_id"))
    top = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= args.k + 1)
        .collect()
    )
    got_q: dict[int, list] = {}
    for r in top:
        got_q.setdefault(r["q"], []).append((r["sim"], r["vec_id"]))
    hits = 0
    for j, qid in enumerate(qids):
        cand = sorted(got_q.get(j, []), reverse=True)
        got = [v for _, v in cand if v != qid][: args.k]
        hits += len(set(got) & set(exact_top[qid]))
    rec["ivf_probe_sec_total"] = round(time.monotonic() - t0, 2)
    rec["ivf_recall_at_k"] = round(hits / (len(qids) * args.k), 3)
    rec["ivf_nprobe"] = args.nprobe
    rec["ivf_n_cells"] = args.n_cells
    assigned.unpersist()

    # --- SRP-bucketed semantic near-dup ---------------------------------
    t0 = time.monotonic()
    bh = (
        ann_lsh_buckets(emb, n_planes=args.n_planes)
        .groupBy("bucket").count()
        .agg(
            F.count("*").alias("buckets"),
            F.expr("percentile_approx(count, 0.5)").alias("p50"),
            F.expr("percentile_approx(count, 0.95)").alias("p95"),
            F.max("count").alias("max"),
            F.sum(F.when(F.col("count") > 2000, F.col("count"))).alias("over_cap"),
        )
        .collect()[0]
    )
    rec["srp_bucket_sec"] = round(time.monotonic() - t0, 2)
    rec["srp_bucket_hist"] = {
        "buckets": int(bh["buckets"]), "p50": int(bh["p50"]),
        "p95": int(bh["p95"]), "max": int(bh["max"]),
        "rows_in_over_2000_buckets": int(bh["over_cap"] or 0),
    }

    t0 = time.monotonic()
    pairs = cosine_neardup_bucketed(
        emb, threshold_e4=9900, n_planes=args.n_planes, bucket_cap=2000
    ).persist()
    n_pairs = pairs.count()
    dt = time.monotonic() - t0
    rec["neardup_sec"] = round(dt, 2)
    rec["neardup_vecs_per_sec"] = int(args.rows / dt)
    rec["neardup_pairs_found"] = n_pairs
    # planted recall per tier: pair (2k, 2k+1) recovered?
    found = pairs.where(
        (F.col("a") < 2 * PAIRS) & (F.col("b") == F.col("a") + 1)
        & (F.col("a") % 2 == 0)
    ).select("a").collect()
    tier_a = sum(1 for r in found if r["a"] < PAIRS)
    tier_b = len(found) - tier_a
    rec["recall_tier_cos999"] = round(tier_a / (PAIRS // 2), 3)
    rec["recall_tier_cos99"] = round(tier_b / (PAIRS // 2), 3)
    pairs.unpersist()

    with open(os.path.join(REPO, "BENCH", "ann_scale_probe.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
