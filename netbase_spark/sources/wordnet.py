"""WordNet-style multi-table import with synset-id remapping — the
``importWordnet`` analog.

Reference: ``norm_wordnet_id`` remaps stale synset ids through
``synset_map.txt`` (src/import.cpp:100-139); ``importSenses`` links
words to their synsets with Instance edges (+ synonym rows,
src/import.cpp:2118-2184); ``importSynsets`` types each synset by POS
and stores the gloss (src/import.cpp:2187-2215); ``importStatements`` /
``importLexlinks`` ingest numeric (synset, rel, synset) triples,
skipping redundant Instance/SubClass rows (src/import.cpp:2246-2299);
orchestration src/import.cpp:2301-2323.

Spark-first: the remap is a broadcast left join applied per id column
(the reference's per-lookup hash probe becomes one join); every stage
is a pure DataFrame plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netbase_spark.normalize import norm_name_col
from netbase_spark.relations import INSTANCE, SUB_CLASS, TYPE


def remap_ids(
    df: DataFrame, synset_map: DataFrame, cols: tuple[str, ...]
) -> DataFrame:
    """Replace stale synset ids through synset_map(old_id, new_id) in
    each of ``cols`` (``norm_wordnet_id``, src/import.cpp:100-139).
    Broadcast join per column — the map is dimension-sized."""
    out = df
    for c in cols:
        m = F.broadcast(
            synset_map.select(
                F.col("old_id").alias(c), F.col("new_id").alias(f"_new_{c}")
            )
        )
        out = (
            out.join(m, c, "left")
            .withColumn(c, F.coalesce(f"_new_{c}", F.col(c)))
            .drop(f"_new_{c}")
        )
    return out


def import_senses(senses: DataFrame, synset_map: DataFrame) -> DataFrame:
    """senses(word, synset_id) -> (word_norm, Instance, synset) triples
    (``importSenses``, src/import.cpp:2118-2184), ids remapped."""
    s = remap_ids(senses, synset_map, ("synset_id",))
    return (
        s.select(
            norm_name_col(F.col("word")).alias("subj"),
            F.lit(INSTANCE).alias("rel"),
            F.col("synset_id").alias("obj"),
            F.lit("sense").alias("rule"),
            F.lit(None).cast("string").alias("doc_id"),
        )
        .where(F.length("subj") > 0)
        .dropDuplicates(["subj", "rel", "obj"])
    )


def import_synsets(synsets: DataFrame, synset_map: DataFrame) -> DataFrame:
    """synsets(synset_id, pos, gloss) -> (synset, Type, pos) triples
    (``importSynsets``, src/import.cpp:2187-2215).  Glosses belong in a
    separate descriptions table (src/import.cpp:2217-2244), not the
    triple store."""
    s = remap_ids(synsets, synset_map, ("synset_id",))
    return (
        s.select(
            F.col("synset_id").alias("subj"),
            F.lit(TYPE).alias("rel"),
            norm_name_col(F.col("pos")).alias("obj"),
            F.lit("synset_pos").alias("rule"),
            F.lit(None).cast("string").alias("doc_id"),
        )
        .where(F.length("obj") > 0)
        .dropDuplicates(["subj", "rel", "obj"])
    )


def import_lexlinks(lexlinks: DataFrame, synset_map: DataFrame) -> DataFrame:
    """lexlinks(src_id, rel, dst_id) -> numeric triples with both sides
    remapped; redundant Instance/SubClass rows are skipped — senses and
    the hypernym import own those edges (``importLexlinks``,
    src/import.cpp:2246-2299)."""
    l = remap_ids(lexlinks, synset_map, ("src_id", "dst_id"))
    return (
        l.where(~F.col("rel").isin([INSTANCE, SUB_CLASS]))
        .select(
            F.col("src_id").alias("subj"),
            F.col("rel").cast("int").alias("rel"),
            F.col("dst_id").alias("obj"),
            F.lit("lexlink").alias("rule"),
            F.lit(None).cast("string").alias("doc_id"),
        )
        .where(F.col("subj") != F.col("obj"))
        .dropDuplicates(["subj", "rel", "obj"])
    )


def import_wordnet(
    senses: DataFrame,
    synsets: DataFrame,
    lexlinks: DataFrame,
    synset_map: DataFrame,
) -> DataFrame:
    """Full orchestration (src/import.cpp:2301-2323): senses + synset
    POS types + lexlinks, all remapped, one deduped triple set."""
    return (
        import_senses(senses, synset_map)
        .unionByName(import_synsets(synsets, synset_map))
        .unionByName(import_lexlinks(lexlinks, synset_map))
        .dropDuplicates(["subj", "rel", "obj"])
    )
