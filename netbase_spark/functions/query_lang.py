"""The reference's query-language surface compiled onto DataFrames.

Reference: ``fixQuery`` rewrites NL-ish phrasings into SQL-ish form
("types of X" / "list of X" / "all X" / "show X" -> ``select * from X``;
" with / which / who / that " -> " where "; plural strip)
(src/query.cpp:22-57); ``parseQuery`` splits ``select F from T where M``
via ``cut_to`` and parses the filter list (src/query.cpp:472-517);
``evaluate_sql`` is the sscanf select/from/where path
(src/query.cpp:531-575); ``query(Query&)`` = instances-of-keyword ->
sequential filters -> projection (src/query.cpp:299-319).

Spark-first: the parse produces (fields, table, where); execution is a
plain DataFrame plan — scan -> Column-compiled filter (filter_lang) ->
projection — so Catalyst gets full pushdown/pruning.  Two table shapes:

- ``run_query`` over WIDE tables (one column per property): the
  ``collectFieldsAndFacets`` projection shape, directly SQL-checkable.
- ``run_graph_query`` over the TRIPLE table: keyword -> Instance edges
  -> pivot requested predicates wide -> same filter path (the
  ``allInstances`` + ``filter`` composition of the reference).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netbase_spark.functions.filter_lang import compile_filter
from netbase_spark.relations import INSTANCE

_NL_PREFIXES = re.compile(
    r"^\s*(types of|list of|all|show|every)\s+", flags=re.I
)
_WHERE_WORDS = re.compile(r"\s+(with|which|who|that)\s+", flags=re.I)


def is_nl_query(s: str) -> bool:
    """True when the line starts with one of fixQuery's NL prefixes —
    these are LIST queries ('types of cities' -> select * from cities),
    never property questions, so routers must try this before
    ``parse_properties`` (whose '... of ...' shape would shadow them)."""
    return bool(_NL_PREFIXES.match(s or ""))


def fix_query(s: str) -> str:
    """NL -> SQL-ish rewrite (src/query.cpp:22-57)."""
    s = s.strip()
    if not re.match(r"^\s*select\b", s, flags=re.I):
        s = _NL_PREFIXES.sub("", s)
        s = _WHERE_WORDS.sub(" where ", s, count=1)
        # "that are funny" -> "where funny" (copula drop, fixQuery
        # src/query.cpp:36-41)
        s = re.sub(r"(\bwhere\s+)(?:are|is)\s+", r"\1", s, flags=re.I)
        if re.search(r"\s+where\s+", s, flags=re.I):
            head, tail = re.split(r"\s+where\s+", s, maxsplit=1, flags=re.I)
            s = f"select * from {head.strip()} where {tail.strip()}"
        else:
            s = f"select * from {s}"
    return s


@dataclass
class ParsedQuery:
    fields: list[str]  # ["*"] for all
    table: str
    where: str | None  # raw filter string for filter_lang


def parse_query(s: str) -> ParsedQuery:
    """``select F from T [where M]`` split (src/query.cpp:472-517)."""
    s = fix_query(s)
    m = re.match(
        r"^\s*select\s+(.+?)\s+from\s+(\S+)(?:\s+where\s+(.+))?\s*$",
        s,
        flags=re.I,
    )
    if not m:
        raise ValueError(f"unparseable query {s!r}")
    fields_raw, table, where = m.groups()
    fields = [f.strip().replace(" ", "_") for f in fields_raw.split(",")]
    return ParsedQuery(fields=fields, table=table.strip(), where=where)


def _singular(word: str) -> str:
    """Plural strip retry (src/query.cpp:42-47; '…s' not 'ss'/'ns',
    src/netbase.cpp:951; '-ies' -> '-y' for the lookup retry)."""
    if word.endswith("ies") and len(word) > 3:
        return word[:-3] + "y"
    if word.endswith("s") and not word.endswith(("ss", "ns")):
        return word[:-1]
    return word


def run_query(
    q: str, tables: dict[str, DataFrame], limit: int | None = None
) -> DataFrame:
    """Execute over wide tables: resolve table name (plural retry),
    compile the filter string, project fields."""
    p = parse_query(q)
    name = p.table.lower()
    df = tables.get(name)
    if df is None:
        df = tables.get(_singular(name))
    if df is None:
        raise KeyError(f"unknown table {p.table!r}")
    if p.where:
        df = df.where(compile_filter(p.where))
    if p.fields != ["*"]:
        df = df.select(*p.fields)
    if limit:
        df = df.limit(limit)
    return df


def run_graph_query(
    q: str,
    triples: DataFrame,
    limit: int | None = None,
) -> DataFrame:
    """Execute over the triple table: ``from T`` selects Instance-of-T
    subjects (``allInstances`` one-hop; closure composes upstream via
    isa_closure), requested predicate columns pivot wide, then the same
    filter path.  Pivot values are min-aggregated for determinism (the
    reference takes the first statement in chain order).

    Predicates may be property NAMES ("population") or raw relation
    ids ("9001"): names resolve through the same registry the mutation
    path uses (``getProperty`` resolves names via getRelation/getThe,
    src/query.cpp:1506-1533), so ``city where population<1200`` works
    over triples built with ``rel_id_for('population')``."""
    from netbase_spark.operators.mutate import rel_id_for

    p = parse_query(q)
    keyword = p.table.replace("_", " ").lower()
    # plural strip retry ("all testDummys" -> testDummy instances,
    # fixQuery src/query.cpp:42-47)
    kws = list({keyword, _singular(keyword)})
    insts = (
        triples.where(F.col("rel") == INSTANCE)
        .where(F.lower(F.col("subj")).isin(kws))
        .select(F.col("obj").alias("node"))
        .distinct()
    )
    # property predicates used by fields + filter.  Split the where
    # string on the SAME or/and/comma separators compile_filter uses,
    # then take each term's LHS — one finditer over the raw string
    # mis-captured "1 and b" as an LHS for "a>1 and b=2".
    preds = {f for f in p.fields if f != "*"}
    # a single BARE where-term (no operator, no and/or) is the
    # reference's findMatch form: "Karin with Rufnummer" keeps the
    # instances that HAVE the property, "… where Anthrazit" also
    # matches the node name (src/query.cpp:1506-1533; testSqlDe
    # src/tests.cpp:1475-1494)
    bare_term = None
    if (
        p.where
        and not re.search(r"(!=|>=|<=|=|>|<|~)", p.where)
        and not re.search(r"\s+(and|or)\s+|,", p.where, flags=re.I)
    ):
        bare_term = p.where.strip().strip('"').replace(" ", "_")
        preds.add(bare_term)
    bare_cols: set[str] = set()
    if p.where and bare_term is None:
        for branch in re.split(r"\s+or\s+", p.where, flags=re.I):
            for term in re.split(r",|\s+and\s+", branch, flags=re.I):
                term = term.strip()
                if term.lower().startswith("not "):
                    term = term[4:]
                m = re.match(r"^\s*([\w .]+?)\s*(?:!=|>=|<=|=|>|<|~)", term)
                if m:
                    preds.add(m.group(1).strip().replace(" ", "_"))
                elif term:
                    # bare term inside and/or: has-property semantics
                    # (testDummyLogic "size=11 and funny",
                    # src/tests.cpp:377-390); "T.P" addresses P
                    key = term.strip('"').replace(" ", "_").split(".")[-1]
                    preds.add(key)
                    bare_cols.add(key)
    pred_rel = {
        name: (int(name) if re.fullmatch(r"-?\d+", name) else rel_id_for(name))
        for name in preds
    }
    props = (
        insts.join(triples, insts["node"] == triples["subj"])
        .where(F.col("rel").isin(list(pred_rel.values())))
        .groupBy("node")
        .pivot("rel", list(set(pred_rel.values())))
        .agg(F.min("obj"))
    )
    for name, rid in pred_rel.items():
        if name != str(rid):
            props = props.withColumnRenamed(str(rid), name)
    out = insts.join(props, "node", "left").withColumnRenamed("node", "name")
    # bare terms also match nodes where ANY field VALUE equals the
    # term — parseFilter's anyField leg, ``(Any, Equals, term) OR
    # (Any, term, Any)`` (src/query.cpp:400-406); testDummyLogic's
    # "where funny" hits the Attribute edge's OBJECT named funny
    # (src/tests.cpp:294-389).  One broadcastable semi-aggregation over
    # the (tiny) matching-object rows; injected as a coalesce into the
    # pivot column so compile_filter's isNotNull leaf sees it too.
    bare_all = {bare_term} if bare_term is not None else set(bare_cols)
    if bare_all:
        vals = {b.replace("_", " ").lower() for b in bare_all}
        val_hits = (
            triples.where(F.lower(F.col("obj")).isin(list(vals)))
            .groupBy(F.col("subj").alias("_vh_node"))
            .agg(F.collect_set(F.lower(F.col("obj"))).alias("_obj_vals"))
        )
        out = out.join(
            val_hits, out["name"] == val_hits["_vh_node"], "left"
        ).drop("_vh_node")
        for b in bare_all:
            out = out.withColumn(
                b,
                F.coalesce(
                    F.col(b) if b in out.columns else F.lit(None).cast("string"),
                    F.when(
                        F.array_contains(
                            F.col("_obj_vals"), b.replace("_", " ").lower()
                        ),
                        F.lit("1"),
                    ),
                ),
            )
        out = out.drop("_obj_vals")
    if bare_term is not None:
        # names are space-normalized; bare_term arrives underscored
        cond = F.lower(F.col("name")).contains(
            bare_term.replace("_", " ").lower()
        )
        if bare_term in out.columns:
            cond = cond | F.col(bare_term).isNotNull()
        out = out.where(cond)
    elif p.where:
        out = out.where(compile_filter(p.where, frozenset(bare_cols)))
    if p.fields != ["*"]:
        out = out.select("name", *p.fields)
    if limit:
        out = out.limit(limit)
    return out


def parse_properties(q: str) -> tuple[str, str] | None:
    """Property-question parse (``parseProperties``,
    src/query.cpp:1847-1898): ``"P of T"`` / ``"T.P"`` / ``"P:T"`` ->
    (property, topic), else None."""
    q = (q or "").strip()
    m = re.match(r"^(.+?)\s+of\s+(.+)$", q, flags=re.I)
    if m:
        return (m.group(1).strip(), m.group(2).strip())
    m = re.match(r"^(\S+)\.(\S+)$", q)
    if m:
        return (m.group(2), m.group(1))
    m = re.match(r"^([^:]+):(.+)$", q)
    if m:
        return (m.group(1).strip(), m.group(2).strip())
    return None


def property_question(
    q: str, triples: DataFrame, limit: int | None = None
) -> DataFrame:
    """Answer a property question over the triple table: resolve the
    property name to its relation id (canonical registry else md5
    fallback — the same resolver the mutation path uses), look up
    (topic, rel, ?) rows; if none match, retry the PLURAL-stripped
    topic, then the INVERSE direction (?, rel, topic) flipped —
    exactly parseProperties' retry ladder (src/query.cpp:1869-1894).
    Returns (name, value)."""
    from netbase_spark.normalize import norm_name
    from netbase_spark.operators.mutate import rel_id_for

    parsed = parse_properties(q)
    if parsed is None:
        raise ValueError(f"not a property question: {q!r}")
    prop, topic = parsed
    rel = rel_id_for(prop)
    topics = [norm_name(topic) or topic]
    singular = _singular(topics[0])
    if singular != topics[0]:
        topics.append(singular)
    base = triples.where(F.col("rel") == rel)
    # match case-insensitively like run_graph_query: imports (yago,
    # geodb, wikidata) keep original-case subjects, the parsed topic is
    # normalized lowercase
    direct = base.where(F.lower(F.col("subj")).isin(topics)).select(
        F.col("subj").alias("name"), F.col("obj").alias("value")
    )
    inverse = base.where(F.lower(F.col("obj")).isin(topics)).select(
        F.col("obj").alias("name"), F.col("subj").alias("value")
    )
    # retry ladder as a lazy coalesce: direct rows if any, else inverse
    out = direct if not direct.isEmpty() else inverse
    out = out.dropDuplicates(["name", "value"])
    if limit:
        out = out.limit(limit)
    return out


def evaluate_sql(spark: SparkSession, s: str) -> DataFrame:
    """ANSI passthrough (``evaluate_sql``, src/query.cpp:531-575):
    anything already valid SQL goes straight to Catalyst."""
    return spark.sql(s)
