"""Built-in relation (predicate) registry.

The reference engine hardcodes negative integer ids for its built-in
relations (reference: src/relations.hpp:196-269) and canonicalizes
incoming predicate names onto them at import time
(``getRelation``, src/relations.cpp:479-592; ``rdfOwl``,
src/import.cpp:1051-1091).  We keep the same ids so triple sets are
comparable, and expose the canonicalization as a plain dict suitable
for broadcasting.
"""

from __future__ import annotations

# --- core relation ids (reference: src/relations.hpp:196-225) -------------
SUPER_CLASS = -1  # hypernym
SUB_CLASS = -2  # hyponym
TYPE = -3
INSTANCE = -4
PART = -11
PART_OF = -12
MEMBER = -13
OWNER = -14
SUBSTANCE = -15
ENTAILMENT = -21
CAUSE = -23
ANTONYM = -30
SYNONYM = -32
LABEL = -38  # src/relations.hpp:259
LABELED = -39
SIMILAR = -40
ATTRIBUTE = -60
SEE = -50
DERIVES = -80
DERIVED = -81
TRANSLATION = -139
SUBSTANCE_OWNER = -16  # src/relations.hpp:210
PERTAINYM = -80  # src/relations.hpp:211 (shares -80 with _derives)
PLURAL = -131  # src/relations.hpp:169
DOMAIN_CATEGORY = -91  # src/relations.hpp:219-224
MEMBER_DOMAIN_CATEGORY = -92
DOMAIN_REGION = -93
MEMBER_DOMAIN_REGION = -94
DOMAIN_USAGE = -95
MEMBER_DOMAIN_USAGE = -96

# --- meta kinds (reference: src/relations.hpp:126-164) --------------------
KIND_ABSTRACT = -102  # a *word*: groups senses/instances
KIND_CLASS = -103
KIND_ENTITY = -104
KIND_PERSON = -106
KIND_NUMBER = -123
KIND_STRING = -126
KIND_DATE = -127
FALSE = -200  # not '0' by design (src/relations.hpp:189)
TRUE = -201

# --- extension relations ---------------------------------------------------
# The reference materializes these as named relation Nodes created at init
# (``the(location)`` etc., src/relations.cpp:265-419) without stable header
# ids; we allocate stable ids in a reserved block so the oracle and the
# engine agree.
LOCATION = -301  # dissect " in/am/at " rule target (src/netbase.cpp:1060)
NEAR = -302  # dissect " bei " rule (src/netbase.cpp:1089)
NUMBER = -303  # dissect "N. X" rule (src/netbase.cpp:1146)
FROM = -304  # dissect " from " rule (src/netbase.cpp:1072)
FOR = -305  # dissect " for/für " rule (src/netbase.cpp:1080)
OF = -306
DATE = -307
RANGE = -308
DOMAIN = -309
MENTIONED_IN = -310  # EL output edge: (entity, MENTIONED_IN, doc_id)

REL_NAMES: dict[int, str] = {
    SUPER_CLASS: "SuperClass",
    SUB_CLASS: "SubClass",
    TYPE: "Type",
    INSTANCE: "Instance",
    PART: "Part",
    PART_OF: "PartOf",
    MEMBER: "Member",
    OWNER: "Owner",
    SUBSTANCE: "Substance",
    ENTAILMENT: "Entailment",
    CAUSE: "Cause",
    ANTONYM: "Antonym",
    SYNONYM: "Synonym",
    LABEL: "Label",
    LABELED: "Labeled",
    SIMILAR: "Similar",
    ATTRIBUTE: "Attribute",
    SEE: "See",
    DERIVES: "Derives",
    DERIVED: "Derived",
    TRANSLATION: "Translation",
    LOCATION: "location",
    NEAR: "near",
    NUMBER: "Number",
    FROM: "from",
    FOR: "for",
    OF: "of",
    DATE: "Date",
    RANGE: "Range",
    DOMAIN: "Domain",
    MENTIONED_IN: "MentionedIn",
}

REL_IDS: dict[str, int] = {v: k for k, v in REL_NAMES.items()}


# --- predicate canonicalization (reference: src/relations.cpp:479-592) ----
# name (case/underscore-insensitive, see normalize.norm_name) -> relation id
PREDICATE_CANON: dict[str, int] = {
    # wikidata ontology #Item objects resolve to the Entity meta-kind
    # (src/relations.cpp:481)
    "item": KIND_ENTITY,
    "true": TRUE,
    "false": FALSE,
    "instance": INSTANCE,
    "contains": PART,
    "broader": SUPER_CLASS,
    "broader topic": SUPER_CLASS,
    "narrower": SUB_CLASS,
    "narrower topic": SUB_CLASS,
    "unterklasse von": SUPER_CLASS,
    "type": TYPE,
    "has type": TYPE,
    "is": TYPE,
    "ist": TYPE,
    "has": MEMBER,
    "of": OWNER,
    "containedby": PART_OF,
    "partof": PART_OF,
    "part": PART,
    "besteht aus": PART,
    "by": OWNER,
    "property": ATTRIBUTE,
    "inverseof": ANTONYM,
    "reverse property": ANTONYM,
    "label": LABEL,
    "range": RANGE,
    "domain": DOMAIN,
    "antonym": ANTONYM,
    # "opposite of bad" console form (src/console.cpp:66; testOpposite
    # src/tests.cpp:1306-1424 resolves opposites through Antonym edges)
    "opposite": ANTONYM,
    "see": SEE,
    "seealso": SEE,
    "see also": SEE,
    "also see": SEE,
    "also": SEE,
    "similar": SIMILAR,
    "ist ein(e)": TYPE,
    "typ": TYPE,
    "art": TYPE,
    "subclassof": SUPER_CLASS,
    # wikidata P-ids (src/relations.cpp:525-581)
    "p1696": ANTONYM,
    "p31": TYPE,
    "p361": PART_OF,
    "p527": PART,
    "p461": ANTONYM,
    "p585": DATE,
    "p642": OF,
    "p279": SUPER_CLASS,
    "p523": PART,
    "p460": SYNONYM,
    # rdf/rdfs/owl vocabulary (rdfOwl, src/import.cpp:1051-1091)
    "rdf:type": TYPE,
    "rdfs:label": LABEL,
    "rdfs:subclassof": SUPER_CLASS,
    "rdfs:seealso": SEE,
    "owl:sameas": SYNONYM,
    "owl:equivalentclass": SYNONYM,
    "owl:inverseof": ANTONYM,
}

# Predicates whose edges feed canonicalization (union-find merge classes):
# Synonym -32, Label -38, Labeled -39, plus P460/owl:sameAs which canon to
# SYNONYM anyway (reference merges via mergeNode, src/netbase.cpp:2610-2638).
SAMEAS_CLASS_RELS = frozenset({SYNONYM, LABEL, LABELED})

# External-ID predicates dropped at import (dropBadPredicate,
# src/import.cpp:1757-1786).
DROP_PREDICATES = frozenset(
    {
        "p352", "p637", "p705", "p536", "p213", "p214", "p646", "p508",
        "p910", "p1566", "p268", "p950", "p349", "p1006", "p269", "p409",
        "p1017", "p691", "p906", "p1005", "p949", "p734", "p1207",
    }
)

# Inverse-pair rewrites used by reverse pattern matching
# (findStatement, src/netbase.cpp:1734-1762).
INVERSE_PAIRS: dict[int, int] = {
    INSTANCE: TYPE,
    TYPE: INSTANCE,
    SUB_CLASS: SUPER_CLASS,
    SUPER_CLASS: SUB_CLASS,
    PART: PART_OF,
    PART_OF: PART,
    DERIVES: DERIVED,
    DERIVED: DERIVES,
}

# Symmetric relations (match in either direction).
SYMMETRIC_RELS = frozenset({SYNONYM, ANTONYM, SIMILAR, TRANSLATION})

# ``initWikiRelations`` predicate hierarchy (src/relations.cpp:595-612):
# these wiki predicates are SUB-PROPERTIES of a canonical relation — the
# edge keeps its own (narrower) predicate id, but a pattern match over
# the canonical relation must also hit it.  The reference stores these
# as (pred, SuperClass, canonical) meta-statements in the graph itself;
# here the tiny map is broadcast into the match's isin filter (which
# also PRUNES the rel-partitioned triple store to exactly the matching
# predicate partitions).  Keys are normalized predicate NAMES — their
# numeric ids come from the same resolver the importers use
# (mutate.rel_id_for), so the map composes with hash-fallback ids.
# P361/P527/P279/P31 resolve FLAT at import (PREDICATE_CANON above),
# matching the reference's getRelation fast paths, so they need no row
# here; the P35->"Präsident" synonym row (relations.cpp:606) is a data
# statement, not hierarchy, and belongs in a fixture.
PREDICATE_SUBPROPERTY: dict[str, int] = {
    "p131": PART_OF,  # located in the administrative territorial entity
    "p706": PART_OF,  # located on terrain feature (relations.cpp:601)
    "p150": PART,  # contains administrative territorial entity (:600)
    "p27": SUB_CLASS,  # relations.cpp:603 ("Unterklasse von")
}

# --- per-edge-type BFS predicate sets (src/query.cpp:1228-1475) ------------
# memberFilter (src/query.cpp:1266-1336): the meronymy traversal used by
# has(x, y) / memberPath.  Forward = subject-side step to the object;
# reverse = object-side step back to the subject (includes the upward
# Instance/SubClass climb so parts inherit through the type hierarchy).
# The reference's To/By/UsageContext/Active predicates are init-created
# nodes without stable header ids (src/relations.cpp:265-419) — extend
# these frozensets per deployment if those edges exist in the data.
MEMBER_FWD_RELS = frozenset(
    {
        MEMBER, PART, SUBSTANCE, FOR, TYPE, SUPER_CLASS, SYNONYM, PLURAL,
        MEMBER_DOMAIN_REGION, MEMBER_DOMAIN_USAGE,
    }
)
MEMBER_REV_RELS = frozenset(
    {
        OWNER, FROM, PART_OF, SUB_CLASS, INSTANCE, SYNONYM, TRANSLATION,
        PLURAL, DOMAIN_REGION, DOMAIN_USAGE,
    }
)
# hard skips BEFORE any match (src/query.cpp:1275-1287): the reference
# `continue`s past ids 91/92 ("also bug !!"), so its later
# MEMBER_DOMAIN_CATEGORY / DOMAIN_CATEGORY match clauses are dead code —
# those edges are never traversed in either direction
MEMBER_SKIP_RELS = frozenset(
    {PERTAINYM, DERIVED, ATTRIBUTE, SIMILAR, SEE,
     DOMAIN_CATEGORY, MEMBER_DOMAIN_CATEGORY}
)

# subclassFilter (src/query.cpp:1228-1250): forward SubClass edges plus
# reverse SuperClass edges.
SUBCLASS_FWD_RELS = frozenset({SUB_CLASS})
SUBCLASS_REV_RELS = frozenset({SUPER_CLASS})

# instanceFilter (src/query.cpp:1197-1224): forward Instance (plus the
# wiki category predicates, not modeled here), reverse Type/Label.
INSTANCE_FWD_RELS = frozenset({INSTANCE})
INSTANCE_REV_RELS = frozenset({TYPE, LABEL})


def rel_name(rel_id: int) -> str:
    return REL_NAMES.get(rel_id, str(rel_id))


def canon_predicate(name_norm: str) -> int | None:
    """Canonical relation id for a normalized predicate name, else None."""
    return PREDICATE_CANON.get(name_norm)
