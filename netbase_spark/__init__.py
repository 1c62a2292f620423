"""netbase_spark — a PySpark-native semantic-graph (KG) construction engine.

A from-scratch reimplementation of the construction semantics of the
reference Netbase triple store (see SURVEY.md): gazetteer mention
detection, entity-link candidate ranking, pattern-rule triple
extraction, union-find canonicalization, and partitioned triple /
adjacency materialization — expressed as PySpark DataFrame plans with
vectorized pandas/Arrow UDFs for the string-branchy pieces.

Nothing here is a port: the reference is a single-machine shared-memory
C++ engine; this package declares logical plans and lets Catalyst pick
physical strategies, with explicit partitioning / broadcast / salting
where scale demands it.
"""

__version__ = "0.1.0"
