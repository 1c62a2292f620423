# netbase_spark verification targets.
#
# The grading driver samples ~50 of the contract queries per round; the
# FULL 104-query oracle check lives in `make check` — run it (or `make
# verify`) before every push so the never-sampled queries stay green
# (round-2 verdict item 6).

.PHONY: check test pr verify bench plans

# full driver-contract check: entry() smoke at sf0.001, every
# queries()[name] vs oracle_sql()[name] via DuckDB at sf0.01
check:
	python scripts/check_entry.py

# unit + property + golden suites
test:
	python -m pytest tests/ -x -q

# end-to-end construction P/R gate (P=R must print 1.0)
pr:
	python scripts/run_pipeline.py --docs 200

# the pre-commit/CI gate: contract + tests + P/R
verify: check test pr

# headline bench (one JSON line; full maps in BENCH/BENCH_full_latest.json)
bench:
	python bench.py

# explain(formatted) audit of every contract query -> PLANS.md
plans:
	python scripts/audit_plans.py
