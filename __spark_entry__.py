"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (Q1 shape) on sf0.001, smoke-checked.
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data tier); each takes (spark, sf_dir).
oracle_sql()  — DuckDB-equivalent ANSI SQL per query. Omitted only for
                ops that are engine-specific by nature (xxhash64-based
                LSH/winnowing candidates, HLL / KLL sketch estimates)
                → rows-only check.

The real inventory lives in tada_spark/queries.py (CATALOG).

Driver-window rotation — COMPUTED, not narrated
-----------------------------------------------
The driver verifies the FIRST 50 queries() entries per round; the
catalog is larger.  The window order is now derived at call time from
the committed CORRECTNESS_r*.json artifacts by
tada_spark/rotation.py (see its docstring for the exact rule):

1. never-driver-green oracle-able entries, newest catalog position
   first (new entries earn their first row the round after landing);
2. then driver-green entries, oldest green round first (LRU);
3. rows-only-by-nature entries last (their hash-verified twins —
   minhash_lsh_oracle, simhash_oracle, winnow_fingerprints_oracle,
   approx_distinct_checked, approx_quantiles_checked — take the
   window slots instead).

Honest accounting as of round 8 (recomputed from the artifacts by
``tada_spark.rotation.freshness_report``, pinned by
tests/test_inventory_sync.py so this text can never drift from the
files again): driver artifacts exist for rounds 1-5 and 7 — round 6
produced NO artifacts.  At the round-8 HEAD, 122 of 226 oracle-able
entries have EVER been driver-green (histogram of newest green round:
r03=16, r04=6, r05=50, r07=50; the recent-window union r05∪r07 is
100), and 104 entries have never had a driver-green row (93 entering
the round, plus the eleven round-8 additions: jpeg_decode_real, the
MI / ROC-AUC / Theil-Sen / seasonal-decompose stats entries, the
DBSCAN classifier, the k-center coreset selector, the MRR/recall
retrieval metrics, the containment geofence join, the batch EWMA
fold and the point-in-time feature join).  With 226
oracle-able entries and 50 rows/round the minimum full-coverage cycle
is ceil(226/50) = 5 rounds; the earlier "green within 3-4 rounds"
claim was arithmetically unsatisfiable and is withdrawn.  The round-8
window therefore leads with 50 of the 104 never-green entries — the
newest-catalog-first rule puts the eleven round-8 additions first
(pit_feature_join_orders, ewma_batch_users, spatial_containment_tags, retrieval_metrics_docs,
kcenter, dbscan, seasonal, theil_sen, roc_auc, MI, jpeg_decode_real),
then the late-r7 cohort (stats family, governance/lakehouse tier,
stream_ewma/stream_pattern, semdedup-adjacent ANN entries); the
remaining 54 plus the oldest-green r03/r04 cohort rotate in next
round.  Every round additionally runs the FULL local oracle gate
(tools/check_oracle.py, all entries, sf0.001) at HEAD — gate evidence
is recorded in the commit log but is never presented as driver
evidence.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tada_spark.queries import CATALOG, q1_pricing_summary
from tada_spark.rotation import driver_order


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: CATALOG[name][0] for name in driver_order(CATALOG)}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
