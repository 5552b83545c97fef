"""The plan-audit DUP_EXPR detector itself (tools/plan_audit.py).

The r9 round shipped three guard-double-evaluation sites with the
audit reporting "0 flagged of 234" — the audit never looked INSIDE
scan-level DataFilters for duplicated expensive expressions. These
tests pin the detector against (a) a captured PRE-fix plan shape (must
flag), (b) legitimate shapes it must NOT flag (different expressions
sharing a function token; "aggregate(" inside "HashAggregate("), and
(c) the live post-fix dedup plans (must be clean).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import dup_expensive_exprs  # noqa: E402

# the actual r9 executed-plan shape of exact_dedup (isnotnull(md5(...))
# pushed into the scan while the Project evaluates the same md5)
PRE_FIX_PLAN = """
AdaptiveSparkPlan isFinalPlan=false
+- HashAggregate(keys=[fp#6], functions=[min(doc_id#0L), count(1)])
   +- Exchange hashpartitioning(fp#6, 32), ENSURE_REQUIREMENTS
      +- HashAggregate(keys=[fp#6], functions=[partial_min(doc_id#0L)])
         +- Project [doc_id#0L, md5(cast(trim(regexp_replace(lower(text#1), [^a-z0-9]+,  , 1), None) as binary)) AS fp#6]
            +- Filter isnotnull(md5(cast(trim(regexp_replace(lower(text#1), [^a-z0-9]+,  , 1), None) as binary)))
               +- FileScan parquet [doc_id#0L,text#1] Batched: true, DataFilters: [isnotnull(md5(cast(trim(regexp_replace(lower(text#1), [^a-z0-9]+,  , 1), None) as binary)))], Format: Parquet
"""

# hash_bucket filters on md5(doc_id) while the projection fingerprints
# md5(text) — SAME function token, DIFFERENT expressions: clean
DIFFERENT_EXPRS_PLAN = """
+- Project [doc_id#0L, md5(cast(trim(regexp_replace(lower(text#1), [^a-z0-9]+,  , 1), None) as binary)) AS fp#6]
   +- Filter (cast(conv(substring(md5(cast(doc_id#0L as string)), 1, 8), 16, 10) as bigint) % 100 < 80)
      +- FileScan parquet [doc_id#0L,text#1] DataFilters: [(cast(conv(substring(md5(cast(doc_id#0L as string)), 1, 8), 16, 10) as bigint) % 100 < 80)]
"""

# "aggregate(" inside HashAggregate( renders must not count as the
# expensive higher-order aggregate fold
HASHAGG_ONLY_PLAN = """
+- HashAggregate(keys=[k#1], functions=[sum(v#2)])
   +- Filter isnotnull(k#1)
      +- FileScan parquet [k#1,v#2] DataFilters: [isnotnull(k#1)]
"""


def test_detector_flags_prefix_plan():
    hits = dup_expensive_exprs(PRE_FIX_PLAN)
    assert "md5(" in hits


def test_detector_ignores_different_expressions_same_token():
    assert dup_expensive_exprs(DIFFERENT_EXPRS_PLAN) == []


def test_detector_ignores_hashaggregate_render():
    assert dup_expensive_exprs(HASHAGG_ONLY_PLAN) == []


def test_live_dedup_plans_are_clean(spark):
    from tada_spark.queries import CATALOG

    SF = "/root/testdata/sf0.001"
    for name in (
        "dedup_exact_fingerprint",
        "incremental_dedup_delta",
        "simhash_candidates",
        "minhash_candidate_pairs",
        "sentence_chunks_docs",
        "dsir_select_docs",
        "duplicate_span_stats_docs",
        "remove_duplicate_spans_docs",
        "pmi_phrases_docs",
        "wordpiece_apply_docs",
        "bigram_familiarity_docs",
        "embedding_outliers_labels",
        "semdedup_embeddings",
        "silhouette_labels_embeddings",
        "kmeans_embeddings",
    ):
        plan = CATALOG[name][0](spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert dup_expensive_exprs(plan) == [], name


def test_allowlisted_dups_are_exactly_the_quality_gate_class(spark):
    """daily_ingest / corpus_prep keep a split() duplicate by design:
    the gopher_keep gate SELECTS by computed stat values. Pin that the
    duplication stays in that class (split/regexp only — a hash or
    HOF-fold duplicate appearing here would be a new bug, not the
    gate)."""
    from tada_spark.queries import CATALOG

    SF = "/root/testdata/sf0.001"
    for name in ("daily_ingest_pipeline", "corpus_prep_pipeline"):
        plan = CATALOG[name][0](spark, SF)._jdf.queryExecution().executedPlan().toString()
        dup = set(dup_expensive_exprs(plan))
        assert dup <= {"split(", "regexp_replace("}, (name, dup)
