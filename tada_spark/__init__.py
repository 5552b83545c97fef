"""tada_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference dataframe library
(ptiger10/tada), re-expressed Spark-first.

The reference is an eager, single-threaded, in-memory columnar dataframe
library (reference: types.go:1-30). This package reproduces its operator
*semantics* — null handling, stringified-key equality, label alignment,
grouped reductions, lookup joins — as *lazy, distributed* Spark DataFrame
plans that Catalyst optimizes, and adds the large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
a 100 TB training-data pipeline needs.

Design rules (see SURVEY.md §4.3, §7):
  * Every operator builds a declarative DataFrame plan — no driver-side
    row loops, no collect() inside operators (collect only in testing /
    print sinks).
  * Positional ("row id") semantics are opt-in and explicit, because row
    order is not a distributed concept; ordering ops take explicit sort
    keys.
  * Null-semantics shims (NaN→NULL, null-string set, nulls-last sorts,
    parse-failure→null casts) live in plans/semantics.py.
"""

from tada_spark.frame import Frame
from tada_spark.session import get_spark

__all__ = ["Frame", "get_spark"]
__version__ = "0.1.0"
