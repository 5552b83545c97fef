"""Column-expression function library.

The reference has no built-in scalar-function library (its story is
"bring your own lambda", SURVEY §2.4); everything here is beyond-reference
surface for large-scale training-data pipelines: text analysis, document
deduplication, similarity search, multimodal plumbing. All hot paths are
JVM-side Column expressions — no Python UDFs.
"""

from tada_spark.functions import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
