"""Generate docs/API.md from docstrings — one line per public callable.

Run after adding public surface: python tools/gen_api_md.py
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_line(doc):
    lines = doc.strip().splitlines() if doc else []
    return lines[0].rstrip(".") if lines else ""


def main() -> None:
    import tada_spark.frame as fr
    import tada_spark.operators.grouped as gr
    from tada_spark.operators import bloomjoin, cdc, interval, layout, linkage, reshape, skew, skyline, validate
    from tada_spark.functions import classify, dedup, jpeg, multimodal, sampling, similarity, stats, text
    from tada_spark.functions import sketches
    from tada_spark.operators import spatial
    import tada_spark.sources.bucketed as bucketed
    import tada_spark.sources.codec as codec
    import tada_spark.sources.records as records
    import tada_spark.sources.structs as structs
    import tada_spark.streaming.stateful as stateful
    import tada_spark.streaming.windows as windows
    import tada_spark.testing.equal as equal
    import tada_spark.testing.mock as mock

    out = [
        "# API — public surface of tada_spark",
        "",
        "Generated from docstrings (tools/gen_api_md.py). One line per",
        "public callable; see the docstring for semantics + reference",
        "citations.",
        "",
    ]

    def clsfuncs(cls):
        return [
            (n, m)
            for n, m in inspect.getmembers(cls, predicate=inspect.isfunction)
            if not n.startswith("_")
        ]

    def modfuncs(mod):
        return [
            (n, m)
            for n, m in inspect.getmembers(mod, predicate=inspect.isfunction)
            if not n.startswith("_") and m.__module__ == mod.__name__
        ]

    sections = [
        ("Frame (tada_spark.frame)", clsfuncs(fr.Frame)),
        ("GroupedFrame (tada_spark.operators.grouped)", clsfuncs(gr.GroupedFrame)),
        ("Reshape (operators.reshape)", modfuncs(reshape)),
        ("Skew mitigation (operators.skew)", modfuncs(skew)),
        ("Pareto frontier (operators.skyline)", modfuncs(skyline)),
        ("Range join (operators.interval)", modfuncs(interval)),
        ("Text analysis (functions.text)", modfuncs(text)),
        ("Dedup (functions.dedup)", modfuncs(dedup)),
        ("Similarity / ANN (functions.similarity)", modfuncs(similarity)),
        ("Classification (functions.classify)", modfuncs(classify)),
        ("Sampling & splits (functions.sampling)", modfuncs(sampling)),
        ("Statistics (functions.stats)", modfuncs(stats)),
        ("Bloom join pruning (operators.bloomjoin)", modfuncs(bloomjoin)),
        ("CDC / SCD2 (operators.cdc)", modfuncs(cdc)),
        ("Layout: Z-order & compaction (operators.layout)", modfuncs(layout)),
        ("Fuzzy linkage (operators.linkage)", modfuncs(linkage)),
        ("Expectations (operators.validate)", modfuncs(validate)),
        ("Multimodal (functions.multimodal)", modfuncs(multimodal)),
        ("JPEG codec (functions.jpeg)", modfuncs(jpeg)),
        ("Sketches (functions.sketches)", modfuncs(sketches)),
        ("Spatial (operators.spatial)", modfuncs(spatial)),
        (
            "Sources (records / structs / codec / bucketed)",
            modfuncs(records) + modfuncs(structs) + modfuncs(codec) + modfuncs(bucketed),
        ),
        ("Streaming (windows / stateful)", modfuncs(windows) + modfuncs(stateful)),
        ("Testing (equal / mock)", modfuncs(equal) + modfuncs(mock)),
    ]
    for title, items in sections:
        out.append(f"## {title}")
        out.append("")
        for n, m in items:
            doc = first_line(m.__doc__)
            out.append(f"- `{n}` — {doc}" if doc else f"- `{n}`")
        out.append("")

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "API.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(out)} lines")


if __name__ == "__main__":
    main()
