"""Per-document text-statistics kernels (guide §4.2: batch native code in
one Arrow pass instead of explode→shuffle→aggregate pipelines).

Both kernels are integer-exact restatements of relational forms stated by
their DuckDB oracle twins in ``plans/harness.py``; they replicate the
relational order of operations precisely:

* ``make_repetition_stats_fn`` — the Gopher repetition numerators.  The
  oracle splits on single spaces, aggregates per-(doc, word) counts, and
  INNER-joins the unigram rollup with the distinct-bigram rollup — so a
  document with fewer than two tokens has no bigram row and is DROPPED.
  The kernel reproduces that gate (``len(ws) < 2 → no output row``);
  every emitted quantity is a Python int from Counter/set arithmetic —
  no float surface at all.
* ``make_tf_fn`` — the per-(doc, word) term-frequency table, one row per
  DISTINCT word per doc with its occurrence count, exactly
  ``GROUP BY doc_id, w`` over the exploded words.  Downstream (document
  frequencies, the idf log, the top-k window) stays in the JVM unchanged.
"""

from __future__ import annotations

from collections import Counter


def make_repetition_stats_fn():
    """mapInPandas body: (doc_id, text) → (doc_id, n_tokens,
    n_distinct_words, top_word_count, n_distinct_bigrams)."""
    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids, nt, nd, top, nb = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = text.split(" ")
                if len(ws) < 2:
                    # oracle: uni INNER JOIN bi — no bigram row, no output
                    continue
                c = Counter(ws)
                ids.append(doc_id)
                nt.append(len(ws))
                nd.append(len(c))
                top.append(max(c.values()))
                nb.append(len(set(zip(ws, ws[1:]))))
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_tokens": pd.Series(nt, dtype="int64"),
                "n_distinct_words": pd.Series(nd, dtype="int64"),
                "top_word_count": pd.Series(top, dtype="int64"),
                "n_distinct_bigrams": pd.Series(nb, dtype="int64"),
            })

    return fn


def make_tf_fn():
    """mapInPandas body: (doc_id, text) → (doc_id, w, tf) — one row per
    distinct word per document with its occurrence count."""
    def fn(batches):
        import pandas as pd

        for pdf in batches:
            ids, words, tfs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for w, c in Counter(text.split(" ")).items():
                    ids.append(doc_id)
                    words.append(w)
                    tfs.append(c)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "w": pd.Series(words, dtype="object"),
                "tf": pd.Series(tfs, dtype="int64"),
            })

    return fn
