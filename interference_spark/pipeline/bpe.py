"""Distributed BPE (byte-pair encoding) vocabulary training — the
tokenizer-construction step of a training-data pipeline (no reference
analogue; the reference has no text processing at all — its SQL surface
stops at LIKE-contains, `sql/NestedCondition.java:173-188`).

This is the textbook Sennrich-style algorithm re-shaped for Spark:

* State lives in the DISTINCT-WORD table ``(word, freq, sym)`` where
  ``sym`` is the space-joined current segmentation — at 100 TB the word
  table (billions of rows) is what shuffles, never the corpus, and corpus
  frequency enters every count as the exact BIGINT ``freq`` weight.
* One merge iteration = (1) adjacent-pair counts: a map-side-combined
  groupBy over exploded ``zip(sym, sym[1:])`` pairs — ONE shuffle whose
  key cardinality is the pair vocabulary; (2) argmax: ``LIMIT 1`` to the
  driver (a single row — the driver never holds data); (3) the merge
  applied to every word as a JVM higher-order ``aggregate`` fold (no
  Python, no UDF).  k merges = k bounded shuffles; each iteration's word
  table is persisted and the previous one released, so lineage stays O(1).
* The greedy-leftmost merge is a LEFT FOLD over the symbol list: append
  the next symbol, or — when it equals ``right`` and the accumulator's
  last token equals ``left`` — replace that last token with the
  concatenation.  A fold handles runs correctly (``a a a a`` under
  ``(a,a)`` → ``aa aa``, never ``aa a a``) and, critically, it is the
  SAME sequential computation DuckDB's ``list_reduce`` performs — which
  is what lets the driver's SQL oracle replay training bit for bit
  (tie-breaks pinned: count DESC, then left ASC, right ASC).

Determinism contract: pair counts are exact integers; the argmax
tie-break is total; the fold is order-pinned.  No floats anywhere until
the reporting layer (ratios quantized there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct whitespace tokens with corpus frequencies and their
    initial character segmentation ``sym`` (space-joined).  One shuffle
    (the word groupBy, map-side combined)."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    words = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return words.withColumn("sym", F.array_join(chars, " "))


def merge_fold(sym: Column, left: str, right: str) -> Column:
    """Apply one merge rule to a segmentation string: greedy leftmost,
    expressed as a JVM ``aggregate`` left fold (see module docstring for
    why a fold, and why DuckDB's ``list_reduce`` replays it exactly)."""
    s = F.split(sym, " ")
    init = F.element_at(s, 1)
    rest = F.slice(s, 2, F.greatest(F.size(s) - F.lit(1), F.lit(0)))

    def step(acc: Column, x: Column) -> Column:
        last = F.regexp_extract(acc, "[^ ]+$", 0)
        wo_last = F.regexp_replace(acc, " ?[^ ]+$", "")
        merged = F.concat(F.lit(left), x)
        return F.when(
            (x == F.lit(right)) & (last == F.lit(left)),
            F.when(wo_last == "", merged).otherwise(
                F.concat(wo_last, F.lit(" "), merged)
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.when(F.size(s) == 1, sym).otherwise(F.aggregate(rest, init, step))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies ``(l, r, cnt)`` over current
    segmentations, weighted by word freq — exact BIGINT counts."""
    s = F.split(F.col("sym"), " ")
    two = words.select("freq", s.alias("s")).filter(F.size("s") >= 2)
    z = F.arrays_zip(
        F.slice("s", 1, F.size("s") - 1), F.slice("s", 2, F.size("s") - 1)
    )
    return (
        two.select("freq", F.explode(z).alias("p"))
        .groupBy(F.col("p.0").alias("l"), F.col("p.1").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, words)``: ``merges`` is the learned rule table
    ``(merge_rank, left, right, merged, pair_count)`` (≤ n_merges rows —
    training stops early if no adjacent pair remains), built on the
    driver from the per-iteration argmax rows (bounded: one row per
    iteration); ``words`` is the final segmented word table
    ``(word, freq, sym)`` — persisted; caller unpersists when done."""
    spark = docs.sparkSession
    cur = word_table(docs, text_col).persist()
    cur.count()
    rules: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(cur)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        rules.append((rank, l, r, l + r, cnt))
        nxt = cur.withColumn("sym", merge_fold(F.col("sym"), l, r)).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    merges = spark.createDataFrame(
        rules,
        "merge_rank long, left string, right string, merged string, "
        "pair_count long",
    )
    return merges, cur


def subword_stats(
    docs: DataFrame,
    words: DataFrame,
    text_col: str = "text",
    by: str = "lang",
) -> DataFrame:
    """Apply a trained segmentation to the corpus and report per-group
    compression: token instances, subword instances, and the
    subwords-per-token ratio (one exact division — both engines divide
    the same two BIGINTs).  The corpus joins the (small relative to
    corpus) word table on the token — at scale a broadcast or bucketed
    join; counts are exact integer sums."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    inst = docs.select(F.col(by), F.explode(toks).alias("word"))
    nsub = words.select(
        "word", F.size(F.split("sym", " ")).alias("n_sub")
    )
    return (
        inst.join(nsub, "word")
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sub").alias("n_subwords"),
        )
        .select(
            by,
            "n_tokens",
            "n_subwords",
            (
                F.col("n_subwords").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("subwords_per_token"),
        )
    )
