"""Distributed unigram-LM (SentencePiece-style) tokenizer training — the
second classic subword vocabulary algorithm next to BPE (Kudo 2018,
"Subword Regularization"; no reference analogue — the reference has no
text surface at all, `sql/NestedCondition.java:173-188` stops at
LIKE-contains).

Kudo's algorithm is EM over candidate-piece likelihoods: seed a large
candidate vocabulary, alternate (E) segment the corpus under current
piece probabilities and (M) re-estimate probabilities from the observed
piece counts, pruning pieces the segmentations stopped using.  This
implementation is the hard-EM (Viterbi) variant re-shaped for Spark the
same way ``pipeline/bpe.py`` reshapes Sennrich BPE:

* State lives in the DISTINCT-WORD table ``(word, freq)`` — at 100 TB
  the word table is what computes, never the corpus; corpus frequency
  enters every count as the exact BIGINT ``freq`` weight.
* Seeding = one substring explode (≤ ``max_len``·|word| spans per
  distinct word) + a combiner-friendly ``groupBy(piece)``; the
  candidate set is all single characters (segmentability guarantee)
  plus the top ``seed_multi`` multi-character substrings by weighted
  count (distributed partial top-k — TakeOrderedAndProject, never a
  global sort).
* E-step = per-word Viterbi DP under integer-micronat piece costs
  (``cost = −⌊ln(cnt/total)·1e6⌋`` — the repo-wide quantization
  contract), expressed as a JVM higher-order ``aggregate`` left fold
  (no Python, no UDF).  The DP array entry for a prefix is ENCODED as
  ``cost·64 + (64 − piece_len)`` so a single BIGINT ``min`` picks the
  cheapest segmentation AND breaks exact-cost ties toward the LONGEST
  final piece — a total, engine-independent tie-break.  Division by 64
  is a power-of-two exponent shift, exact in IEEE and in integer
  arithmetic alike, so Spark and DuckDB replay the DP bit for bit.
* M-step = one exploded ``groupBy(piece)`` over the Viterbi
  segmentations.  Single-character pieces get add-one smoothing and are
  never pruned (coverage); multi-character pieces with zero Viterbi
  count are dropped — Kudo's pruning step in its hard-EM form.

Determinism contract: all counts are exact integers; ``ln`` is applied
to bit-identical doubles and floored at micronat granularity; the DP is
integer min-plus with a total tie-break; the boundary-walk
reconstruction is a pinned left fold.  The driver's DuckDB oracle
unrolls every EM iteration (seed → DP → counts → re-cost) in SQL; the
DP itself is POSITION-unrolled there as chained lateral column aliases
with literal indices rather than a ``list_reduce`` fold — DuckDB 1.0's
``list_reduce`` mis-evaluates list-typed accumulators nondeterministically
(measured), and the ``max_word_len`` cap is what bounds that unroll —
see ``inventory._unigram_oracle``.  Round-8 sharpened the diagnosis:
even STRING accumulators are only safe when the lambda's captures are
row-constant (the BPE folds capture ``b.l``/``b.r`` from a 1-row join);
capturing per-row outer columns (``word``, a per-word array) is
nondeterministic too — measured in ``inventory._wp_maxmatch_ctes``,
whose greedy walk is a recursive CTE for exactly that reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1000000.0  # micronat quantization, part of the spec
_INF = 10**12  # absent-piece sentinel cost (≫ any real micronat cost)
_BIG = 4 * 10**15  # guarded-term sentinel (> any encoded DP value)
_ENC = 64  # backpointer radix: enc = cost·64 + (64 − piece_len)


_MAX_WORD_LEN = 24  # junk-word guard, part of the spec (see below)


def unigram_word_table(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = _MAX_WORD_LEN,
) -> DataFrame:
    """Distinct whitespace tokens with corpus frequencies — one
    map-side-combined shuffle (same shape as ``bpe.word_table``).

    Words longer than ``max_word_len`` characters are EXCLUDED from
    vocabulary training by spec — the junk-token guard SentencePiece's
    own trainer applies (its candidate/sentence length caps); the cap
    also bounds the oracle's position-unrolled DP replay."""
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .filter(F.length("word") <= max_word_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _span_grid(words: DataFrame, max_len: int) -> DataFrame:
    """All (word, j, l) span slots, j = 1..len(word), l = 1..max_len;
    ``piece`` is the length-l substring ENDING at position j (NULL when
    j < l).  ≤ max_len·|word| rows per distinct word."""
    return (
        words.select("word", "freq", F.length("word").alias("n"))
        .select(
            "word",
            "freq",
            "n",
            F.explode(F.sequence(F.lit(1), F.col("n"))).alias("j"),
        )
        .select(
            "word",
            "freq",
            "n",
            "j",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, max_len + 1)])
            ).alias("l"),
        )
        .withColumn(
            "piece",
            F.when(
                F.col("j") >= F.col("l"),
                F.col("word").substr(
                    (F.col("j") - F.col("l") + F.lit(1)).cast("int"),
                    F.col("l").cast("int"),
                ),
            ),
        )
    )


def seed_pieces(
    words: DataFrame,
    max_len: int = 4,
    seed_multi: int = 200,
    min_count: int = 2,
) -> DataFrame:
    """Seed candidate vocabulary ``(piece, cnt)``: every single
    character (segmentability guarantee) plus the top ``seed_multi``
    multi-character substrings of length ≤ ``max_len`` with weighted
    substring count ≥ ``min_count`` (rank: cnt DESC, piece ASC — a
    total order, so the cut is engine-independent)."""
    counts = (
        _span_grid(words, max_len)
        .filter(F.col("piece").isNotNull())
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(
            (F.length("piece") > 1) & (F.col("cnt") >= min_count)
        )
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(seed_multi)
    )
    return chars.unionByName(multi)


def piece_costs(pieces: DataFrame) -> DataFrame:
    """Integer-micronat costs ``(piece, cnt, cost)`` under the unigram
    LM ``p(piece) = cnt / Σcnt``: ``cost = −⌊ln(p)·1e6⌋`` (≥ 0).  The
    total rides as a 1-row broadcast."""
    tot = pieces.agg(F.sum("cnt").cast("long").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total").cast("double")
    return pieces.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        (-F.floor(F.log(p) * F.lit(_MICRO))).cast("long").alias("cost"),
    )


def viterbi_segment(
    words: DataFrame, pieces: DataFrame, max_len: int = 4
) -> DataFrame:
    """Best (min total micronat cost) segmentation of every distinct
    word under ``pieces`` — ``(word, freq, sym)`` with ``sym`` the
    space-joined pieces, the same shape as BPE's word table.

    Shape: one span-grid explode, one broadcast join against the
    vocab-sized cost table, then THREE whole-stage-codegen folds per
    word (DP forward, boundary walk back, piece rebuild) — O(|word|·
    max_len) each, no shuffle after the grid's groupBy, no Python.
    Exact-cost ties break toward the longest final piece via the
    ``cost·64 + (64 − len)`` encoding (see module docstring)."""
    jc = _span_grid(words, max_len).join(
        F.broadcast(pieces.select("piece", "cost")), "piece", "left"
    )
    # dense per-word cost list: costs[(j-1)·max_len + l] = cost of the
    # length-l piece ending at j, INF when absent or j < l
    cl = jc.groupBy("word", "freq", "n").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "j",
                        "l",
                        F.coalesce("cost", F.lit(_INF)).alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ).alias("costs")
    )

    def _dp_step(acc, j):
        terms = []
        for l in range(1, max_len + 1):
            pref = F.floor(
                F.element_at(acc, (j - F.lit(l) + F.lit(1)).cast("int"))
                / F.lit(_ENC)
            ).cast("long")
            c = F.element_at(
                F.col("costs"), ((j - 1) * max_len + F.lit(l)).cast("int")
            )
            terms.append(
                F.when(
                    j >= F.lit(l),
                    (pref + c) * F.lit(_ENC) + F.lit(_ENC - l),
                ).otherwise(F.lit(_BIG))
            )
        return F.concat(acc, F.array(F.least(*terms)))

    dp = cl.withColumn(
        "dp",
        F.aggregate(
            F.sequence(F.lit(1), F.col("n")),
            F.array(F.lit(0).cast("long")),
            _dp_step,
        ),
    )

    def _walk_step(acc, _i):
        pos = F.element_at(acc, 1)
        bl = F.lit(_ENC) - (
            F.element_at(F.col("dp"), (pos + 1).cast("int")) % F.lit(_ENC)
        )
        return F.when(
            pos > 0, F.concat(F.array(pos - bl), acc)
        ).otherwise(acc)

    bnd = dp.withColumn(
        "bnd",
        F.aggregate(
            F.sequence(F.lit(1), F.col("n")),
            F.array(F.col("n").cast("long")),
            _walk_step,
        ),
    )

    def _piece(bi):
        lo = F.element_at(F.col("bnd"), bi.cast("int"))
        hi = F.element_at(F.col("bnd"), (bi + 1).cast("int"))
        return F.col("word").substr(
            (lo + 1).cast("int"), (hi - lo).cast("int")
        )

    return bnd.select(
        "word",
        "freq",
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.size("bnd") - 1), _piece),
            " ",
        ).alias("sym"),
    )


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    iters: int = 2,
    max_len: int = 4,
    seed_multi: int = 200,
    min_count: int = 2,
    max_word_len: int = _MAX_WORD_LEN,
) -> tuple[DataFrame, DataFrame]:
    """Train a unigram-LM subword vocabulary by ``iters`` rounds of
    hard EM (Viterbi E-step, count M-step with single-char add-one
    smoothing and zero-count pruning of multi-char pieces).

    Returns ``(pieces, words)``: ``pieces`` is the final vocabulary
    ``(piece, cnt, cost)`` (cost in integer micronats) and ``words``
    the final E-step segmentation ``(word, freq, sym)`` — drop-in for
    ``bpe.subword_stats`` fertility reporting.  Each round's vocabulary
    is ``localCheckpoint``-materialized (vocab-sized — chars +
    ≤ seed_multi rows) so plan depth stays O(1) across rounds, the same
    iterative-algorithm shape as ``bpe_train``."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # materialize the word table ONCE: it is the root of the seed scan
    # and of every EM round's grid join, and leaving it lazy re-runs the
    # corpus-sized token explode+count per reference — measured 3×258 s
    # of a 748 s run at 10M docs (SCALING.md); checkpointed it is
    # vocabulary-sized and the corpus is touched exactly once.
    from . import iterative_stage_conf

    with iterative_stage_conf(docs.sparkSession):
        words = unigram_word_table(
            docs, text_col, max_word_len
        ).localCheckpoint(eager=True)
        pieces = piece_costs(
            seed_pieces(words, max_len, seed_multi, min_count)
        )
        seg = None
        for _ in range(iters):
            pieces = pieces.localCheckpoint(eager=True)
            seg = viterbi_segment(words, pieces, max_len)
            vc = (
                seg.select(
                    "freq", F.explode(F.split("sym", " ")).alias("piece")
                )
                .groupBy("piece")
                .agg(F.sum("freq").cast("long").alias("vcnt"))
            )
            new_counts = (
                pieces.select("piece")
                .join(vc, "piece", "left")
                .filter(
                    (F.length("piece") == 1) | F.col("vcnt").isNotNull()
                )
                .select(
                    "piece",
                    F.when(
                        F.length("piece") == 1,
                        F.coalesce("vcnt", F.lit(0)) + F.lit(1),
                    )
                    .otherwise(F.col("vcnt"))
                    .cast("long")
                    .alias("cnt"),
                )
            )
            pieces = piece_costs(new_counts)
    return pieces, seg
