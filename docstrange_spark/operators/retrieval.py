"""Corpus-level retrieval operators: inverted index, boolean term
search, and BM25 ranking (Robertson & Zaragoza 2009 — public
knowledge; the reference's per-document `search_document` tool covers
one document at a time, these serve queries against the whole corpus).

Everything is built-in-function relational (posexplode + groupBy +
broadcast joins) with deterministic outputs, so each operator carries a
bit-exact DuckDB oracle: posting positions are sorted arrays rendered
as comma-joined strings, and BM25 scores are summed in integer
micro-units (the same exact-summation trick as `classifier.py`) so
float addition order can't drift between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text_analysis

MICRO = 1_000_000.0


def _postings(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, term, pos) token stream — 0-based positions.

    Deliberately NOT ``spread`` (guide §1.2 "measure first"): plain
    tokenization is cheap map work — measured bm25 0.95 s without vs
    1.79 s with the extra exchange at sf0.1/local[32]; the exchange's
    fixed cost exceeds the work it parallelizes (unlike the k-hash
    shingle pass in ``dedup.shingles``, where spread wins 2.8x)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(text_analysis.nonempty_tokens(text_col)).alias(
            "pos", "term"
        ),
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tf: int = 1,
) -> DataFrame:
    """Term-document postings with in-document positions — the
    materialized retrieval index. Row layout (term, doc_id, tf,
    positions) rather than per-term arrays: a web-scale term's posting
    list is millions of documents, which must stay distributed rows,
    never one array on one task. Positions are emitted sorted and
    comma-joined (``"0,17,44"``) so the output is deterministic and
    engine-portable.

    One shuffle (groupBy (term, doc_id) with map-side combine). Write
    the result partitioned/bucketed by term and every lookup becomes a
    pruned scan.
    """
    return (
        _postings(df, id_col, text_col)
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.array_join(
                F.sort_array(F.collect_list(F.col("pos").cast("long"))), ","
            ).alias("positions"),
        )
        .where(F.col("tf") >= min_tf)
    )


def term_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Conjunctive (AND) boolean retrieval: documents containing EVERY
    query term, with per-term and total term frequencies. The classic
    posting-intersection, expressed as a groupBy: filter postings to
    the query terms (pushed into the scan), count distinct matched
    terms per doc, keep docs matching all of them.

    Returns (doc_id, n_hits) — ``n_hits`` the total occurrence count
    across the query terms. Terms are lowercased to match the token
    stream (same normalization as ``phrase_search``). The term filter
    is a literal IN-list, so Catalyst pushes it to the source; no
    index materialization needed for ad-hoc queries, or run it against
    a bucketed ``inverted_index`` table for the serving shape.
    """
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("terms must be non-empty")
    p = _postings(df, id_col, text_col).where(F.col("term").isin(terms))
    return (
        p.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("n_terms"),
            F.count("*").cast("long").alias("n_hits"),
        )
        .where(F.col("n_terms") == F.lit(len(terms)))
        .select("doc_id", "n_hits")
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    n_shards: int = 32,
) -> DataFrame:
    """BM25-ranked retrieval over the corpus (disjunctive: any doc
    containing at least one query term is scored). Uses the
    Robertson/Lucene idf ``ln((N - df + 0.5)/(df + 0.5) + 1)`` and the
    standard saturation ``tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``.

    Scale shape: document lengths are a projection; N and avgdl join
    as broadcast scalars; per-term idf is a query-term-sized broadcast.
    Per-document contributions are rounded to integer micro-units and
    summed exactly (bit-stable across engines and partition orders).
    The global top-k is the skew-safe two-phase rank (per-shard top-k,
    then re-rank the <= n_shards*top_k survivors) — never a full sort.
    Returns (doc_id, score, rank). Terms are lowercased to match the
    token stream.
    """
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("terms must be non-empty")
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1 (got {top_k})")
    lens = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(text_analysis.nonempty_tokens(text_col))
        .cast("long")
        .alias("dl"),
    )
    tot = lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    p = _postings(df, id_col, text_col).where(F.col("term").isin(terms))
    tfs = p.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfs = tfs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = (
        dfs.crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    avgdl = F.col("sum_dl") / F.col("n_docs")
    contrib = (
        tfs.join(F.broadcast(idf), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                (
                    F.col("idf")
                    * (
                        (F.col("tf") * F.lit(float(k1) + 1.0))
                        / (
                            F.col("tf")
                            + F.lit(float(k1))
                            * (
                                F.lit(1.0 - float(b))
                                + F.lit(float(b)) * (F.col("dl") / avgdl)
                            )
                        )
                    )
                )
                * F.lit(MICRO),
                0,
            )
            .cast("long")
            .alias("c"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("c") / F.lit(MICRO), 6).alias("score")
    )
    order = (F.desc("score"), F.asc("doc_id"))
    if n_shards > 1:
        w1 = Window.partitionBy("_shard").orderBy(*order)
        scored = (
            scored.withColumn(
                "_shard",
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
                .cast("long")
                % n_shards,
            )
            .withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= top_k)
            .drop("_shard", "_r1")
        )
    # final re-rank runs on <= n_shards*top_k survivor rows BY
    # CONSTRUCTION (each shard emitted at most top_k) — a bounded
    # single-partition sort, not a global sort of the corpus scores.
    # partitionBy(lit(0)) marks the intent in the source; Catalyst
    # folds the constant away, so the warning is demoted at the logger
    # in session.get_spark (see PLANS.md).
    w2 = Window.partitionBy(F.lit(0)).orderBy(*order)
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= top_k)
        .select("doc_id", "score", "rank")
    )


def phrase_search(
    df: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval: documents containing the token sequence
    ``phrase`` contiguously, with the occurrence count and the 0-based
    first token position. Where ``term_search`` intersects unordered
    postings, this matches ADJACENT positions — implemented as
    n-length word-gram equality entirely inside one projection
    (split + transform + filter, zero shuffles, zero Python), so it
    composes into a scan stage at any scale.
    """
    words = [w for w in phrase.lower().split(" ") if w]
    if not words:
        raise ValueError("phrase must contain at least one token")
    n = len(words)
    target = F.lit(" ".join(words))
    grams = text_analysis.word_ngrams(
        text_analysis.nonempty_tokens(text_col), n
    )
    t = df.select(
        F.col(id_col).alias("doc_id"), grams.alias("grams")
    ).select(
        "doc_id",
        F.size(F.filter(F.col("grams"), lambda g: g == target))
        .cast("long")
        .alias("n_occurrences"),
        (F.array_position(F.col("grams"), target) - 1)
        .cast("long")
        .alias("first_pos"),
    )
    return t.where(F.col("n_occurrences") > 0)


def proximity_search(
    df: DataFrame,
    term_a: str,
    term_b: str,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """NEAR-operator retrieval: documents where ``term_a`` and
    ``term_b`` occur within ``window`` tokens of each other, with the
    minimum observed distance. Sits between ``term_search`` (unordered
    AND) and ``phrase_search`` (distance exactly 1, ordered).

    One projection: both terms' position arrays are built inside the
    row (array filters over the posexploded-free token array), and the
    min pairwise distance is a nested array fold — cost
    O(|pos_a| * |pos_b|) per document, bounded by document length,
    zero shuffles, zero Python.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1 (got {window})")
    a, b = term_a.lower(), term_b.lower()
    if not a or not b:
        raise ValueError("terms must be non-empty")
    toks = text_analysis.nonempty_tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(toks) - 1)

    def positions(term):
        return F.filter(
            idx, lambda i: F.element_at(toks, i + 1) == F.lit(term)
        )

    t = df.select(
        F.col(id_col).alias("doc_id"),
        positions(a).alias("pa"),
        positions(b).alias("pb"),
    )
    dists = F.flatten(
        F.transform(
            F.col("pa"),
            lambda p: F.transform(F.col("pb"), lambda q: F.abs(p - q)),
        )
    )
    out = t.where((F.size("pa") > 0) & (F.size("pb") > 0)).select(
        "doc_id", F.array_min(dists).cast("long").alias("min_dist")
    )
    return out.where(F.col("min_dist") <= window)


def passage_corpus(docs: DataFrame) -> DataFrame:
    """(passage_id, text) passage table for RAG-granularity retrieval:
    spanize -> extract -> section split, ids ``doc_id#section_idx``.
    Feed the result to :func:`bm25_search` with ``id_col="passage_id"``
    — the shape the CLI's ``--granularity passage``, the MCP
    ``search_corpus`` tool, and the ``passage_search`` contract query
    all share.

    Scale shape: one extraction kernel pass plus the zero-join section
    split; the passage table is a projection of it (materialize it once
    in production, like ``search_materialized``'s section store). The
    result is localCheckpoint-ed here: BM25 references its corpus
    several times (lengths, totals, postings), and since the round-6
    section split is exchange-free there is no ReusedExchange node left
    to deduplicate the extraction-kernel subtree — uncheckpointed, the
    kernel would re-execute once per reference.
    """
    from . import extract as ex
    from . import navigation, spanize

    md = ex.extract(spanize.spanize(docs), include_spans=False).select(
        "doc_id", "markdown"
    )
    passages = navigation.sections_relational(md).select(
        F.concat_ws(
            "#", F.col("doc_id"), F.col("section_idx").cast("string")
        ).alias("passage_id"),
        F.col("content").alias("text"),
    )
    return passages.localCheckpoint(eager=True)
