"""Dedup / similarity / text-analysis / multimodal / manifest operators
over the driver's sf0.001 tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from docstrange_spark.operators import (
    dedup,
    multimodal,
    similarity,
    spanize,
    text_analysis,
)
from docstrange_spark.operators import extract as ex
from docstrange_spark.sources import manifest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df.cache()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_groups(documents):
    g = dedup.exact_groups(documents)
    total = g.agg(F.sum("dup_count")).collect()[0][0]
    assert total == documents.count()


def test_minhash_and_lsh(documents):
    sample = documents.limit(200)
    sigs = dedup.minhash_signatures(sample)
    row = sigs.first()
    assert all(len(row[f"mh{i}"]) == 32 for i in range(dedup.MINHASH_K))
    bands = dedup.lsh_bands(sigs)
    assert bands.count() == sigs.count() * dedup.LSH_BANDS
    pairs = dedup.lsh_candidate_pairs(sample)
    for p in pairs.limit(5).collect():
        assert p["doc_a"] < p["doc_b"]


def test_jaccard_identical_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "a completely different sentence with other words entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "doc_a long, doc_b long")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, pairs).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0


def test_simhash_close_for_similar(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r["doc_id"]: r["simhash"] for r in dedup.simhash16(df).collect()}
    d12 = bin(sims[1] ^ sims[2]).count("1")
    d13 = bin(sims[1] ^ sims[3]).count("1")
    assert d12 < d13
    assert 0 <= sims[1] < 2**16


def test_knn_bruteforce(embeddings):
    out = similarity.knn_bruteforce(embeddings, [0, 1], top_k=5)
    rows = out.collect()
    assert len(rows) == 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_knn_lsh_subset_of_bruteforce(embeddings):
    exact = similarity.knn_bruteforce(embeddings, [0], top_k=3).collect()
    approx = similarity.knn_lsh(embeddings, [0], top_k=3, n_planes=4).collect()
    # LSH neighbors come from the query's own bucket — results must be a
    # plausible (possibly shorter) ranked list with valid cosines
    assert len(approx) <= 3
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in approx)
    assert exact  # sanity


def test_text_analysis(documents):
    stats = text_analysis.token_stats(documents)
    r = stats.first()
    assert r["n_tokens_ws"] > 0 and r["n_tokens_est"] == r["n_chars"] // 4
    q = text_analysis.quality_score(documents.limit(50)).collect()
    assert all(0 <= row["stopword_ratio"] <= 1 for row in q)
    lang = text_analysis.lang_id(documents.limit(50)).collect()
    assert all(row["lang_guess"] in (list(text_analysis.LANG_MARKERS) + ["und"]) for row in lang)
    fp = text_analysis.fingerprint(documents.limit(10)).first()
    assert len(fp["fp_full"]) == 32


def test_multimodal_plumbing(spark):
    rows = [(f"m{i}", "image", bytes([i] * (10 + i)), {"w": "64"}) for i in range(5)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA_DDL)
    feats = multimodal.extract_features(media, fake=True).collect()
    assert len(feats) == 5
    for r in feats:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] >= 10
    # strict mode raises (decode libs absent by design)
    with pytest.raises(Exception):
        multimodal.extract_features(media, fake=False).collect()
    frames = multimodal.frame_sample_plan(media.select("media_ref"), every_n=10)
    assert frames.count() >= 5


def test_spanize_and_extract(documents, spark):
    spans = spanize.spanize(documents.limit(20))
    out = ex.extract(spans, salt=False)
    rows = out.collect()
    assert len(rows) == 20
    md = rows[0]["markdown"]
    assert md.startswith("# ")
    assert "## Part 1" in md


def test_manifest_resume(spark, documents, tmp_path):
    out_dir = str(tmp_path / "resumable")
    spans = spanize.spanize(documents.limit(64))
    snap = manifest.snapshot_id_of(SF_DIR)

    def process(df):
        return ex.extract(df, salt=False).select("doc_id", "markdown", "n_blocks")

    # first run: only the first wave commits (simulate kill via n_buckets
    # slicing: run with a restricted bucket list by monkey wave_size)
    full = manifest.process_resumable(
        spans, out_dir, process, snap, n_buckets=8, wave_size=3
    )
    assert sorted(full["processed_buckets"]) == list(range(8))

    # rerun: everything already committed -> nothing reprocessed
    again = manifest.process_resumable(
        spans, out_dir, process, snap, n_buckets=8, wave_size=3
    )
    assert again["processed_buckets"] == []
    assert sorted(again["skipped_buckets"]) == list(range(8))

    got = manifest.read_output(spark, out_dir)
    assert got.count() == 64
    m = manifest.manifest_summary(spark, out_dir)
    assert m.select("bucket").distinct().count() == 8
    assert m.agg(F.sum("n_docs")).collect()[0][0] == 64


def test_lsh_hot_bucket_cap_chain(spark):
    """A degenerate bucket (10k identical docs) must not explode into
    ~50M pairs on one task: with a cap, oversized buckets chain-pair
    (n-1 consecutive links), keeping the cluster connected for
    transitive dedup while bounding output linearly. The Observation
    reports exactly what was capped (no silent drops)."""
    from pyspark.sql import Observation

    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text appears on every page of this site").alias(
            "text"
        ),
    )
    obs = Observation("lsh_skew")
    pairs = dedup.lsh_candidate_pairs(docs, max_bucket_size=100, observation=obs)
    rows = pairs.collect()
    # each of the 4 bands holds ONE bucket with all n docs; every band
    # chains the same sorted members, so distinct leaves n-1 pairs
    assert len(rows) == n - 1
    assert {r["doc_a"] for r in rows} == set(range(n - 1))
    assert {r["doc_b"] for r in rows} == set(range(1, n))
    got = obs.get
    assert got["largest_bucket"] == n
    assert got["oversized_member_rows"] == 4 * n  # 4 bands x n members


def test_lsh_cap_noop_below_threshold(documents):
    """With every bucket under the cap, capped output == exact output."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(documents).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(documents, max_bucket_size=10_000).collect()
    }
    assert capped == exact and exact


def test_winnow_guarantee(spark):
    """Winnowing's core property: any substring match of length
    >= k + window - 1 shares at least one fingerprint; disjoint texts
    share none."""
    k, w = 5, 4
    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "prefix one " + shared + " suffix alpha"),
            (2, "other start " + shared + " different end"),
            (3, "completely unrelated words with zero overlap here"),
        ],
        "doc_id long, text string",
    )
    fps = text_analysis.winnow_fingerprints(df, k=k, window=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3])


def test_connected_components_transitivity(spark):
    """a-b and b-c in the pair graph must land all three in one cluster
    labeled by the smallest id; isolated vertices stay their own rep."""
    verts = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.connected_components(verts, pairs).collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 4: 2}


def test_connected_components_long_chain_pointer_jumping(spark):
    """The chain-capped hot-bucket pairing emits PATHS; pointer jumping
    must converge a diameter-1999 chain well inside max_iter (plain
    propagation would need 1999 rounds and previously returned silently
    wrong labels)."""
    n = 2000
    verts = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    got = dedup.connected_components(verts, pairs, max_iter=25).collect()
    assert all(r["cluster_rep"] == 0 for r in got)
    assert len(got) == n


def test_dedup_clusters_capped_degenerate_corpus(spark):
    """VERDICT r2 #1: the PRODUCTION clustering path must survive a
    degenerate corpus. 10k identical docs run straight through
    dedup_clusters (capped by default): the chain-capped pairing keeps
    the pair count linear, pointer-jumping CC collapses the
    diameter-9999 chain, and every doc lands in the single cluster
    labeled by the smallest id."""
    from pyspark.sql import Observation

    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text appears on every page of this site").alias(
            "text"
        ),
    )
    obs = Observation("cluster_skew")
    got = dedup.dedup_clusters(docs, max_bucket_size=100, observation=obs).collect()
    assert len(got) == n
    assert all(r["cluster_rep"] == 0 for r in got)
    assert obs.get["largest_bucket"] == n  # the cap actually engaged


def test_dedup_clusters_cap_is_invisible(documents):
    """Chain pairing preserves each bucket's connected component, so the
    capped default must produce EXACTLY the uncapped clustering — the
    invariant that keeps the recursive-closure oracle green."""
    capped = {
        (r["doc_id"], r["cluster_rep"])
        for r in dedup.dedup_clusters(documents, max_bucket_size=2).collect()
    }
    exact = {
        (r["doc_id"], r["cluster_rep"])
        for r in dedup.dedup_clusters(documents, max_bucket_size=None).collect()
    }
    assert capped == exact and capped


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches every round to reliable checkpoint();
    results must match the localCheckpoint default exactly."""
    verts = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 4)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.connected_components(
            verts, pairs, checkpoint_dir=str(tmp_path / "cc_ckpt")
        ).collect()
    }
    assert got == {0: 0, 1: 1, 3: 1, 5: 1, 2: 2, 4: 2}
    import os

    namespaces = sorted(os.listdir(tmp_path / "cc_ckpt"))
    assert len(namespaces) == 1 and namespaces[0].startswith("cc_"), namespaces
    dirs = sorted(os.listdir(tmp_path / "cc_ckpt" / namespaces[0]))
    # superseded rounds are reclaimed: only the edge/base dir and the
    # latest round survive (Spark never GCs reliable checkpoints itself)
    rounds = [d for d in dirs if d.startswith("round_")]
    assert len(rounds) <= 1, dirs
    assert "edges" in dirs
    # the session-global checkpoint dir was restored (a follow-up
    # localCheckpoint-mode call must not land files in our namespace)
    n_before = sum(len(fs) for _, _, fs in os.walk(tmp_path / "cc_ckpt"))
    got2 = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.connected_components(verts, pairs).collect()
    }
    assert got2 == got
    n_after = sum(len(fs) for _, _, fs in os.walk(tmp_path / "cc_ckpt"))
    assert n_after == n_before


def test_affine_scheme_finds_exact_dups_and_matches_oracle_arithmetic(spark, documents):
    """The affine (one-md5-per-shingle) web-scale scheme: exact
    duplicates must always collide in every band (same shingle set ->
    same base hashes -> same signature), and the derived-hash arithmetic
    must match a direct numpy recomputation (the oracle's construction)."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    # exact-dup guarantee: duplicate 5 real docs under new ids
    picked = documents.orderBy("doc_id").limit(5)
    dup = picked.select((F.col("doc_id") + 100_000).alias("doc_id"), "text")
    corpus = documents.select("doc_id", "text").unionByName(dup)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            corpus, k=32, bands=8, scheme="affine"
        ).collect()
    }
    originals = [r["doc_id"] for r in picked.select("doc_id").collect()]
    for o in originals:
        assert (o, o + 100_000) in pairs

    # arithmetic parity with the oracle construction
    sig = dedup.minhash_signatures(
        documents.limit(1), k=4, scheme="affine"
    ).collect()[0]
    row = documents.limit(1).collect()[0]
    toks = row["text"].lower().split(" ")
    shingles_ = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hs = np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in shingles_],
        dtype=np.int64,
    )
    for i in range(4):
        a = int(hashlib.md5(f"a|{i}".encode()).hexdigest()[:7], 16) | 1
        b = int(hashlib.md5(f"b|{i}".encode()).hexdigest()[:7], 16)
        assert sig[f"mh{i}"] == int(((a * hs + b) % 2_147_483_647).min())


def test_k128_banding_recall_at_threshold(spark):
    """Web-scale banding quality (k=128, b=32, r=4): pairs with n-gram
    Jaccard >= ~0.8 must surface as candidates. Deterministic corpus:
    40 base docs, each with a near-dup sharing a long common prefix
    (high shingle overlap) plus 120 unrelated filler docs. With r=4
    rows/band and 32 bands the analytic miss rate at s=0.8 is
    (1 - s^4)^32 ~ 5e-8 per pair, so every planted pair must appear."""
    from pyspark.sql import functions as F

    rows = []
    for d in range(40):
        base = [f"w{d}_{j}" for j in range(40)]
        rows.append((d, " ".join(base)))
        near = base[:36] + [f"m{d}_{j}" for j in range(4)]  # ~0.8 Jaccard
        rows.append((d + 1000, " ".join(near)))
    for f in range(120):
        rows.append((f + 5000, " ".join(f"f{f}_{j}" for j in range(40))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(
            docs, k=dedup.WEBSCALE_K, bands=dedup.WEBSCALE_BANDS, scheme="affine"
        ).collect()
    }
    for d in range(40):
        assert (d, d + 1000) in pairs, f"planted near-dup pair {d} missed"
    # filler docs share no shingles with anything: no spurious pairs
    # among them (band hashes differ with overwhelming margin)
    spurious = [p for p in pairs if p[0] >= 5000 and p[1] >= 5000]
    assert not spurious, spurious[:5]


def test_verified_clusters_refine_raw_clusters(spark, documents):
    """verified_clusters drops candidate edges below the Jaccard
    threshold before closure, so every verified cluster must sit inside
    one raw (unverified) cluster — verification can only split, never
    merge; exact duplicates still co-cluster."""
    from pyspark.sql import functions as F

    # pin the duplicated rows deterministically (limit() without orderBy
    # may return different rows per action)
    picked = documents.orderBy("doc_id").limit(3)
    picked_ids = [r["doc_id"] for r in picked.select("doc_id").collect()]
    dup = picked.select((F.col("doc_id") + 100_000).alias("doc_id"), "text")
    corpus = documents.select("doc_id", "text").unionByName(dup)

    raw = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.dedup_clusters(corpus, max_bucket_size=None).collect()
    }
    ver = {
        r["doc_id"]: r["cluster_rep"]
        for r in dedup.verified_clusters(corpus, jaccard_threshold=0.5).collect()
    }
    assert set(ver) == set(raw)
    # refinement: same verified rep -> same raw rep
    by_vcluster = {}
    for doc, rep in ver.items():
        by_vcluster.setdefault(rep, set()).add(raw[doc])
    assert all(len(raws) == 1 for raws in by_vcluster.values())
    # exact duplicates (jaccard 1.0) survive verification
    for did in picked_ids:
        assert ver[did] == ver[did + 100_000]


def test_incremental_pairs_match_full_restriction(documents):
    """The incremental (new batch vs persisted band index) candidates
    must equal the full-corpus candidate pairs restricted to pairs
    touching at least one new document — no pair is lost or invented by
    splitting the computation."""
    new = documents.where(F.col("doc_id") % 7 == 0)
    index = documents.where(F.col("doc_id") % 7 != 0)
    index_bands = dedup.lsh_bands(dedup.minhash_signatures(index))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.incremental_candidate_pairs(new, index_bands).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(documents).collect()
    }
    expected = {p for p in full if p[0] % 7 == 0 or p[1] % 7 == 0}
    assert got == expected


def test_incremental_index_bucket_cap(spark):
    """A degenerate index bucket (2000 identical indexed docs) probed by
    100 identical new docs must not expand to 200k join rows per band:
    max_index_bucket_size keeps N representatives per bucket, every new
    doc still links into the component, and the Observation reports the
    capped rows."""
    from pyspark.sql import Observation

    text = F.lit("the same boilerplate text appears on every page of this site")
    index_docs = spark.range(2000).select(F.col("id").alias("doc_id"), text.alias("text"))
    new_docs = spark.range(100).select(
        (F.col("id") + 10_000).alias("doc_id"), text.alias("text")
    )
    index_bands = dedup.lsh_bands(dedup.minhash_signatures(index_docs))
    obs = Observation("idx_cap")
    pairs = dedup.incremental_candidate_pairs(
        new_docs, index_bands,
        max_bucket_size=10, max_index_bucket_size=5, observation=obs,
    ).collect()
    vs_index = [(a, b) for a, b in [(r["doc_a"], r["doc_b"]) for r in pairs] if a < 10_000]
    # every new doc links to the 5 kept representatives (ids 0..4)
    linked_new = {b for a, b in vs_index}
    assert linked_new == {10_000 + i for i in range(100)}
    assert {a for a, b in vs_index} == set(range(5))
    # 4 bands x (2000-5) capped member rows reported
    assert obs.get["index_rows_capped"] == 4 * 1995


def test_repetition_stats_values_and_plan(spark):
    """Hand-computed repetition fractions on crafted docs, and the
    zero-shuffle contract (one projection over the scan)."""
    df = spark.createDataFrame(
        [
            (0, "a b a b a  c"),   # 6 words (double space), 5 grams
            (1, ""),                # degenerate: no words
            (2, "solo"),            # one word: no 2-grams
            (3, "x x x x"),         # total repetition
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_analysis.repetition_stats(df).collect()}
    r0 = got[0]
    assert r0["n_words"] == 6
    assert r0["dup_word_frac"] == round((6 - 3) / 6, 6)
    assert r0["top_word_frac"] == round(3 / 6, 6)  # 'a' x3
    # grams: [a b, b a, a b, b a, a c] -> 2 dup pairs of 5, top 'a b' x2
    assert r0["dup_2gram_frac"] == round(2 / 5, 6)
    assert r0["top_2gram_frac"] == round(2 / 5, 6)
    assert got[1]["n_words"] == 0
    assert got[1]["dup_word_frac"] == 0.0 and got[1]["top_2gram_frac"] == 0.0
    assert got[2]["n_words"] == 1 and got[2]["dup_2gram_frac"] == 0.0
    assert got[3]["dup_word_frac"] == 0.75 and got[3]["top_word_frac"] == 1.0
    plan = (
        text_analysis.repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_simhash_pairs_finds_near_dups(spark):
    """Identical docs pair at hamming 0; a one-token edit stays within
    the hamming<=3 default; unrelated docs never pair. The
    max_bucket_size chain cap engages on a degenerate identical block
    without losing connectivity (identical sigs share every band)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # exact dup -> hamming 0
        (3, base.replace("kappa", "lambda")),  # near dup
        (4, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df).collect()
    }
    assert got[(1, 2)] == 0
    assert all(4 not in p for p in got)
    # the pigeonhole guarantee: EVERY pair of signatures within hamming
    # <= 3 must surface as a pair (4 byte-bands, 3 flipped bits can
    # break at most 3 bands), and every reported hamming must equal the
    # true signature distance
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(df).collect()}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                assert (a, b) in got and got[(a, b)] == ham
    for (a, b), ham in got.items():
        assert ham == bin(sigs[a] ^ sigs[b]).count("1")

    # degenerate block: 30 identical docs, cap at 5 -> chain pairing
    # keeps the block connected with linearly many pairs
    block = spark.createDataFrame(
        [(i, base) for i in range(30)], "doc_id long, text string"
    )
    capped = dedup.simhash_pairs(block, max_bucket_size=5).collect()
    uncapped_n = dedup.simhash_pairs(block).count()
    assert 0 < len(capped) < uncapped_n
    # chain connectivity: union-find over capped pairs -> one component
    parent = list(range(30))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped:
        parent[find(int(r["doc_a"]))] = find(int(r["doc_b"]))
    assert len({find(i) for i in range(30)}) == 1


def test_simhash32_matches_16_prefix_semantics(spark):
    rows = [(1, "alpha beta gamma"), (2, "delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s32 = {r["doc_id"]: r["simhash"] for r in dedup.simhash32(df).collect()}
    assert all(0 <= v < 2**32 for v in s32.values())
    assert s32[1] != s32[2]
