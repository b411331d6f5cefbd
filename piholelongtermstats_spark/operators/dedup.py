"""Deduplication operators over the `documents` table (M7).

Four tiers, by cost/recall trade at 100 TB:

- exact_dedup: hash-groupBy on the full text — one shuffle; the
  baseline any pipeline runs first.
- ngram_jaccard_pairs: exact all-pairs Jaccard over 3-gram shingles
  via a shingle-key self-join. Exact but O(pairs-sharing-a-shingle);
  at large scale the shingle join skews on stop-shingles — that is
  precisely what the MinHash/LSH tier replaces.
- minhash_signatures + lsh_candidate_pairs: MinHash (k independent
  md5-derived permutations) banded into LSH buckets; candidate pairs
  come from a bucket-key self-join whose cost is data-dependent, not
  quadratic. The scale path.
- simhash: 60-bit per-document sketch; near-dups differ in few bits
  (hamming ball query is a prefix-bucket join).

All hashes are md5-derived so the DuckDB oracle reproduces them
bit-for-bit (operators/text.md5_hash60).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from piholelongtermstats_spark.operators.text import md5_hash60, tokens

NUM_PERMS = 16
BAND_SIZE = 4
SIMHASH_BITS = 60


def exact_dedup_counts(docs: DataFrame) -> DataFrame:
    """Exact dedup accounting: rows, distinct texts, duplicate rows.

    Run over a doubled input (UNION ALL) this demonstrates
    dropDuplicates semantics with a verifiable answer.
    """
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_duplicate_rows"),
    )


def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """Distinct (doc_id, shingle) pairs of n-token shingles.

    Built with lead() over a window PARTITIONED by doc_id (parallel;
    never a global window)."""
    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.lead("tok", i).over(w) for i in range(n)]
    sh = tok.select(
        "doc_id", F.concat_ws(" ", *parts).alias("shingle"), *[
            p.alias(f"_p{i}") for i, p in enumerate(parts)
        ]
    ).filter(F.col(f"_p{n-1}").isNotNull())
    return sh.select("doc_id", "shingle").distinct()


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Exact near-duplicate pairs with 3-gram Jaccard ≥ threshold.

    jaccard = |A∩B| / (|A|+|B|−|A∩B|); single division on exact
    integer counts ⇒ deterministic double.
    """
    sh = shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = (
        inter.join(F.broadcast(sizes).alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sizes).alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(docs: DataFrame, num_perms: int = NUM_PERMS) -> DataFrame:
    """MinHash signature rows (doc_id, perm, minhash).

    Permutation p's hash of shingle s is md5(p || '|' || s) truncated
    to 60 bits — k independent-enough hash families, reproducible in
    any engine with md5. One shuffle: groupBy (doc_id, perm) min.
    """
    sh = shingles(docs)
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perms - 1))).alias("perm")
    hashed = sh.select("doc_id", "shingle", perms).select(
        "doc_id",
        "perm",
        md5_hash60(
            F.concat(F.col("perm").cast("string"), F.lit("|"), F.col("shingle"))
        ).alias("h"),
    )
    return (
        hashed.groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
        .select("doc_id", F.col("perm").cast("long").alias("perm"), "minhash")
    )


def lsh_candidate_pairs(
    docs: DataFrame, num_perms: int = NUM_PERMS, band_size: int = BAND_SIZE
) -> DataFrame:
    """LSH banding: signatures → (band, band_key) buckets → candidate
    pairs from a bucket self-join (doc_a < doc_b, distinct).

    With 16 perms in 4 bands of 4, a pair with Jaccard j collides in
    ≥1 band with prob 1−(1−j⁴)⁴ — ≈99.8% at j=0.9, ≈0.6% at j=0.3.
    """
    sig = minhash_signatures(docs, num_perms)
    banded = sig.withColumn("band", (F.col("perm") / band_size).cast("long"))
    keys = banded.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("perm", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
    )
    return (
        keys.alias("a")
        .join(keys.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash per document over whitespace tokens.

    Per (doc, bit): sum of ±1 over token hashes' bit values; bit set
    iff sum > 0. Duplicate tokens deliberately count with multiplicity
    (standard SimHash term weighting by frequency).
    """
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    ).withColumn("h", md5_hash60(F.col("tok")))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    # bit ops take expression args only in SQL form (the classic
    # python API wants a literal int count)
    votes = tok.select("doc_id", "h", bit).select(
        "doc_id",
        "bit",
        F.expr("CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END").alias("vote"),
    )
    bitsum = votes.groupBy("doc_id", "bit").agg(F.sum("vote").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.sum(
            F.expr(
                "CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("simhash")
    )
