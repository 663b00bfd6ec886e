"""Batch 4: generated series / gap filling, text-distance functions,
bit aggregates, sampling, IVF-style ANN, multimodal frame sampling.

The gap-fill pattern (generate a dense calendar, left-join the sparse
facts) is the canonical time-series completion op; at 100 TB the
calendar side is trivially broadcast and the fact side never reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import gridsum, query, quantize as _q


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import fixture_table

    return fixture_table(spark, sf_dir, name)


@query(
    "series_monthly_orders_gapfill",
    oracle="""
    WITH months AS (
      SELECT strftime(unnest(generate_series(DATE '1995-01-01', DATE '2001-08-01',
                                             INTERVAL 1 MONTH)), '%Y-%m') AS month),
    actual AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
             sum(CAST(floor((o_totalprice) * 1e2 + 0.5) AS BIGINT)) / 1e2 AS total
      FROM orders GROUP BY 1)
    SELECT months.month, coalesce(n, 0) AS n_orders, coalesce(total, 0.0) AS total
    FROM months LEFT JOIN actual ON months.month = actual.month
    """,
)
def series_monthly_orders_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar (sequence + explode) left-joined with sparse
    monthly aggregates — zero-filled gaps. The generated side is a few
    dozen rows → broadcast; the aggregate side shuffles once."""
    orders = _t(spark, sf_dir, "orders")
    months = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("2001-08-01").cast("date"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias("month"))
    actual = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        gridsum("o_totalprice", 2).alias("total"),
    )
    # RIGHT join with the calendar on the build side: Spark cannot
    # broadcast the row-preserved side of an outer join, so the
    # months-LEFT-join-actual form silently ignored the hint and
    # sort-merged both sides. actual ⟶ right-join ⟶ broadcast(months)
    # is the same result with the aggregate streaming map-side.
    return (
        actual.join(F.broadcast(months), "month", "right")
        .select(
            "month",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total"), F.lit(0.0)).alias("total"),
        )
    )


@query(
    "text_distance_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_name, 'small ring') AS INT) AS dist_to_ring,
           array_to_string(regexp_extract_all(p_brand, '[0-9]+'), ',') AS brand_digits,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels
    FROM part
    """,
)
def text_distance_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance + regexp_extract_all — fuzzy-matching primitives
    for entity resolution, JVM expressions."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein("p_name", F.lit("small ring")).alias("dist_to_ring"),
        F.array_join(F.regexp_extract_all("p_brand", F.lit("[0-9]+"), 0), ",").alias(
            "brand_digits"
        ),
        F.size(F.regexp_extract_all("p_name", F.lit("[aeiou]"), 0)).alias("n_vowels"),
    )


@query(
    "bit_agg_part_sizes",
    oracle="""
    SELECT p_brand,
           CAST(bit_and(p_size) AS INT) AS size_and,
           CAST(bit_or(p_size)  AS INT) AS size_or,
           CAST(bit_xor(p_size) AS INT) AS size_xor
    FROM part
    GROUP BY p_brand
    """,
)
def bit_agg_part_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR are associative-commutative →
    order-independent, so directly oracle-safe)."""
    part = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.bit_and("p_size").cast("int").alias("size_and"),
        F.bit_or("p_size").cast("int").alias("size_or"),
        F.bit_xor("p_size").cast("int").alias("size_xor"),
    )


@query("sample_orders_seeded")  # no oracle: sampling algorithm is engine-specific
def sample_orders_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sampling with a fixed seed — deterministic within
    Spark (same seed, same split planning), engine-specific across
    engines, hence rows-only. At scale this is the pushdown-friendly
    way to subsample (no shuffle, evaluated at scan)."""
    orders = _t(spark, sf_dir, "orders")
    # exact-grid read (+0.5 before floor): plain floor(x*100)/100 on a
    # 2dp double stored as 828.999… would emit one cent low; there is
    # no oracle mirroring the error here, so the value must be faithful
    faithful = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)) / 100.0
    return orders.sample(fraction=0.1, seed=42).select(
        "o_orderkey", "o_custkey", faithful.alias("o_totalprice")
    )


@query("embedding_ann_ivf")  # no oracle: partition assignment is engine-side
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to seeded centroids
    (here: the 16 lowest-vec_id vectors — deterministic), then search
    each query only in its ``nprobe=2`` nearest cells.

    The scale shape: centroid table broadcasts, cell assignment is a
    map-only argmin over 16 dot products, and the candidate join is an
    equi-join on cell id — the corpus never cross-joins the queries.
    Recall vs brute force is asserted in tests.
    """
    from ..functions.vectors import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent_emb")
    )
    # cell assignment: argmax cosine over the 16 centroids
    assigned = (
        emb.join(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cent_id",
            cosine_similarity("embedding", "cent_emb").alias("csim"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cent_id"))
    cells = (
        assigned.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("vec_id", "embedding", F.col("cent_id").alias("cell"))
    )
    # queries probe their 2 nearest cells
    probes = (
        assigned.where(F.col("vec_id") < 5)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"),
                F.col("cent_id").alias("cell"))
    )
    cand = probes.join(cells, "cell").where(F.col("vec_id") != F.col("q_id"))
    sims = cand.select(
        "q_id",
        "vec_id",
        F.round(cosine_similarity("q_emb", "embedding"), 6).alias("sim"),
    )
    wq = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        sims.withColumn("rk", F.row_number().over(wq).cast("long"))
        .where(F.col("rk") <= 5)
    )


@query("multimodal_frame_sample")  # no oracle: binary decode is Spark-side only
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling for video-like payloads with a REAL decoder: each
    payload is a concatenated-PNG stream (intra-only "video"); the
    sampler walks the stream by chunk framing (functions.multimodal.
    iter_png_frames), keeps every 2nd frame, fully decodes it (CRC
    verify + zlib inflate) and emits one typed row per sampled frame
    with per-channel pixel means — the explode-shaped decode an ffmpeg
    frame sampler produces, binary in → Arrow batches → typed rows out.
    """
    import pandas as pd

    docs = _t(spark, sf_dir, "documents").select("doc_id").repartition(
        spark.sparkContext.defaultParallelism
    )

    def sample_frames(it):
        from projet5_spark.functions.multimodal import (
            decode_png,
            iter_png_frames,
            synth_png_stream,
        )

        for pdf in it:
            rows = []
            for doc_id in pdf["doc_id"]:
                data = synth_png_stream(int(doc_id))
                for frame_no, (offset, frame) in enumerate(iter_png_frames(data)):
                    if frame_no % 2:  # sample every 2nd frame
                        continue
                    meta = decode_png(frame)
                    rows.append(
                        (
                            doc_id,
                            frame_no,
                            offset,
                            meta["width"],
                            meta["height"],
                            meta["features"],
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_no", "byte_offset", "width", "height", "features",
                ],
            )

    return docs.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_no long, byte_offset long, "
        "width long, height long, features array<double>",
    )
