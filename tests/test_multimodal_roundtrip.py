from __future__ import annotations

from pyspark.sql import functions as F

from platform_etl_backend_spark.operators import multimodal as M
from platform_etl_backend_spark.operators.similarity import brute_force_topk


def test_media_store_roundtrip_and_search(spark, sf_dir, tmp_path):
    """End-to-end multimodal pipeline: build a binary media store from the
    documents table, write partitioned parquet, read back, decode features
    via mapInPandas, and run similarity search over the features."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = M.attach_media_meta(
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("data"),
            F.col("lang"),
        ),
        "data",
    )
    out = str(tmp_path / "media_store")
    media.write.mode("overwrite").partitionBy("lang").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert dict(back.dtypes)["data"] == "binary"
    assert back.schema["meta"].dataType.fieldNames() == [
        "format", "width", "height", "n_frames"
    ]
    # partition pruning on the media store
    pruned = back.where(F.col("lang") == "en")
    from platform_etl_backend_spark.plans import explain_str

    plan = explain_str(pruned, "formatted")
    assert any("PartitionFilters" in l and "lang" in l for l in plan.splitlines())

    feats = M.decode_features(back, "media_id", "data")
    sample = feats.limit(50).withColumnRenamed("features", "embedding")
    queries = sample.where(F.col("media_id") < 3)
    knn = brute_force_topk(sample, queries, "media_id", "embedding", k=2)
    rows = knn.collect()
    assert len(rows) == queries.count() * 2
    assert all(-1.0 <= r.cos <= 1.0 for r in rows)
