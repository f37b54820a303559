from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from platform_etl_backend_spark.engine.config import IOResourceConfig
from platform_etl_backend_spark.engine.io import read_single
from platform_etl_backend_spark.steps import run_step


def test_corrupt_json_records_permissive(spark, tmp_path):
    """Malformed JSON lines survive as _corrupt_record instead of failing
    the job (PERMISSIVE default — matters on 100TB of scraped JSONL)."""
    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1, "v": "ok"}\n{broken json}\n{"id": 2, "v": "ok2"}\n')
    df = read_single(
        spark,
        IOResourceConfig(
            format="json",
            path=str(p),
            options={"columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    ).cache()
    assert df.count() == 3
    good = df.where(F.col("id").isNotNull())
    assert good.count() == 2
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert bad.count() == 1
    df.unpersist()


def test_corrupt_json_failfast_raises(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text('{"id": 1}\n{broken}\n')
    # FAILFAST already rejects the file at schema inference (load time)
    with pytest.raises(Exception, match="(?i)malformed"):
        read_single(
            spark,
            IOResourceConfig(format="json", path=str(p), options={"mode": "FAILFAST"}),
        ).collect()


def test_csv_malformed_rows_dropped(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,v\n1,a\nthis,row,has,too,many,columns\n2,b\n")
    df = read_single(
        spark,
        IOResourceConfig(
            format="csv",
            path=str(p),
            options={"header": "true", "mode": "DROPMALFORMED"},
        ),
    )
    assert [(r.id, r.v) for r in df.orderBy("id").collect()] == [("1", "a"), ("2", "b")]


def test_embedding_step_via_runner(spark, tmp_path):
    pubs = spark.createDataFrame(
        [("spark query engine",), ("spark fast engine",)] * 5, ["text"]
    )
    out = run_step(
        spark, "embedding", {"publications": pubs},
        model_path=str(tmp_path / "w2v"), vector_size=8, num_partitions=2, max_iter=1,
    )["vectors"]
    assert {r.word for r in out.collect()} == {"spark", "query", "engine", "fast"}
    from pyspark.ml.feature import Word2VecModel

    assert Word2VecModel.load(str(tmp_path / "w2v")).getVectors().count() == 4
