"""Flat-file sources the reference parses outside Spark readers.

- OBO ontology files (``[Term]`` stanzas) — reference parses on the driver
  (preprocess/go/GoConverter.scala:24-44); same shape here (ontology files
  are tiny), yielding a DataFrame.
- UniprotKB-style record-delimited text — the reference streams the WHOLE
  file through the driver (Target.scala:453-472 toLocalIterator + ~350 LoC
  of Scala parsing). This port distributes it: Hadoop's
  ``textinputformat.record.delimiter`` splits records in parallel and all
  field extraction is Catalyst expressions over line arrays — the
  100TB-safe design the reference lacks.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_obo(path: str) -> Iterator[dict]:
    """Yield {id, name, is_a: [..], obsolete} per [Term] stanza."""
    term = None
    with open(path, "r", encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if line == "[Term]":
                if term and "id" in term:
                    yield term
                term = {"is_a": [], "obsolete": False}
            elif line.startswith("[") and line.endswith("]"):
                if term and "id" in term:
                    yield term
                term = None
            elif term is not None and ": " in line:
                key, _, val = line.partition(": ")
                if key == "id":
                    term["id"] = val
                elif key == "name":
                    term["name"] = val
                elif key == "is_a":
                    term["is_a"].append(val.split(" !")[0].strip())
                elif key == "is_obsolete" and val == "true":
                    term["obsolete"] = True
    if term and "id" in term:
        yield term


def read_obo(spark: SparkSession, path: str) -> DataFrame:
    """OBO → DataFrame(id, name, is_a array, obsolete) (driver-side parse,
    like the reference — ontologies are small by nature)."""
    rows = [
        (t.get("id"), t.get("name"), t.get("is_a", []), t.get("obsolete", False))
        for t in parse_obo(path)
    ]
    return spark.createDataFrame(
        rows, "id: string, name: string, is_a: array<string>, obsolete: boolean"
    )


def read_delimited_records(
    spark: SparkSession, path: str, delimiter: str = "//\n"
) -> DataFrame:
    """Distributed record-delimited text reader: one row per record.

    Uses Hadoop TextInputFormat with a custom record delimiter so a single
    multi-GB flat file still splits across executors.
    """
    sc = spark.sparkContext
    conf = {"textinputformat.record.delimiter": delimiter}
    rdd = sc.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf=conf,
    ).map(lambda kv: (kv[1],))
    return spark.createDataFrame(rdd, "record: string").where(
        F.length(F.trim("record")) > 0
    )


def parse_uniprot_records(records: DataFrame) -> DataFrame:
    """UniprotKB flat-file field extraction, all in Catalyst.

    Line codes handled (the subset the reference's converter extracts,
    preprocess/uniprot/UniprotConverter.scala:51-95): AC (accessions),
    ID (entry name), DE (descriptions), GN (gene names), DR (db refs),
    CC (comment text).
    """
    lines = F.split(F.col("record"), "\n")

    def lines_with(prefix: str):
        return F.transform(
            F.filter(lines, lambda l: l.startswith(prefix + "   ")),
            lambda l: F.trim(F.substring(l, 6, 10_000)),
        )

    accessions = F.flatten(
        F.transform(
            lines_with("AC"),
            lambda l: F.filter(F.split(F.regexp_replace(l, ";\\s*$", ""), ";\\s*"),
                               lambda x: x != ""),
        )
    )
    entry_name = F.element_at(
        F.split(F.element_at(F.filter(lines, lambda l: l.startswith("ID   ")), 1), "\\s+"), 2
    )
    return records.select(
        entry_name.alias("entry_name"),
        accessions.alias("accessions"),
        lines_with("DE").alias("descriptions"),
        lines_with("GN").alias("gene_lines"),
        lines_with("DR").alias("db_refs"),
        lines_with("CC").alias("comment_lines"),
    ).where(F.col("entry_name").isNotNull())
