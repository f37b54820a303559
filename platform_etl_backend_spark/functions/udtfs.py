"""Python UDTFs (Spark 4's user-defined table functions).

``ParseOboTerm`` distributes the engine's ONE remaining driver-side flat
parse: OBO ontology stanzas. Composed with the ``flat_record`` DataSource
(delimiter ``[Term]``), the whole read becomes

    spark.read.format("flat_record") → lateral parse_obo_term(record)

so an ontology of any size parses executor-side. The driver-side
``sources/flatfile.read_obo`` stays for tiny files (reference parity:
GoConverter.scala:24-44 parses on the driver too); both paths are asserted
identical in tests.

UDTFs are Python-row-path — appropriate here because stanza parsing is
stateful line iteration that Catalyst cannot express, and ontology stanzas
are small; never use a UDTF where a higher-order function works (repo rule:
no Python in hot paths).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="id: string, name: string, is_a: array<string>, obsolete: boolean")
class ParseOboTerm:
    """One input row = the text following a ``[Term]`` marker; yields the
    parsed term, or nothing for non-term/obsolete-header content. Parsing
    stops at the first following stanza header (``[Typedef]`` etc.) —
    identical field semantics to ``sources/flatfile.parse_obo``."""

    def eval(self, stanza: str):  # noqa: D102 - UDTF contract
        if stanza is None:
            return
        term_id = name = None
        is_a: list[str] = []
        obsolete = False
        for raw in stanza.splitlines():
            line = raw.strip()
            if line.startswith("[") and line.endswith("]"):
                break  # next stanza type ([Typedef], ...) — not ours
            if ": " not in line:
                continue
            key, _, val = line.partition(": ")
            if key == "id":
                term_id = val
            elif key == "name":
                name = val
            elif key == "is_a":
                is_a.append(val.split(" !")[0].strip())
            elif key == "is_obsolete" and val == "true":
                obsolete = True
        if term_id is not None:
            yield term_id, name, is_a, obsolete


def read_obo_distributed(spark, path: str):
    """OBO → DataFrame(id, name, is_a, obsolete), fully executor-side:
    flat_record splits the file on ``[Term]`` markers, the UDTF parses each
    stanza. Same output contract as ``sources/flatfile.read_obo``."""
    from pyspark.sql.functions import col

    from platform_etl_backend_spark.sources.pydatasource import register

    register(spark)
    spark.udtf.register("parse_obo_term", ParseOboTerm)
    records = (
        spark.read.format("flat_record")
        .option("path", path)
        .option("delimiter", "[Term]")
        .load()
    )
    records.createOrReplaceTempView("_obo_records")
    # the first record (file header before any [Term]) yields no id row
    return spark.sql(
        "SELECT t.* FROM _obo_records, LATERAL parse_obo_term(record) t"
    ).where(col("id").isNotNull())
