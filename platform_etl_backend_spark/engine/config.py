"""Configuration model for IO resources and steps.

Reference parity: ``backend/Configuration.scala`` — HOCON → pureconfig case
classes. Here: plain dataclasses (optionally loadable from dict/JSON/YAML-ish
nested dicts), with the same write-mode validation
(``Configuration.scala:188-197`` checks against Spark's five modes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

WRITE_MODES = frozenset({"error", "errorifexists", "append", "overwrite", "ignore"})


def validate_write_mode(mode: str) -> str:
    """Reject anything that isn't one of Spark's DataFrameWriter modes."""
    if mode.lower() not in WRITE_MODES:
        raise ValueError(f"Invalid write mode '{mode}'; valid: {sorted(WRITE_MODES)}")
    return mode.lower()


@dataclass(frozen=True)
class IOResourceConfig:
    """One named input or output (reference ``IOResourceConfig``,
    Configuration.scala:205-210): format + path + reader/writer options +
    optional partition columns."""

    format: str
    path: str
    options: Mapping[str, str] = field(default_factory=dict)
    partition_by: tuple[str, ...] = ()
    write_mode: str = "error"
    # S9 single-file outputs (Epmc.scala:73, OpenFdaCompute.scala:63-64):
    # only set when single-file is a semantic requirement — at scale it
    # serializes the write through one task.
    coalesce: int | None = None
    # Physical output clustering (Interaction.scala:440 repartitionByRange):
    # rows are range-partitioned on these columns before the write, so each
    # output file covers a disjoint key range — downstream merge joins and
    # range scans on the cluster keys skip files. ``range_partitions`` bounds
    # the file count (the reference pins 200); None lets AQE pick.
    range_partition_by: tuple[str, ...] = ()
    range_partitions: int | None = None
    # Hash-bucketed table layout (Spark's bucketBy/sortBy): rows hashed on
    # bucket_by into n_buckets files per partition, optionally sorted within
    # each bucket. Two tables bucketed the same way join WITHOUT a shuffle —
    # the amortize-one-shuffle-across-many-joins strategy for repeated
    # big-big joins at 100 TB. Bucketed writes go through saveAsTable (a
    # Spark requirement); the table name comes from ``table_name`` or the
    # last path segment.
    bucket_by: tuple[str, ...] = ()
    n_buckets: int | None = None
    sort_by: tuple[str, ...] = ()
    table_name: str | None = None
    # Z-order (Morton) clustering: multi-dimensional file skipping —
    # min/max footers prune on ANY z-column, not just a single sort key
    # (operators/layout.py). zorder_partitions bounds the file count.
    zorder_by: tuple[str, ...] = ()
    zorder_partitions: int | None = None
    zorder_bits: int = 12

    def __post_init__(self) -> None:
        validate_write_mode(self.write_mode)
        if self.range_partitions is not None and not self.range_partition_by:
            raise ValueError("range_partitions requires range_partition_by columns")
        if self.range_partition_by and self.coalesce:
            raise ValueError(
                "coalesce would collapse range clustering; set one or the other"
            )
        if self.bucket_by and not self.n_buckets:
            raise ValueError("bucket_by requires n_buckets")
        if self.sort_by and not self.bucket_by:
            raise ValueError("sort_by requires bucket_by (Spark sortBy is per-bucket)")
        if self.bucket_by and (self.range_partition_by or self.coalesce):
            raise ValueError("bucket_by excludes range clustering / coalesce")
        if self.zorder_by and len(self.zorder_by) < 2:
            raise ValueError("zorder_by needs at least 2 columns")
        if self.zorder_by and (
            self.range_partition_by or self.bucket_by or self.coalesce
        ):
            raise ValueError("zorder_by excludes other physical layouts")

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "IOResourceConfig":
        return cls(
            format=d["format"],
            path=d["path"],
            options=dict(d.get("options", {})),
            partition_by=tuple(d.get("partition_by", ())),
            write_mode=d.get("write_mode", "error"),
            coalesce=d.get("coalesce"),
            range_partition_by=tuple(d.get("range_partition_by", ())),
            range_partitions=d.get("range_partitions"),
            bucket_by=tuple(d.get("bucket_by", ())),
            n_buckets=d.get("n_buckets"),
            sort_by=tuple(d.get("sort_by", ())),
            table_name=d.get("table_name"),
            zorder_by=tuple(d.get("zorder_by", ())),
            zorder_partitions=d.get("zorder_partitions"),
            zorder_bits=d.get("zorder_bits", 12),
        )


def parse_input_map(conf: Mapping[str, Mapping[str, Any]]) -> dict[str, IOResourceConfig]:
    """A step's input block: name → IOResourceConfig (IoHelpers.scala:42-43)."""
    return {name: IOResourceConfig.from_dict(d) for name, d in conf.items()}
