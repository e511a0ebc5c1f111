"""Config & state models for the stream pipeline.

Carries over the reference's config schema (reference
``app/utils/models.py:26-219``: sources, destinations, steps, stream —
Pydantic discriminated unions on ``protocol`` / ``step_type``) with the
intended-semantics fixes from SURVEY.md §2E:

- ``step_type`` is the field AND what dispatch reads (ref bug #5),
- ``TransformStep.function`` holds a real callable (ref bug #13),
- the Load union contains the SMTP step (ref bug #8),
- string-literal unions replaced with proper typing (ref bug #7).

The payload flowing between steps is no longer a materialized
``StreamData`` envelope (ref ``models.py:242-297``) but a ``StepValue``:
a *lazy* Spark DataFrame, or a driver-side scalar/list produced by a
declared collect edge (SURVEY §2B13).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from typing import Annotated, Any, Literal, Union

from pydantic import BaseModel, ConfigDict, Field, model_validator

# ---------------------------------------------------------------- sources


class SourceSql(BaseModel):
    """JDBC relational source (ref models.py SourceSql / extractor.py:57-105)."""

    protocol: Literal["sql"] = "sql"
    name: str
    url: str  # full JDBC url
    driver: str = ""
    user: str = ""
    password: str = ""
    # SQL-literal rendering dialect for pushdown params: "ansi" for
    # standard-conforming backends (Derby, Postgres, DuckDB), "backslash"
    # for backends whose string literals process backslash escapes by
    # default (MySQL/MariaDB) — on those, an ansi-rendered value ending in
    # \ or containing \' breaks out of the quoted literal.
    dialect: Literal["ansi", "backslash"] = "ansi"


class SourceFile(BaseModel):
    """Table files on a locally-visible path (parquet/csv/json).

    Replaces the reference's fileshare byte-buffer read
    (extractor.py:29-37) with a distributed columnar scan.
    """

    protocol: Literal["file"] = "file"
    name: str
    path: str
    format: Literal["parquet", "csv", "json"] = "parquet"
    options: dict[str, str] = Field(default_factory=dict)
    schema_ddl: str | None = None  # explicit DDL schema; None → infer


class SourceSftp(BaseModel):
    """Remote file fetched to a local staging dir, then read (ref
    extractor.py:39-50; driver-side there too)."""

    protocol: Literal["sftp"] = "sftp"
    name: str
    host: str
    port: int = 22
    user: str = ""
    password: str = ""
    remote_path: str = ""
    format: Literal["parquet", "csv", "json"] = "csv"
    # pinned SHA256 host-key fingerprint; empty → system known_hosts only
    host_key_fingerprint: str = ""


class SourceDrive(BaseModel):
    """Google Drive source — stub in the reference (extractor.py:52-55)."""

    protocol: Literal["drive"] = "drive"
    name: str
    file_id: str = ""


Source = Annotated[
    Union[SourceSql, SourceFile, SourceSftp, SourceDrive],
    Field(discriminator="protocol"),
]

# ----------------------------------------------------------- destinations


class DestFileshare(BaseModel):
    """Write to a mounted path (ref loader.py:111-139)."""

    protocol: Literal["fileshare"] = "fileshare"
    name: str
    mount_path: str
    remote_dir: str = ""


class DestSftp(BaseModel):
    """Upload the written artifact over SFTP (ref loader.py:141-172)."""

    protocol: Literal["sftp"] = "sftp"
    name: str
    host: str
    port: int = 22
    user: str = ""
    password: str = ""
    remote_dir: str = ""
    # pinned SHA256 host-key fingerprint; empty → system known_hosts only
    host_key_fingerprint: str = ""


class DestSmtp(BaseModel):
    """Email delivery (ref loader.py:26-65)."""

    protocol: Literal["smtp"] = "smtp"
    name: str
    host: str
    port: int = 587
    user: str = ""
    password: str = ""
    use_tls: bool = True


class DestLake(BaseModel):
    """Partitioned lakehouse table on shared/object storage — the
    cluster-native delivery the reference's one-file-per-load model
    cannot express: Hive-style ``col=value/`` directory layout with
    optional in-file sort clustering (sinks.writers.write_partitioned_table),
    so downstream reads partition-prune statically and dynamically."""

    protocol: Literal["lake"] = "lake"
    name: str
    base_path: str


class DestDrive(BaseModel):
    """Google Drive sink — stub in the reference (loader.py:174-179)."""

    protocol: Literal["drive"] = "drive"
    name: str
    folder_id: str = ""


Destination = Annotated[
    Union[DestFileshare, DestSftp, DestSmtp, DestLake, DestDrive],
    Field(discriminator="protocol"),
]

# ------------------------------------------------------------------ steps


class ExtractStep(BaseModel):
    """Extract: source + (optionally templated) query → named DataFrame.

    ``params`` values support the reference grammar: literals,
    ``step:<name>`` and ``macro:<name>`` (ref extractor.py:107-120).
    """

    step_type: Literal["extract"] = "extract"
    name: str
    source: str  # source name
    output: str
    table: str | None = None  # file-source table name / jdbc table
    query: str | None = None  # inline SQL with ::key:: placeholders
    query_file: str | None = None  # path to SQL template
    params: dict[str, Any] = Field(default_factory=dict)


class TransformStep(BaseModel):
    """Transform: named inputs → user function → named outputs.

    The function contract is Spark-native:
    ``dict[str, DataFrame|Any] → dict[str, DataFrame|Any]`` — the lazy
    analog of the reference's pandas TransformFunc
    (ref models.py:225-230, README.md:86-89).
    """

    model_config = ConfigDict(arbitrary_types_allowed=True)

    step_type: Literal["transform"] = "transform"
    name: str
    input: list[str]
    output: list[str]
    function: Callable[..., dict[str, Any]] | None = None
    function_name: str | None = None  # resolved from the registry at load


class CollectStep(BaseModel):
    """Declared lazy→driver edge (SURVEY §2B13): collect one column of an
    upstream DataFrame into a Python list (for ``step:`` params /
    recipients). The only place the runner materializes mid-DAG."""

    step_type: Literal["collect"] = "collect"
    name: str
    input: str
    output: str
    column: str | None = None  # default: first column
    mode: Literal["list", "scalar"] = "list"


class LoadStep(BaseModel):
    """Load: named input → destination. Includes SMTP (ref bug #8 made
    SmtpLoadStep unreachable from config)."""

    step_type: Literal["load"] = "load"
    name: str
    destination: str
    input: str
    file_name: str = "output.csv"
    # None -> destination default (csv for file-artifact sinks, parquet
    # for lake); an EXPLICIT value is honored or rejected, never coerced
    format: Literal["csv", "parquet", "json"] | None = None
    single_file: bool = True  # reference semantics: one artifact per load
    # lake-only: partition column(s) and optional in-file sort columns
    partition_by: list[str] = Field(default_factory=list)
    sort_by: list[str] = Field(default_factory=list)
    # smtp-only:
    subject: str = ""
    sender: str = ""
    recipients: list[str] = Field(default_factory=list)  # literal or "step:<name>"
    body: str = ""


Step = Annotated[
    Union[ExtractStep, TransformStep, CollectStep, LoadStep],
    Field(discriminator="step_type"),
]

# ----------------------------------------------------------------- stream


class Stream(BaseModel):
    """One named pipeline: ordered steps over shared named outputs
    (ref models.py Stream + sample.config.yaml:69-207)."""

    name: str
    log_level: str = "INFO"
    sources: list[Source] = Field(default_factory=list)
    destinations: list[Destination] = Field(default_factory=list)
    steps: list[Step]

    def source(self, name: str) -> Source:
        for s in self.sources:
            if s.name == name:
                return s
        raise KeyError(f"unknown source {name!r}")

    def destination(self, name: str) -> Destination:
        for d in self.destinations:
            if d.name == name:
                return d
        raise KeyError(f"unknown destination {name!r}")

    @model_validator(mode="after")
    def _validate_lake_loads(self) -> "Stream":
        """Lake-load rules fail at config time, not after the cluster has
        run every upstream step: partition_by is required, and csv (a
        headerless-schema format with no statistics) is rejected rather
        than silently rewritten."""
        dests = {d.name: d for d in self.destinations}
        for step in self.steps:
            if getattr(step, "step_type", "") != "load":
                continue
            dest = dests.get(step.destination)
            if dest is None or dest.protocol != "lake":
                continue
            if not step.partition_by:
                raise ValueError(
                    f"load step {step.name!r}: lake destination requires partition_by"
                )
            if step.format == "csv":
                raise ValueError(
                    f"load step {step.name!r}: csv is not supported for lake "
                    "tables (no types/stats for pruning); use parquet or json"
                )
        return self


class DestinationResponse(BaseModel):
    """Per-load delivery receipt (ref models.py:300-305)."""

    destination_name: str
    status: Literal["success", "failure"]
    message: str = ""
    records_processed: int = 0
    timestamp: dt.datetime = Field(default_factory=dt.datetime.now)


class RunResult(BaseModel):
    """Run metadata (ref DataStore, models.py:308-321) — without the
    materialized step_outputs dict: intermediates are lazy plans owned by
    the runner, not state to persist."""

    run_id: str
    stream_name: str
    status: Literal["running", "success", "failed"]
    start_time: dt.datetime
    end_time: dt.datetime | None = None
    dest_responses: list[DestinationResponse] = Field(default_factory=list)
