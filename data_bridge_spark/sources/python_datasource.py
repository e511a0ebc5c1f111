"""Custom Python DataSource (Spark 4 DataSource API).

The modern replacement for the reference's ad-hoc byte-buffer pulls
(reference ``app/utils/extractor.py:29-55``): a first-class, *partitioned*
source the planner schedules across executors. This one generates a
deterministic synthetic document corpus (seeded counter-based hashing, no
RNG state) — each partition produces its slice independently, which is
exactly the contract a remote/object-store source implements.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_WORDS = (
    "spark data query join filter scan table row column hash sort merge "
    "window group agg stream batch vector key value fast slow small large"
).split()


def _h(*parts: object) -> int:
    payload = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(payload).digest()[:8], "big")


def make_doc(doc_id: int, seed: int) -> tuple[int, str, str, int]:
    n_tokens = 20 + _h(seed, doc_id, "len") % 60
    words = [_WORDS[_h(seed, doc_id, i) % len(_WORDS)] for i in range(n_tokens)]
    text = " ".join(words)
    lang = ("en", "es", "fr", "de")[_h(seed, doc_id, "lang") % 4]
    return doc_id, text, lang, len(text)


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs").option("rows", N)`` → N documents.

    Options: rows (total), partitions (parallelism), seed.
    """

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, n_chars int"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(
            rows=int(self.options.get("rows", 1000)),
            num_partitions=int(self.options.get("partitions", 8)),
            seed=int(self.options.get("seed", 42)),
        )


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthDocsReader(DataSourceReader):
    def __init__(self, rows: int, num_partitions: int, seed: int):
        self.rows, self.num_partitions, self.seed = rows, num_partitions, seed

    def partitions(self) -> list[_Slice]:
        per = -(-self.rows // self.num_partitions)
        return [
            _Slice(i * per, min((i + 1) * per, self.rows), self.seed)
            for i in range(self.num_partitions)
            if i * per < self.rows
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield make_doc(doc_id, partition.seed)


def register_synthdocs(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
