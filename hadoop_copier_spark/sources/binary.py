"""Binary file source (SURVEY §2b 'Binary/multimodal source' P row).

The reference's raw byte-stream scan (R1/R6,
m/service/HdfsCopyService.java:124-134) maps to Spark's ``binaryFile``
format: rows of (path, modificationTime, length, content BinaryType),
recursive lookup included — the enumeration the reference hand-rolled with
a Stack (R4) is the file index here.

At 100 TB: binaryFile splits by file; pair with
``spark.sql.files.maxPartitionBytes`` and a manifest-based work list (see
copyjob) when files are huge.

CAVEAT (verified empirically): Spark's binaryFile source silently skips
zero-length files — a tree with empty files enumerates fewer rows than the
reference's DFS would. The copy job (copyjob.py) does NOT share this gap:
its driver-side listing includes empty files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_dir(
    spark: SparkSession, path: str, glob: str | None = None, recursive: bool = True
) -> DataFrame:
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)
