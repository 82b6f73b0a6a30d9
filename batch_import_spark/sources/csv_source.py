"""Reference-style CSV node/relationship/index file source.

Reproduces the reference's scan stack (SURVEY.md §2.1 S1-S9) on
Spark's CSV reader:

- S1/S2: buffered scan + transparent .gz — built into spark.read.csv;
  .zip (also reference-supported, Importer.java:248-250) is extracted
  driver-side to local temp first — Spark's reader can't split or
  decompress zip;
- S3: multi-file lists imported *in declared order* (Config.java:145-154)
  — we read files separately and carry a file_seq so dense row-number
  IDs can span files in sequence (readme.md:38);
- S4: first row is the schema: ``name[:type[:indexName]]``
  (AbstractLineData.java:39-58) — parsed driver-side from the first
  line, data read with an explicit all-string schema and header
  skipped, then typed by expression (schema.convert_column);
- S5/S6/S7: quoted CSV (OpenCSV: quote ``"``, escape ``\\``, embedded
  newlines — CsvLineData.java:13-37) vs raw fast tokenizer — maps to
  reader options quote/escape/multiLine; ``quotes=False`` mirrors
  batch_import.csv.quotes=false (Config.java:185-187);
- S8: delimiter config, default TAB (Config.java:179-183);
- P2: empty cell → NULL (property later omitted);
- P6: short rows null-padded, extra columns dropped (PERMISSIVE).

DIVERGENCE (deliberate): blank lines are SKIPPED, not treated as
end-of-data. The reference stops the whole import at the first blank
line (AbstractLineData.java:70-73 ``processLine = parse() > 0`` +
Importer.java:96 loop) — silent truncation, a data-loss hazard at
100 TB. Tested in test_reference_semantics.py.

Scale note: a single .gz file is unsplittable; at 100 TB inputs arrive
as many files so parallelism comes from the file list — same contract
as the reference's comma-separated multi-file config.
"""

from __future__ import annotations

import gzip
import io
import tempfile
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from batch_import_spark.schema import HeaderField, assert_ansi, convert_column, parse_header


@dataclass(frozen=True)
class ReferenceCsv:
    """A typed, reference-semantics view of one or more CSV files."""

    df: DataFrame  # typed columns, plus file_seq + line_no (0-based per file)
    header: list[HeaderField]


def _read_first_line(path: str, encoding: str = "utf-8") -> str:
    """Driver-side header peek (the header is one tiny line).

    Handles .gz / .zip like Importer.java:248-250.
    """
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            raw = f.readline()
    elif path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            name = z.namelist()[0]
            with z.open(name) as f:
                raw = io.BufferedReader(f).readline()
    else:
        with open(path, "rb") as f:
            raw = f.readline()
    return raw.decode(encoding).rstrip("\r\n")


def _split_header_line(line: str, delim: str, quotes: bool) -> list[str]:
    if not quotes:
        return line.split(delim)
    # minimal quoted split for the header line only (data goes through
    # Spark's parser); headers in practice are unquoted identifiers
    import csv as _csv

    return next(_csv.reader([line], delimiter=delim, quotechar='"', escapechar="\\"))


def _maybe_extract_zip(paths: list[str]) -> list[str]:
    """Driver-side .zip extraction (Spark's CSV reader decompresses
    .gz by extension but NOT .zip; Importer.java:248-250 supports both).

    Mirrors the reference's posture: zip decompression is inherently
    single-stream. At 100 TB, inputs should arrive as .gz/parquet — a
    .zip is a convenience path, extracted once to local temp.
    """
    out = []
    for p in paths:
        if p.endswith(".zip"):
            d = tempfile.mkdtemp(prefix="batch_import_zip_")
            with zipfile.ZipFile(p) as z:
                names = z.namelist()
                if not names:
                    raise ValueError(f"empty zip archive: {p}")
                out.append(z.extract(names[0], d))
        else:
            out.append(p)
    return out


def read_reference_csv(
    spark: SparkSession,
    paths: list[str] | str,
    delim: str = "\t",
    quotes: bool = True,
    array_separator: str = ",",
) -> ReferenceCsv:
    """Read reference-format CSV file(s) into one typed DataFrame.

    Columns are named per the header; extra trailing ``file_seq`` and
    ``line_no`` columns give (file index in the declared list, 0-based
    data row within the file) — together the stable total order that
    reference row-number node IDs are defined over.
    """
    # fail-fast typed conversion needs ANSI casts on THIS path, not
    # just under pytest (readme.md:41-42: bad cells abort the import)
    assert_ansi(spark)
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    paths = _maybe_extract_zip(paths)
    first_lines = [_read_first_line(p) for p in paths]
    header = parse_header(_split_header_line(first_lines[0], delim, quotes))
    # the reference imports each file under its OWN header
    # (Importer.doImport per file); a list is only mergeable when the
    # headers agree — otherwise file 1's schema silently mislabels the
    # rest, so fail fast and let the caller import per file (the
    # id_offset parameter of import_nodes supports sequential ids).
    for p, line in zip(paths[1:], first_lines[1:]):
        if _split_header_line(line, delim, quotes) != _split_header_line(
            first_lines[0], delim, quotes
        ):
            raise ValueError(
                f"header of {p!r} differs from {paths[0]!r}; import these "
                "files separately (per-file headers, Importer.doImport)"
            )

    raw_schema = T.StructType(
        [T.StructField(f"_c{i}", T.StringType(), True) for i in range(len(header))]
    )
    reader_opts = {
        "sep": delim,
        "header": "true",  # skip the in-band schema row (schema enforced)
        "enforceSchema": "true",
        "mode": "PERMISSIVE",  # P6: pad short rows, drop extra columns
        "encoding": "UTF-8",
    }
    if quotes:
        reader_opts.update({"quote": '"', "escape": "\\", "multiLine": "true"})
    else:
        # raw tokenizer path (Chunker): no quote handling at all
        reader_opts.update({"quote": "\u0000"})

    parts = []
    for seq, path in enumerate(paths):
        fdf = spark.read.options(**reader_opts).schema(raw_schema).csv(path)
        fdf = _with_line_no(fdf)
        parts.append(fdf.withColumn("file_seq", F.lit(seq)))
    raw = parts[0]
    for p in parts[1:]:
        raw = raw.unionByName(p)

    typed = raw.select(
        *[
            convert_column(F.col(f"_c{h.column}"), h.type_name, array_separator).alias(h.col_name)
            for h in header
        ],
        "file_seq",
        "line_no",
    )
    return ReferenceCsv(df=typed, header=header)


def _with_line_no(df: DataFrame) -> DataFrame:
    """Attach a 0-based, file-order row number to a single-file scan —
    entirely JVM-side (no RDD round-trip through Python).

    A single-file CSV scan assigns partition indexes in file-offset
    order and preserves row order within each split, and that
    partitioning is a pure function of (file size, maxPartitionBytes)
    — NOT sampled — so the per-partition count job and the row-number
    job below are guaranteed to see the same assignment (unlike
    repartitionByRange, which needs a checkpoint; see operators/ids.py).
    ``monotonically_increasing_id`` is (partition_id << 33) + position,
    i.e. deterministic in-partition file order here.

    Plan shape: scan → tiny count-per-split job → per-partition window
    (1:1 shuffle on _pid) + broadcast join of ~n_splits offsets. One
    extra pass over the file, zero Python serialization.
    """
    pdf = df.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_mid", F.monotonically_increasing_id()
    )
    counts = pdf.groupBy("_pid").count().collect()
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["count"]
    spark = df.sparkSession
    odf = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy("_mid")
    return (
        pdf.withColumn("_rn", F.row_number().over(w) - 1)
        .join(F.broadcast(odf), "_pid")
        .withColumn("line_no", (F.col("_offset") + F.col("_rn")).cast("long"))
        .drop("_pid", "_mid", "_rn", "_offset")
    )
