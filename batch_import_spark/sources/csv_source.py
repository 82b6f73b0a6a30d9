"""Reference-style CSV node/relationship/index file source.

Reproduces the reference's scan stack (SURVEY.md §2.1 S1-S9) on
Spark's CSV reader:

- S1/S2: buffered scan + transparent .gz — built into spark.read.csv;
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

Scale note: a single .gz file is unsplittable; at 100 TB inputs arrive
as many files so parallelism comes from the file list — same contract
as the reference's comma-separated multi-file config.
"""

from __future__ import annotations

import gzip
import io
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_import_spark.schema import HeaderField, convert_column, parse_header


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
    if isinstance(paths, str):
        paths = [p for p in paths.split(",") if p]
    header = parse_header(_split_header_line(_read_first_line(paths[0]), delim, quotes))

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
        # 0-based data-row number within this file. A CSV file's rows
        # keep file order across its splits; zipWithIndex preserves it.
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
    """Attach a 0-based, file-order row number to a single-file scan.

    Uses RDD zipWithIndex (order-preserving across splits; one extra
    count job). Applied per file so multi-file lists keep the
    reference's sequential-ID semantics (readme.md:38). The row payload
    stays opaque — no Python-side per-column work.
    """
    schema = df.schema.add("line_no", T.LongType(), False)
    rdd = df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1]))
    return df.sparkSession.createDataFrame(rdd, schema)
