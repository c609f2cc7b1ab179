"""File ingestion: encoding/separator sniffing + format dispatch
(SURVEY §2.1 S1-S8).

Spark's CSV reader takes encoding/sep as options but never sniffs; the
reference sniffs on a 10 kB sample with a fallback cascade
(utils/file_handlers.py:12-68,139-154). Sniffing is inherently
driver-side and O(10 kB), so it stays a tiny helper in front of the
distributed read. Excel scans (S1) dispatch to stdlib codecs — no
third-party engines: ``sources/xlsx.py`` (ECMA-376 zip-of-XML),
``sources/xls.py`` (CFB+BIFF8), ``sources/xlsb.py`` (OPC+BIFF12) —
covering every engine the reference selects (file_handlers.py:84-90).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# the reference's fallback cascade (file_handlers.py:30-38), sans chardet
ENCODING_CASCADE = ["utf-8", "utf-8-sig", "cp1250", "cp1252", "latin1"]
SEPARATORS = [",", ";", "\t", "|"]


def detect_encoding(path: str | Path, sample_bytes: int = 10_000) -> str:
    """First encoding in the cascade that decodes a head sample cleanly."""
    raw = Path(path).open("rb").read(sample_bytes)
    for enc in ENCODING_CASCADE:
        try:
            raw.decode(enc)
            return enc
        except UnicodeDecodeError:
            continue
    return "latin1"  # decodes anything (the reference's last resort)


def detect_separator(path: str | Path, encoding: str | None = None,
                     n_lines: int = 5) -> str:
    """Count candidate separators over the first lines, pick the max
    (reference file_handlers.py:41-68)."""
    enc = encoding or detect_encoding(path)
    counts = dict.fromkeys(SEPARATORS, 0)
    with Path(path).open("r", encoding=enc, errors="replace") as f:
        for _ in range(n_lines):
            line = f.readline()
            if not line:
                break
            for sep in SEPARATORS:
                counts[sep] += line.count(sep)
    return max(counts, key=counts.get) if any(counts.values()) else ","


def load_csv(spark: SparkSession, path: str | Path, *, header: bool = True,
             encoding: str | None = None, sep: str | None = None) -> DataFrame:
    """S2/S3 — CSV scan with sniffed encoding + separator."""
    enc = encoding or detect_encoding(path)
    s = sep or detect_separator(path, enc)
    return (
        spark.read.option("header", header)
        .option("encoding", enc)
        .option("sep", s)
        .option("inferSchema", True)
        .csv(str(path))
    )


def load_pipe_noisy(spark: SparkSession, path: str | Path,
                    header: bool = True) -> DataFrame:
    """S4 — pipe-separated file with stray quotes and bad lines
    (dopasywatorStruktur 1.py:29-62): QUOTE_NONE + skip malformed."""
    enc = detect_encoding(path)
    return (
        spark.read.option("header", header)
        .option("encoding", enc)
        .option("sep", "|")
        .option("quote", "")
        .option("mode", "DROPMALFORMED")
        .csv(str(path))
    )


def load_file(spark: SparkSession, path: str | Path, **kw) -> DataFrame:
    """S8 — extension dispatch (reference file_handlers.py:159-180)."""
    suffix = Path(path).suffix.lower()
    if suffix in (".csv", ".txt"):
        return load_csv(spark, path, **kw)
    if suffix == ".tsv":
        return load_csv(spark, path, sep="\t", **kw)
    if suffix == ".parquet":
        return spark.read.parquet(str(path))
    if suffix in (".json", ".jsonl", ".ndjson"):
        return spark.read.json(str(path))
    if suffix == ".xlsx":
        from datamatcher_spark.sources.xlsx import load_xlsx

        df, _names = load_xlsx(spark, path, **kw)
        return df
    if suffix == ".xls":
        from datamatcher_spark.sources.xls import load_xls

        df, _names = load_xls(spark, path, **kw)
        return df
    if suffix == ".xlsb":
        from datamatcher_spark.sources.xlsb import load_xlsb

        df, _names = load_xlsb(spark, path, **kw)
        return df
    raise ValueError(f"unsupported file format: {suffix}")


def write_csv_report(df: DataFrame, path: str | Path, *, header: bool = True,
                     single_file: bool = False) -> None:
    """S6 — CSV report sink (UTF-8). ``single_file=True`` coalesces for
    desktop-sized report extracts; never use it on big tables."""
    out = df.coalesce(1) if single_file else df
    (
        out.write.option("header", header)
        .option("encoding", "UTF-8")
        .mode("overwrite")
        .csv(str(path))
    )


def write_table(df: DataFrame, path: str | Path, mode: str = "append") -> None:
    """S5/S7 — table sink. Parquet append here; with an Iceberg catalog
    this is ``df.writeTo(table).append()`` and snapshots replace the
    reference's backup-before-write copies (file_handlers.py:231-251)."""
    df.write.mode(mode).parquet(str(path))
