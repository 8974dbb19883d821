"""Category-split Parquet sink — the reference's 16-table output layout
(src/metadata/parquet.rs:30-70): per-format file tables (files_jpeg ..
files_webp, files_other), enriched artefact tables (urls/emails/phones),
browser tables, entropy_regions, run_summary.

One write per category; zip/ole classified kinds (docx, xls, ...)
land in files_zip / files_other exactly like the reference groups them
by scanner type. `partitionBy`-style single-pass alternatives exist,
but distinct schemas per category (enriched artefacts) make separate
writes the honest layout — each is an independent parallel columnar
write, replacing the reference's single-writer metadata thread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from swiftbeaver_spark.strings_scan import enrich_emails, enrich_phones, enrich_urls

# dedicated per-format tables (reference ParquetCategory)
_DEDICATED = ("jpeg", "png", "gif", "sqlite", "pdf", "zip", "webp")
# zip-classified kinds still belong to the zip scanner's table
_ZIP_FAMILY = ("zip", "docx", "xlsx", "pptx", "odt", "ods", "odp", "epub")


def write_category_tables(
    tables: dict[str, DataFrame],
    out_dir: str,
    run_id: str,
) -> list[str]:
    """Write the category layout; returns the written table names."""
    written: list[str] = []

    def _write(name: str, df: DataFrame) -> None:
        df.withColumn("run_id", F.lit(run_id)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}"
        )
        written.append(name)

    carved = tables.get("carved_files")
    if carved is not None:
        carved = carved.cache()
        try:
            for ftype in _DEDICATED:
                if ftype == "zip":
                    part = carved.where(F.col("file_type").isin(*_ZIP_FAMILY))
                else:
                    part = carved.where(F.col("file_type") == ftype)
                _write(f"files_{ftype}", part)
            others = carved.where(
                ~F.col("file_type").isin(*(_DEDICATED + _ZIP_FAMILY))
            )
            _write("files_other", others)
        finally:
            # The cache only amortizes the 8 category scans above; a
            # long-lived session writing many runs must not accumulate
            # cached tables (blocking=False: drop lazily, don't stall
            # the write path on executor eviction).
            carved.unpersist(blocking=False)

    artefacts = tables.get("string_artefacts")
    if artefacts is not None:
        artefacts = artefacts.cache()
        try:
            _write("artefacts_urls", enrich_urls(artefacts))
            _write("artefacts_emails", enrich_emails(artefacts))
            _write("artefacts_phones", enrich_phones(artefacts))
        finally:
            artefacts.unpersist(blocking=False)

    for name in (
        "browser_history",
        "browser_cookies",
        "browser_downloads",
        "entropy_regions",
        "run_summary",
    ):
        if name in tables:
            _write(name, tables[name])
    return written
