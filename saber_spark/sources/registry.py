"""Generic table connector: read AND write through one seam.

The reference reads only CoNLL TSV / word2vec / HDF5 (SURVEY.md §2.1 note);
this engine inherits parquet/csv/json/orc/text from Spark and exposes them
uniformly so every pipeline input (pages, dictionaries, corpora) can come
from any format. All pipeline/checkpoint/streaming SINKS also go through
this module (``write_table`` / ``merge_upsert``), so switching the table
format — in particular to Iceberg, per the north rule — is a config value,
not a rewrite. The Iceberg runtime jar is not in this sandbox, so parquet
stands in with identical DataFrame semantics; the ``iceberg`` branches below
are the deploy-time path.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "orc", "text", "iceberg"}

# Engine-wide default sink format. Set to "iceberg" at deploy time (with the
# runtime jar + catalog conf on the session) and every sink in the engine
# switches: write_table uses writeTo(...).createOrReplace and merge_upsert
# issues a transactional MERGE INTO.
DEFAULT_WRITE_FORMAT = "parquet"


def _check_fmt(fmt: str) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported format {fmt!r}; one of {sorted(_FORMATS)}")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None, **options) -> DataFrame:
    _check_fmt(fmt)
    if fmt == "iceberg":
        # catalog-table identifier, not a filesystem path
        return spark.read.format("iceberg").load(path)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def read_jsonl_corpus(spark: SparkSession, path: str, schema: str,
                      corrupt_col: str = "_corrupt_record") -> DataFrame:
    """JSON-Lines corpus ingest with malformed-line QUARANTINE.

    Web-text corpora ship as JSONL, and at 100 TB malformed lines are
    DATA, not exceptions: PERMISSIVE mode keeps every unparseable line
    verbatim in ``corrupt_col`` (parsed columns NULL) instead of failing
    the job or silently dropping rows. Valid rows carry NULL there, so
    the standard pattern downstream is

        df = read_jsonl_corpus(spark, path, "doc_id BIGINT, text STRING")
        clean = df.filter(F.col("_corrupt_record").isNull()).drop(...)
        quarantine = df.filter(F.col("_corrupt_record").isNotNull())

    (Spark requires the corrupt column to be DECLARED in the schema to be
    referenced — this helper appends it, the one bit of ceremony it
    exists to encapsulate.) Narrow scan, schema-pruned like any JSON
    source; no Python.
    """
    return (spark.read.schema(f"{schema}, {corrupt_col} STRING")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(path))


def write_table(df: DataFrame, path: str, fmt: str | None = None,
                mode: str = "overwrite",
                partition_by: list[str] | None = None,
                **options) -> None:
    """Single write seam for every sink in the engine.

    fmt=None uses DEFAULT_WRITE_FORMAT. For Iceberg, ``path`` is a catalog
    table identifier and the write is a DataFrameWriterV2 replace/append
    (atomic snapshot commit); for file formats it is a directory write.
    """
    fmt = fmt or DEFAULT_WRITE_FORMAT
    _check_fmt(fmt)
    if fmt == "iceberg":
        v2 = df.writeTo(path)
        if partition_by:
            from pyspark.sql import functions as F
            v2 = v2.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            v2.append()
        else:
            v2.createOrReplace()
        return
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def recover_table(target_path: str) -> None:
    """Crash recovery for merge_upsert's three-step swap (write tmp ->
    rename target aside as ``__prev`` -> move tmp in -> drop the aside
    copy). rmtree-before-move would lose the whole table if the process
    died between the two; the rename-aside protocol leaves every crash
    window recoverable. merge_upsert runs this on entry; any READER of a
    merge-managed table (e.g. the incremental-curation history check) must
    run it too, or a crash mid-swap makes the table look absent/stale.
    No-op when no ``__prev`` directory exists.
    """
    import os

    prev = target_path + "__prev"
    if os.path.exists(prev):
        if os.path.exists(target_path):
            shutil.rmtree(prev)             # died after swap-in: drop aside
        else:
            shutil.move(prev, target_path)  # died mid-swap: restore table


def compact_table(spark: SparkSession, target_path: str,
                  target_files: int = 8, fmt: str | None = None,
                  partition_by: list[str] | None = None) -> None:
    """Small-file compaction for append/streaming sinks.

    Micro-batch sinks and repeated merges accumulate many small files;
    at scale that degrades scan parallelism planning and metadata ops
    (the classic small-file problem). This rewrites the table into
    ``target_files`` files through the SAME crash-safe rename-aside swap
    as merge_upsert (write tmp -> move target aside -> swap in -> drop
    aside). Layout and sidecars survive the rewrite:

    - Hive-style partition directories (``col=value``) are auto-detected
      when ``partition_by`` is None and re-applied, so partition pruning
      for downstream readers is preserved (the detection read disables
      partition-dtype inference so ``source=01`` round-trips byte-exact
      instead of becoming ``source=1``).
    - EVERY ``_``-prefixed sidecar file (``_applied_epoch`` replay
      marker, ``_saber_manifest.json`` checkpoint lineage, ...) is
      copied into the compacted directory, so exactly-once merge sinks
      stay exactly-once and checkpoint resume/lineage stay intact.
    - csv tables are written back with ``header=true`` to match
      read_table's default, so the first data row is not consumed as a
      header on the next read.

    On Iceberg, use the rewrite_data_files procedure instead —
    compaction there is a metadata-transactional snapshot, not a
    directory swap.
    """
    import os

    fmt = fmt or DEFAULT_WRITE_FORMAT
    if fmt == "iceberg":
        spark.sql(f"CALL system.rewrite_data_files(table => '{target_path}')")
        return
    recover_table(target_path)
    if partition_by is None:
        partition_by = _detect_partition_cols(target_path)
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    infer_prev = spark.conf.get(infer_key, "true")
    options = {"header": "true"} if fmt == "csv" else {}
    try:
        if partition_by:
            # keep partition values as written (strings), not re-inferred
            spark.conf.set(infer_key, "false")
        df = read_table(spark, target_path, fmt, **options).coalesce(
            target_files)
        tmp = target_path + "__compact"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        write_table(df, tmp, fmt, partition_by=partition_by, **options)
    finally:
        spark.conf.set(infer_key, infer_prev)
    for name in os.listdir(target_path):
        src = os.path.join(target_path, name)
        dst = os.path.join(tmp, name)
        if (name.startswith("_") and os.path.isfile(src)
                and not os.path.exists(dst)):
            shutil.copy(src, dst)
    prev = target_path + "__prev"
    shutil.move(target_path, prev)
    shutil.move(tmp, target_path)
    shutil.rmtree(prev, ignore_errors=True)


def _detect_partition_cols(path: str) -> list[str]:
    """Partition columns of a Hive-layout table directory, outermost
    first, by walking the first ``col=value`` chain. Empty list for an
    unpartitioned table."""
    import os

    cols: list[str] = []
    cur = path
    while True:
        subs = [d for d in sorted(os.listdir(cur))
                if "=" in d and os.path.isdir(os.path.join(cur, d))]
        if not subs:
            return cols
        cols.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


def merge_upsert(target_path: str, updates: DataFrame, keys: list[str],
                 sum_cols: list[str], min_cols: list[str],
                 fmt: str | None = None, epoch_id: int | None = None) -> None:
    """MERGE-shaped idempotent upsert: target ⟵ target ⊎ updates on ``keys``.

    Matched rows combine per-column (counts summed, provenance min'd);
    unmatched rows insert. On Iceberg this is literally MERGE INTO (one
    transactional commit, no table rewrite). On parquet — which has no
    transactional merge — the same semantics run as read-union-aggregate
    into a tmp dir + atomic directory swap.

    Replay semantics: a micro-batch replayed after a completed swap (crash
    between the swap and the streaming checkpoint commit) must NOT re-sum.
    With ``epoch_id`` set, the applied epoch is recorded in an
    ``_applied_epoch`` file INSIDE the data directory — atomic with the
    swap itself — and a replay of an already-applied epoch is a no-op, so
    the parquet path is exactly-once end-to-end with the streaming
    checkpoint. (Spark's parquet reader skips ``_``-prefixed files, so the
    marker is invisible to scans.) The swap itself is crash-safe: the old
    table is renamed aside, the new directory moved in, then the aside
    copy dropped, with entry-time recovery for a crash between any two of
    those steps (tested by simulating each window). The Iceberg path issues the MERGE only
    after checking the table's ``saber.applied_epoch`` property and sets it
    afterwards; property-set is a separate commit from the MERGE, so that
    path is at-least-once with a worst-case double-count window of exactly
    one micro-batch — acceptable where Iceberg WAP/branch commit isn't
    configured, and noted here rather than claimed away.
    """
    fmt = fmt or DEFAULT_WRITE_FORMAT
    _check_fmt(fmt)
    spark = updates.sparkSession
    if fmt == "iceberg":
        if epoch_id is not None:
            # table properties surface via SHOW TBLPROPERTIES (there is no
            # `.properties` metadata table in Iceberg's Spark integration)
            applied = {
                r["key"]: r["value"]
                for r in spark.sql(
                    f"SHOW TBLPROPERTIES {target_path}").collect()
            }.get("saber.applied_epoch")
            if applied is not None and int(applied) >= epoch_id:
                return
        updates.createOrReplaceTempView("_merge_updates")
        on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        sets = ", ".join(
            [f"t.{c} = t.{c} + s.{c}" for c in sum_cols]
            + [f"t.{c} = least(t.{c}, s.{c})" for c in min_cols])
        spark.sql(f"""
            MERGE INTO {target_path} t USING _merge_updates s ON {on}
            WHEN MATCHED THEN UPDATE SET {sets}
            WHEN NOT MATCHED THEN INSERT *""")
        if epoch_id is not None:
            spark.sql(f"ALTER TABLE {target_path} SET TBLPROPERTIES "
                      f"('saber.applied_epoch' = '{epoch_id}')")
        return

    import os

    recover_table(target_path)
    prev = target_path + "__prev"

    marker = os.path.join(target_path, "_applied_epoch")
    if epoch_id is not None and os.path.exists(marker):
        with open(marker) as fh:
            if int(fh.read().strip()) >= epoch_id:
                return  # replayed micro-batch: already swapped in

    from pyspark.sql import functions as F
    aggs = ([F.sum(c).alias(c) for c in sum_cols]
            + [F.min(c).alias(c) for c in min_cols])
    # updates may carry several rows per key within one batch: aggregate
    # FIRST so the no-target path also honors the MERGE key contract
    merged = updates.groupBy(*keys).agg(*aggs)
    # explicit existence probe (local-FS sandbox; a cluster deploy swaps in
    # the Hadoop FS API here). A transient READ failure on an existing table
    # must propagate — catching it would silently reset accumulated counts
    # to the current micro-batch.
    if os.path.exists(target_path):
        existing = read_table(spark, target_path, fmt)
        merged = existing.unionByName(merged).groupBy(*keys).agg(*aggs)
    tmp = f"{target_path}__merge{'' if epoch_id is None else epoch_id}"
    write_table(merged, tmp, fmt)
    if epoch_id is not None:
        with open(os.path.join(tmp, "_applied_epoch"), "w") as fh:
            fh.write(str(epoch_id))
    if os.path.exists(target_path):
        shutil.move(target_path, prev)
    shutil.move(tmp, target_path)
    shutil.rmtree(prev, ignore_errors=True)
