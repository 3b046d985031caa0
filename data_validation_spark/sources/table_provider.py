"""TableProvider — thin seam between the engine and table formats (IO1-IO7).

The production target is Iceberg (``spark.table`` / ``writeTo``); the
sandbox has no Iceberg jars, so the default backend is parquet with
physical partition directories emulating Iceberg's
``(source, bucket(N, doc_id))`` partition transform.  Every engine
operator takes a DataFrame, so swapping backends never touches operator
code.

Partition pruning: with the parquet backend, ``source``/``bucket`` are
directory partition columns, so a ``.where(F.col("source") == ...)`` is
partition-pruned by Catalyst exactly as Iceberg metadata pruning would —
``.explain`` shows ``PartitionFilters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class TableProvider:
    """Read/write tables by name against a root location.

    backend="parquet": name → ``{root}/{name}`` partitioned-dir parquet.
    backend="iceberg": name → catalog table ``{root}.{name}`` (requires
    Iceberg jars + catalog conf; not available in the sandbox, kept as
    the production path).
    backend="json" / "csv": name → ``{root}/{name}`` line-delimited
    JSON / CSV (csv defaults to header=true).  Pass ``schema`` (DDL
    string) for these: without it Spark infers by scanning the data —
    a FULL extra pass at 100 TB — so raw-ingest validation should
    always pin the schema (a warning comment, not an error, since
    ad-hoc exploration is legitimate).  ``options`` are forwarded to
    the reader/writer.
    """

    def __init__(self, spark: SparkSession, root: str,
                 backend: str = "parquet", schema: str | None = None,
                 options: dict | None = None):
        if backend not in ("parquet", "orc", "iceberg", "json", "csv"):
            raise ValueError(f"unknown backend {backend!r}")
        self.spark = spark
        self.root = root.rstrip("/")
        self.backend = backend
        self.schema = schema
        self.options = dict(options or {})
        if backend == "csv" and "header" not in self.options:
            self.options["header"] = "true"

    def _ident(self, name: str) -> str:
        return (f"{self.root}/{name}" if self.backend in ("parquet", "orc")
                else f"{self.root}.{name}")

    # -- IO1: sequence-table scan (column pruning via explicit select) --
    def read(self, name: str, columns: list[str] | None = None) -> DataFrame:
        if self.backend == "iceberg":
            df = self.spark.table(self._ident(name))
        else:
            reader = self.spark.read.format(self.backend)
            if self.options:
                reader = reader.options(**self.options)
            if self.schema:
                reader = reader.schema(self.schema)
            df = reader.load(self._ident(name))
        return df.select(*columns) if columns else df

    # -- IO5/IO6/IO7: append-only sinks --
    def append(self, df: DataFrame, name: str,
               partition_by: list[str] | None = None) -> None:
        if self.backend == "iceberg":
            df.writeTo(self._ident(name)).append()
        else:
            w = df.write.mode("append").format(self.backend)
            if self.options:
                w = w.options(**self.options)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(self._ident(name))

    def overwrite(self, df: DataFrame, name: str,
                  partition_by: list[str] | None = None) -> None:
        if self.backend == "iceberg":
            df.writeTo(self._ident(name)).createOrReplace()
        else:
            w = df.write.mode("overwrite").format(self.backend)
            if self.options:
                w = w.options(**self.options)
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.save(self._ident(name))

    # -- bucketed tables: the Iceberg bucket(N, key) transform analogue
    #    that actually EXECUTES in the sandbox ---------------------------
    def write_bucketed(self, df: DataFrame, name: str,
                       bucket_cols: list[str], n_buckets: int,
                       sort_cols: list[str] | None = None,
                       mode: str = "overwrite") -> None:
        """Write a table hash-bucketed by ``bucket_cols`` so downstream
        joins and aggregations on those keys are CO-LOCATED — Catalyst
        reads the bucket spec from the catalog and drops the Exchange
        entirely (the join/groupBy runs one task per bucket).  This is
        the execution-plan property Iceberg's ``bucket(N, doc_id)``
        partition transform buys on a real cluster: at 10^12 rows, a
        doc_id-keyed uniqueness pass or a dedup-cluster join against a
        same-bucketed snapshot pays ZERO shuffle instead of moving the
        table.

        Parquet backend uses ``bucketBy().saveAsTable`` with an explicit
        external path under the provider root (Spark bucketing metadata
        lives in the catalog, not the files — the reason ``read`` on the
        raw path would not see buckets; use ``read_bucketed``).
        ``sort_cols`` additionally sorts within buckets (sort-merge
        joins skip their sort).  Iceberg backend: ``writeTo(...).
        partitionedBy(bucket(N, key))`` — the production path, jar-gated
        like the rest of the Iceberg seam."""
        if self.backend == "iceberg":
            writer = df.writeTo(self._ident(name)).using("iceberg") \
                .partitionedBy(F.bucket(n_buckets, bucket_cols[0]),
                               *[F.bucket(n_buckets, c)
                                 for c in bucket_cols[1:]])
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.append()
            return
        if self.backend != "parquet":
            raise ValueError("bucketed write requires parquet or iceberg")
        w = (df.write.mode(mode).format("parquet")
             .option("path", f"{self.root}/{name}")
             .bucketBy(n_buckets, *bucket_cols))
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.saveAsTable(name)

    def read_bucketed(self, name: str,
                      columns: list[str] | None = None) -> DataFrame:
        """Read a table written by ``write_bucketed`` THROUGH the
        catalog, preserving its bucket spec (a path read would scan the
        same files but plan an Exchange for keyed ops)."""
        df = self.spark.table(name if self.backend != "iceberg"
                              else self._ident(name))
        return df.select(*columns) if columns else df

    # -- compaction: the small-files problem ----------------------------
    def compact(self, name: str, sort_cols: list[str] | None = None,
                target_rows_per_file: int = 1_000_000,
                n_files: int | None = None) -> dict:
        """Rewrite an append-accumulated table into few, optionally
        range-clustered files.  Streaming/incremental sinks (``append``
        per micro-batch, one file per task per batch) drown a 100 TB
        table in small files — every later scan then pays file-open +
        footer-parse per file and the driver pays O(#files) listing.
        Compaction is the standing maintenance job: read, repartition to
        ``n_files`` (default ``ceil(rows / target_rows_per_file)``),
        optionally ``repartitionByRange + sortWithinPartitions`` on
        ``sort_cols`` so min/max footer stats turn range predicates into
        file skips, and atomically swap directories.

        Parquet backend: write to ``{name}__compacting`` then two FS
        renames (old → trash, new → live; trash removed last) — readers
        never observe a partial table.  Iceberg backend: the engine-side
        rewrite is ``CALL <catalog>.system.rewrite_data_files`` (plus
        its own snapshot atomicity); jar-gated like the rest of the
        seam.  Returns ``{files_before, files_after, n_rows}``."""
        if self.backend == "iceberg":
            catalog = self.root.split(".")[0]
            self.spark.sql(
                f"CALL {catalog}.system.rewrite_data_files("
                f"table => '{self._ident(name)}')")
            return {}
        if self.backend != "parquet":
            raise ValueError("compact requires parquet or iceberg")
        # A bucketed table's bucket spec lives in the CATALOG while the
        # hash-assignment lives in the FILES; rewriting the directory
        # with plain repartitioned parquet would leave the catalog
        # advertising buckets the files no longer honor, so keyed reads
        # through read_bucketed would silently mis-plan (ADVICE r3).
        # Refuse — a bucketed table is rewritten through write_bucketed.
        if self.spark.catalog.tableExists(name):
            buckets = [r for r in
                       self.spark.sql(f"DESC FORMATTED {name}").collect()
                       if r.col_name == "Num Buckets"]
            if buckets:
                raise ValueError(
                    f"compact({name!r}): table has a catalog bucket spec "
                    f"({buckets[0].data_type} buckets) — a plain "
                    f"repartition rewrite would break it; re-write via "
                    f"write_bucketed(read_bucketed({name!r}), ...) instead")
        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        live = jvm.org.apache.hadoop.fs.Path(self._ident(name))
        fs = live.getFileSystem(jsc.hadoopConfiguration())

        def _n_files(p) -> int:
            it, n = fs.listFiles(p, True), 0
            while it.hasNext():
                f = it.next()
                if f.getPath().getName().endswith(".parquet"):
                    n += 1
            return n

        files_before = _n_files(live)
        df = self.read(name)
        n_rows = df.count()
        if n_files is None:
            n_files = max(1, -(-n_rows // target_rows_per_file))
        if sort_cols:
            out = (df.repartitionByRange(n_files, *sort_cols)
                   .sortWithinPartitions(*sort_cols))
        else:
            out = df.repartition(n_files)
        tmp = jvm.org.apache.hadoop.fs.Path(
            self._ident(name) + "__compacting")
        trash = jvm.org.apache.hadoop.fs.Path(
            self._ident(name) + "__old")
        fs.delete(tmp, True)
        fs.delete(trash, True)
        out.write.mode("overwrite").parquet(str(tmp))
        if not fs.rename(live, trash):
            raise IOError(f"compact: cannot move live table {live}")
        if not fs.rename(tmp, live):
            fs.rename(trash, live)  # roll back
            raise IOError(f"compact: cannot install compacted {name}")
        fs.delete(trash, True)
        return {"files_before": files_before,
                "files_after": _n_files(live), "n_rows": n_rows}

    def delete_keys(self, name: str, keys_df: DataFrame,
                    key_cols: list[str]) -> dict:
        """Targeted hard delete (GDPR/right-to-be-forgotten): remove
        every row of ``name`` whose ``key_cols`` tuple appears in
        ``keys_df``, with an auditable count report.

        Parquet backend: the survivor set is ONE ``left_anti`` join
        (Catalyst broadcasts a small deletion list on its own; a huge
        one degrades gracefully to a shuffle join) rewritten through
        the same atomic two-rename swap as ``compact`` — readers never
        observe a half-deleted table, and a failed install rolls back
        to the intact original.  Iceberg backend: a metadata-native
        ``DELETE FROM ... WHERE EXISTS`` (copy-on-write/merge-on-read
        per table config), jar-gated like the rest of the seam.

        Returns ``{n_rows_before, n_deleted, n_rows_after}`` — the
        audit evidence a purge job must retain.  The two counts are
        deliberate extra scans: a deletion you can't prove is a
        deletion you can't certify.
        """
        keys = keys_df.select(*key_cols).distinct()
        if self.backend == "iceberg":
            keys.createOrReplaceTempView("__dvs_delete_keys")
            pred = " AND ".join(
                f"t.{c} <=> k.{c}" for c in key_cols)
            before = self.read(name).count()
            self.spark.sql(
                f"DELETE FROM {self._ident(name)} t WHERE EXISTS ("
                f"SELECT 1 FROM __dvs_delete_keys k WHERE {pred})")
            after = self.read(name).count()
            return {"n_rows_before": before, "n_deleted": before - after,
                    "n_rows_after": after}
        if self.backend != "parquet":
            raise ValueError("delete_keys requires parquet or iceberg")

        df = self.read(name)
        before = df.count()
        survivors = df.join(keys, key_cols, "left_anti")

        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        live = jvm.org.apache.hadoop.fs.Path(self._ident(name))
        fs = live.getFileSystem(jsc.hadoopConfiguration())
        tmp = jvm.org.apache.hadoop.fs.Path(self._ident(name) + "__deleting")
        trash = jvm.org.apache.hadoop.fs.Path(self._ident(name) + "__old")
        fs.delete(tmp, True)
        fs.delete(trash, True)
        survivors.write.mode("overwrite").parquet(str(tmp))
        if not fs.rename(live, trash):
            raise IOError(f"delete_keys: cannot move live table {live}")
        if not fs.rename(tmp, live):
            fs.rename(trash, live)  # roll back
            raise IOError(f"delete_keys: cannot install purged {name}")
        fs.delete(trash, True)
        after = self.read(name).count()
        return {"n_rows_before": before, "n_deleted": before - after,
                "n_rows_after": after}

    def upsert(self, name: str, changes: DataFrame, key_cols: list[str],
               ts_col: str, op_col: str | None = None,
               order_cols: tuple[str, ...] = ()) -> dict:
        """SCD1 MERGE INTO maintenance: fold a CDC batch into the
        standing snapshot with ``operators.history.cdc_apply``
        (latest-wins per key, ``op='D'`` deletes) and install the
        result through the same atomic two-rename swap as ``compact``/
        ``delete_keys`` — readers never observe a half-merged
        snapshot.  A missing table bootstraps from the batch itself
        (deletes of never-seen keys are no-ops by construction).

        Folding batches through this method equals one ``cdc_apply``
        over the concatenated changes PROVIDED the ordering
        ``(ts_col, *order_cols)`` totally orders each key's records
        across batches (pass a batch sequence number in
        ``order_cols`` when change timestamps can tie) — the
        equivalence a maintenance job should assert in CI; tested in
        test_history.

        Iceberg backend: the engine-side path is ``MERGE INTO`` over
        the batch deduped to its newest row per key — jar-gated like
        the rest of the seam.  Returns ``{n_rows_before, n_changes,
        n_rows_after}``."""
        from data_validation_spark.operators.history import cdc_apply

        if self.backend == "iceberg":
            raise NotImplementedError(
                "iceberg upsert = MERGE INTO over the batch's newest "
                "row per key; jar-gated in this environment — use the "
                "parquet backend or run with the Iceberg runtime jar")
        if self.backend != "parquet":
            raise ValueError("upsert requires parquet or iceberg")

        n_changes = changes.count()
        if self.exists(name):
            base = self.read(name)
            before = base.count()
        else:
            base = changes.drop(op_col) if op_col else changes
            base = base.limit(0)
            before = 0
        merged = cdc_apply(base, changes, key_cols, ts_col,
                           op_col=op_col, order_cols=order_cols)

        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        live = jvm.org.apache.hadoop.fs.Path(self._ident(name))
        fs = live.getFileSystem(jsc.hadoopConfiguration())
        tmp = jvm.org.apache.hadoop.fs.Path(self._ident(name)
                                            + "__upserting")
        trash = jvm.org.apache.hadoop.fs.Path(self._ident(name) + "__old")
        fs.delete(tmp, True)
        fs.delete(trash, True)
        merged.write.mode("overwrite").parquet(str(tmp))
        if fs.exists(live):
            if not fs.rename(live, trash):
                raise IOError(f"upsert: cannot move live table {live}")
        if not fs.rename(tmp, live):
            if fs.exists(trash):
                fs.rename(trash, live)  # roll back
            raise IOError(f"upsert: cannot install merged {name}")
        fs.delete(trash, True)
        after = self.read(name).count()
        return {"n_rows_before": before, "n_changes": n_changes,
                "n_rows_after": after}

    def exists(self, name: str) -> bool:
        if self.backend != "iceberg":
            # cheap existence probe via the Hadoop FS API (no listing scan)
            jvm = self.spark.sparkContext._jvm
            jsc = self.spark.sparkContext._jsc
            path = jvm.org.apache.hadoop.fs.Path(self._ident(name))
            fs = path.getFileSystem(jsc.hadoopConfiguration())
            return bool(fs.exists(path))
        return self.spark.catalog.tableExists(self._ident(name))

    # -- IO2: partition listing (Iceberg .partitions metadata analogue) --
    def partitions(self, name: str, partition_cols: list[str]) -> DataFrame:
        """Distinct partition tuples. With directory-partitioned parquet
        this reads only partition-dir metadata, no row data (Catalyst
        resolves distinct-on-partition-columns from the file index)."""
        return self.read(name, columns=partition_cols).distinct()
