"""TableFormat seam: parquet impl active in this sandbox, Iceberg impl
selected when its runtime is present (skip-tested here — no jar), format
pinned in stats.json + manifest so resume/read can't mix formats."""

import pytest

from joie_spark.sources import tables


def test_detect_format_is_parquet_here(spark):
    fmt = tables.detect_format(spark)
    assert fmt.name == "parquet"
    assert not tables.iceberg_available(spark)


def test_env_override(spark, monkeypatch):
    monkeypatch.setenv("JOIE_TABLE_FORMAT", "parquet")
    assert tables.detect_format(spark).name == "parquet"
    monkeypatch.setenv("JOIE_TABLE_FORMAT", "iceberg")
    assert tables.detect_format(spark).name == "iceberg"
    monkeypatch.setenv("JOIE_TABLE_FORMAT", "nope")
    with pytest.raises(ValueError):
        tables.detect_format(spark)


def test_iceberg_identifiers():
    fmt = tables.IcebergFormat(catalog="c", namespace="ns")
    assert fmt.ident("/tmp/my-index.v2", "turns") == "c.ns.my_index_v2_turns"
    assert fmt.ident("/tmp/ix", "blocks/chunk=0") == "c.ns.ix_blocks_chunk_0"


def test_build_records_format_and_index_reads_it(t1_index_dir, spark):
    from joie_spark.operators.query import Index
    from joie_spark.sources.tables import Manifest, read_stats

    assert read_stats(t1_index_dir)["table_format"] == "parquet"
    assert Manifest.load(t1_index_dir).table_format() == "parquet"
    ix = Index(spark, t1_index_dir)
    assert ix.fmt.name == "parquet"
    assert ix.turns.count() > 0


def test_iceberg_needs_catalog_conf_not_just_jar(spark, monkeypatch):
    """Classpath alone must not auto-select Iceberg: IcebergFormat writes
    through spark.sql.catalog.local, so a cluster shipping the jar but not
    the catalog conf would fail at the first write (ADVICE r2).  Simulate
    'jar present' and assert the catalog conf is still required."""
    import joie_spark.sources.tables as T

    class FakeClass:
        @staticmethod
        def forName(name):
            return object()

    class FakeLang:
        Class = FakeClass

    class FakeJvm:
        java = type("j", (), {"lang": FakeLang})

    monkeypatch.setattr(type(spark), "_jvm", property(lambda self: FakeJvm), raising=False)
    try:
        # jar "present", catalog conf absent → NOT available
        assert spark.conf.get("spark.sql.catalog.local", None) is None
        assert not T.iceberg_available(spark)
        assert T.detect_format(spark).name == "parquet"
        # jar present AND catalog configured → available
        spark.conf.set(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        assert T.iceberg_available(spark)
        assert T.detect_format(spark).name == "iceberg"
    finally:
        spark.conf.unset("spark.sql.catalog.local")


class _RecordingWriter:
    """Test double for DataFrameWriterV2 — records the verb sequence the
    IcebergFormat emits (the contract a real Iceberg catalog would see).
    No Iceberg jar is obtainable in this sandbox (no network, none baked
    in), so the write-verb contract is what we can pin down here."""

    def __init__(self, log, ident):
        self.log = log
        self.ident = ident
        self._using = None
        self._partitioned = None

    def using(self, fmt):
        self._using = fmt
        return self

    def partitionedBy(self, *cols):
        self._partitioned = len(cols)
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident, self._using, self._partitioned))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions", self.ident))


def test_iceberg_write_verbs_contract(spark, monkeypatch):
    """Fresh build: chunk 0 createOrReplace (replaces any stale table —
    ADVICE r2), later chunks overwritePartitions (idempotent resume);
    reset_table issues DROP TABLE."""
    fmt = tables.IcebergFormat(catalog="c", namespace="ns")
    log, existing = [], set()

    df = spark.range(4).selectExpr("id AS doc_id", "CAST(id % 2 AS INT) AS bucket")
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, ident: _RecordingWriter(log, ident)
    )
    monkeypatch.setattr(
        type(spark.catalog), "tableExists", lambda self, i: i in existing
    )
    sqls = []
    monkeypatch.setattr(type(spark), "sql", lambda self, q: sqls.append(q))

    ident = fmt.ident("/tmp/ix9", "blocks")
    # fresh: table absent → createOrReplace even for a subunit write
    fmt.write(df, "/tmp/ix9", "blocks", partition_by=["bucket"], subunit="chunk=0")
    existing.add(ident)
    fmt.write(df, "/tmp/ix9", "blocks", partition_by=["bucket"], subunit="chunk=1")
    # non-subunit write always replaces wholesale
    fmt.write(df, "/tmp/ix9", "turns")
    assert log == [
        ("createOrReplace", ident, "iceberg", 1),
        ("overwritePartitions", ident),
        ("createOrReplace", fmt.ident("/tmp/ix9", "turns"), "iceberg", None),
    ]
    fmt.reset_table(spark, "/tmp/ix9", "blocks")
    assert sqls == [f"DROP TABLE IF EXISTS {ident}"]
