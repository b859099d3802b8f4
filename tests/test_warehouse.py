"""Warehouse: atomic manifest commits, snapshot vs append reads, idempotency
(the Iceberg-pointer contract replacing database_sink.rs:258-284)."""

from crawlspark.warehouse import Warehouse


def test_snapshot_and_append_semantics(spark, tmp_path):
    wh = Warehouse(tmp_path / "wh")
    s0 = spark.createDataFrame([(1, "a")], ["id", "v"])
    a0 = spark.createDataFrame([(0, 10)], ["round", "n"])
    assert wh.commit_round(0, snapshots={"state": s0}, appends={"facts": a0})

    s1 = spark.createDataFrame([(2, "b")], ["id", "v"])
    a1 = spark.createDataFrame([(1, 20)], ["round", "n"])
    assert wh.commit_round(1, snapshots={"state": s1}, appends={"facts": a1})

    # snapshot: only the latest round is visible
    assert [tuple(r) for r in wh.read_state(spark, "state").collect()] == [(2, "b")]
    # append: union of all committed rounds
    assert sorted(tuple(r) for r in wh.read_appends(spark, "facts").collect()) == [
        (0, 10),
        (1, 20),
    ]
    assert wh.last_round() == 1


def test_recommit_is_noop(spark, tmp_path):
    wh = Warehouse(tmp_path / "wh")
    df = spark.createDataFrame([(1,)], ["x"])
    assert wh.commit_round(0, snapshots={"t": df})
    assert wh.commit_round(0, snapshots={"t": df}) is False
    assert wh.commit_round(0, appends={"other": df}) is False  # round is sealed


def test_partial_write_invisible_until_manifest(spark, tmp_path):
    """A crash between data write and manifest swap leaves the round
    invisible — the commit point is the manifest os.replace."""
    wh = Warehouse(tmp_path / "wh")
    df = spark.createDataFrame([(1,)], ["x"])
    wh.commit_round(0, snapshots={"t": df})
    # simulate a crashed round-1 write: directory exists, manifest not updated
    df.write.mode("overwrite").parquet(str(tmp_path / "wh" / "t" / "r000001"))
    assert wh.last_round() == 0
    assert [tuple(r) for r in wh.read_state(spark, "t").collect()] == [(1,)]
    # and the next commit_round(1) replaces the orphan atomically
    df2 = spark.createDataFrame([(2,)], ["x"])
    assert wh.commit_round(1, snapshots={"t": df2})
    assert [tuple(r) for r in wh.read_state(spark, "t").collect()] == [(2,)]


def test_write_once(spark, tmp_path):
    wh = Warehouse(tmp_path / "wh")
    wh.write_once("dim", spark.createDataFrame([("a", "b")], ["name", "hash"]))
    wh.write_once("dim", spark.createDataFrame([("x", "y")], ["name", "hash"]))
    assert [tuple(r) for r in wh.read_state(spark, "dim").collect()] == [("a", "b")]
