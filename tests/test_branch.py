"""Writable branch refs (operators/branch.py): fork isolation,
ff-only publish, CDC rebase with branch-wins overlap semantics, fork
-point vacuum pinning, and the clone metadata-carry regression."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_rewriter_spark.operators.branch import (
    branch_diff,
    branch_status,
    create_branch,
    delete_branch,
    fast_forward,
    get_branch,
    rebase_branch,
)
from parquet_rewriter_spark.operators.merge import merge_into_table
from parquet_rewriter_spark.table import SortedTable


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(400)
    return SortedTable.create(
        spark, str(tmp_path / "t"), o, key="o_orderkey", max_records_per_file=100
    )


def _ups(df, pred, price):
    return (
        df.where(pred)
        .withColumn("o_totalprice", F.lit(float(price)))
        .withColumn("op", F.lit("UPSERT"))
    )


def test_branch_isolation_and_fast_forward(table):
    t = table
    pre = (t.read().count(), t.read().agg(F.sum("o_totalprice")).first()[0])
    create_branch(t, "exp")
    br = get_branch(t, "exp")
    merge_into_table(br, _ups(t.read(), "o_orderkey < 30", 9.0))
    merge_into_table(
        br,
        t.read().where("o_orderkey >= 390").withColumn("op", F.lit("DELETE")),
    )
    # main untouched by two branch commits
    assert (t.read().count(), t.read().agg(F.sum("o_totalprice")).first()[0]) == pre
    st = branch_status(t, "exp")
    assert st["branch_commits"] == 2 and not st["main_moved"]
    res = fast_forward(t, "exp")
    assert res["published_version"] == 1
    assert t.read().count() == pre[0] - 10
    got = {r["o_orderkey"] for r in t.read().where("o_totalprice = 9.0").collect()}
    assert got == set(range(30))
    # ref advanced with the publish: immediately re-publishable
    merge_into_table(get_branch(t, "exp"), _ups(t.read(), "o_orderkey = 50", 7.0))
    assert fast_forward(t, "exp")["published_version"] == 2
    delete_branch(t, "exp")
    assert t.branches() == {}
    assert t.read().count() == pre[0] - 10  # branch files were hard links


def test_branch_diff_shape(table):
    t = table
    create_branch(t, "d")
    merge_into_table(get_branch(t, "d"), _ups(t.read(), "o_orderkey < 5", 1.0))
    merge_into_table(
        get_branch(t, "d"),
        t.read().where("o_orderkey = 7").withColumn("op", F.lit("DELETE")),
    )
    kinds = {
        r["_change_type"]: r["n"]
        for r in branch_diff(t, "d").groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert kinds == {"update_postimage": 5, "delete": 1}
    delete_branch(t, "d")


def test_fast_forward_refuses_divergence_and_rebase_branch_wins(table):
    t = table
    create_branch(t, "x")
    merge_into_table(get_branch(t, "x"), _ups(t.read(), "o_orderkey < 40", 111.0))
    merge_into_table(
        t, _ups(t.read(), "o_orderkey >= 20 and o_orderkey < 60", 222.0)
    )
    with pytest.raises(ValueError, match="rebase_branch"):
        fast_forward(t, "x")
    rb = rebase_branch(t, "x")
    assert rb["replayed_rows"] == 40 and rb["rebased_onto"] == 1
    fast_forward(t, "x")
    prices = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t.read().where("o_orderkey < 60").collect()
    }
    assert all(prices[k] == 111.0 for k in range(40))      # branch wins overlap
    assert all(prices[k] == 222.0 for k in range(40, 60))  # main-only region
    delete_branch(t, "x")


def test_rebase_replays_deletes_and_inserts(table):
    t = table
    create_branch(t, "y")
    br = get_branch(t, "y")
    new = t.read().where("o_orderkey < 3").withColumn(
        "o_orderkey", F.col("o_orderkey") + 10_000
    ).withColumn("op", F.lit("UPSERT"))
    dels = t.read().where("o_orderkey = 100").withColumn("op", F.lit("DELETE"))
    merge_into_table(br, new.unionByName(dels))
    merge_into_table(t, _ups(t.read(), "o_orderkey = 200", 5.0))  # diverge main
    rebase_branch(t, "y")
    fast_forward(t, "y")
    assert t.read().where("o_orderkey >= 10000").count() == 3
    assert t.read().where("o_orderkey = 100").count() == 0
    assert t.read().where("o_orderkey = 200").first()["o_totalprice"] == 5.0
    delete_branch(t, "y")


def test_vacuum_pins_branch_fork_point(table):
    t = table
    merge_into_table(t, _ups(t.read(), "o_orderkey = 1", 1.0))  # v1
    create_branch(t, "pin")  # fork at v1
    merge_into_table(t, _ups(t.read(), "o_orderkey = 2", 2.0))  # v2
    merge_into_table(t, _ups(t.read(), "o_orderkey = 3", 3.0))  # v3
    t.vacuum(retain_versions=1)
    assert os.path.exists(os.path.join(t.path, "_manifest.v1.json"))  # pinned
    assert not os.path.exists(os.path.join(t.path, "_manifest.v0.json"))
    # branch still publishable after main GC'd everything else: v2/v3
    # changed keys the branch never touched, so rebase+ff must succeed
    br = get_branch(t, "pin")
    merge_into_table(br, _ups(br.read(), "o_orderkey = 4", 4.0))
    rebase_branch(t, "pin")
    fast_forward(t, "pin")
    assert t.read().where("o_orderkey = 4").first()["o_totalprice"] == 4.0
    delete_branch(t, "pin")


def test_clone_carries_rename_map_and_txns(spark, table):
    t = table
    t.rename_column("o_totalprice", "price_usd")
    merge_into_table(
        t,
        t.read().where("o_orderkey = 1")
        .withColumn("price_usd", F.lit(1.5))
        .withColumn("op", F.lit("UPSERT")),
        txn=("app-a", 7),
    )
    c = t.clone(t.path + "_c")
    assert "price_usd" in c.read().columns           # rename carried
    assert "o_totalprice" not in c.read().columns
    assert c.manifest().txns.get("app-a") == 7       # watermark carried
    # replay at-or-below the watermark is skipped on the clone too
    res = merge_into_table(
        c,
        t.read().where("o_orderkey = 1")
        .withColumn("price_usd", F.lit(99.0))
        .withColumn("op", F.lit("UPSERT")),
        txn=("app-a", 7),
    )
    assert res.get("skipped_txn_replay")
    assert c.read().where("o_orderkey = 1").first()["price_usd"] == 1.5


def test_branch_of_renamed_table_speaks_logical_names(table):
    t = table
    t.rename_column("o_totalprice", "price_usd")
    create_branch(t, "r")
    br = get_branch(t, "r")
    assert "price_usd" in br.read().columns
    merge_into_table(
        br,
        br.read().where("o_orderkey = 2")
        .withColumn("price_usd", F.lit(42.0))
        .withColumn("op", F.lit("UPSERT")),
    )
    fast_forward(t, "r")
    assert t.read().where("o_orderkey = 2").first()["price_usd"] == 42.0
    delete_branch(t, "r")


def test_create_branch_twice_rejected(table):
    create_branch(table, "dup")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(table, "dup")
    delete_branch(table, "dup")


# --------------------------------------------------------- catalog branches

def test_catalog_branch_publish_is_atomic_for_catalog_readers(spark, sf_dir, tmp_path):
    from parquet_rewriter_spark.operators.branch import (
        create_catalog_branch,
        publish_catalog_branch,
    )
    from parquet_rewriter_spark.operators.txn_catalog import TransactionCatalog

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(200)
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(60)
    to = SortedTable.create(
        spark, str(tmp_path / "o"), o, key="o_orderkey", max_records_per_file=64
    )
    tc = SortedTable.create(
        spark, str(tmp_path / "c"), c, key="c_custkey", max_records_per_file=32
    )
    cat = TransactionCatalog.create(
        spark, str(tmp_path / "cat"), {"orders": to, "cust": tc}
    )
    brs = create_catalog_branch(cat, "exp")
    merge_into_table(brs["orders"], _ups(o, "o_orderkey < 7", 9.0))
    merge_into_table(
        brs["cust"],
        c.where("c_custkey < 4").withColumn("c_acctbal", F.lit(-5.0))
        .withColumn("op", F.lit("UPSERT")),
    )
    # pre-publish: catalog readers see neither table's branch writes
    assert cat.read("orders").where("o_totalprice = 9.0").count() == 0
    assert cat.read("cust").where("c_acctbal = -5.0").count() == 0
    v0 = cat.version()
    v1 = publish_catalog_branch(cat, "exp")
    assert v1 == v0 + 1  # ONE catalog commit for two table publishes
    assert cat.read("orders").where("o_totalprice = 9.0").count() == 7
    assert cat.read("cust").where("c_acctbal = -5.0").count() == 4
    assert to.branches() == {} and tc.branches() == {}


def test_catalog_branch_untouched_table_keeps_pin(spark, sf_dir, tmp_path):
    from parquet_rewriter_spark.operators.branch import (
        create_catalog_branch,
        publish_catalog_branch,
    )
    from parquet_rewriter_spark.operators.txn_catalog import TransactionCatalog

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(100)
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(30)
    to = SortedTable.create(
        spark, str(tmp_path / "o"), o, key="o_orderkey", max_records_per_file=64
    )
    tc = SortedTable.create(
        spark, str(tmp_path / "c"), c, key="c_custkey", max_records_per_file=32
    )
    cat = TransactionCatalog.create(
        spark, str(tmp_path / "cat"), {"orders": to, "cust": tc}
    )
    brs = create_catalog_branch(cat, "only_orders")
    merge_into_table(brs["orders"], _ups(o, "o_orderkey < 3", 1.0))
    pins_before = cat.snapshot()
    publish_catalog_branch(cat, "only_orders")
    pins = cat.snapshot()
    assert pins["orders"] == pins_before["orders"] + 1
    assert pins["cust"] == pins_before["cust"]  # no empty version minted
    assert tc.manifest().version == 0


def test_refs_df_lists_tags_and_branches(table):
    t = table
    merge_into_table(t, _ups(t.read(), "o_orderkey = 1", 1.0))  # v1
    t.tag("stable")
    create_branch(t, "exp")
    merge_into_table(get_branch(t, "exp"), _ups(t.read(), "o_orderkey = 2", 2.0))
    rows = {(r["name"], r["kind"]): r for r in t.refs_df().collect()}
    assert rows[("stable", "tag")]["version"] == 1
    assert rows[("stable", "tag")]["branch_commits"] is None
    assert rows[("exp", "branch")]["version"] == 1  # fork point
    assert rows[("exp", "branch")]["branch_commits"] == 1
    delete_branch(t, "exp")
    assert {r["name"] for r in t.refs_df().collect()} == {"stable"}


def test_streaming_merge_into_branch_then_publish(spark, table, tmp_path):
    """A micro-batch stream merges into the BRANCH with exactly-once
    txn watermarks; main only sees the rows at publish — streaming
    composes with branches with zero new machinery."""
    from parquet_rewriter_spark.streaming.ops import stream_merge_into_table

    t = table
    create_branch(t, "ingest")
    br = get_branch(t, "ingest")
    src = str(tmp_path / "src")
    inserts = (
        t.read().limit(6)
        .withColumn("o_orderkey", F.col("o_orderkey") + 20_000)
    )
    inserts.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(inserts.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    stream_merge_into_table(
        stream, br, checkpoint_dir=str(tmp_path / "ckpt"), txn_app="br-ingest"
    )
    assert br.read().where("o_orderkey >= 20000").count() == 6
    assert t.read().where("o_orderkey >= 20000").count() == 0  # isolated
    assert br.manifest().txns.get("br-ingest") is not None  # watermark kept
    fast_forward(t, "ingest")
    assert t.read().where("o_orderkey >= 20000").count() == 6
    # the published MAIN manifest carries the stream's watermark, so a
    # post-publish replay of the same epochs is a no-op on main too
    assert t.manifest().txns.get("br-ingest") is not None
    delete_branch(t, "ingest")


def test_catalog_branch_publish_prevalidates_all_forks(spark, sf_dir, tmp_path):
    """A diverged table anywhere in the set must abort the publish
    BEFORE any table's head moves."""
    from parquet_rewriter_spark.operators.branch import (
        create_catalog_branch,
        publish_catalog_branch,
    )
    from parquet_rewriter_spark.operators.txn_catalog import TransactionCatalog

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(100)
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(30)
    to = SortedTable.create(
        spark, str(tmp_path / "o"), o, key="o_orderkey", max_records_per_file=64
    )
    tc = SortedTable.create(
        spark, str(tmp_path / "c"), c, key="c_custkey", max_records_per_file=32
    )
    cat = TransactionCatalog.create(
        spark, str(tmp_path / "cat"), {"orders": to, "cust": tc}
    )
    brs = create_catalog_branch(cat, "x")
    merge_into_table(brs["orders"], _ups(o, "o_orderkey < 5", 1.0))
    merge_into_table(
        brs["cust"],
        c.where("c_custkey < 3").withColumn("c_acctbal", F.lit(0.0))
        .withColumn("op", F.lit("UPSERT")),
    )
    # diverge CUST's main after the fork
    merge_into_table(
        tc,
        c.where("c_custkey = 9").withColumn("c_acctbal", F.lit(7.0))
        .withColumn("op", F.lit("UPSERT")),
    )
    with pytest.raises(ValueError, match="no table was published"):
        publish_catalog_branch(cat, "x")
    # NOTHING published: orders head still v0 (its branch was ready but
    # must not land), and the catalog pins stay at their fork values —
    # cust's main head moved to v1, its PIN did not
    assert to.manifest().version == 0
    assert cat.snapshot() == {"orders": 0, "cust": 0}


def test_rebase_catalog_branch_unblocks_publish(spark, sf_dir, tmp_path):
    from parquet_rewriter_spark.operators.branch import (
        create_catalog_branch,
        publish_catalog_branch,
        rebase_catalog_branch,
    )
    from parquet_rewriter_spark.operators.txn_catalog import TransactionCatalog

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).limit(100)
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(30)
    to = SortedTable.create(
        spark, str(tmp_path / "o"), o, key="o_orderkey", max_records_per_file=64
    )
    tc = SortedTable.create(
        spark, str(tmp_path / "c"), c, key="c_custkey", max_records_per_file=32
    )
    cat = TransactionCatalog.create(
        spark, str(tmp_path / "cat"), {"orders": to, "cust": tc}
    )
    brs = create_catalog_branch(cat, "x")
    merge_into_table(brs["orders"], _ups(o, "o_orderkey < 5", 1.0))
    merge_into_table(tc, c.where("c_custkey = 9")  # diverge cust's main
                     .withColumn("c_acctbal", F.lit(7.0))
                     .withColumn("op", F.lit("UPSERT")))
    # cust diverged with an EMPTY branch: rebase re-forks it, then the
    # publish drops it as untouched and only orders' pin advances
    replayed = rebase_catalog_branch(cat, "x")
    assert replayed == {"cust": 0}
    publish_catalog_branch(cat, "x")
    pins = cat.snapshot()
    assert pins["orders"] == 1 and pins["cust"] == 0
    assert cat.read("orders").where("o_totalprice = 1.0").count() == 5
    # cust's main head kept its own divergence commit untouched
    assert tc.read().where("c_custkey = 9").first()["c_acctbal"] == 7.0


def test_fsck_flags_and_repairs_orphan_branch_dirs(table):
    import shutil

    t = table
    create_branch(t, "live")
    # orphan 1: dir left behind after a crashed delete (ref dropped)
    create_branch(t, "dead")
    t._set_branch_ref("dead", None)  # simulate crash before rmtree
    # orphan 2: interrupted rebase leaves .rebasing
    os.makedirs(t.path + "_branch_live.rebasing", exist_ok=True)
    rep = t.fsck()
    assert sorted(rep["orphan_branch"]) == [
        os.path.basename(t.path) + "_branch_dead",
        os.path.basename(t.path) + "_branch_live.rebasing",
    ]
    rep = t.fsck(repair=True, min_age_s=0.0)
    assert len(rep["repaired"]) == 2
    assert not os.path.exists(t.path + "_branch_dead")
    assert os.path.exists(t.path + "_branch_live")  # live branch untouched
    assert t.fsck()["orphan_branch"] == []
    delete_branch(t, "live")
