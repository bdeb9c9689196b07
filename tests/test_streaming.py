"""Structured Streaming: watermarked dedupe + foreachBatch MERGE must
converge to the same table a batch rebuild produces."""

from datetime import datetime

import pytest

from dbt_incremental_ci_spark.streaming.pipeline import (
    incremental_stream,
    windowed_event_counts,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_incremental_stream_upserts(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(
        spark,
        src,
        [(1, t0, 1.0), (2, t0, 2.0), (2, t0, 2.0)],  # in-batch dup on key 2
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS t_stream")
    spark.sql("DROP TABLE IF EXISTS t_stream.tgt")

    stream = spark.readStream.schema("id long, ts timestamp, value double").parquet(src)
    q = (
        incremental_stream(stream, "t_stream.tgt", "id", "ts", checkpoint_dir=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["value"] for r in spark.table("t_stream.tgt").collect()}
    assert got == {1: 1.0, 2: 2.0}

    # second micro-batch: update key 2, add key 3 → MERGE semantics
    _write_batch(spark, src, [(2, datetime(2024, 1, 1, 0, 30), 9.0), (3, t0, 3.0)])
    q = (
        incremental_stream(stream, "t_stream.tgt", "id", "ts", checkpoint_dir=ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r["value"] for r in spark.table("t_stream.tgt").collect()}
    assert got == {1: 1.0, 2: 9.0, 3: 3.0}


def test_windowed_event_counts(spark, tmp_path):
    src = str(tmp_path / "win_src")
    rows = [
        (1, datetime(2024, 1, 1, 0, 1), 1.0),
        (2, datetime(2024, 1, 1, 0, 5), 2.0),
        (3, datetime(2024, 1, 1, 0, 12), 4.0),
    ]
    spark.createDataFrame(rows, "id long, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("id long, ts timestamp, value double").parquet(src)
    out = windowed_event_counts(stream, "ts", "10 minutes", "30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute, r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == {(0, 2, 3.0), (10, 1, 4.0)}


def test_session_event_counts_streaming(spark, tmp_path):
    from dbt_incremental_ci_spark.streaming.pipeline import session_event_counts

    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    rows = [
        # user 1: two events 10 min apart (one session), then a 40-min
        # gap (new session); user 2: single event
        (1, datetime(2024, 1, 1, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 10), 1.0),
        (1, datetime(2024, 1, 1, 0, 50), 1.0),
        (2, datetime(2024, 1, 1, 0, 5), 1.0),
    ]
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    out = session_event_counts(stream, "ts", gap="30 minutes", group_cols=["user_id"])
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    assert got == {
        (1, datetime(2024, 1, 1, 0, 0), 2),
        (1, datetime(2024, 1, 1, 0, 50), 1),
        (2, datetime(2024, 1, 1, 0, 5), 1),
    }
    # batch twin gives the same sessions (one code path, Kappa shape)
    batch = session_event_counts(
        spark.read.parquet(src), "ts", gap="30 minutes", group_cols=["user_id"]
    )
    got_b = {
        (r["user_id"], r["session_start"], r["n_events"]) for r in batch.collect()
    }
    assert got_b == got


def test_stateful_running_stats_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state across micro-batches:
    batch 2 continues batch 1's running totals via the checkpoint."""
    from dbt_incremental_ci_spark.streaming.pipeline import stateful_running_stats

    src = str(tmp_path / "st_src")
    ckpt = str(tmp_path / "st_ckpt")
    t0 = datetime(2024, 1, 1, 0, 0)

    sink = str(tmp_path / "st_sink")

    def run_batch():
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        out = stateful_running_stats(stream, "user_id", "ts", "value")
        # memory sink can't recover from a checkpoint; append updated
        # rows to parquet and read the latest (max n_events) per key
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        latest = {}
        for r in spark.read.parquet(sink).collect():
            cur = latest.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                latest[r["user_id"]] = (r["n_events"], r["total"])
        return latest

    _write_batch_users(spark, src, [(1, t0, 2.0), (1, t0, 3.0), (2, t0, 1.0)])
    got = run_batch()
    assert got[1] == (2, 5.0) and got[2] == (1, 1.0)

    _write_batch_users(spark, src, [(1, datetime(2024, 1, 1, 1, 0), 10.0), (3, t0, 7.0)])
    got = run_batch()
    assert got[1] == (3, 15.0)  # state carried over
    assert got[3] == (1, 7.0)


def _write_batch_users(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch join."""
    from dbt_incremental_ci_spark.streaming.pipeline import stream_interval_join

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    ckpt = str(tmp_path / "ij_ckpt")
    t = lambda m, s=0: datetime(2024, 1, 1, 0, m, s)  # noqa: E731
    imps = [(1, 10, t(0)), (2, 10, t(5)), (3, 20, t(6)), (4, 30, t(7))]
    clks = [
        (101, 10, t(4)),   # joins imp 1 (within 15m) — not imp 2 (before it)
        (102, 10, t(12)),  # joins imps 1 and 2
        (103, 20, t(30)),  # outside 15m of imp 3 -> no match
        (104, 99, t(8)),   # unknown ad -> no match
    ]
    spark.createDataFrame(
        imps, "imp_id long, ad_id long, its timestamp"
    ).write.mode("overwrite").parquet(imp_dir)
    spark.createDataFrame(
        clks, "clk_id long, c_ad_id long, cts timestamp"
    ).write.mode("overwrite").parquet(clk_dir)

    imp_s = spark.readStream.schema("imp_id long, ad_id long, its timestamp").parquet(imp_dir)
    clk_s = spark.readStream.schema("clk_id long, c_ad_id long, cts timestamp").parquet(clk_dir)
    joined = stream_interval_join(
        imp_s, clk_s, "ad_id", "c_ad_id", "its", "cts", upper="15 minutes"
    )
    q = (
        joined.select("imp_id", "clk_id")
        .writeStream.format("memory")
        .queryName("ij_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["imp_id"], r["clk_id"]) for r in spark.sql("SELECT * FROM ij_out").collect()
    )
    assert got == [(1, 101), (1, 102), (2, 102)]


def test_hopping_windows_streaming_matches_batch(spark, tmp_path):
    src = str(tmp_path / "hop_src")
    rows = [
        (1, datetime(2024, 1, 1, 0, 1), 1.0),
        (2, datetime(2024, 1, 1, 0, 7), 2.0),
        (3, datetime(2024, 1, 1, 0, 12), 4.0),
    ]
    spark.createDataFrame(rows, "id long, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("id long, ts timestamp, value double").parquet(src)
    out = windowed_event_counts(
        stream, "ts", "10 minutes", "30 minutes", slide_duration="5 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("hop_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute, r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM hop_counts").collect()
    }
    # each event lands in two hopping windows
    # 0:01 -> [55',0:05) prev-hour window and [0:00,0:10)
    # 0:07 -> [0:00,0:10) and [0:05,0:15); 0:12 -> [0:05,0:15) and [0:10,0:20)
    assert got == {
        (55, 1, 1.0),
        (0, 2, 3.0),
        (5, 2, 6.0),
        (10, 1, 4.0),
    }


def test_enrich_stream_matches_batch_join(spark, tmp_path):
    from dbt_incremental_ci_spark.streaming.pipeline import enrich_stream

    src = str(tmp_path / "enrich_src")
    rows = [
        (1, datetime(2024, 1, 1, 0, 1), 10.0),
        (2, datetime(2024, 1, 1, 0, 2), 20.0),
        (9, datetime(2024, 1, 1, 0, 3), 90.0),  # no dim row
    ]
    spark.createDataFrame(rows, "id long, ts timestamp, value double").write.mode(
        "overwrite"
    ).parquet(src)
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "id long, tier string")

    stream = spark.readStream.schema("id long, ts timestamp, value double").parquet(src)
    q = (
        enrich_stream(stream, dim, "id")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["id"], r["tier"]) for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = {
        (r["id"], r["tier"])
        for r in enrich_stream(
            spark.read.parquet(src), dim, "id"
        ).collect()
    }
    assert got == batch == {(1, "gold"), (2, "silver"), (9, None)}


def test_transform_with_state_matches_apply_in_pandas(spark, tmp_path):
    # transformWithState's state protocol runs over protobuf; this
    # container ships no usable google.protobuf (and installs are out
    # of scope), so the new-API twin is exercised only where the
    # runtime supports it. The operator itself is plain API usage —
    # nothing environment-specific to gate in the product code.
    pytest.importorskip("google.protobuf.descriptor")
    from dbt_incremental_ci_spark.streaming.pipeline import (
        running_stats_tws,
        stateful_running_stats,
    )

    src = str(tmp_path / "tws_src")
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    _write_batch(spark, src, [(1, t0, 1.0), (1, t0, 2.0), (2, t0, 5.0)])

    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def run(name, maker):
            stream = spark.readStream.schema(
                "id long, ts timestamp, value double"
            ).parquet(src)
            out = maker(stream)
            q = (
                out.writeStream.format("memory")
                .queryName(name)
                .outputMode("update")
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
            return {
                r["id"]: (r["n_events"], r["total"])
                for r in spark.sql(f"SELECT * FROM {name}").collect()
            }

        got_tws = run("tws_out", lambda s: running_stats_tws(s, "id", "value"))
        assert got_tws == {1: (2, 3.0), 2: (1, 5.0)}

        # second batch: state must persist across availableNow restarts
        _write_batch(spark, src, [(1, datetime(2024, 1, 1, 1), 4.0)])
        got_tws2 = run("tws_out2", lambda s: running_stats_tws(s, "id", "value"))
        assert got_tws2[1] == (3, 7.0)

        # equivalence with the v1 applyInPandasWithState operator
        got_v1 = run(
            "v1_out",
            lambda s: stateful_running_stats(s, "id", "ts", "value").select(
                "id", "n_events", "total"
            ),
        )
        assert {k: v for k, v in got_v1.items()} == got_tws2
    finally:
        if prev_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_stream_dedup_first_record_wins(spark, tmp_path):
    from dbt_incremental_ci_spark.streaming.pipeline import stream_dedup

    src = str(tmp_path / "dedup_src")
    ckpt = str(tmp_path / "dedup_ckpt")
    rows = [
        # key 1 retried three times within the horizon; keys 2/3 unique
        (1, datetime(2024, 1, 1, 0, 0), "a"),
        (1, datetime(2024, 1, 1, 0, 1), "a-retry"),
        (1, datetime(2024, 1, 1, 0, 2), "a-retry2"),
        (2, datetime(2024, 1, 1, 0, 3), "b"),
        (3, datetime(2024, 1, 1, 0, 4), "c"),
    ]
    spark.createDataFrame(rows, "id long, ts timestamp, payload string").write.mode(
        "overwrite"
    ).parquet(src)
    stream = spark.readStream.schema("id long, ts timestamp, payload string").parquet(src)
    out = stream_dedup(stream, ["id"], "ts", lateness="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT id, count(*) AS n FROM dedup_stream GROUP BY id").collect()
    assert {r["id"]: r["n"] for r in got} == {1: 1, 2: 1, 3: 1}
    # batch twin: distinct-by-key row count matches
    batch = spark.read.parquet(src).dropDuplicates(["id"]).count()
    assert batch == 3


def test_cdc_scd2_hll_stream_equals_batch_rebuild(spark, tmp_path):
    """Round-4 verdict item 6: the composed CDC→SCD2→HLL foreachBatch
    pipeline, streamed over two key-overlapping batches (with deletes
    and a re-create), must produce exactly the SCD2 table a full-log
    scd2_from_events rebuild gives and exactly the HLL registers of
    the full key set."""
    from dbt_incremental_ci_spark.operators.hll import (
        hll_estimate,
        hll_registers,
    )
    from dbt_incremental_ci_spark.operators.scd import scd2_from_events
    from dbt_incremental_ci_spark.streaming.ingest import cdc_scd2_hll_stream

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    schema = "k long, v string, ts long, eid long, op string"
    batch1 = [
        (1, "a", 10, 1, "U"),
        (2, "x", 11, 2, "U"),
        (3, "p", 12, 3, "U"),
        (1, "b", 20, 4, "U"),   # in-batch change
        (2, None, 21, 5, "D"),  # in-batch delete
    ]
    batch2 = [
        (1, "b", 30, 6, "U"),   # no-op (same value) -> no new interval
        (2, "y", 31, 7, "U"),   # re-create after delete
        (3, None, 32, 8, "D"),  # cross-batch delete
        (4, "q", 33, 9, "U"),   # brand-new key
    ]
    spark.sql("CREATE DATABASE IF NOT EXISTS t_cdc")
    spark.sql("DROP TABLE IF EXISTS t_cdc.scd")
    spark.sql("DROP TABLE IF EXISTS t_cdc.hll")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            cdc_scd2_hll_stream(
                stream,
                "t_cdc.scd",
                "t_cdc.hll",
                key_col="k",
                tracked_cols=["v"],
                ts_col="ts",
                op_col="op",
                tiebreak_col="eid",
                hll_m=64,
                checkpoint_dir=ckpt,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    full_log = spark.createDataFrame(batch1 + batch2, schema)
    want_scd = {
        tuple(r)
        for r in scd2_from_events(
            full_log, "k", ["v"], "ts", "eid", op_col="op"
        ).collect()
    }
    got_scd = {
        tuple(r)
        for r in spark.table("t_cdc.scd")
        .select("k", "v", "valid_from", "valid_to", "is_current")
        .collect()
    }
    assert got_scd == want_scd
    # sanity on semantics: key 1 has ONE open interval from ts 20
    assert (1, "b", 20, None, True) in got_scd

    want_regs = {
        (r["__b"], r["__m"])
        for r in hll_registers(full_log, "k", m=64).collect()
    }
    got_regs = {
        (r["__b"], r["__m"]) for r in spark.table("t_cdc.hll").collect()
    }
    assert got_regs == want_regs  # register-EXACT, not just close
    est = hll_estimate(spark.table("t_cdc.hll"), m=64).collect()[0]
    assert abs(est["estimate"] - 4) / 4 < 0.5  # 4 distinct keys ever seen


def test_minhash_register_stream_equals_batch_rebuild(spark, tmp_path):
    """Streaming twin of the q220 merge proof: MinHash registers
    maintained per micro-batch via elementwise-min folds must equal
    the direct sketch of the full concatenated input — including a
    batch that only repeats already-seen tokens (idempotence)."""
    from dbt_incremental_ci_spark.operators.mhsketch import (
        minhash_md5_registers,
    )
    from dbt_incremental_ci_spark.streaming.ingest import (
        minhash_register_stream,
    )

    src = str(tmp_path / "mh_src")
    ckpt = str(tmp_path / "mh_ckpt")
    schema = "s string, tok string"
    batch1 = [("A", f"t{i}") for i in range(30)] + [
        ("B", f"t{i}") for i in range(10, 40)
    ]
    batch2 = (
        [("A", f"t{i}") for i in range(25, 50)]  # new + overlapping
        + [("B", f"t{i}") for i in range(10, 40)]  # pure repeat
        + [("C", "solo")]  # new set
    )
    spark.sql("CREATE DATABASE IF NOT EXISTS t_mh")
    spark.sql("DROP TABLE IF EXISTS t_mh.regs")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            minhash_register_stream(
                stream, "t_mh.regs", "s", "tok", m=16,
                checkpoint_dir=ckpt,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    full = spark.createDataFrame(batch1 + batch2, schema)
    want = {
        tuple(r)
        for r in minhash_md5_registers(full, "s", "tok", m=16).collect()
    }
    got = {tuple(r) for r in spark.table("t_mh.regs").collect()}
    assert got == want  # register-EXACT across the batch split


def test_countmin_cell_stream_equals_batch_rebuild(spark, tmp_path):
    """Streaming count-min maintenance: cell-wise additive folds per
    micro-batch must equal countmin_build over the concatenated
    input — counters are plainly mergeable state, so the equality is
    exact cell-for-cell."""
    from dbt_incremental_ci_spark.operators.countmin import countmin_build
    from dbt_incremental_ci_spark.streaming.ingest import (
        countmin_cell_stream,
    )

    src = str(tmp_path / "cms_src")
    ckpt = str(tmp_path / "cms_ckpt")
    schema = "tok string"
    batch1 = [(f"k{i % 17}",) for i in range(400)]
    batch2 = [(f"k{i % 23}",) for i in range(300)] + [("rare",)]
    spark.sql("CREATE DATABASE IF NOT EXISTS t_cms")
    spark.sql("DROP TABLE IF EXISTS t_cms.cells")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            countmin_cell_stream(
                stream, "t_cms.cells", "tok", depth=3, width=32,
                salt="t", checkpoint_dir=ckpt,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    streamed = {
        (r["r"], r["b"]): r["cnt"]
        for r in spark.table("t_cms.cells").collect()
    }
    full = spark.createDataFrame(batch1 + batch2, schema)
    direct = {
        (r["r"], r["b"]): r["cnt"]
        for r in countmin_build(
            full, "tok", depth=3, width=32, salt="t"
        ).collect()
    }
    assert streamed == direct
