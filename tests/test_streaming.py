"""Structured Streaming tests: incremental parse ingest and watermarked
windowed aggregation (availableNow trigger)."""

import os

from pyspark.sql import functions as F

from ebel_spark.corpus import CorpusProfile, corpus_pandas
from ebel_spark.schemas import SOURCE_SCHEMA
from ebel_spark.streaming import stream_event_counts, stream_sources


class TestStreaming:
    def test_incremental_parse(self, spark, tmp_path):
        src_dir = str(tmp_path / "src")
        out_dir = str(tmp_path / "parsed")
        ckpt = str(tmp_path / "ckpt")

        pdf = corpus_pandas(CorpusProfile(n_files=8, statements_per_file=20))
        spark.createDataFrame(pdf, SOURCE_SCHEMA) \
            .withColumn("file_sha", F.sha2("content", 256)) \
            .select(*[f.name for f in SOURCE_SCHEMA.fields]) \
            .write.mode("overwrite").parquet(src_dir)

        q = stream_sources(spark, src_dir, out_dir, ckpt)
        q.awaitTermination(120)
        first = spark.read.parquet(out_dir)
        assert first.count() == 8

        # more files arrive -> only the new ones are processed
        pdf2 = corpus_pandas(CorpusProfile(n_files=12, statements_per_file=20))
        spark.createDataFrame(pdf2.iloc[8:], SOURCE_SCHEMA) \
            .write.mode("append").parquet(src_dir)
        q2 = stream_sources(spark, src_dir, out_dir, ckpt)
        q2.awaitTermination(120)
        out = spark.read.parquet(out_dir)
        assert out.count() == 12
        assert out.select("file_sha").distinct().count() == 12
        assert out.filter("ok").selectExpr("sum(n_statements)").first()[0] > 0

    def test_windowed_counts_match_batch(self, spark, tmp_path):
        import shutil
        events_path = "/root/testdata/sf0.001/events.parquet"
        stream_dir = str(tmp_path / "events_src")
        os.makedirs(stream_dir, exist_ok=True)
        shutil.copy(events_path, os.path.join(stream_dir, "events.parquet"))
        batch = spark.read.parquet(events_path)
        stream = spark.readStream.schema(batch.schema).parquet(stream_dir)

        agg = stream_event_counts(stream, window="1 hour",
                                  watermark="2 hours")
        out_dir = str(tmp_path / "agg")
        q = (
            agg.writeStream.format("memory").queryName("evt_counts")
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = {(r.window_start, r.event_type): (r.n, r.sum_value)
               for r in spark.sql("select * from evt_counts").collect()}

        batch = batch.withColumn("ts", F.col("ts").cast("timestamp"))
        expect = {
            (r.ws, r.event_type): (r.n, r.sum_value)
            for r in batch.groupBy(
                F.window("ts", "1 hour").alias("w"), "event_type"
            ).agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("w.start").alias("ws"), "event_type", "n",
                    "sum_value").collect()
        }
        assert got == expect
        _ = out_dir

    def test_stateful_sessions_with_timeout_flush(self, spark, tmp_path):
        """applyInPandasWithState sessionization: gap-split emission within
        a trigger, then timeout flush when a later trigger's watermark
        passes the open session's gap."""
        import time
        import pandas as pd
        from ebel_spark.streaming import stream_user_sessions

        src = str(tmp_path / "ev")
        sch = "user_id bigint, ts timestamp, event_id bigint"
        f1 = pd.DataFrame({
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime([1000, 1010, 6000, 1000], unit="s"),
            "event_id": [1, 2, 3, 4],
        })
        spark.createDataFrame(f1, sch).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        time.sleep(1.1)  # file-source processes files in mtime order
        f2 = pd.DataFrame({
            "user_id": [3],
            "ts": pd.to_datetime([500000], unit="s"),
            "event_id": [5],
        })
        spark.createDataFrame(f2, sch).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        sessions = stream_user_sessions(stream, gap=1800, watermark="1 hour")
        q = (sessions.writeStream.format("memory").queryName("sess_t")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r.user_id, r.session_start, r.session_end, r.n_events)
               for r in spark.table("sess_t").collect()}
        # u1: (1000,1010) closed by the 6000 event inside trigger 1;
        # u1 (6000) and u2 (1000) flushed by trigger 2's watermark
        # (500000 - 3600 >> last+gap); u3's session stays open.
        assert got == {(1, 1000, 1010, 2), (1, 6000, 6000, 1),
                       (2, 1000, 1000, 1)}

    def test_late_event_never_shrinks_session(self, spark, tmp_path):
        """A late (within-watermark) cross-batch event must only WIDEN the
        open session: with `last = t` (the r3 review bug) the late t=1500
        would drag session_end back from 2000 and the t=3400 event would
        mis-split; the batch twin sees one session (1000..3400, 4)."""
        import time
        import pandas as pd
        from ebel_spark.streaming import stream_user_sessions

        src = str(tmp_path / "ev")
        sch = "user_id bigint, ts timestamp, event_id bigint"
        b1 = pd.DataFrame({
            "user_id": [1, 1],
            "ts": pd.to_datetime([1000, 2000], unit="s"),
            "event_id": [1, 2],
        })
        spark.createDataFrame(b1, sch).coalesce(1) \
            .write.mode("overwrite").parquet(src)
        time.sleep(1.1)
        b2 = pd.DataFrame({   # 1500 is LATE but within the 2h watermark
            "user_id": [1, 1],
            "ts": pd.to_datetime([1500, 3400], unit="s"),
            "event_id": [3, 4],
        })
        spark.createDataFrame(b2, sch).coalesce(1) \
            .write.mode("append").parquet(src)
        time.sleep(1.1)
        b3 = pd.DataFrame({   # watermark pusher flushes user 1
            "user_id": [2],
            "ts": pd.to_datetime([500000], unit="s"),
            "event_id": [5],
        })
        spark.createDataFrame(b3, sch).coalesce(1) \
            .write.mode("append").parquet(src)

        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        sessions = stream_user_sessions(stream, gap=1800,
                                        watermark="2 hours")
        q = (sessions.writeStream.format("memory").queryName("sess_late")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r.user_id, r.session_start, r.session_end, r.n_events)
               for r in spark.table("sess_late").collect()}
        assert (1, 1000, 3400, 4) in got

    def test_stream_interval_join_matches_batch(self, spark, tmp_path):
        from ebel_spark.streaming import stream_interval_join

        vsrc = str(tmp_path / "views")
        csrc = str(tmp_path / "clicks")
        views = [(1, 1000, "v1"), (1, 5000, "v2"), (2, 1000, "v3"),
                 (3, 9000, "v4")]
        clicks = [(1, 1100, "c1"),   # joins v1 (within 1800s)
                  (1, 5200, "c2"),   # joins v2
                  (1, 4000, "c3"),   # joins nothing (v1+1800 < 4000 < v2)
                  (2, 2900, "c4"),   # joins v3 at the 1800s boundary? 1900s>1800 -> no
                  (2, 2700, "c5"),   # joins v3 (1700s)
                  (3, 8000, "c6")]   # before v4 -> no
        vdf = spark.createDataFrame(views, ["user_id", "ts", "view_id"]) \
            .withColumn("ts", F.col("ts").cast("timestamp"))
        cdf = spark.createDataFrame(clicks, ["user_id", "rts", "click_id"]) \
            .withColumn("rts", F.col("rts").cast("timestamp"))
        vdf.write.mode("overwrite").parquet(vsrc)
        cdf.write.mode("overwrite").parquet(csrc)

        vs = spark.readStream.schema(vdf.schema).parquet(vsrc)
        cs = spark.readStream.schema(cdf.schema).parquet(csrc)
        joined = stream_interval_join(vs, cs, key="user_id", left_ts="ts",
                                      right_ts="rts", interval=1800,
                                      watermark="1 hour")
        q = (joined.writeStream.format("memory").queryName("ij_t")
             .option("checkpointLocation", str(tmp_path / "ckij"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = {(r.view_id, r.click_id) for r in spark.table("ij_t").collect()}
        assert got == {("v1", "c1"), ("v2", "c2"), ("v3", "c5")}

        # batch twin over the same parquet: identical pairs
        batch = vdf.alias("v").join(
            cdf.alias("c"),
            (F.col("v.user_id") == F.col("c.user_id"))
            & (F.col("c.rts") >= F.col("v.ts"))
            & (F.col("c.rts") <= F.col("v.ts")
               + F.expr("INTERVAL 1800 SECONDS")))
        assert got == {(r.view_id, r.click_id) for r in batch.collect()}

    def test_stream_dedup_documents(self, spark, tmp_path):
        from ebel_spark.streaming import stream_dedup_documents

        src = str(tmp_path / "docsrc")
        # trigger 1: two distinct texts, one exact dup
        spark.createDataFrame(
            [(0, 1000, "alpha beta"), (1, 1001, "alpha beta"),
             (2, 1002, "gamma delta")],
            ["doc_id", "ts", "text"],
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .write.mode("overwrite").parquet(src)
        # trigger 2: another dup of 'alpha beta' (within watermark) + new
        spark.createDataFrame(
            [(3, 1500, "alpha beta"), (4, 1600, "epsilon zeta")],
            ["doc_id", "ts", "text"],
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .write.mode("append").parquet(src)

        sch = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        deduped = stream_dedup_documents(stream, watermark="1 hour")
        q = (deduped.writeStream.format("memory").queryName("dedup_t")
             .option("checkpointLocation", str(tmp_path / "ckd"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = sorted(r.text for r in spark.table("dedup_t").collect())
        # exactly one survivor per distinct text across ALL micro-batches
        assert got == ["alpha beta", "epsilon zeta", "gamma delta"]

    def test_stream_minhash_candidates_match_batch_lsh(self, spark,
                                                       tmp_path):
        """The streaming band-bucket registry must flag exactly the docs
        the BATCH MinHash-LSH band join would pair with an earlier doc —
        across micro-batch boundaries (near-dup pair split over two
        triggers) and within one batch."""
        from ebel_spark.ops.dedup import minhash_lsh_pairs
        from ebel_spark.streaming import stream_minhash_candidates

        d0 = "the quick brown fox jumps over the lazy dog and runs away"
        d1 = d0.replace("away", "home")          # near-dup of d0
        d2 = "completely different content about spark shuffle behavior"
        d3 = d0                                  # exact dup, later batch
        src = str(tmp_path / "nds")
        # coalesce(1): each batch must land as ONE file — a multi-file
        # batch under maxFilesPerTrigger=1 would split docs 0/1/2 into
        # separate triggers in nondeterministic file order, making
        # bucket ownership (and the flagged set) depend on the listing
        spark.createDataFrame(
            [(0, 1000, d0), (1, 1010, d1), (2, 1020, d2)],
            ["doc_id", "ts", "text"],
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .coalesce(1).write.mode("overwrite").parquet(src)
        spark.createDataFrame(
            [(3, 1500, d3)], ["doc_id", "ts", "text"],
        ).withColumn("ts", F.col("ts").cast("timestamp")) \
         .coalesce(1).write.mode("append").parquet(src)

        sch = spark.read.parquet(src).schema
        stream = (spark.readStream.schema(sch)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        cand = stream_minhash_candidates(stream, k=32, bands=16,
                                         shingle_n=3)
        q = (cand.writeStream.format("memory").queryName("nd_t")
             .option("checkpointLocation", str(tmp_path / "cknd"))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(180)
        out = spark.table("nd_t").collect()
        flagged = {r.doc_id for r in out}
        # batch ground truth: which docs share >= 1 band with an earlier
        # doc (threshold 0 keeps ALL band candidates)
        batch = spark.createDataFrame(
            [(0, d0), (1, d1), (2, d2), (3, d3)], ["doc_id", "text"])
        pairs = minhash_lsh_pairs(batch, "doc_id", "text", k=32, bands=16,
                                  shingle_n=3, threshold=0.0).collect()
        later_of_pair = {max(p.a, p.b) for p in pairs}
        assert flagged == later_of_pair and flagged == {1, 3}
        # hits point at the bucket owner (the earliest doc)
        assert all(r.first_doc_id < r.doc_id for r in out)

    def test_stream_graph_upsert_equals_batch_materialize(self, spark,
                                                          tmp_path):
        """Drain a multi-micro-batch stream through the foreachBatch graph
        upsert; the accumulated node/edge tables must equal a one-shot
        batch materialize over the same corpus (the merges are associative
        folds of the batch aggregations)."""
        from ebel_spark import graph as G
        from ebel_spark import parse as P
        from ebel_spark.streaming import stream_graph_upsert

        src_dir = str(tmp_path / "gsrc")
        out_dir = str(tmp_path / "gout")
        ckpt = str(tmp_path / "gckpt")

        pdf = corpus_pandas(CorpusProfile(n_files=10,
                                          statements_per_file=25))
        src = spark.createDataFrame(pdf, SOURCE_SCHEMA)
        # several parquet files + maxFilesPerTrigger=2 -> >= 3 micro-batches
        src.repartition(6).write.mode("overwrite").parquet(src_dir)
        # duplicate-CONTENT files: two copies of file 0 written into ONE
        # parquet file (same micro-batch -> exercises the in-batch
        # dropDuplicates) which also duplicates a file from the base
        # corpus (across batches -> exercises the lineage anti-join);
        # the upsert must collapse both so the result still equals the
        # content-deduped one-shot batch materialize
        dup = src.limit(1)
        dup.unionByName(dup).coalesce(1) \
            .write.mode("append").parquet(src_dir)

        q = stream_graph_upsert(spark, src_dir, out_dir, ckpt,
                                max_files_per_trigger=2)
        q.awaitTermination(300)

        parsed = P.parse_sources(
            src.withColumn("file_sha", F.sha2("content", 256))
            .dropDuplicates(["file_sha"])).filter("ok")
        ref_e = G.materialize_edges(P.statements_table(parsed))
        ref_n = G.materialize_nodes(P.nodes_table(parsed))
        got_e = spark.read.parquet(out_dir + "/edges")
        got_n = spark.read.parquet(out_dir + "/nodes")

        cols_e = ["edge_id", "document_ids", "n_statements"]
        assert got_e.count() == ref_e.count()
        assert (got_e.select(*cols_e).exceptAll(ref_e.select(*cols_e))
                .count() == 0)
        cols_n = ["node_id", "node_class", "bel", "pure", "n_occurrences"]
        assert got_n.count() == ref_n.count()
        assert (got_n.select(*cols_n).exceptAll(ref_n.select(*cols_n))
                .count() == 0)

        # re-running over the same source is a no-op (lineage anti-join)
        q2 = stream_graph_upsert(spark, src_dir, out_dir,
                                 str(tmp_path / "gckpt2"),
                                 max_files_per_trigger=2)
        q2.awaitTermination(300)
        again = spark.read.parquet(out_dir + "/edges")
        assert again.count() == ref_e.count()
        assert (again.selectExpr("sum(n_statements)").first()[0]
                == ref_e.selectExpr("sum(n_statements)").first()[0])

    def test_stream_upsert_same_sha_twice_in_batch1_once_in_batch3(
            self, spark, tmp_path):
        """Pin the full duplicate-content invariant (r3 VERDICT item 9):
        the SAME file sha appears twice inside one micro-batch (in-batch
        dropDuplicates) and again in a later micro-batch (lineage
        anti-join), with maxFilesPerTrigger=1 so each appended parquet
        file is its own batch.  The accumulated graph must still equal
        the content-deduped one-shot batch materialize — counts must not
        depend on micro-batch boundaries."""
        from ebel_spark import graph as G
        from ebel_spark import parse as P
        from ebel_spark.streaming import stream_graph_upsert

        src_dir = str(tmp_path / "dsrc")
        out_dir = str(tmp_path / "dout")
        ckpt = str(tmp_path / "dckpt")

        import pandas as pd
        pdf = corpus_pandas(CorpusProfile(n_files=6,
                                          statements_per_file=20))
        # batch 1: file 0 TWICE + files 1-2; batch 2: files 3-4;
        # batch 3: file 0 AGAIN + file 5
        batches = [
            pd.concat([pdf.iloc[0:1], pdf.iloc[0:1], pdf.iloc[1:3]]),
            pdf.iloc[3:5],
            pd.concat([pdf.iloc[0:1], pdf.iloc[5:6]]),
        ]
        for b in batches:
            spark.createDataFrame(b, SOURCE_SCHEMA).coalesce(1) \
                .write.mode("append").parquet(src_dir)

        q = stream_graph_upsert(spark, src_dir, out_dir, ckpt,
                                max_files_per_trigger=1)
        q.awaitTermination(300)

        src = spark.createDataFrame(pdf, SOURCE_SCHEMA)
        parsed = P.parse_sources(
            src.withColumn("file_sha", F.sha2("content", 256))
            .dropDuplicates(["file_sha"])).filter("ok")
        ref_e = G.materialize_edges(P.statements_table(parsed))
        ref_n = G.materialize_nodes(P.nodes_table(parsed))
        got_e = spark.read.parquet(out_dir + "/edges")
        got_n = spark.read.parquet(out_dir + "/nodes")

        cols_e = ["edge_id", "document_ids", "n_statements"]
        assert got_e.count() == ref_e.count()
        assert (got_e.select(*cols_e).exceptAll(ref_e.select(*cols_e))
                .count() == 0)
        cols_n = ["node_id", "node_class", "bel", "pure", "n_occurrences"]
        assert got_n.count() == ref_n.count()
        assert (got_n.select(*cols_n).exceptAll(ref_n.select(*cols_n))
                .count() == 0)
