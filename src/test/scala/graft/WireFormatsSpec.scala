package graft

import graft.cdc.{Checkpoint, Kafka, SchemaWatch, TxnLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for the wire-format sources (Kafka envelope, binlog-shaped
  * transaction log), schema drift, and checkpoint frontier semantics —
  * each mirrored from the reference's own test fixtures
  * (`internal/source/kafka/payload_test.go`, `mylogical/conn_test.go`,
  * `staging/checkpoint/group_test.go`).
  */
class WireFormatsSpec extends SparkSpec {
  import spark.implicits._

  test("Kafka: mutation vs resolved classification, deletes, HLC parse") {
    val wire = Seq(
      ("t", 0L, 1L, """[1]""", """{"after":{"id":1,"v":"a"},"updated":"1000.0000000000"}"""),
      ("t", 0L, 2L, """[1]""", """{"updated":"2000.0000000000"}"""), // delete: no after
      ("t", 0L, 3L, null.asInstanceOf[String], """{"resolved":"3000.0000000000"}"""),
      ("t", 1L, 1L, """[2]""", """{"after":{"id":2,"v":"b"},"updated":"not-an-hlc"}"""),
      ("t", 2L, 1L, null.asInstanceOf[String], ""), // empty message value
      ("t", 3L, 1L, """[5]""", // update with a before image (diff feed)
        """{"after":{"id":5,"v":"n"},"before":{"id":5,"v":"o"},"updated":"6000.0000000000"}"""))
      .toDF("topic", "partition", "offset", "key", "value")
    val muts = Kafka.mutations(wire).collect().sortBy(r => (r.getLong(1), r.getLong(2)))
    assert(muts.length == 5) // resolved message is not a mutation
    assert(!muts(0).getBoolean(muts(0).fieldIndex("is_delete")))
    assert(muts(1).getBoolean(muts(1).fieldIndex("is_delete")))
    assert(muts(0).getStruct(muts(0).fieldIndex("hlc")).getLong(0) == 1000L)
    // malformed HLC yields a NULL struct (DLQ route), not a job abort
    assert(muts(2).isNullAt(muts(2).fieldIndex("hlc")))
    // an empty message value (reference: asPayload's empty-input no-op)
    // surfaces as a null-HLC row for the DLQ rather than erroring
    assert(muts(3).isNullAt(muts(3).fieldIndex("hlc")))
    // before image rides along (reference payload_test.go "update" case)
    assert(muts(4).getString(muts(4).fieldIndex("before")).contains("\"o\""))
    assert(muts(0).isNullAt(muts(0).fieldIndex("before")))
    val res = Kafka.resolved(wire).collect()
    assert(res.length == 1)
    assert(res(0).getStruct(res(0).fieldIndex("hlc")).getLong(0) == 3000L)
  }

  test("TxnLog: commit applies atomically, rollback and open txns vanish") {
    val frames = Seq(
      (1L, "BEGIN", 10L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 100L),
      (2L, "ROW", 10L, java.lang.Long.valueOf(1L), """{"c":5}""", 101L),
      (3L, "BEGIN", 11L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 102L),
      (4L, "ROW", 11L, java.lang.Long.valueOf(2L), """{"c":7}""", 103L),
      (5L, "ROW", 10L, java.lang.Long.valueOf(1L), """{"c":9}""", 104L),
      (6L, "COMMIT", 10L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 105L),
      (7L, "ROLLBACK", 11L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 106L),
      (8L, "BEGIN", 12L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 107L),
      (9L, "ROW", 12L, java.lang.Long.valueOf(3L), """{"c":1}""", 108L), // open: never commits
      (10L, "ROW", 13L, java.lang.Long.valueOf(4L), """{"c":2}""", 109L), // torn head:
      (11L, "COMMIT", 13L, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], 110L)) // no BEGIN
      .toDF("lsn", "op", "xid", "key", "data", "ts_us")
    val out = TxnLog.committedRows(frames).collect()
    // only xid 10 survives: 11 rolled back, 12 never commits, 13 is a
    // torn log head (COMMIT with no BEGIN)
    assert(out.map(_.getAs[Long]("xid")).toSet == Set(10L))
    assert(out.length == 2) // both its rows, interleaved or not
    assert(out.forall(_.getAs[Long]("commit_lsn") == 6L))
    val cp = TxnLog.consistentPoint(frames).collect()(0)
    assert(cp.getLong(0) == 11L)
  }

  test("Kafka: streaming parse equals batch parse on the same wire log") {
    import org.apache.spark.sql.streaming.Trigger
    val wire = Seq(
      ("t", 0L, 1L, """[1]""", """{"after":{"id":1},"updated":"1000.0000000000"}"""),
      ("t", 0L, 2L, """[1]""", """{"updated":"2000.0000000000"}"""),
      ("t", 1L, 1L, """[2]""", """{"resolved":"3000.0000000000"}"""),
      ("t", 1L, 2L, """[3]""", """{"after":{"id":3},"updated":"4000.0000000000"}"""))
      .toDF("topic", "partition", "offset", "key", "value")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_kafka_stream_spec_" +
      ProcessHandle.current().pid()
    wire.write.mode("overwrite").json(dir)
    val q = graft.cdc.Kafka.mutations(
        graft.cdc.Kafka.readStream(spark, dir, maxFilesPerTrigger = 1))
      .writeStream.format("memory").queryName("kafka_stream_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    // awaitTermination returns FALSE on timeout — asserting it prevents
    // comparing against a partially populated memory table
    assert(q.awaitTermination(120000))
    val streamed = spark.table("kafka_stream_out")
      .select("partition", "offset", "hlc.nanos", "is_delete")
      .collect().map(_.toSeq).toSet
    val batch = graft.cdc.Kafka.mutations(graft.cdc.Kafka.read(spark, dir))
      .select("partition", "offset", "hlc.nanos", "is_delete")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.size == 3) // the resolved message is not a mutation
  }

  test("Kafka e2e: streamed wire log through stateful apply == batch apply") {
    import graft.streaming.StreamApply
    import graft.streaming.StreamApply.KeyedMutText
    import org.apache.spark.sql.streaming.Trigger
    implicit val enc = org.apache.spark.sql.Encoders.product[KeyedMutText]
    // out-of-order versions per key, a delete, a resolved marker, and a
    // malformed mutation that must fall out of the apply path
    val wire = Seq(
      ("t", 0L, 1L, """[1]""", """{"after":{"value":10.0},"updated":"3000.0000000000"}"""),
      ("t", 0L, 2L, """[1]""", """{"after":{"value":99.0},"updated":"1000.0000000000"}"""), // stale
      ("t", 0L, 3L, """[2]""", """{"updated":"2000.0000000000"}"""), // delete wins for key 2
      ("t", 1L, 1L, """[2]""", """{"after":{"value":5.0},"updated":"1500.0000000000"}"""),
      ("t", 1L, 2L, """[3]""", """{"after":{"value":7.0},"updated":"bad-hlc"}"""), // DLQ-bound
      ("t", 1L, 3L, null.asInstanceOf[String], """{"resolved":"9000.0000000000"}"""))
      .toDF("topic", "partition", "offset", "key", "value")
    val dir = s"${sys.props("java.io.tmpdir")}/graft_kafka_e2e_" +
      ProcessHandle.current().pid()
    wire.repartition(3).write.mode("overwrite").json(dir)

    val batch = StreamApply.applyBatchText(
        graft.cdc.Kafka.toKeyedMuts(
          graft.cdc.Kafka.mutations(graft.cdc.Kafka.read(spark, dir))).as[KeyedMutText])
      .collect().map(m => m.key -> (m.op, m.value, m.payload)).toMap

    val q = StreamApply.applyStreamText(
        graft.cdc.Kafka.toKeyedMuts(
          graft.cdc.Kafka.mutations(
            graft.cdc.Kafka.readStream(spark, dir, maxFilesPerTrigger = 1))).as[KeyedMutText])
      .writeStream.format("memory").queryName("kafka_e2e_out")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    // last update per key across incremental triggers = the final state
    val streamed = spark.table("kafka_e2e_out").as[KeyedMutText].collect()
      .groupBy(_.key).map { case (k, ms) =>
        k -> { val w = ms.maxBy(m => (m.versionNanos, m.tiebreak)); (w.op, w.value, w.payload) }
      }
    assert(streamed == batch)
    // the key IS the key text (no hash identity — a 64-bit collision
    // must never merge two keys' histories)
    val byKeyText = batch.map { case (k, v) => k -> (v._1, v._2) }
    assert(byKeyText == Map("[1]" -> ("upsert", 10.0), "[2]" -> ("delete", 0.0)))
  }

  test("StreamTxn: transactions assemble incrementally across triggers") {
    import graft.streaming.StreamTxn
    import graft.streaming.StreamTxn.{Frame, TxnBatch}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    implicit val fenc = org.apache.spark.sql.Encoders.product[Frame]
    implicit val tenc = org.apache.spark.sql.Encoders.product[TxnBatch]
    val input = MemoryStream[Frame]
    // trigger 1: two transactions open, rows interleaved
    input.addData(
      Frame(1L, "BEGIN", 10L, None, None, 100L),
      Frame(2L, "ROW", 10L, Some(1L), Some("""{"c":5}"""), 101L),
      Frame(3L, "BEGIN", 11L, None, None, 102L),
      Frame(4L, "ROW", 11L, Some(2L), Some("""{"c":7}"""), 103L))
    val q1 = StreamTxn.assemble(input.toDS(), tombstoneTtlMs = 0L)
      .writeStream.format("memory").queryName("txn_out1")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q1.awaitTermination(60000))
    assert(spark.table("txn_out1").count() == 0) // nothing committed yet

    // trigger 2: txn 10 commits (one more row), 11 rolls back, and a
    // torn-head COMMIT (xid 13, no BEGIN ever seen) must not emit
    input.addData(
      Frame(5L, "ROW", 10L, Some(1L), Some("""{"c":9}"""), 104L),
      Frame(6L, "COMMIT", 10L, None, None, 105L),
      Frame(7L, "ROLLBACK", 11L, None, None, 106L),
      Frame(8L, "COMMIT", 13L, None, None, 107L))
    val q2 = StreamTxn.assemble(input.toDS(), tombstoneTtlMs = 0L)
      .writeStream.format("memory").queryName("txn_out2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(60000))
    val out = spark.table("txn_out2").as[TxnBatch].collect()
    assert(out.length == 1)
    assert(out(0) == TxnBatch(10L, 2L, 100L, 105L, 6L))

    // trigger 3: LATE frames for closed txns — a ROW for rolled-back 11
    // and committed 10 must hit the tombstone (not resurrect state),
    // and a late COMMIT for 11 must not emit a second batch (the fresh
    // query replays all three triggers, so exactly txn 10's batch shows)
    input.addData(
      Frame(9L, "ROW", 11L, Some(3L), Some("""{"c":1}"""), 108L),
      Frame(10L, "ROW", 10L, Some(4L), Some("""{"c":2}"""), 109L),
      Frame(11L, "COMMIT", 11L, None, None, 110L))
    val q3 = StreamTxn.assemble(input.toDS(), tombstoneTtlMs = 0L)
      .writeStream.format("memory").queryName("txn_out3")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q3.awaitTermination(60000))
    val out3 = spark.table("txn_out3").as[TxnBatch].collect()
    assert(out3.toSeq == Seq(TxnBatch(10L, 2L, 100L, 105L, 6L)))
  }

  test("streaming GTID frontier equals the batch parse (txn spans triggers)") {
    import graft.streaming.StreamTxn
    import graft.streaming.StreamTxn.{Frame, TxnBatch}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    implicit val fenc = org.apache.spark.sql.Encoders.product[Frame]
    implicit val tenc = org.apache.spark.sql.Encoders.product[TxnBatch]
    // xid encodes (source, gno) as source*100+gno
    def txn(src: Long, gno: Long, lsn0: Long, commit: Boolean) = Seq(
      Frame(lsn0, "BEGIN", src * 100 + gno, None, None, lsn0 * 10),
      Frame(lsn0 + 1, "ROW", src * 100 + gno, Some(1L), Some("{}"), lsn0 * 10 + 1),
      Frame(lsn0 + 2, if (commit) "COMMIT" else "ROLLBACK",
        src * 100 + gno, None, None, lsn0 * 10 + 2))
    val t1 = txn(1, 1, 10, commit = true) ++ txn(1, 2, 20, commit = true) ++
      txn(2, 1, 30, commit = true) ++
      Seq(Frame(40L, "BEGIN", 103L, None, None, 400L), // (1,3) spans triggers
        Frame(41L, "ROW", 103L, Some(1L), Some("{}"), 401L))
    val t2 = Seq(Frame(42L, "COMMIT", 103L, None, None, 402L)) ++
      txn(1, 4, 50, commit = false) ++ // rollback leaves the hole at gno 4
      txn(1, 5, 60, commit = true) ++ txn(2, 2, 70, commit = true) ++
      Seq(Frame(80L, "BEGIN", 203L, None, None, 800L)) // (2,3) stays open

    val input = MemoryStream[Frame]
    input.addData(t1: _*)
    input.addData(t2: _*)
    val q = StreamTxn.assemble(input.toDS(), tombstoneTtlMs = 0L)
      .writeStream.format("memory").queryName("gtid_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000))
    def toSrcGno(df: org.apache.spark.sql.DataFrame) = df.select(
      expr("xid div 100").as("source"), pmod(col("xid"), lit(100L)).as("gno"))
    val streamed = TxnLog.gtidFrontier(toSrcGno(spark.table("gtid_stream")),
      "source", "gno").orderBy("source", "start_gno").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // the hole (1,4) and the open (2,3) must be outside the intervals
    assert(streamed.toSeq == Seq((1L, 1L, 3L, 3L), (1L, 5L, 5L, 1L),
      (2L, 1L, 2L, 2L)))
    // batch parse of the SAME frame log lands on the same frontier
    val batch = TxnLog.gtidFrontier(
      toSrcGno(TxnLog.committedTxns(spark.createDataset(t1 ++ t2).toDF())),
      "source", "gno").orderBy("source", "start_gno").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batch.toSeq == streamed.toSeq)
  }

  test("PgLogical: descriptors resolve tuples as-of, re-declare, flag unknown/mismatch") {
    import graft.cdc.PgLogical
    val frames = Seq(
      // lsn, op, rel_id, rel_name, cols, tuple
      (1L, "RELATION", 1L, "t1", "a,b", null.asInstanceOf[String]),
      (2L, "INSERT", 1L, null.asInstanceOf[String], null.asInstanceOf[String], """["x","y"]"""),
      (3L, "RELATION", 1L, "t1", "a,b,c", null.asInstanceOf[String]), // schema change
      (4L, "INSERT", 1L, null.asInstanceOf[String], null.asInstanceOf[String], """["x","y","z"]"""),
      (5L, "INSERT", 9L, null.asInstanceOf[String], null.asInstanceOf[String], """["q"]"""), // undeclared rel
      (6L, "INSERT", 1L, null.asInstanceOf[String], null.asInstanceOf[String], """["only-one"]"""), // arity mismatch
      (7L, "DELETE", 1L, null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]), // no tuple at all
      (8L, "INSERT", 1L, null.asInstanceOf[String], null.asInstanceOf[String], "not-json") // unparseable tuple
    ).toDF("lsn", "op", "rel_id", "rel_name", "cols", "tuple")
    val out = PgLogical.resolve(frames).orderBy("lsn").collect()
    assert(out.length == 6)
    // lsn 2 resolves against the 2-col descriptor, lsn 4 the 3-col one
    assert(out(0).getAs[Map[String, String]]("row_data") == Map("a" -> "x", "b" -> "y"))
    assert(out(1).getAs[Map[String, String]]("row_data") ==
      Map("a" -> "x", "b" -> "y", "c" -> "z"))
    // undeclared relation: flagged, never a job failure
    assert(out(2).getAs[Boolean]("unknown_relation") && out(2).isNullAt(out(2).fieldIndex("row_data")))
    // declared relation, wrong tuple arity: flagged separately
    assert(out(3).getAs[Boolean]("arity_mismatch") && out(3).isNullAt(out(3).fieldIndex("row_data")))
    // missing/unparseable tuple on a KNOWN relation: malformed_tuple,
    // never misclassified as an arity error (size(NULL) is NULL)
    Seq(out(4), out(5)).foreach { r =>
      assert(r.getAs[Boolean]("malformed_tuple"))
      assert(!r.getAs[Boolean]("arity_mismatch") && !r.getAs[Boolean]("unknown_relation"))
      assert(r.isNullAt(r.fieldIndex("row_data")))
    }
  }

  test("SchemaWatch: align pads added columns, drops removed ones") {
    val oldBatch = Seq((1L, 10L, 1.5)).toDF("id", "uid", "value")
    val newBatch = Seq((2L, 20L, 150L, "billing")).toDF("id", "uid", "cents", "route")
    val out = SchemaWatch.evolve(Seq(oldBatch, newBatch))
      .orderBy("id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head == Seq("id", "uid", "cents", "route"))
    assert(out(0).isNullAt(2) && out(0).isNullAt(3)) // old row: null-padded
    assert(out(1).getLong(2) == 150L && out(1).getString(3) == "billing")
  }

  test("SchemaWatch: case-variant columns MAP onto the target, not null-pad") {
    // a MySQL feed emitting USER_ID must land in target user_id — the
    // reference canonicalizes identifiers (internal/util/ident); only
    // an explicit caseSensitive=true keeps the quoted-identifier view
    val target = Seq((0L, 0L, "")).toDF("id", "user_id", "route").schema
    val feed = Seq((7L, 42L, "billing")).toDF("ID", "USER_ID", "Route")
    val folded = SchemaWatch.align(feed, target).collect()(0)
    assert(folded.getLong(0) == 7L && folded.getLong(1) == 42L &&
      folded.getString(2) == "billing")
    val strict = SchemaWatch.align(feed, target, caseSensitive = true).collect()(0)
    assert(strict.isNullAt(0) && strict.isNullAt(1) && strict.isNullAt(2))
    // schemaMap's ignore/renames fold case the same way
    val mapped = graft.cdc.Apply.schemaMap(feed,
      renames = Seq("USER_ID" -> "uid"), exprs = Nil,
      ignore = Seq("route"), extrasJson = None)
    assert(mapped.columns.toSeq == Seq("ID", "uid"))
    // a case-sensitive mapping must ERROR on a case-mismatched rename,
    // never silently duplicate the column through Spark's resolver
    val e = intercept[IllegalArgumentException](graft.cdc.Apply.schemaMap(feed,
      renames = Seq("user_id" -> "uid"), exprs = Nil, ignore = Nil,
      extrasJson = None, caseSensitive = true))
    assert(e.getMessage.contains("rename source"))
    // a batch carrying BOTH id and ID: exact-case match wins, no
    // ambiguous-reference failure (selection is positional)
    val both = Seq((1L, 2L)).toDF("id", "ID")
    val one = SchemaWatch.align(both, Seq((0L, 0L)).toDF("id", "other").schema)
      .collect()(0)
    assert(one.getLong(0) == 1L && one.isNullAt(1))
    // schemaMap with case-variant duplicates: a rename naming 'ID'
    // exactly binds to ID (never silently to id) — and the leftover
    // kept duplicate errors clearly instead of hitting Spark's
    // ambiguous-resolver failure downstream
    val mappedBoth = graft.cdc.Apply.schemaMap(both,
      renames = Seq("ID" -> "upper_id", "id" -> "lower_id"), exprs = Nil,
      ignore = Nil, extrasJson = None)
    assert(mappedBoth.columns.toSeq == Seq("upper_id", "lower_id"))
    assert(mappedBoth.collect()(0).getLong(0) == 2L)
    assert(mappedBoth.collect()(0).getLong(1) == 1L)
    // a rename whose name matches NEITHER case exactly is ambiguous
    val amb = intercept[IllegalArgumentException](graft.cdc.Apply.schemaMap(both,
      renames = Seq("Id" -> "x"), exprs = Nil, ignore = Seq("ID"),
      extrasJson = None))
    assert(amb.getMessage.contains("ambiguous"))
    // both case-variants kept: clear error, not Spark's resolver error
    val keptDup = intercept[IllegalArgumentException](graft.cdc.Apply.schemaMap(both,
      renames = Nil, exprs = Nil, ignore = Nil, extrasJson = None))
    assert(keptDup.getMessage.contains("case-variant"))
  }

  test("Checkpoint: regressions rejected, frontier monotone, group min") {
    // partition 0 proposes 100, 300, 200 (regression), 300 (equal: NOT
    // rejected — the reference's Advance inserts on `>=` the stored
    // HLC, so an equal re-proposal succeeds idempotently);
    // partition 1 proposes 150 only
    val props = Seq(
      (0L, 100L, 1L), (0L, 300L, 2L), (0L, 200L, 3L), (0L, 300L, 4L),
      (1L, 150L, 1L)).toDF("p", "nanos", "arrival")
    val f = Checkpoint.advance(props, col("p"), col("nanos"), col("arrival"))
      .orderBy("partition").collect()
    assert(f(0).getAs[Long]("frontier_nanos") == 300L)
    assert(f(0).getAs[Long]("n_rejected") == 1L)
    assert(f(1).getAs[Long]("frontier_nanos") == 150L)
    assert(f(1).getAs[Long]("n_rejected") == 0L)
    val g = Checkpoint.groupResolved(
      Checkpoint.advance(props, col("p"), col("nanos"), col("arrival"))).collect()(0)
    assert(g.getLong(0) == 150L) // multi-source minimum
  }

  test("UserScript: user-supplied JSON DSL compiles into the plan") {
    val df = Seq((1L, "purchase", 60.0), (2L, "signup", 1.0), (3L, "error", 9.0))
      .toDF("id", "event_type", "value")
    val script = graft.script.UserScript.compile(
      """{"stages": [
        |   {"op": "filter", "where": "event_type <> 'error'"},
        |   {"op": "map", "cols": {"cents": "cast(round(value*100,0) as bigint)",
        |                          "big": "cents >= 5000"}},
        |   {"op": "drop", "cols": ["value"]}],
        | "dispatch": {"routes": [{"name": "billing", "when": "event_type = 'purchase'"}],
        |              "default": "other"}}""".stripMargin)
    val routed = script.dispatch(df)
    assert(routed.keySet == Set("billing", "other"))
    val billing = routed("billing").collect()
    assert(billing.length == 1 && billing(0).getAs[Long]("cents") == 6000L)
    assert(billing(0).getAs[Boolean]("big"))
    assert(routed("other").collect().map(_.getAs[Long]("id")).toSeq == Seq(2L))
    // a malformed user expression fails at compile/plan time, per row never
    val bad = graft.script.UserScript.compile(
      """{"stages": [{"op": "filter", "where": "no_such_col >>> 1"}]}""")
    intercept[Exception] { bad(df).collect() }
  }

  test("Pipeline.mergeOrDlq routes conflicted rows to dead letters") {
    // key 1: second write's before-image (10) matches the prior proposed
    // value (10) -> clean; third write claims before=99 but target is 20
    // -> conflict
    val muts = Seq(
      (1L, 1L, 10.0, null.asInstanceOf[java.lang.Double]),
      (1L, 2L, 20.0, java.lang.Double.valueOf(10.0)),
      (1L, 3L, 30.0, java.lang.Double.valueOf(99.0)))
      .toDF("k", "seq", "value", "before_value")
    val p = Pipeline(muts, keys = Seq("k"), order = struct(col("seq")))
      .mergeOrDlq(col("before_value"), col("value"))
    assert(p.state.count() == 2)
    val dead = p.deadLetters.get.collect()
    assert(dead.length == 1)
    assert(dead(0).getAs[Long]("seq") == 3L)
    assert(dead(0).getAs[String]("dlq_reason") == "merge_conflict")
  }
}
