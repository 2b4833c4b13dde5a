package graft

import graft.model.{Doc, Span}
import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamDedupSpec extends AnyFunSuite with SparkTestBase {

  private def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def doc(id: String, text: String): Doc = Doc(id, Seq(Span.text(text, 0)))

  test("streaming signatures + watermarked windowed duplicate counts") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
    val sigs = StreamDedup.signatures(input.toDS())
    val counts = StreamDedup.windowedDupCounts(sigs)
    val q = counts.writeStream.format("memory").queryName("dupcounts")
      .outputMode("append").start()
    try {
      input.addData(
        (doc("a1", "the same content"), ts(1)),
        (doc("a2", "the same content"), ts(2)),
        (doc("b1", "different content"), ts(3)))
      q.processAllAvailable()
      // advance the watermark far enough to close the early windows
      input.addData((doc("z9", "late heartbeat"), ts(59)))
      q.processAllAvailable()
      // stateless rollup over the emitted per-key window counts
      val rows = s.sql(
        """SELECT window, sum(copies) AS n_docs, sum(copies - 1) AS n_dups
          |FROM dupcounts GROUP BY window""".stripMargin).collect()
      assert(rows.nonEmpty)
      // every closed window containing both a1+a2 reports 1 duplicate
      assert(rows.map(_.getLong(2)).max == 1L)
      assert(rows.map(_.getLong(1)).max == 3L)
    } finally q.stop()
  }

  test("keyed streaming dedup tags later copies as duplicates across batches") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
    // unbounded exact mode here (processAllAvailable quiesces only without
    // processing-time timeouts — see tagDuplicates' trigger note)
    val tags = StreamDedup.tagDuplicates(StreamDedup.signatures(input.toDS()),
      stateTtl = None)
    val q = tags.writeStream.format("memory").queryName("duptags")
      .outputMode("append").start()
    try {
      input.addData((doc("k1", "payload x"), ts(1)))
      q.processAllAvailable()
      input.addData((doc("k2", "payload x"), ts(5)), (doc("k3", "payload y"), ts(6)))
      q.processAllAvailable()
      val rows = s.sql("SELECT doc_id, is_duplicate, first_doc_id, copy_number FROM duptags ORDER BY doc_id")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        ("k1", false, "k1", 1L),
        ("k2", true, "k1", 2L), // state survived the batch boundary
        ("k3", false, "k3", 1L)))
    } finally q.stop()
  }

  test("streaming near-dup tagging: banded simhash match across batches, bounded state") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
    val tags = StreamDedup.tagNearDuplicates(
      StreamDedup.signatures(input.toDS()), stateTtl = None)
    val q = tags.writeStream.format("memory").queryName("neartags")
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    try {
      input.addData((doc("n1", base), ts(1)))
      q.processAllAvailable()
      // one word changed: same shingle band, tiny simhash distance
      input.addData((doc("n2", base.replace("tonight", "today")), ts(5)),
        (doc("n3", "completely unrelated content about databases and engines"), ts(6)))
      q.processAllAvailable()
      val rows = s.sql("SELECT doc_id, is_near_dup, matched_doc_id FROM neartags ORDER BY doc_id")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("n1", false, ""),
        ("n2", true, "n1"), // matched across the batch boundary
        ("n3", false, "")))
    } finally q.stop()
  }

  test("event-time TTL: replayed batches age state by the watermark, deterministically") {
    implicit val s = spark
    import s.implicits._
    def run(queryName: String): Seq[(String, Boolean, String)] = {
      val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
      val tags = StreamDedup.tagDuplicatesEventTime(
        StreamDedup.signatures(input.toDS()),
        ttl = java.time.Duration.ofMinutes(5), watermarkDelay = "0 seconds")
      // EventTimeTimeout fires on watermark advance, so processAllAvailable
      // quiesces — no interval trigger needed (unlike ProcessingTimeTimeout)
      val q = tags.writeStream.format("memory").queryName(queryName)
        .outputMode("append").start()
      try {
        // batch 1: keeper at 10:01 (watermark after this batch: 10:01)
        input.addData((doc("k1", "payload x"), ts(1)))
        q.processAllAvailable()
        // batch 2: within TTL (10:03 < 10:01 + 5 min) — still a duplicate;
        // watermark advances to 10:03
        input.addData((doc("k2", "payload x"), ts(3)))
        q.processAllAvailable()
        // batch 3: unrelated key pushes the watermark to 10:30, past the
        // key's last-seen (10:03) + 5 min — k1/k2 state evicts
        input.addData((doc("w1", "watermark mover"), ts(30)))
        q.processAllAvailable()
        // batch 4: same content re-arrives at 10:31 — fresh keeper
        input.addData((doc("k9", "payload x"), ts(31)))
        q.processAllAvailable()
        s.sql(s"SELECT doc_id, is_duplicate, first_doc_id FROM $queryName ORDER BY doc_id")
          .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2))).toSeq
      } finally q.stop()
    }
    val expected = Seq(
      ("k1", false, "k1"),
      ("k2", true, "k1"),  // within event-time TTL: still the same keeper
      ("k9", false, "k9"), // after watermark passed last-seen + ttl: evicted
      ("w1", false, "w1"))
    val first = run("evttl1")
    assert(first == expected, first.mkString(", "))
    // determinism: replaying the identical event sequence ages state the
    // same way (the whole point of event-time over processing-time TTL)
    assert(run("evttl2") == expected)
  }

  test("event-time TTL: a LATE in-order-tolerant batch cannot rewind the eviction deadline") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
    val tags = StreamDedup.tagDuplicatesEventTime(
      StreamDedup.signatures(input.toDS()),
      ttl = java.time.Duration.ofMinutes(5), watermarkDelay = "30 minutes")
    val q = tags.writeStream.format("memory").queryName("evrewind")
      .outputMode("append").start()
    try {
      // keeper at 10:20 → deadline 10:25 (watermark lags 30 min: 9:50)
      input.addData((doc("k1", "payload x"), ts(20)))
      q.processAllAvailable()
      // LATE copy at 10:05 (within the watermark delay, so accepted): the
      // deadline must stay anchored at max-seen (10:20) + ttl, not rewind
      // to 10:05 + ttl = 10:10
      input.addData((doc("k2", "payload x"), ts(5)))
      q.processAllAvailable()
      // watermark mover: 10:48 - 30 min = 10:18 — past the REWOUND deadline
      // (10:10) but before the correct one (10:25)
      input.addData((doc("w1", "watermark mover"), ts(48)))
      q.processAllAvailable()
      // re-arrival at 10:24: with the rewind bug the key was evicted at
      // 10:18 and this becomes a fresh keeper; correct state keeps it a dup
      input.addData((doc("k3", "payload x"), ts(24)))
      q.processAllAvailable()
      val rows = s.sql("SELECT doc_id, is_duplicate, first_doc_id FROM evrewind ORDER BY doc_id")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("k1", false, "k1"),
        ("k2", true, "k1"),
        ("k3", true, "k1"), // deadline NOT rewound by the late batch
        ("w1", false, "w1")), rows.mkString(", "))
    } finally q.stop()
  }

  test("state TTL evicts idle keys: a re-arrival after expiry is a fresh keeper") {
    implicit val s = spark
    import s.implicits._
    val input = MemoryStream[(Doc, java.sql.Timestamp)](s)
    val tags = StreamDedup.tagDuplicates(StreamDedup.signatures(input.toDS()),
      stateTtl = Some("1 millisecond"))
    // interval trigger + sink polling: processAllAvailable never quiesces
    // under ProcessingTimeTimeout (see tagDuplicates' trigger note)
    val q = tags.writeStream.format("memory").queryName("ttltags")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
      .start()
    def awaitRows(n: Int): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (s.sql("SELECT * FROM ttltags").count() < n) {
        assert(System.nanoTime() < deadline, s"timed out waiting for $n sink rows")
        Thread.sleep(50)
      }
    }
    try {
      input.addData((doc("k1", "payload x"), ts(1)))
      awaitRows(1)
      Thread.sleep(200) // let the 1 ms processing-time TTL lapse + fire
      // same content again: its state was evicted, so it must NOT be a dup
      input.addData((doc("k9", "payload x"), ts(3)))
      awaitRows(2)
      val rows = s.sql("SELECT doc_id, is_duplicate, first_doc_id FROM ttltags ORDER BY doc_id")
        .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2)))
      assert(rows.toSeq == Seq(
        ("k1", false, "k1"),
        ("k9", false, "k9"))) // fresh keeper — old state evicted by TTL
    } finally q.stop()
  }
}
