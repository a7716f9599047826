package graft.plans

import java.sql.Timestamp

import graft.SparkSpec
import graft.operators.Joins
import org.apache.spark.sql.functions._

/** The custom merge execs buffer the matching right-hand key group; these
  * tests pin that the buffer spills to disk past the SMJ thresholds (so a
  * hot key degrades to disk instead of OOMing the executor) and that the
  * spilled path is pair-for-pair identical to the composed range join.
  */
class SpillBufferSpec extends SparkSpec {
  import spark.implicits._

  test("SpillableRowBuffer spills past the row threshold and replays in order") {
    // Runs inside a task (the buffer needs TaskContext); forced spill every
    // 256 rows via the spill-rows threshold, 16-row in-memory stage. The
    // size threshold must stay effectively infinite: the sorter's memory
    // usage includes its current page (>= 1 MB), so a small size threshold
    // degenerates to one spill FILE PER ROW and iterator creation then
    // allocates a multi-MB read-ahead reader per file.
    val res = spark.sparkContext.parallelize(Seq(1), 1).mapPartitions { _ =>
      import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      import org.apache.spark.sql.catalyst.InternalRow
      import org.apache.spark.sql.graftbridge.SpillableRowBuffer
      import org.apache.spark.sql.types.LongType
      val proj = UnsafeProjection.create(Array[org.apache.spark.sql.types.DataType](LongType))
      val buf = new SpillableRowBuffer(16, 256, Long.MaxValue)
      val n = 10000
      (0 until n).foreach(i => buf.add(proj(InternalRow(i.toLong))))
      val all = buf.iterator.map(_.getLong(0)).toVector
      val tail = buf.iteratorFrom(n - 5).map(_.getLong(0)).toVector
      Iterator.single((buf.length, buf.spillSize, all == (0L until n.toLong).toVector,
        tail == Vector(9995L, 9996L, 9997L, 9998L, 9999L)))
    }.collect().head
    assert(res._1 == 10000)
    assert(res._2 > 0L, "expected forced disk spill past 256 rows")
    assert(res._3, "full replay must preserve insertion order")
    assert(res._4, "positioned iterator must start mid-buffer")
  }

  test("RangeJoinExec hot-key group spills and stays identical to the composed join") {
    val conf = spark.conf
    val keys = Seq("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "16")  // leave the in-heap stage almost immediately
      conf.set(keys(1), "512") // force a disk spill every 512 buffered rows
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      // ONE key owns every right row: a 20k-row group vs 40 left probes.
      val left = (0 until 40)
        .map(i => (1L, new Timestamp(base + i * 60000L), i)).toDF("k", "t", "lid")
      val right = (0 until 20000)
        .map(i => (1L, new Timestamp(base + i * 120L), i.toLong))
        .toDF("k", "rt", "rid")
      val merged = Joins.rangeJoinMerge(left, right, Seq("k"), "t", "rt",
          loMicros = 0L, hiMicros = 2L * 60 * 1000000)
        .select(col("lid"), col("rid")).as[(Int, Long)].collect().toSet
      val composed = Joins.rangeJoin(left, right.withColumnRenamed("k", "k2")
            .withColumn("k", col("k2")).drop("k2"), Seq("k"), "t", "rt",
          expr("INTERVAL '0' SECOND"), expr("INTERVAL '2' MINUTE"))
        .select(col("l.lid"), col("r.rid")).as[(Int, Long)].collect().toSet
      assert(merged == composed,
        s"spilled merge diverged: ${(merged diff composed).take(5)} / ${(composed diff merged).take(5)}")
      assert(merged.size > 30000, s"window should be dense, got ${merged.size}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
