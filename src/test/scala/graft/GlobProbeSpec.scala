package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark file-source behavior the generational change feed
  * ([[graft.streaming.IndexStream.changesIvfGen]]) is built on: a
  * text stream over a glob re-expands the glob per trigger, so
  * manifest files in generation directories created AFTER the
  * checkpoint exists are still discovered and delivered exactly once.
  * If a Spark upgrade ever froze the glob at stream start, the feed
  * would silently go quiet at the first cutover — this probe turns
  * that into a loud suite failure. */
class GlobProbeSpec extends AnyFunSuite {
  import SparkTestSession._

  test("file stream over a glob discovers new matching directories across restarts") {
    val root = java.nio.file.Files.createTempDirectory("graft-globprobe").toString
    val out = java.nio.file.Files.createTempDirectory("graft-globprobe-out").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def put(p: String, body: String): Unit = {
      val o = fs.create(new org.apache.hadoop.fs.Path(p), true)
      o.write(body.getBytes); o.close()
    }
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/generation=1/_snapshots"))
    put(s"$root/generation=1/_snapshots/batch-0.json", """{"batch_id":0}""")
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit = {
      val q = spark.readStream.text(s"$root/generation=*/_snapshots")
        .writeStream
        .option("checkpointLocation", s"$out/_ckpt")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen ++= b.collect().map(_.getString(0)); ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(seen.toSeq == Seq("""{"batch_id":0}"""), s"$seen")
    // a NEW generation dir appears after the checkpoint exists
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/generation=2/_snapshots"))
    put(s"$root/generation=2/_snapshots/batch-1.json", """{"batch_id":1}""")
    put(s"$root/generation=1/_snapshots/batch-2.json", """{"batch_id":2}""")
    drain()
    assert(seen.toSet == Set("""{"batch_id":0}""", """{"batch_id":1}""",
      """{"batch_id":2}"""), s"$seen")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
  }
}
