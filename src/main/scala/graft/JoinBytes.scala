package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only exchange-width instrument: local[32] charges compute but
  * not network, so the compressed batch join's headline claim — the
  * n²/k-shaped candidate stage moves m-byte codes instead of
  * full-width floats — needs its own measurement. This main runs the
  * raw and the compressed batch kNN join on the same dir and reports
  * each one's TOTAL shuffle write (bytes + records) from task
  * metrics, after an untimed warmup pass absorbs the memoized builds.
  * Not part of the driver contract.
  *
  * Usage: runMain graft.JoinBytes [sfDir]
  */
object JoinBytes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config(graft.core.EngineConf.recommended)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytes = new LongAdder
    val records = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytes.add(m.shuffleWriteMetrics.bytesWritten)
          records.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    // The listener bus is async: a fixed sleep under-drains on a slow
    // bus and mis-attributes shuffle bytes across measurements. Block
    // on LiveListenerBus.waitUntilEmpty instead — it is public
    // bytecode but private[spark] in the Scala signature, so this
    // dev-only instrument reaches it reflectively.
    def drainListenerBus(): Unit = {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
        .invoke(bus, java.lang.Long.valueOf(60000L))
    }

    def measure(label: String)(f: => Long): Unit = {
      drainListenerBus() // events from prior jobs must not leak in
      bytes.reset(); records.reset()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      drainListenerBus() // … and this job's events must all be counted
      println(f"JOINBYTES $label%-16s rows=$n%8d wall=$wall%7.2fs " +
        f"shuffleMB=${bytes.sum / 1e6}%9.1f shuffleRows=${records.sum}%12d")
    }

    val built = graft.index.IvfIndex.buildCached(spark, sfDir)
    val pqPath = graft.index.IvfIndex.pqLayoutFor(spark, sfDir)
    // warmup: memoized builds, codegen, page cache
    graft.index.IvfIndex.knnJoinIvf(built).count()
    graft.index.IvfIndex.knnJoinPq(spark, pqPath).count()
    measure("knn_join_ivf") { graft.index.IvfIndex.knnJoinIvf(built).count() }
    measure("knn_join_pq") { graft.index.IvfIndex.knnJoinPq(spark, pqPath).count() }
    spark.stop()
  }
}
